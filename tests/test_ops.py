"""Training-data ops: dedup recall, ANN recall, text ops, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_exact_dedup_removes_injected_dups(spark, docs):
    from cianparser_spark.ops.dedup import exact_dedup

    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup)
    out = exact_dedup(both)
    assert out.count() == docs.count()
    # keep-min: original ids survive
    assert out.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """MinHash-LSH must recover the truly-similar pairs (recall >= 0.9
    at jaccard >= 0.5) — duplicates injected to guarantee signal."""
    from cianparser_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    near = docs.limit(8).withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(near)  # exact copies → jaccard 1.0
    exact = {
        (r["left_id"], r["right_id"])
        for r in ngram_jaccard_pairs(both, threshold=0.5).collect()
    }
    assert len(exact) >= 8
    got = {
        (r["left_id"], r["right_id"])
        for r in minhash_lsh_pairs(both, threshold=0.5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9
    assert got <= exact  # verification step kills false positives


def test_simhash_identical_docs_distance_zero(spark, docs):
    from cianparser_spark.ops.dedup import simhash

    two = docs.limit(1).unionByName(
        docs.limit(1).withColumn("doc_id", F.lit(999999))
    )
    hs = [r["simhash"] for r in simhash(two).collect()]
    assert hs[0] == hs[1]


def test_ann_lsh_and_ivf_recall(spark, emb):
    from cianparser_spark.ops.similarity import brute_force_topk, ivf_topk, lsh_topk

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    truth = [r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()]
    lsh = [r["vec_id"] for r in lsh_topk(emb, qvec, k=10, multiprobe=2).collect()]
    assert len(set(truth) & set(lsh)) >= 5  # multiprobe recall
    ivf = [r["vec_id"] for r in ivf_topk(emb, qvec, k=10, nprobe=8).collect()]
    assert len(set(truth) & set(ivf)) >= 5
    assert truth[0] == 0  # the query vector itself ranks first


def test_ann_brute_force_matches_numpy(spark, emb):
    from cianparser_spark.ops.similarity import brute_force_topk

    rows = emb.collect()
    mat = np.stack([np.asarray(r["embedding"]) for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    q = mat[ids.tolist().index(0)]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:5]
    want = ids[order].tolist()
    got = [r["vec_id"] for r in brute_force_topk(emb, q.tolist(), k=5).collect()]
    assert got == want


def test_text_ops_shapes(spark, docs):
    from cianparser_spark.ops.text import fingerprint, lang_id, quality_score, token_count

    n = docs.count()
    assert token_count(docs).count() == n
    q = quality_score(docs)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0
    langs = {r["lang_pred"] for r in lang_id(docs).collect()}
    assert langs <= {"en", "de", "fr", "es", "zh", None}
    fps = fingerprint(docs)
    assert fps.select("fingerprint").distinct().count() == n  # no collisions here


def test_multimodal_features_and_stub(spark):
    from cianparser_spark.engine.payload import build_images_table
    from cianparser_spark.ops.multimodal import decode_features, resize

    import tempfile

    path = tempfile.mkdtemp() + "/imgs.parquet"
    images = build_images_table(spark, path, n=24, partitions=2)
    feats = decode_features(images)
    rows = feats.collect()
    assert len(rows) == 24 and all(r["ok"] for r in rows)
    assert all(0 <= r["mean_luma"] <= 255 for r in rows)
    # unknown format routes to the documented stub, not a crash
    weird = images.limit(3).withColumn("fmt", F.lit("heic"))
    stub_rows = decode_features(weird).collect()
    assert all(not r["ok"] for r in stub_rows)
    small = resize(images.limit(4), 16, 16).collect()
    assert all(r["w"] == 16 and r["h"] == 16 for r in small)
    from cianparser_spark.corpus import imaging

    px = imaging.png_decode(bytes(small[0]["bytes"]))
    assert px.shape == (16, 16, 3)


def test_audio_features_and_stub(spark):
    from cianparser_spark.ops.multimodal import audio_features, make_synthetic_audio

    aud = make_synthetic_audio(spark, n_clips=8, sr=8000, seconds=0.25)
    feats = {r["audio_id"]: r for r in audio_features(aud).collect()}
    assert len(feats) == 8 and all(r["ok"] for r in feats.values())
    # clip 0 is a 220 Hz fundamental: FFT argmax must land near it
    assert abs(feats["aud0000"]["dominant_hz"] - 220.0) < 8.0
    assert 0.3 < feats["aud0000"]["rms"] < 0.7
    # unknown codec degrades to ok=false rows, not job failure
    bad = aud.withColumn("fmt", F.lit("mp3"))
    rows = audio_features(bad).collect()
    assert all(not r["ok"] for r in rows)


def test_video_frame_sampling(spark):
    from cianparser_spark.ops.multimodal import frame_sample, make_synthetic_video

    vids = make_synthetic_video(spark, n_videos=3, frames=12)
    frames = frame_sample(vids, every=4)
    rows = frames.collect()
    assert len(rows) == 3 * 3  # 12 frames / every 4
    assert {r["frame_index"] for r in rows} == {0, 4, 8}
    from cianparser_spark.corpus import imaging

    assert imaging.png_decode(bytes(rows[0]["bytes"])).shape == (32, 32, 3)
