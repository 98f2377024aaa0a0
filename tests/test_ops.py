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


def test_resize_features_one_pass(spark):
    """resize_features == pure-Python decode→resize→re-encode twin; a
    corrupt payload degrades to ok=false instead of failing the task."""
    import tempfile

    from cianparser_spark.corpus import imaging, webgen
    from cianparser_spark.engine.payload import build_images_table
    from cianparser_spark.ops.multimodal import (resize_features,
                                                 resized_feature_dict)

    path = tempfile.mkdtemp() + "/imgs.parquet"
    images = build_images_table(spark, path, n=12, partitions=2)
    got = {r["image_id"]: r for r in resize_features(images, 8, 6).collect()}
    assert len(got) == 12
    for i in range(12):
        row = webgen.image_row(i)
        want = resized_feature_dict(
            imaging.decode(row["bytes"], row["fmt"]), 8, 6)
        g = got[row["image_id"]]
        assert g["ok"] and g["n_bytes"] == want["n_bytes"]
        assert abs(g["mean_luma"] - want["mean_luma"]) < 1e-9
    corrupt = images.limit(2).withColumn(
        "bytes", F.expr("substring(bytes, 1, 10)"))
    bad = resize_features(corrupt, 8, 6).collect()
    assert bad and all(not r["ok"] and r["n_bytes"] is None for r in bad)


def test_parse_captions(spark):
    """Typed caption parse equals the corpus ground truth on valid
    captions (Студия → rooms=0 convention); malformed captions yield
    null fields + admitted=false, never a failure."""
    from cianparser_spark.corpus import webgen
    from cianparser_spark.engine.payload import parse_captions

    rows = [(f"i{i}", webgen.caption_text(i)) for i in range(20)]
    rows += [("bad1", "garbage"), ("bad2", ""), ("bad3", "Студия, 50")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = {r["image_id"]: r for r in parse_captions(df).collect()}
    for i in range(20):
        f = webgen.caption_fields(i)
        g = out[f"i{i}"]
        want_rooms = 0 if f["rooms_label"] == "Студия" else f["rooms_count"]
        assert g["rooms"] == want_rooms
        assert abs(g["area_m2"] - f["total_meters"]) < 1e-9
        assert g["floor"] == f["floor"] and g["floors_count"] == f["floors_count"]
        assert g["admitted"]
    for b in ("bad1", "bad2", "bad3"):
        assert out[b]["admitted"] is False
    assert out["bad1"]["rooms"] is None and out["bad3"]["rooms"] == 0
    assert out["bad3"]["area_m2"] is None


def test_exact_binary_dedup(spark):
    """Keep-first byte-exact dedup: identical payloads collapse to the
    smallest id with the right copy count; distinct payloads survive;
    no bytes cross the exchange (key+id projection under the agg)."""
    from cianparser_spark.ops.dedup import exact_binary_dedup

    rows = [("a", b"\x01\x02"), ("b", b"\x01\x02"), ("c", b"\x03"),
            ("d", b"\x01\x02"), ("e", b"")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r["image_id"]: r for r in exact_binary_dedup(df).collect()}
    assert set(out) == {"a", "c", "e"}
    assert out["a"]["n_copies"] == 3 and out["c"]["n_copies"] == 1
    import hashlib
    assert out["c"]["content_key"] == hashlib.md5(b"03".upper()).hexdigest()
    plan = exact_binary_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(content_key" in plan  # shuffle on the key, not bytes


def test_aspect_buckets_argmin_and_plan(spark):
    """Every image lands in its nearest pinned bucket (brute-force
    twin), counts are conserved, and the plan has no per-image window
    or join on the big side — assignment must stay a map expression."""
    from cianparser_spark.ops.multimodal import ASPECT_BUCKETS, aspect_buckets

    sizes = [(w, h) for w in (64, 96, 128, 50, 300) for h in (64, 96, 128, 77)]
    rows = [(f"i{k:03d}", w, h) for k, (w, h) in enumerate(sizes)]
    meta = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = aspect_buckets(meta).collect()
    assert sum(r["n_images"] for r in out) == len(rows)
    # brute-force twin
    import collections
    want = collections.Counter()
    for _id, w, h in rows:
        dists = [(abs(w / h - bw / bh), i)
                 for i, (_n, bw, bh) in enumerate(ASPECT_BUCKETS)]
        want[min(dists)[1]] += 1
    got = {r["bucket"]: r["n_images"] for r in out}
    for i, (name, _w, _h) in enumerate(ASPECT_BUCKETS):
        assert got.get(name, 0) == want.get(i, 0), name
    plan = aspect_buckets(meta)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # one broadcast join against the 7-row dim is fine; no sort-merge
    assert "SortMergeJoin" not in plan


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


def test_g711_codec_bit_exact():
    """Vectorized mu-law/A-law decode must equal the canonical g711.c
    scalar tables on every possible byte; encoders must be consistent
    inverses (the lone exception is mu-law 0x7F, negative zero, which
    re-encodes to positive zero 0xFF exactly as linear2ulaw(0) does)."""
    import numpy as np

    from cianparser_spark.corpus import g711

    def ulaw2linear_ref(u):
        u = ~u & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2linear_ref(a):
        a ^= 0x55
        t, seg = (a & 0x0F) << 4, (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    allb = bytes(range(256))
    assert np.array_equal(
        g711.ulaw_decode(allb),
        np.array([ulaw2linear_ref(b) for b in range(256)], dtype=np.int16),
    )
    assert np.array_equal(
        g711.alaw_decode(allb),
        np.array([alaw2linear_ref(b) for b in range(256)], dtype=np.int16),
    )
    ube = np.frombuffer(g711.ulaw_encode(g711.ulaw_decode(allb)), dtype=np.uint8)
    assert np.array_equal(np.delete(ube, 0x7F), np.delete(np.arange(256, dtype=np.uint8), 0x7F))
    assert ube[0x7F] == 0xFF and g711.ulaw_decode(bytes([0xFF]))[0] == 0
    abe = np.frombuffer(g711.alaw_encode(g711.alaw_decode(allb)), dtype=np.uint8)
    assert np.array_equal(abe, np.arange(256, dtype=np.uint8))
    # round-trip quantization error is segment-relative-bounded
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, 50000).astype(np.int16)
    xc = np.clip(x.astype(np.int32), -32635, 32635)
    eu = np.abs(g711.ulaw_decode(g711.ulaw_encode(x)).astype(np.int32) - xc)
    assert np.all(eu <= np.maximum(np.abs(xc) // 16, 32))
    ea = np.abs(g711.alaw_decode(g711.alaw_encode(x)).astype(np.int32) - x.astype(np.int32))
    assert np.all(ea <= np.maximum(np.abs(x.astype(np.int32)) // 16, 64))


def test_riffwav_container():
    """RIFF/WAVE parse: round-trips every supported codec, survives
    chunk reordering / unknown chunks / odd-size padding, downmixes
    multi-channel, and rejects unsupported format tags with
    NotImplementedError (the operator's ok=false path)."""
    import struct

    import numpy as np
    import pytest

    from cianparser_spark.corpus import riffwav

    rng = np.random.default_rng(11)
    pcm = rng.integers(-30000, 30000, 4001).astype(np.int16)  # odd length
    for codec in ("pcm", "mulaw", "alaw"):
        data = riffwav.wav_encode(pcm, 8000, codec)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) % 2 == 0
        x, sr, name = riffwav.wav_parse(data)
        assert sr == 8000 and name == codec and len(x) == 4001
        err = np.abs(x * 32767.0 - pcm.astype(np.float64))
        assert err.max() <= (1.0 if codec == "pcm" else np.maximum(np.abs(pcm) / 16, 64).max())
    # unknown chunk before fmt, fmt after data: parser must chunk-walk
    base = riffwav.wav_encode(pcm[:100], 8000, "pcm")
    fmt_c, data_c = base[12:36], base[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    reordered = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(data_c) + len(fmt_c)) + b"WAVE" \
        + junk + data_c + fmt_c
    x2, _, _ = riffwav.wav_parse(reordered)
    assert np.array_equal(x2, riffwav.wav_parse(base)[0])
    # stereo downmix: interleave L=pcm, R=0 → mean = pcm/2
    inter = np.zeros(200, dtype=np.int16)
    inter[0::2] = pcm[:100]
    stereo = riffwav.wav_encode(inter, 8000, "pcm")
    stereo = stereo.replace(struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
                            struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16), 1)
    xs, _, _ = riffwav.wav_parse(stereo)
    assert len(xs) == 100 and np.allclose(xs * 32767.0, pcm[:100] / 2.0, atol=0.5)
    # unsupported tag (MP3-in-WAV 0x0055) → NotImplementedError
    bad = base.replace(struct.pack("<H", 1), struct.pack("<H", 0x55), 1)
    with pytest.raises(NotImplementedError):
        riffwav.wav_parse(bad)
    with pytest.raises(NotImplementedError):
        riffwav.wav_parse(b"\x89PNG not audio at all")


def test_audio_features_wav_container(spark):
    """A binary column holding actual .wav files decodes through the
    Spark operator; the container's sample rate wins (metadata column
    deliberately poisoned)."""
    from cianparser_spark.ops.multimodal import audio_features, make_synthetic_audio

    ref = {r["audio_id"]: r for r in
           audio_features(make_synthetic_audio(spark, n_clips=4, seconds=0.25)).collect()}
    for fmt in ("wav", "wav_mulaw", "wav_alaw"):
        aud = make_synthetic_audio(spark, n_clips=4, seconds=0.25, fmt=fmt) \
            .withColumn("sample_rate", F.lit(44100))  # poison: container must win
        feats = {r["audio_id"]: r for r in audio_features(aud).collect()}
        assert len(feats) == 4 and all(r["ok"] for r in feats.values())
        for k, r in feats.items():
            assert r["dominant_hz"] == ref[k]["dominant_hz"]
            assert abs(r["rms"] - ref[k]["rms"]) < 0.02


def test_audio_features_g711(spark):
    """G.711-companded clips decode for real through the Spark operator
    and land within companding error of the raw-PCM features."""
    from cianparser_spark.ops.multimodal import audio_features, make_synthetic_audio

    ref = {r["audio_id"]: r for r in
           audio_features(make_synthetic_audio(spark, n_clips=6, seconds=0.25)).collect()}
    for fmt in ("pcm_mulaw", "pcm_alaw"):
        aud = make_synthetic_audio(spark, n_clips=6, seconds=0.25, fmt=fmt)
        one = aud.limit(1).collect()[0]
        assert len(bytes(one["bytes"])) == one["n_samples"]  # 1 byte/sample
        feats = {r["audio_id"]: r for r in audio_features(aud).collect()}
        assert len(feats) == 6 and all(r["ok"] for r in feats.values())
        for k, r in feats.items():
            assert r["dominant_hz"] == ref[k]["dominant_hz"]  # FFT argmax is companding-robust
            assert abs(r["rms"] - ref[k]["rms"]) < 0.02
            assert abs(r["zcr"] - ref[k]["zcr"]) < 0.05


def test_video_frame_sampling(spark):
    from cianparser_spark.ops.multimodal import frame_sample, make_synthetic_video

    vids = make_synthetic_video(spark, n_videos=3, frames=12)
    frames = frame_sample(vids, every=4)
    rows = frames.collect()
    assert len(rows) == 3 * 3  # 12 frames / every 4
    assert {r["frame_index"] for r in rows} == {0, 4, 8}
    from cianparser_spark.corpus import imaging

    assert imaging.png_decode(bytes(rows[0]["bytes"])).shape == (32, 32, 3)


def test_video_avi_container(spark):
    """An actual RIFF/AVI file in the binary column demuxes and decodes
    through the Spark operator; sampled frames are pixel-identical to
    the pngseq fixture of the same generator seeds; compressed fourccs
    raise at decode (honest codec boundary)."""
    import numpy as np
    import pytest

    from cianparser_spark.corpus import aviriff, imaging
    from cianparser_spark.ops.multimodal import frame_sample, make_synthetic_video

    vids = make_synthetic_video(spark, n_videos=3, frames=12, fmt="avi")
    rows = frame_sample(vids, every=4).collect()
    assert len(rows) == 3 * 3 and {r["frame_index"] for r in rows} == {0, 4, 8}
    for r in rows:
        v = int(r["video_id"][3:])
        want = imaging.gen_pixels(v * 1000 + r["frame_index"], 32, 32)
        assert np.array_equal(imaging.png_decode(bytes(r["bytes"])), want)
    # demux is codec-free; decode of a compressed fourcc is the stub
    px = [imaging.gen_pixels(i, 16, 16) for i in range(4)]
    blob = aviriff.avi_encode(px, fps=10)
    mjpg = blob.replace(b"DIB ", b"MJPG", 1)
    meta, raw = aviriff.avi_demux(mjpg)  # demux still real
    assert len(raw) == 4 and meta.fourcc == b"MJPG"
    comp_meta = aviriff.AviMeta(**{**meta.__dict__, "compression": 0x47504A4D})
    with pytest.raises(NotImplementedError):
        aviriff.dib_decode(raw[0], comp_meta)
    # odd width exercises DIB 4-byte row padding, exact round-trip
    px_odd = [imaging.gen_pixels(50 + i, 21, 14) for i in range(3)]
    meta2, raw2 = aviriff.avi_demux(aviriff.avi_encode(px_odd, fps=5))
    assert all(np.array_equal(aviriff.dib_decode(raw2[i], meta2), px_odd[i]) for i in range(3))
    with pytest.raises(NotImplementedError):
        aviriff.avi_demux(b"RIFF\x04\x00\x00\x00WAVE")


def test_minhash_lsh_oracle_recall_sf001(spark):
    """The contract-query guarantee: at sf0.01 and threshold 0.2 the
    LSH candidate set covers EVERY pair with exact Jaccard >= 0.2, so
    minhash_lsh_pairs == ngram_jaccard_pairs at that threshold — which
    is what licenses the exact-Jaccard DuckDB oracle for
    ``dedup_minhash_lsh`` (__spark_entry__.py)."""
    from cianparser_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {
        (r["left_id"], r["right_id"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(d, threshold=0.2).collect()
    }
    got = {
        (r["left_id"], r["right_id"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(d, threshold=0.2).collect()
    }
    assert len(exact) > 0
    assert got == exact


def test_simhash_banding_recall_guarantee(spark):
    """Pigeonhole: every pair with hamming <= 3 over the 4×16-bit bands
    must appear in the banded join — compare against a brute-force
    numpy all-pairs scan of the same fingerprints."""
    import itertools

    import pandas as pd

    from cianparser_spark.ops.dedup import simhash_near_pairs, simhash_text

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pdf = d.select("doc_id", "text").toPandas().sort_values("doc_id")
    sh = {r.doc_id: simhash_text(r.text) for r in pdf.itertuples()}
    brute = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        ham = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            brute.add((a, b, ham))
    got = {
        (r["left_id"], r["right_id"], r["hamming"])
        for r in simhash_near_pairs(d, max_hamming=3).collect()
    }
    assert len(brute) > 0
    assert got == brute


def test_shingle_expr_matches_python(spark, docs):
    """The native Catalyst shingle expression must reproduce the pure-
    Python reference (`_shingles`) exactly — real corpus + edge cases
    (empty text, whitespace-only, fewer words than k, run-whitespace)."""
    import pandas as pd

    from cianparser_spark.ops.dedup import _shingles, shingle_expr

    edge = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, "одно"), (90004, "два слова"),
         (90005, "ровно три слова"), (90006, "тут  двойной   пробел между словами"),
         (90007, "\tтабы\nи переводы строк тоже  разделители\n")],
        "doc_id long, text string",
    )
    both = docs.limit(200).select("doc_id", "text").unionByName(edge)
    for k in (2, 3, 5):
        got = {
            r["doc_id"]: r["sh"]
            for r in both.select(
                "doc_id", shingle_expr("text", k).alias("sh")
            ).collect()
        }
        pdf = both.toPandas()
        want = dict(zip(pdf["doc_id"], _shingles(pd.Series(list(pdf["text"])), k)))
        assert got == want


def test_minhash_precomputed_sigs_identical(spark, docs):
    """Passing a precomputed (persisted) signature frame must yield the
    same pairs as the lazy path — the reuse hook for repeated runs."""
    from cianparser_spark.ops.dedup import minhash_lsh_pairs, minhash_signatures

    d = docs.limit(60)
    near = d.limit(6).withColumn("doc_id", F.col("doc_id") + 100000)
    both = d.unionByName(near)
    lazy = {(r["left_id"], r["right_id"]) for r in minhash_lsh_pairs(both).collect()}
    sigs = minhash_signatures(both).persist()
    try:
        pre = {(r["left_id"], r["right_id"])
               for r in minhash_lsh_pairs(both, sigs=sigs).collect()}
    finally:
        sigs.unpersist()
    assert pre == lazy and len(lazy) >= 6


def test_simhash_vectorized_matches_scalar(spark, docs):
    """The batched simhash kernel must equal the scalar reference
    (`simhash_text`, also the truth-dump definition) on every row,
    including empty / whitespace-only / single-word texts."""
    from cianparser_spark.ops.dedup import simhash, simhash_text

    edge = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, "слово"),
         (90004, "слово слово слово"), (90005, "а б в г д е ж з")],
        "doc_id long, text string",
    )
    both = docs.limit(200).select("doc_id", "text").unionByName(edge)
    got = {r["doc_id"]: r["simhash"] for r in simhash(both).collect()}
    pdf = both.toPandas()
    want = {i: simhash_text(t) for i, t in zip(pdf["doc_id"], pdf["text"])}
    assert got == want


def test_minhash_signatures_vectorized_matches_scalar(spark, docs):
    """The batched minhash kernel must equal a direct per-text
    computation (the historical per-row loop, inlined here as the
    reference) — flattened hashing + segmented min is a pure
    reshaping of the same arithmetic."""
    import numpy as np
    import pandas as pd

    from cianparser_spark.ops.dedup import _shingles, minhash_signatures

    k, n_hashes = 3, 64
    seed_consts = np.array(
        [(i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF for i in range(n_hashes)],
        dtype=np.uint64,
    )

    def scalar_sig(t: str) -> list[int]:
        sh = _shingles(pd.Series([t]), k)[0]
        if not sh:
            return [0] * n_hashes
        base = pd.util.hash_array(np.asarray(sh, dtype=object)).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = base[None, :] + seed_consts[:, None]
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
        return (z.min(axis=1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist()

    edge = spark.createDataFrame(
        [(90001, ""), (90002, "  "), (90003, "пара слов")],
        "doc_id long, text string",
    )
    both = docs.limit(100).select("doc_id", "text").unionByName(edge)
    got = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(both, k=k).collect()}
    pdf = both.toPandas()
    want = {i: scalar_sig(t) for i, t in zip(pdf["doc_id"], pdf["text"])}
    assert got == want


def test_ngram_df_cap_bounds_candidates(spark):
    """A pathological stop-shingle shared by every doc must not blow up
    candidate generation when max_shingle_df is set: pairs whose ONLY
    shared shingle is the ubiquitous one disappear, while truly similar
    pairs keep their EXACT Jaccard values (full shingle sets)."""
    from cianparser_spark.ops.dedup import ngram_jaccard_pairs

    stop = "в хорошем состоянии"
    rows = [(i, f"{stop} вариант {i} уникальный текст номер {i}") for i in range(20)]
    rows += [(100, f"{stop} редкая фраза про дом у озера"),
             (101, f"{stop} редкая фраза про дом у озера")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=None).collect()
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=5).collect()
    # the PRODUCTION DEFAULT (1000) also bounds this corpus's ubiquitous
    # shingle... but 22 docs < 1000, so the default equals exact here —
    # assert that equivalence explicitly (small-corpus invariance)
    default = ngram_jaccard_pairs(docs, threshold=0.01).collect()
    assert sorted((r["left_id"], r["right_id"]) for r in default) == \
        sorted((r["left_id"], r["right_id"]) for r in uncapped)
    # uncapped: every pair shares the stop-shingle → quadratic pair count
    assert len(uncapped) == (22 * 21) // 2
    # capped: only the genuinely-similar pair survives candidate gen
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"] for r in capped}
    assert set(pairs) == {(100, 101)}
    # and its Jaccard is the EXACT full-set value (1.0 for identical)
    assert pairs[(100, 101)] == pytest.approx(1.0)


def test_ann_index_reuse_matches_per_query_path(spark, emb):
    """build_lsh_index / build_ivf_index: one persisted assignment pass
    serves many queries with identical results to the per-query path."""
    from cianparser_spark.ops.similarity import (
        build_ivf_index, build_lsh_index, ivf_topk, lsh_topk)

    q0 = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    q1 = [float(x) for x in emb.filter(F.col("vec_id") == 1).head()["embedding"]]

    lsh_idx = build_lsh_index(emb)
    ivf_idx = build_ivf_index(emb)
    try:
        for q in (q0, q1):
            direct = [(r["vec_id"], round(r["cosine"], 9))
                      for r in lsh_topk(emb, q, k=10).collect()]
            via_idx = [(r["vec_id"], round(r["cosine"], 9))
                       for r in lsh_topk(None, q, k=10, index=lsh_idx).collect()]
            assert direct == via_idx
            direct = [(r["vec_id"], round(r["cosine"], 9))
                      for r in ivf_topk(emb, q, k=10, nprobe=8).collect()]
            via_idx = [(r["vec_id"], round(r["cosine"], 9))
                       for r in ivf_topk(None, q, k=10, nprobe=8, index=ivf_idx).collect()]
            assert direct == via_idx
    finally:
        lsh_idx.unpersist()
        ivf_idx[0].unpersist()


def test_cosine_near_pairs_bucketed_default_is_subset(spark, emb):
    """The scale-safe default (lsh_buckets=16) yields a SUBSET of the
    all-pairs scan, and near-identical vectors still pair up."""
    from cianparser_spark.ops.dedup import cosine_near_pairs

    dup = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 100000)
    both = emb.unionByName(dup)
    allp = {(r["left_id"], r["right_id"]) for r in
            cosine_near_pairs(both, threshold=0.9999, lsh_buckets=None).collect()}
    bucketed = {(r["left_id"], r["right_id"]) for r in
                cosine_near_pairs(both, threshold=0.9999).collect()}
    assert bucketed <= allp
    # exact duplicates share every hyperplane sign → always same bucket
    assert {(i, i + 100000) for i in range(5)} <= bucketed


def test_pii_scrub_patterns_and_precedence(spark):
    """Typed placeholders, counts on the original text, and the pinned
    cc-before-phone precedence (a 16-digit run is [CC], never a phone
    tail)."""
    from cianparser_spark.ops.text import pii_scrub

    rows = [
        (1, "mail a.b+c@ex-ample.org and x@y.io now"),
        (2, "server at 192.168.0.1 and 10.0.0.255 up"),
        (3, "card 4111222233334444 paid"),
        (4, "call +79161234567 or +123456789 today"),
        (5, "clean text, nothing to scrub"),
        (6, "mixed u@v.de 1.2.3.4 4000111122223333 +987654321 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["scrubbed"] == "mail [EMAIL] and [EMAIL] now"
    assert got[2]["n_ip"] == 2 and got[2]["scrubbed"] == "server at [IP] and [IP] up"
    assert got[3]["n_cc"] == 1 and got[3]["n_phone"] == 0
    assert got[3]["scrubbed"] == "card [CC] paid"
    assert got[4]["n_phone"] == 2 and got[4]["scrubbed"] == "call [PHONE] or [PHONE] today"
    assert got[5] == {"doc_id": 5, "n_email": 0, "n_ip": 0, "n_cc": 0,
                      "n_phone": 0, "scrubbed": "clean text, nothing to scrub"}
    assert got[6]["scrubbed"] == "mixed [EMAIL] [IP] [CC] [PHONE] end"


def test_video_mjpg_container(spark):
    """A real Motion-JPEG AVI (per-frame baseline JFIF, corpus.jpegbase)
    demuxes AND decodes through the Spark operator: sampled frames come
    back PSNR>=40 vs the generator pixels.  XVID stays the honest
    NotImplementedError boundary."""
    import numpy as np
    import pytest

    from cianparser_spark.corpus import aviriff, imaging
    from cianparser_spark.ops.multimodal import frame_sample, make_synthetic_video

    vids = make_synthetic_video(spark, n_videos=2, frames=8, fmt="mjpg")
    rows = frame_sample(vids, every=4).collect()
    assert len(rows) == 2 * 2 and {r["frame_index"] for r in rows} == {0, 4}
    for r in rows:
        v = int(r["video_id"][3:])
        want = imaging.gen_pixels(v * 1000 + r["frame_index"], 32, 32)
        got = imaging.png_decode(bytes(r["bytes"]))
        assert got.shape == want.shape
        assert imaging.psnr(want, got) >= 40.0
    # pure-python twin agrees: demux + frame_decode matches directly
    px = [imaging.gen_pixels(i + 7, 24, 20) for i in range(3)]
    blob = aviriff.avi_encode(px, fps=10, codec="mjpg")
    meta, raw = aviriff.avi_demux(blob)
    assert meta.fourcc == b"MJPG" and len(raw) == 3
    for i in range(3):
        assert imaging.psnr(aviriff.frame_decode(raw[i], meta), px[i]) >= 40.0
    # an unknown compressed fourcc still refuses to decode
    xvid_meta = aviriff.AviMeta(**{**meta.__dict__, "fourcc": b"XVID",
                                   "compression": 0x44495658})
    with pytest.raises(NotImplementedError):
        aviriff.frame_decode(raw[0], xvid_meta)


def test_adpcm_vectorized_matches_scalar_reference():
    """The across-block-vectorized IMA and MS ADPCM decoders are
    bit-exact vs straight-from-spec scalar sample-at-a-time reference
    decoders, over random and smooth payloads of many lengths
    (including tail-padded final blocks)."""
    import struct

    import numpy as np

    from cianparser_spark.corpus import riffwav as R

    def ima_ref(payload, block_align, n_samples):
        out = []
        for b in range(len(payload) // block_align):
            blk = payload[b * block_align:(b + 1) * block_align]
            pred, index, _ = struct.unpack("<hBB", blk[:4])
            out.append(pred)
            nibs = []
            for byte in blk[4:]:
                nibs.append(byte & 0xF)
                nibs.append(byte >> 4)
            for nib in nibs:
                step = int(R.IMA_STEP_TABLE[index])
                delta = step >> 3
                if nib & 1:
                    delta += step >> 2
                if nib & 2:
                    delta += step >> 1
                if nib & 4:
                    delta += step
                pred = pred - delta if nib & 8 else pred + delta
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + int(R.IMA_INDEX_TABLE[nib & 7])))
                out.append(pred)
        return np.array(out[:n_samples], dtype=np.int16)

    def ms_ref(payload, block_align, n_samples):
        out = []
        for b in range(len(payload) // block_align):
            blk = payload[b * block_align:(b + 1) * block_align]
            ci, delta, s1, s2 = struct.unpack("<Bhhh", blk[:7])
            c1, c2 = int(R.MS_COEFS[ci, 0]), int(R.MS_COEFS[ci, 1])
            out.append(s2)
            out.append(s1)
            nibs = []
            for byte in blk[7:]:
                nibs.append(byte >> 4)
                nibs.append(byte & 0xF)
            for nib in nibs:
                signed = nib - 16 if nib >= 8 else nib
                pred = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
                pred = max(-32768, min(32767, pred))
                out.append(pred)
                delta = max((int(R.MS_ADAPT[nib]) * delta) >> 8, 16)
                s2, s1 = s1, pred
        return np.array(out[:n_samples], dtype=np.int16)

    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(1, 3000))
        if trial % 2:
            t = np.arange(n)
            x = (np.sin(t / 20.0) * 12000 + np.sin(t / 7.0) * 5000).astype(np.int16)
        else:
            x = rng.integers(-32768, 32768, n).astype(np.int16)
        pay = R.ima_adpcm_encode(x, 256)
        assert np.array_equal(R.ima_adpcm_decode(pay, 256, n), ima_ref(pay, 256, n))
        pay = R.ms_adpcm_encode(x, 256)
        assert np.array_equal(R.ms_adpcm_decode(pay, 256, n), ms_ref(pay, 256, n))


def test_wav_extended_codecs_round_trip():
    """IEEE float-32 round-trips exactly; IMA/MS ADPCM round-trip a
    smooth signal at >=30 dB SNR with the true sample count restored
    via the fact chunk (block padding trimmed)."""
    import numpy as np

    from cianparser_spark.corpus import riffwav as R

    t = np.arange(4001)  # odd length → padded final ADPCM block
    x = (np.sin(t / 25.0) * 11000 + np.sin(t / 9.0) * 6000).astype(np.int16)
    for codec, name, min_snr in (("f32", "f32", None),
                                 ("ima", "ima_adpcm", 30.0),
                                 ("ms", "ms_adpcm", 30.0)):
        wav = R.wav_encode(x, 8000, codec)
        y, sr, got = R.wav_parse(wav)
        assert sr == 8000 and got == name and len(y) == len(x)
        if min_snr is None:
            assert np.allclose(y * 32767.0, x, atol=1e-3)
        else:
            err = y * 32767.0 - x
            snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2) / np.mean(err ** 2))
            assert snr >= min_snr, snr


def test_audio_features_adpcm_wav(spark):
    """The distributed audio operator decodes IMA/MS ADPCM and IEEE
    float WAV containers end to end: ok=true for every row, features
    equal to the pure-Python decode of the same container bytes."""
    import numpy as np

    from cianparser_spark.corpus import riffwav as R
    from cianparser_spark.ops.multimodal import (
        audio_feature_dict, audio_features, make_synthetic_audio)

    for fmt in ("wav_f32", "wav_ima", "wav_ms"):
        aud = make_synthetic_audio(spark, n_clips=4, seconds=0.25, fmt=fmt)
        fixture = {r["audio_id"]: bytes(r["bytes"]) for r in aud.collect()}
        got = {r["audio_id"]: r for r in audio_features(aud).collect()}
        assert len(got) == 4
        for aid, blob in fixture.items():
            x, sr, _ = R.wav_parse(blob)
            want = audio_feature_dict(x, sr)
            row = got[aid]
            assert row["ok"] is True
            for k, v in want.items():
                assert abs(row[k] - v) < 1e-9, (fmt, aid, k)


def test_flac_codec_round_trip_and_structure():
    """FLAC subset codec (corpus/flacsub): bit-exact lossless
    round-trip on tonal clips (LPC wins and genuinely compresses),
    constant and noise clips, multi-frame streams with multi-byte
    UTF-8-coded frame numbers, and spec structure (fLaC magic,
    STREAMINFO layout, per-frame sync codes)."""
    import struct

    import numpy as np

    from cianparser_spark.corpus import flacsub
    from cianparser_spark.ops.multimodal import synth_pcm16

    for i in range(3):
        x = synth_pcm16(i, 8000, 2000)
        blob = flacsub.flac_encode(x, 8000)
        assert blob[:4] == b"fLaC"
        # STREAMINFO: block header (last, type 0, len 34) then 34 bytes
        assert blob[4] == 0x80 and struct.unpack(">I", b"\0" + blob[5:8])[0] == 34
        y, sr, bps = flacsub.flac_decode(blob)
        assert (sr, bps) == (8000, 16)
        assert np.array_equal(y, x.astype(np.int32))
        assert len(blob) < 0.75 * 2 * len(x)  # really compresses (LPC path)
        assert blob[42] == 0xFF and blob[43] & 0xFC == 0xF8  # frame sync
    # multi-frame with >0x7F frames: exercises the UTF-8 coded numbers
    x = synth_pcm16(5, 8000, 40000)
    blob = flacsub.flac_encode(x, 8000, block_size=192)
    y, _, _ = flacsub.flac_decode(blob)
    assert np.array_equal(y, x.astype(np.int32))
    # constant / tiny / noise clips
    rng = np.random.default_rng(2)
    for arr in (np.zeros(300, np.int16), np.full(10, -5, np.int16),
                np.array([7], np.int16),
                rng.integers(-32768, 32768, 500).astype(np.int16)):
        got, _, _ = flacsub.flac_decode(flacsub.flac_encode(arr, 8000))
        assert np.array_equal(got, arr.astype(np.int32))


def test_flac_rejects_corruption():
    """Every integrity layer trips: frame-body corruption (CRC-16),
    header corruption (CRC-8 or lost sync), bad magic, truncation."""
    import pytest
    import numpy as np

    from cianparser_spark.corpus import flacsub
    from cianparser_spark.ops.multimodal import synth_pcm16

    blob = flacsub.flac_encode(synth_pcm16(2, 8000, 2000), 8000)
    body = bytearray(blob)
    body[len(body) // 2] ^= 0x01
    with pytest.raises(ValueError):
        flacsub.flac_decode(bytes(body))
    hdr = bytearray(blob)
    hdr[46] ^= 0x01  # inside the first frame header
    with pytest.raises(ValueError):
        flacsub.flac_decode(bytes(hdr))
    with pytest.raises(ValueError):
        flacsub.flac_decode(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        flacsub.flac_decode(blob[: len(blob) - 10])


def test_audio_features_flac_spark(spark):
    """fmt='flac' end to end through the distributed decode: features
    equal the pure-Python decode of the same bytes; mp3 stays an
    honest ok=false stub."""
    import numpy as np

    from cianparser_spark.corpus import flacsub
    from cianparser_spark.ops.multimodal import (
        audio_feature_dict, audio_features, make_synthetic_audio, synth_pcm16)

    aud = make_synthetic_audio(spark, n_clips=4, seconds=0.25, fmt="flac")
    got = {r["audio_id"]: r for r in audio_features(aud).collect()}
    sr, n = 8000, 2000
    for i in range(4):
        x, _ = flacsub.flac_parse(flacsub.flac_encode(synth_pcm16(i, sr, n), sr))
        want = audio_feature_dict(x, sr)
        r = got[f"aud{i:04d}"]
        assert r["ok"] is True
        for k, v in want.items():
            assert abs(r[k] - v) < 1e-9
    stub = spark.createDataFrame(
        [("m0", b"\xffID3", sr, n, "mp3")],
        "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string")
    assert audio_features(stub).collect()[0]["ok"] is False


def test_mp3_scan_framing():
    """MPEG-1 Layer III frame walk: CBR with ID3+padding, VBR with
    Xing, MPEG-2 LSF framing, and corruption/truncation rejection."""
    import struct

    import pytest

    from cianparser_spark.corpus import mpegaudio as m

    s = m.mp3_scan(m.mp3_build(3, n_frames=30, bitrate_kbps=128,
                               sr=44100, id3_size=77))
    assert (s["n_frames"], s["bitrate_kbps"], s["vbr"]) == (30, 128, False)
    assert s["id3v2_bytes"] == 87 and s["sample_rate"] == 44100
    assert abs(s["duration_s"] - 30 * 1152 / 44100) < 1e-9
    s = m.mp3_scan(m.mp3_build(5, n_frames=40, sr=32000, mode="mono",
                               xing=True, vbr_rates=(96, 128, 160)))
    assert s["vbr"] and s["bitrate_kbps"] is None and s["xing_frames"] == 40
    assert s["channel_mode"] == "mono"
    # hand-built MPEG-2 LSF frame (version bits 10, 576 samples/frame)
    hw = ((0x7FF << 21) | (0b10 << 19) | (0b01 << 17) | (1 << 16)
          | (4 << 12) | (1 << 10) | (3 << 6))  # 32kbps idx4, 24000Hz, mono
    flen = 72 * 32000 // 24000
    frame = struct.pack(">I", hw) + bytes(flen - 4)
    s = m.mp3_scan(frame * 3)
    assert s["n_frames"] == 3 and s["sample_rate"] == 24000
    assert abs(s["duration_s"] - 3 * 576 / 24000) < 1e-9
    blob = bytearray(m.mp3_build(1, n_frames=5))
    second = m._frame_len(1, 128, 44100, 1)  # seed=1: first frame padded
    blob[second] = 0x00
    with pytest.raises(ValueError):
        m.mp3_scan(bytes(blob))
    with pytest.raises(ValueError):
        m.mp3_scan(m.mp3_build(1, n_frames=5)[:-3])


def test_ogg_demux_paging():
    """Ogg page walk: packet reassembly across pages and 255-lacing
    boundaries, per-page CRC-32 verification, BOS/EOS flags, Vorbis
    ident parse; CRC/capture/sequence corruption all raise."""
    import pytest

    from cianparser_spark.corpus import oggdemux as o

    pk = [b"", b"a", b"x" * 254, b"y" * 255, b"z" * 256, b"q" * 765,
          bytes(range(256)) * 40]
    d = o.ogg_demux(o.ogg_build(pk, max_segs_per_page=7))
    assert d["packets"] == pk and d["bos"] and d["eos"]
    ident = o.vorbis_ident_build(2, 44100)
    blob = o.ogg_build([ident, b"\x03vorbis-comment", b"\x05vorbis-setup"])
    v = o.vorbis_ident_parse(o.ogg_demux(blob)["packets"][0])
    assert (v["channels"], v["sample_rate"]) == (2, 44100)
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        o.ogg_demux(bytes(bad))
    with pytest.raises(ValueError):
        o.ogg_demux(b"XggS" + blob[4:])


def test_audio_meta_scan_spark(spark):
    """The distributed container scan matches the shared pure-Python
    per-clip definition for every fixture clip, and a JVM-corrupted Ogg
    clip degrades to ok=false instead of failing the task."""
    from pyspark.sql import functions as F

    from cianparser_spark.ops.multimodal import (
        audio_meta_scan, make_synthetic_compressed_audio, mp3_clip_build,
        ogg_clip_build, scan_clip_meta)

    clips = make_synthetic_compressed_audio(spark, n_clips=8)
    got = {r["audio_id"]: r.asDict() for r in audio_meta_scan(clips).collect()}
    assert len(got) == 8
    for i in range(8):
        fmt = "mp3" if i % 2 == 0 else "ogg"
        blob = mp3_clip_build(i) if fmt == "mp3" else ogg_clip_build(i)
        want = scan_clip_meta(blob, fmt)
        row = got[f"cmp{i:04d}"]
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(row[k] - v) < 1e-9, (i, k)
            else:
                assert row[k] == v, (i, k)
    corrupted = clips.filter(F.col("fmt") == "ogg").withColumn(
        "bytes", F.expr("substring(bytes, 1, 40)"))
    rows = audio_meta_scan(corrupted).collect()
    assert rows and all(not r["ok"] for r in rows)


def test_sampling_ops(spark):
    """split_stratified: deterministic, per-stratum fractions honored,
    stable under re-run and row addition, map-only plan (no exchange);
    domain_cap: ≤cap rows per group, deterministic representatives,
    exactly one exchange on the group key."""
    from pyspark.sql import functions as F

    from cianparser_spark.ops.sampling import domain_cap, split_stratified

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fr = {"en": (0.5, 0.2)}
    s1 = split_stratified(docs, "doc_id", "lang", fr, default=(0.0, 0.0))
    rows = {r["doc_id"]: (r["split"], r["u"]) for r in s1.collect()}
    s2 = {r["doc_id"]: (r["split"], r["u"])
          for r in split_stratified(docs, "doc_id", "lang", fr,
                                    default=(0.0, 0.0)).collect()}
    assert rows == s2  # deterministic
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    for did, (split, u) in rows.items():
        if langs[did] == "en":
            want = "val" if u < 0.5 else ("test" if u < 0.7 else "train")
        else:
            want = "train"  # default (0,0): everything trains
        assert split == want, (did, langs[did], u, split, want)
    # subsetting the input never moves surviving rows (pure fn of id)
    sub = {r["doc_id"]: r["split"]
           for r in split_stratified(docs.limit(50), "doc_id", "lang", fr,
                                     default=(0.0, 0.0)).collect()}
    assert all(rows[d][0] == s for d, s in sub.items())
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: scan-level expression
    # changing the salt re-deals
    s3 = {r["doc_id"]: r["split"]
          for r in split_stratified(docs, "doc_id", "lang", fr, salt="other",
                                    default=(0.0, 0.0)).collect()}
    assert any(s3[d] != rows[d][0] for d in rows)

    capped = domain_cap(docs, "source", "doc_id", 3)
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    got = {(r["source"], r["grp_rank"]): r["doc_id"] for r in capped.collect()}
    # representatives = the cap smallest doc_ids per source
    import collections
    by_src = collections.defaultdict(list)
    for r in docs.select("doc_id", "source").collect():
        by_src[r["source"]].append(r["doc_id"])
    for src, ids in by_src.items():
        for k, did in enumerate(sorted(ids)[:3], start=1):
            assert got[(src, k)] == did
    # one shuffle on the cap key, and Spark 4's WindowGroupLimit caps
    # MAP-SIDE before the exchange (partial top-k) — the skew bound
    plan = capped._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE repeats the tree
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan


def test_pq_topk_recall_and_determinism(spark, emb):
    """PQ-ADC top-k: recall against the exact L2 top-15 (random 64-dim
    vectors are quantization's worst case — bounds measured and pinned,
    everything is seeded so they cannot drift), and the codes/ADC path
    is deterministic across runs."""
    from cianparser_spark.ops.similarity import build_pq_index, pq_topk

    idx = build_pq_index(emb)
    try:
        recalls = []
        for qid in (0, 7, 33, 101, 250):
            qvec = [float(x)
                    for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]]
            qarr = F.array(*[F.lit(v) for v in qvec])
            exact = (emb.select(
                        "vec_id",
                        F.aggregate(
                            F.zip_with(F.col("embedding"), qarr,
                                       lambda a, b: (a - b) * (a - b)),
                            F.lit(0.0), lambda a, x: a + x).alias("d"))
                        .orderBy("d", "vec_id").limit(15).collect())
            approx = pq_topk(None, qvec, k=15, index=idx).collect()
            got = {r["vec_id"] for r in approx}
            recalls.append(len({r["vec_id"] for r in exact} & got) / 15)
        assert min(recalls) >= 0.25
        assert sum(recalls) / len(recalls) >= 0.4
        # determinism: a second independent build reproduces row-for-row
        q0 = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
        a = [(r["vec_id"], r["adc_dist"]) for r in pq_topk(emb, q0, k=15).collect()]
        b = [(r["vec_id"], r["adc_dist"])
             for r in pq_topk(None, q0, k=15, index=idx).collect()]
        assert a == b
    finally:
        idx[0].unpersist()


def test_pq_train_guards(spark, emb):
    """dim % m and the dsub<8 cross-engine determinism contract are
    enforced at train time."""
    import pytest as _pytest

    from cianparser_spark.ops.similarity import pq_train

    with _pytest.raises(ValueError):
        pq_train(emb, m=7)           # 64 % 7 != 0
    with _pytest.raises(ValueError):
        pq_train(emb, m=8)           # dsub=8 breaks sequential-sum contract


def test_incremental_lsh_matches_full_cross_scan(spark, docs):
    """The banded probe of a prebuilt corpus index reproduces the EXACT
    batch×corpus Jaccard-at-threshold scan (recall 100% at t=0.2 with
    the shipped band config on this corpus), and never emits a
    corpus-side left_id."""
    from cianparser_spark.ops.dedup import (
        build_dedup_index, incremental_lsh_pairs)

    cut = 400
    corpus = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    idx = build_dedup_index(corpus)
    try:
        got = {(r["left_id"], r["right_id"], round(r["jaccard"], 9))
               for r in incremental_lsh_pairs(batch, corpus, idx,
                                              threshold=0.2).collect()}
    finally:
        idx.unpersist()
    assert all(l >= cut > r for l, r, _ in got)
    # exact cross scan via the shingle co-occurrence join
    from cianparser_spark.ops.dedup import shingle_df

    sh = shingle_df(docs, 3)
    sizes = {r["doc_id"]: r["n"]
             for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    l = sh.filter(F.col("doc_id") >= cut).withColumnRenamed("doc_id", "left_id")
    r = sh.filter(F.col("doc_id") < cut).withColumnRenamed("doc_id", "right_id")
    inter = (l.join(r, "shingle").groupBy("left_id", "right_id")
              .agg(F.count("*").alias("i")).collect())
    want = set()
    for row in inter:
        j = row["i"] / (sizes[row["left_id"]] + sizes[row["right_id"]] - row["i"])
        if j >= 0.2:
            want.add((row["left_id"], row["right_id"], round(j, 9)))
    assert got == want and len(want) > 0


def test_decontaminate_hand_built(spark):
    from cianparser_spark.ops.text import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # contains bench 4-grams
            (2, "x y z w"),              # clean, one 4-gram
            (3, "a b"),                  # < n words -> zero grams, clean
            (4, "c d e f g h c d e f"),  # repeated gram counted ONCE
            (5, ""),                     # empty -> zero grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q q a b c d e f q q")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=4).collect()}
    assert got[1]["n_ngrams"] == 3 and got[1]["n_contaminated"] == 3
    assert got[1]["contaminated"] == 1 and got[1]["first_hit"] == "a b c d"
    assert got[2]["n_contaminated"] == 0 and got[2]["contaminated"] == 0
    assert got[2]["first_hit"] == ""
    assert got[3]["n_ngrams"] == 0 and got[3]["contaminated"] == 0
    # doc 4: distinct grams only — 'c d e f' matches once
    assert got[4]["n_contaminated"] == 1 and got[4]["first_hit"] == "c d e f"
    assert got[5]["n_ngrams"] == 0 and got[5]["contaminated"] == 0


def _rep_python(text):
    """Pure-Python twin of repetition_stats for one doc."""
    import math

    def r6(x):  # HALF_UP like Spark/DuckDB round(), not banker's
        return math.floor(x * 1e6 + 0.5) / 1e6

    ws = text.strip().split()
    nw, nc = len(ws), len(text.strip())
    g2 = [" ".join(ws[i:i + 2]) for i in range(nw - 1)] if nw >= 2 else []
    g3 = [" ".join(ws[i:i + 3]) for i in range(nw - 2)] if nw >= 3 else []

    def dup(arr):
        return r6(1.0 - len(set(arr)) / len(arr)) if arr else 0.0

    if g2:
        from collections import Counter
        cnt = Counter(g2)
        best = max(cnt.values())
        topg = min(g for g, c in cnt.items() if c == best)
        cf = r6(best * len(topg) / max(nc, 1))
    else:
        best, topg, cf = 0, "", 0.0
    dw, d2 = dup(ws), dup(g2)
    rep = 1 if (dw > 0.85 or d2 > 0.6 or cf > 0.1) else 0
    return (nw, dw, d2, dup(g3), topg, best, cf, rep)


def test_repetition_stats_matches_python(spark, docs):
    from cianparser_spark.ops.text import repetition_stats

    sample = docs.filter(F.col("doc_id") < 120)
    got = {r["doc_id"]: r for r in repetition_stats(sample).collect()}
    for r in sample.select("doc_id", "text").collect():
        nw, dw, d2, d3, topg, best, cf, rep = _rep_python(r["text"])
        g = got[r["doc_id"]]
        assert g["n_words"] == nw
        assert abs(g["dup_word_frac"] - dw) < 1e-9
        assert abs(g["dup_2gram_frac"] - d2) < 1e-9
        assert abs(g["dup_3gram_frac"] - d3) < 1e-9
        assert g["top_2gram"] == topg and g["top_2gram_count"] == best
        assert abs(g["top_2gram_char_frac"] - cf) < 1e-9
        assert g["repetitive"] == rep


def test_repetition_stats_pathological(spark):
    from cianparser_spark.ops.text import repetition_stats

    rows = [
        (1, "spam " * 50),            # one word repeated
        (2, "a b " * 30),             # alternating pair
        (3, "w"),                     # single word, no 2-grams
        (4, ""),                      # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["repetitive"] == 1 and got[1]["top_2gram"] == "spam spam"
    assert got[1]["top_2gram_count"] == 49
    assert got[2]["repetitive"] == 1
    assert got[3]["n_words"] == 1 and got[3]["top_2gram"] == ""
    assert got[3]["repetitive"] == 0
    assert got[4]["n_words"] == 0 and got[4]["dup_word_frac"] == 0.0


def test_bm25_matches_python_twin(spark, docs):
    from cianparser_spark.ops.text import bm25_topk

    qs = spark.createDataFrame(
        [(1, "key table scan"), (2, "hash join MERGE")],
        "query_id long, query string")
    got = bm25_topk(docs, qs, k=5).collect()

    import math
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().lower().split() for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    queries = {1: ["key", "table", "scan"], 2: ["hash", "join", "merge"]}

    def score(qid, did):
        s = 0.0
        for term in queries[qid]:
            tf = toks[did].count(term)
            if tf == 0:
                continue
            df = sum(1 for t in toks.values() if term in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[did]) / avgdl))
        return math.floor(s * 1e6 + 0.5) / 1e6  # HALF_UP like Spark round

    for qid in queries:
        want = sorted(((score(qid, d), d) for d in toks),
                      key=lambda x: (-x[0], x[1]))[:5]
        mine = [(r["score"], r["doc_id"]) for r in got if r["query_id"] == qid]
        assert mine == want, (qid, mine, want)


def test_pack_sequences_invariants(spark, docs):
    from cianparser_spark.ops.text import pack_sequences

    a = pack_sequences(docs, seq_len=64, partitions=2).orderBy("doc_id").collect()
    b = pack_sequences(docs, seq_len=64, partitions=7).orderBy("doc_id").collect()
    assert a == b  # phase split invisible
    pos = 0
    for r in a:
        assert r["start_tok"] == pos  # contiguous global stream
        pos += r["n_tokens"]
        assert r["bin_first"] == r["start_tok"] // 64
        end = r["start_tok"] + r["n_tokens"]
        want_last = (end - 1) // 64 if r["n_tokens"] else r["bin_first"]
        assert r["bin_last"] == want_last
        assert r["crosses"] == (1 if r["bin_last"] > r["bin_first"] else 0)


def test_pack_sequences_oversized_and_empty(spark):
    from cianparser_spark.ops.text import pack_sequences

    df = spark.createDataFrame(
        [(1, "w " * 200), (2, ""), (3, "a b c")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, seq_len=64).collect()}
    assert got[1]["bin_first"] == 0 and got[1]["bin_last"] == 3  # 200 toks
    assert got[1]["crosses"] == 1
    assert got[2]["n_tokens"] == 0 and got[2]["crosses"] == 0
    assert got[2]["bin_first"] == got[2]["bin_last"] == 200 // 64
    assert got[3]["start_tok"] == 200


def test_ngram_expr_edges(spark):
    from cianparser_spark.ops.text import ngram_expr

    rows = [(1, ""), (2, "one"), (3, "a b c"), (4, "a b"),
            (5, "a  b\t c \n d"), (6, "  lead trail  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["g"] for r in
           df.select("doc_id", ngram_expr("text", 3).alias("g")).collect()}
    assert got[1] == [] and got[2] == [] and got[4] == []
    assert got[3] == ["a b c"]
    assert got[5] == ["a b c", "b c d"]  # whitespace runs collapse
    assert got[6] == []                  # 2 words < n


def test_mixture_sample_matches_python(spark, docs):
    import hashlib
    from cianparser_spark.ops.sampling import mixture_sample

    got = mixture_sample(docs, "source", "doc_id", size_col="n_chars",
                         alpha=0.5, target=200, salt="mix-v1").collect()
    rows = docs.select("doc_id", "source", "n_chars").collect()
    w = {}
    n = {}
    for r in rows:
        w[r["source"]] = w.get(r["source"], 0) + r["n_chars"]
        n[r["source"]] = n.get(r["source"], 0) + 1
    z = sum(v ** 0.5 for v in w.values())
    rate = {s: min(1.0, 200.0 * (w[s] ** 0.5 / z) / n[s]) for s in w}

    def uni(doc_id):
        h = hashlib.md5(f"{doc_id}mix-v1".encode()).hexdigest()[:12]
        return int(h, 16) / float(16 ** 12)

    for r in got:
        assert abs(r["rate"] - round(rate[r["source"]], 6)) < 1e-9
        assert r["selected"] == (1 if uni(r["doc_id"]) < rate[r["source"]] else 0)
    # the realized sample lands near the target
    assert 150 <= sum(r["selected"] for r in got) <= 250


def test_salted_join_equals_plain(spark):
    from cianparser_spark.ops.joins import salted_join

    # one mega-hot key (9000 of 10000 rows) + a tail
    fact = spark.range(0, 10000).select(
        F.when(F.col("id") < 9000, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("row_id"))
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v"))
    got = salted_join(fact, dim, "k", ["row_id"], buckets=8)
    assert "_salt" not in got.columns
    plain = fact.join(dim, "k")
    a = sorted((r["k"], r["row_id"], r["v"]) for r in got.collect())
    b = sorted((r["k"], r["row_id"], r["v"]) for r in plain.collect())
    assert a == b and len(a) == 10000


def test_salted_join_left_and_guard(spark):
    import pytest as _pytest

    from cianparser_spark.ops.joins import salted_join

    fact = spark.createDataFrame([(1, 10), (2, 20), (99, 30)],
                                 "k long, row_id long")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    left = salted_join(fact, dim, "k", ["row_id"], buckets=4, how="left")
    rows = sorted((r["k"], r["v"]) for r in left.collect())
    assert rows == [(1, "a"), (2, "b"), (99, None)]  # unmatched row once
    with _pytest.raises(ValueError):
        salted_join(fact, dim, "k", ["row_id"], how="full")
    with _pytest.raises(ValueError):
        salted_join(fact, dim, "k", ["row_id"], how="right")


# ------------------------------------------------- chunk dedup / BPE

def test_chunk_dedup_first_wins_semantics(spark):
    from cianparser_spark.ops.text import chunk_dedup

    # chunk=3: doc 1 = [A][A][B-partial], doc 2 = [A][C] — the repeated
    # 3-token span "x y z" survives only at its first occurrence
    rows = [
        (1, "x y z x y z tail1 tail2"),
        (2, "x y z u v w"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chunk_dedup(df, chunk=3).collect()}
    assert got[1]["n_chunks"] == 3 and got[1]["n_kept"] == 2
    assert got[1]["n_removed"] == 1
    assert got[2]["n_chunks"] == 2 and got[2]["n_kept"] == 1  # "x y z" dropped
    assert got[3]["n_chunks"] == 0 and got[3]["n_removed"] == 0
    import hashlib
    assert got[1]["clean_md5"] == hashlib.md5(
        b"x y z tail1 tail2").hexdigest()
    assert got[2]["clean_md5"] == hashlib.md5(b"u v w").hexdigest()
    assert got[3]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_chunk_dedup_kept_spans_globally_unique(spark, docs):
    """Corpus property: after dedup no 10-token span text survives
    twice, and per-doc counts add up."""
    from cianparser_spark.ops.text import chunk_dedup

    out = chunk_dedup(docs, chunk=10)
    agg = out.agg(
        F.sum("n_chunks").alias("nc"), F.sum("n_kept").alias("nk"),
        F.sum("n_removed").alias("nr")).collect()[0]
    assert agg["nc"] == agg["nk"] + agg["nr"] and agg["nr"] > 0
    assert out.count() == docs.count()


def _bpe_python(texts, n_merges):
    import re
    from collections import Counter

    wc = Counter(w for t in texts
                 for w in re.findall(r"\S+", t, flags=re.ASCII))
    vocab = {w: list(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, c in wc.items():
            p = vocab[w]
            for i in range(len(p) - 1):
                pc[(p[i], p[i + 1])] += c
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n))
        for w, p in vocab.items():
            out = []
            for x in p:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_python_twin(spark, docs):
    from cianparser_spark.ops.text import bpe_train

    sample = docs.filter(F.col("doc_id") < 150)
    merges, vocab = bpe_train(sample, n_merges=6)
    texts = [r["text"] for r in sample.select("text").collect()]
    pm, pv = _bpe_python(texts, 6)
    assert merges == pm
    got = {r["word"]: r["pieces"] for r in vocab.collect()}
    assert got == pv
    vocab.unpersist()


def test_bpe_merge_fold_greedy_overlap(spark):
    """Greedy left-to-right: 'aaaa' under merge (a,a) -> [aa, aa];
    'aaa' -> [aa, a] — merged output never re-merges in the same pass."""
    from cianparser_spark.ops.text import _merge_pair_expr

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("ba",)], "w string")
    out = {r["w"]: r["m"] for r in df.select(
        "w", _merge_pair_expr(F.split(F.col("w"), ""), "a", "a").alias("m")
    ).collect()}
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["ba"] == ["b", "a"]


def test_bpe_token_counts_apply(spark, docs):
    """Corpus apply of a trained vocab: every word in-vocab (trained on
    the same corpus), so n_bpe_tokens == sum of per-word piece counts;
    OOV words in a probe frame fall back to character count."""
    from cianparser_spark.ops.text import bpe_token_counts, bpe_train

    sample = docs.filter(F.col("doc_id") < 100)
    merges, vocab = bpe_train(sample, n_merges=4)
    out = bpe_token_counts(sample, vocab)
    pieces = {r["word"]: len(r["pieces"]) for r in vocab.collect()}
    import re
    for r in sample.select("doc_id", "text").collect():
        ws = [w for w in re.split(r"\s+", r["text"].strip()) if w]
        want = sum(pieces[w] for w in ws)
        got = out.filter(F.col("doc_id") == r["doc_id"]).collect()[0]
        assert got["n_words"] == len(ws)
        assert got["n_bpe_tokens"] == want
        break  # one exact row is enough; aggregate check below
    agg = out.agg(F.sum("n_bpe_tokens").alias("t"), F.sum("n_words").alias("w")).collect()[0]
    assert agg["t"] >= agg["w"]
    probe = spark.createDataFrame([(999999, "zzz-unseen-word")],
                                  "doc_id long, text string")
    oov = bpe_token_counts(probe, vocab).collect()[0]
    assert oov["n_bpe_tokens"] == len("zzz-unseen-word")
    vocab.unpersist()


def test_epoch_shuffle_permutation(spark, docs):
    """Valid permutation (pos = 0..n-1 exactly once), balanced shards,
    partitioning-invariant, and salt re-deals the order."""
    from cianparser_spark.ops.sampling import epoch_shuffle

    out = epoch_shuffle(docs, n_shards=8).toPandas()
    n = len(out)
    assert sorted(out["pos"]) == list(range(n))
    sizes = out.groupby("shard").size()
    assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1
    re = epoch_shuffle(docs.repartition(5), n_shards=8) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    base = out.sort_values("doc_id").reset_index(drop=True)
    assert base.equals(re)
    other = epoch_shuffle(docs, salt="epoch1", n_shards=8) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert not base["pos"].equals(other["pos"])


def test_chunk_dedup_randomized_vs_bruteforce(spark):
    """Seeded randomized corpus with heavy span duplication, checked
    against an independent brute-force first-wins implementation."""
    import random

    from cianparser_spark.ops.text import chunk_dedup

    rng = random.Random(417)
    vocab = [f"w{i}" for i in range(12)]
    spans = [" ".join(rng.choice(vocab) for _ in range(3)) for _ in range(9)]
    rows = []
    for did in range(40):
        n = rng.randrange(0, 5)
        rows.append((did, " ".join(rng.choice(spans) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # brute force: global first occurrence of each 3-token span text
    seen, want = set(), {}
    for did, text in rows:
        ws = [w for w in text.split() if w]
        chunks = [" ".join(ws[i:i + 3]) for i in range(0, len(ws), 3)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        want[did] = (len(chunks), len(kept), " ".join(kept))

    import hashlib
    got = {r["doc_id"]: r for r in chunk_dedup(df, chunk=3).collect()}
    assert len(got) == len(rows)
    for did, (nc, nk, clean) in want.items():
        g = got[did]
        assert (g["n_chunks"], g["n_kept"]) == (nc, nk), did
        assert g["clean_md5"] == hashlib.md5(clean.encode()).hexdigest(), did
