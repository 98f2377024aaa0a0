"""Payload path: images table, offers⋈images join, PSNR/caption
invariants, phash dedup, near-dup banding, caption normalization."""

import os

import pytest
from pyspark.sql import functions as F

from cianparser_spark.corpus import webgen as W
from cianparser_spark.engine import payload

N = 300


@pytest.fixture(scope="module")
def images(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("payload")), "images.parquet")
    return payload.build_images_table(spark, path, n=N, partitions=4)


def test_distributed_generation_equals_sequential(images):
    got = {r["image_id"]: r for r in images.collect()}
    assert len(got) == N
    for want in W.images_rows(N):
        g = got[want["image_id"]]
        assert bytes(g["bytes"]) == want["bytes"]
        assert g["phash"] == want["phash"]
        assert g["caption"] == want["caption"]
        assert (g["w"], g["h"], g["fmt"]) == (want["w"], want["h"], want["fmt"])


def test_decode_verify_invariants(images):
    res = payload.decode_verify(images)
    rows = res.collect()
    assert len(rows) == N
    assert all(r["ok"] for r in rows)
    assert all(r["caption_match"] for r in rows)
    lossy = images.filter(F.col("fmt") == "jpeg").count()
    finite = [r for r in rows if r["psnr"] != float("inf")]
    assert len(finite) == lossy
    assert all(r["psnr"] >= 40.0 for r in finite)


def test_decode_verify_catches_corruption(spark, images):
    bad = images.limit(5).withColumn("bytes", F.lit(b"junk"))
    rows = payload.decode_verify(bad).collect()
    assert rows and all(not r["ok"] for r in rows)


def test_phash_dedup_keeps_first(images):
    total = images.count()
    distinct_phash = images.select("phash").distinct().count()
    deduped = payload.phash_dedup(images)
    assert deduped.count() == distinct_phash < total
    # keep-first: every surviving id is the min id of its phash group
    firsts = {
        r["image_id"]
        for r in images.groupBy("phash").agg(F.min("image_id").alias("image_id")).collect()
    }
    assert {r["image_id"] for r in deduped.select("image_id").collect()} == firsts


def test_phash_dedup_plan_keeps_bytes_out_of_shuffle(images):
    plan = payload.phash_dedup(images)._jdf.queryExecution().executedPlan().toString()
    # the window/sort side must not carry the binary column; bytes come
    # back via the final semi join (late materialization)
    window_section = plan[plan.find("Window") :]
    assert "bytes" not in window_section.split("SemiJoin")[0].split("Join")[0]


def test_near_dup_pairs_finds_injected_duplicates(images):
    pairs = payload.near_dup_pairs(images, max_hamming=0).collect()
    # injected duplicates share identical pixels → identical phash
    dup_groups = (
        images.groupBy("phash").count().filter(F.col("count") > 1).count()
    )
    assert len(pairs) >= dup_groups > 0
    assert all(r["hamming"] == 0 for r in pairs)


def test_join_offers_images_broadcast(spark, images):
    offers = images.select(F.col("image_id"), F.lit("x").alias("k"))
    j = payload.join_offers_images(offers, images, broadcast_images=True)
    assert j.count() == N
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_normalize_caption(spark):
    df = spark.createDataFrame(
        [("2-комн. кв., 54,3 м², 7/16 этаж",), ("  СТУДИЯ,   25,0 М² !!!",)],
        "caption string",
    )
    out = [r["caption_norm"] for r in payload.normalize_caption(df).collect()]
    assert out[0] == "2-комн. кв. 54.3 м² 7 16 этаж" or "54.3" in out[0]
    assert "студия" in out[1] and "25.0" in out[1] and "!" not in out[1]


def test_compute_phash_matches_pure_python(images):
    """Distributed decode→dHash == sequential pure-Python recompute per
    image; lossless fmts additionally equal the stored pre-encode hash,
    lossy fmts sit within a couple of dHash bits of it."""
    from cianparser_spark.corpus import imaging

    got = {r["image_id"]: r for r in payload.compute_phash(images).collect()}
    assert len(got) == N
    for i, want in enumerate(W.images_rows(N)):
        g = got[want["image_id"]]
        assert g["ok"]
        ref = imaging.phash64(imaging.decode(want["bytes"], want["fmt"]))
        assert g["phash"] == ref
        if imaging.is_lossless(want["fmt"]):
            assert g["phash"] == want["phash"]
        else:
            assert imaging.hamming64(g["phash"], want["phash"]) <= 4


@pytest.mark.parametrize("max_hamming", [0, 1, 3])
def test_blocklist_probe_matches_bruteforce(spark, images, max_hamming):
    """Banded broadcast probe == exhaustive cross popcount (recall is
    total by pigeonhole for max_hamming <= 3 over 4x16-bit bands)."""
    num = F.substring("image_id", 4, 8).cast("int")
    blocklist = images.filter(num % 53 == 0)
    corpus = images.filter(num % 53 != 0)
    got = payload.blocklist_probe(corpus, blocklist, max_hamming=max_hamming)

    b = blocklist.select(F.col("phash").alias("bp"))
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("bp")))
    brute = (
        corpus.select("image_id", "phash").crossJoin(F.broadcast(b))
        .withColumn("h", ham).filter(F.col("h") <= max_hamming)
        .groupBy("image_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("h").alias("m"))
    )
    want = {
        r["image_id"]: (r["n"], r["m"]) for r in brute.collect()
    }
    rows = got.collect()
    assert len(rows) == corpus.count()
    for r in rows:
        n, m = want.get(r["image_id"], (0, -1))
        assert (r["n_blocklist_hits"], r["min_hamming"]) == (n, m), r
        assert r["blocked"] == (1 if n > 0 else 0)
