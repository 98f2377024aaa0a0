"""Frontier membership split: Bloom prefilter + exact-join reunion must
equal a plain exact anti-join — including under saturated and
FP-heavy Blooms (bench_frontier is the 10^10 seen-set path; a false
negative here would silently re-crawl or drop frontier URLs)."""
import pyspark.sql.functions as F
import pytest

from cianparser_spark.bench_frontier import (
    _candidates,
    build_blooms,
    membership_split,
)


def _checksum(df):
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("key").cast("decimal(38,0)")).alias("s"),
                 F.sum(F.crc32(F.col("url"))).alias("u")).collect()[0]
    return (row["n"], row["s"], row["u"])


@pytest.fixture(scope="module")
def frames(spark):
    cand = _candidates(spark, 6000, 8).cache()
    seen = cand.filter(F.col("id") % 2 == 0).select("key").cache()
    oracle = cand.join(seen, ["key"], "left_anti")
    return cand, seen, _checksum(oracle)


def test_split_equals_exact_anti_join(spark, frames):
    cand, seen, want = frames
    blobs = build_blooms(seen, n_buckets=8)
    got = membership_split(cand, seen, blobs, n_buckets=8)
    assert _checksum(got) == want
    assert want[0] == 3000


def test_saturated_bloom_still_exact(spark, frames):
    # 64-bit buckets for 3000 keys: every probe answers maybe-seen, so
    # ALL rows take the exact join — reunion must still be exact
    cand, seen, want = frames
    blobs = build_blooms(seen, n_buckets=4, n_bits=64)
    got = membership_split(cand, seen, blobs, n_buckets=4)
    assert _checksum(got) == want


def test_prefilter_splits_both_ways(spark, frames):
    # honest sizing: the maybe-seen set covers every true hit (no
    # false negatives, the Bloom invariant) and the fresh bypass is
    # doing real work (most fresh rows never reach the join)
    cand, seen, _ = frames
    blobs = build_blooms(seen, n_buckets=8)
    from cianparser_spark.bench_frontier import _maybe_count

    maybe = _maybe_count(cand, blobs, n_buckets=8)
    n_seen = seen.count()
    assert maybe >= n_seen  # zero false negatives
    assert maybe < cand.count()  # bypass nonempty


def test_empty_seen_passes_everything(spark):
    cand = _candidates(spark, 512, 4)
    seen = cand.filter("id < 0").select("key")
    blobs = build_blooms(seen, n_buckets=4)
    got = membership_split(cand, seen, blobs, n_buckets=4)
    assert got.count() == 512


def test_scale_bench_small(spark, tmp_path):
    """The SPOOL-mode wave loop at toy size: executor-side merge +
    file-cache probe must produce the exact fresh counts (the run
    asserts per-wave), hold zero blob bytes on the driver, and keep
    the probe closure at a path tuple."""
    from cianparser_spark.bench_frontier import run_scale_bench

    res = run_scale_bench(spark, n_keys=60_000, n_waves=2,
                          probe_per_wave=20_000, n_buckets=4,
                          n_bits=1 << 17, scratch=str(tmp_path))
    assert len(res["waves"]) == 2
    assert res["driver_blob_bytes_max"] == 0
    assert all(w["probe_closure_bytes"] < 1024 for w in res["waves"])
    assert res["blob_table_mbytes_on_disk"] > 0
