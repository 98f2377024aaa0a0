"""Sketch operators: HLL / KMV / count-min properties.

Error-bound checks (the estimates are deterministic, so the bounds are
reproducible assertions, not flaky statistics), the HLL merge law that
makes the register table an incremental ledger, KMV's exact-below-k
fallback, and CMS's one-sided overcount guarantee.
"""

import math

import pytest
from pyspark.sql import functions as F

from cianparser_spark.ops.sketch import (
    cms_counters, cms_lookup, hll_distinct, hll_registers, hll_estimate,
    kmv_distinct, kmv_jaccard,
)


def _ids(spark, lo, hi, col="v"):
    return spark.range(lo, hi).select(F.col("id").cast("string").alias(col))


def test_hll_error_bound_linear_branch(spark):
    # 10k distinct, p=12 (m=4096): small-range linear counting path;
    # typical error ~1%, assert a loose deterministic 5%
    est = hll_distinct(_ids(spark, 0, 10_000), "v", p=12).collect()[0][0]
    assert abs(est - 10_000) / 10_000 < 0.05


def test_hll_error_bound_raw_branch(spark):
    # 50k distinct, p=8 (m=256): raw harmonic branch (50k >> 2.5*256);
    # theoretical sigma = 1.04/sqrt(256) = 6.5%, assert 3 sigma
    est = hll_distinct(_ids(spark, 0, 50_000), "v", p=8).collect()[0][0]
    assert abs(est - 50_000) / 50_000 < 3 * 1.04 / math.sqrt(256)


def test_hll_merge_is_register_max(spark):
    # sketch(A ∪ B) == elementwise max-merge of sketch(A), sketch(B):
    # the property that lets daily register tables merge into a running
    # frontier-cardinality ledger without rescanning history
    a, b = _ids(spark, 0, 3_000), _ids(spark, 2_000, 6_000)
    ra = hll_registers(a, "v", p=10)
    rb = hll_registers(b, "v", p=10)
    merged = (ra.unionAll(rb).groupBy("bucket")
                .agg(F.max("max_rho").alias("max_rho")))
    direct = hll_registers(a.unionAll(b), "v", p=10)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    e_merged = hll_estimate(merged, p=10).collect()[0][0]
    e_direct = hll_estimate(direct, p=10).collect()[0][0]
    assert e_merged == e_direct


def test_hll_grouped(spark):
    df = spark.range(0, 6_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"))
    out = {r["g"]: r["e"] for r in
           hll_distinct(df, "v", p=12, group_cols=("g",), out_col="e").collect()}
    assert set(out) == {"0", "1", "2"}
    for e in out.values():
        assert abs(e - 2_000) / 2_000 < 0.06


def test_hll_p_range_guard(spark):
    with pytest.raises(ValueError):
        hll_registers(_ids(spark, 0, 10), "v", p=3)


def test_kmv_exact_below_k(spark):
    # fewer distinct values than k → the estimate IS the exact count
    est = kmv_distinct(_ids(spark, 0, 100), "v", k=256).collect()[0][0]
    assert est == 100.0


def test_kmv_error_bound(spark):
    # 20k distinct, k=256: sigma ~ 1/sqrt(k-2) ≈ 6.3%; assert 3 sigma
    est = kmv_distinct(_ids(spark, 0, 20_000), "v", k=256).collect()[0][0]
    assert abs(est - 20_000) / 20_000 < 3 / math.sqrt(254)


def test_kmv_ignores_duplicates(spark):
    # the sketch sees DISTINCT hashes: replicating every value 5x
    # cannot change the estimate
    base = _ids(spark, 0, 5_000)
    dup = base.crossJoin(spark.range(5).select(F.lit(1).alias("_x"))).select("v")
    e1 = kmv_distinct(base, "v", k=128).collect()[0][0]
    e2 = kmv_distinct(dup, "v", k=128).collect()[0][0]
    assert e1 == e2


def test_kmv_jaccard_overlap(spark):
    # |A|=4000, |B|=4000, |A∩B|=2000 → J = 2000/6000 = 1/3
    a, b = _ids(spark, 0, 4_000), _ids(spark, 2_000, 6_000)
    row = kmv_jaccard(a, b, "v", k=256).collect()[0]
    assert row["n_sample"] == 256
    assert abs(row["j_est"] - 1 / 3) < 0.12  # binomial 3-sigma at k=256


def test_cms_one_sided_and_tight(spark):
    # est >= true ALWAYS (count-min never undercounts); with w=4096 and
    # 200 keys the expected collision inflation is tiny
    df = spark.range(0, 20_000).select(
        (F.col("id") % 200).cast("string").alias("v"))  # 100 rows per key
    counters = cms_counters(df, "v", w=4096, d=4)
    items = df.groupBy("v").agg(F.count("*").alias("n_true"))
    out = cms_lookup(counters, items, "v", w=4096, d=4).collect()
    assert len(out) == 200
    assert all(r["cms_est"] >= r["n_true"] for r in out)
    assert sum(r["cms_est"] - r["n_true"] for r in out) / len(out) < 5


def test_cms_collisions_stay_one_sided(spark):
    # deliberately undersized sketch (w=16): heavy collisions, but the
    # one-sided guarantee must hold for every key
    df = spark.range(0, 5_000).select((F.col("id") % 64).cast("string").alias("v"))
    counters = cms_counters(df, "v", w=16, d=4)
    items = df.groupBy("v").agg(F.count("*").alias("n_true"))
    out = cms_lookup(counters, items, "v", w=16, d=4).collect()
    assert all(r["cms_est"] >= r["n_true"] for r in out)


# ------------------------------------------------- weighted sampling

def test_weighted_sample_exact_k_and_deterministic(spark):
    from cianparser_spark.ops.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 + 1).cast("double").alias("w"))
    a = [r["doc_id"] for r in weighted_sample(df, "w", 50, "doc_id").collect()]
    b = [r["doc_id"] for r in weighted_sample(df, "w", 50, "doc_id").collect()]
    assert len(a) == 50 and a == b
    c = [r["doc_id"] for r in
         weighted_sample(df, "w", 50, "doc_id", salt="other").collect()]
    assert set(a) != set(c)  # salt re-deals the sample


def test_weighted_sample_inclusion_tracks_weight(spark):
    """A-ES property: across independent salts, a weight-10 row is
    sampled ~10x as often as a weight-1 row.  Deterministic (fixed
    salt list), so the band is a hard assertion."""
    from cianparser_spark.ops.sampling import weighted_sample

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, 1.0).otherwise(10.0).alias("w"))
    heavy = light = 0
    for i in range(20):
        got = weighted_sample(df, "w", 40, "doc_id", salt=f"s{i}").collect()
        ids = {r["doc_id"] for r in got}
        light += sum(1 for x in ids if x < 200)
        heavy += sum(1 for x in ids if x >= 200)
    assert heavy + light == 800
    assert heavy / light > 5  # expected ratio ~10, loose floor


def test_weighted_sample_grouped_k_per_group(spark):
    from cianparser_spark.ops.sampling import weighted_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.lit(1.0).alias("w"))
    got = weighted_sample(df, "w", 7, "doc_id", group_cols=("g",)).collect()
    import collections
    cnt = collections.Counter(r["g"] for r in got)
    assert cnt == {"0": 7, "1": 7, "2": 7}
    assert all(1 <= r["rnk"] <= 7 for r in got)
