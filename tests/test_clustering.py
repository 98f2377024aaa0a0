"""Distributed k-means: exact numpy-twin equality, Lloyd monotonicity
on the quantized objective, the round-half-away quantization contract,
and the int64 overflow guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cianparser_spark.ops.clustering import (
    Q_DEFAULT, init_sums, kmeans_fit, quantize_py,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def _numpy_twin(x, k, iters, seed, q):
    """Sequential replay of the exact quantized Lloyd loop: int64 sums,
    one conversion + one division per distance, first-min argmin —
    the same arithmetic contract the Spark and DuckDB sides share."""
    xq = quantize_py(x, q)
    sums, counts = init_sums(x[:256], k, seed, q)
    assign = None
    for it in range(iters):
        d = np.stack([
            ((counts[j] * xq - sums[j]) ** 2).sum(axis=1)
            / float(int(counts[j]) * int(counts[j]))
            for j in range(k)
        ], axis=1)
        assign = d.argmin(axis=1)
        if it < iters - 1:
            new_s, new_n = sums.copy(), counts.copy()
            for j in range(k):
                m = assign == j
                if m.any():
                    new_s[j] = xq[m].sum(axis=0)
                    new_n[j] = int(m.sum())
            sums, counts = new_s, new_n
    return assign, d.min(axis=1)


def test_kmeans_matches_numpy_twin_exactly(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    x = np.stack([np.asarray(r["embedding"]) for r in rows]).astype(np.float64)
    want_assign, want_dist = _numpy_twin(x, k=8, iters=3, seed=42, q=Q_DEFAULT)
    final, _, _ = kmeans_fit(emb, "embedding", k=8, iters=3)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in final.collect()}
    for i, r in enumerate(rows):
        c, d = got[r["vec_id"]]
        assert c == want_assign[i]
        assert d == want_dist[i]  # exact double equality, no tolerance


def test_kmeans_inertia_monotone(spark, emb):
    """Lloyd on the exact quantized objective can never increase total
    inertia as iterations grow (assignment and update each minimize)."""
    inertias = []
    for iters in (1, 2, 3, 4):
        final, _, _ = kmeans_fit(emb, "embedding", k=8, iters=iters)
        inertias.append(final.agg(F.sum("dist")).collect()[0][0])
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    assert inertias[-1] < inertias[0]


def test_quantize_half_away_contract(spark):
    # x*q = 1.5 and 0.5: half-away gives 2 and 1 (numpy's np.round
    # half-even would give 2 and 0 — the 0.5 case is the trap)
    q = 1 << 16
    xs = [1.5 / q, 0.5 / q, -0.5 / q, -1.5 / q]
    assert quantize_py(np.array(xs), q).tolist() == [2, 1, -1, -2]
    got = (spark.createDataFrame([(x,) for x in xs], "x double")
           .select(F.round(F.col("x") * q, 0).cast("long").alias("v"))
           .collect())
    assert [r["v"] for r in got] == [2, 1, -1, -2]


def test_overflow_guard(spark, emb):
    with pytest.raises(ValueError, match="overflow"):
        kmeans_fit(emb, "embedding", k=4, iters=2, q=1 << 40)
