"""Distributed k-means (Lloyd) — bit-exact across engines.

The classic impossibility for a cross-engine clustering oracle is that
every centroid update is a float mean whose value depends on the
accumulation ORDER, which a distributed groupBy does not fix.  This
implementation removes float accumulation entirely:

* coordinates are quantized once to integers
  (``xq = round(x * 2^16)`` — round-half-away, which Spark's ``round``
  and DuckDB's ``round`` share),
* a centroid is carried as its EXACT integer form ``(S, n)`` — the
  per-dimension bigint sum and the member count (integer sums are
  order-independent, so Spark's partial aggregates and DuckDB's
  sequential sum agree exactly),
* the assignment distance compares
  ``||xq - S/n||² = (Σ_d (n·xq_d - S_d)²) / n²`` — an exact int64
  numerator, one integer→double conversion, one IEEE division: every
  engine computes the identical double, so argmin (first-min tiebreak)
  is identical, every iteration, with no tolerance anywhere.

The assignment is pure Catalyst (zip_with/aggregate over literal
arrays, no UDF); the per-cluster update is one groupBy with D sum
aggregates (map-side combined).  The driver materializes k×(D+1)
integers per iteration — the same bounded-collect pattern as the IVF
centroids.  The un-quantized float variant is what production would
run at 100 TB (identical plan shape); the quantized one exists so the
DuckDB oracle can replay ALL iterations as unrolled CTEs and match
bit-for-bit.  No reference analog (lenarsaitov/cianparser has no ML
surface); graft addition.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_DEFAULT = 1 << 16


def quantize_py(x: np.ndarray, q: int = Q_DEFAULT) -> np.ndarray:
    """Round-half-away-from-zero integer quantization — the Python twin
    of ``round(x*q)`` in Spark SQL / DuckDB (numpy's ``np.round`` is
    half-EVEN and must not be used here)."""
    v = np.asarray(x, dtype=np.float64) * q
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)


def init_sums(x: np.ndarray, k: int, seed: int = 42,
              q: int = Q_DEFAULT) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic init: k distinct sample rows (seeded choice over
    the bounded sample), carried as (S, n) with n=1 — shared by the
    Spark fit and the oracle generator so both start from the same
    integer literals."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), k, replace=False)
    return quantize_py(x[idx], q), np.ones(k, dtype=np.int64)


def _check_bounds(max_abs: float, n_rows: int, dim: int, q: int) -> None:
    # numerator terms are (n·xq - S)² summed over dim; both factors are
    # ≤ 2·n·q·max|x| in magnitude — keep the worst-case sum inside int64
    worst = dim * float(2 * n_rows * q * max_abs) ** 2
    if worst >= float(2 ** 63):
        raise ValueError(
            f"int64 overflow risk: dim={dim} n={n_rows} q={q} "
            f"max|x|={max_abs:.3g} → worst-case {worst:.3g} ≥ 2^63; "
            "lower q")


def _dist_exprs(xq_col, sums: np.ndarray, counts: np.ndarray) -> list:
    """One exact double distance per centroid: integer numerator via
    zip_with/aggregate (order-free), a single division at the end."""
    out = []
    for s_vec, n in zip(sums, counts):
        n_lit = F.lit(int(n))
        s_arr = F.array(*[F.lit(int(v)) for v in s_vec])
        num = F.aggregate(
            F.zip_with(xq_col, s_arr,
                       lambda x, s: (n_lit * x - s) * (n_lit * x - s)),
            F.lit(0).cast("long"), lambda a, t: a + t)
        out.append(num / (n_lit * n_lit))
    return out


def _assign_expr(xq_col, sums: np.ndarray, counts: np.ndarray):
    d = F.array(*_dist_exprs(xq_col, sums, counts))
    return (F.array_position(d, F.array_min(d)) - F.lit(1)).cast("int")


def kmeans_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
               iters: int = 3, seed: int = 42, q: int = Q_DEFAULT,
               id_col: str = "vec_id", sample_n: int = 256,
               ) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Distributed Lloyd over quantized coordinates.

    Returns ``(assignments, S, n)``: the final per-row (id, cluster,
    dist) DataFrame plus the exact integer centroid state after the
    last update.  ``iters`` counts ASSIGNMENT rounds; updates run after
    each of the first ``iters-1`` assignments (the returned frame is
    the ``iters``-th assignment against the last updated centroids)."""
    xq = F.transform(F.col(vec_col).cast("array<double>"),
                     lambda x: F.round(x * F.lit(float(q)), 0).cast("long"))
    pts = df.select(F.col(id_col), xq.alias("xq"))

    sample = (df.select(id_col, vec_col).orderBy(F.col(id_col))
                .limit(sample_n).collect())
    xs = np.stack([np.asarray(r[1]) for r in sample]).astype(np.float64)
    dim = xs.shape[1]
    n_rows = df.count()
    _check_bounds(float(np.abs(xs).max()) * 2, n_rows, dim, q)
    sums, counts = init_sums(xs, k, seed, q)

    for _ in range(iters - 1):
        assigned = pts.withColumn("c", _assign_expr(F.col("xq"), sums, counts))
        agg = (assigned.groupBy("c")
               .agg(F.count("*").alias("n"),
                    *[F.sum(F.element_at("xq", d + 1)).alias(f"s{d}")
                      for d in range(dim)])
               .collect())
        new_sums, new_counts = sums.copy(), counts.copy()
        for row in agg:
            j = row["c"]
            new_counts[j] = row["n"]
            new_sums[j] = [row[f"s{d}"] for d in range(dim)]
        # empty clusters keep their previous exact state (same rule as
        # kmeans_lite and the oracle's COALESCE)
        sums, counts = new_sums, new_counts

    dists = _dist_exprs(F.col("xq"), sums, counts)
    final = pts.select(
        id_col,
        _assign_expr(F.col("xq"), sums, counts).alias("cluster"),
        F.array_min(F.array(*dists)).alias("dist"))
    return final, sums, counts
