"""Approximate nearest-neighbor search over an embedding column.

* ``brute_force_topk``  — exact cosine top-k (the correctness baseline);
  dot product is JVM-side ``zip_with``/``aggregate`` (codegen, no UDF).
* ``signature_bucket``  — random-hyperplane sign-LSH bucketing
  (deterministic planes from a seeded generator).
* ``lsh_topk``          — the scale path: probe only the query's bucket
  (plus optional multi-probe neighbors), exact-rank inside.
* ``ivf_topk``          — IVF-style: k-means-lite centroids (seeded,
  fixed iterations → deterministic), probe nearest ``nprobe`` lists.
* ``build_lsh_index`` / ``build_ivf_index`` — persist the bucket/list
  assignment ONCE so repeated queries reuse it instead of re-assigning
  the whole table per query (the repeated-query workload at scale);
  ``lsh_topk``/``ivf_topk`` accept the prebuilt index via ``index=``.

At 10^10 rows the bucketed variants turn a full scan into a hash
lookup + short exact scan; the brute-force version remains the oracle.
All float math is float64 end-to-end (inputs cast up), so bucket /
list assignment is reproducible bit-for-bit outside Spark — the DuckDB
oracle recomputes it from the same plane/centroid constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import spread


def _dot(vec_col: str, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k; deterministic tiebreak on id."""
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    return (
        emb.withColumn("cosine", _dot(vec_col, qvec) / (_norm(F.col(vec_col)) * F.lit(qn)))
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_bucket(df: DataFrame, vec_col: str, n_planes: int = 6,
                     seed: int = 42, out: str = "bucket") -> DataFrame:
    """Append a sign-LSH bucket id (0 .. 2^n_planes-1), Arrow-batched.

    Float64 throughout (float32 inputs are cast up losslessly) so the
    sign test matches any float64 re-computation of the same planes."""

    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        planes = _planes(mat.shape[1], n_planes, seed)
        signs = (mat @ planes.T) > 0
        return pd.Series((signs * (1 << np.arange(n_planes))).sum(axis=1).astype("int64"))

    return spread(df).withColumn(out, F.pandas_udf(assign, "long")(F.col(vec_col)))


def build_lsh_index(emb: DataFrame, n_planes: int = 6, seed: int = 42,
                    vec_col: str = "embedding") -> DataFrame:
    """One-pass bucket assignment, persisted — build once, query many.
    At scale this is the table you'd write back to Iceberg partitioned
    by ``bucket`` (partition pruning then serves each probe)."""
    return signature_bucket(emb, vec_col, n_planes, seed).persist()


def query_bucket(qvec: list[float], n_planes: int = 6, seed: int = 42) -> int:
    q = np.asarray(qvec, dtype=np.float64)
    planes = _planes(len(qvec), n_planes, seed)
    signs = (planes @ q) > 0
    return int((signs * (1 << np.arange(n_planes))).sum())


def lsh_topk(emb: DataFrame | None, qvec: list[float], k: int = 10, n_planes: int = 6,
             multiprobe: int = 1, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             index: DataFrame | None = None) -> DataFrame:
    """ANN: scan only the query's LSH bucket (± multiprobe bit flips).

    Pass ``index=build_lsh_index(emb, ...)`` to reuse one persisted
    assignment across queries; otherwise the bucket column is computed
    on the fly (one extra pass over the table per query)."""
    qb = query_bucket(qvec, n_planes, seed)
    probes = {qb}
    for _ in range(multiprobe):
        probes |= {b ^ (1 << i) for b in list(probes) for i in range(n_planes)}
    bucketed = index if index is not None else signature_bucket(emb, vec_col, n_planes, seed)
    return brute_force_topk(
        bucketed.filter(F.col("bucket").isin(list(probes))), qvec, k, id_col, vec_col
    )


def kmeans_lite(x: np.ndarray, n_lists: int = 16, iters: int = 5,
                seed: int = 42) -> np.ndarray:
    """Deterministic k-means-lite (fixed seed, fixed iterations,
    argmax-dot assignment, L2-normalized centroids).  Pure numpy on a
    bounded sample — shared by the Spark path and the DuckDB oracle so
    both derive identical centroids from identical samples."""
    x = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                c = x[m].mean(axis=0)
                cents[j] = c / (np.linalg.norm(c) + 1e-12)
    return cents


def ivf_centroids(emb: DataFrame, n_lists: int = 16, iters: int = 5,
                  seed: int = 42, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Centroids from a deterministic bounded sample: the first
    ``n_lists*64`` rows by ``id_col`` (TakeOrderedAndProject — driver-
    safe at any table size, and reproducible outside Spark by sorting
    the same column, unlike a partition- or hash-order sample)."""
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(n_lists * 64)
        .collect()
    )
    x = np.stack([np.asarray(r[1]) for r in sample]).astype(np.float64)
    return kmeans_lite(x, n_lists, iters, seed)


def _assign_udf(cents: np.ndarray):
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype("int64"))

    return F.pandas_udf(assign, "long")


def build_ivf_index(emb: DataFrame, n_lists: int = 16, iters: int = 5,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> tuple[DataFrame, np.ndarray]:
    """One-pass IVF list assignment, persisted, plus its centroids.
    Build once, probe many; at scale, write back partitioned by
    ``_list`` for partition-pruned probes."""
    cents = ivf_centroids(emb, n_lists, iters, seed, id_col, vec_col)
    listed = spread(emb).withColumn("_list", _assign_udf(cents)(F.col(vec_col))).persist()
    return listed, cents


def ivf_topk(emb: DataFrame | None, qvec: list[float], k: int = 10, n_lists: int = 16,
             nprobe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             index: tuple[DataFrame, np.ndarray] | None = None) -> DataFrame:
    """IVF ANN: assign rows to nearest centroid list, probe the
    query's nprobe nearest lists, exact-rank inside them.  Pass
    ``index=build_ivf_index(...)`` to reuse one persisted assignment."""
    if index is not None:
        listed, cents = index
    else:
        cents = ivf_centroids(emb, n_lists, seed=seed, id_col=id_col, vec_col=vec_col)
        listed = spread(emb).withColumn("_list", _assign_udf(cents)(F.col(vec_col)))
    q = np.asarray(qvec, dtype=np.float64)
    # stable sort: tie-break on list id, matching the SQL oracle's
    # ORDER BY dot DESC, list_id
    probe_lists = np.argsort(-(cents @ q), kind="stable")[:nprobe].tolist()
    return brute_force_topk(
        listed.filter(F.col("_list").isin(probe_lists)), qvec, k, id_col, vec_col
    )
