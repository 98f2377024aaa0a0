"""Approximate nearest-neighbor search over an embedding column.

* ``brute_force_topk``  — exact cosine top-k (the correctness baseline);
  dot product is JVM-side ``zip_with``/``aggregate`` (codegen, no UDF).
* ``signature_bucket``  — random-hyperplane sign-LSH bucketing
  (deterministic planes from a seeded generator).
* ``lsh_topk``          — the scale path: probe only the query's bucket
  (plus optional multi-probe neighbors), exact-rank inside.
* ``ivf_topk``          — IVF-style: k-means-lite centroids (seeded,
  fixed iterations → deterministic), probe nearest ``nprobe`` lists.

At 10^10 rows the bucketed variants turn a full scan into a hash
lookup + short exact scan; the brute-force version remains the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """Append a sign-LSH bucket id (0 .. 2^n_planes-1), Arrow-batched."""

    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        planes = _planes(mat.shape[1], n_planes, seed)
        signs = (mat @ planes.T) > 0
        return pd.Series((signs * (1 << np.arange(n_planes))).sum(axis=1).astype("int64"))

    return df.withColumn(out, F.pandas_udf(assign, "long")(F.col(vec_col)))


def lsh_topk(emb: DataFrame, qvec: list[float], k: int = 10, n_planes: int = 6,
             multiprobe: int = 1, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: scan only the query's LSH bucket (± multiprobe bit flips)."""
    q = np.asarray(qvec)
    planes = _planes(len(qvec), n_planes, seed)
    signs = (planes @ q) > 0
    qb = int((signs * (1 << np.arange(n_planes))).sum())
    probes = {qb}
    for _ in range(multiprobe):
        probes |= {b ^ (1 << i) for b in list(probes) for i in range(n_planes)}
    bucketed = signature_bucket(emb, vec_col, n_planes, seed)
    return brute_force_topk(
        bucketed.filter(F.col("bucket").isin(list(probes))), qvec, k, id_col, vec_col
    )


def ivf_centroids(emb: DataFrame, n_lists: int = 16, iters: int = 5,
                  seed: int = 42, vec_col: str = "embedding") -> np.ndarray:
    """Deterministic k-means-lite on a driver-collected sample.

    The SAMPLE is bounded (n_lists*64 rows via deterministic hash
    order), so this stays driver-safe at any table size.
    """
    sample = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(n_lists * 64)
        .collect()
    )
    x = np.stack([np.asarray(r[0]) for r in sample])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                c = x[m].mean(axis=0)
                cents[j] = c / (np.linalg.norm(c) + 1e-12)
    return cents


def ivf_topk(emb: DataFrame, qvec: list[float], k: int = 10, n_lists: int = 16,
             nprobe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: assign rows to nearest centroid list, probe the
    query's nprobe nearest lists, exact-rank inside them."""
    cents = ivf_centroids(emb, n_lists, seed=seed, vec_col=vec_col)
    q = np.asarray(qvec)
    probe_lists = np.argsort(-(cents @ q))[:nprobe].tolist()

    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype("int64"))

    listed = emb.withColumn("_list", F.pandas_udf(assign, "long")(F.col(vec_col)))
    return brute_force_topk(
        listed.filter(F.col("_list").isin(probe_lists)), qvec, k, id_col, vec_col
    )
