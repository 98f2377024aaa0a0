"""Approximate nearest-neighbor search over an embedding column.

* ``brute_force_topk``  — exact cosine top-k (the correctness baseline);
  dot product is JVM-side ``zip_with``/``aggregate`` (codegen, no UDF).
* ``signature_bucket``  — random-hyperplane sign-LSH bucketing
  (deterministic planes from a seeded generator).
* ``lsh_topk``          — the scale path: probe only the query's bucket
  (plus optional multi-probe neighbors), exact-rank inside.
* ``ivf_topk``          — IVF-style: k-means-lite centroids (seeded,
  fixed iterations → deterministic), probe nearest ``nprobe`` lists.
* ``pq_topk``           — product quantization: vectors compressed to
  m one-byte codes (32× scan reduction at 64 dims), queries answered
  by ADC table lookups — native expressions, zero per-row Python.
* ``build_lsh_index`` / ``build_ivf_index`` / ``build_pq_index`` —
  persist the bucket/list/code assignment ONCE so repeated queries
  reuse it instead of re-assigning the whole table per query (the
  repeated-query workload at scale); the topk functions accept the
  prebuilt index via ``index=``.

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


def kmeans_l2(x: np.ndarray, k: int, iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic L2 k-means (fixed seed/iterations, argmin squared
    distance with first-min tiebreak, plain mean update, NO
    normalization — PQ sub-codebooks live in the raw subspace)."""
    x = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cents[j] = x[m].mean(axis=0)
    return cents


def pq_train(emb: DataFrame, m: int = 16, ksub: int = 16, iters: int = 5,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks: split the D dims into ``m``
    subspaces and train a ``ksub``-centroid L2 codebook per subspace on
    the same deterministic bounded sample the IVF index uses (first
    1024 rows by id — TakeOrderedAndProject, driver-safe at any table
    size).  Returns shape (m, ksub, D/m).

    D/m must stay < 8: the per-subspace squared distance is then a
    SHORT sequential float64 sum, which numpy (encode path) and a
    left-associated SQL expression (the DuckDB oracle) evaluate in the
    identical order — so code assignment is reproducible bit-for-bit
    across engines, ties broken to the lowest code on both sides."""
    sample = (emb.select(id_col, vec_col).orderBy(F.col(id_col))
                 .limit(1024).collect())
    x = np.stack([np.asarray(r[1]) for r in sample]).astype(np.float64)
    return pq_train_local(x, m, ksub, iters, seed)


def pq_train_local(x: np.ndarray, m: int = 16, ksub: int = 16,
                   iters: int = 5, seed: int = 42) -> np.ndarray:
    """Spark-free codebook training over an already-materialized sample
    — shared by pq_train and the DuckDB oracle (truth.py), so both
    derive byte-identical codebooks from byte-identical samples."""
    x = np.asarray(x, dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    if dsub >= 8:
        raise ValueError(f"dsub={dsub} >= 8 breaks the sequential-sum "
                         "determinism contract; raise m")
    return np.stack([
        kmeans_l2(x[:, mi * dsub:(mi + 1) * dsub], ksub, iters, seed + mi)
        for mi in range(m)
    ])


def pq_adc_table(qvec, books: np.ndarray) -> np.ndarray:
    """The query's m×ksub ADC lookup table (exact squared sub-distances
    to every codebook entry) — one shared implementation so the Spark
    literals and the oracle literals are the same floats."""
    mm, _, dsub = books.shape
    q = np.asarray(qvec, dtype=np.float64)
    return np.stack([
        ((q[mi * dsub:(mi + 1) * dsub][None, :] - books[mi]) ** 2).sum(-1)
        for mi in range(mm)
    ])


def _encode_udf(books: np.ndarray):
    m, ksub, dsub = books.shape

    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        out = np.empty((len(mat), m), dtype=np.int32)
        for mi in range(m):
            sub = mat[:, mi * dsub:(mi + 1) * dsub]
            d = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(-1)
            out[:, mi] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return F.pandas_udf(encode, "array<int>")


def build_pq_index(emb: DataFrame, m: int = 16, ksub: int = 16,
                   iters: int = 5, seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> tuple[DataFrame, np.ndarray]:
    """Encode every row to its m uint8-sized codes ONCE, persisted.
    At 10^10 rows this is the whole point of PQ: the 64-dim float
    vector (512 B) compresses to m=16 one-byte codes, so the scan side
    of every query reads 32× less and never touches the raw vectors."""
    books = pq_train(emb, m, ksub, iters, seed, id_col, vec_col)
    coded = (spread(emb)
             .withColumn("codes", _encode_udf(books)(F.col(vec_col)))
             .select(id_col, "codes").persist())
    return coded, books


def pq_topk(emb: DataFrame | None, qvec: list[float], k: int = 10,
            m: int = 16, ksub: int = 16, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding",
            index: tuple[DataFrame, np.ndarray] | None = None) -> DataFrame:
    """PQ ANN via asymmetric distance computation (ADC): the query
    builds an m×ksub lookup table of exact sub-distances to every
    codebook entry; each row's approximate distance is the sum of its
    m table entries — pure native expressions (element_at over literal
    arrays + a left-associated sum), NO Python per row, then
    TakeOrderedAndProject.  Returns (id, adc_dist) ascending."""
    if index is not None:
        coded, books = index
    else:
        books = pq_train(emb, m, ksub, seed=seed, id_col=id_col, vec_col=vec_col)
        coded = (spread(emb)
                 .withColumn("codes", _encode_udf(books)(F.col(vec_col)))
                 .select(id_col, "codes"))
    mm = books.shape[0]
    # ADC table: embedded as literals on BOTH the Spark and oracle
    # sides, so only the code assignment is ever recomputed cross-engine
    table = pq_adc_table(qvec, books)
    terms = [
        F.element_at(F.array(*[F.lit(float(t)) for t in table[mi]]),
                     F.element_at(F.col("codes"), mi + 1) + F.lit(1))
        for mi in range(mm)
    ]
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return (coded.select(id_col, dist.alias("adc_dist"))
                 .orderBy(F.col("adc_dist").asc(), F.col(id_col))
                 .limit(k))


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
