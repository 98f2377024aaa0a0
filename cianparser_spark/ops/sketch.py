"""Cardinality / frequency sketches — deterministic, engine-reproducible.

HyperLogLog registers, KMV (bottom-k) distinct + Jaccard, and
count-min frequency — all derived from md5-based 48-bit hashes so a
DuckDB oracle can recompute the IDENTICAL sketch (no RNG, no
engine-private hash function).  Everything is native Catalyst
expressions over groupBy aggregates, which is the point at 100 TB: a
distinct-count over 10^10 frontier URLs becomes a 2^p-row register
table per group (map-side partial combine, mergeable across days /
snapshots) instead of an exact ``count(distinct)`` that shuffles every
key; a per-host frequency table becomes d×w counters instead of a
10^8-row groupBy.

Reproducibility notes (these make the DuckDB oracle exact, not close):

* hashes are the first 12 hex chars of md5(value || salt) → a 48-bit
  integer both engines compute identically (same trick as
  ops/sampling._uniform);
* the HLL harmonic sum is accumulated as an INTEGER —
  ``sum(1 << (vbits+1 - rho))`` ≤ 2^48 fits a bigint exactly — so
  float addition order can never perturb the estimate; the only
  floating ops are one division and (on the small-range path) one ln;
* KMV's estimate ``(k-1) / (kth/2^48)`` divides by a power of two
  (exact) then performs a single IEEE division.

No reference analog (lenarsaitov/cianparser holds its seen-set and
counters exactly in Python dicts); these are the graft's scale ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

H_BITS = 48  # md5-derived hash width: 12 hex chars, exact in a double


def _h48(col, salt: str):
    """Deterministic 48-bit hash both Spark and DuckDB can recompute:
    ``('0x' || substr(md5(x || salt), 1, 12))::BIGINT`` on the DuckDB
    side."""
    h12 = F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 12)
    return F.conv(h12, 16, 10).cast("bigint")


# ---------------------------------------------------------------- HLL

def hll_alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007, fig. 3)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = 12,
                  salt: str = "hll-v1", group_cols: tuple = ()) -> DataFrame:
    """HyperLogLog register table: one row per (group, bucket) with the
    max leading-zero rank observed.

    bucket = top ``p`` bits of the 48-bit hash; rho = position of the
    first 1-bit in the remaining ``48-p`` bits (1-based;
    ``vbits+1`` when they are all zero).  ``groupBy(...).max`` IS the
    HLL merge, so partial aggregation happens map-side and two
    register tables (today's crawl + yesterday's) union-merge with the
    same one-line groupBy — the property that makes the sketch usable
    as an incremental frontier-cardinality ledger at 10^10 URLs.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of the supported 4..18 range")
    vbits = H_BITS - p
    h = _h48(F.col(col), salt)
    rest = h.bitwiseAND(F.lit((1 << vbits) - 1))
    rho = (F.when(rest == 0, F.lit(vbits + 1))
            .otherwise(F.lit(vbits + 1) - F.length(F.bin(rest))))
    bucket = F.shiftright(h, vbits)
    return (df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
              .groupBy(*group_cols, "bucket")
              .agg(F.max("rho").alias("max_rho")))


def hll_estimate(regs: DataFrame, p: int, group_cols: tuple = (),
                 out_col: str = "hll_est") -> DataFrame:
    """Cardinality estimate from a register table.

    The harmonic sum is computed as an exact bigint
    (``sum(1 << (vbits+1 - max_rho))``; bounded by 2^48) so the result
    is independent of row order — the DuckDB oracle reproduces it
    bit-for-bit.  Small-range correction: linear counting
    ``m * ln(m/V)`` when the raw estimate ≤ 2.5m and empty buckets
    exist (V = number of empty buckets).
    """
    m = 1 << p
    vbits = H_BITS - p
    alpha = hll_alpha(m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {vbits + 1} - max_rho)"))
         .alias("_si"),
        F.count("*").alias("_nb"),
    )
    scale = float(1 << (vbits + 1))
    harmonic = F.col("_si") / F.lit(scale) + (F.lit(m) - F.col("_nb"))
    raw = F.lit(alpha * m * m) / harmonic
    v = F.lit(m) - F.col("_nb")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)).otherwise(raw)
    return agg.select(*group_cols, est.alias(out_col))


def hll_distinct(df: DataFrame, col: str, p: int = 12,
                 salt: str = "hll-v1", group_cols: tuple = (),
                 out_col: str = "hll_est") -> DataFrame:
    """registers → estimate in one call (per group)."""
    return hll_estimate(hll_registers(df, col, p, salt, group_cols),
                        p, group_cols, out_col)


# ---------------------------------------------------------------- KMV

def kmv_sketch(df: DataFrame, col: str, k: int, salt: str = "kmv-v1",
               group_cols: tuple = ()) -> DataFrame:
    """Bottom-k sketch: the k smallest DISTINCT 48-bit hashes per group.

    Expressed as distinct → row_number window → rank ≤ k, which Spark 4
    plans with a map-side WindowGroupLimit partial top-k before the
    single exchange (same property ops/sampling.domain_cap relies on),
    so the shuffle carries at most k rows per group per map task — the
    scalable bottom-k shape, not a full sort.
    """
    h = _h48(F.col(col), salt)
    hashes = df.select(*group_cols, h.alias("h")).distinct()
    w = (Window.partitionBy(*group_cols).orderBy("h")
         if group_cols else Window.partitionBy(F.lit(1)).orderBy("h"))
    return (hashes.withColumn("r", F.row_number().over(w))
                  .filter(F.col("r") <= k))


def kmv_distinct(df: DataFrame, col: str, k: int, salt: str = "kmv-v1",
                 group_cols: tuple = (), out_col: str = "kmv_est") -> DataFrame:
    """KMV cardinality estimate: ``(k-1) / (kth_min / 2^48)``; exact
    count when the group holds fewer than k distinct hashes."""
    kept = kmv_sketch(df, col, k, salt, group_cols)
    agg = kept.groupBy(*group_cols).agg(F.max("r").alias("_n"),
                                        F.max("h").alias("_kth"))
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("_kth") / F.lit(float(1 << H_BITS))))
    return agg.select(*group_cols, est.alias(out_col))


def kmv_jaccard(df_a: DataFrame, df_b: DataFrame, col: str, k: int,
                salt: str = "kmv-v1") -> DataFrame:
    """Jaccard similarity of two value sets from the bottom-k of their
    UNION: J ≈ |{h ∈ bottom_k(A ∪ B) : h ∈ A ∧ h ∈ B}| / |bottom_k|.

    One row out: (j_est, n_sample).  The sketch of the union is the
    elementwise merge of the two sides' sketches — at scale both sides
    would be pre-sketched once and merged here, never rescanned.
    """
    ha = df_a.select(_h48(F.col(col), salt).alias("h"),
                     F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    hb = df_b.select(_h48(F.col(col), salt).alias("h"),
                     F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    both = (ha.unionAll(hb).groupBy("h")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy(F.lit(1)).orderBy("h")
    kept = both.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    return kept.agg(
        (F.sum(F.col("in_a") * F.col("in_b")) / F.count("*")).alias("j_est"),
        F.count("*").alias("n_sample"),
    )


# ---------------------------------------------------------- count-min

def cms_counters(df: DataFrame, col: str, w: int = 1024, d: int = 4,
                 salt: str = "cms-v1") -> DataFrame:
    """Count-min counter table: d independent hash rows × w buckets.

    One scan: each input row explodes into its d (row, bucket) cells,
    then a single groupBy counts — map-side combine collapses the
    explosion to at most d×w rows per task regardless of input size.
    """
    cells = [F.struct(F.lit(j).alias("j"),
                      (_h48(F.col(col), f"{salt}-{j}") % F.lit(w)).alias("b"))
             for j in range(d)]
    return (df.select(F.explode(F.array(*cells)).alias("_jb"))
              .select(F.col("_jb.j").alias("j"), F.col("_jb.b").alias("b"))
              .groupBy("j", "b").agg(F.count("*").alias("c")))


def cms_lookup(counters: DataFrame, items: DataFrame, col: str,
               w: int = 1024, d: int = 4, salt: str = "cms-v1",
               out_col: str = "cms_est") -> DataFrame:
    """Point-query the sketch: est(item) = min over the d counters it
    hashes to (classic one-sided overestimate).  The counter table is
    tiny (d×w rows) → broadcast join, zero shuffle on the items side."""
    cells = [F.struct(F.lit(j).alias("j"),
                      (_h48(F.col(col), f"{salt}-{j}") % F.lit(w)).alias("b"))
             for j in range(d)]
    probed = items.select("*", F.explode(F.array(*cells)).alias("_jb")) \
                  .select("*", F.col("_jb.j").alias("j"), F.col("_jb.b").alias("b")) \
                  .drop("_jb")
    joined = probed.join(F.broadcast(counters), ["j", "b"], "left") \
                   .fillna({"c": 0})
    keys = [c for c in items.columns]
    return (joined.groupBy(*keys).agg(F.min("c").alias(out_col)))
