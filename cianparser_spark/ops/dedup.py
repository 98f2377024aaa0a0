"""Document deduplication operators (exact and near-duplicate).

All operate on a documents table ``(doc_id, text, ...)``:

* exact            — hash-groupBy keep-min (one shuffle on the hash)
* ngram Jaccard    — shingle explode → pair join → set-overlap ratio
* MinHash + LSH    — shingle → minhash signature → band buckets →
                     bucket join → verified Jaccard (linear, not O(n²))
* SimHash          — 64-bit sign-of-weighted-sum fingerprint; near-dups
                     share bands (Hamming-banded join like phash)
* embedding cosine — near-dup pairs over an embedding column

Scale notes: every near-dup operator is candidate-generation via an
equi-join on a derived key (band/bucket), never a cross join; exact
verification runs only on candidates.  Shingling is a native Catalyst
expression (JVM codegen); the minhash/simhash numeric kernels are
batch-vectorized Arrow UDFs (one flattened hash + segmented reduction
per batch, zero per-row Python), hashing via stable 64-bit mixes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import spread

# ------------------------------------------------------------------ exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text (hash-groupBy).

    At scale: groupBy on xxhash64(text) (fixed width) rather than the
    full text; candidate collisions verified by the exact text join.
    """
    hashed = docs.withColumn("_h", F.xxhash64(F.col(text_col)))
    w = Window.partitionBy("_h", text_col).orderBy(id_col)
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def exact_binary_dedup(df: DataFrame, bytes_col: str = "bytes",
                       id_col: str = "image_id") -> DataFrame:
    """Byte-exact payload dedup — the cheap FIRST pass of an image
    pipeline, before perceptual (phash) dedup: group by a content hash
    of the raw bytes, keep the smallest id, count copies.

    Returns (id_col, n_copies, content_key) — one row per distinct
    payload, ordered by nothing (caller sorts).

    100 TB shape: the md5 is computed map-side next to the scan, so the
    exchange carries (32-char key, id) pairs — never payload bytes —
    and the aggregate is map-side-combined; skew is bounded by the
    largest duplicate group.  The key is md5(hex(bytes)) rather than
    md5(bytes) so the SQL oracle (DuckDB's md5 takes VARCHAR only) can
    recompute the identical key; both engines uppercase hex."""
    key = F.md5(F.hex(F.col(bytes_col)))
    return (
        df.select(F.col(id_col), key.alias("content_key"))
        .groupBy("content_key")
        .agg(F.min(id_col).alias(id_col),
             F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies", "content_key")
    )


# ------------------------------------------------------------ shingling

def _shingles(texts: pd.Series, k: int) -> pd.Series:
    """Pure-Python reference of the shingling semantics (kept for truth
    dumps / property tests; the Spark path is the native expression
    below — ``test_shingle_expr_matches_python`` pins them equal)."""
    out = []
    for t in texts:
        words = t.split()
        if len(words) < k:
            out.append([" ".join(words)] if words else [])
        else:
            out.append([" ".join(words[i : i + k]) for i in range(len(words) - k + 1)])
    return pd.Series(out)


def shingle_expr(text_col: str, k: int):
    """k-word shingles as a NATIVE Catalyst expression (array<string>).

    Whole-stage-codegen'd JVM work — no Arrow round-trip, no Python
    worker in the shingling hot path (at 100 TB this stage touches
    every byte of every document).  Semantics match ``str.split()``:
    split on runs of whitespace, drop empties; < k words → one joined
    shingle; empty text → empty array.  The DuckDB oracles use the
    same ``regexp_split_to_array(trim(text), '\\s+')`` grammar."""
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda w: w != F.lit(""))
    n = F.size(words)
    full = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.array_join(F.slice(words, i + F.lit(1), k), " "),
    )
    return (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.array_join(words, " ")))
        .otherwise(full)
    )


def shingle_df(docs: DataFrame, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    return (
        spread(docs).select(id_col, shingle_expr(text_col, k).alias("shingles"))
        .select(id_col, F.explode(F.array_distinct("shingles")).alias("shingle"))
    )


def _jaccard_of_pairs(cand: DataFrame, sh: DataFrame, sizes: DataFrame,
                      id_col: str, threshold: float,
                      sh_right: DataFrame | None = None,
                      sizes_right: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard computed ONLY for the given candidate pairs.

    Work is Σ_pairs |shingles(left)| — linear in the candidate set, not
    in the corpus-wide shingle co-occurrence (the all-pairs blow-up LSH
    exists to avoid).  Pairs with empty intersection drop out of the
    count join and are below any positive threshold anyway.  For the
    incremental (batch-vs-corpus) path the two pair sides come from
    different tables — pass ``sh_right``/``sizes_right``."""
    if sh_right is None:
        sh_right = sh
    if sizes_right is None:
        sizes_right = sizes
    l = sh.select(F.col(id_col).alias("left_id"), "shingle")
    r = sh_right.select(F.col(id_col).alias("right_id"), "shingle")
    inter = (
        cand.join(l, "left_id")
        .join(r, ["right_id", "shingle"])
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed(id_col, "left_id").withColumnRenamed("n", "nl")), "left_id")
        .join(F.broadcast(sizes_right.withColumnRenamed(id_col, "right_id").withColumnRenamed("n", "nr")), "right_id")
        .withColumn("jaccard", F.col("inter") / (F.col("nl") + F.col("nr") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.6,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_df: int | None = 1000) -> DataFrame:
    """All pairs with k-word-shingle Jaccard >= threshold.

    Candidate pairs come from the shingle equi-join (docs sharing at
    least one shingle); |A∩B| is the join count, |A∪B| = |A|+|B|−∩.

    ``max_shingle_df`` caps the document frequency of shingles admitted
    to the CANDIDATE join (Jaccard itself stays exact over full shingle
    sets): one stop-shingle shared by 10^8 docs makes the self-join
    quadratic in that bucket, so every production near-dup pipeline
    drops ubiquitous shingles from candidate generation.  A pair whose
    ONLY shared shingles are capped ones is missed — acceptable by
    construction (such pairs share nothing discriminative).

    The PRODUCTION DEFAULT is 1000: a shingle shared by more than 1000
    docs contributes >10^6 candidate pairs on its own and identifies
    nothing, so it is excluded from candidate generation — the
    worst-case join cost is then O(distinct_shingles × 1000²) instead
    of quadratic in the hottest bucket.  Pass ``None`` to opt in to the
    exact unbounded semantics (the oracle query does, so the checked
    mode stays bit-exact; any corpus where every shingle df ≤ cap is
    identical under both modes)."""
    sh = shingle_df(docs, k, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    cand_sh = sh
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        cand_sh = sh.join(rare, "shingle", "left_semi")
        cand = (
            cand_sh.alias("l")
            .join(cand_sh.alias("r"), "shingle")
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("left_id"),
                    F.col(f"r.{id_col}").alias("right_id"))
            .distinct()
        )
        return _jaccard_of_pairs(cand, sh, sizes, id_col, threshold)
    inter = (
        sh.alias("l")
        .join(sh.alias("r"), "shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("left_id"), F.col(f"r.{id_col}").alias("right_id"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed(id_col, "left_id").withColumnRenamed("n", "nl")), "left_id")
        .join(F.broadcast(sizes.withColumnRenamed(id_col, "right_id").withColumnRenamed("n", "nr")), "right_id")
        .withColumn("jaccard", F.col("inter") / (F.col("nl") + F.col("nr") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


# -------------------------------------------------------------- minhash

def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    # splitmix64 finalizer — stable across processes; numpy uint64
    # arithmetic wraps mod 2^64, constants pre-masked to fit C uint64
    with np.errstate(over="ignore"):
        z = x + np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def minhash_signatures(docs: DataFrame, k: int = 3, n_hashes: int = 64,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc -> array<bigint> of n minhash values over k-word shingles.

    Shingling runs as the NATIVE ``shingle_expr`` (JVM codegen); only
    the irreducibly-numeric part crosses to Python, and that part is
    fully BATCH-vectorized: one flattened ``pd.util.hash_array`` call
    per Arrow batch + a single splitmix pass + ``minimum.reduceat``
    segmented mins — zero per-row Python (the north-rule invariant).
    Values are bit-identical to the historical per-text loop (the hash
    is elementwise; a multiset's min equals its set's min).
    """

    seed_consts = np.array(
        [(i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF for i in range(n_hashes)],
        dtype=np.uint64,
    )
    # bound the (n_hashes, chunk_shingles) splitmix temp to ~64 MB
    chunk_target = 1 << 17

    def sig(shingle_lists: pd.Series) -> pd.Series:
        lens = np.fromiter((len(a) for a in shingle_lists), dtype=np.int64,
                           count=len(shingle_lists))
        out = np.zeros((len(shingle_lists), n_hashes), dtype=np.int64)
        nz = np.flatnonzero(lens)
        pos = 0
        while pos < nz.size:
            # take whole documents until the shingle budget fills
            end = pos
            tot = 0
            while end < nz.size and (end == pos or tot + lens[nz[end]] <= chunk_target):
                tot += int(lens[nz[end]])
                end += 1
            idx = nz[pos:end]
            flat = np.concatenate(
                [np.asarray(shingle_lists.iloc[i], dtype=object) for i in idx]
            )
            base = pd.util.hash_array(flat).astype(np.uint64)
            with np.errstate(over="ignore"):
                z = base[None, :] + seed_consts[:, None]
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                z = z ^ (z >> np.uint64(31))
            fstarts = np.zeros(idx.size, dtype=np.int64)
            fstarts[1:] = np.cumsum(lens[idx])[:-1]
            mins = np.minimum.reduceat(z, fstarts, axis=1)  # (H, docs)
            out[idx] = (mins.T & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            pos = end
        return pd.Series(list(out))

    shingled = spread(docs).select(
        id_col, F.array_distinct(shingle_expr(text_col, k)).alias("_sh")
    )
    return shingled.select(
        id_col, F.pandas_udf(sig, "array<bigint>")(F.col("_sh")).alias("sig")
    )


def _banded(sigs: DataFrame, bands: int, rows_per_band: int,
            id_col: str) -> DataFrame:
    """Signature → (id, band, bucket) rows: one xxhash64 bucket per
    signature band, exploded narrow and distinct."""
    return sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band).cast("string")).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket").distinct()


def build_dedup_index(docs: DataFrame, k: int = 3, n_hashes: int = 64,
                      bands: int = 16, text_col: str = "text",
                      id_col: str = "doc_id",
                      sigs: DataFrame | None = None) -> DataFrame:
    """Corpus-side LSH index: the banded (id, band, bucket) table,
    persisted.  Build once over the standing corpus; every incoming
    batch probes it with an equi-join.  At 100 TB this is the table
    you write back to Iceberg partitioned by (band, bucket % N) so a
    batch probe prunes to the buckets it actually touches — the corpus
    text is never rescanned at ingest time.

    Pass precomputed ``sigs`` (``minhash_signatures`` rows for exactly
    ``docs``) to skip the signature kernel — signatures are row-local,
    so a filtered slice of a full-corpus signature frame is
    bit-identical to recomputing on the filtered docs."""
    if sigs is None:
        sigs = minhash_signatures(docs, k, n_hashes, text_col, id_col)
    return _banded(sigs, bands, n_hashes // bands, id_col).persist()


def incremental_lsh_pairs(new_docs: DataFrame, corpus_docs: DataFrame,
                          corpus_index: DataFrame, k: int = 3,
                          n_hashes: int = 64, bands: int = 16,
                          threshold: float = 0.6, text_col: str = "text",
                          id_col: str = "doc_id",
                          new_sigs: DataFrame | None = None) -> DataFrame:
    """Ingest-time near-dup admission: pairs (new_id, corpus_id) with
    exact Jaccard ≥ threshold, found by probing the prebuilt corpus
    index with the batch's bands — work scales with the BATCH (its
    signatures + the candidates it collides into), never with corpus
    size.  Verification shingles the corpus rows only for the
    candidate ids (semi-join pushdown via the candidate list).

    Same band config ⇒ same recall guarantee as minhash_lsh_pairs;
    ``corpus_docs`` must be the table ``corpus_index`` was built from.
    ``new_sigs`` (precomputed signatures for exactly ``new_docs``)
    skips the batch-side signature kernel — same reuse contract as
    ``build_dedup_index``.
    """
    rows_per_band = n_hashes // bands
    if new_sigs is None:
        new_sigs = minhash_signatures(new_docs, k, n_hashes, text_col, id_col)
    new_banded = _banded(new_sigs, bands, rows_per_band, id_col)
    cand = (
        new_banded.alias("l")
        .join(corpus_index.alias("r"), ["band", "bucket"])
        .select(F.col(f"l.{id_col}").alias("left_id"),
                F.col(f"r.{id_col}").alias("right_id"))
        .distinct()
    )
    sh_new = shingle_df(new_docs, k, text_col, id_col)
    # shingle only the corpus rows that appear in a candidate pair
    hit_ids = cand.select(F.col("right_id").alias(id_col)).distinct()
    sh_corpus = shingle_df(
        corpus_docs.join(F.broadcast(hit_ids), id_col, "left_semi"),
        k, text_col, id_col)
    sizes_new = sh_new.groupBy(id_col).agg(F.count("*").alias("n"))
    sizes_corpus = sh_corpus.groupBy(id_col).agg(F.count("*").alias("n"))
    return _jaccard_of_pairs(cand, sh_new, sizes_new, id_col, threshold,
                             sh_right=sh_corpus, sizes_right=sizes_corpus)


def minhash_lsh_pairs(docs: DataFrame, k: int = 3, n_hashes: int = 64,
                      bands: int = 16, threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id",
                      sigs: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs: minhash → band buckets → bucket equi-join →
    exact Jaccard verification of the candidates only.

    The banded self-join evaluates the signature kernel once per join
    side when built lazily (two ArrowEvalPython nodes in the plan —
    cheap post-vectorization, but it re-reads the text twice).  For
    repeated runs or when the text scan is the cost (100 TB), pass a
    precomputed/persisted ``sigs`` frame (``minhash_signatures(...)
    .persist()``) — same reuse pattern as the ANN ``build_*_index``
    APIs; outputs are identical either way."""
    rows_per_band = n_hashes // bands
    if sigs is None:
        sigs = minhash_signatures(docs, k, n_hashes, text_col, id_col)
    # candidate dedup via narrow distincts: banded rows stay 3 narrow
    # columns through every exchange, and the pair distinct is bounded
    # by the candidate count (post-banding, i.e. near-dup density, not
    # corpus size).  The "first agreeing band" carried-array variant
    # (see simhash_near_pairs) was measured 1.6× SLOWER here: the
    # 16-long bucket array rides both sides of the self-join and
    # outweighs the saved distinct at any tested SF.
    banded = _banded(sigs, bands, rows_per_band, id_col)
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("left_id"), F.col(f"r.{id_col}").alias("right_id"))
        .distinct()
    )
    # verification runs ONLY on the LSH candidates (never the all-pairs
    # shingle co-occurrence): join each candidate pair back to its two
    # shingle sets and compute exact Jaccard per pair — linear in the
    # candidate count at any corpus size
    sh = shingle_df(docs, k, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    return _jaccard_of_pairs(cand, sh, sizes, id_col, threshold)


# --------------------------------------------------------------- simhash

def simhash_text(t: str) -> int:
    """64-bit SimHash of one text (signed two's-complement int64).

    Pure function shared by the Spark UDF below AND the oracle truth
    dump (truth.ensure_simhash_truth) — the per-doc fingerprint is the
    shared definition; the DISTRIBUTED pair generation (banding, join,
    hamming filter) is what the DuckDB all-pairs oracle then verifies."""
    words = t.split()
    if not words:
        return 0
    hs = pd.util.hash_array(np.asarray(words, dtype=object)).astype(np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    h = 0
    for i in range(64):
        if v[i] > 0:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (sign of per-bit weighted sums).

    Batch-vectorized: one flattened ``hash_array`` per Arrow batch, bit
    expansion + ``add.reduceat`` segmented sums — no per-row Python
    loop.  Bit-identical to the scalar reference ``simhash_text``
    (pinned by ``test_simhash_banding_recall_guarantee`` and
    ``test_simhash_vectorized_matches_scalar``)."""

    bit_idx = np.arange(64, dtype=np.uint64)
    chunk_target = 1 << 17  # bound the (chunk_words, 64) int32 temp to ~32 MB

    def sh(texts: pd.Series) -> pd.Series:
        word_lists = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64,
                           count=len(word_lists))
        out = np.zeros(len(word_lists), dtype=np.int64)
        nz = np.flatnonzero(lens)
        pos = 0
        while pos < nz.size:
            end = pos
            tot = 0
            while end < nz.size and (end == pos or tot + lens[nz[end]] <= chunk_target):
                tot += int(lens[nz[end]])
                end += 1
            idx = nz[pos:end]
            flat = np.concatenate(
                [np.asarray(word_lists[i], dtype=object) for i in idx]
            )
            hs = pd.util.hash_array(flat).astype(np.uint64)
            bits = ((hs[:, None] >> bit_idx) & np.uint64(1)).astype(np.int32)
            fstarts = np.zeros(idx.size, dtype=np.int64)
            fstarts[1:] = np.cumsum(lens[idx])[:-1]
            sums = np.add.reduceat(bits, fstarts, axis=0).astype(np.int64)
            v = 2 * sums - lens[idx][:, None]  # (docs, 64) weighted bit sums
            h = ((v > 0).astype(np.uint64) << bit_idx).sum(axis=1)
            out[idx] = h.view(np.int64)  # two's-complement reinterpret
            pos = end
        return pd.Series(out)

    return spread(docs).select(id_col, F.pandas_udf(sh, "long")(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hamming-banded self-join over simhash (4×16-bit bands).

    Recall guarantee by pigeonhole: a pair within hamming distance <= 3
    differs in <= 3 of the 4 bands, so it MUST agree exactly on at
    least one band and is always a candidate.  For max_hamming > 3 the
    band join is a high-recall heuristic (near-dup texts concentrate
    differing bits), not exhaustive — the oracle-checked contract query
    uses max_hamming=3."""
    sh = simhash(docs, text_col, id_col)
    bands = sh.select(
        id_col, "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"),
                         F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"))
                for i in range(4)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.val").repartition("band", "val")
    # ^ identical exchange on both self-join sides → ReuseExchange runs
    #   the simhash kernel once (see minhash_lsh_pairs note)

    def band_val(col, i):
        return F.shiftright(col, 16 * i).bitwiseAND(F.lit(0xFFFF))

    # "first agreeing band": a pair agreeing on several 16-bit bands
    # multiplies out of the equi-join; both sides carry the full 64-bit
    # hash, so "some band < b also agrees" is a native filter — no
    # distinct (= no shuffle of every candidate pair)
    lh, rh = F.col("l.simhash"), F.col("r.simhash")
    earlier_agree = F.lit(False)
    for i in range(3):
        earlier_agree = earlier_agree | (
            (F.col("band") > i) & (band_val(lh, i) == band_val(rh, i))
        )
    pairs = (
        bands.alias("l").join(bands.alias("r"), ["band", "val"])
        .filter((F.col(f"l.{id_col}") < F.col(f"r.{id_col}")) & ~earlier_agree)
        .select(F.col(f"l.{id_col}").alias("left_id"), F.col(f"r.{id_col}").alias("right_id"),
                F.col("l.simhash").alias("lh"), F.col("r.simhash").alias("rh"))
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("lh").bitwiseXOR(F.col("rh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


# ----------------------------------------------------- embedding cosine

ALL_PAIRS = 0  # sentinel: explicit opt-in to the O(n²) scan


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.95,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_blocks: int = 8, lsh_buckets: int | None = 16,
                      top_k: int | None = None) -> DataFrame:
    """Embedding near-dup pairs with cosine >= threshold.

    Blocked-GEMM: rows hash into ``n_blocks`` blocks; every block PAIR
    is one cogroup whose cosine matrix is a single numpy matmul
    (Arrow-batched) — replaces a per-pair higher-order-function fold
    that is ~50× slower.  Work is n_blocks*(n_blocks+1)/2 cogroup
    tasks, each O(|bl|·|br|·dim) BLAS.

    DEFAULT IS SCALE-SAFE: ``lsh_buckets=16`` pre-buckets rows by
    sign-LSH so only same-bucket block pairs materialize (candidate
    generation — near-identical vectors land in one bucket with high
    probability; cross-bucket pairs are missed by design).  Pass
    ``lsh_buckets=None`` (or ``ALL_PAIRS``) to opt IN to the exact
    O(n²) scan — correct for global-top-k oracles, quadratic at scale.
    """
    if lsh_buckets == ALL_PAIRS:
        lsh_buckets = None
    d = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("vec"))
    if lsh_buckets:
        from cianparser_spark.ops.similarity import signature_bucket

        d = signature_bucket(d, "vec", n_planes=max(1, int(np.log2(lsh_buckets))))
    else:
        d = d.withColumn("bucket", F.lit(0))
    d = d.withColumn("block", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks)))

    pair_rows = [(b, bl, br) for b in range(lsh_buckets or 1)
                 for bl in range(n_blocks) for br in range(n_blocks) if bl <= br]
    pairs = d.sparkSession.createDataFrame(pair_rows, "pbucket long, bl long, br long")
    left = d.alias("dl").join(
        F.broadcast(pairs),
        (F.col("dl.bucket") == F.col("pbucket")) & (F.col("dl.block") == F.col("bl")),
    ).select(F.col("pbucket").alias("bkt"), "bl", "br", f"dl.{id_col}", "dl.vec")
    # disjoint column names on the right side: cogrouping two frames
    # that share lineage is otherwise flagged as an ambiguous self-join
    right = d.alias("dr").join(
        F.broadcast(pairs),
        (F.col("dr.bucket") == F.col("pbucket")) & (F.col("dr.block") == F.col("br")),
    ).select(
        F.col("pbucket").alias("rbkt"), F.col("bl").alias("rbl"),
        F.col("br").alias("rbr"), F.col(f"dr.{id_col}").alias("rid_"),
        F.col("dr.vec").alias("rvec"),
    )

    def gemm(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine": []})
        _, bl, br = key
        lm = np.stack(lpdf["vec"].to_numpy())
        rm = np.stack(rpdf["rvec"].to_numpy())
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        cos = lm @ rm.T
        lid = lpdf[id_col].to_numpy()
        rid = rpdf["rid_"].to_numpy()
        mask = cos >= threshold
        if bl == br:  # same block: dedup inside the square matrix
            mask &= lid[:, None] < rid[None, :]
        ii, jj = np.where(mask)
        vals = cos[ii, jj]
        if top_k is not None and len(vals) > top_k:
            # a global top-k is a subset of the per-block-pair top-ks,
            # so pruning here is lossless for the caller's LIMIT k
            keep = np.argpartition(-vals, top_k - 1)[:top_k]
            ii, jj, vals = ii[keep], jj[keep], vals[keep]
        li, ri = lid[ii], rid[jj]
        # canonical orientation: ids hash into blocks unordered, so
        # cross-block pairs must be (min, max) rather than filtered
        lo, hi = np.minimum(li, ri), np.maximum(li, ri)
        return pd.DataFrame({"left_id": lo, "right_id": hi, "cosine": vals})

    id_type = dict(emb.dtypes)[id_col]
    return (
        left.groupBy("bkt", "bl", "br")
        .cogroup(right.groupBy("rbkt", "rbl", "rbr"))
        .applyInPandas(gemm, f"left_id {id_type}, right_id {id_type}, cosine double")
    )
