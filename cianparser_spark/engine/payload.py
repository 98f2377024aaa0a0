"""Image + caption payload path (the graft's input_hint table).

Implements over the ``images`` table
``(image_id, bytes BINARY, w, h, fmt, caption, phash BIGINT)``:

* ``build_images_table``   — materialize the deterministic corpus as parquet
* ``join_offers_images``   — offers ⋈ images on image_id (J5); broadcasts
                             the smaller side when wave-local
* ``decode_verify``        — Arrow-batched decode + PSNR-vs-reference check
                             (>= 40 dB for lossy fmt, exact for lossless)
* ``compute_phash``        — decode → dHash from pixels (populates the
                             phash column at ingest; oracle = stored hash)
* ``phash_dedup``          — keep-first-by-crawl-order per phash (A8, same
                             window pattern as the URL dedup A1)
* ``near_dup_pairs``       — Hamming-near duplicates via banded self-join
                             (BK-style band buckets, not O(n²))
* ``normalize_caption``    — vectorized caption normalization (the
                             pymorphy2 normal_form slot of the reference's
                             definers, cianparser/definers/definer_cities_id.py:52-54)

All heavy work is vectorized pandas/Arrow; nothing row-at-a-time at the
Spark API level.  Bytes are kept OUT of shuffles: dedup keys on
(phash, image_id) first and joins bytes back late (late
materialization) — see ``phash_dedup``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def build_images_table(spark: SparkSession, path: str, n: int = 2000,
                       partitions: int = 8) -> DataFrame:
    """Materialize the deterministic payload corpus.  Generation is
    distributed: each partition renders its own id range (no driver
    bottleneck), so the same code scales the corpus out on a cluster."""
    bounds = spark.range(0, n, 1, partitions).select(F.col("id").cast("long"))

    def gen(iterator):
        from cianparser_spark.corpus import webgen

        cols = [f.name for f in IMAGES_SCHEMA.fields]
        for pdf in iterator:
            rows = [webgen.image_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    df = bounds.mapInPandas(gen, IMAGES_SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return spark.read.schema(IMAGES_SCHEMA).parquet(path)


def join_offers_images(offers: DataFrame, images: DataFrame,
                       broadcast_images: bool = False) -> DataFrame:
    """offers ⋈ images on image_id (SURVEY.md J5).

    Default: shuffle hash join on image_id (both sides big at scale).
    When the wave's image slice is small (wave-local dim), pass
    broadcast_images=True to skip the shuffle.
    """
    right = F.broadcast(images) if broadcast_images else images
    return offers.join(right, "image_id", "left")


_VERIFY_SCHEMA = "image_id string, ok boolean, psnr double, caption_match boolean"


def decode_verify(joined: DataFrame, caption_col: str = "caption") -> DataFrame:
    """Per-row payload invariant (BASELINE.json input_hint): decoded
    pixels PSNR >= 40 dB vs the reference render (exact for lossless)
    and caption string equality.  Arrow-batched; zero per-row Python at
    the API level."""

    def check(iterator):
        from cianparser_spark.corpus import imaging, webgen

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id[3:])
                try:
                    px = imaging.decode(bytes(r.bytes), r.fmt)
                    ref = webgen.image_pixels(idx)  # the source-of-truth render
                    p = imaging.psnr(ref, px)
                    ok = (px == ref).all() if imaging.is_lossless(r.fmt) else p >= 40.0
                except Exception:
                    p, ok = float("nan"), False
                cap_ok = getattr(r, caption_col) == webgen.caption_text(idx)
                out.append({"image_id": r.image_id, "ok": bool(ok),
                            "psnr": float(p), "caption_match": bool(cap_ok)})
            yield pd.DataFrame(out, columns=["image_id", "ok", "psnr", "caption_match"])

    cols = ["image_id", "bytes", "fmt", caption_col]
    return joined.select(*cols).mapInPandas(check, _VERIFY_SCHEMA)


def compute_phash(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Recompute the 64-bit perceptual hash FROM PIXELS: decode →
    dHash (``imaging.phash64``), Arrow-batched.

    At ingest scale this is the op that POPULATES the ``phash`` column
    that ``phash_dedup``/``near_dup_pairs`` key on — a crawler receives
    bytes, not hashes.  The synthetic corpus stores a phash computed by
    the same pure function over the same pixels, so recomputed ==
    stored is a full per-row oracle for the distributed decode+hash
    path (contract query ``payload_phash_recompute``).  Unknown
    formats yield ok=false with a NULL hash instead of failing the job
    (same policy as ``ops.multimodal.decode_features``)."""
    from cianparser_spark.ops import spread

    def run(iterator):
        from cianparser_spark.corpus import imaging

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = imaging.decode(bytes(r.bytes), r.fmt)
                    h, ok = imaging.phash64(px), True
                except Exception:
                    h, ok = None, False
                out.append({"image_id": getattr(r, id_col), "phash": h, "ok": ok})
            yield pd.DataFrame(out, columns=["image_id", "phash", "ok"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(
        run, "image_id string, phash long, ok boolean")


def phash_dedup(images: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """Exact-phash dedup, keep-first (A8).  Late materialization: rank
    on (phash, order) over a byte-free projection, then join survivors
    back — image bytes never enter the shuffle."""
    order_cols = order_cols or ["image_id"]
    slim = images.select("image_id", "phash")
    w = Window.partitionBy("phash").orderBy(*order_cols)
    keep = (
        slim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("image_id")
    )
    return images.join(keep, "image_id", "left_semi")


def near_dup_pairs(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Hamming-near duplicate pairs via banded phash self-join.

    Split the 64-bit phash into 4 16-bit bands; by pigeonhole, any pair
    within Hamming distance <= 3*? shares at least one exact band when
    distance < 4 bands... concretely: pairs at distance <= max_hamming
    with a shared band are candidates; exact popcount verifies.  This is
    the LSH trick that keeps the join linear in band-bucket sizes
    instead of O(n²).
    """
    bands = images.select(
        "image_id", "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("phash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("image_id", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))

    # "first agreeing band": a pair sharing several bands multiplies
    # out of the equi-join; both sides carry the full 64-bit phash, so
    # "an earlier band also agrees" is a native filter — replaces a
    # distinct (a full shuffle of every candidate pair)
    def band_val(col, i):
        return F.shiftright(col, 16 * i).bitwiseAND(F.lit(0xFFFF))

    lp, rp = F.col("l.phash"), F.col("r.phash")
    earlier_agree = F.lit(False)
    for i in range(3):
        earlier_agree = earlier_agree | (
            (F.col("band") > i) & (band_val(lp, i) == band_val(rp, i))
        )
    pairs = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "val"])
        .filter((F.col("l.image_id") < F.col("r.image_id")) & ~earlier_agree)
        .select(
            F.col("l.image_id").alias("left_id"),
            F.col("r.image_id").alias("right_id"),
            F.col("l.phash").alias("lp"),
            F.col("r.phash").alias("rp"),
        )
    )
    ham = F.bit_count(F.col("lp").bitwiseXOR(F.col("rp")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def blocklist_probe(corpus: DataFrame, blocklist: DataFrame,
                    max_hamming: int = 3) -> DataFrame:
    """Ingest-time admission gate: match every corpus image against a
    curated phash blocklist at Hamming distance <= ``max_hamming`` —
    the moderation / known-bad filter a crawl pipeline runs on every
    incoming image (the asymmetric sibling of ``near_dup_pairs``, the
    same shape ``ops.dedup.incremental_lsh_pairs`` gives text).

    Returns one row per corpus image: ``(image_id, n_blocklist_hits,
    min_hamming, blocked)``; ``min_hamming`` is −1 for clean images so
    both engines agree without nullable-int drift.

    100 TB shape: the blocklist is small (curated, ≤millions) — its 4
    16-bit band projections are BROADCAST, so the corpus side is one
    map-only band explode + broadcast join + per-image aggregate; the
    corpus is never self-joined and image bytes never move (the probe
    reads only (image_id, phash)).  Recall at max_hamming<=3 is total
    by pigeonhole: <=3 differing bits leave >=1 of 4 bands exactly
    equal.  The first-agreeing-band filter dedups multi-band collisions
    without a distinct, same trick as ``near_dup_pairs``."""

    def bands(df: DataFrame, idc: str, pc: str) -> DataFrame:
        return df.select(
            F.col("image_id").alias(idc), F.col("phash").alias(pc),
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("phash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])).alias("b"),
        ).select(idc, pc, F.col("b.band").alias("band"), F.col("b.val").alias("val"))

    def band_val(col, i):
        return F.shiftright(col, 16 * i).bitwiseAND(F.lit(0xFFFF))

    cb = bands(corpus, "image_id", "cp")
    bb = bands(blocklist, "block_id", "bp")
    earlier_agree = F.lit(False)
    for i in range(3):
        earlier_agree = earlier_agree | (
            (F.col("band") > i) & (band_val(F.col("cp"), i) == band_val(F.col("bp"), i))
        )
    ham = F.bit_count(F.col("cp").bitwiseXOR(F.col("bp")))
    hits = (
        cb.join(F.broadcast(bb), ["band", "val"])
        .filter(~earlier_agree)
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("image_id")
        .agg(F.count(F.lit(1)).alias("_nh"), F.min("hamming").alias("_mh"))
    )
    return (
        corpus.select("image_id").join(hits, "image_id", "left")
        .select(
            "image_id",
            F.coalesce("_nh", F.lit(0)).cast("long").alias("n_blocklist_hits"),
            F.coalesce("_mh", F.lit(-1)).cast("long").alias("min_hamming"),
            (F.coalesce("_nh", F.lit(0)) > 0).cast("int").alias("blocked"),
        )
    )


def normalize_caption(df: DataFrame, col: str = "caption",
                      out: str = "caption_norm") -> DataFrame:
    """Vectorized caption normalization: lowercase, unify decimal
    commas, collapse whitespace, strip punctuation edges.  Stands in
    for the reference's pymorphy2 normal_form step
    (reference: definers/definer_cities_id.py:52-54) with a
    deterministic, dependency-free rule set — native Spark functions
    only, so Catalyst codegen applies."""
    c = F.lower(F.col(col))
    c = F.regexp_replace(c, r"(\d),(\d)", r"$1.$2")
    # \p{L}\p{N}: Unicode letters/digits (Java \w is ASCII-only)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s.\-²]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out, c)


def parse_captions(df: DataFrame, col: str = "caption") -> DataFrame:
    """Typed extraction from the payload caption — the reference's
    card-spec parse (cianparser/flat/list.py spec walk, SURVEY.md
    P7-P9) re-expressed over the BASELINE.json payload table: rooms
    count (`Студия` → 0), area in m², floor / floors_count, plus an
    ``admitted`` training-set gate (all fields parsed, area and floor
    in plausible ranges).  Malformed captions yield null fields and
    admitted=false — never a task failure.

    Pure Catalyst (regexp_extract + try_cast): zero Python, whole-stage
    codegen, map-only — at 100 TB this is a scan-bound pass and the
    regexes are the deliberately simple digit/anchor subset that Java
    and RE2-family engines match identically (same contract as the PII
    scrub, ops/text.py)."""
    cap = F.col(col)
    rooms = F.when(cap.startswith("Студия"), F.lit(0)).otherwise(
        F.regexp_extract(cap, r"^(\d+)-комн", 1).try_cast("int"))
    area = F.replace(F.regexp_extract(cap, r"(\d+(,\d+)?) м²", 1),
                     F.lit(","), F.lit(".")).try_cast("double")
    floor_ = F.regexp_extract(cap, r"(\d+)/(\d+) этаж", 1).try_cast("int")
    floors = F.regexp_extract(cap, r"(\d+)/(\d+) этаж", 2).try_cast("int")
    admitted = (rooms.isNotNull() & area.isNotNull() & floor_.isNotNull()
                & floors.isNotNull()
                & area.between(10.0, 500.0)
                & (floor_ >= 1) & (floor_ <= floors))
    out = (df.withColumn("rooms", rooms)
             .withColumn("area_m2", area)
             .withColumn("floor", floor_)
             .withColumn("floors_count", floors))
    return out.withColumn(
        "admitted", F.coalesce(admitted, F.lit(False)))
