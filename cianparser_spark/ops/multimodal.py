"""Multimodal payload operators: opaque binary columns + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed
metadata (w/h/fmt/...).  The Spark-side plumbing — schema, Arrow batch
shape, partitioning, late materialization of bytes — is real and
tested; png decode, real baseline JPEG (corpus.jpegbase), BMP + GIF
(corpus.bmpgif, real LZW), baseline TIFF, the legacy qjpg stand-in,
WAV audio (PCM / G.711 / IEEE float / IMA+MS ADPCM), FLAC, and
BI_RGB/MJPG AVI video are fully real (cianparser_spark.corpus.*).

Scope boundary (FINAL, round-4 decision): mp3/Ogg-Vorbis SAMPLE
decode and XVID FRAME decode permanently stop at
``NotImplementedError`` — their CONTAINER layers are real
(corpus.mpegaudio / corpus.oggdemux / corpus.aviriff), but the
psychoacoustic/DCT payload decode is patent-era DSP with no codec
library and no validation oracle in this sandbox; a spec-from-memory
decoder would be unverifiable, and the deterministic fixtures carry
synthetic payloads no real decoder could consume.  Corrupt or
out-of-envelope payloads always degrade to ok=false rows, never task
failures.

Operators:
* decode_features — decode → (mean/std luma, edge energy) features
* resize          — area mean-pool resize, re-encoded PNG
* frame_sample    — deterministic frame sampling over a synthetic
                    "video" = concatenated encoded frames (schema/
                    plumbing exercise for the video modality)
"""

from __future__ import annotations

from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import spread

SUPPORTED_FMTS = ("png", "pngf", "pngi", "qjpg", "jpeg", "bmp", "gif", "tiff")


def _decode(data: bytes, fmt: str) -> np.ndarray:
    from cianparser_spark.corpus import imaging

    if fmt not in SUPPORTED_FMTS:
        # STUB: real deployments plug PIL/libjpeg/ffmpeg here; this
        # container has no external codecs (documented limitation).
        raise NotImplementedError(f"no codec for fmt={fmt!r} in this environment")
    return imaging.decode(data, fmt)


_FEAT_SCHEMA = (
    "image_id string, ok boolean, mean_luma double, std_luma double, edge_energy double"
)


def image_features(px: np.ndarray) -> dict:
    """Visual features of decoded pixels — the shared per-image
    definition used by the Spark operator below and by the oracle truth
    dump (truth.ensure_payload_truth), so the driver's DuckDB compare
    verifies the distributed decode+Arrow plumbing end to end."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    gx = np.abs(np.diff(luma, axis=1)).mean()
    gy = np.abs(np.diff(luma, axis=0)).mean()
    return {
        "mean_luma": float(luma.mean()),
        "std_luma": float(luma.std()),
        "edge_energy": float(gx + gy),
    }


def decode_features(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Arrow-batched decode + simple visual features; unknown formats
    yield ok=false rows instead of failing the job."""

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(r.bytes), r.fmt)
                    out.append({
                        "image_id": getattr(r, id_col), "ok": True,
                        **image_features(px),
                    })
                except NotImplementedError:
                    out.append({"image_id": getattr(r, id_col), "ok": False,
                                "mean_luma": None, "std_luma": None, "edge_energy": None})
            yield pd.DataFrame(out, columns=["image_id", "ok", "mean_luma", "std_luma", "edge_energy"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(run, _FEAT_SCHEMA)


def format_roundtrip_features(spark, formats=("png", "jpeg", "bmp", "gif"),
                              n_per_fmt: int = 12, w: int = 40, h: int = 32,
                              seed0: int = 7000) -> DataFrame:
    """Distributed encode→decode→features across the full image
    container surface (PNG / baseline JPEG / BMP / GIF): the input is
    just (fmt, seed) rows; pixels are generated, ENCODED into the real
    container, decoded back and featurized ON THE EXECUTORS inside one
    Arrow-batched map-only stage — no bytes ever touch the driver, no
    shuffle, partitioning inherits the seed frame.  ``n_bytes`` is the
    length of the distributed-encoded container, so a byte-level
    encoder divergence anywhere becomes a driver-visible mismatch vs
    the pure-Python truth loop (truth.ensure_formats_truth)."""
    seeds = spark.createDataFrame(
        [(fmt, i) for fmt in formats for i in range(n_per_fmt)],
        "fmt string, i int").repartition(max(len(formats), 4), "fmt", "i")

    def run(iterator):
        from cianparser_spark.corpus import imaging

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                px = imaging.gen_pixels(seed0 + int(r.i), w, h)
                blob = imaging.encode(px, r.fmt)
                feats = image_features(imaging.decode(blob, r.fmt))
                out.append({"fmt": r.fmt, "image_id": f"img{int(r.i):04d}",
                            "ok": True, "n_bytes": len(blob), **feats})
            yield pd.DataFrame(
                out, columns=["fmt", "image_id", "ok", "n_bytes",
                              "mean_luma", "std_luma", "edge_energy"])

    return seeds.mapInPandas(
        run, "fmt string, image_id string, ok boolean, n_bytes long, "
             "mean_luma double, std_luma double, edge_energy double")


def png_meta_text(i: int) -> dict:
    """Deterministic textual metadata for corpus image #i — what a real
    crawl finds in PNG tEXt/zTXt chunks (title, author, license).  The
    Description is long enough to force a zTXt (compressed) chunk, so
    both chunk types are always exercised.  Shared by the Spark encode
    stage and the oracle truth loop."""
    from cianparser_spark.corpus import webgen

    return {
        "Title": webgen.caption_text(i),
        "Author": f"author{i % 11}",
        "Copyright": ("CC-BY-4.0", "CC0-1.0", "proprietary")[i % 3],
        "Description": (f"synthetic interior photo {i} "
                        + "of the listing payload corpus " * 3),
    }


def png_text_meta(images: DataFrame, id_col: str = "image_id",
                  head_bytes: int | None = 65536) -> DataFrame:
    """Extract PNG textual metadata (tEXt / zTXt / iTXt) from the
    binary column WITHOUT decoding pixels: the chunk walk reads a few
    hundred header bytes per image and never inflates IDAT.

    The pure parse is ~200x cheaper than a decode, but in mapInPandas
    the cost that actually dominates is SHIPPING the payload bytes
    through Arrow into Python — so by default only the first
    ``head_bytes`` of each blob cross the boundary, sliced JVM-side
    (native binary substring; bench_meta measures the win).  Textual
    chunks written after IDAT — spec-legal but something no mainstream
    encoder does — are missed in capped mode; pass head_bytes=None for
    the exact full scan.  One output row per (image, keyword); non-PNG
    or malformed payloads contribute zero rows (ancillary semantics),
    never task failures.  Map-only, partitioning inherits the input."""

    def run(iterator):
        from cianparser_spark.corpus import imaging

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pairs = imaging.png_text_chunks(bytes(r.bytes))
                except Exception:
                    continue
                rid = getattr(r, id_col)
                out.extend({"image_id": rid, "key": k, "value": v}
                           for k, v in pairs)
            yield pd.DataFrame(out, columns=["image_id", "key", "value"])

    bytes_col = ("bytes" if head_bytes is None
                 else F.substring("bytes", 1, head_bytes).alias("bytes"))
    return spread(images.select(id_col, bytes_col)).mapInPandas(
        run, "image_id string, key string, value string")


def exif_demo_tags(i: int) -> dict | None:
    """Deterministic EXIF payload for corpus image #i: every 5th image
    carries no EXIF, every 3rd EXIF without GPS, the rest EXIF WITH a
    GPS fix — so extract and scrub both see all three populations.
    Shared by the Spark build stage and the oracle truth loop."""
    if i % 5 == 0:
        return None
    tags = {"make": f"Cam{i % 7}", "model": f"M-{i % 4}",
            "datetime": f"2024:0{1 + i % 9}:1{i % 10} 0{i % 10}:30:00",
            "orientation": 1 + i % 8,
            "software": "cianparser-spark"}
    if i % 3 != 0:
        tags["lat"] = round(-80.0 + (i * 7.31) % 160.0, 4)
        tags["lon"] = round(-170.0 + (i * 13.57) % 340.0, 4)
    return tags


def exif_meta(images: DataFrame, id_col: str = "image_id",
              head_bytes: int | None = 262144) -> DataFrame:
    """EXIF tag extraction from the binary column: walks the JPEG
    marker stream to APP1 and parses the TIFF IFDs — stops at SOS, so
    the entropy-coded stream (the bulk of every byte at 100 TB) is
    never scanned.  As with png_text_meta, the Arrow transfer of the
    payload dominates the pass, so only the first ``head_bytes`` cross
    into Python by default (JVM-side binary substring).  This is
    spec-safe headroom: APPn segments must precede SOS and each is at
    most 64 KiB (u16 length), so EXIF lives in the first few hundred
    KB of any real JPEG; head_bytes=None forces the full scan.  One
    row per (image, tag), values stringified; GPS arrives as signed
    decimal 'gps_lat'/'gps_lon'.  Non-JPEG or EXIF-free payloads
    contribute zero rows."""

    def run(iterator):
        from cianparser_spark.corpus import exif

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    tags = exif.parse_exif(bytes(r.bytes))
                except Exception:
                    continue
                rid = getattr(r, id_col)
                out.extend({"image_id": rid, "tag": k, "value": str(v)}
                           for k, v in tags.items())
            yield pd.DataFrame(out, columns=["image_id", "tag", "value"])

    bytes_col = ("bytes" if head_bytes is None
                 else F.substring("bytes", 1, head_bytes).alias("bytes"))
    return spread(images.select(id_col, bytes_col)).mapInPandas(
        run, "image_id string, tag string, value string")


def exif_gps_scrub(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """The privacy op: remove GPS location data by rebuilding the APP1
    from the parsed non-GPS tags — byte-level marker surgery, the
    entropy-coded stream is copied untouched (decoded pixels
    bit-identical, verified in the oracle truth loop).  Returns
    (image_id, bytes, had_gps); images without EXIF or GPS pass
    through byte-identical with had_gps=false.  Map-only."""

    def run(iterator):
        from cianparser_spark.corpus import exif

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                blob = bytes(r.bytes)
                try:
                    clean, had = exif.scrub_gps(blob)
                except Exception:
                    clean, had = blob, False
                out.append({"image_id": getattr(r, id_col),
                            "bytes": clean, "had_gps": had})
            yield pd.DataFrame(out, columns=["image_id", "bytes", "had_gps"])

    return spread(images.select(id_col, "bytes")).mapInPandas(
        run, "image_id string, bytes binary, had_gps boolean")


# Quality-filter thresholds: chosen to split the deterministic corpus
# non-trivially (median blur ≈ 474, median entropy ≈ 7.0), so both the
# keep and drop branches are exercised by every contract run.
QUALITY_MIN_BLUR = 470.0      # variance-of-Laplacian below this = blurry
QUALITY_MIN_ENTROPY = 6.9     # luma-histogram entropy below this = flat
QUALITY_MAX_CLIP_FRAC = 0.3   # under-/over-exposed pixel fraction cap


def image_quality(px: np.ndarray) -> dict:
    """Training-data quality metrics of decoded pixels — the standard
    LAION-style image filters: blur (variance of the 3x3 4-neighbor
    Laplacian), luma-histogram Shannon entropy, and under-/over-exposed
    pixel fractions.  Shared verbatim by the Spark operator and the
    oracle truth dump (truth.ensure_quality_truth) so both sides
    compute bit-identical doubles."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    lap = (4.0 * luma[1:-1, 1:-1] - luma[:-2, 1:-1] - luma[2:, 1:-1]
           - luma[1:-1, :-2] - luma[1:-1, 2:])
    hist = np.bincount(
        np.clip(np.round(luma), 0, 255).astype(np.int64).ravel(), minlength=256)
    p = hist / hist.sum()
    nz = p[p > 0]
    return {
        "blur_score": float(lap.var()) if lap.size else 0.0,
        "entropy": float(-(nz * np.log2(nz)).sum()),
        "under_frac": float((luma <= 5.0).mean()),
        "over_frac": float((luma >= 250.0).mean()),
    }


def quality_keep(q: dict) -> bool:
    """The filter decision over image_quality() metrics."""
    return (q["blur_score"] >= QUALITY_MIN_BLUR
            and q["entropy"] >= QUALITY_MIN_ENTROPY
            and q["under_frac"] <= QUALITY_MAX_CLIP_FRAC
            and q["over_frac"] <= QUALITY_MAX_CLIP_FRAC)


_QUALITY_SCHEMA = ("image_id string, ok boolean, blur_score double, "
                   "entropy double, under_frac double, over_frac double, "
                   "keep boolean")


def quality_filter(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-image quality scoring + keep/drop decision, Arrow-batched
    map-only (no shuffle; partitioning inherits the input).  CORRUPT or
    truncated payloads — routine in a 100-TB crawl — yield ok=false /
    keep=false rows instead of failing the task: any decoder exception
    (bad magic, truncated zlib/LZW/entropy stream, unknown format) is
    caught per image.  At scale, `.filter("keep")` after this operator
    is the training-set admission gate; bytes stay out of the result so
    downstream joins are narrow (late materialization, same pattern as
    engine/payload.py phash_dedup)."""

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    q = image_quality(_decode(bytes(r.bytes), r.fmt))
                    out.append({"image_id": getattr(r, id_col), "ok": True,
                                **q, "keep": quality_keep(q)})
                except Exception:
                    out.append({"image_id": getattr(r, id_col), "ok": False,
                                "blur_score": None, "entropy": None,
                                "under_frac": None, "over_frac": None,
                                "keep": False})
            yield pd.DataFrame(
                out, columns=["image_id", "ok", "blur_score", "entropy",
                              "under_frac", "over_frac", "keep"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(
        run, _QUALITY_SCHEMA)


def tile_grid(px: np.ndarray, tile: int = 32) -> list[dict]:
    """Per-tile luma statistics of decoded pixels — the shared
    per-image definition used by the Spark operator below and by the
    oracle truth dump (truth.ensure_image_tiles_truth), mirroring the
    image_features/ensure_payload_truth pattern: the driver compare
    then verifies the DISTRIBUTED plumbing (Arrow batches, one-row-per-
    tile fan-out, decode placement) against a sequential loop.

    Patch/tile extraction is the standard pre-training prep for vision
    models (ViT-style fixed-size patches); partial edge tiles are
    dropped (floor grid), matching the common crop-to-multiple
    convention."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    out = []
    for ty in range(h // tile):
        for tx in range(w // tile):
            blk = luma[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            out.append({
                "tile_y": ty, "tile_x": tx,
                "mean_luma": float(blk.mean()),
                "std_luma": float(blk.std()),
            })
    return out


def tile_stats(images: DataFrame, tile: int = 32,
               id_col: str = "image_id") -> DataFrame:
    """Decode → fixed-grid tile statistics, one output row per tile
    (ViT-style patch prep).  Arrow-batched mapInPandas: the per-row
    Python is one decode + one vectorized numpy pass; the fan-out
    (rows × tiles) happens inside the batch, never on the driver.  At
    10^9 images this is a map-only stage — no shuffle, no skew, output
    partitioning inherits the scan.  The id column keeps its caller
    name in the output."""
    schema = (f"{id_col} string, tile_y int, tile_x int, "
              "mean_luma double, std_luma double")

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                px = _decode(bytes(r.bytes), r.fmt)
                rid = getattr(r, id_col)
                for t in tile_grid(px, tile):
                    out.append({id_col: rid, **t})
            yield pd.DataFrame(
                out, columns=[id_col, "tile_y", "tile_x",
                              "mean_luma", "std_luma"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(
        run, schema)


def resize(images: DataFrame, out_w: int, out_h: int, id_col: str = "image_id") -> DataFrame:
    """Mean-pool resize; output re-encoded as PNG bytes."""

    def run(iterator):
        from cianparser_spark.corpus import imaging

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                px = _decode(bytes(r.bytes), r.fmt)
                small = np.stack(
                    [imaging._mean_pool(px[:, :, c].astype(np.float64), out_h, out_w) for c in range(3)],
                    axis=-1,
                ).round().clip(0, 255).astype(np.uint8)
                out.append({"image_id": getattr(r, id_col),
                            "bytes": imaging.png_encode(small),
                            "w": out_w, "h": out_h, "fmt": "png"})
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string"
    )


def resized_feature_dict(px: np.ndarray, out_w: int, out_h: int) -> dict:
    """Shared per-image definition of the resize-shard row: mean-pool
    ``px`` to (out_h, out_w), re-encode as PNG, return the output byte
    count + features of the RESIZED pixels.  Used by both the Spark
    operator (resize_features) and the oracle truth dump
    (truth.ensure_resize_truth) so the driver's DuckDB compare pins
    the whole decode→resize→re-encode path byte-for-byte."""
    from cianparser_spark.corpus import imaging

    small = np.stack(
        [imaging._mean_pool(px[:, :, c].astype(np.float64), out_h, out_w)
         for c in range(3)],
        axis=-1,
    ).round().clip(0, 255).astype(np.uint8)
    feats = image_features(small)
    return {"n_bytes": len(imaging.png_encode(small)), **feats}


def resize_features(images: DataFrame, out_w: int, out_h: int,
                    id_col: str = "image_id") -> DataFrame:
    """Training-shard resize in ONE Arrow pass: decode → area mean-pool
    to a fixed (out_w, out_h) → re-encode PNG → verify features of the
    resized pixels.  This is the write-side shape of an image training
    pipeline (resize every crawled image to the model's input
    resolution while re-sharding); emitting n_bytes + features instead
    of the bytes keeps the contract query comparable while the real
    pipeline would keep the PNG column.  Decode failures yield
    ok=false rows (corrupt crawl payloads must not fail the shard job).
    100 TB shape: embarrassingly parallel mapInPandas, no shuffle; the
    only cross-row op is the upstream scan partitioning (spread)."""
    schema = (f"{id_col} string, ok boolean, n_bytes int, "
              "mean_luma double, std_luma double, edge_energy double")

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                rid = getattr(r, id_col)
                try:
                    px = _decode(bytes(r.bytes), r.fmt)
                    out.append({id_col: rid, "ok": True,
                                **resized_feature_dict(px, out_w, out_h)})
                except (NotImplementedError, ValueError, struct_error,
                        IndexError):
                    out.append({id_col: rid, "ok": False, "n_bytes": None,
                                "mean_luma": None, "std_luma": None,
                                "edge_energy": None})
            yield pd.DataFrame(
                out, columns=[id_col, "ok", "n_bytes",
                              "mean_luma", "std_luma", "edge_energy"])

    return spread(images.select(id_col, "bytes", "fmt")).mapInPandas(
        run, schema)


# SDXL-style aspect-ratio buckets: (name, target_w, target_h) with the
# ratio as an exact-double literal shared verbatim with the SQL oracle.
# Targets are the pinned per-bucket training resolutions (≈256² area,
# multiples of 64) — constants in the dim, no float math in either
# engine beyond one double divide + abs + argmin.
ASPECT_BUCKETS: list[tuple[str, int, int]] = [
    ("square_1_1", 256, 256),
    ("landscape_4_3", 320, 256),
    ("portrait_3_4", 256, 320),
    ("landscape_3_2", 320, 192),
    ("portrait_2_3", 192, 320),
    ("wide_16_9", 384, 192),
    ("tall_9_16", 192, 384),
]


def aspect_buckets(meta: DataFrame,
                   buckets: list[tuple[str, int, int]] = ASPECT_BUCKETS,
                   ) -> DataFrame:
    """Aspect-ratio bucketing over the image METADATA table (the
    batching strategy multimodal trainers use so every batch shares one
    resolution: assign each image to the pinned bucket whose w/h ratio
    is nearest, then batch per bucket).  Pure Catalyst: the 7-row
    bucket dim broadcast-joins against the metadata scan (bytes never
    read — column pruning keeps the 100 TB binary column out of the
    plan), a window rank picks the argmin (ties break on bucket order),
    and one groupBy yields the per-bucket plan row.  Distance is
    |w/h − target_ratio| in doubles — both engines compute the same
    IEEE value from the same integer columns and the same literals.

    Returns one row per bucket: n_images, avg megapixels of members,
    and the bucket's pinned target resolution."""
    spark = meta.sparkSession
    # Assignment is a zero-shuffle map expression: argmin over the 7
    # pinned buckets as array_min over (dist, bucket_id) structs —
    # struct ordering is lexicographic, so ties break on bucket order.
    # No per-image window, no join on the big side; the ONLY exchange
    # in the plan is the final 7-group partial-aggregated groupBy.
    ratio = F.col("w").cast("double") / F.col("h").cast("double")
    cands = F.array(*[
        F.struct(
            F.abs(ratio - F.lit(float(w) / float(h))).alias("dist"),
            F.lit(i).alias("bucket_id"))
        for i, (_n, w, h) in enumerate(buckets)
    ])
    assigned = (
        meta.select("image_id", "w", "h")
        .withColumn("bucket_id", F.array_min(cands)["bucket_id"])
    )
    dim = spark.createDataFrame(
        [(i, n, w, h) for i, (n, w, h) in enumerate(buckets)],
        "bucket_id int, bucket string, target_w int, target_h int")
    # avg megapixels via exact integer SUM(w*h) then ONE double divide —
    # a float AVG would be summation-order-dependent across engines.
    return (
        assigned.groupBy("bucket_id")
        .agg(F.count("*").alias("n_images"),
             F.round(F.sum(F.col("w").cast("long") * F.col("h"))
                     / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 9)
             .alias("avg_mp"))
        .join(F.broadcast(dim), "bucket_id")
        .select("bucket", "target_w", "target_h", "n_images", "avg_mp")
    )


def synth_pcm16(i: int, sr: int, n: int) -> np.ndarray:
    """Deterministic clip-``i`` waveform (sine mix keyed by clip id) —
    the shared per-clip definition used by the Spark fixture builder
    below and by the oracle truth dump (truth.ensure_av_truth), so the
    driver's DuckDB compare verifies the distributed container decode
    end to end."""
    t = np.arange(n) / sr
    f0 = 220.0 + 55.0 * (i % 8)
    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    return (wave * 32767).astype("<i2")


def audio_feature_dict(x: np.ndarray, sr: int) -> dict:
    """(rms, zero-crossing rate, dominant frequency via FFT argmax) of
    normalized samples — shared between the Spark operator and the
    oracle truth dump."""
    zc = float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
    spec = np.abs(np.fft.rfft(x))
    dom = float(np.argmax(spec[1:]) + 1) * sr / len(x)
    return {"rms": float(np.sqrt(np.mean(x * x))), "zcr": zc, "dominant_hz": dom}


def make_synthetic_audio(spark, n_clips: int = 16, sr: int = 8000,
                         seconds: float = 0.5, fmt: str = "pcm_s16le") -> DataFrame:
    """Synthetic audio rows: deterministic sine mixes keyed by clip id
    with typed metadata — the audio modality's schema/plumbing, no
    external codec required.  ``fmt`` picks the encoding: raw 16-bit
    PCM (default), G.711 companded ``pcm_mulaw``/``pcm_alaw``
    (1 byte/sample, encoded by the pure-numpy corpus.g711 codec), or a
    full RIFF/WAVE container ``wav``/``wav_mulaw``/``wav_alaw``/
    ``wav_f32``/``wav_ima``/``wav_ms`` (the binary column holds an
    actual .wav file, corpus.riffwav — PCM, G.711, IEEE-float, IMA
    ADPCM and MS ADPCM format tags respectively)."""
    from cianparser_spark.corpus import g711, riffwav

    rows = []
    n = int(sr * seconds)
    for i in range(n_clips):
        pcm16 = synth_pcm16(i, sr, n)
        col_fmt = fmt
        if fmt == "pcm_s16le":
            data = pcm16.tobytes()
        elif fmt == "pcm_mulaw":
            data = g711.ulaw_encode(pcm16)
        elif fmt == "pcm_alaw":
            data = g711.alaw_encode(pcm16)
        elif fmt in ("wav", "wav_mulaw", "wav_alaw", "wav_f32", "wav_ima", "wav_ms"):
            codec = {"wav": "pcm", "wav_mulaw": "mulaw", "wav_alaw": "alaw",
                     "wav_f32": "f32", "wav_ima": "ima", "wav_ms": "ms"}[fmt]
            data, col_fmt = riffwav.wav_encode(pcm16, sr, codec), "wav"
        elif fmt == "flac":
            from cianparser_spark.corpus import flacsub

            data = flacsub.flac_encode(pcm16, sr)
        else:
            raise ValueError(f"unknown synthetic audio fmt {fmt!r}")
        rows.append((f"aud{i:04d}", data, sr, n, col_fmt))
    return spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string"
    )


def audio_features(audio: DataFrame) -> DataFrame:
    """Arrow-batched audio decode → (rms, zero-crossing rate, dominant
    frequency via FFT argmax).  Real decode paths: raw PCM, bare G.711
    mu-law/A-law sample buffers (corpus.g711, pure vectorized numpy —
    bit-exact vs the canonical g711.c tables, see tests/test_ops.py),
    and full RIFF/WAVE container files (fmt="wav": corpus.riffwav
    chunk-walks the container; PCM 8/16-bit, IEEE float-32, G.711
    mu-law/A-law, IMA ADPCM and MS ADPCM format tags all decode —
    the ADPCM paths vectorized ACROSS blocks — and the container's
    own sample rate wins over the metadata column), plus REAL FLAC
    (fmt="flac": corpus.flacsub subset codec — CONSTANT/VERBATIM/
    FIXED/LPC subframes, Rice residuals, CRC-8/16 + MD5 verified,
    lossless bit-exact).  The remaining perceptual codecs (mp3/ogg)
    are STUBBED: patent-era psychoacoustic DSP is out of scope without
    codec libraries, so they yield ok=false rows (documented
    limitation; a real deployment plugs ffmpeg/soundfile in)."""
    from cianparser_spark.corpus import g711, riffwav

    def _pcm(data: bytes, fmt: str, n: int, sr: int) -> tuple[np.ndarray, int]:
        if fmt == "pcm_s16le":
            x = np.frombuffer(data, dtype="<i2", count=n).astype(np.float64) / 32767.0
        elif fmt == "pcm_mulaw":
            x = g711.ulaw_decode(data[:n]).astype(np.float64) / 32767.0
        elif fmt == "pcm_alaw":
            x = g711.alaw_decode(data[:n]).astype(np.float64) / 32767.0
        elif fmt == "wav":
            x, sr, _codec = riffwav.wav_parse(data)
        elif fmt == "flac":
            from cianparser_spark.corpus import flacsub

            x, sr = flacsub.flac_parse(data)
        else:
            raise NotImplementedError(f"no audio codec for fmt={fmt!r} here")
        return x, sr

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    x, sr = _pcm(bytes(r.bytes), r.fmt, int(r.n_samples), int(r.sample_rate))
                    out.append({"audio_id": r.audio_id, "ok": True,
                                **audio_feature_dict(x, sr)})
                except NotImplementedError:
                    out.append({"audio_id": r.audio_id, "ok": False,
                                "rms": None, "zcr": None, "dominant_hz": None})
            yield pd.DataFrame(out, columns=["audio_id", "ok", "rms", "zcr", "dominant_hz"])

    return audio.select("audio_id", "bytes", "sample_rate", "n_samples", "fmt") \
        .mapInPandas(run, "audio_id string, ok boolean, rms double, zcr double, dominant_hz double")


def make_synthetic_video(spark, n_videos: int = 8, frames: int = 12,
                         w: int = 32, h: int = 32, fmt: str = "pngseq") -> DataFrame:
    """Synthetic video rows.  ``fmt="pngseq"`` (default): length-prefixed
    concatenated PNG frames (the simple plumbing fixture).  ``fmt="avi"``:
    the binary column holds an actual RIFF/AVI file (uncompressed BI_RGB
    frames, corpus.aviriff).  ``fmt="mjpg"``: a real Motion-JPEG AVI —
    each frame a standalone baseline JFIF image (corpus.jpegbase)."""
    import struct

    from cianparser_spark.corpus import aviriff, imaging

    rows = []
    for v in range(n_videos):
        px = [imaging.gen_pixels(v * 1000 + f, w, h) for f in range(frames)]
        if fmt == "pngseq":
            blob = b"".join(
                struct.pack(">I", len(d)) + d for d in (imaging.png_encode(p) for p in px)
            )
        elif fmt == "avi":
            blob = aviriff.avi_encode(px, fps=10)
        elif fmt == "mjpg":
            blob = aviriff.avi_encode(px, fps=10, codec="mjpg")
        elif fmt == "gif":
            from cianparser_spark.corpus import bmpgif

            blob = bmpgif.gif_encode_anim(px, delay_cs=10)
        else:
            raise ValueError(f"unknown synthetic video fmt {fmt!r}")
        rows.append((f"vid{v:04d}", blob, frames, fmt))
    return spark.createDataFrame(rows, "video_id string, bytes binary, n_frames int, fmt string")


def frame_sample(videos: DataFrame, every: int = 4) -> DataFrame:
    """Deterministic 1-in-every frame sampling → one row per kept frame
    (bytes = PNG).  Real demux+decode paths: the pngseq fixture
    container and actual RIFF/AVI files (corpus.aviriff) with either
    uncompressed BI_RGB frames or Motion-JPEG (per-frame baseline JPEG,
    corpus.jpegbase) — frames decode and re-encode to PNG so downstream
    consumers see one frame format.  Other compressed fourccs (XVID, …)
    demux but raise ``NotImplementedError`` at decode, the honest codec
    boundary."""
    import struct

    from cianparser_spark.corpus import aviriff, imaging

    def _frames(blob: bytes, fmt: str):
        if fmt == "pngseq":
            pos, idx = 0, 0
            while pos < len(blob):
                (ln,) = struct.unpack(">I", blob[pos : pos + 4])
                yield idx, blob[pos + 4 : pos + 4 + ln]
                pos += 4 + ln
                idx += 1
        elif fmt in ("avi", "mjpg"):
            meta, raw = aviriff.avi_demux(blob)
            for idx, fb in enumerate(raw):
                yield idx, imaging.png_encode(aviriff.frame_decode(fb, meta))
        elif fmt == "gif":
            # animated GIF: real multi-frame decode with canvas
            # composition (partial frames, transparency, disposal —
            # corpus.bmpgif.gif_frames)
            from cianparser_spark.corpus import bmpgif

            for idx, frame in enumerate(bmpgif.gif_frames(blob)):
                yield idx, imaging.png_encode(frame)
        else:
            raise NotImplementedError(f"no demuxer for {fmt!r} here")

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                for idx, frame in _frames(bytes(r.bytes), r.fmt):
                    if idx % every == 0:
                        out.append({"video_id": r.video_id, "frame_index": idx, "bytes": frame})
            yield pd.DataFrame(out, columns=["video_id", "frame_index", "bytes"])

    return videos.mapInPandas(run, "video_id string, frame_index int, bytes binary")


# ---------------------------------------------------------------------------
# compressed-audio container metadata scan (MP3 framing / Ogg paging)
# ---------------------------------------------------------------------------

def mp3_clip_build(i: int) -> bytes:
    """Deterministic per-clip MP3 stream — the shared single definition
    used by the Spark fixture builder and the oracle truth dump
    (truth.ensure_audio_meta_truth).  Cycles bitrate / sample rate /
    channel mode / ID3 size, makes every 4th clip VBR and every 3rd
    carry a Xing header, so the scanner's whole surface is exercised."""
    from cianparser_spark.corpus import mpegaudio

    srs = (44100, 48000, 32000)
    modes = ("joint_stereo", "stereo", "mono")
    if i % 4 == 3:
        return mpegaudio.mp3_build(
            seed=i, n_frames=16 + i, sr=srs[i % 3], mode=modes[i % 3],
            id3_size=0 if i % 2 else 64 + i, xing=i % 3 == 0,
            vbr_rates=(96, 128, 160, 192))
    rates = (64, 96, 128, 160, 192, 256, 320)
    return mpegaudio.mp3_build(
        seed=i, n_frames=16 + i, bitrate_kbps=rates[i % len(rates)],
        sr=srs[i % 3], mode=modes[i % 3],
        id3_size=0 if i % 2 else 64 + i, xing=i % 3 == 0)


def ogg_clip_build(i: int) -> bytes:
    """Deterministic per-clip Ogg/Vorbis-shaped stream (ident + comment
    + setup + audio packets of awkward sizes, including 255-multiples
    and page-spanning ones) — shared with the truth dump."""
    from cianparser_spark.corpus import oggdemux

    channels = 1 + i % 2
    rate = (22050, 44100, 48000)[i % 3]
    packets = [oggdemux.vorbis_ident_build(channels, rate,
                                           bitrate_nominal=64000 + 8000 * (i % 5)),
               b"\x03vorbis" + bytes((i + k) % 251 for k in range(30)),
               b"\x05vorbis" + bytes((i * 3 + k) % 251 for k in range(40))]
    for p in range(6 + i % 5):
        size = (p * 97 + i * 31) % 700
        if p % 3 == 0:
            size = 255 * (1 + p % 3)  # exact lacing multiples
        packets.append(bytes((i * 7 + p * 13 + k) % 256 for k in range(size)))
    return oggdemux.ogg_build(packets, serial=0xC1A0 + i,
                              max_segs_per_page=5 + i % 7)


def make_synthetic_compressed_audio(spark, n_clips: int = 16) -> DataFrame:
    """Fixture rows for the metadata scan: half MP3, half Ogg, built by
    the shared per-clip definitions above on the driver (tiny streams),
    scanned distributed."""
    rows = []
    for i in range(n_clips):
        if i % 2 == 0:
            rows.append((f"cmp{i:04d}", mp3_clip_build(i), "mp3"))
        else:
            rows.append((f"cmp{i:04d}", ogg_clip_build(i), "ogg"))
    return spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")


_META_COLS = ["audio_id", "container", "ok", "n_units", "n_pages",
              "sample_rate", "channels", "bitrate_kbps", "rate_mode",
              "duration_s"]


def scan_clip_meta(data: bytes, fmt: str) -> dict:
    """Scan ONE clip's container metadata — the shared per-clip
    definition (Spark operator + truth dump).  Header-bound: walks MP3
    frame headers / Ogg page headers, never touches codec payload."""
    from cianparser_spark.corpus import mpegaudio, oggdemux

    if fmt == "mp3":
        s = mpegaudio.mp3_scan(data)
        return {"container": "mp3", "ok": True, "n_units": s["n_frames"],
                "n_pages": None, "sample_rate": s["sample_rate"],
                "channels": 1 if s["channel_mode"] == "mono" else 2,
                "bitrate_kbps": s["bitrate_kbps"],
                "rate_mode": "vbr" if s["vbr"] else "cbr",
                "duration_s": s["duration_s"]}
    if fmt == "ogg":
        d = oggdemux.ogg_demux(data)
        v = oggdemux.vorbis_ident_parse(d["packets"][0])
        return {"container": "ogg", "ok": True, "n_units": d["n_packets"],
                "n_pages": d["n_pages"], "sample_rate": v["sample_rate"],
                "channels": v["channels"],
                # Vorbis is VBR by construction; the ident header only
                # carries a nominal rate
                "bitrate_kbps": v["bitrate_nominal"] // 1000,
                "rate_mode": "vbr",
                "duration_s": d["last_granule"] / v["sample_rate"]}
    raise NotImplementedError(f"no container scanner for fmt={fmt!r}")


def audio_meta_scan(audio: DataFrame) -> DataFrame:
    """Arrow-batched compressed-audio CONTAINER metadata scan: MP3
    frame-header walk (corpus.mpegaudio — framing formula, ID3v2 skip,
    Xing/VBR detection) and Ogg page walk (corpus.oggdemux — per-page
    CRC-32 verify, packet reassembly, Vorbis ident parse).  Corrupt or
    truncated payloads degrade to ok=false rows, never task failures.
    Map-only, no shuffle; at 100 TB this reads a few bytes per frame/
    page boundary — the same scan-bound shape as png_text_meta /
    exif_meta.  Perceptual SAMPLE decode for these codecs stays an
    honest NotImplementedError (see audio_features)."""

    def run(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    m = scan_clip_meta(bytes(r.bytes), r.fmt)
                except (ValueError, NotImplementedError, IndexError,
                        struct_error):
                    m = {"container": r.fmt, "ok": False, "n_units": None,
                         "n_pages": None, "sample_rate": None,
                         "channels": None, "bitrate_kbps": None,
                         "rate_mode": None, "duration_s": None}
                out.append({"audio_id": r.audio_id, **m})
            yield pd.DataFrame(out, columns=_META_COLS)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run, "audio_id string, container string, ok boolean, n_units long, "
             "n_pages long, sample_rate long, channels long, "
             "bitrate_kbps long, rate_mode string, duration_s double")


# ---------------------------------------------------------------------------
# cross-format perceptual-hash robustness (A8 × MM1)
# ---------------------------------------------------------------------------

XFORMAT_FMTS = ("png", "jpeg", "gif", "tiff")


def xformat_phash(spark, n_src: int = 16, w: int = 64, h: int = 48,
                  seed0: int = 9100, formats=XFORMAT_FMTS) -> DataFrame:
    """Re-encode each source frame into EVERY container and compute the
    perceptual hash of what actually decodes back — the web-crawl
    reality that one photo circulates as PNG on one site, a JPEG
    re-save on another and a GIF thumbnail on a third, and dedup must
    catch them as one asset.  Input is (src, fmt) seed rows; encode →
    decode → dHash runs executor-side in one Arrow-batched map-only
    stage (no bytes cross to the driver, no shuffle)."""
    seeds = spark.createDataFrame(
        [(f"src{i:04d}", i, fmt) for i in range(n_src) for fmt in formats],
        "src_id string, i int, fmt string").repartition(8, "src_id", "fmt")

    def run(iterator):
        from cianparser_spark.corpus import imaging
        from cianparser_spark.corpus.imaging import phash64

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                px = imaging.gen_pixels(seed0 + int(r.i), w, h)
                blob = imaging.encode(px, r.fmt)
                ph = phash64(imaging.decode(blob, r.fmt))
                out.append({"src_id": r.src_id, "fmt": r.fmt,
                            "n_bytes": len(blob), "phash": ph})
            yield pd.DataFrame(out, columns=["src_id", "fmt", "n_bytes", "phash"])

    return seeds.mapInPandas(
        run, "src_id string, fmt string, n_bytes long, phash long")


def xformat_hamming(variants: DataFrame, anchor_fmt: str = "png",
                    dup_threshold: int = 6) -> DataFrame:
    """Hamming distance of every variant's phash to its source's
    anchor-format phash, JVM-side (`bit_count(a ^ b)` — whole-stage
    codegen, no Python).  The anchor side is one row per source —
    broadcast, so at 100 TB the variant scan never shuffles."""
    anchors = (variants.filter(F.col("fmt") == anchor_fmt)
               .select("src_id", F.col("phash").alias("anchor_phash")))
    return (
        variants.join(F.broadcast(anchors), "src_id")
        .withColumn("hamming",
                    F.expr("bit_count(phash ^ anchor_phash)").cast("int"))
        .withColumn("is_dup", F.col("hamming") <= dup_threshold)
        .drop("anchor_phash")
    )
