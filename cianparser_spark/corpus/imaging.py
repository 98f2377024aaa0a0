"""Image payload codecs and perceptual hashing (pure numpy + stdlib).

The graft input table carries real encoded image bytes
(BASELINE.json input_hint: bytes BINARY, fmt STRING).  PIL/libjpeg are
not available in this environment, so:

* ``png``  — a real, spec-conformant PNG encoder/decoder implemented on
  ``zlib`` + ``struct``.  The supported profile is 8-bit RGB; within it
  the decoder is spec-complete — all five row filters (§9) and Adam7
  interlacing (§8.2) — so it reads what real encoders emit.  The
  encoder emits filter 0 by default (historical byte-pin), adaptive
  per-row filters (libpng MSAD heuristic) as ``pngf``, Adam7 as
  ``pngi``.  Lossless: decode is bit-exact in every mode.
* ``jpeg`` — a REAL baseline JPEG codec (ITU-T T.81 sequential DCT,
  4:4:4, Annex-K tables) implemented in corpus/jpegbase.py on pure
  numpy + stdlib; emits genuine JFIF bytes any standard decoder reads.
  Round-trip PSNR >= 43 dB at the default quality (the input_hint's
  lossy allclose bar is 40 dB).
* ``qjpg`` — the round-2 DETERMINISTIC LOSSY STAND-IN (channel
  quantization to step 4 in a magic-prefixed PNG container), kept for
  decode compatibility with previously-materialized payloads; the
  ``jpeg`` slot no longer uses it.

Perceptual hash: 64-bit dHash (horizontal gradient sign over an 8x9
mean-pooled grayscale), returned as signed int64 to fit the table's
``phash BIGINT`` column.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
QJPG_MAGIC = b"QJPG"
_QUANT_STEP = 4  # uniform error in [-2, 2] → PSNR ≈ 47 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


# Adam7 interlace passes (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
_BPP = 3  # bytes per pixel (8-bit RGB, the supported profile)


def _filter_rows(rows: np.ndarray, mode: str) -> bytes:
    """Apply PNG row filters (spec §9) to raw scanlines (h, w*3) and
    return filter-byte-prefixed scanline bytes.  Encode-side filtering
    uses RAW neighbor values, so every candidate is fully vectorized;
    ``adaptive`` picks per-row the filter minimizing the sum of
    absolute signed filtered bytes (the standard libpng MSAD
    heuristic)."""
    h, stride = rows.shape
    prev = np.zeros((h, stride), np.int16)
    prev[1:] = rows[:-1]
    left = np.zeros((h, stride), np.int16)
    left[:, _BPP:] = rows[:, :-_BPP]
    upleft = np.zeros((h, stride), np.int16)
    upleft[1:, _BPP:] = rows[:-1, :-_BPP]
    r16 = rows.astype(np.int16)
    cand = {
        0: rows,
        1: ((r16 - left) % 256).astype(np.uint8),
        2: ((r16 - prev) % 256).astype(np.uint8),
        3: ((r16 - (left + prev) // 2) % 256).astype(np.uint8),
    }
    p = left + prev - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, prev, upleft))
    cand[4] = ((r16 - pred) % 256).astype(np.uint8)
    if mode == "none":
        choice = np.zeros(h, np.uint8)
    elif mode in ("sub", "up", "average", "paeth"):
        choice = np.full(h, {"sub": 1, "up": 2, "average": 3,
                             "paeth": 4}[mode], np.uint8)
    elif mode == "adaptive":
        costs = np.stack([
            np.abs(((cand[f].astype(np.int16) + 128) % 256) - 128).sum(axis=1)
            for f in range(5)])
        choice = costs.argmin(axis=0).astype(np.uint8)
    else:
        raise ValueError(f"unknown filter mode {mode!r}")
    out = np.empty((h, 1 + stride), np.uint8)
    out[:, 0] = choice
    for f in np.unique(choice):
        sel = choice == f
        out[sel, 1:] = cand[int(f)][sel]
    return out.tobytes()


def _unfilter_rows(data: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reconstruct raw scanlines from filter-byte-prefixed data
    (spec §9 Recon functions).  Filters 0/2 are whole-row vectorized,
    Sub is a per-channel cumulative sum; Average/Paeth carry a true
    left-dependency and walk pixels (only filtered foreign PNGs hit
    this — our own default encoder emits filter 0)."""
    stride = w * _BPP
    rows = data.reshape(h, 1 + stride)
    if not rows[:, 0].any():
        # all-filter-0 (our own default encoder): single vectorized copy
        return rows[:, 1:].copy()
    recon = np.zeros((h, stride), np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int16)
        prev = recon[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if ft == 0:
            recon[y] = cur
        elif ft == 2:
            recon[y] = ((cur + prev) % 256).astype(np.uint8)
        elif ft == 1:
            px = cur.reshape(w, _BPP).astype(np.uint32)
            recon[y] = (np.cumsum(px, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ft in (3, 4):
            out = np.zeros(stride, np.int16)
            for x in range(stride):
                a = out[x - _BPP] if x >= _BPP else 0
                b = prev[x]
                if ft == 3:
                    out[x] = (cur[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - _BPP] if x >= _BPP else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    out[x] = (cur[x] + pr) % 256
            recon[y] = out.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return recon


def png_encode(pixels: np.ndarray, text: dict[str, str] | None = None,
               compress_text_over: int = 64, filter_mode: str = "none",
               interlace: bool = False) -> bytes:
    """8-bit RGB (h, w, 3) uint8 → PNG bytes.

    ``filter_mode`` selects the row filter (spec §9): ``none`` (the
    default — byte-identical to the historical encoder output, which
    the n_bytes oracles pin), a fixed filter (``sub``/``up``/
    ``average``/``paeth``), or ``adaptive`` (per-row libpng MSAD
    heuristic — what real encoders emit).  ``interlace=True`` writes
    Adam7 (spec §8.2), each pass filtered independently.

    ``text`` entries become standard textual chunks between IHDR and
    IDAT (PNG spec §11.3): latin-1-representable values go to tEXt, or
    zTXt (method-0 zlib) when longer than ``compress_text_over`` bytes;
    values needing more than latin-1 go to iTXt as UTF-8 — so all three
    textual chunk types appear in real payloads.  Keys are emitted in
    sorted order (deterministic bytes)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    meta = b""
    for key in sorted(text or {}):
        kb = key.encode("latin-1")
        if not 1 <= len(kb) <= 79:
            raise ValueError(f"PNG text keyword length out of range: {key!r}")
        val = (text or {})[key]
        try:
            vb = val.encode("latin-1")
        except UnicodeEncodeError:
            # iTXt: compression flag 0, method 0, empty language tag and
            # translated keyword, UTF-8 text
            meta += _chunk(b"iTXt",
                           kb + b"\x00\x00\x00" + b"\x00" + b"\x00"
                           + val.encode("utf-8"))
            continue
        if len(vb) > compress_text_over:
            meta += _chunk(b"zTXt", kb + b"\x00\x00" + zlib.compress(vb, 6))
        else:
            meta += _chunk(b"tEXt", kb + b"\x00" + vb)
    if interlace:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            raw += _filter_rows(sub.reshape(sub.shape[0], -1), filter_mode)
    elif filter_mode == "none":
        # historical byte-exact fast path (n_bytes oracles pin this)
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
        ).tobytes()
    else:
        raw = _filter_rows(pixels.reshape(h, w * 3), filter_mode)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + meta
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_text_chunks(data: bytes) -> list[tuple[str, str]]:
    """Metadata-only scan: walk the chunk list and return (keyword,
    value) pairs from tEXt, zTXt (method 0) and iTXt chunks WITHOUT
    ever inflating IDAT — on a 100-TB corpus this reads a few hundred
    header bytes per image instead of decompressing megapixels, which
    is the whole point of keeping metadata in chunks.  Unknown or
    malformed textual chunks are skipped (ancillary per the spec);
    non-PNG input raises ValueError."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    out: list[tuple[str, str]] = []
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + length]
        if tag == b"IEND":
            break
        try:
            if tag == b"tEXt":
                k, _, v = payload.partition(b"\x00")
                out.append((k.decode("latin-1"), v.decode("latin-1")))
            elif tag == b"zTXt":
                k, _, rest = payload.partition(b"\x00")
                if rest[:1] == b"\x00":  # compression method 0 = zlib
                    out.append((k.decode("latin-1"),
                                zlib.decompress(rest[1:]).decode("latin-1")))
            elif tag == b"iTXt":
                k, _, rest = payload.partition(b"\x00")
                comp_flag, comp_method = rest[0], rest[1]
                rest = rest[2:]
                _lang, _, rest = rest.partition(b"\x00")
                _trans, _, v = rest.partition(b"\x00")
                if comp_flag == 1 and comp_method == 0:
                    v = zlib.decompress(v)
                out.append((k.decode("latin-1"), v.decode("utf-8")))
        except Exception:
            pass  # ancillary chunk, malformed: skip, never fail the scan
        pos += 12 + length
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8.  The supported profile is 8-bit
    RGB (color type 2); within it the decoder is spec-complete: all
    five row filters (None/Sub/Up/Average/Paeth, §9) and Adam7
    interlacing (§8.2) reconstruct — i.e. it reads what real encoders
    emit, not just this module's own output.  Other color types /
    depths reject loudly."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    interlace = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12]
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if not interlace:
        return _unfilter_rows(raw, h, w).reshape(h, w, 3).copy()
    out = np.zeros((h, w, 3), np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        ph = len(range(y0, h, dy))
        pw = len(range(x0, w, dx))
        if ph == 0 or pw == 0:
            continue
        n = ph * (1 + pw * _BPP)
        sub = _unfilter_rows(raw[off: off + n], ph, pw)
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, 3)
        off += n
    if off != len(raw):
        raise ValueError("interlaced PNG stream length mismatch")
    return out


def qjpg_encode(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in: quantize then PNG-pack."""
    q = ((pixels.astype(np.int32) + _QUANT_STEP // 2) // _QUANT_STEP * _QUANT_STEP)
    return QJPG_MAGIC + png_encode(np.clip(q, 0, 255).astype(np.uint8))


def qjpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != QJPG_MAGIC:
        raise ValueError("not a QJPG payload")
    return png_decode(data[4:])


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        from cianparser_spark.corpus import jpegbase
        return jpegbase.encode(pixels)
    if fmt == "qjpg":
        return qjpg_encode(pixels)
    if fmt == "bmp":
        from cianparser_spark.corpus import bmpgif
        return bmpgif.bmp_encode(pixels)
    if fmt == "gif":
        from cianparser_spark.corpus import bmpgif
        return bmpgif.gif_encode(pixels)
    if fmt == "tiff":
        from cianparser_spark.corpus import tiffbase
        return tiffbase.tiff_encode(pixels)
    if fmt == "pngf":   # adaptive-filtered PNG (what real encoders emit)
        return png_encode(pixels, filter_mode="adaptive")
    if fmt == "pngi":   # Adam7 interlaced + adaptive filters
        return png_encode(pixels, filter_mode="adaptive", interlace=True)
    raise NotImplementedError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("png", "pngf", "pngi"):
        return png_decode(data)
    if fmt in ("qjpg", "jpeg"):
        # "jpeg" rows materialized before the real codec landed carry
        # QJPG-magic bytes; dispatch on content so both decode.
        if data[:4] == QJPG_MAGIC:
            return qjpg_decode(data)
        from cianparser_spark.corpus import jpegbase
        return jpegbase.decode(data)
    if fmt == "bmp":
        from cianparser_spark.corpus import bmpgif
        return bmpgif.bmp_decode(data)
    if fmt == "gif":
        from cianparser_spark.corpus import bmpgif
        return bmpgif.gif_decode(data)
    if fmt == "tiff":
        from cianparser_spark.corpus import tiffbase
        return tiffbase.tiff_decode(data)
    raise NotImplementedError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    # gif is lossless only below 257 unique colors — conservatively lossy
    return fmt in ("png", "pngf", "pngi", "bmp", "tiff")


def gen_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test pattern: smooth gradient + seeded noise."""
    rng = np.random.default_rng(np.uint64(seed))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            127 + 100 * np.sin(xx / max(w, 1) * 3.1 + (seed % 7)),
            127 + 100 * np.cos(yy / max(h, 1) * 2.7 + (seed % 5)),
            (xx + yy) * 255.0 / max(w + h, 1),
        ],
        axis=-1,
    )
    noise = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _mean_pool(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize by mean over index bins (deterministic)."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    out = np.empty((out_h, out_w), np.float64)
    for i in range(out_h):
        band = gray[ys[i] : max(ys[i + 1], ys[i] + 1)]
        for j in range(out_w):
            out[i, j] = band[:, xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


def phash64(pixels: np.ndarray) -> int:
    """64-bit dHash as signed int64 (fits phash BIGINT)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _mean_pool(gray, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
