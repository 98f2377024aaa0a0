"""BMP and GIF image codecs — pure stdlib/numpy.

Two more real container formats for the image modality's ``binary``
column (crawled thumbnails and legacy assets are very often BMP/GIF):

* ``bmp`` — Windows BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit
  uncompressed BI_RGB, bottom-up BGR rows with 4-byte row padding
  (the same DIB pixel layout corpus/aviriff.py decodes inside AVI
  frames — here with the ``BM`` file header in front).  Top-down
  (negative biHeight) files decode too.  Lossless; decode is
  numpy-vectorized over the whole pixel block.
* ``gif`` — GIF87a/89a with a real LZW codec (variable code width,
  clear/EOI codes, 4096-entry dictionary reset, 255-byte sub-block
  framing, interlace supported on decode).  The encoder builds an
  EXACT palette when the frame has <= 256 unique colors (bit-exact
  round-trip) and falls back to 3-3-2 RGB quantization otherwise
  (deterministic palette-lossy, the honest GIF semantics).

LZW is inherently sequential *within* one image — but the engine's
scale axis is rows (images), not bytes-per-image: the Spark operator
decodes different images on different cores, so per-image sequential
decode parallelizes exactly like the reference workloads.

Both formats are pinned against fixed golden bytes and byte-layout
assertions in tests/test_imaging.py so the emitted files follow the
public specs, not just "whatever our decoder reads".
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ BMP

BI_RGB = 0


def bmp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    payload = rows.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(payload), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB,
                       len(payload), 2835, 2835, 0, 0)
    return header + info + payload


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB.  24-bit BI_RGB only (bottom-up
    or top-down); other depths/compressions raise NotImplementedError."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    planes, bits, comp = struct.unpack("<HHI", data[26:34])
    if hdr_size < 40 or bits != 24 or comp != BI_RGB:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bits={bits}, comp={comp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[off:need], dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        px = px[::-1]  # bottom-up -> top-down
    return px.copy()


# ------------------------------------------------------------------ GIF

_GIF_MAX_CODE = 4096


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits clear code first, resets the dictionary at
    4096 entries, ends with EOI; variable code width grows with the
    dictionary."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []  # (code, width) flattened below

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    def fresh() -> tuple[dict, int, int]:
        table = {bytes([i]): i for i in range(clear)}
        return table, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for sym in indices.tolist():
        nxt = prefix + bytes([sym])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= _GIF_MAX_CODE:
            emit(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([sym])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    # bit-pack LSB-first
    buf = bytearray()
    acc = 0
    nbits = 0
    for code, wd in out_bits:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _palette_332() -> np.ndarray:
    """Fixed 3-3-2 RGB palette (256 entries) for >256-color frames."""
    idx = np.arange(256, dtype=np.uint32)
    r = ((idx >> 5) & 0x7) * 255 // 7
    g = ((idx >> 2) & 0x7) * 255 // 7
    b = (idx & 0x3) * 255 // 3
    return np.stack([r, g, b], axis=1).astype(np.uint8)


def gif_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> single-frame GIF89a.  Exact palette when
    the frame has <= 256 unique colors (lossless round-trip); 3-3-2
    quantization otherwise."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) | \
             (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2].astype(np.uint32)
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) <= 256:
        palette = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF,
                            uniq & 0xFF], axis=1).astype(np.uint8)
        indices = inv.astype(np.uint8)
        if len(palette) < 256:  # pad table to a power of two
            size = 2
            while size < max(len(palette), 2):
                size *= 2
            palette = np.vstack([palette,
                                 np.zeros((size - len(palette), 3), np.uint8)])
    else:
        palette = _palette_332()
        indices = (((flat[:, 0] >> 5).astype(np.uint8) << 5)
                   | ((flat[:, 1] >> 5).astype(np.uint8) << 2)
                   | (flat[:, 2] >> 6).astype(np.uint8))
    table_bits = max(int(np.ceil(np.log2(len(palette)))), 1)
    min_code = max(table_bits, 2)
    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((table_bits - 1) & 0x7), 0, 0)
    body = _lzw_encode(indices, min_code)
    sub = b"".join(
        bytes([min(255, len(body) - i)]) + body[i: i + 255]
        for i in range(0, len(body), 255)) + b"\x00"
    img = b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([min_code]) + sub
    return (b"GIF89a" + lsd + palette.tobytes() + img + b"\x3B")


def _palette_and_indices(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact palette when <=256 unique colors, 3-3-2 quantization
    beyond — shared by the single- and multi-frame encoders."""
    h, w = frame.shape[:2]
    flat = frame.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) | \
             (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2].astype(np.uint32)
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) <= 256:
        palette = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF,
                            uniq & 0xFF], axis=1).astype(np.uint8)
        indices = inv.astype(np.uint8)
        if len(palette) < 256:
            size = 2
            while size < max(len(palette), 2):
                size *= 2
            palette = np.vstack([palette,
                                 np.zeros((size - len(palette), 3), np.uint8)])
    else:
        palette = _palette_332()
        indices = (((flat[:, 0] >> 5).astype(np.uint8) << 5)
                   | ((flat[:, 1] >> 5).astype(np.uint8) << 2)
                   | (flat[:, 2] >> 6).astype(np.uint8))
    return palette, indices.reshape(h, w)


def _image_block(indices: np.ndarray, palette: np.ndarray,
                 left: int = 0, top: int = 0) -> bytes:
    """Image descriptor + local color table + LZW data sub-blocks."""
    h, w = indices.shape
    table_bits = max(int(np.ceil(np.log2(len(palette)))), 1)
    min_code = max(table_bits, 2)
    body = _lzw_encode(indices.reshape(-1), min_code)
    sub = b"".join(
        bytes([min(255, len(body) - i)]) + body[i: i + 255]
        for i in range(0, len(body), 255)) + b"\x00"
    desc = b"\x2C" + struct.pack("<HHHHB", left, top, w, h,
                                 0x80 | ((table_bits - 1) & 0x7))
    return desc + palette.tobytes() + bytes([min_code]) + sub


def gif_encode_anim(frames: list[np.ndarray], delay_cs: int = 10,
                    disposal: int = 1) -> bytes:
    """Multi-frame GIF89a: one Graphic Control Extension per frame
    (real delay + disposal method) and a per-frame LOCAL color table
    (exact <=256 colors, 3-3-2 beyond) — full-canvas frames.  The
    decoder below additionally composes partial frames, transparency
    and restore disposals, which this encoder never emits."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0))
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        out += b"\x21\xF9\x04" + bytes([(disposal & 0x7) << 2]) \
            + struct.pack("<H", delay_cs) + b"\x00\x00"
        palette, indices = _palette_and_indices(frame)
        out += _image_block(indices, palette)
    out += b"\x3B"
    return bytes(out)


def gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode ALL frames of a GIF87a/89a with real canvas composition:
    partial frames paint at (left, top); a GCE transparency index
    leaves underlying canvas pixels; disposal 2 restores the background
    color, disposal 3 restores the pre-frame canvas.  Returns the
    composed full-canvas RGB frames in order."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(data[pos: pos + n * 3], dtype=np.uint8).reshape(n, 3)
        pos += n * 3
    bg_rgb = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:
            label = data[pos + 1]
            pos += 2
            blocks = []
            while data[pos] != 0:
                ln = data[pos]
                blocks.append(data[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and blocks:  # Graphic Control Extension
                gce = blocks[0]
                disposal = (gce[0] >> 2) & 0x7
                transparent = gce[3] if gce[0] & 0x1 else None
        elif b0 == 0x2C:
            left, top, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos + 1: pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x7)
                pal = np.frombuffer(
                    data[pos: pos + n * 3], dtype=np.uint8).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise NotImplementedError("GIF frame without any color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if iflags & 0x40:
                rows = idx.reshape(h, w)
                order = np.concatenate(
                    [np.arange(s, h, st) for s, st in _INTERLACE_PASSES])
                fixed = np.empty_like(rows)
                fixed[order] = rows
                idx = fixed.reshape(-1)
            rows = idx.reshape(h, w)
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top: top + h, left: left + w]
            rgb = pal[np.minimum(rows, len(pal) - 1)]
            if transparent is not None:
                opaque = rows != transparent
                region[opaque] = rgb[opaque]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore background in the frame region
                canvas[top: top + h, left: left + w] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas = before
            transparent = None
            disposal = 0
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> (h, w, 3) uint8 RGB of the FIRST frame.
    Walks extension blocks, honors local color tables and interlacing;
    animation beyond frame 1 is ignored (thumbnail semantics)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(data[pos: pos + n * 3], dtype=np.uint8).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1: pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x7)
                pal = np.frombuffer(data[pos: pos + n * 3], dtype=np.uint8).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise NotImplementedError("GIF frame without any color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if iflags & 0x40:  # interlaced: reorder rows
                rows = idx.reshape(h, w)
                order = np.concatenate(
                    [np.arange(start, h, step) for start, step in _INTERLACE_PASSES])
                fixed = np.empty_like(rows)
                fixed[order] = rows
                rows = fixed
            else:
                rows = idx.reshape(h, w)
            return pal[np.minimum(rows, len(pal) - 1)].copy()
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image frame")
