"""Baseline TIFF 6.0 codec — pure numpy + struct, no external libs.

Implements the baseline-RGB and baseline-grayscale profiles of the
public TIFF 6.0 specification (Adobe, 1992): header (II/MM byte order,
magic 42), a single IFD of 12-byte entries, strip-organized image data
(RowsPerStrip / StripOffsets / StripByteCounts), Compression 1 (none)
and 32773 (PackBits, spec §9), PhotometricInterpretation 1
(BlackIsZero) and 2 (RGB), chunky PlanarConfiguration.  The encoder
emits little-endian multi-strip files; the decoder additionally reads
big-endian files, any strip layout, and grayscale.  Unsupported
features (planar=2, palette/CMYK photometric, LZW/JPEG/deflate
compression, tiles, bits≠8) raise ``NotImplementedError`` honestly
rather than mis-decoding.

Lossless by construction: round-trip is bit-exact for any uint8 RGB
frame, so this joins PNG/BMP on the exact-compare side of the
``multimodal_formats`` oracle.

Role mirror (reference has no image handling at all): extends the MM1
image-container surface of SURVEY.md §2 — same slot as corpus/bmpgif.py.
"""
from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"
_MM = b"MM\x00*"

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def packbits_encode(row: bytes) -> bytes:
    """Apple PackBits per TIFF 6.0 §9: literal runs (n, bytes[n+1]) and
    repeat runs (257-n, byte) chosen greedily, rows packed separately
    (the spec's row-boundary rule)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length of identical bytes starting at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        # literal run: until the next >=3 repeat or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        b = data[i]
        i += 1
        if b == 128:  # noop
            continue
        if b < 128:
            out += data[i: i + b + 1]
            i += b + 1
        else:
            out += bytes([data[i]]) * (257 - b)
            i += 1
    if len(out) != expect:
        raise ValueError("PackBits strip decoded to wrong length")
    return bytes(out)


def tiff_encode(pixels: np.ndarray, compression: str = "packbits",
                rows_per_strip: int = 8) -> bytes:
    """Little-endian baseline-RGB TIFF with multiple strips.  The
    multi-strip layout is deliberate: it exercises the decoder's strip
    walk exactly like a large scanned image would."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8")
    comp = {"none": 1, "packbits": 32773}[compression]
    h, w = pixels.shape[:2]
    raw = pixels.tobytes()
    row_bytes = w * 3
    strips: list[bytes] = []
    for top in range(0, h, rows_per_strip):
        rows = raw[top * row_bytes: min(top + rows_per_strip, h) * row_bytes]
        if comp == 1:
            strips.append(rows)
        else:
            # PackBits packs each row separately (spec §9 note)
            packed = bytearray()
            for r in range(0, len(rows), row_bytes):
                packed += packbits_encode(rows[r: r + row_bytes])
            strips.append(bytes(packed))

    # layout: header(8) | strip data | BitsPerSample value(6) |
    #         strip offset/count arrays | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bits_off = pos
    pos += 6
    n_strips = len(strips)
    if n_strips > 1:
        offs_off = pos
        pos += 4 * n_strips
        cnts_off = pos
        pos += 4 * n_strips
    ifd_off = pos

    def entry(tag, typ, count, value):
        if typ == _TYPE_SHORT and count == 1:
            return struct.pack("<HHIHH", tag, typ, 1, value, 0)
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(_T_WIDTH, _TYPE_LONG, 1, w),
        entry(_T_LENGTH, _TYPE_LONG, 1, h),
        entry(_T_BITS, _TYPE_SHORT, 3, bits_off),
        entry(_T_COMPRESSION, _TYPE_SHORT, 1, comp),
        entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 2),
        entry(_T_STRIP_OFFSETS, _TYPE_LONG, n_strips,
              strip_offsets[0] if n_strips == 1 else offs_off),
        entry(_T_SAMPLES, _TYPE_SHORT, 1, 3),
        entry(_T_ROWS_PER_STRIP, _TYPE_LONG, 1, rows_per_strip),
        entry(_T_STRIP_COUNTS, _TYPE_LONG, n_strips,
              len(strips[0]) if n_strips == 1 else cnts_off),
        entry(_T_PLANAR, _TYPE_SHORT, 1, 1),
    ]
    out = bytearray(_II + struct.pack("<I", ifd_off))
    for s in strips:
        out += s
    out += struct.pack("<HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
        out += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))
    out += struct.pack("<H", len(entries))
    for e in sorted(entries, key=lambda e: struct.unpack("<H", e[:2])[0]):
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _read_ifd(data: bytes, off: int, en: str) -> dict[int, tuple[int, list[int]]]:
    (n,) = struct.unpack_from(en + "H", data, off)
    tags: dict[int, tuple[int, list[int]]] = {}
    for k in range(n):
        tag, typ, count = struct.unpack_from(en + "HHI", data, off + 2 + 12 * k)
        voff = off + 2 + 12 * k + 8
        size = _TYPE_SIZE.get(typ, 1) * count
        if size > 4:
            (voff,) = struct.unpack_from(en + "I", data, voff)
        if typ == _TYPE_SHORT:
            vals = list(struct.unpack_from(en + f"{count}H", data, voff))
        elif typ == _TYPE_LONG:
            vals = list(struct.unpack_from(en + f"{count}I", data, voff))
        else:
            vals = []  # types we never need for baseline strips
        tags[tag] = (typ, vals)
    return tags


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode baseline TIFF: II/MM, strips, Compression 1/32773,
    Photometric 1 (grayscale → replicated to RGB) or 2 (RGB)."""
    if data[:4] == _II:
        en = "<"
    elif data[:4] == _MM:
        en = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(en + "I", data, 4)
    tags = _read_ifd(data, ifd_off, en)

    def val(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return tags[tag][1][0]

    w, h = val(_T_WIDTH), val(_T_LENGTH)
    comp = val(_T_COMPRESSION, 1)
    photo = val(_T_PHOTOMETRIC)
    spp = val(_T_SAMPLES, 1)
    planar = val(_T_PLANAR, 1)
    bits = tags.get(_T_BITS, (3, [8] * spp))[1] or [8] * spp
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    if photo not in (1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if planar != 1:
        raise NotImplementedError("planar TIFF not supported")
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError("only 8-bit gray/RGB TIFF supported")
    rps = val(_T_ROWS_PER_STRIP, h)
    offsets = tags[_T_STRIP_OFFSETS][1]
    counts = tags[_T_STRIP_COUNTS][1]
    if len(offsets) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    row_bytes = w * spp
    raw = bytearray()
    for k, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - k * rps)
        blob = data[o: o + c]
        if comp == 1:
            raw += blob[: n_rows * row_bytes]
        else:
            raw += packbits_decode(blob, n_rows * row_bytes)
    if len(raw) != h * row_bytes:
        raise ValueError("TIFF strip data decoded to wrong total size")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if spp == 1:
        return np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    return arr.reshape(h, w, 3)
