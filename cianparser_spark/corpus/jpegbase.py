"""Real baseline JPEG (ITU-T T.81) encoder/decoder — pure numpy + stdlib.

Replaces the round-2 ``qjpg`` stand-in for the ``jpeg`` format slot:
the bytes this module emits are genuine JFIF/JPEG files (SOI, APP0,
DQT, SOF0 baseline, DHT, SOS, entropy-coded scan with 0xFF byte
stuffing, EOI) that any standard decoder can read, and the decoder
parses the marker stream generically (tables are taken from the file,
not assumed), so it also reads baseline JPEGs produced elsewhere —
within the documented envelope:

* baseline sequential DCT (SOF0), 8-bit samples, Huffman entropy coding
* 1 (grayscale) or 3 (YCbCr 4:4:4) components; no chroma subsampling
* no progressive (SOF2), arithmetic coding, or restart markers

Anything outside the envelope raises ``NotImplementedError`` loudly —
same policy as the sibling PNG/G.711/RIFF codecs in this package.

Everything here derives from public knowledge only: ITU-T T.81 Annex K
example tables (quantization + Huffman), the JFIF 1.02 spec, and the
IJG quality-scaling convention.  The hot math (color transform,
forward/inverse DCT, quantization, zigzag) is vectorized over all 8x8
blocks at once; only the entropy coding loop is per-symbol Python,
accelerated by a 16-bit lookup-table Huffman decoder (T.81 F.2.2.3
turned into one array index per symbol).

Lossy invariant (BASELINE.json input_hint): at the default quality the
round-trip PSNR on the corpus test patterns is well above the 40 dB
allclose bar — asserted in tests/test_imaging.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ tables
# T.81 Annex K.1 — example quantization tables (row-major 8x8).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag[k] = row-major index of the k-th coefficient in zigzag order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)  # row-major index -> zigzag position inverse

# T.81 Annex K.3 — example Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

DEFAULT_QUALITY = 98  # IJG scale; >=40 dB round-trip asserted in tests
# (q95 leaves the corpus's +/-12 noise pattern at ~36 dB; q98's tables
# quantize at step<=5 across the spectrum -> worst-case ~43.6 dB on the
# corpus sweep, comfortably above the input_hint's 40 dB allclose bar)

# DCT-II orthonormal basis: coef = C @ (block - 128) @ C.T
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_C = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.sqrt(2.0 / 8)
_C[0, :] = np.sqrt(1.0 / 8)
_CT = _C.T.copy()


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (clamped to [1, 255])."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    chrom = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255).astype(np.int32)
    return lum, chrom


# ----------------------------------------------------------- Huffman build

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, list[int]] = {}


def _build_decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit-peek decode LUT: LUT[next16bits] = (symbol << 5) | codelen.

    One numpy slice-fill per code keeps the build vectorized; decoding a
    symbol is then a single list index instead of the T.81 F.2.2.3
    per-bit mincode/maxcode walk.  Memoized on the table definition —
    in practice every image in a batch carries the same Annex-K tables,
    so the 65536-entry list is built once per process, not per image.
    """
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(1 << 16, dtype=np.int32)  # 0 => invalid code
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut[lo:hi] = (vals[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    _LUT_CACHE[key] = out
    return out


_ENC_DC = (_build_codes(DC_LUM_BITS, DC_LUM_VALS),
           _build_codes(DC_CHROM_BITS, DC_CHROM_VALS))
_ENC_AC = (_build_codes(AC_LUM_BITS, AC_LUM_VALS),
           _build_codes(AC_CHROM_BITS, AC_CHROM_VALS))


# -------------------------------------------------------------- bit writer

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:           # T.81 byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ------------------------------------------------------------------ encode

def _color_fwd(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr (float64, still unshifted)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(H, W) edge-padded to multiples of 8 -> (n_blocks, 8, 8),
    blocks in raster (MCU) order."""
    h, w = chan.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    bh, bw = chan.shape[0] // 8, chan.shape[1] // 8
    return (chan.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(bh * bw, 8, 8))


def _quantized_zigzag(chan: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Channel -> (n_blocks, 64) int32 quantized coefficients in zigzag
    order.  DCT + quantization vectorized across all blocks."""
    blocks = _to_blocks(chan) - 128.0
    coef = np.einsum("ij,bjk,lk->bil", _C, blocks, _C, optimize=True)
    q = np.round(coef.reshape(-1, 64) / qtab.astype(np.float64))
    return q.astype(np.int32)[:, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc[s]
    w.put(code, length)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac[(run << 4) | s]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac[0x00]  # EOB
        w.put(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode(pixels: np.ndarray, quality: int = DEFAULT_QUALITY) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, no subsampling)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("image dimensions out of JPEG range")
    qlum, qchrom = scaled_quant_tables(quality)

    ycc = _color_fwd(pixels)
    zz = [_quantized_zigzag(ycc[..., 0], qlum),
          _quantized_zigzag(ycc[..., 1], qchrom),
          _quantized_zigzag(ycc[..., 2], qchrom)]

    writer = _BitWriter()
    preds = [0, 0, 0]
    for b in range(zz[0].shape[0]):          # MCU loop: Y, Cb, Cr per MCU
        for c in range(3):
            t = 0 if c == 0 else 1
            preds[c] = _encode_block(writer, zz[c][b], preds[c],
                                     _ENC_DC[t], _ENC_AC[t])
    scan = writer.flush()

    out = bytearray(b"\xFF\xD8")                                   # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + qlum[ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xFFDB, b"\x01" + qchrom[ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling: 4:4:4
    out += _seg(0xFFC0, sof)                                       # SOF0
    for tc_th, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                              (0x10, AC_LUM_BITS, AC_LUM_VALS),
                              (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                              (0x11, AC_CHROM_BITS, AC_CHROM_VALS)):
        out += _seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))   # DHT
    sos = struct.pack(">B", 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tables)
    sos += b"\x00\x3F\x00"  # Ss=0 Se=63 Ah/Al=0
    out += _seg(0xFFDA, sos)                                       # SOS
    out += scan
    out += b"\xFF\xD9"                                             # EOI
    return bytes(out)


def encode_gray(gray: np.ndarray, quality: int = DEFAULT_QUALITY) -> bytes:
    """(h, w) uint8 -> single-component baseline JFIF bytes (the
    grayscale envelope of ``decode``)."""
    if gray.dtype != np.uint8 or gray.ndim != 2:
        raise ValueError("expected (h, w) uint8 array")
    h, w = gray.shape
    qlum, _ = scaled_quant_tables(quality)
    zz = _quantized_zigzag(gray.astype(np.float64), qlum)
    writer = _BitWriter()
    pred = 0
    for b in range(zz.shape[0]):
        pred = _encode_block(writer, zz[b], pred, _ENC_DC[0], _ENC_AC[0])
    scan = writer.flush()
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + qlum[ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
                + struct.pack(">BBB", 1, 0x11, 0))
    for tc_th, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                              (0x10, AC_LUM_BITS, AC_LUM_VALS)):
        out += _seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))
    out += _seg(0xFFDA, struct.pack(">B", 1)
                + struct.pack(">BB", 1, 0x00) + b"\x00\x3F\x00")
    out += scan
    out += b"\xFF\xD9"
    return bytes(out)


# ------------------------------------------------------------------ decode

class _BitReader:
    """Destuffed entropy-segment reader; constant-time 16-bit peek."""
    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\x00\x00\x00\x00"  # peek slack past the end
        self.bitpos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        i, sh = self.bitpos >> 3, self.bitpos & 7
        d = self.data
        win = (d[i] << 24) | (d[i + 1] << 16) | (d[i + 2] << 8) | d[i + 3]
        return (win >> (16 - sh)) & 0xFFFF

    def take(self, n: int) -> int:
        if self.bitpos + n > self.nbits:
            raise ValueError("truncated JPEG entropy segment")
        i, sh = self.bitpos >> 3, self.bitpos & 7
        d = self.data
        win = (d[i] << 24) | (d[i + 1] << 16) | (d[i + 2] << 8) | d[i + 3]
        self.bitpos += n
        return (win >> (32 - sh - n)) & ((1 << n) - 1)


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_scan(reader: _BitReader, n_blocks: int, comps: list[dict],
                 luts: dict) -> list[np.ndarray]:
    """Interleaved 4:4:4 MCU scan -> per-component (n_blocks, 64) zigzag
    coefficient arrays.

    The hot loop keeps the whole bit-reader state in locals and the
    Huffman LUTs as plain Python lists (one index per symbol) — the
    only per-symbol work is integer shifts on a 4-byte window.
    """
    out = [np.zeros((n_blocks, 64), np.int32) for _ in comps]
    # per-component plain-list LUTs + flat int32 views, hoisted once
    plan = []
    for ci, comp in enumerate(comps):
        plan.append((ci, luts[(0, comp["td"])], luts[(1, comp["ta"])],
                     out[ci]))
    preds = [0] * len(comps)
    data = reader.data
    bitpos = reader.bitpos
    nbits = reader.nbits
    for b in range(n_blocks):
        for ci, dclut, aclut, arr in plan:
            blk = arr[b]
            i = bitpos >> 3
            sh = bitpos & 7
            win = (data[i] << 24) | (data[i + 1] << 16) | (data[i + 2] << 8) | data[i + 3]
            entry = dclut[(win >> (16 - sh)) & 0xFFFF]
            if entry == 0:
                raise ValueError("invalid DC Huffman code")
            s = entry >> 5
            bitpos += entry & 31
            if s:
                i = bitpos >> 3
                sh = bitpos & 7
                win = (data[i] << 24) | (data[i + 1] << 16) | (data[i + 2] << 8) | data[i + 3]
                v = (win >> (32 - sh - s)) & ((1 << s) - 1)
                bitpos += s
                preds[ci] += v - (1 << s) + 1 if v < (1 << (s - 1)) else v
            blk[0] = preds[ci]
            k = 1
            while k < 64:
                i = bitpos >> 3
                sh = bitpos & 7
                win = (data[i] << 24) | (data[i + 1] << 16) | (data[i + 2] << 8) | data[i + 3]
                entry = aclut[(win >> (16 - sh)) & 0xFFFF]
                if entry == 0:
                    raise ValueError("invalid AC Huffman code")
                bitpos += entry & 31
                rs = entry >> 5
                s = rs & 15
                if s == 0:
                    if rs == 0xF0:   # ZRL
                        k += 16
                        continue
                    break            # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past end of block")
                i = bitpos >> 3
                sh = bitpos & 7
                win = (data[i] << 24) | (data[i + 1] << 16) | (data[i + 2] << 8) | data[i + 3]
                v = (win >> (32 - sh - s)) & ((1 << s) - 1)
                bitpos += s
                blk[k] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                k += 1
        if bitpos > nbits:
            raise ValueError("truncated JPEG entropy segment")
    return out


def _color_inv(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _from_blocks(blocks: np.ndarray, bh: int, bw: int,
                 h: int, w: int) -> np.ndarray:
    full = (blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8))
    return full[:h, :w]


def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (or grayscale
    replicated to 3 channels).  Parses tables from the stream; rejects
    anything outside the baseline 4:4:4 envelope loudly."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    luts: dict[tuple[int, int], list[int]] = {}
    sof = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(body[at + 1:at + 65], np.uint8).astype(np.int32)
                inv = np.empty(64, np.int32)
                inv[ZIGZAG] = tab  # stored zigzag -> row-major
                qtabs[tq] = inv
                at += 65
        elif marker == 0xC4:  # DHT
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 15
                bits = list(body[at + 1:at + 17])
                nvals = sum(bits)
                vals = list(body[at + 17:at + 17 + nvals])
                luts[(tc, th)] = _build_decode_lut(bits, vals)
                at += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling (only 4:4:4 supported)")
                comps.append({"cid": cid, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
            if ri != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            by_id = {c["cid"]: c for c in sof["comps"]}
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = dict(by_id[cid])
                comp["td"], comp["ta"] = tt >> 4, tt & 15
                scan_comps.append(comp)
            # destuff until the next real marker
            raw = bytearray()
            i = pos
            while i < len(data):
                byte = data[i]
                if byte == 0xFF:
                    nxt = data[i + 1] if i + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        raw.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise NotImplementedError("restart markers")
                    break
                raw.append(byte)
                i += 1
            h, w = sof["h"], sof["w"]
            bh, bw = (h + 7) // 8, (w + 7) // 8
            coefs = _decode_scan(_BitReader(bytes(raw)), bh * bw,
                                 scan_comps, luts)
            chans = []
            for comp, zzc in zip(scan_comps, coefs):
                qtab = qtabs[comp["tq"]].astype(np.float64)
                full = np.zeros((zzc.shape[0], 64), np.float64)
                full[:, ZIGZAG] = zzc.astype(np.float64)  # unzigzag
                full *= qtab
                blocks = full.reshape(-1, 8, 8)
                pix = np.einsum("ji,bjk,kl->bil", _C, blocks, _C,
                                optimize=True) + 128.0
                chans.append(_from_blocks(pix, bh, bw, h, w))
            if len(chans) == 1:
                g = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
                return np.stack([g, g, g], axis=-1)
            return _color_inv(chans[0], chans[1], chans[2])
        # APPn/COM and other ignorable segments: skipped
    raise ValueError("no scan data found in JPEG")
