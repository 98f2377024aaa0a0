"""FLAC subset codec — pure stdlib/numpy (public spec: RFC 9639 /
xiph.org FLAC format).

Closes the last tractable "perceptual-codec stub" in the audio
modality honestly: FLAC is lossless and fully specified, so unlike
mp3/ogg (patent-era psychoacoustics, genuinely out of scope without
ffmpeg) it can be implemented for real here.

Encoder (subset, always spec-valid):
* mono, 16-bit, fixed block size (16-bit blocksize-1 header form),
  fixed blocking strategy, UTF-8-coded frame numbers
* per-frame best-of: CONSTANT, VERBATIM, FIXED orders 0-4, and real
  LPC (autocorrelation → Levinson-Durbin → coefficient quantization,
  precision 12) — residuals Rice-coded (method 0, partition order 0,
  per-frame best parameter search)
* STREAMINFO with real min/max frame sizes and the spec's MD5 of the
  unencoded little-endian sample stream; CRC-8 frame-header and
  CRC-16 whole-frame checksums emitted per spec

Decoder (wider than the encoder, still a documented subset):
* any channel count with INDEPENDENT channel assignment; 8/12/16/20/24
  bps; all block-size header codes; CONSTANT / VERBATIM / FIXED 0-4 /
  LPC 1-32 subframes; wasted-bits; Rice methods 0 and 1, any partition
  order, escape partitions
* verifies sync code, CRC-8, CRC-16 and (when present) the STREAMINFO
  MD5 — corrupt streams raise instead of returning wrong samples
* stereo decorrelation assignments (left/side, right/side, mid/side)
  raise NotImplementedError (this encoder never emits them; a real
  deployment's mixed corpus would plug ffmpeg in for those)

LZW-style caveat as for GIF: decode is sequential within one stream,
but the engine scales across rows (clips), one clip per core.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[((c >> 8) ^ byte) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _BitWriter:
    """MSB-first bit packer (FLAC bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, val: int, bits: int) -> None:
        self.write(val & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bits_len(self) -> int:
        return len(self.buf) * 8 + self.nbits


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_coded(val: int) -> bytes:
    """The frame header's UTF-8-style coded number (RFC 9639 §9.1.1)."""
    if val < 0x80:
        return bytes([val])
    out = []
    nbytes = 2
    # capacity for n total bytes: (7 - n) + 6*(n-1) payload bits
    while (7 - nbytes) + 6 * (nbytes - 1) < val.bit_length():
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (val >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((val >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1:
        raise ValueError("bad UTF-8-coded number in frame header")
    val = first & (mask - 1)
    for _ in range(n):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded continuation byte")
        val = (val << 6) | (cont & 0x3F)
    return val


# ------------------------------------------------------------- encode

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res.astype(np.int64) << 1,
                    ((-res.astype(np.int64)) << 1) - 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, total bits) for one partition, params 0..14 (15=escape
    reserved).  Vectorized over the candidate params."""
    best_p, best_cost = 0, None
    for p in range(15):
        cost = int((u >> p).sum()) + len(u) * (1 + p)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p, best_cost


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_analyze(s: np.ndarray, order: int, precision: int = 12):
    """Autocorrelation → Levinson-Durbin → quantized coefficients.
    Returns (qcoefs, shift) or None when analysis is degenerate."""
    x = s.astype(np.float64)
    n = len(x)
    if n <= order * 2:
        return None
    ac = np.array([np.dot(x[: n - k], x[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    ac[0] *= 1.0 + 1e-9  # ridge against singularity
    err = ac[0]
    coefs = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(coefs[:i], ac[i:0:-1])) / err
        coefs[i] = k
        coefs[:i] -= k * coefs[i - 1 :: -1] if i else 0.0
        err *= 1.0 - k * k
        if err <= 0:
            return None
    cmax = np.abs(coefs).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(s: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    x = s.astype(np.int64)
    # prediction[i] = (sum_j q[j] * x[i-1-j]) >> shift  for i >= order
    pred = np.zeros(len(x) - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * x[order - 1 - j : len(x) - 1 - j]
    return x[order:] - (pred >> shift)


def _write_residual(bw: _BitWriter, res: np.ndarray) -> None:
    """Rice method 0, partition order 0 (one partition)."""
    u = _zigzag(res)
    p, _ = _best_rice_param(u)
    bw.write(0b00, 2)
    bw.write(0, 4)  # partition order 0
    bw.write(p, 4)
    for v in u.tolist():
        bw.write_unary(int(v) >> p)
        bw.write(int(v) & ((1 << p) - 1), p)


def _encode_frame(blk: np.ndarray, frame_no: int, bps: int = 16) -> bytes:
    header = bytearray()
    header += struct.pack(">H", 0b1111111111111000)  # sync, reserved, fixed
    # blocksize code 0b0111 (16-bit-1 at end), sample-rate 0b0000 (from
    # STREAMINFO), channels 0b0000 (mono), bps 0b100 (16), reserved 0
    header.append((0b0111 << 4) | 0b0000)
    header.append((0b0000 << 4) | (0b100 << 1))
    header += _utf8_coded(frame_no)
    header += struct.pack(">H", len(blk) - 1)
    header.append(_crc8(bytes(header)))

    s = blk.astype(np.int64)
    candidates: list[tuple[int, str, object]] = []
    if (s == s[0]).all():
        candidates.append((bps + 8, "constant", None))
    candidates.append((len(s) * bps + 8, "verbatim", None))
    for order in range(5):
        if len(s) <= order:
            continue
        res = _fixed_residual(s, order)
        _, cost = _best_rice_param(_zigzag(res))
        candidates.append((cost + order * bps + 8 + 6, f"fixed{order}", res))
    lpc_order = min(8, len(s) // 4)
    if lpc_order >= 1:
        lp = _lpc_analyze(s, lpc_order)
        if lp is not None:
            q, shift = lp
            res = _lpc_residual(s, q, shift)
            _, cost = _best_rice_param(_zigzag(res))
            candidates.append((cost + lpc_order * bps + lpc_order * 12 + 9 + 8,
                               "lpc", (q, shift, res)))
    _, kind, payload = min(candidates, key=lambda c: c[0])

    bw = _BitWriter()
    if kind == "constant":
        bw.write(0, 1), bw.write(0b000000, 6), bw.write(0, 1)
        bw.write_signed(int(s[0]), bps)
    elif kind == "verbatim":
        bw.write(0, 1), bw.write(0b000001, 6), bw.write(0, 1)
        for v in s.tolist():
            bw.write_signed(int(v), bps)
    elif kind.startswith("fixed"):
        order = int(kind[5])
        bw.write(0, 1), bw.write(0b001000 | order, 6), bw.write(0, 1)
        for v in s[:order].tolist():
            bw.write_signed(int(v), bps)
        _write_residual(bw, payload)
    else:  # lpc
        q, shift, res = payload
        order = len(q)
        bw.write(0, 1), bw.write(0b100000 | (order - 1), 6), bw.write(0, 1)
        for v in s[:order].tolist():
            bw.write_signed(int(v), bps)
        bw.write(12 - 1, 4)   # precision-1
        bw.write_signed(shift, 5)
        for c in q.tolist():
            bw.write_signed(int(c), 12)
        _write_residual(bw, res)
    bw.align()
    body = bytes(header) + bytes(bw.buf)
    return body + struct.pack(">H", _crc16(body))


def flac_encode(pcm16: np.ndarray, sr: int, block_size: int = 4096) -> bytes:
    """Mono int16 samples → a spec-valid FLAC stream (see module doc)."""
    x = np.asarray(pcm16)
    if x.ndim != 1:
        raise ValueError("mono input expected")
    x = x.astype(np.int16)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    frames = [
        _encode_frame(x[i : i + block_size], fi)
        for fi, i in enumerate(range(0, len(x), block_size))
    ]
    sizes = [len(f) for f in frames] or [0]
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min(sizes), 24)
    si.write(max(sizes), 24)
    si.write(sr, 20)
    si.write(0, 3)        # channels - 1
    si.write(15, 5)       # bps - 1 = 15
    si.write(len(x), 36)
    streaminfo = bytes(si.buf) + md5
    assert len(streaminfo) == 34
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + streaminfo + b"".join(frames))


# ------------------------------------------------------------- decode

_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for part in range(1 << porder):
        count = blocksize >> porder
        if part == 0:
            count -= order
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            for i in range(count):
                out[pos + i] = br.read_signed(nbits) if nbits else 0
        else:
            for i in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[pos + i] = (u >> 1) ^ -(u & 1)
        pos += count
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif stype == 0b000001:
        out = np.array([br.read_signed(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x7
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif stype >= 0b100000:
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    return out << wasted


def flac_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (samples int32 (n,) or (n, ch), sample_rate, bps).
    Verifies sync / CRC-8 / CRC-16 / STREAMINFO MD5 (when present)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = channels = bps = total = None
    md5 = b"\x00" * 16
    while True:
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        if hdr & 0x7F == 0:  # STREAMINFO
            br = _BitReader(data, pos + 4)
            br.read(16), br.read(16), br.read(24), br.read(24)
            sr = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = data[pos + 4 + 18 : pos + 4 + 34]
        pos += 4 + blen
        if hdr & 0x80:
            break
    if sr is None:
        raise ValueError("FLAC stream without STREAMINFO")

    out = np.empty((total, channels), dtype=np.int64)
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_coded(br)
        if bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample rate code")
        crc_here = _crc8(data[frame_start : br.byte + (1 if br.bit else 0)])
        # header CRC is byte-aligned by construction
        if br.bit:
            raise ValueError("frame header not byte aligned")
        if br.read(8) != crc_here:
            raise ValueError("frame header CRC-8 mismatch")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError("reserved bps code")
        if ch_code <= 0b0111:
            nch = ch_code + 1
            chans = [_decode_subframe(br, blocksize, fbps) for _ in range(nch)]
        else:
            # left/side, right/side, mid/side decorrelation: the subset
            # encoder never emits these; plug ffmpeg for wild corpora.
            raise NotImplementedError(
                "stereo decorrelation channel assignments not supported")
        if nch != channels:
            raise ValueError("frame channel count differs from STREAMINFO")
        br.align()
        body_end = br.byte
        if _crc16(data[frame_start:body_end]) != struct.unpack(
                ">H", data[body_end : body_end + 2])[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = body_end + 2
        take = min(blocksize, total - got)
        for c in range(channels):
            out[got : got + take, c] = chans[c][:take]
        got += take

    if md5 != b"\x00" * 16:
        if bps == 16:
            flat = out.astype("<i2").tobytes()
        else:  # pragma: no cover - encoder only emits 16-bit
            nbytes = (bps + 7) // 8
            flat = b"".join(int(v).to_bytes(nbytes, "little", signed=True)
                            for v in out.ravel())
        if hashlib.md5(flat).digest() != md5:
            raise ValueError("decoded audio MD5 mismatch")
    res = out.astype(np.int32)
    return (res[:, 0] if channels == 1 else res), sr, bps


def flac_parse(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float64 mono in [-1, 1], sample_rate) — the same
    output shape riffwav.wav_parse feeds audio_feature_dict."""
    x, sr, bps = flac_decode(data)
    if x.ndim == 2:
        x = x.mean(axis=1)
    return x.astype(np.float64) / float((1 << (bps - 1)) - 1), sr
