"""RIFF/WAVE container parse + encode — pure stdlib/numpy.

Real crawled audio arrives as container files, not bare sample
buffers; this module lets the audio modality's ``binary`` column hold
actual ``.wav`` bytes.  Supported format tags (the ones whose sample
codecs are real in this container): 0x0001 linear PCM (8-bit unsigned
/ 16-bit signed LE), 0x0006 A-law and 0x0007 mu-law (via corpus.g711,
bit-exact G.711).  Anything else (0x0055 MP3-in-WAV, IEEE float, ...)
raises ``NotImplementedError`` so the Spark operator degrades to
ok=false rows rather than failing the job.

Parsing is chunk-walking per the RIFF spec: accept any chunk order,
skip unknown chunks (LIST/fact/cue), honor word alignment (odd-sized
chunks are padded), and trust the fmt chunk over the data chunk's
byte count for sample width.  The encoder exists so synthetic
fixtures are self-contained and round-trip testable.
"""

from __future__ import annotations

import struct

import numpy as np

from . import g711

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007

_TAG_NAMES = {WAVE_FORMAT_PCM: "pcm", WAVE_FORMAT_ALAW: "alaw", WAVE_FORMAT_MULAW: "mulaw"}


def wav_encode(pcm16: np.ndarray, sample_rate: int, codec: str = "pcm") -> bytes:
    """Mono int16 samples -> WAV file bytes (codec: pcm | mulaw | alaw)."""
    if codec == "pcm":
        tag, bits, payload = WAVE_FORMAT_PCM, 16, pcm16.astype("<i2").tobytes()
    elif codec == "mulaw":
        tag, bits, payload = WAVE_FORMAT_MULAW, 8, g711.ulaw_encode(pcm16)
    elif codec == "alaw":
        tag, bits, payload = WAVE_FORMAT_ALAW, 8, g711.alaw_encode(pcm16)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    block = bits // 8  # mono
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_parse(data: bytes) -> tuple[np.ndarray, int, str]:
    """WAV file bytes -> (mono float64 samples in [-1, 1], sample_rate,
    codec name).  Multi-channel input is averaged to mono (the standard
    feature-extraction downmix)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE file")
    pos, fmt_fields, payload = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt " and ln >= 16:
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # skip pad byte after odd-sized chunks
    if fmt_fields is None or payload is None:
        raise NotImplementedError("WAV missing fmt or data chunk")
    tag, n_ch, sr, _rate, _block, bits = fmt_fields
    if n_ch < 1:
        raise NotImplementedError("WAV with zero channels")
    if tag == WAVE_FORMAT_PCM and bits == 16:
        x = np.frombuffer(payload[: len(payload) & ~1], dtype="<i2").astype(np.float64) / 32767.0
    elif tag == WAVE_FORMAT_PCM and bits == 8:
        x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 127.0
    elif tag == WAVE_FORMAT_MULAW and bits == 8:
        x = g711.ulaw_decode(payload).astype(np.float64) / 32767.0
    elif tag == WAVE_FORMAT_ALAW and bits == 8:
        x = g711.alaw_decode(payload).astype(np.float64) / 32767.0
    else:
        raise NotImplementedError(f"no codec for WAV format tag 0x{tag:04x}/{bits}-bit here")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sr, _TAG_NAMES[tag]
