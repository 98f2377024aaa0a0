"""G.711 mu-law / A-law companded audio — pure-numpy codec.

The classic ITU-T G.711 8-bit logarithmic PCM companding (the one
real-world crawled telephony/voicemail audio actually ships in), so
the audio modality's compressed path decodes for REAL in this
container instead of stubbing: vectorized numpy only, no external
codec library.  Semantics follow the canonical public-domain g711.c
(Sun Microsystems) bit layout: sign bit 0x80, 3 exponent bits, 4
mantissa bits; mu-law bytes are stored complemented, A-law bytes are
stored XOR 0x55.

Encoders exist so synthetic fixtures are self-contained and
round-trip testable; decoders are the production path
(`ops.multimodal.audio_features`).  Perceptual codecs (mp3/ogg/flac)
remain honestly stubbed — those genuinely need external libraries.
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84  # mu-law bias (132)
_CLIP = 32635


def ulaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear PCM (vectorized ulaw2linear)."""
    u = (~np.frombuffer(data, dtype=np.uint8).astype(np.int32)) & 0xFF
    t = ((u & 0x0F) << 3) + _BIAS
    t <<= (u & 0x70) >> 4
    return np.where(u & 0x80, _BIAS - t, t - _BIAS).astype(np.int16)


def ulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 linear PCM -> mu-law bytes (vectorized linear2ulaw)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = position of the highest set bit above bit 7 (0..7)
    exp = np.clip((np.log2(mag).astype(np.int32)) - 7, 0, 7)
    # log2 on exact powers of two is float-exact; guard the off-by-one
    # at segment boundaries by recomputing against the true threshold
    exp = np.where(mag >> (exp + 8) != 0, exp + 1, exp)
    exp = np.where(mag >> (exp + 7) == 0, exp - 1, exp)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def alaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear PCM (vectorized alaw2linear)."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> bytes:
    """int16 linear PCM -> A-law bytes (vectorized linear2alaw)."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0x00)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 0x7FFF)
    with np.errstate(divide="ignore"):
        seg = np.clip(np.log2(np.maximum(mag, 1)).astype(np.int32) - 7, 0, 7)
    seg = np.where(mag >> (seg + 8) != 0, seg + 1, seg)
    seg = np.where((seg > 0) & (mag >> (seg + 7) == 0), seg - 1, seg)
    mant = np.where(seg == 0, (mag >> 4) & 0x0F, (mag >> (seg + 3)) & 0x0F)
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8).tobytes()
