"""MPEG audio (MP3) frame-header scanner + deterministic builder.

Pure struct/int work from the public ISO/IEC 11172-3 framing rules:
the 32-bit frame header (sync, version, layer, bitrate index,
sample-rate index, padding, channel mode), the frame-length formula
(`144*bitrate/samplerate + padding` for MPEG-1 Layer III, `72*...`
for the MPEG-2 low-sample-rate profile), ID3v2 tag skipping
(syncsafe sizes) and the Xing/Info VBR header carried in the first
frame's side-info region.  This is a HEADER-BOUND metadata scan — at
100 TB it reads a few bytes per frame boundary and never touches the
Huffman/psychoacoustic payload, exactly like the PNG-text and EXIF
scans (same SURVEY.md §2 slot).  Actual MP3 *sample decode* remains an
honest ``NotImplementedError`` in ops/multimodal.py: patent-era
psychoacoustic DSP needs a real codec library this sandbox lacks.

The builder emits structurally valid CBR/VBR MPEG-1 Layer III streams
(correct headers + frame lengths; payload bytes are a deterministic
seeded fill, since no encoder exists here) so the scanner has real
framing to walk in tests and oracles.

Role mirror: reference has no media handling; extends MM2
(SURVEY.md §2) on the metadata axis.
"""
from __future__ import annotations

import struct

# bitrate kbps tables, index 1..14 (0=free, 15=bad) — ISO 11172-3 / 13818-3
_BITRATE_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112,
                  128, 160, 192, 224, 256, 320, None)
_BITRATE_V2_L3 = (None, 8, 16, 24, 32, 40, 48, 56, 64,
                  80, 96, 112, 128, 144, 160, None)
_SR_V1 = (44100, 48000, 32000, None)
_SR_V2 = (22050, 24000, 16000, None)
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _header_word(bitrate_kbps: int, sr: int, padding: int, mode: str) -> int:
    bi = _BITRATE_V1_L3.index(bitrate_kbps)
    si = _SR_V1.index(sr)
    mi = _MODES.index(mode)
    return ((0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
            | (bi << 12) | (si << 10) | (padding << 9) | (mi << 6))


def _frame_len(version: int, bitrate_kbps: int, sr: int, padding: int) -> int:
    per = 144 if version == 1 else 72
    return per * bitrate_kbps * 1000 // sr + padding


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


# Xing side-info offset from frame start: MPEG-1 is 21 bytes of
# side info mono / 36 bytes otherwise, after the 4-byte header
_XING_OFF = {"mono": 4 + 17, "other": 4 + 32}


def mp3_build(seed: int, n_frames: int = 24, bitrate_kbps: int = 128,
              sr: int = 44100, mode: str = "joint_stereo",
              id3_size: int = 0, xing: bool = False,
              vbr_rates: tuple[int, ...] | None = None) -> bytes:
    """Deterministic MPEG-1 Layer III stream: valid framing, seeded
    payload fill.  ``vbr_rates`` cycles per-frame bitrates (and implies
    a leading Xing 'Info'-less VBR stream unless ``xing`` adds the
    header); ``id3_size`` prepends an ID3v2.3 tag of that body size."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x03\x00\x00" + _syncsafe(id3_size)
        out += bytes((seed + i) % 251 for i in range(id3_size))
    audio_start = len(out)
    for f in range(n_frames):
        rate = (vbr_rates[f % len(vbr_rates)] if vbr_rates else bitrate_kbps)
        padding = (seed + f) % 2 if not vbr_rates else 0
        flen = _frame_len(1, rate, sr, padding)
        frame = bytearray(struct.pack(">I", _header_word(rate, sr, padding, mode)))
        frame += bytes((seed * 7 + f * 13 + k) % 256 for k in range(flen - 4))
        # never let the deterministic fill fake a sync word
        for k in range(4, flen - 1):
            if frame[k] == 0xFF and frame[k + 1] >= 0xE0:
                frame[k + 1] = 0x00
        out += frame
    if xing:
        off = audio_start + (_XING_OFF["mono"] if mode == "mono"
                             else _XING_OFF["other"])
        tag = (b"Xing" + struct.pack(">I", 0x3)
               + struct.pack(">I", n_frames)
               + struct.pack(">I", len(out) - audio_start))
        out[off: off + len(tag)] = tag
    return bytes(out)


def mp3_scan(data: bytes) -> dict:
    """Walk every frame header; returns container metadata + integrity:
    ``{id3v2_bytes, n_frames, sample_rate, channel_mode, bitrate_kbps
    (None when VBR), vbr, xing_frames, duration_s}``.  Raises
    ``ValueError`` on broken sync/framing, ``NotImplementedError`` for
    non-Layer-III streams (honest scope boundary)."""
    pos = 0
    id3v2_bytes = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        id3v2_bytes = 10 + _unsyncsafe(data[6:10])
        pos = id3v2_bytes
    audio_start = pos
    n_frames = 0
    rates: set[int] = set()
    sr_seen: set[int] = set()
    mode_seen: set[str] = set()
    samples_per_frame = 1152
    xing_frames = None
    while pos + 4 <= len(data):
        (hw,) = struct.unpack_from(">I", data, pos)
        if hw >> 21 != 0x7FF:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        version_bits = (hw >> 19) & 0x3
        layer_bits = (hw >> 17) & 0x3
        if layer_bits != 0b01:
            raise NotImplementedError("only Layer III streams supported")
        if version_bits == 0b11:
            version, brt, srt = 1, _BITRATE_V1_L3, _SR_V1
        elif version_bits == 0b10:
            version, brt, srt = 2, _BITRATE_V2_L3, _SR_V2
            samples_per_frame = 576
        else:
            raise NotImplementedError("reserved/2.5 MPEG version")
        bi, si = (hw >> 12) & 0xF, (hw >> 10) & 0x3
        rate, sr = brt[bi], srt[si]
        if rate is None or sr is None:
            raise ValueError(f"bad bitrate/samplerate index at byte {pos}")
        padding = (hw >> 9) & 0x1
        mode = _MODES[(hw >> 6) & 0x3]
        if n_frames == 0:
            off = pos + (_XING_OFF["mono"] if mode == "mono"
                         else _XING_OFF["other"])
            tag = data[off: off + 4]
            if tag in (b"Xing", b"Info"):
                (flags,) = struct.unpack_from(">I", data, off + 4)
                if flags & 0x1:
                    (xing_frames,) = struct.unpack_from(">I", data, off + 8)
        rates.add(rate)
        sr_seen.add(sr)
        mode_seen.add(mode)
        n_frames += 1
        pos += _frame_len(version, rate, sr, padding)
    if pos != len(data):
        raise ValueError("truncated final MP3 frame")
    if not n_frames:
        raise ValueError("no MP3 frames")
    if len(sr_seen) != 1 or len(mode_seen) != 1:
        raise ValueError("inconsistent sample rate / mode across frames")
    sr = sr_seen.pop()
    vbr = len(rates) > 1
    dur_frames = xing_frames if xing_frames is not None else n_frames
    return {
        "id3v2_bytes": id3v2_bytes,
        "n_frames": n_frames,
        "sample_rate": sr,
        "channel_mode": mode_seen.pop(),
        "bitrate_kbps": None if vbr else rates.pop(),
        "vbr": vbr,
        "xing_frames": xing_frames,
        "duration_s": dur_frames * samples_per_frame / sr,
        "audio_bytes": len(data) - audio_start,
    }
