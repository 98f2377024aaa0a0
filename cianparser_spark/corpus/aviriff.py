"""RIFF/AVI container demux + encode — pure stdlib/numpy.

Real crawled video arrives as container files; this module lets the
video modality's ``binary`` column hold actual ``.avi`` bytes.  The
demuxer chunk-walks the RIFF tree per the public AVI spec: ``hdrl``
(``avih`` main header, first video ``strl``'s ``strh``/``strf``) for
metadata, ``movi`` for the frame stream (``##db``/``##dc`` chunks of
the video stream, word-aligned), ``idx1`` ignored.  Frame DECODE is
real for uncompressed DIB video (``BITMAPINFOHEADER.biCompression ==
BI_RGB``, 24-bit, bottom-up BGR rows — the classic raw AVI) and for
Motion JPEG (``MJPG`` fourcc: each frame is a standalone baseline
JFIF image, decoded by corpus/jpegbase.py).  Other compressed fourccs
(XVID, …) demux fine but raise ``NotImplementedError`` at decode —
those need external codec libraries this container doesn't have.

The encoder writes a minimal valid single-video-stream AVI (BI_RGB or
MJPG) so synthetic fixtures are self-contained and round-trip
testable.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

BI_RGB = 0


@dataclass
class AviMeta:
    width: int
    height: int
    n_frames: int
    fps: float
    fourcc: bytes  # b"DIB " for uncompressed
    compression: int  # strf biCompression (BI_RGB=0)
    bit_count: int


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


BI_MJPG = struct.unpack("<I", b"MJPG")[0]  # mmioFOURCC('M','J','P','G')


def avi_encode(frames: list[np.ndarray], fps: int = 10,
               codec: str = "dib") -> bytes:
    """(h, w, 3) uint8 RGB frames -> minimal single-video-stream AVI.

    codec="dib" writes classic uncompressed BI_RGB bottom-up BGR frames
    ("00db" chunks); codec="mjpg" writes Motion JPEG — one real
    baseline JFIF image per frame (corpus/jpegbase.py) in "00dc"
    chunks with biCompression = 'MJPG', the standard MJPG AVI layout.
    """
    h, w, _ = frames[0].shape
    row = (w * 3 + 3) & ~3  # DIB rows pad to 4 bytes

    if codec == "dib":
        def enc(px: np.ndarray) -> bytes:
            bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
            out = np.zeros((h, row), dtype=np.uint8)
            out[:, : w * 3] = bgr.reshape(h, w * 3)
            return out.tobytes()
        fourcc, comp, chunk_id = b"DIB ", BI_RGB, b"00db"
    elif codec == "mjpg":
        from cianparser_spark.corpus import jpegbase

        enc = jpegbase.encode
        fourcc, comp, chunk_id = b"MJPG", BI_MJPG, b"00dc"
    else:
        raise NotImplementedError(f"unknown AVI codec {codec!r}")

    payloads = [enc(px) for px in frames]
    frame_sz = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_sz * fps, 0, 0x10, len(frames), 0, 1, frame_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", fourcc, 0, 0, 0, 0, 1, fps, 0, len(frames), frame_sz, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_sz, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(chunk_id, p) for p in payloads))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def avi_demux(data: bytes) -> tuple[AviMeta, list[bytes]]:
    """AVI file bytes -> (metadata, raw per-frame chunk payloads of the
    first video stream).  Demux only — no codec required."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI file")
    meta = {"width": 0, "height": 0, "n_frames": 0, "fps": 0.0,
            "fourcc": b"", "compression": -1, "bit_count": 0}
    frames: list[bytes] = []
    seen_video_strl = False

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal seen_video_strl
        while pos + 8 <= end:
            cid, ln = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_at, body_end = pos + 8, min(pos + 8 + ln, end)
            if cid == b"LIST":
                walk(buf, body_at + 4, body_end)
            elif cid == b"avih" and ln >= 56:
                us_pf, _, _, _, total, _, _, _, w, h = struct.unpack(
                    "<IIIIIIIIII", buf[body_at : body_at + 40])
                meta["width"], meta["height"], meta["n_frames"] = w, h, total
                meta["fps"] = 1_000_000 / us_pf if us_pf else 0.0
            elif cid == b"strh" and ln >= 8 and not seen_video_strl:
                if buf[body_at : body_at + 4] == b"vids":
                    seen_video_strl = True
                    meta["fourcc"] = buf[body_at + 4 : body_at + 8]
            elif cid == b"strf" and seen_video_strl and meta["compression"] == -1 and ln >= 40:
                _, _, _, _, bits, comp = struct.unpack("<IiiHHI", buf[body_at : body_at + 20])
                meta["bit_count"], meta["compression"] = bits, comp
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                if cid[:2] == b"00":  # first stream only
                    frames.append(buf[body_at:body_end])
            pos = body_at + ln + (ln & 1)

    walk(data, 12, len(data))
    if not seen_video_strl or meta["compression"] == -1:
        raise NotImplementedError("AVI missing a video stream header")
    return AviMeta(**meta), frames


def frame_decode(frame: bytes, meta: AviMeta) -> np.ndarray:
    """Demuxed frame payload -> (h, w, 3) uint8 RGB, dispatching on the
    stream's codec: BI_RGB raw DIB and MJPG (per-frame baseline JPEG,
    corpus/jpegbase.py) are real; other fourccs (XVID, …) raise
    ``NotImplementedError`` loudly."""
    if meta.compression == BI_MJPG or meta.fourcc in (b"MJPG", b"mjpg"):
        from cianparser_spark.corpus import jpegbase

        return jpegbase.decode(frame)
    return dib_decode(frame, meta)


def dib_decode(frame: bytes, meta: AviMeta) -> np.ndarray:
    """Uncompressed BI_RGB 24-bit DIB frame -> (h, w, 3) uint8 RGB."""
    if meta.compression != BI_RGB or meta.bit_count != 24:
        name = meta.fourcc.decode("ascii", "replace").strip() or hex(meta.compression)
        raise NotImplementedError(f"no video codec for {name!r} in this environment")
    w, h = meta.width, meta.height
    row = (w * 3 + 3) & ~3
    arr = np.frombuffer(frame[: row * h], dtype=np.uint8).reshape(h, row)
    return arr[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
