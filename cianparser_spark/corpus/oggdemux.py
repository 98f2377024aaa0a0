"""Ogg container demux/mux + Vorbis identification-header parse.

Pure struct/numpy work from the public RFC 3533 (Ogg encapsulation)
and the Xiph Vorbis I spec: page capture pattern 'OggS', version 0,
header-type flags (continued/BOS/EOS), granule position, serial,
sequence numbers, the 255-terminated lacing (segment table) that
splits packets across pages, and the page CRC-32 (polynomial
0x04c11db7, init 0, no reflection — Ogg's own variant, NOT zlib) which
``ogg_demux`` verifies on every page.  ``vorbis_ident_parse`` reads
packet 1 of a Vorbis stream (channels, sample rate, bitrate fields,
blocksizes + framing bit).  This is the container layer only — a
scan-bound metadata pass at 100 TB; actual Vorbis MDCT/floor/residue
*sample decode* remains an honest ``NotImplementedError`` in
ops/multimodal.py (psychoacoustic DSP, needs a codec library).

Role mirror: reference has no media handling; extends MM2
(SURVEY.md §2) on the metadata axis, same slot as corpus/riffwav.py.
"""
from __future__ import annotations

import struct

import numpy as np


def _crc_table() -> np.ndarray:
    poly = 0x04C11DB7
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ poly if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TAB = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = np.uint32(0)
    tab = _CRC_TAB
    for b in data:
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ tab[(int(crc) >> 24) ^ b]
    return int(crc)


def _page(serial: int, seq: int, granule: int, segments: list[bytes],
          header_type: int) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for s in segments:
        lacing.append(len(s))
        body += s
    hdr = bytearray(b"OggS\x00" + bytes([header_type])
                    + struct.pack("<qIII", granule, serial, seq, 0)
                    + bytes([len(lacing)]) + lacing)
    page = hdr + body
    crc = ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def ogg_build(packets: list[bytes], serial: int = 0xC1A0,
              max_segs_per_page: int = 32) -> bytes:
    """Encapsulate packets into a single logical stream: BOS on the
    first page, EOS on the last, packets split into 255-byte lacing
    segments (a terminating <255 segment each, so 255-multiple packets
    get an explicit empty terminator), spanning pages when the segment
    budget runs out (continued-packet flag set on the next page)."""
    # packet → lacing segments
    all_segs: list[tuple[bytes, bool]] = []  # (segment, starts_new_packet)
    for p in packets:
        first = True
        for off in range(0, len(p), 255):
            all_segs.append((p[off: off + 255], first))
            first = False
        if len(p) % 255 == 0:  # includes empty packets
            all_segs.append((b"", len(p) == 0))
    out = bytearray()
    seq = 0
    i = 0
    continued = False
    while i < len(all_segs):
        chunk = all_segs[i: i + max_segs_per_page]
        # a page may not START mid-packet without the continued flag
        htype = 0x1 if continued else 0x0
        if seq == 0:
            htype |= 0x2  # BOS
        if i + len(chunk) >= len(all_segs):
            htype |= 0x4  # EOS
        segs = [s for s, _ in chunk]
        granule = seq * 1000  # deterministic synthetic granule
        out += _page(serial, seq, granule, segs, htype)
        # does the last segment of this page end its packet?
        continued = len(segs[-1]) == 255
        i += len(chunk)
        seq += 1
    return bytes(out)


def ogg_demux(data: bytes) -> dict:
    """Walk all pages, verify every CRC and the sequence-number run,
    reassemble packets across page boundaries.  Returns
    ``{serial, n_pages, n_packets, packets, last_granule, bos, eos}``.
    Raises ``ValueError`` on capture/CRC/sequence corruption."""
    pos = 0
    packets: list[bytes] = []
    partial = bytearray()
    open_packet = False
    n_pages = 0
    serial0 = None
    expect_seq = 0
    last_granule = 0
    saw_bos = saw_eos = False
    while pos < len(data):
        if data[pos: pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture at byte {pos}")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        htype = data[pos + 5]
        granule, serial, seq, crc_stored = struct.unpack_from("<qIII", data, pos + 6)
        n_lace = data[pos + 26]
        lacing = data[pos + 27: pos + 27 + n_lace]
        body_len = sum(lacing)
        page_len = 27 + n_lace + body_len
        page = bytearray(data[pos: pos + page_len])
        if len(page) != page_len:
            raise ValueError("truncated Ogg page")
        struct.pack_into("<I", page, 22, 0)
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        if serial0 is None:
            serial0 = serial
        elif serial != serial0:
            raise NotImplementedError("multiplexed Ogg streams not supported")
        if seq != expect_seq:
            raise ValueError("Ogg page sequence gap")
        expect_seq += 1
        if htype & 0x2:
            saw_bos = True
        if htype & 0x4:
            saw_eos = True
        if (htype & 0x1) and not open_packet:
            raise ValueError("continued flag without an open packet")
        if not (htype & 0x1) and open_packet:
            raise ValueError("open packet but page not marked continued")
        body_off = pos + 27 + n_lace
        cursor = 0
        for k, ln in enumerate(lacing):
            partial += data[body_off + cursor: body_off + cursor + ln]
            cursor += ln
            if ln < 255:
                packets.append(bytes(partial))
                partial.clear()
                open_packet = False
            else:
                open_packet = True
        last_granule = granule
        n_pages += 1
        pos += page_len
    if open_packet:
        raise ValueError("stream ends mid-packet")
    return {"serial": serial0, "n_pages": n_pages, "n_packets": len(packets),
            "packets": packets, "last_granule": last_granule,
            "bos": saw_bos, "eos": saw_eos}


def vorbis_ident_build(channels: int, sample_rate: int,
                       bitrate_nominal: int = 112000) -> bytes:
    """Packet 1 of a Vorbis stream per the Vorbis I spec §4.2.2."""
    return (b"\x01vorbis" + struct.pack("<IB", 0, channels)
            + struct.pack("<Iiii", sample_rate, 0, bitrate_nominal, 0)
            + bytes([(8 << 4) | 8])  # blocksize_1 / blocksize_0 exponents
            + b"\x01")               # framing bit


def vorbis_ident_parse(packet: bytes) -> dict:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("not a Vorbis identification header")
    version, channels = struct.unpack_from("<IB", packet, 7)
    rate, br_max, br_nom, br_min = struct.unpack_from("<Iiii", packet, 12)
    bs = packet[28]
    if version != 0 or not packet[29] & 0x1:
        raise ValueError("bad Vorbis ident version/framing")
    return {"channels": channels, "sample_rate": rate,
            "bitrate_nominal": br_nom,
            "blocksize_0": 1 << (bs & 0xF), "blocksize_1": 1 << (bs >> 4)}
