"""JPEG EXIF (APP1 / TIFF-IFD) build, parse and GPS scrub — pure
stdlib (public specs: EXIF 2.3 / CIPA DC-008, TIFF 6.0, ITU-T T.81
marker structure).

The training-pipeline privacy op: crawled JPEGs routinely carry GPS
coordinates in an EXIF GPS sub-IFD, and a 100-TB ingest must be able
to (a) extract camera/date metadata and (b) REMOVE location data —
both as byte-level marker-segment surgery that never touches the
entropy-coded image data, so the scan is header-bound and the scrub
is lossless (decoded pixels bit-identical before/after).

* ``build_app1``   — assemble a real APP1 segment: "Exif\\0\\0" +
  TIFF header (II little-endian) + IFD0 (ASCII / SHORT tags +
  optional Exif and GPS sub-IFD pointers) + GPS IFD (lat/lon as the
  spec's RATIONAL degree/minute/second triplets)
* ``insert_app1``  — splice an APP1 right after SOI (before APP0)
* ``parse_exif``   — walk JPEG markers to APP1, parse the TIFF
  structure (both byte orders), return {tag_name: value}; GPS
  returned as signed decimal degrees
* ``scrub_gps``    — rewrite the JPEG with the GPS sub-IFD removed:
  IFD0 is rebuilt without the GPSInfo pointer tag, every surviving
  offset is recomputed, all other segments (including the entropy
  stream) are copied byte-for-byte

Like the PNG text scan (imaging.png_text_chunks), parsing stops at
SOS: nothing after the entropy stream begins is ever read.
"""

from __future__ import annotations

import struct

# The tag subset a crawl pipeline actually uses (EXIF 2.3 §4.6)
IFD0_TAGS = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x0131: "Software",
    0x0132: "DateTime",
    0x8298: "Copyright",
    0x8769: "_ExifIFD",
    0x8825: "_GPSIFD",
}
EXIF_TAGS = {
    0x9003: "DateTimeOriginal",
    0xA002: "PixelXDimension",
    0xA003: "PixelYDimension",
}
GPS_TAGS = {
    0x0001: "GPSLatitudeRef",
    0x0002: "GPSLatitude",
    0x0003: "GPSLongitudeRef",
    0x0004: "GPSLongitude",
}

_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5


def _deg_to_dms(value: float) -> list[tuple[int, int]]:
    """abs decimal degrees -> spec RATIONAL triplet (d, m, s*100/100)."""
    v = abs(value)
    d = int(v)
    m = int((v - d) * 60)
    s = round(((v - d) * 60 - m) * 60 * 100)
    return [(d, 1), (m, 1), (s, 100)]


def _dms_to_deg(dms: list[tuple[int, int]]) -> float:
    (d, dd), (m, md), (s, sd) = dms
    return d / dd + m / md / 60 + s / sd / 3600


class _IfdBuilder:
    """One IFD with its out-of-line value area (little-endian)."""

    def __init__(self, base_offset: int) -> None:
        self.entries: list[tuple[int, int, int, bytes]] = []
        self.base = base_offset

    def add(self, tag: int, typ: int, value) -> None:
        if typ == _ASCII:
            data = value.encode("ascii") + b"\x00"
            count = len(data)
        elif typ == _SHORT:
            data = struct.pack("<H", value)
            count = 1
        elif typ == _LONG:
            data = struct.pack("<I", value)
            count = 1
        elif typ == _RATIONAL:
            data = b"".join(struct.pack("<II", n, d) for n, d in value)
            count = len(value)
        else:
            raise ValueError(f"unsupported TIFF type {typ}")
        self.entries.append((tag, typ, count, data))

    def render(self) -> bytes:
        self.entries.sort()  # TIFF requires ascending tag order
        n = len(self.entries)
        head_len = 2 + n * 12 + 4
        tail = b""
        body = struct.pack("<H", n)
        for tag, typ, count, data in self.entries:
            if len(data) <= 4:
                val = data.ljust(4, b"\x00")
            else:
                val = struct.pack("<I", self.base + head_len + len(tail))
                tail += data
            body += struct.pack("<HHI", tag, typ, count) + val
        body += struct.pack("<I", 0)  # no next IFD
        return body + tail


def build_app1(make: str = "", model: str = "", datetime: str = "",
               orientation: int = 1, software: str = "",
               lat: float | None = None, lon: float | None = None) -> bytes:
    """Assemble a spec-conformant APP1 segment (marker included)."""
    # layout: TIFF header (8) | IFD0 | [GPS IFD]; offsets are from the
    # TIFF header start, so build GPS first at a placeholder offset of
    # 0, measure IFD0, then rebuild GPS at its real offset.
    def render(gps_off: int) -> bytes:
        ifd0 = _IfdBuilder(8)
        if make:
            ifd0.add(0x010F, _ASCII, make)
        if model:
            ifd0.add(0x0110, _ASCII, model)
        ifd0.add(0x0112, _SHORT, orientation)
        if software:
            ifd0.add(0x0131, _ASCII, software)
        if datetime:
            ifd0.add(0x0132, _ASCII, datetime)
        if lat is not None:
            ifd0.add(0x8825, _LONG, gps_off)
        return ifd0.render()

    ifd0_bytes = render(0)
    gps_bytes = b""
    if lat is not None and lon is not None:
        gps_off = 8 + len(ifd0_bytes)
        ifd0_bytes = render(gps_off)
        gps = _IfdBuilder(gps_off)
        gps.add(0x0001, _ASCII, "N" if lat >= 0 else "S")
        gps.add(0x0002, _RATIONAL, _deg_to_dms(lat))
        gps.add(0x0003, _ASCII, "E" if lon >= 0 else "W")
        gps.add(0x0004, _RATIONAL, _deg_to_dms(lon))
        gps_bytes = gps.render()
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0_bytes + gps_bytes
    payload = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def _walk_segments(jpeg: bytes):
    """Yield (marker, seg_start, seg_end) until SOS; entropy data is
    never scanned."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = jpeg[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        yield marker, pos, pos + 2 + seglen
        if marker == 0xDA:  # SOS: entropy-coded data follows
            break
        pos += 2 + seglen


def _parse_ifd(tiff: bytes, off: int, endian: str, names: dict) -> dict:
    out = {}
    (n,) = struct.unpack(endian + "H", tiff[off : off + 2])
    for i in range(n):
        e = off + 2 + i * 12
        tag, typ, count = struct.unpack(endian + "HHI", tiff[e : e + 8])
        raw = tiff[e + 8 : e + 12]
        if typ == _ASCII:
            size = count
        elif typ == _SHORT:
            size = 2 * count
        elif typ in (_LONG,):
            size = 4 * count
        elif typ == _RATIONAL:
            size = 8 * count
        else:
            continue  # unknown type: skip per TIFF readers' convention
        if size > 4:
            (voff,) = struct.unpack(endian + "I", raw)
            data = tiff[voff : voff + size]
        else:
            data = raw[:size]
        if typ == _ASCII:
            val = data.rstrip(b"\x00").decode("ascii", "replace")
        elif typ == _SHORT:
            val = struct.unpack(endian + "H" * count, data)
            val = val[0] if count == 1 else list(val)
        elif typ == _LONG:
            val = struct.unpack(endian + "I" * count, data)
            val = val[0] if count == 1 else list(val)
        else:  # RATIONAL
            flat = struct.unpack(endian + "II" * count, data)
            val = [(flat[2 * i], flat[2 * i + 1]) for i in range(count)]
        name = names.get(tag)
        if name:
            out[name] = val
    return out


def _find_app1(jpeg: bytes) -> tuple[int, int] | None:
    for marker, start, end in _walk_segments(jpeg):
        if marker == 0xE1 and jpeg[start + 4 : start + 10] == b"Exif\x00\x00":
            return start, end
    return None


def parse_exif(jpeg: bytes) -> dict:
    """Extract the supported tag subset; GPS collapses to signed
    decimal ``gps_lat``/``gps_lon``.  No EXIF → empty dict."""
    span = _find_app1(jpeg)
    if span is None:
        return {}
    tiff = jpeg[span[0] + 10 : span[1]]
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("bad TIFF byte order in EXIF")
    (magic, ifd0_off) = struct.unpack(endian + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    out = _parse_ifd(tiff, ifd0_off, endian, IFD0_TAGS)
    gps_off = out.pop("_GPSIFD", None)
    exif_off = out.pop("_ExifIFD", None)
    if exif_off is not None:
        out.update(_parse_ifd(tiff, exif_off, endian, EXIF_TAGS))
    if gps_off is not None:
        g = _parse_ifd(tiff, gps_off, endian, GPS_TAGS)
        if "GPSLatitude" in g and "GPSLongitude" in g:
            lat = _dms_to_deg(g["GPSLatitude"])
            lon = _dms_to_deg(g["GPSLongitude"])
            out["gps_lat"] = -lat if g.get("GPSLatitudeRef") == "S" else lat
            out["gps_lon"] = -lon if g.get("GPSLongitudeRef") == "W" else lon
    return out


def scrub_gps(jpeg: bytes) -> tuple[bytes, bool]:
    """Remove location data: rebuild the APP1 from the PARSED non-GPS
    tags (so no stale GPS bytes can survive in the value area), copy
    every other byte — notably the entropy-coded stream — untouched.
    Returns (clean_jpeg, had_gps).  JPEGs without EXIF or without GPS
    come back unchanged."""
    span = _find_app1(jpeg)
    if span is None:
        return jpeg, False
    tags = parse_exif(jpeg)
    if "gps_lat" not in tags:
        return jpeg, False
    clean = build_app1(
        make=tags.get("Make", ""), model=tags.get("Model", ""),
        datetime=tags.get("DateTime", ""),
        orientation=tags.get("Orientation", 1),
        software=tags.get("Software", ""))
    return jpeg[: span[0]] + clean + jpeg[span[1] :], True
