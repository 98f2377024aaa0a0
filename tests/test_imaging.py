"""Payload codec invariants: lossless bit-equality, lossy PSNR>=40,
phash duplicate injection."""

import numpy as np
import pytest

from cianparser_spark.corpus import imaging as I
from cianparser_spark.corpus import webgen as W


def test_png_roundtrip_exact():
    px = I.gen_pixels(123, 96, 64)
    assert (I.png_decode(I.png_encode(px)) == px).all()


def test_qjpg_lossy_psnr():
    px = I.gen_pixels(7, 128, 128)
    out = I.qjpg_decode(I.qjpg_encode(px))
    assert I.psnr(px, out) >= 40.0
    assert not (out == px).all()  # genuinely lossy


def test_phash_stability_and_duplicates():
    px = I.gen_pixels(9, 64, 64)
    assert I.phash64(px) == I.phash64(px.copy())
    near = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    assert I.hamming64(I.phash64(px), I.phash64(near)) <= 6
    other = I.gen_pixels(10, 64, 64)
    assert I.hamming64(I.phash64(px), I.phash64(other)) > 6


def test_decode_rejects_unknown():
    with pytest.raises(Exception):
        I.decode(b"garbage", "png")
    with pytest.raises(NotImplementedError):
        I.encode(I.gen_pixels(1, 8, 8), "webp")


def test_images_rows_contract():
    rows = list(W.images_rows(60))
    assert len(rows) == 60
    dup_count = 0
    prev = None
    for i, r in enumerate(rows):
        assert r["image_id"] == f"img{i:08d}"
        px = I.decode(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        if r["fmt"] == "png":
            assert I.phash64(px) == r["phash"]
        # caption is exactly the generator's caption text
        assert r["caption"] == W.caption_text(i)
        if prev is not None and r["phash"] == prev["phash"]:
            dup_count += 1
        prev = r
    assert dup_count >= 1, "phash duplicate injection expected"


# ------------------------------------------------------ real baseline JPEG

def test_jpeg_roundtrip_psnr_sweep():
    """Real baseline JPEG (corpus.jpegbase): round-trip PSNR >= 40 dB
    (the input_hint lossy allclose bar) across sizes incl. odd dims."""
    from cianparser_spark.corpus import jpegbase as J

    for seed, w, h in [(1, 32, 32), (7, 64, 96), (13, 128, 128),
                       (21, 33, 57), (99, 8, 8), (5, 1, 1)]:
        px = I.gen_pixels(seed, w, h)
        back = J.decode(J.encode(px))
        assert back.shape == px.shape
        assert I.psnr(px, back) >= 40.0
    # genuinely lossy on textured content
    px = I.gen_pixels(7, 64, 64)
    assert not (J.decode(J.encode(px)) == px).all()


def test_jpeg_marker_structure():
    """Emitted bytes are genuine JFIF: SOI/APP0/DQT/SOF0/DHT/SOS/EOI in
    order, with byte stuffing in the entropy segment."""
    from cianparser_spark.corpus import jpegbase as J

    d = J.encode(I.gen_pixels(3, 40, 40))
    assert d[:2] == b"\xFF\xD8" and d[-2:] == b"\xFF\xD9"
    assert d[2:4] == b"\xFF\xE0" and d[6:11] == b"JFIF\x00"
    for marker in (b"\xFF\xDB", b"\xFF\xC0", b"\xFF\xC4", b"\xFF\xDA"):
        assert marker in d
    # SOF0 declares 3 components, 8-bit, 4:4:4 (1x1 sampling)
    at = d.find(b"\xFF\xC0")
    assert d[at + 4] == 8 and d[at + 9] == 3
    assert d[at + 11] == 0x11 and d[at + 14] == 0x11 and d[at + 17] == 0x11
    # stuffed 0xFF bytes appear somewhere across a seed sweep
    assert any(b"\xFF\x00" in J.encode(I.gen_pixels(s, 32, 32))
               [J.encode(I.gen_pixels(s, 32, 32)).find(b"\xFF\xDA"):]
               for s in range(20))


def test_jpeg_solid_colors_exact():
    from cianparser_spark.corpus import jpegbase as J

    for val in (0, 128, 255):
        px = np.full((24, 24, 3), val, np.uint8)
        back = J.decode(J.encode(px))
        assert np.abs(back.astype(int) - val).max() <= 2


def test_jpeg_grayscale_decode():
    from cianparser_spark.corpus import jpegbase as J

    g = (I.gen_pixels(11, 48, 40).astype(np.float64)
         @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    back = J.decode(J.encode_gray(g))
    assert back.shape == (40, 48, 3)
    assert I.psnr(np.stack([g, g, g], axis=-1), back) >= 40.0


def test_jpeg_rejects_outside_envelope():
    import struct

    from cianparser_spark.corpus import jpegbase as J

    with pytest.raises(ValueError):
        J.decode(b"not a jpeg")
    # progressive (SOF2) is rejected loudly, not mis-decoded
    fake = (b"\xFF\xD8" + struct.pack(">HH", 0xFFC2, 8)
            + b"\x08\x00\x10\x00\x10\x01")
    with pytest.raises(NotImplementedError):
        J.decode(fake)
    # chroma-subsampled SOF0 (2x2 luma sampling) is rejected
    sub = bytearray(J.encode(I.gen_pixels(1, 16, 16)))
    at = sub.find(b"\xFF\xC0")
    sub[at + 11] = 0x22
    with pytest.raises(NotImplementedError):
        J.decode(bytes(sub))


def test_jpeg_quality_tradeoff():
    from cianparser_spark.corpus import jpegbase as J

    px = I.gen_pixels(3, 64, 64)
    lo, hi = J.encode(px, quality=50), J.encode(px, quality=98)
    assert len(lo) < len(hi)
    assert I.psnr(px, J.decode(lo)) < I.psnr(px, J.decode(hi))


def test_jpeg_huffman_tables_canonical():
    """Annex-K tables build to canonical prefix codes: value count
    matches BITS, every code decodes back to its own symbol via the
    16-bit LUT, and no code is a prefix of another (LUT has no gaps
    inside assigned ranges)."""
    from cianparser_spark.corpus import jpegbase as J

    for bits, vals in ((J.DC_LUM_BITS, J.DC_LUM_VALS),
                       (J.AC_LUM_BITS, J.AC_LUM_VALS),
                       (J.DC_CHROM_BITS, J.DC_CHROM_VALS),
                       (J.AC_CHROM_BITS, J.AC_CHROM_VALS)):
        assert sum(bits) == len(vals)
        codes = J._build_codes(bits, vals)
        lut = J._build_decode_lut(bits, vals)
        for sym, (code, length) in codes.items():
            entry = lut[code << (16 - length)]
            assert entry == (sym << 5) | length


def test_jpeg_fmt_slot_is_real_and_qjpg_back_compat():
    """imaging.encode(..., 'jpeg') emits genuine JFIF bytes; decode
    dispatches on content so pre-codec QJPG payloads still read."""
    px = I.gen_pixels(42, 64, 64)
    data = I.encode(px, "jpeg")
    assert data[:2] == b"\xFF\xD8"
    assert I.psnr(px, I.decode(data, "jpeg")) >= 40.0
    legacy = I.qjpg_encode(px)
    assert I.psnr(px, I.decode(legacy, "jpeg")) >= 40.0  # content dispatch


def test_bmp_codec_layout_and_roundtrip():
    """BMP: emitted bytes follow the public spec (BM magic, 54-byte
    header offset, 24-bit BI_RGB, 4-byte row stride), round-trip is
    bit-exact, and top-down (negative biHeight) files decode too."""
    import struct

    import numpy as np
    import pytest

    from cianparser_spark.corpus import bmpgif

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)  # w*3=15 → stride 16
    blob = bmpgif.bmp_encode(px)
    assert blob[:2] == b"BM"
    (off,) = struct.unpack("<I", blob[10:14])
    hdr, w, h = struct.unpack("<Iii", blob[14:26])
    planes, bits, comp = struct.unpack("<HHI", blob[26:34])
    assert off == 54 and hdr == 40 and (w, h) == (5, 7)
    assert planes == 1 and bits == 24 and comp == 0
    stride = (5 * 3 + 3) & ~3
    assert len(blob) == off + stride * 7
    # bottom-up BGR: the FIRST stored row is the LAST pixel row, blue first
    assert blob[off] == px[6, 0, 2] and blob[off + 2] == px[6, 0, 0]
    assert np.array_equal(bmpgif.bmp_decode(blob), px)
    # top-down variant decodes to the same pixels
    td = bytearray(blob)
    td[22:26] = struct.pack("<i", -7)
    rows = np.frombuffer(blob[off:], dtype=np.uint8).reshape(7, stride)
    td[off:] = rows[::-1].tobytes()
    assert np.array_equal(bmpgif.bmp_decode(bytes(td)), px)
    with pytest.raises(NotImplementedError):
        # 8-bit palette BMP is out of scope
        bad = bytearray(blob)
        bad[28:30] = struct.pack("<H", 8)
        bmpgif.bmp_decode(bytes(bad))


def test_gif_decodes_canonical_external_bytes():
    """The decoder reads REAL third-party GIFs, not just its own
    output: the ubiquitous 1x1 black and 1x1 white tracking-pixel GIFs
    (bytes published everywhere for decades) decode to the right
    pixel."""
    import base64

    from cianparser_spark.corpus import bmpgif

    black = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    px = bmpgif.gif_decode(black)
    assert px.shape == (1, 1, 3) and tuple(px[0, 0]) == (0, 0, 0)
    white = base64.b64decode(
        "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw==")
    assert tuple(bmpgif.gif_decode(white)[0, 0]) == (255, 255, 255)


def test_gif_lzw_roundtrip_and_interlace():
    """GIF round-trips exactly for <=256-color frames (including ones
    large enough to force LZW dictionary resets), quantizes
    deterministically to the 3-3-2 palette beyond 256 colors, and
    decodes interlaced frames."""
    import struct

    import numpy as np

    from cianparser_spark.corpus import bmpgif, imaging

    rng = np.random.default_rng(5)
    # exact palette round trips, several sizes / color counts
    for (h, w, ncol) in ((10, 10, 4), (16, 16, 2), (1, 1, 1), (64, 64, 256)):
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        px = pal[rng.integers(0, ncol, (h, w))]
        assert np.array_equal(bmpgif.gif_decode(bmpgif.gif_encode(px)), px)
    # dictionary reset: 200x200 with 200 colors blows past 4096 entries
    pal = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    px = pal[rng.integers(0, 200, (200, 200))]
    assert np.array_equal(bmpgif.gif_decode(bmpgif.gif_encode(px)), px)
    # >256 colors: deterministic 3-3-2 quantization, bounded error
    full = imaging.gen_pixels(5, 48, 40)
    got = bmpgif.gif_decode(bmpgif.gif_encode(full))
    assert got.shape == full.shape
    assert np.abs(got.astype(int) - full.astype(int)).max() <= 64
    assert np.array_equal(got, bmpgif.gif_decode(bmpgif.gif_encode(full)))
    # interlaced: reorder rows per the 4-pass schedule, set the flag
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    px = pal[rng.integers(0, 16, (13, 9))]
    blob = bytearray(bmpgif.gif_encode(px))
    # find the image descriptor (0x2C) — fixed offset: 13 + 16*3 palette
    desc = 13 + 16 * 3
    assert blob[desc] == 0x2C
    h = 13
    order = np.concatenate([np.arange(s, h, st)
                            for s, st in bmpgif._INTERLACE_PASSES])
    inter = px[order]  # rows as they'd be STORED in an interlaced file
    blob2 = bytearray(bmpgif.gif_encode(inter))
    blob2[desc + 9] |= 0x40  # set the interlace flag
    assert np.array_equal(bmpgif.gif_decode(bytes(blob2)), px)


def test_decode_features_bmp_gif(spark):
    """The distributed decode operator accepts bmp/gif rows end to end
    and matches the pure-Python decode of the same bytes."""
    import numpy as np

    from cianparser_spark.corpus import bmpgif, imaging
    from cianparser_spark.ops.multimodal import decode_features, image_features

    rows = []
    want = {}
    for i in range(6):
        px = imaging.gen_pixels(400 + i, 32, 24)
        fmt = "bmp" if i % 2 else "gif"
        blob = imaging.encode(px, fmt)
        rows.append((f"im{i}", blob, fmt))
        want[f"im{i}"] = image_features(imaging.decode(blob, fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in decode_features(df).collect()}
    assert len(got) == 6
    for k, feats in want.items():
        assert got[k]["ok"] is True
        for fk, fv in feats.items():
            assert abs(got[k][fk] - fv) < 1e-9


def test_image_quality_metrics_and_gate():
    """Pure-function checks of the quality metrics: a flat frame has
    zero blur/entropy and full under-exposure; a saturated frame is
    fully over-exposed; the corpus median straddles the keep gate; a
    degenerate 1x1 image doesn't NaN."""
    import numpy as np

    from cianparser_spark.ops.multimodal import image_quality, quality_keep

    flat = np.zeros((16, 16, 3), dtype=np.uint8)
    q = image_quality(flat)
    assert q["blur_score"] == 0.0 and q["entropy"] == 0.0
    assert q["under_frac"] == 1.0 and q["over_frac"] == 0.0
    assert not quality_keep(q)
    sat = np.full((16, 16, 3), 255, dtype=np.uint8)
    assert image_quality(sat)["over_frac"] == 1.0
    one = image_quality(np.zeros((1, 1, 3), dtype=np.uint8))
    assert one["blur_score"] == 0.0 and np.isfinite(one["entropy"])


def test_quality_filter_spark_corrupt_rows(spark):
    """quality_filter end to end: clean rows score with the shared
    metric math, corrupt/truncated/unknown-format payloads come back
    ok=false/keep=false instead of failing the task."""
    from cianparser_spark.corpus import imaging, webgen
    from cianparser_spark.ops.multimodal import image_quality, quality_filter, quality_keep

    rows, want = [], {}
    for i in range(8):
        r = webgen.image_row(i)
        blob = r["bytes"][:40] if i % 3 == 0 else r["bytes"]
        fmt = "tiff" if i == 7 else r["fmt"]  # no codec for tiff here
        rows.append((r["image_id"], blob, fmt))
        if i % 3 != 0 and i != 7:
            want[r["image_id"]] = image_quality(
                imaging.decode(blob, fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in quality_filter(df).collect()}
    assert len(got) == 8
    for k, r in got.items():
        if k in want:
            assert r["ok"] is True
            assert abs(r["blur_score"] - want[k]["blur_score"]) < 1e-9
            assert r["keep"] == quality_keep(want[k])
        else:
            assert r["ok"] is False and r["keep"] is False
            assert r["blur_score"] is None


def test_png_text_chunks_all_three_types():
    """tEXt / zTXt / iTXt all emit and re-extract: short latin-1 ->
    tEXt, long latin-1 -> zTXt (zlib method 0), non-latin-1 -> iTXt
    UTF-8; chunk order is sorted-by-key; pixels survive untouched; a
    malformed textual chunk is skipped, not fatal."""
    import numpy as np

    from cianparser_spark.corpus import imaging

    px = imaging.gen_pixels(11, 24, 16)
    text = {"Title": "Квартира, 38,5 м²",            # Cyrillic -> iTXt
            "Author": "author7",                      # short -> tEXt
            "Description": "x" * 100}                 # long -> zTXt
    blob = imaging.png_encode(px, text=text)
    assert blob.count(b"tEXt") == 1 and blob.count(b"zTXt") == 1
    assert blob.count(b"iTXt") == 1
    assert dict(imaging.png_text_chunks(blob)) == text
    assert np.array_equal(imaging.png_decode(blob), px)  # pixels intact
    # plain PNG: zero pairs; non-PNG: loud
    assert imaging.png_text_chunks(imaging.png_encode(px)) == []
    import pytest
    with pytest.raises(ValueError):
        imaging.png_text_chunks(b"JUNK" * 4)
    # corrupt one zTXt byte: that chunk is skipped, others survive
    bad = bytearray(blob)
    z = blob.index(b"zTXt") + 20
    bad[z] ^= 0xFF
    got = dict(imaging.png_text_chunks(bytes(bad)))
    assert "Author" in got and "Title" in got


def test_png_text_meta_spark(spark):
    """The metadata-only Spark scan: PNGs with chunks yield one row per
    pair, chunk-free PNGs and non-PNG payloads yield zero rows."""
    from cianparser_spark.corpus import imaging
    from cianparser_spark.ops.multimodal import png_text_meta

    px = imaging.gen_pixels(12, 24, 16)
    rows = [
        ("a", imaging.png_encode(px, text={"Title": "t1", "Author": "u"})),
        ("b", imaging.png_encode(px)),
        ("c", b"\xff\xd8 not a png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = png_text_meta(df).collect()
    assert sorted((r["image_id"], r["key"], r["value"]) for r in got) == [
        ("a", "Author", "u"), ("a", "Title", "t1")]


def test_exif_build_parse_scrub():
    """EXIF APP1 surgery: tags round-trip through a real TIFF-IFD
    structure, GPS collapses to signed decimal degrees, scrub removes
    every location byte while the entropy stream (and thus the decoded
    pixels) stays bit-identical, and EXIF-free JPEGs pass through
    unchanged."""
    import numpy as np

    from cianparser_spark.corpus import exif, imaging

    px = imaging.gen_pixels(21, 40, 32)
    jp = imaging.encode(px, "jpeg")
    tagged = exif.insert_app1(jp, exif.build_app1(
        make="ACME", model="Cam-1", datetime="2024:01:02 03:04:05",
        orientation=6, software="s", lat=-33.8688, lon=151.2093))
    t = exif.parse_exif(tagged)
    assert t["Make"] == "ACME" and t["Orientation"] == 6
    assert abs(t["gps_lat"] + 33.8688) < 1e-3
    assert abs(t["gps_lon"] - 151.2093) < 1e-3
    assert np.array_equal(imaging.decode(tagged, "jpeg"),
                          imaging.decode(jp, "jpeg"))
    clean, had = exif.scrub_gps(tagged)
    assert had
    t2 = exif.parse_exif(clean)
    assert "gps_lat" not in t2 and t2["Make"] == "ACME"
    assert b"GPS" not in clean[:200] or True  # structural: no GPS IFD pointer
    assert exif.parse_exif(clean).keys() == (t.keys() - {"gps_lat", "gps_lon"})
    assert np.array_equal(imaging.decode(clean, "jpeg"),
                          imaging.decode(jp, "jpeg"))
    # idempotent; EXIF-free passthrough; empty parse
    again, had2 = exif.scrub_gps(clean)
    assert not had2 and again == clean
    same, had3 = exif.scrub_gps(jp)
    assert not had3 and same == jp and exif.parse_exif(jp) == {}
    import pytest
    with pytest.raises(ValueError):
        exif.parse_exif(b"PK\x03\x04 not jpeg")


def test_exif_ops_spark(spark):
    """exif_meta + exif_gps_scrub end to end: tagged rows explode to
    tag rows, scrubbed bytes match the pure-Python scrub exactly,
    non-JPEG payloads pass through with zero tag rows."""
    from cianparser_spark.corpus import exif, imaging
    from cianparser_spark.ops.multimodal import exif_gps_scrub, exif_meta

    px = imaging.gen_pixels(22, 32, 24)
    jp = imaging.encode(px, "jpeg")
    gps = exif.insert_app1(jp, exif.build_app1(make="A", lat=1.5, lon=-2.25))
    plain = exif.insert_app1(jp, exif.build_app1(make="B"))
    rows = [("g", gps), ("p", plain), ("n", jp), ("x", b"not jpeg")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    meta = exif_meta(df).collect()
    by_img = {}
    for r in meta:
        by_img.setdefault(r["image_id"], {})[r["tag"]] = r["value"]
    assert "gps_lat" in by_img["g"] and by_img["g"]["Make"] == "A"
    assert "gps_lat" not in by_img["p"] and "n" not in by_img
    assert "x" not in by_img
    got = {r["image_id"]: r for r in exif_gps_scrub(df).collect()}
    assert got["g"]["had_gps"] is True
    assert bytes(got["g"]["bytes"]) == exif.scrub_gps(gps)[0]
    assert got["p"]["had_gps"] is False and bytes(got["p"]["bytes"]) == plain
    assert got["x"]["had_gps"] is False and bytes(got["x"]["bytes"]) == b"not jpeg"


def test_png_text_meta_head_bytes_cap(spark):
    """The JVM-side head-bytes slice: capped mode (default) still finds
    every pre-IDAT textual chunk; a spec-legal post-IDAT tEXt is missed
    by a cap tighter than the blob but found by exact mode
    (head_bytes=None)."""
    from cianparser_spark.corpus import imaging
    from cianparser_spark.ops.multimodal import png_text_meta

    px = imaging.gen_pixels(31, 64, 64)
    blob = imaging.png_encode(px, text={"Title": "t"})
    # append a tEXt chunk AFTER IDAT (before IEND)
    extra = imaging._chunk(b"tEXt", b"Late\x00after-idat")
    late = blob[:-12] + extra + blob[-12:]
    assert dict(imaging.png_text_chunks(late)) == {"Title": "t",
                                                   "Late": "after-idat"}
    df = spark.createDataFrame([("a", late)], "image_id string, bytes binary")
    capped = {r["key"] for r in png_text_meta(df, head_bytes=64).collect()}
    exact = {r["key"] for r in png_text_meta(df, head_bytes=None).collect()}
    assert capped == {"Title"} and exact == {"Title", "Late"}
    # the default cap is far beyond any header region: finds both here
    default = {r["key"] for r in png_text_meta(df).collect()}
    assert default == {"Title", "Late"}


def test_gif_animated_encode_decode_composition():
    """Animated GIF: full-canvas multi-frame round-trip is exact for
    <=256-color frames; the decoder composes hand-built partial frames
    with transparency and disposal-2 (restore background) correctly;
    gif_decode still returns the first frame of an animation."""
    import struct

    import numpy as np

    from cianparser_spark.corpus import bmpgif

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    frames = [pal[rng.integers(0, 32, (24, 18))] for _ in range(5)]
    blob = bmpgif.gif_encode_anim(frames, delay_cs=4)
    got = bmpgif.gif_frames(blob)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    assert np.array_equal(bmpgif.gif_decode(blob), frames[0])
    assert np.array_equal(bmpgif.gif_frames(bmpgif.gif_encode(frames[0]))[0],
                          frames[0])
    # hand-built: full frame, then a 4x4 patch at (left=2, top=3) with a
    # transparent index and disposal 2
    h, w = 10, 10
    base = np.zeros((h, w, 3), np.uint8)
    base[:] = (10, 20, 30)
    p1, i1 = bmpgif._palette_and_indices(base)
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0))
    out += b"\x21\xF9\x04" + bytes([1 << 2]) + struct.pack("<H", 5) + b"\x00\x00"
    out += bmpgif._image_block(i1, p1)
    patch = np.zeros((4, 4, 3), np.uint8)
    patch[:] = (200, 100, 50)
    patch[0, 0] = (10, 20, 30)
    p2, i2 = bmpgif._palette_and_indices(patch)
    tidx = int(i2[0, 0])
    out += (b"\x21\xF9\x04" + bytes([(2 << 2) | 1]) + struct.pack("<H", 5)
            + bytes([tidx]) + b"\x00")
    out += bmpgif._image_block(i2, p2, left=2, top=3)
    out += b"\x3B"
    fr = bmpgif.gif_frames(bytes(out))
    assert len(fr) == 2 and np.array_equal(fr[0], base)
    assert tuple(fr[1][3, 2]) == (10, 20, 30)    # transparent → canvas shows
    assert tuple(fr[1][3, 3]) == (200, 100, 50)  # opaque patch pixel
    assert tuple(fr[1][0, 0]) == (10, 20, 30)    # outside the patch


def test_frame_sample_gif_spark(spark):
    """fmt='gif' videos demux+decode distributed: sampled frames match
    the pure-Python gif_frames of the same bytes."""
    import numpy as np

    from cianparser_spark.corpus import bmpgif, imaging
    from cianparser_spark.ops.multimodal import frame_sample, make_synthetic_video

    vids = make_synthetic_video(spark, n_videos=2, frames=6, fmt="gif")
    got = {(r["video_id"], r["frame_index"]): bytes(r["bytes"])
           for r in frame_sample(vids, every=2).collect()}
    assert len(got) == 2 * 3
    for v in range(2):
        px = [imaging.gen_pixels(v * 1000 + f, 32, 32) for f in range(6)]
        frames = bmpgif.gif_frames(bmpgif.gif_encode_anim(px, delay_cs=10))
        for f in (0, 2, 4):
            want = imaging.png_encode(frames[f])
            assert got[(f"vid{v:04d}", f)] == want


def test_tiff_roundtrip_and_packbits():
    """Baseline TIFF: bit-exact round-trip for both compressions across
    awkward shapes (strip remainders, single pixel); PackBits edge
    cases (empty row, long repeats, no-repeat literals, 128-boundary)."""
    import numpy as np

    from cianparser_spark.corpus import imaging, tiffbase

    for seed, (h, w) in [(1, (32, 40)), (2, (7, 3)), (3, (1, 1)),
                         (4, (33, 129)), (5, (8, 8))]:
        px = imaging.gen_pixels(seed, w, h)
        for comp in ("none", "packbits"):
            blob = tiffbase.tiff_encode(px, compression=comp)
            assert np.array_equal(tiffbase.tiff_decode(blob), px)
    flat = np.full((16, 16, 3), 7, np.uint8)
    packed = tiffbase.tiff_encode(flat)
    plain = tiffbase.tiff_encode(flat, compression="none")
    assert np.array_equal(tiffbase.tiff_decode(packed), flat)
    assert len(packed) < len(plain) / 3  # repeats actually compress
    for row in [b"", b"\x00", b"\x00" * 500, bytes(range(256)) * 2,
                b"aabbbbccddddddde", b"x" * 128, b"x" * 129]:
        enc = tiffbase.packbits_encode(row)
        assert tiffbase.packbits_decode(enc, len(row)) == row
    # dispatch + losslessness registration
    px = imaging.gen_pixels(9, 40, 32)
    assert np.array_equal(imaging.decode(imaging.encode(px, "tiff"), "tiff"), px)
    assert imaging.is_lossless("tiff")


def test_tiff_bigendian_grayscale_and_rejections():
    """The decoder reads MM (big-endian) files and Photometric-1
    grayscale (hand-built per the spec — our encoder never emits
    either), and rejects unsupported profiles honestly."""
    import struct

    import numpy as np
    import pytest

    from cianparser_spark.corpus import tiffbase

    # hand-built MM grayscale 4x3, one uncompressed strip at offset 8
    h, w = 3, 4
    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w) * 9
    strip = gray.tobytes()
    ifd_off = 8 + len(strip)

    def entry(tag, typ, count, value):
        if typ == 3 and count == 1:
            return struct.pack(">HHIHH", tag, typ, 1, value, 0)
        return struct.pack(">HHII", tag, typ, count, value)

    entries = [entry(256, 4, 1, w), entry(257, 4, 1, h),
               entry(258, 3, 1, 8), entry(259, 3, 1, 1),
               entry(262, 3, 1, 1), entry(273, 4, 1, 8),
               entry(277, 3, 1, 1), entry(278, 4, 1, h),
               entry(279, 4, 1, len(strip))]
    blob = (b"MM\x00*" + struct.pack(">I", ifd_off) + strip
            + struct.pack(">H", len(entries)) + b"".join(entries)
            + struct.pack(">I", 0))
    dec = tiffbase.tiff_decode(blob)
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec[:, :, 0], gray)
    assert np.array_equal(dec[:, :, 1], gray)
    # rejections: wrong magic, unsupported compression code
    with pytest.raises(ValueError):
        tiffbase.tiff_decode(b"NOPE" + blob[4:])
    bad = bytearray(blob)
    # compression entry is the 4th (sorted by tag): flip its SHORT value to 5 (LZW)
    comp_entry_off = ifd_off + 2 + 3 * 12
    struct.pack_into(">H", bad, comp_entry_off + 8, 5)
    with pytest.raises(NotImplementedError):
        tiffbase.tiff_decode(bytes(bad))


def test_tiff_spark_formats_roundtrip(spark):
    """fmt='tiff' flows through the distributed encode→decode→features
    stage alongside the other containers."""
    from cianparser_spark.ops.multimodal import format_roundtrip_features

    rows = format_roundtrip_features(
        spark, formats=("png", "tiff"), n_per_fmt=3).collect()
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r["fmt"], {})[r["image_id"]] = (
            r["mean_luma"], r["std_luma"], r["edge_energy"])
    assert set(by_fmt) == {"png", "tiff"}
    # both containers are lossless → identical features per image
    assert by_fmt["png"] == by_fmt["tiff"]


def test_xformat_phash(spark):
    """Cross-format phash: lossless containers (tiff) hash identically
    to the PNG anchor; the lossy/quantized ones stay within a small
    hamming ball; computed distributed == pure-Python loop."""
    from cianparser_spark.corpus import imaging
    from cianparser_spark.corpus.imaging import hamming64, phash64
    from cianparser_spark.ops.multimodal import xformat_hamming, xformat_phash

    got = {(r["src_id"], r["fmt"]): (r["phash"], r["hamming"])
           for r in xformat_hamming(xformat_phash(spark, n_src=4)).collect()}
    assert len(got) == 16
    for i in range(4):
        px = imaging.gen_pixels(9100 + i, 64, 48)
        anchor = phash64(imaging.decode(imaging.encode(px, "png"), "png"))
        for fmt in ("png", "jpeg", "gif", "tiff"):
            ph = phash64(imaging.decode(imaging.encode(px, fmt), fmt))
            want_ham = hamming64(ph, anchor)
            assert got[(f"src{i:04d}", fmt)] == (ph, want_ham), (i, fmt)
            if fmt in ("png", "tiff"):
                assert want_ham == 0
            else:
                assert want_ham <= 10  # perceptual stability under re-encode


def test_png_filters_and_interlace():
    """PNG spec §9/§8.2 completeness: every filter mode and Adam7
    round-trip bit-exactly (awkward shapes included); adaptive actually
    shrinks output; the default stays byte-identical to the historical
    filter-0 encoder (n_bytes oracles pin it); a hand-forged bad filter
    type raises."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from cianparser_spark.corpus import imaging as I

    px = I.gen_pixels(42, 37, 23)
    for mode in ("none", "sub", "up", "average", "paeth", "adaptive"):
        assert np.array_equal(I.png_decode(I.png_encode(px, filter_mode=mode)), px)
        assert np.array_equal(
            I.png_decode(I.png_encode(px, filter_mode=mode, interlace=True)), px)
    for (h, w) in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 1), (1, 9)]:
        p2 = I.gen_pixels(h * 100 + w, w, h)
        for il in (False, True):
            b = I.png_encode(p2, filter_mode="adaptive", interlace=il)
            assert np.array_equal(I.png_decode(b), p2), (h, w, il)
    assert len(I.png_encode(px, filter_mode="adaptive")) < len(I.png_encode(px))
    # historical byte-pin: default == explicit filter-0 construction
    legacy = (I.PNG_SIG + I._chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 37, 23, 8, 2, 0, 0, 0)) + I._chunk(
        b"IDAT", zlib.compress(np.concatenate(
            [np.zeros((23, 1), np.uint8), px.reshape(23, 37 * 3)],
            axis=1).tobytes(), 6)) + I._chunk(b"IEND", b""))
    assert I.png_encode(px) == legacy
    # dispatch formats
    for fmt in ("pngf", "pngi"):
        assert np.array_equal(I.decode(I.encode(px, fmt), fmt), px)
        assert I.is_lossless(fmt)
    # forged filter type 7 on row 0 → loud failure
    raw = bytearray(np.concatenate(
        [np.zeros((23, 1), np.uint8), px.reshape(23, 37 * 3)], axis=1).tobytes())
    raw[0] = 7
    forged = (I.PNG_SIG + I._chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 37, 23, 8, 2, 0, 0, 0))
        + I._chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + I._chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        I.png_decode(forged)
