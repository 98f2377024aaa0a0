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
