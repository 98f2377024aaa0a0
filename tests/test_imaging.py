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
