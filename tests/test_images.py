"""Image codec + determinism invariants (BASELINE.json input_hint; SURVEY.md §5.6)."""

import numpy as np
import pytest

from od_database_spark.datagen import images as im


@pytest.mark.parametrize("image_id", ["img_0001", "img_abcd", "img_ffff"])
def test_row_deterministic(image_id):
    a = im.make_image_row(image_id)
    b = im.make_image_row(image_id)
    assert a["bytes"] == b["bytes"]
    assert a["caption"] == b["caption"]
    assert a["phash"] == b["phash"]
    assert a["w"] == b["w"] and a["h"] == b["h"]


def test_png_roundtrip_lossless():
    px = im.pixels_for("img_png_test", 48, 64)
    data = im.encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = im.decode_png(data)
    np.testing.assert_array_equal(px, out)


def test_bmp_roundtrip_lossless():
    px = im.pixels_for("img_bmp_test", 33, 17)  # odd width → row padding path
    data = im.encode_bmp(px)
    out = im.decode_bmp(data)
    np.testing.assert_array_equal(px, out)


def test_jpeg_standin_psnr():
    px = im.pixels_for("img_jpeg_test", 96, 96)
    data = im.encode_jpeg(px)
    out = im.decode_jpeg(data)
    assert out.shape == px.shape
    p = im.psnr(px, out)
    assert p >= 40.0, f"lossy PSNR {p:.1f} < 40 dB"


def test_all_formats_per_row_invariant():
    # input_hint: decoded-pixel allclose (exact for lossless, PSNR>=40 lossy)
    # + caption equality vs the reference generator.
    for i in range(20):
        image_id = f"img_{i:04x}"
        row = im.make_image_row(image_id)
        ref_px = im.pixels_for(image_id, row["w"], row["h"])
        got = im.decode(row["fmt"], row["bytes"])
        if row["fmt"] == "jpeg":
            assert im.psnr(ref_px, got) >= 40.0
        else:
            np.testing.assert_array_equal(ref_px, got)
        assert row["caption"] == im.caption_for(image_id)
        assert row["phash"] == im.phash64(got)


def test_image_id_no_collisions_at_1m(spark):
    """64-bit image ids (img_%016x of xxhash64): no collisions across 10^6
    distinct URLs — the regression test for the old 32-bit packing, which
    birthday-collides at this scale and silently shares pixels+captions."""
    from pyspark.sql import functions as F

    urls = spark.range(1_000_000).select(
        F.format_string("http://h%d.example/x/img%d.png",
                        F.pmod("id", F.lit(997)), F.col("id")).alias("u")
    )
    ids = urls.select(F.format_string("img_%016x", F.xxhash64("u")).alias("image_id"))
    assert ids.distinct().count() == 1_000_000


def test_phash_similar_vs_different():
    px = im.pixels_for("img_phash", 64, 64)
    h1 = im.phash64(px)
    # mild noise → small hamming distance
    noisy = np.clip(px.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    h2 = im.phash64(noisy)
    other = im.pixels_for("img_other", 64, 64)
    h3 = im.phash64(other)
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(h1, h2) <= 8
    assert ham(h1, h3) > ham(h1, h2)


def test_dims_in_declared_range():
    for i in range(50):
        w, h = im.dims_for(f"img_{i}")
        assert 32 <= w <= 128 and 32 <= h <= 128
        assert (w - 32) % 16 == 0 and (h - 32) % 16 == 0
