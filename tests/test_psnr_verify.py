"""Pixel-space PSNR verification of candidate near-dup pairs."""

import numpy as np

from mehc_curation_spark.codecs.image import encode_image, psnr
from mehc_curation_spark.codecs.resize import resize_bilinear
from mehc_curation_spark.operators.multimodal import verify_pairs_psnr


def _payloads(spark):
    rng = np.random.RandomState(21)
    base = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    noised = np.clip(base.astype(np.int64)
                     + rng.randint(-3, 4, base.shape), 0, 255) \
        .astype(np.uint8)
    # a SMOOTH image for the cross-resolution case: noise does not
    # survive a resolution round-trip, gradients do
    y, x = np.mgrid[0:40, 0:60]
    smooth = np.stack([y * 4, x * 3, (y + x) * 2], axis=2) \
        .astype(np.uint8)
    thumb = resize_bilinear(smooth, 20, 30)
    other = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    rows = [
        ("base", base.tobytes(), 60, 40, "raw"),
        ("same", base.tobytes(), 60, 40, "raw"),
        ("noised", encode_image(noised, "png"), 60, 40, "png"),
        ("smooth", smooth.tobytes(), 60, 40, "raw"),
        ("thumb", thumb.tobytes(), 30, 20, "raw"),
        ("other", other.tobytes(), 60, 40, "raw"),
        ("corrupt", b"\x00", 60, 40, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    return df, base, noised, smooth, thumb, other


def _verify(spark, pairs, **kw):
    df, *_ = _payloads(spark)
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string")
    return {(r["id_a"], r["id_b"]): r
            for r in verify_pairs_psnr(df, pdf, **kw).collect()}


def test_identical_pair_caps(spark):
    got = _verify(spark, [("base", "same")])
    r = got[("base", "same")]
    assert (r["decode_ok"], r["same_dims"], r["psnr_db"]) == \
        (True, True, 99.0)


def test_noised_pair_scores_kernel_exact(spark):
    df, base, noised, *_rest = _payloads(spark)
    got = _verify(spark, [("base", "noised")])
    r = got[("base", "noised")]
    assert r["psnr_db"] == round(min(psnr(base, noised), 99.0), 4)
    assert 30.0 < r["psnr_db"] < 99.0


def test_thumbnail_pair_resizes_then_verifies_high(spark):
    df, _b, _n, smooth, thumb, _o = _payloads(spark)
    got = _verify(spark, [("smooth", "thumb")])
    r = got[("smooth", "thumb")]
    assert r["same_dims"] is False
    up = resize_bilinear(thumb, 40, 60)
    assert r["psnr_db"] == round(min(psnr(smooth, up), 99.0), 4)
    # a 2x thumbnail of the same (smooth) image verifies high
    assert r["psnr_db"] > 25.0


def test_unrelated_pair_scores_low(spark):
    got = _verify(spark, [("base", "other")])
    assert got[("base", "other")]["psnr_db"] < 12.0


def test_undecodable_side_flags(spark):
    got = _verify(spark, [("base", "corrupt")])
    r = got[("base", "corrupt")]
    assert r["decode_ok"] is False and r["psnr_db"] is None
