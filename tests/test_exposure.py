"""Exposure + watermark-band signals: kernels + Arrow-stage operator."""

import numpy as np

from mehc_curation_spark.operators.multimodal import image_exposure
from mehc_curation_spark.rules.imgquality import (
    exposure_metrics,
    watermark_strip_score,
)


def test_kernel_black_white_midgray():
    assert exposure_metrics(np.zeros((8, 8, 3), np.uint8)) == \
        (1.0, 0.0, 0.0, 0.0)
    assert exposure_metrics(np.full((8, 8, 3), 255, np.uint8)) == \
        (0.0, 1.0, 255.0, 0.0)
    lo, hi, mean, _ = exposure_metrics(np.full((8, 8, 3), 128, np.uint8))
    assert (lo, hi, mean) == (0.0, 0.0, 128.0)


def test_kernel_partial_clip_fraction():
    px = np.full((10, 10, 3), 128, np.uint8)
    px[:2] = 0  # 20% crushed
    lo, hi, *_ = exposure_metrics(px)
    assert (lo, hi) == (0.2, 0.0)


def test_watermark_ratio_separates_overlay():
    y, x = np.mgrid[0:40, 0:60]
    smooth = np.stack([y * 3, x * 2, y + x], axis=2).astype(np.uint8)
    _, clean_ratio = watermark_strip_score(smooth)
    wm = smooth.copy()
    wm[-5:] = np.random.RandomState(1).randint(
        0, 256, (5, 60, 3), dtype=np.uint8)
    _, wm_ratio = watermark_strip_score(wm)
    assert clean_ratio < 2.0 < wm_ratio
    # overlay anywhere BUT the bottom band does not trip the signal
    top = smooth.copy()
    top[:5] = np.random.RandomState(2).randint(
        0, 256, (5, 60, 3), dtype=np.uint8)
    _, top_ratio = watermark_strip_score(top)
    assert top_ratio < 2.0


def test_flat_image_ratio_is_bounded():
    flat = np.full((20, 20, 3), 50, np.uint8)
    dens, ratio = watermark_strip_score(flat)
    assert dens == 0.0 and ratio == 0.0


def test_operator_matches_kernels(spark):
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (30, 50, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("x", img.tobytes(), 50, 30, "raw"), ("bad", b"\x00", 9, 9, "png")],
        "image_id string, bytes binary, w int, h int, fmt string")
    got = {r["image_id"]: r for r in image_exposure(df).collect()}
    exp = exposure_metrics(img) + watermark_strip_score(img)
    g = got["x"]
    assert (g["clip_lo_frac"], g["clip_hi_frac"], g["mean_luma"],
            g["luma_contrast"], g["wm_edge_density"],
            g["wm_edge_ratio"]) == exp
    assert got["bad"]["decode_ok"] is False
    assert got["bad"]["wm_edge_ratio"] is None
