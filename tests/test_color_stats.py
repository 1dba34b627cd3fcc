"""Color statistics: Hasler–Süsstrunk colorfulness, saturation, and
grayscale detection — kernel + Arrow-stage operator."""

import numpy as np

from mehc_curation_spark.codecs.image import encode_image
from mehc_curation_spark.operators.multimodal import image_color_stats
from mehc_curation_spark.rules.imgquality import color_metrics


def test_kernel_grayscale_is_zero():
    gray = np.tile(np.arange(40, dtype=np.uint8).reshape(40, 1, 1),
                   (1, 30, 3))
    cf, sat, spread = color_metrics(gray)
    assert (cf, sat, spread) == (0.0, 0.0, 0)


def test_kernel_saturated_stripes():
    px = np.zeros((40, 30, 3), np.uint8)
    px[:, :15, 0] = 255
    px[:, 15:, 2] = 255
    cf, sat, spread = color_metrics(px)
    assert sat == 1.0 and spread == 255
    # analytic: rg = ±255/0 halves, yb = ±127.5/−255... just bound it
    assert cf > 200.0


def test_kernel_black_image_saturation_zero():
    px = np.zeros((8, 8, 3), np.uint8)
    cf, sat, spread = color_metrics(px)
    assert (cf, sat, spread) == (0.0, 0.0, 0)


def test_kernel_deterministic_and_rounded():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (33, 41, 3), dtype=np.uint8)
    a = color_metrics(px)
    b = color_metrics(px.copy())
    assert a == b
    assert a[0] == round(a[0], 4) and a[1] == round(a[1], 4)


def test_operator_matches_kernel_and_flags(spark):
    rng = np.random.RandomState(13)
    noise = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    gray = np.tile(np.arange(40, dtype=np.uint8).reshape(40, 1, 1),
                   (1, 60, 3))
    near_gray = gray.copy()
    near_gray[0, 0, 0] += 2  # spread 2 -> within default tol
    rows = [
        ("noise", encode_image(noise, "png"), 60, 40, "png"),
        ("gray", gray.tobytes(), 60, 40, "raw"),
        ("near_gray", near_gray.tobytes(), 60, 40, "raw"),
        ("corrupt", b"\x00", 60, 40, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    got = {r["image_id"]: r for r in image_color_stats(df).collect()}

    exp = color_metrics(noise)
    n = got["noise"]
    assert (n["colorfulness"], n["sat_mean"], n["max_chan_spread"]) == exp
    assert n["is_grayscale"] is False

    assert got["gray"]["is_grayscale"] is True
    assert got["near_gray"]["is_grayscale"] is True

    c = got["corrupt"]
    assert c["decode_ok"] is False and c["colorfulness"] is None
    assert c["is_grayscale"] is None


def test_operator_gray_tol_replans(spark):
    gray = np.tile(np.arange(20, dtype=np.uint8).reshape(20, 1, 1),
                   (1, 20, 3))
    tinted = gray.copy()
    tinted[:, :, 0] = np.minimum(tinted[:, :, 0].astype(np.int64) + 5,
                                 255).astype(np.uint8)
    df = spark.createDataFrame(
        [("t", tinted.tobytes(), 20, 20, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    strict = image_color_stats(df, gray_tol=2).collect()[0]
    loose = image_color_stats(df, gray_tol=8).collect()[0]
    assert strict["is_grayscale"] is False
    assert loose["is_grayscale"] is True
