"""Border-crop payload transform."""

import numpy as np

from mehc_curation_spark.codecs.image import decode_image, encode_image
from mehc_curation_spark.operators.multimodal import crop_borders


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")


def test_letterbox_cropped_exactly(spark):
    rng = np.random.RandomState(2)
    inner = rng.randint(60, 200, (30, 60, 3), dtype=np.uint8)
    img = np.zeros((40, 60, 3), np.uint8)
    img[5:35] = inner  # 5px top bar, 5px bottom bar
    out = crop_borders(_df(spark, [("x", img.tobytes(), 60, 40, "raw")])) \
        .collect()[0]
    assert (out["cropped"], out["w"], out["h"]) == (True, 60, 30)
    assert (out["crop_top"], out["crop_bottom"],
            out["crop_left"], out["crop_right"]) == (5, 5, 0, 0)
    got_px = decode_image(bytes(out["bytes"]), "raw", 60, 30)
    assert (got_px == inner).all()


def test_borderless_passthrough_byte_identical(spark):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    data = encode_image(img, "png")
    out = crop_borders(_df(spark, [("x", data, 60, 40, "png")])).collect()[0]
    assert out["cropped"] is False and bytes(out["bytes"]) == data
    assert (out["crop_top"], out["crop_bottom"],
            out["crop_left"], out["crop_right"]) == (0, 0, 0, 0)


def test_flat_image_refuses_crop(spark):
    img = np.full((40, 60, 3), 7, np.uint8)
    out = crop_borders(_df(spark, [("x", img.tobytes(), 60, 40, "raw")])) \
        .collect()[0]
    assert out["cropped"] is False and (out["w"], out["h"]) == (60, 40)
    assert bytes(out["bytes"]) == img.tobytes()


def test_min_keep_frac_refuses_thin_sliver(spark):
    rng = np.random.RandomState(4)
    img = np.zeros((40, 60, 3), np.uint8)
    img[18:22] = rng.randint(60, 200, (4, 60, 3), dtype=np.uint8)
    # surviving 4/40 rows = 10% < default 25% -> refuse
    out = crop_borders(_df(spark, [("x", img.tobytes(), 60, 40, "raw")])) \
        .collect()[0]
    assert out["cropped"] is False
    assert out["crop_top"] == 18 and out["crop_bottom"] == 18
    # opt in to aggressive cropping
    out2 = crop_borders(_df(spark, [("x", img.tobytes(), 60, 40, "raw")]),
                        min_keep_frac=0.05).collect()[0]
    assert out2["cropped"] is True and out2["h"] == 4


def test_undecodable_sentinel(spark):
    out = crop_borders(_df(spark, [("x", b"\x01", 60, 40, "png")])) \
        .collect()[0]
    assert out["decode_ok"] is False and out["bytes"] is None
    assert out["crop_top"] is None


def test_pillarbox_all_sides(spark):
    rng = np.random.RandomState(5)
    img = np.full((40, 60, 3), 255, np.uint8)
    img[3:37, 7:50] = rng.randint(0, 200, (34, 43, 3), dtype=np.uint8)
    out = crop_borders(_df(spark, [("x", img.tobytes(), 60, 40, "raw")])) \
        .collect()[0]
    assert (out["crop_top"], out["crop_bottom"],
            out["crop_left"], out["crop_right"]) == (3, 3, 7, 10)
    assert (out["w"], out["h"]) == (43, 34)
