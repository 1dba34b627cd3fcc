"""Image quality gate: kernel behavior on constructed images and
distributed == local parity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.codecs.image import encode_image
from mehc_curation_spark.operators.multimodal import (
    image_quality,
    image_quality_gate,
    quality_metrics,
)


def _img(px, image_id, fmt="png"):
    return {"image_id": image_id, "bytes": encode_image(px, fmt),
            "w": px.shape[1], "h": px.shape[0], "fmt": fmt,
            "caption": "c", "phash": 0}


def _flat(h=64, w=64, val=128):
    return np.full((h, w, 3), val, dtype=np.uint8)


def _noise(h=64, w=64, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)


def _gradient(h=64, w=64):
    # smooth horizontal ramp: plenty of entropy, near-zero Laplacian
    row = np.linspace(0, 255, w)
    px = np.repeat(row[None, :], h, axis=0)
    return np.stack([px, px, px], axis=2).round().astype(np.uint8)


def test_kernel_flat_image():
    min_dim, aspect, blur_var, entropy, flat_frac = quality_metrics(_flat())
    assert (min_dim, aspect) == (64, 1.0)
    assert blur_var == 0.0 and entropy == 0.0 and flat_frac == 1.0


def test_kernel_noise_vs_gradient():
    n = quality_metrics(_noise())
    g = quality_metrics(_gradient())
    assert n[2] > 1000 > 1 > g[2]          # Laplacian variance separates
    assert n[3] > 7 and g[3] > 5           # both have entropy
    assert n[4] < 0.05 and g[4] < 0.05     # neither is flat


def test_kernel_aspect_and_tiny():
    wide = quality_metrics(_noise(h=16, w=128))
    assert wide[0] == 16 and wide[1] == 8.0
    tiny = quality_metrics(_noise(h=2, w=2))
    assert tiny[0] == 2 and tiny[2] == 0.0  # <3px: blur undefined -> 0


@pytest.fixture(scope="module")
def gate_corpus():
    rows = [
        _img(_noise(), "good"),
        _img(_flat(), "flat"),
        _img(_gradient(), "smooth"),
        _img(_noise(h=8, w=8), "tiny"),
        _img(_noise(h=16, w=128), "banner"),
    ]
    bad = dict(rows[0])
    bad.update(image_id="corrupt", bytes=b"\x00\x01", fmt="png")
    rows.append(bad)
    return pd.DataFrame(rows)


def test_gate_reasons(spark, gate_corpus):
    df = spark.createDataFrame(gate_corpus)
    out = {r["image_id"]: r for r in
           image_quality_gate(df, min_dim=12, max_aspect=4.0,
                              min_blur_var=10.0, min_entropy=2.0,
                              max_flat_frac=0.9).collect()}
    assert out["good"]["keep"] and out["good"]["drop_reason"] is None
    # flat image: blur_var 0 fires before entropy/flat (first failing wins)
    assert out["flat"]["drop_reason"] == "img_blurry"
    assert out["smooth"]["drop_reason"] == "img_blurry"
    assert out["tiny"]["drop_reason"] == "img_too_small"
    assert out["banner"]["drop_reason"] == "img_extreme_aspect"
    assert out["corrupt"]["drop_reason"] == "img_undecodable"
    assert not out["corrupt"]["keep"]


def test_gate_flat_and_entropy_reasons_reachable(spark, gate_corpus):
    df = spark.createDataFrame(gate_corpus)
    # blur bound relaxed -> the flat image reaches the entropy gate
    out = {r["image_id"]: r["drop_reason"] for r in
           image_quality_gate(df, min_dim=1, max_aspect=100.0,
                              min_blur_var=0.0, min_entropy=2.0,
                              max_flat_frac=0.9).collect()}
    assert out["flat"] == "img_low_entropy"
    # entropy bound relaxed too -> the flat gate itself fires
    out = {r["image_id"]: r["drop_reason"] for r in
           image_quality_gate(df, min_dim=1, max_aspect=100.0,
                              min_blur_var=0.0, min_entropy=-1.0,
                              max_flat_frac=0.9).collect()}
    assert out["flat"] == "img_flat"


def test_distributed_matches_local(spark, pairs_df, pairs_pdf):
    from mehc_curation_spark.codecs.image import DecodeError, decode_image

    got = (image_quality(pairs_df.limit(0).unionByName(pairs_df)
                         .repartition(7)).toPandas()
           .sort_values("image_id").reset_index(drop=True))
    pdf = pairs_pdf.sort_values("image_id").reset_index(drop=True)
    for g, r in zip(got.itertuples(index=False),
                    pdf.itertuples(index=False)):
        try:
            px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
            exp = (True,) + quality_metrics(px)
        except (DecodeError, TypeError, ValueError):
            exp = (False, None, None, None, None, None)
        gv = (g.decode_ok,
              None if pd.isna(g.min_dim) else int(g.min_dim),
              *(None if pd.isna(v) else v
                for v in (g.aspect, g.blur_var, g.entropy, g.flat_frac)))
        assert gv == exp, g.image_id


def test_border_metrics_sides_independent():
    import numpy as np

    from mehc_curation_spark.rules.imgquality import border_metrics

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (50, 50, 3), dtype=np.uint8)
    img[:4] = 0      # black top bar
    img[:, -6:] = 0  # black right bar (same frame color at the corner:
                     # a row crossing a different-colored pillar is not
                     # uniform, so mixed-color corners break that side)
    t, b, l, r, frac = border_metrics(img)
    assert (t, b, l, r) == (4, 0, 0, 6)
    assert frac == round(1.0 - (46 * 44) / 2500.0, 4)


def test_border_metrics_low_contrast_interior_not_border():
    import numpy as np

    from mehc_curation_spark.rules.imgquality import border_metrics

    # gradient rows: each row is flat (span 0) but means drift beyond
    # tol, so only the first rows within tol of the edge anchor count
    img = np.repeat(np.arange(0, 200, 4, dtype=np.uint8)[:, None, None],
                    repeats=30, axis=1)
    img = np.repeat(img, 3, axis=2)
    t, b, l, r, frac = border_metrics(img, tol=8)
    assert t == 3   # rows 0,4,8 within tol=8 of anchor 0; row 12 not
    assert l == 0 and r == 0


def test_image_borders_operator_decode_failure(spark):
    from mehc_curation_spark.operators.multimodal import image_borders

    df = spark.createDataFrame(
        [("bad", b"\x00\x01", 10, 10, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = image_borders(df).first()
    assert r["decode_ok"] is False and r["border_top"] is None
