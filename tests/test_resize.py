"""Resize transform: deterministic bilinear kernel + the Arrow-stage
operator (decode -> resample -> re-encode, unchanged fast path,
undecodable sentinel)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.codecs.image import decode_image, encode_image, psnr
from mehc_curation_spark.codecs.resize import fit_dims, resize_bilinear
from mehc_curation_spark.operators.multimodal import resize_images


# ---------------------------------------------------------------- kernel

def test_fit_dims_longest_downscale():
    assert fit_dims(60, 40, 30) == (30, 20, True)
    assert fit_dims(40, 60, 30) == (20, 30, True)
    # already within bound: untouched, no upscale by default
    assert fit_dims(12, 10, 30) == (12, 10, False)
    # exactly at bound
    assert fit_dims(30, 20, 30) == (30, 20, False)


def test_fit_dims_modes_and_upscale():
    assert fit_dims(12, 10, 30, upscale=True) == (30, 25, True)
    assert fit_dims(60, 40, 30, mode="shortest") == (45, 30, True)
    assert fit_dims(60, 40, 16, mode="exact") == (16, 16, True)
    assert fit_dims(16, 16, 16, mode="exact") == (16, 16, False)
    with pytest.raises(ValueError):
        fit_dims(60, 40, 30, mode="nope")
    with pytest.raises(ValueError):
        fit_dims(0, 40, 30)


def test_fit_dims_never_zero():
    # extreme aspect: the short side must clamp to >= 1
    assert fit_dims(1000, 2, 10) == (10, 1, True)


def test_resize_constant_image_stays_constant():
    px = np.full((40, 60, 3), 137, np.uint8)
    out = resize_bilinear(px, 20, 30)
    assert out.shape == (20, 30, 3)
    assert (out == 137).all()


def test_resize_identity_dims_is_noop():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    out = resize_bilinear(px, 17, 23)
    assert (out == px).all()


def test_resize_preserves_mean_roughly():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    out = resize_bilinear(px, 32, 32)
    assert abs(float(out.mean()) - float(px.mean())) < 3.0


def test_resize_deterministic():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (31, 47, 3), dtype=np.uint8)
    a = resize_bilinear(px, 13, 19)
    b = resize_bilinear(px.copy(), 13, 19)
    assert (a == b).all() and a.tobytes() == b.tobytes()


def test_downscale_then_upscale_recognizable():
    # smooth gradient survives a 2x round trip at high PSNR
    y, x = np.mgrid[0:64, 0:64]
    px = np.stack([y * 4, x * 4, (y + x) * 2], axis=2).astype(np.uint8)
    down = resize_bilinear(px, 32, 32)
    up = resize_bilinear(down, 64, 64)
    assert psnr(px, up) > 30.0


# -------------------------------------------------------------- operator

def _planted_df(spark):
    rng = np.random.RandomState(11)
    big = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    small = rng.randint(0, 256, (10, 12, 3), dtype=np.uint8)
    rows = [
        ("big_raw", big.tobytes(), 60, 40, "raw"),
        ("big_png", encode_image(big, "png"), 60, 40, "png"),
        ("small", small.tobytes(), 12, 10, "raw"),
        ("corrupt", b"\x00\x01", 60, 40, "png"),
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"), big, small


def test_resize_images_operator(spark):
    df, big, small = _planted_df(spark)
    out = {r["image_id"]: r for r in
           resize_images(df, target=30).collect()}

    r = out["big_raw"]
    assert (r["decode_ok"], r["resized"], r["w"], r["h"], r["fmt"]) == \
        (True, True, 30, 20, "raw")
    exp = resize_bilinear(big, 20, 30)
    assert bytes(r["bytes"]) == encode_image(exp, "raw")

    # png round-trips losslessly, so the resized pixels match exactly
    rp = out["big_png"]
    assert (rp["w"], rp["h"], rp["fmt"]) == (30, 20, "png")
    assert (decode_image(bytes(rp["bytes"]), "png", 30, 20) == exp).all()

    # unchanged fast path is byte-identical
    s = out["small"]
    assert (s["decode_ok"], s["resized"]) == (True, False)
    assert bytes(s["bytes"]) == small.tobytes()

    # undecodable sentinel
    c = out["corrupt"]
    assert c["decode_ok"] is False and c["bytes"] is None
    assert c["w"] is None and c["resized"] is None


def test_resize_images_fmt_conversion(spark):
    df, big, _small = _planted_df(spark)
    out = {r["image_id"]: r for r in
           resize_images(df, target=30, out_fmt="png").collect()}
    # raw input re-encoded as png at the new size
    exp = resize_bilinear(big, 20, 30)
    assert bytes(out["big_raw"]["bytes"]) == encode_image(exp, "png")
    # unchanged dims but fmt conversion requested -> still re-encodes
    s = out["small"]
    assert s["fmt"] == "png" and s["resized"] is False
    assert bytes(s["bytes"]).startswith(b"\x89PNG")


def test_resize_validate_off_skips_decode_on_unchanged(spark):
    # a corrupt-but-small payload passes through when validate=False
    rows = [("tiny_corrupt", b"\x00\x01", 4, 4, "png")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    on = resize_images(df, target=30).collect()[0]
    off = resize_images(df, target=30, validate=False).collect()[0]
    assert on["decode_ok"] is False and on["bytes"] is None
    assert off["decode_ok"] is True and bytes(off["bytes"]) == b"\x00\x01"


def test_resize_config_errors_raise_on_driver(spark):
    """A config typo must raise at operator construction, not silently
    null every payload through the per-row decode guard (regression:
    out_fmt='jpeg' used to produce a '100% undecodable' run)."""
    df, _b, _s = _planted_df(spark)
    with pytest.raises(ValueError, match="out_fmt"):
        resize_images(df, target=30, out_fmt="jpeg")
    with pytest.raises(ValueError, match="mode"):
        resize_images(df, target=30, mode="longset")
    with pytest.raises(ValueError, match="target"):
        resize_images(df, target=0)
    with pytest.raises(ValueError, match="passthrough"):
        resize_images(df, target=30, passthrough_cols=("bytes",))
    with pytest.raises(ValueError, match="passthrough"):
        resize_images(df, target=30, passthrough_cols=("caption",))


def test_resize_passthrough_and_inline_phash(spark):
    """passthrough columns ride through the Arrow stage (no join) and
    with_phash hashes the OUTPUT pixels inline."""
    from mehc_curation_spark.codecs.phash import phash64

    df, big, small = _planted_df(spark)
    df = df.withColumn("caption", F.concat(F.lit("cap-"), "image_id"))
    out = {r["image_id"]: r for r in
           resize_images(df, target=30, passthrough_cols=("caption",),
                         with_phash=True).collect()}
    assert out["big_raw"]["caption"] == "cap-big_raw"
    exp = resize_bilinear(big, 20, 30)
    assert out["big_raw"]["phash_computed"] == phash64(exp)
    # unchanged row: hash of the ORIGINAL pixels (decode forced)
    assert out["small"]["phash_computed"] == phash64(small)
    # undecodable: hash nulled by the Catalyst mask, caption survives
    assert out["corrupt"]["phash_computed"] is None
    assert out["corrupt"]["caption"] == "cap-corrupt"


def test_resize_partition_invariant(spark):
    df, _big, _small = _planted_df(spark)
    a = {r["image_id"]: bytes(r["bytes"]) if r["bytes"] is not None else None
         for r in resize_images(df.repartition(1), target=30).collect()}
    b = {r["image_id"]: bytes(r["bytes"]) if r["bytes"] is not None else None
         for r in resize_images(df.repartition(7), target=30).collect()}
    assert a == b


def test_resize_rehash_invariance(spark):
    """hash_invariance='dihedral' on --rehash: a mirrored copy of the
    same source resizes to a mirrored image whose canonical hash
    EQUALS the original's (both orbits coincide after the symmetric
    bilinear resample of exact mirror inputs encoded losslessly);
    plain rehash of the two differs. Bad invariance name raises at
    construction."""
    from mehc_curation_spark.codecs.phash import phash64_dihedral

    rng = np.random.RandomState(13)
    big = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    rows = [("orig", encode_image(big, "png"), 60, 40, "png"),
            ("mirror", encode_image(big[:, ::-1].copy(), "png"),
             60, 40, "png")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r["image_id"]: r["phash_computed"] for r in
           resize_images(df, target=30, with_phash=True,
                         hash_invariance="dihedral").collect()}
    assert out["orig"] == out["mirror"] is not None
    # value is the codec function of the resized pixels
    exp = resize_bilinear(big, 20, 30)
    assert out["orig"] == phash64_dihedral(exp)
    plain = {r["image_id"]: r["phash_computed"] for r in
             resize_images(df, target=30, with_phash=True).collect()}
    assert plain["orig"] != plain["mirror"]
    with pytest.raises(ValueError):
        resize_images(df, hash_invariance="nope")
