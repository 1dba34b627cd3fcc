"""Block-SSIM kernel (codecs/image.py:ssim) and the SSIM-extended
near-dup verify stage (operators/multimodal.py:verify_pairs_psnr)."""

import numpy as np
import pytest

from mehc_curation_spark.codecs.image import encode_image, psnr, ssim


def _img(seed, w=32, h=24):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestKernel:
    def test_identical_is_exactly_one(self):
        a = _img(1)
        assert ssim(a, a) == 1.0

    def test_noise_monotone(self):
        a = _img(2)
        rng = np.random.default_rng(3)
        small = np.clip(a.astype(int)
                        + rng.integers(-15, 16, a.shape), 0, 255)
        big = np.clip(a.astype(int)
                      + rng.integers(-70, 71, a.shape), 0, 255)
        s_small = ssim(a, small.astype(np.uint8))
        s_big = ssim(a, big.astype(np.uint8))
        assert 1.0 > s_small > s_big

    def test_structural_break_beats_pointwise(self):
        """A local overlay (watermark-like block) costs SSIM more than
        a global brightness shift of comparable PSNR — the property
        that makes SSIM worth carrying next to PSNR."""
        a = _img(4, w=48, h=48)
        shifted = np.clip(a.astype(int) + 8, 0, 255).astype(np.uint8)
        overlaid = a.copy()
        overlaid[16:32, 16:32] = 255  # hard structural break
        assert ssim(a, shifted) > ssim(a, overlaid)

    def test_small_image_window_clamped(self):
        a = _img(5, w=3, h=2)
        assert ssim(a, a) == 1.0

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            ssim(_img(6, w=8, h=8), _img(6, w=9, h=8))


class TestVerifyStage:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        imgs = {f"i{k}": _img(k) for k in range(3)}
        imgs["i0dup"] = imgs["i0"].copy()
        rows = [(n, encode_image(px, "png"), px.shape[1], px.shape[0], "png")
                for n, px in imgs.items()]
        payload = spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string")
        pairs = spark.createDataFrame(
            [("i0", "i0dup"), ("i0", "i1"), ("i1", "i2")],
            "id_a string, id_b string")
        return payload, pairs, imgs

    def test_ssim_column_matches_local(self, frames):
        from mehc_curation_spark.operators.multimodal import verify_pairs_psnr

        payload, pairs, imgs = frames
        got = {(r["id_a"], r["id_b"]): r
               for r in verify_pairs_psnr(payload, pairs,
                                          include_ssim=True).collect()}
        assert got[("i0", "i0dup")]["ssim"] == 1.0
        assert got[("i0", "i0dup")]["psnr_db"] == 99.0
        for a, b in (("i0", "i1"), ("i1", "i2")):
            exp = round(ssim(imgs[a], imgs[b]), 4)
            assert got[(a, b)]["ssim"] == exp
            assert got[(a, b)]["psnr_db"] == round(
                min(psnr(imgs[a], imgs[b]), 99.0), 4)

    def test_without_flag_schema_unchanged(self, frames):
        from mehc_curation_spark.operators.multimodal import verify_pairs_psnr

        payload, pairs, _ = frames
        cols = verify_pairs_psnr(payload, pairs).columns
        assert cols == ["id_a", "id_b", "decode_ok", "same_dims", "psnr_db"]

    def test_undecodable_side_yields_nulls(self, spark, frames):
        from mehc_curation_spark.operators.multimodal import verify_pairs_psnr

        payload, _, _ = frames
        broken = spark.createDataFrame(
            [("bad", b"XXnot-a-png", 32, 24, "png")],
            "image_id string, bytes binary, w int, h int, fmt string")
        pairs = spark.createDataFrame([("i0", "bad")],
                                      "id_a string, id_b string")
        r = verify_pairs_psnr(payload.unionByName(broken), pairs,
                              include_ssim=True).first()
        assert r["decode_ok"] is False
        assert r["psnr_db"] is None and r["ssim"] is None
