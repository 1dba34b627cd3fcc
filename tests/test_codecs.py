"""Codec round-trip, PSNR invariant, and phash properties."""

import numpy as np
import pytest

from mehc_curation_spark.codecs.image import (
    DecodeError,
    decode_image,
    encode_image,
    psnr,
)
from mehc_curation_spark.codecs.phash import phash64

RNG = np.random.default_rng(123)


def _images():
    out = []
    for (h, w) in [(16, 16), (17, 23), (64, 64), (33, 47), (16, 64)]:
        out.append(RNG.integers(0, 256, (h, w, 3), dtype=np.uint8))
    grad = np.tile((np.arange(64, dtype=np.uint16) * 4).astype(np.uint8), (64, 1))
    out.append(grad[:, :, None].repeat(3, 2))
    return out


@pytest.mark.parametrize("fmt", ["raw", "bmp", "png"])
def test_lossless_roundtrip(fmt):
    for px in _images():
        h, w = px.shape[:2]
        dec = decode_image(encode_image(px, fmt), fmt, w, h)
        assert np.array_equal(dec, px)


def test_jpegq_psnr_at_least_40db():
    """input_hint invariant: decoded pixels PSNR >= 40 dB for lossy fmt."""
    for px in _images():
        h, w = px.shape[:2]
        dec = decode_image(encode_image(px, "jpegq"), "jpegq", w, h)
        assert psnr(px, dec) >= 40.0


def test_jpegq_decode_deterministic():
    px = _images()[0]
    h, w = px.shape[:2]
    data = encode_image(px, "jpegq")
    a = decode_image(data, "jpegq", w, h)
    b = decode_image(data, "jpegq", w, h)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("fmt", ["raw", "bmp", "png", "jpegq"])
def test_corruption_raises(fmt):
    px = _images()[0]
    h, w = px.shape[:2]
    data = encode_image(px, fmt)
    with pytest.raises(DecodeError):
        decode_image(data[: len(data) // 3], fmt, w, h)
    if fmt != "raw":  # raw is a bare pixel dump — no magic to corrupt
        with pytest.raises(DecodeError):
            decode_image(b"XX" + data[2:], fmt, w, h)
    with pytest.raises(DecodeError):
        decode_image(data, fmt, w + 1, h)  # dim mismatch


def test_phash_stability_and_discrimination():
    imgs = _images()
    for px in imgs:
        assert phash64(px) == phash64(px.copy())
        assert -(2**63) <= phash64(px) < 2**63
    hashes = {phash64(px) for px in imgs}
    assert len(hashes) == len(imgs)  # distinct structures -> distinct hashes


def test_phash_of_stored_bytes_is_stable():
    """The pipeline's dedup identity is phash(decode(stored bytes)) —
    it must be deterministic per stored payload, for lossless and lossy
    formats alike. (pHash is intentionally NOT asserted robust to
    re-encoding of synthetic patterns: their low-frequency DCT
    coefficients sit near the median threshold.)"""
    for px in _images():
        h, w = px.shape[:2]
        for fmt in ["raw", "bmp", "png", "jpegq"]:
            data = encode_image(px, fmt)
            a = phash64(decode_image(data, fmt, w, h))
            b = phash64(decode_image(data, fmt, w, h))
            assert a == b


def test_spark_decode_matches_local_decode_end_to_end(spark, tmp_path):
    """input_hint invariant, end to end: pixels decoded THROUGH the
    Spark engine (parquet scan -> Arrow -> mapInPandas decode) must be
    identical to an in-process decode of the same rows — i.e. the
    engine's plumbing (parquet round-trip, Arrow binary transfer,
    batch slicing) never perturbs the payload. Bit-exactness is checked
    via per-image pixel md5; lossy-format fidelity vs the original
    pixels (PSNR >= 40 dB) is covered by test_jpegq_psnr_at_least_40db."""
    import hashlib

    import pandas as pd

    from mehc_curation_spark.codecs.image import DecodeError, decode_image
    from mehc_curation_spark.fixtures import make_pairs_pdf

    pdf = make_pairs_pdf(300, seed=21)
    path = str(tmp_path / "pairs.parquet")
    pdf.to_parquet(path)

    def md5s(batches):
        from mehc_curation_spark.codecs.image import (
            DecodeError as DE,
            decode_image as dec,
        )

        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    px = dec(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id,
                                 hashlib.md5(px.tobytes()).hexdigest()))
                except (DE, TypeError, ValueError):
                    rows.append((r.image_id, None))
            yield pd.DataFrame(rows, columns=["image_id", "px_md5"])

    got = {
        r["image_id"]: r["px_md5"]
        for r in spark.read.parquet(path)
        .mapInPandas(md5s, "image_id string, px_md5 string").collect()
    }
    assert len(got) == len(pdf)
    n_decodable = 0
    for r in pdf.itertuples(index=False):
        try:
            px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
            exp = hashlib.md5(px.tobytes()).hexdigest()
            n_decodable += 1
        except (DecodeError, TypeError, ValueError):
            exp = None
        assert got[r.image_id] == exp, r.image_id
    assert n_decodable > 250  # corpus is ~1% corrupted; most must decode


def test_fake_audio_codec_roundtrip(spark):
    """Default-on fake audio codec: int16 PCM roundtrip through the
    real mapInPandas plumbing; codec='real' is a clearly-marked
    NotImplementedError swap point (VERDICT r1 item 4)."""
    import numpy as np
    import pytest

    from mehc_curation_spark.operators.multimodal import (
        audio_features,
        fake_decode_audio,
    )

    pcm = np.array([0, 1000, -1000, 32767, -32768], dtype="<i2")
    assert (fake_decode_audio(pcm.tobytes()) == pcm).all()
    assert fake_decode_audio(None).size == 0
    # trailing odd byte ignored
    assert (fake_decode_audio(pcm.tobytes() + b"x") == pcm).all()

    df = spark.createDataFrame(
        [("c1", bytes(pcm.tobytes())), ("c2", b""), ("c3", None)],
        "clip_id string, bytes binary")
    got = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert got["c1"]["n_samples"] == 5
    exp_rms = round(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))), 4)
    assert got["c1"]["rms"] == exp_rms
    assert got["c2"]["n_samples"] == 0 and got["c2"]["rms"] == 0.0
    assert got["c3"]["n_samples"] == 0

    with pytest.raises(NotImplementedError):
        audio_features(df, codec="soundfile")


def test_fake_video_codec_frame_sampling(spark):
    import pytest

    from mehc_curation_spark.operators.multimodal import (
        FAKE_FRAME_BYTES,
        video_frame_sample,
    )

    payload = bytes(range(256)) * (FAKE_FRAME_BYTES * 25 // 256 + 1)
    payload = payload[:FAKE_FRAME_BYTES * 25 + 7]  # 25 frames + partial tail
    df = spark.createDataFrame([("v1", payload), ("v2", b"")],
                               "video_id string, bytes binary")
    rows = video_frame_sample(df, every_n=10).collect()
    got = {(r["video_id"], r["frame_idx"]): r["frame"] for r in rows}
    assert set(got) == {("v1", 0), ("v1", 10), ("v1", 20)}
    for (_, i), frame in got.items():
        assert bytes(frame) == payload[i * FAKE_FRAME_BYTES:(i + 1) * FAKE_FRAME_BYTES]

    with pytest.raises(NotImplementedError):
        video_frame_sample(df, codec="pyav")
