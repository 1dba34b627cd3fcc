"""Property-based checks for the round-3 kernels — hypothesis drives
inputs the fixtures never produce (arbitrary chunk soups, pathological
count vectors, degenerate images)."""

import math
import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from mehc_curation_spark.codecs.image import encode_image, ssim
from mehc_curation_spark.operators.imgmeta import (
    _audit_one,
    strip_png_metadata_bytes,
)
from mehc_curation_spark.operators.sampling import dsir_weights


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


_ANCILLARY = [b"tEXt", b"zTXt", b"iTXt", b"tIME", b"eXIf",
              b"gAMA", b"tRNS", b"sRGB", b"sBIT", b"prVt"]

chunk_soup = st.lists(
    st.tuples(st.sampled_from(_ANCILLARY), st.binary(max_size=24)),
    max_size=6)


def _base_png(seed=0):
    rng = np.random.default_rng(seed)
    return encode_image(
        rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8), "png")


def _inject(data, chunks, trailing):
    idx = data.rindex(b"IEND") - 4
    mid = b"".join(_chunk(t, p) for t, p in chunks)
    return data[:idx] + mid + data[idx:] + trailing


@settings(max_examples=150, deadline=None)
@given(chunk_soup, st.binary(max_size=16))
def test_strip_idempotent_and_audit_clean(chunks, trailing):
    """For ANY soup of ancillary chunks + trailing junk: strip is
    idempotent, a stripped payload audits with zero removable bytes,
    and audit-clean <=> strip-identity (the contract the driver's
    scrub check leans on)."""
    png = _inject(_base_png(), chunks, trailing)
    once = strip_png_metadata_bytes(png)
    assert strip_png_metadata_bytes(once) == once
    audit = _audit_one(once, "png")
    assert audit[3] == 0  # meta_bytes: nothing left to remove
    # and symmetrically: the original audits clean IFF strip is a no-op
    assert (_audit_one(png, "png")[3] == 0) == (once == png)


@settings(max_examples=150, deadline=None)
@given(chunk_soup, st.binary(max_size=16))
def test_audit_meta_bytes_equals_bytes_removed(chunks, trailing):
    png = _inject(_base_png(1), chunks, trailing)
    audit = _audit_one(png, "png")
    assert audit[3] == len(png) - len(strip_png_metadata_bytes(png))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(0, 2 ** 32 - 1))
def test_ssim_symmetric_bounded_and_reflexive(sa, sb):
    ra, rb = np.random.default_rng(sa), np.random.default_rng(sb)
    a = ra.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    b = rb.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    s_ab, s_ba = ssim(a, b), ssim(b, a)
    assert s_ab == s_ba
    assert -1.0 <= s_ab <= 1.0
    assert ssim(a, a) == 1.0


counts = st.dictionaries(st.integers(0, 15), st.integers(0, 10_000),
                         max_size=16)


@settings(max_examples=200, deadline=None)
@given(counts, counts)
def test_dsir_weights_zero_when_distributions_equal(tc, rc):
    """Identical corpora -> every weight is exactly 0 (ln ratios
    cancel); and weights are anti-symmetric under swapping target and
    raw (round-half-even keeps |w_swap + w| <= 1 micro-nat)."""
    w_same = dsir_weights(tc, dict(tc), 16)
    assert w_same == [0] * 16
    w = dsir_weights(tc, rc, 16)
    w_swap = dsir_weights(rc, tc, 16)
    assert all(abs(a + b) <= 1 for a, b in zip(w, w_swap))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=10, max_size=10),
       st.lists(st.integers(0, 10_000), min_size=10, max_size=10))
def test_psi_contributions_nonnegative(nr, nn):
    """(p - q) * ln(p / q) >= 0 for every bucket, any count vectors —
    the add-one smoothing keeps p, q > 0 so the identity holds with
    no edge cases (mirrors the operator's arithmetic exactly)."""
    tr, tn = sum(nr) + 10, sum(nn) + 10
    for a, b in zip(nr, nn):
        p, q = (a + 1) / tr, (b + 1) / tn
        assert (p - q) * math.log(p / q) >= 0.0
