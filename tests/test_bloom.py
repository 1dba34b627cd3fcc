"""Bloom prefilter (operators/bloom.py): no-false-negative guarantee,
NULL-key semantics, bounded false positives, and the narrow-plan shape
that makes it the 100 TB candidate-side prefilter."""

import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from mehc_curation_spark.operators.bloom import (
    bloom_build,
    bloom_member_col,
    bloom_prefilter,
)


def _docs(spark, keys, id_start=0):
    return spark.createDataFrame(
        [(id_start + i, k) for i, k in enumerate(keys)],
        "doc_id long, k string")


def test_no_false_negatives(spark):
    ref = _docs(spark, [f"ref{i}" for i in range(200)])
    overlap = [f"ref{i}" for i in range(0, 200, 7)]
    cand = _docs(spark, overlap + [f"cand{i}" for i in range(50)], 1000)
    got = {r.k for r in bloom_prefilter(cand, ref, "k").collect()}
    assert set(overlap) <= got  # every true member survives — always


def test_false_positive_rate_bounded(spark):
    ref = _docs(spark, [f"ref{i}" for i in range(300)])
    cand = _docs(spark, [f"other{i}" for i in range(2000)], 1000)
    n_fp = bloom_prefilter(cand, ref, "k", n_bits=1 << 16).count()
    # k=5, n=300, m=65536 -> theoretical fpp ~ 5e-9; allow huge slack
    assert n_fp <= 20


def test_null_keys(spark):
    ref = _docs(spark, ["a", "b"])
    cand = spark.createDataFrame([(1, "a"), (2, None), (3, "zz")],
                                 "doc_id long, k string")
    got = {r.doc_id for r in bloom_prefilter(cand, ref, "k").collect()}
    assert 1 in got and 2 not in got  # NULL key matches nothing
    # member col is NULL (not False) for NULL keys
    m = cand.select(
        "doc_id",
        bloom_member_col(F.col("k"), bloom_build(ref, "k")).alias("m"))
    vals = {r.doc_id: r.m for r in m.collect()}
    assert vals[2] is None


def test_bitmap_shape_and_bits_set(spark):
    ref = _docs(spark, ["x"])
    bm = bloom_build(ref, "k", n_bits=1 << 12, n_hashes=5)
    assert bm.shape == (1 << 12 >> 6,) and bm.dtype == np.uint64
    n_set = int(np.unpackbits(bm.view(np.uint8)).sum())
    assert 1 <= n_set <= 5  # <=5 positions for one key (mod collisions)


def test_candidate_side_is_narrow(spark):
    """The probe must be a map-only filter: no Exchange, no Join in
    the candidate plan — that IS the operator's scale claim."""
    ref = _docs(spark, ["a", "b"])
    cand = _docs(spark, ["a", "c", "d"], 100)
    out = bloom_prefilter(cand, ref, "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    tree = buf.getvalue()
    assert "Exchange" not in tree, tree
    assert "Join" not in tree, tree
