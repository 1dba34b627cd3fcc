"""Mergeable Misra-Gries heavy-hitters sketch: exact degradation,
error bounds, coverage guarantee, partition invariance."""

import random

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.sketch import (
    _mg_reduce, heavy_hitter_tokens, heavy_hitters_sketch, tokens_frame)


@pytest.fixture(scope="module")
def skewed_terms(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    weights = [60, 30, 30, 20] + [4] * 36
    rows = [(i, " ".join(rng.choices(vocab, weights=weights, k=25)))
            for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mg_reduce_budget_and_decrement():
    counts = {"a": 10, "b": 7, "c": 3, "d": 1}
    d = _mg_reduce(counts, 2)
    assert d == 3  # 3rd-largest value subtracted everywhere
    assert counts == {"a": 7, "b": 4}
    # within budget: untouched, zero decrement
    c2 = {"a": 5}
    assert _mg_reduce(c2, 2) == 0 and c2 == {"a": 5}


def test_exact_degradation_big_budget(spark, skewed_terms):
    hh = heavy_hitter_tokens(skewed_terms, "text",
                             num_counters=4096, top_k=None).toPandas()
    exact = dict(tokens_frame(skewed_terms, "text")
                 .groupBy("term").count().collect())
    assert (hh.err_bound == 0).all()
    assert dict(zip(hh.term, hh.est_count)) == exact
    assert (hh.max_count == hh.est_count).all()


@pytest.mark.parametrize("parts", [1, 4, 13])
def test_bounds_and_coverage_any_layout(spark, skewed_terms, parts):
    toks = tokens_frame(skewed_terms, "text").repartition(parts)
    sk = heavy_hitters_sketch(toks, "term", num_counters=6,
                              top_k=None).toPandas()
    exact = dict(tokens_frame(skewed_terms, "text")
                 .groupBy("term").count().collect())
    n = sum(exact.values())
    D = int(sk.err_bound.iloc[0])
    assert 0 < D <= n // 7  # decrements fired; hard bound holds
    rep = dict(zip(sk.term, sk.est_count))
    for t, est in rep.items():
        assert est <= exact.get(t, 0) <= est + D
    for t, c in exact.items():
        if c > D:
            assert t in rep
    # the skewed head is far above n/(m+1): guaranteed reported
    top = max(exact, key=exact.get)
    assert exact[top] > n // 7 and top in rep


def test_null_terms_ignored(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), ("y",), (None,)], "term string")
    hh = heavy_hitters_sketch(df, "term", num_counters=16,
                              top_k=None).toPandas()
    assert dict(zip(hh.term, hh.est_count)) == {"x": 2, "y": 1}


def test_top_k_order_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",), ("b",)], "term string")
    hh = heavy_hitters_sketch(df, "term", num_counters=16,
                              top_k=2).toPandas()
    # counts: a=2, b=2, c=1 -> ties break on term asc
    assert list(hh.term) == ["a", "b"]


def test_num_counters_validation(spark, skewed_terms):
    with pytest.raises(ValueError):
        heavy_hitters_sketch(skewed_terms.select(F.lit("t").alias("term")),
                             "term", num_counters=0)
