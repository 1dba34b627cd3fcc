"""Eval-set n-gram decontamination (operators/decontam.py)."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.decontam import (
    eval_ngram_contamination,
    eval_ngram_set,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_contamination_fractions(spark):
    # eval doc supplies the 2-grams of "a b c d" -> {"a b","b c","c d"}
    ev = _docs(spark, [("e1", "a b c d")])
    df = _docs(spark, [
        ("full", "a b c d"),        # 3/3 grams hit
        ("half", "a b x y"),        # 1/3 grams hit ("a b")
        ("none", "p q r s"),        # 0/3
        ("short", "a"),             # < n tokens -> 0 grams
        ("nulltext", None),
    ])
    out = {r["doc_id"]: r for r in
           eval_ngram_contamination(df, ev, "doc_id", "text",
                                    n=2, threshold=0.7).collect()}
    assert len(out) == 5
    assert out["full"]["n_ngrams"] == 3 and out["full"]["n_hit"] == 3
    assert out["full"]["contam_frac"] == 1.0 and out["full"]["contaminated"]
    assert out["half"]["n_hit"] == 1
    assert out["half"]["contam_frac"] == pytest.approx(0.333333)
    assert not out["half"]["contaminated"]
    assert out["none"]["n_hit"] == 0 and not out["none"]["contaminated"]
    # zero-gram docs survive the join-back with NULL frac, not-contaminated
    for d in ("short", "nulltext"):
        assert out[d]["n_ngrams"] == 0 and out[d]["n_hit"] == 0
        assert out[d]["contam_frac"] is None
        assert out[d]["contaminated"] is False


def test_positions_not_distinct(spark):
    # fraction is over gram POSITIONS (PaLM): a repeated contaminated
    # gram counts every occurrence
    ev = _docs(spark, [("e1", "a a a")])
    df = _docs(spark, [("d1", "a a a a b")])  # grams: aa,aa,aa,ab
    r = eval_ngram_contamination(df, ev, "doc_id", "text",
                                 n=2, threshold=0.7).collect()[0]
    assert r["n_ngrams"] == 4 and r["n_hit"] == 3
    assert r["contaminated"]


def test_tokenization_convention(spark):
    # lower + filtered whitespace split: case and newlines don't matter
    ev = _docs(spark, [("e1", "Hello  World\nAgain")])
    df = _docs(spark, [("d1", "hello world again")])
    r = eval_ngram_contamination(df, ev, "doc_id", "text",
                                 n=3, threshold=0.7).collect()[0]
    assert r["n_hit"] == 1 and r["contaminated"]


def test_eval_set_distinct(spark):
    ev = _docs(spark, [("e1", "a b a b"), ("e2", "a b")])
    assert eval_ngram_set(ev, "text", n=2).count() == 2  # "a b","b a"


def test_broadcast_plan_shape(spark):
    ev = _docs(spark, [("e1", "a b c")])
    df = _docs(spark, [("d1", "a b c d")])
    plan = eval_ngram_contamination(df, ev, "doc_id", "text", n=2)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s, s
    # membership join ships the 16-char surrogate, never the gram text
    assert "gk" in s


def test_partition_invariance(spark):
    rows = [(f"d{i}", " ".join(f"w{(i * 7 + j) % 11}" for j in range(12)))
            for i in range(40)]
    ev = _docs(spark, rows[:5])
    a = sorted(eval_ngram_contamination(
        _docs(spark, rows).repartition(1), ev, "doc_id", "text",
        n=4).collect())
    b = sorted(eval_ngram_contamination(
        _docs(spark, rows).repartition(13), ev, "doc_id", "text",
        n=4).collect())
    assert a == b
