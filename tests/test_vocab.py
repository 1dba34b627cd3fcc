"""Vocabulary operators (operators/vocab.py): semantics + plan shape.

Semantics are pinned against tiny hand-computed corpora; plan shape
pins the scale story — top_terms's k-selection must compile to
TakeOrderedAndProject (per-partition heaps, never a global sort) and
tfidf_keywords must stay one lazy plan (no eager count() action for
the corpus size N).
"""

import contextlib
import io
import math

from pyspark.sql import functions as F

from mehc_curation_spark.operators.vocab import (
    tfidf_keywords,
    tokens_col,
    top_terms,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_col_edges(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   WORLD "), (2, ""), (3, "   "), (4, None),
         (5, "a\tb\nc")],
        "doc_id long, text string")
    got = {r.doc_id: r.toks for r in
           df.select("doc_id", tokens_col(F.col("text")).alias("toks"))
             .collect()}
    assert got[1] == ["hello", "world"]
    assert got[2] == []
    assert got[3] == []          # whitespace-only trims to empty
    assert got[4] is None        # NULL text propagates (explode drops it)
    assert got[5] == ["a", "b", "c"]


def test_top_terms_counts_and_order(spark):
    d = _docs(spark, [(1, "a a b"), (2, "a c"), (3, "b b b"), (4, "c a")])
    rows = top_terms(d, "doc_id", "text", k=10).collect()
    got = [(r.term, r.doc_freq, r.tf_total) for r in rows]
    # a: df=3 tf=4; b: df=2 tf=4; c: df=2 tf=2 — full deterministic order
    assert got == [("a", 3, 4), ("b", 2, 4), ("c", 2, 2)]


def test_top_terms_k_truncates(spark):
    d = _docs(spark, [(1, "x y z"), (2, "x y"), (3, "x")])
    rows = top_terms(d, "doc_id", "text", k=2).collect()
    assert [r.term for r in rows] == ["x", "y"]


def test_top_terms_plan_is_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject — a global
    Sort over the vocabulary would be the wrong plan at 10^8 terms."""
    tree = _plan(top_terms(_docs(spark, [(1, "a b")]), k=5))
    assert "TakeOrderedAndProject" in tree
    assert "Sort " not in tree


def test_tfidf_scores_match_closed_form(spark):
    d = _docs(spark, [(1, "a a b"), (2, "a c")])
    rows = tfidf_keywords(d, "doc_id", "text", top_n=3).collect()
    got = {(r.doc_id, r.term): (r.score, r.rank) for r in rows}
    n = 2

    def s(tf, dlen, df_):
        return round((tf / dlen) * (math.log((n + 1) / (df_ + 1)) + 1), 6)

    # doc 1: a tf=2/3 df=2, b tf=1/3 df=1
    assert got[(1, "a")][0] == s(2, 3, 2)
    assert got[(1, "b")][0] == s(1, 3, 1)
    # doc 2: a tf=1/2 df=2, c tf=1/2 df=1 — c scores higher (rarer)
    assert got[(2, "c")] == (s(1, 2, 1), 1)
    assert got[(2, "a")] == (s(1, 2, 2), 2)


def test_tfidf_rank_tiebreak_by_term(spark):
    # two terms with identical tf and df -> identical score; rank must
    # break the tie alphabetically so top-n is deterministic
    d = _docs(spark, [(1, "m z"), (2, "m z")])
    rows = tfidf_keywords(d, "doc_id", "text", top_n=1).collect()
    assert {(r.doc_id, r.term) for r in rows} == {(1, "m"), (2, "m")}


def test_tfidf_is_one_lazy_plan(spark):
    """Building the frame must not run a count() job: N rides along as
    a broadcast 1-row aggregate inside the same plan."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = tfidf_keywords(_docs(spark, [(1, "a b")]), top_n=2)
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after
    assert "BroadcastNestedLoopJoin" in _plan(df) or \
           "BroadcastExchange" in _plan(df)
