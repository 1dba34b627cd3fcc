"""Exact-substring (k-token window) dedup semantics."""

from mehc_curation_spark.operators.similarity import substring_dup_stats


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = substring_dup_stats(df, "doc_id", "text", k=k).collect()
    return {r["doc_id"]: (r["n_windows"], r["n_shared"],
                          r["dup_of_earlier"]) for r in got}


def test_shared_window_keep_first(spark):
    shared = "one two three four"
    rows = [
        (1, f"{shared} alpha beta"),     # earliest owner of the span
        (2, f"gamma {shared} delta"),    # shares it with doc 1 -> dup
        (3, "totally different words here now"),
    ]
    out = _run(spark, rows, k=4)
    # doc1: windows at offsets 0..2 -> 3; one of them shared
    assert out[1] == (3, 1, False)
    assert out[2] == (3, 1, True)
    assert out[3] == (2, 0, False)


def test_within_doc_repeat_not_shared(spark):
    rows = [(1, "a b c d a b c d"), (2, "x y z w q")]
    out = _run(spark, rows, k=4)
    # "a b c d" occurs twice in doc1 but in no other doc
    assert out[1][1] == 0 and not out[1][2]
    # distinct windows only: 5 raw positions, "a b c d" deduped
    assert out[1][0] == 4


def test_short_docs_zero_windows(spark):
    rows = [(1, "just three words"), (2, None), (3, "   ")]
    out = _run(spark, rows, k=4)
    assert out == {1: (0, 0, False), 2: (0, 0, False), 3: (0, 0, False)}


def test_case_and_whitespace_normalized(spark):
    rows = [(1, "The Quick  Brown\tFox jumps"),
            (2, "the quick brown fox sleeps")]
    out = _run(spark, rows, k=4)
    # normalized "the quick brown fox" window is shared
    assert out[1] == (2, 1, False)
    assert out[2] == (2, 1, True)
