"""Source/domain reputation: dup attribution and flagging semantics."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.text_stats import source_reputation


def test_dup_attribution_and_flagging(spark):
    uniq = "alpha beta gamma delta epsilon zeta"
    rows = [
        # clean source: unique, non-repetitive docs
        (1, "clean", uniq + " one"),
        (2, "clean", uniq + " two"),
        # spam source: re-publishes doc 1 verbatim (modulo case/ws)
        # and emits highly repetitive text
        (3, "spam", "  ALPHA beta   gamma DELTA epsilon zeta one "),
        (4, "spam", "buy buy buy buy buy buy buy buy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           source_reputation(df, max_dup_rate=0.4, max_rep=0.4).collect()}
    # the RE-publisher carries the dup, not the original
    assert out["clean"]["exact_dup_rate"] == 0.0
    assert out["spam"]["exact_dup_rate"] == 0.5
    assert not out["clean"]["flagged"]
    assert out["spam"]["flagged"]
    assert out["clean"]["n_docs"] == 2 and out["spam"]["n_docs"] == 2


def test_salt_does_not_change_values(spark):
    rows = [(i, f"src{i % 3}", f"tok{i} " * (i % 5 + 1)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = source_reputation(df, salt=1).orderBy("source").collect()
    b = source_reputation(df, salt=16).orderBy("source").collect()
    assert a == b


def test_empty_text_rows_counted_not_averaged(spark):
    rows = [(1, "s", "   "), (2, "s", "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = source_reputation(df).collect()[0]
    # blank doc contributes 0 tokens to the mean but no dup_word_frac
    assert r["n_docs"] == 2
    assert r["avg_tokens"] == 1.5
    assert r["avg_dup_word_frac"] == 0.0
