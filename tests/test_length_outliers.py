"""Robust per-group length-outlier detection (median + MAD)."""

from mehc_curation_spark.operators.text_stats import length_outliers


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = length_outliers(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_flags_extreme_length(spark):
    rows = [(i, "x" * n, "en") for i, n in
            enumerate([100, 102, 98, 101, 99, 103, 97, 100, 5000])]
    got = _run(spark, rows)
    assert got[8]["is_outlier"] is True and got[8]["robust_z"] > 3.5
    assert all(got[i]["is_outlier"] is False for i in range(8))
    assert got[0]["med_len"] == 100.0  # 9 values, exact middle


def test_even_count_median_interpolates(spark):
    # 4 values: median = (10+20)/2 — must match DuckDB quantile_cont
    rows = [(1, "x" * 5, "en"), (2, "x" * 10, "en"),
            (3, "x" * 20, "en"), (4, "x" * 25, "en")]
    got = _run(spark, rows)
    assert got[1]["med_len"] == 15.0


def test_mad_zero_group_never_flags(spark):
    rows = [(i, "y" * 50, "fr") for i in range(5)]
    got = _run(spark, rows)
    assert all(r["mad_len"] == 0.0 and r["robust_z"] is None
               and r["is_outlier"] is False for r in got.values())


def test_groups_are_independent(spark):
    rows = ([(i, "a" * 10, "en") for i in range(6)]
            + [(100 + i, "b" * 1000, "de") for i in range(6)]
            + [(200, "a" * 1000, "en")])  # outlier in en, normal in de
    got = _run(spark, rows)
    assert got[200]["is_outlier"] is True
    assert all(got[100 + i]["is_outlier"] is False for i in range(6))


def test_null_text_and_group_excluded(spark):
    rows = [(1, None, "en"), (2, "abc", None), (3, "abcd", "en"),
            (4, "ab", "en")]
    got = _run(spark, rows)
    assert sorted(got) == [3, 4]


def test_partition_invariant(spark):
    rows = [(i, "z" * (50 + (i % 11)), "en") for i in range(40)] \
        + [(99, "z" * 4000, "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted((r["doc_id"], r["robust_z"], r["is_outlier"])
               for r in length_outliers(df.repartition(1)).collect())
    b = sorted((r["doc_id"], r["robust_z"], r["is_outlier"])
               for r in length_outliers(df.repartition(9)).collect())
    assert a == b
