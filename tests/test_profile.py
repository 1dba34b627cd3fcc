"""Unit tests for the one-pass column profiler (operators/profile.py)."""

from mehc_curation_spark.operators.profile import profile_columns


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_profile_counts_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (10, "b"), (10, "aa")],
        "id long, s string")
    p = _by_col(profile_columns(df))
    assert p["id"]["n_rows"] == 4 and p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    # native-typed ordering: numeric max is 10, not lexicographic '2'
    assert p["id"]["min_val"] == "1" and p["id"]["max_val"] == "10"
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["s"]["avg_len"] == round((2 + 1 + 2) / 3, 6)


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    p = _by_col(profile_columns(df))
    assert p["x"]["n_nulls"] == 2 and p["x"]["n_distinct"] == 0
    assert p["x"]["min_val"] is None and p["x"]["avg_len"] is None


def test_profile_approx_path_runs(spark):
    df = spark.range(100).withColumnRenamed("id", "v")
    p = _by_col(profile_columns(df, exact_distinct=False))
    # HLL++ estimate on 100 small ints is exact-ish; allow slack
    assert abs(p["v"]["n_distinct"] - 100) <= 5


def test_profile_single_scan_plan(spark):
    df = spark.range(10).selectExpr("id", "cast(id as string) s")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1  # one scan feeds the whole profile
