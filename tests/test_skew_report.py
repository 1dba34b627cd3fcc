"""Hot-key shuffle diagnostics (key_skew_report)."""

import math

import pytest

from mehc_curation_spark.operators.profile import key_skew_report


def _df(spark, counts: dict, id_prefix: str = "id"):
    rows = []
    i = 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((f"{id_prefix}{i:05d}", g))
            i += 1
    return spark.createDataFrame(rows, "doc_id string, k string")


def test_values_and_salt(spark):
    df = _df(spark, {"hot": 600, "warm": 300, "cold": 100})
    out = {r["key"]: r for r in
           key_skew_report(df, "k", top_k=10).collect()}
    assert out["hot"]["n"] == 600 and out["hot"]["share"] == 0.6
    # mean = 1000/3; skew_ratio(hot) = 600/(1000/3) = 1.8
    assert abs(out["hot"]["skew_ratio"] - 1.8) < 1e-9
    assert out["hot"]["suggested_salt"] == 2  # ceil(1.8)
    assert out["cold"]["suggested_salt"] == 1  # ceil(0.3)


def test_null_key_reported(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "x")],
        "doc_id string, k string")
    out = key_skew_report(df, "k").collect()
    top = max(out, key=lambda r: r["n"])
    assert top["key"] is None and top["n"] == 2


def test_top_k_cutoff_deterministic(spark):
    # 5 keys tied at n=2: cut at top_k=3 must take the 3 smallest
    # key strings (count desc, key asc)
    df = _df(spark, {f"k{j}": 2 for j in range(5)})
    out = key_skew_report(df, "k", top_k=3).collect()
    assert sorted(r["key"] for r in out) == ["k0", "k1", "k2"]


def test_sampled_counts_follow_hash_rule(spark):
    from mehc_curation_spark.operators.sampling import hash_sample
    df = _df(spark, {"hot": 400, "cold": 100})
    out = {r["key"]: r["n"] for r in
           key_skew_report(df, "k", sample_fraction=0.3,
                           id_col="doc_id").collect()}
    exp = {r["k"]: r["n"] for r in
           hash_sample(df, "doc_id", 0.3).groupBy("k").count()
           .withColumnRenamed("count", "n").collect()}
    assert out == exp
    with pytest.raises(ValueError):
        key_skew_report(df, "k", sample_fraction=0.3)  # no id_col
    with pytest.raises(ValueError):
        key_skew_report(df, "k", sample_fraction=0.0, id_col="doc_id")


def test_plan_has_take_ordered_not_global_sort(spark):
    df = _df(spark, {"a": 5, "b": 3})
    plan = (key_skew_report(df, "k", top_k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_join_fanout_values(spark):
    from mehc_curation_spark.operators.profile import join_fanout_report
    left = _df(spark, {"hot": 100, "cold": 10, "only_left": 5})
    right = _df(spark, {"hot": 50, "cold": 2, "only_right": 7},
                id_prefix="r")
    out = {r["key"]: r for r in
           join_fanout_report(left, right, "k").collect()}
    # one-sided keys emit nothing
    assert set(out) == {"hot", "cold"}
    assert out["hot"]["est_rows"] == 5000 and out["cold"]["est_rows"] == 20
    assert abs(out["hot"]["share"] - 5000 / 5020) < 1e-6
    # exactness: the report's est_rows IS the real join cardinality
    real = left.join(right.withColumnRenamed("doc_id", "rid"), "k").count()
    assert real == 5020


def test_join_fanout_null_keys_excluded(spark):
    from mehc_curation_spark.operators.profile import join_fanout_report
    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "x")],
        "doc_id string, k string")
    out = join_fanout_report(df, df, "k").collect()
    assert [(r["key"], r["est_rows"]) for r in out] == [("x", 1)]


def test_join_fanout_distinct_keys(spark):
    from mehc_curation_spark.operators.profile import join_fanout_report
    left = _df(spark, {"x": 4})
    right = spark.createDataFrame([("r1", "x"), ("r2", "y")],
                                  "doc_id string, other_key string")
    out = join_fanout_report(left, right, "k", right_key="other_key",
                             top_k=5).collect()
    assert [(r["key"], r["n_left"], r["n_right"]) for r in out] == \
        [("x", 4, 1)]
