"""Epoch-weighted mixture materialization (repeat factors > 1)."""

import pytest

from mehc_curation_spark.operators.sampling import (hash_sample,
                                                    repeat_upsample)


def _df(spark, counts: dict[str, int]):
    rows = []
    i = 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((f"id{i:05d}", g))
            i += 1
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_integer_factor_exact_copies(spark):
    df = _df(spark, {"en": 50, "de": 30})
    out = repeat_upsample(df, "doc_id", "lang",
                          epochs={"en": 2.0, "de": 3.0}).toPandas()
    per = out.groupby("lang")["doc_id"].count().to_dict()
    assert per == {"en": 100, "de": 90}
    # every row carries exactly copy_idx 0..n-1
    g = out.groupby("doc_id")["copy_idx"].apply(lambda s: sorted(s))
    assert all(v == list(range(len(v))) for v in g)
    assert set(out["n_copies"]) == {2, 3}


def test_fractional_factor_near_target_and_default(spark):
    df = _df(spark, {"en": 400, "de": 100})
    out = repeat_upsample(df, "doc_id", "lang",
                          epochs={"en": 1.5}).toPandas()
    n_en = (out["lang"] == "en").sum()
    # E[n_en] = 600, binomial(400, .5) tail: 4 sigma = 40
    assert abs(n_en - 600) < 40
    assert (out[out["lang"] == "de"]["n_copies"] == 1).all()
    assert ((out["lang"] == "de").sum()) == 100


def test_subunit_factor_is_hash_sample(spark):
    # r < 1 must select EXACTLY the rows hash_sample(r) keeps
    df = _df(spark, {"en": 300})
    out = repeat_upsample(df, "doc_id", "lang", epochs={"en": 0.25},
                          seed=7)
    kept = {r["doc_id"] for r in out.collect()}
    from pyspark.sql import functions as F
    ref = df.withColumn(
        "doc_id", F.concat(F.lit("rep:7:"), F.col("doc_id")))
    expect = {r["doc_id"][len("rep:7:"):]
              for r in hash_sample(ref, "doc_id", 0.25).collect()}
    assert kept == expect


def test_zero_factor_drops_group(spark):
    df = _df(spark, {"en": 20, "de": 20})
    out = repeat_upsample(df, "doc_id", "lang", epochs={"en": 0.0})
    assert {r["lang"] for r in out.collect()} == {"de"}


def test_null_rows_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [("a", "en"), (None, "en"), ("b", None)],
        "doc_id string, lang string")
    out = repeat_upsample(df, "doc_id", "lang", epochs={}).collect()
    assert [r["doc_id"] for r in out] == ["a"]
    with pytest.raises(ValueError):
        repeat_upsample(df, "doc_id", "lang", epochs={"en": -1.0})
    with pytest.raises(ValueError):
        repeat_upsample(df, "doc_id", "lang", epochs={},
                        default_epochs=-0.5)


def test_partition_invariant(spark):
    df = _df(spark, {"en": 150, "de": 50})
    def run(d):
        return sorted((r["doc_id"], r["copy_idx"]) for r in
                      repeat_upsample(d, "doc_id", "lang",
                                      epochs={"en": 2.5, "de": 0.5})
                      .collect())
    assert run(df.repartition(1)) == run(df.repartition(7))


def test_no_shuffle_in_plan(spark):
    df = _df(spark, {"en": 10})
    plan = (repeat_upsample(df, "doc_id", "lang", epochs={"en": 2.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
