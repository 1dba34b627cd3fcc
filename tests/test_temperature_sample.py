"""Temperature-flattened group rebalancing (XLM-R sampling rule)."""

import pytest

from mehc_curation_spark.operators.sampling import temperature_resample


def _df(spark, counts: dict[str, int]):
    rows = []
    i = 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((f"id{i:05d}", g))
            i += 1
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_flattens_toward_tail(spark):
    df = _df(spark, {"en": 900, "de": 90, "rm": 10})
    out = temperature_resample(df, "doc_id", "lang",
                               alpha=0.3, budget_frac=0.2)
    fr = {r["lang"]: r["keep_frac"] for r in
          out.select("lang", "keep_frac").distinct().collect()}
    # head language sampled hardest; tail keeps everything
    assert fr["en"] < fr["de"] < fr["rm"] == 1.0
    # kept counts land near the expected targets (u48 is uniform)
    kept = {r["lang"]: r["n"] for r in
            out.filter("kept").groupBy("lang")
            .agg(__import__("pyspark.sql.functions",
                            fromlist=["F"]).count("*").alias("n"))
            .collect()}
    exp = {g: fr[g] * n for g, n in
           {"en": 900, "de": 90, "rm": 10}.items()}
    for g in exp:
        assert abs(kept.get(g, 0) - exp[g]) < 4 * (exp[g] ** 0.5) + 3


def test_alpha_one_is_uniform_rate(spark):
    # alpha=1 keeps the crawl mixture: keep_frac == budget_frac
    df = _df(spark, {"en": 200, "de": 50})
    out = temperature_resample(df, "doc_id", "lang",
                               alpha=1.0, budget_frac=0.25)
    fr = {r["lang"]: round(r["keep_frac"], 9) for r in
          out.select("lang", "keep_frac").distinct().collect()}
    assert fr == {"en": 0.25, "de": 0.25}


def test_alpha_zero_equalizes_groups(spark):
    # alpha=0: every group targets the same kept count
    df = _df(spark, {"en": 300, "de": 100})
    out = temperature_resample(df, "doc_id", "lang",
                               alpha=0.0, budget_frac=0.5)
    fr = {r["lang"]: r["keep_frac"] for r in
          out.select("lang", "keep_frac").distinct().collect()}
    # K = 200, target 100 each: en 100/300, de 100/100 -> capped 1.0
    assert abs(fr["en"] - 1 / 3) < 1e-12 and fr["de"] == 1.0


def test_null_rows_excluded_and_config_validated(spark):
    df = spark.createDataFrame(
        [("a", "en"), (None, "en"), ("b", None)],
        "doc_id string, lang string")
    out = temperature_resample(df, "doc_id", "lang").collect()
    assert [r["doc_id"] for r in out] == ["a"]
    with pytest.raises(ValueError):
        temperature_resample(df, "doc_id", "lang", budget_frac=0.0)
    with pytest.raises(ValueError):
        temperature_resample(df, "doc_id", "lang", alpha=-1.0)


def test_partition_invariant_and_seed_decorrelates(spark):
    df = _df(spark, {"en": 200, "de": 40})
    a = {r["doc_id"]: r["kept"] for r in
         temperature_resample(df.repartition(1), "doc_id", "lang")
         .collect()}
    b = {r["doc_id"]: r["kept"] for r in
         temperature_resample(df.repartition(7), "doc_id", "lang")
         .collect()}
    assert a == b
    c = {r["doc_id"]: r["kept"] for r in
         temperature_resample(df, "doc_id", "lang", seed=1).collect()}
    assert c != a  # different hash domain
