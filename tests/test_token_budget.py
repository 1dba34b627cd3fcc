"""Token-budget sampling and quality tiers: determinism, superset
growth, budget respect, tier balance."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.sampling import (
    quality_tiers,
    token_budget_sample,
)


def _docs(spark, n=200):
    rows = [(i, "en" if i % 3 else "de", "tok " * (i % 17 + 1))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_budget_never_exceeded(spark):
    df = _docs(spark)
    out = token_budget_sample(df, "doc_id", "lang", "text",
                              {"en": 300, "de": 150})
    per = out.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()
    tot = {r["lang"]: r["t"] for r in per}
    assert tot["en"] <= 300 and tot["de"] <= 150
    # budgets actually bind (sample is a strict subset)
    assert out.count() < df.count()
    # and are nearly filled: next doc in priority order would overflow
    assert tot["en"] > 300 - 18 and tot["de"] > 150 - 18


def test_larger_budget_is_superset(spark):
    df = _docs(spark)
    small = {r["doc_id"] for r in
             token_budget_sample(df, "doc_id", "lang", "text",
                                 {"en": 200, "de": 100}).collect()}
    big = {r["doc_id"] for r in
           token_budget_sample(df, "doc_id", "lang", "text",
                               {"en": 500, "de": 400}).collect()}
    assert small <= big


def test_partition_invariance(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in
         token_budget_sample(df.repartition(1), "doc_id", "lang", "text",
                             {"en": 250, "de": 250}).collect()}
    b = {r["doc_id"] for r in
         token_budget_sample(df.repartition(13), "doc_id", "lang", "text",
                             {"en": 250, "de": 250}).collect()}
    assert a == b


def test_default_budget_zero_drops_unlisted_strata(spark):
    df = _docs(spark)
    out = token_budget_sample(df, "doc_id", "lang", "text", {"en": 100})
    assert out.filter(F.col("lang") == "de").isEmpty()


def test_quality_tiers_balanced_per_stratum(spark):
    df = _docs(spark).withColumn(
        "q", (F.col("doc_id") % 41).cast("double"))
    out = quality_tiers(df, "doc_id", "lang", "q")
    per = (out.groupBy("lang", "tier").count()
           .groupBy("lang")
           .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
           .collect())
    for r in per:
        assert r["mx"] - r["mn"] <= 1  # ntile equal-count cut
    # head really is higher-scored than tail within each lang
    stats = (out.groupBy("lang", "tier").agg(F.avg("q").alias("m"))
             .collect())
    m = {(r["lang"], r["tier"]): r["m"] for r in stats}
    for lang in ("en", "de"):
        assert m[(lang, "head")] > m[(lang, "middle")] > m[(lang, "tail")]


def test_quality_tiers_approx_matches_exact_cut(spark):
    """The quantile-boundary scale path agrees with the exact ntile on
    all but boundary-tied rows, with near-equal tier populations."""
    import pytest

    from mehc_curation_spark.operators.sampling import quality_tiers_approx

    rows = [(i, "en" if i % 2 else "de", float((i * 37) % 601) / 601.0)
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double")
    exact = {(r["doc_id"]): r["tier"] for r in
             quality_tiers(df, "doc_id", "lang", "q").collect()}
    approx = {(r["doc_id"]): r["tier"] for r in
              quality_tiers_approx(df, "doc_id", "lang", "q").collect()}
    assert set(approx) == set(exact)
    agree = sum(approx[k] == exact[k] for k in exact) / len(exact)
    assert agree >= 0.98
    from collections import Counter

    sizes = Counter(approx.values())
    for t in ("head", "middle", "tail"):
        assert abs(sizes[t] - 200) <= 8

    with pytest.raises(ValueError):
        quality_tiers_approx(df, "doc_id", "lang", "q", n_tiers=4)
