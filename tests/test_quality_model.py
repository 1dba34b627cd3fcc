"""Model-based quality scoring (operators/quality_model.py):
distillation fidelity of the frozen weights, train-path contract,
NULL handling."""

import math

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.quality_model import (
    FEATURES,
    PRETRAINED,
    heuristic_labels,
    score_quality,
    train_quality_model,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_frozen_weights_reproduce_heuristic_labels(spark):
    d = heuristic_labels(spark.read.parquet(DOCS), "text")
    sc = score_quality(d, "text")
    r = sc.agg(
        F.sum((F.col("q_keep") & (F.col("label") == 1.0)).cast("int"))
        .alias("tp"),
        F.sum((F.col("q_keep") & (F.col("label") == 0.0)).cast("int"))
        .alias("fp"),
        F.sum((~F.col("q_keep") & (F.col("label") == 1.0)).cast("int"))
        .alias("fn")).first()
    f1 = 2 * r["tp"] / (2 * r["tp"] + r["fp"] + r["fn"])
    assert f1 >= 0.97
    # calibrated, not saturated: a good share of scores are informative
    nonsat = sc.filter("q_score > 0.01 and q_score < 0.99").count()
    assert nonsat / sc.count() > 0.5


def test_null_text_scores_null(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "x " * 120)], "id string, text string")
    rows = {r["id"]: r for r in score_quality(df, "text").collect()}
    assert rows["a"]["q_score"] is None and rows["a"]["q_keep"] is None
    assert rows["b"]["q_score"] is not None


def test_train_returns_finite_named_coefficients(spark):
    d = heuristic_labels(spark.read.parquet(DOCS), "text")
    coef = train_quality_model(d, "text")
    assert set(coef) == set(FEATURES) | {"intercept"}
    assert all(math.isfinite(v) for v in coef.values())
    # the band feature must carry negative weight — it IS the filter
    assert coef["len_band"] < 0


def test_scoring_threshold_knob(spark):
    d = spark.read.parquet(DOCS)
    strict = score_quality(d, "text", threshold=0.9).filter("q_keep").count()
    loose = score_quality(d, "text", threshold=0.1).filter("q_keep").count()
    assert strict < loose


def test_pretrained_matches_module_constants():
    # the oracle SQL in __spark_entry__ embeds these literals; a drift
    # here silently breaks the value oracle, so pin them
    assert PRETRAINED["intercept"] == 9.0238
    assert PRETRAINED["len_band"] == -12.4405


# -- deterministic sampling (operators/sampling.py) ---------------------

def test_hash_sample_superset_and_partition_invariance(spark):
    from mehc_curation_spark.operators.sampling import hash_sample

    d = spark.read.parquet(DOCS)
    s10 = {r[0] for r in hash_sample(d, "doc_id", 0.10)
           .select("doc_id").collect()}
    s30 = {r[0] for r in hash_sample(d, "doc_id", 0.30)
           .select("doc_id").collect()}
    assert s10 <= s30                      # growing f never drops rows
    assert 0.04 < len(s10) / 500 < 0.18    # ~Bernoulli(0.1) on n=500
    # partition-layout invariance: same rows from any layout
    s10b = {r[0] for r in hash_sample(d.repartition(13), "doc_id", 0.10)
            .select("doc_id").collect()}
    assert s10 == s10b


def test_stratified_sample_respects_per_stratum_rates(spark):
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(DOCS)
    out = stratified_sample(d, "doc_id", "lang", {"en": 0.0}, 1.0)
    assert out.filter(F.col("lang") == "en").count() == 0
    n_other = d.filter(F.col("lang") != "en").count()
    assert out.count() == n_other          # default 1.0 keeps the rest
