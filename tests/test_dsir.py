"""DSIR importance resampling (operators/sampling.py DSIR section)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.sampling import (
    _DSIR_SCALE,
    dsir_bucket_counts,
    dsir_fit,
    dsir_resample,
    dsir_score_col,
    dsir_weights,
)

B = 64


def _u48(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:6], "little")


def _ngrams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(ng: str) -> int:
    return _u48("dsirb:" + ng) % B


def _py_counts(texts) -> dict[int, int]:
    out: dict[int, int] = {}
    for t in texts:
        if t is None:
            continue
        for ng in _ngrams(t):
            b = _bucket(ng)
            out[b] = out.get(b, 0) + 1
    return out


TARGET = ["alpha beta gamma", "alpha gamma", "beta alpha alpha"]
RAW = ["alpha beta", "delta epsilon zeta", "zeta eta theta",
       "alpha delta", "iota kappa", None]


@pytest.fixture(scope="module")
def raw_df(spark):
    rows = [(f"d{i}", t) for i, t in enumerate(RAW)]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def target_df(spark):
    rows = [(f"t{i}", t) for i, t in enumerate(TARGET)]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestCountsAndWeights:
    def test_bucket_counts_match_python(self, raw_df):
        got = dsir_bucket_counts(raw_df, "text", B)
        assert got == _py_counts(RAW)

    def test_weights_closed_form(self):
        tc, rc = _py_counts(TARGET), _py_counts(RAW)
        w = dsir_weights(tc, rc, B)
        T = sum(tc.values()) + B
        R = sum(rc.values()) + B
        for b in range(B):
            exp = round(_DSIR_SCALE * (math.log(tc.get(b, 0) + 1)
                                       - math.log(T)
                                       - math.log(rc.get(b, 0) + 1)
                                       + math.log(R)))
            assert w[b] == exp

    def test_fit_validates_buckets(self, raw_df, target_df):
        with pytest.raises(ValueError, match="n_buckets"):
            dsir_fit(target_df, raw_df, "text", n_buckets=1)


class TestScore:
    def test_score_exact_vs_python(self, spark, raw_df, target_df):
        w = dsir_fit(target_df, raw_df, "text", n_buckets=B)
        got = {r["doc_id"]: r["s"] for r in raw_df.select(
            "doc_id", dsir_score_col(F.col("text"), w).alias("s")).collect()}
        for i, t in enumerate(RAW):
            if t is None:
                assert got[f"d{i}"] is None
            else:
                assert got[f"d{i}"] == sum(w[_bucket(ng)]
                                           for ng in _ngrams(t)), t

    def test_target_like_docs_score_higher(self, spark, raw_df, target_df):
        w = dsir_fit(target_df, raw_df, "text", n_buckets=B)
        got = {r["doc_id"]: r["s"] for r in raw_df.select(
            "doc_id", dsir_score_col(F.col("text"), w).alias("s")).collect()}
        # d0 = 'alpha beta' (target-ish) must outscore d2 = 'zeta eta
        # theta' (never in target)
        assert got["d0"] > got["d2"]

    def test_single_token_doc_has_no_bigram(self, spark):
        df = spark.createDataFrame([("x", "alpha")],
                                   "doc_id string, text string")
        w = [7] * B
        s = df.select(dsir_score_col(F.col("text"), w).alias("s")).first()
        assert s["s"] == 7  # one unigram, zero bigrams


class TestResample:
    @pytest.fixture(scope="class")
    def big(self, spark):
        # 200 docs of EQUAL length (the multinomial LLR sums per
        # feature, so length itself shifts scores): half target-like,
        # half not
        rows = [(f"d{i:03d}",
                 ("alpha beta gamma delta" if i % 2 == 0
                  else "zeta eta theta iota"))
                for i in range(200)]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_selection_enriched_toward_target(self, spark, big):
        target = spark.createDataFrame([("t0", "alpha beta gamma delta")],
                                       "doc_id string, text string")
        w = dsir_fit(target, big, "text", n_buckets=B)
        sel = dsir_resample(big, "text", "doc_id", w, n=50).collect()
        n_alpha = sum(1 for r in sel if "alpha" in r["text"])
        assert len(sel) == 50
        # importance resampling must pull far more target-like docs
        # than the 50% base rate
        assert n_alpha >= 40

    def test_partition_invariance(self, spark, big):
        target = spark.createDataFrame([("t0", "alpha alpha alpha")],
                                       "doc_id string, text string")
        w = dsir_fit(target, big, "text", n_buckets=B)
        outs = []
        for parts in (1, 7, 32):
            got = dsir_resample(big.repartition(parts), "text", "doc_id",
                                w, n=50)
            outs.append(sorted(r["doc_id"] for r in got.collect()))
        assert outs[0] == outs[1] == outs[2]

    def test_null_rows_excluded_and_validation(self, spark, raw_df,
                                               target_df):
        w = dsir_fit(target_df, raw_df, "text", n_buckets=B)
        sel = dsir_resample(raw_df, "text", "doc_id", w, n=100).collect()
        assert all(r["text"] is not None for r in sel)
        assert len(sel) == 5  # the NULL-text row never selectable
        with pytest.raises(ValueError, match="n must be"):
            dsir_resample(raw_df, "text", "doc_id", w, n=0)

    def test_seed_changes_marginal_selection(self, spark, big):
        target = spark.createDataFrame([("t0", "alpha alpha alpha")],
                                       "doc_id string, text string")
        w = dsir_fit(target, big, "text", n_buckets=B)
        a = set(r["doc_id"]
                for r in dsir_resample(big, "text", "doc_id", w, n=50,
                                       seed=0).collect())
        b = set(r["doc_id"]
                for r in dsir_resample(big, "text", "doc_id", w, n=50,
                                       seed=1).collect())
        assert a != b
