"""Model-based quality scoring — the trained companion to the
rule-based quality filter.

The industrial pattern (public: fastText's supervised linear
classifier, Joulin et al. 2016, arXiv:1607.01759; and the
"distill the heuristic filter into a model" loop used by web-corpus
pipelines) is: label a seed corpus with cheap heuristics, fit a linear
classifier over cheap features, then apply the model at corpus scale
where the heuristics are too brittle or too slow. The reference repo
scores validity per row with fixed rules
(/root/reference/mehc_curation/validation/core/engine.py:41); this
module adds the learned-scoring layer those rules seed.

Spark-first shape:

- **Features are pure Catalyst** (whole-stage codegen, no UDF): length
  and token-count log-scales, punctuation/digit/space ratios, mean
  token length, and a squared length term — the quadratic is what
  lets a LINEAR model carve the keep-band (too-short AND too-long
  both drop) that a monotone feature set cannot express.
- **Training is one `pyspark.ml` LogisticRegression fit** on the
  heuristically-labeled sample (driver-side coefficient extract, a
  dozen doubles — no model state ever shuffles).
- **Serving is closed-form**: sigma(w.x + b) inlined as a Catalyst
  expression, so scoring 10^12 rows is a scan, not an ML-library
  dependency. Every feature is rounded to 6 decimals BEFORE the dot
  product and the sum is associated left-to-right, which makes the
  arithmetic bit-reproducible in any IEEE-double engine — the DuckDB
  oracle (`doc_quality_model`) states the identical expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Feature order is the contract: training, serving and the SQL oracle
# all associate the dot product in THIS order.
FEATURES = ("ln1p_chars", "len_band", "punct_ratio", "digit_ratio",
            "space_ratio", "mean_tok_len", "ln1p_tokens")

# Frozen coefficients: LogisticRegression (pyspark.ml, maxIter=100,
# ridge 1e-3 — the labels are separable in this feature space, so some
# regularization is what keeps the weights finite and the scores
# calibrated) distilling the heuristic length-band filter over the
# sf0.01 documents fixture (500 docs, seed-deterministic), rounded to
# 4 decimals; F1 0.986 vs the seed labels, 91% of scores
# non-saturated. Serving with frozen weights keeps the scored surface
# fully value-oracled; retrain with train_quality_model when the
# corpus or the seed heuristics change.
PRETRAINED: dict[str, float] = {
    "intercept": 9.0238,
    "ln1p_chars": -0.34,
    "len_band": -12.4405,
    "punct_ratio": 0.0,
    "digit_ratio": 0.0,
    "space_ratio": 0.0299,
    "mean_tok_len": -0.4267,
    "ln1p_tokens": -0.399,
}

# center of the keep-band in ln(1+n_chars) space: the heuristic keeps
# 150..420 chars, ln(1+150)=5.02, ln(1+420)=6.04 → midpoint ~5.53
LEN_BAND_CENTER = 5.53


def quality_feature_cols(c: Column) -> dict[str, Column]:
    """The model's feature columns (each rounded to 6 decimals — the
    cross-engine reproducibility contract). NULL text yields NULL
    features → NULL score (callers decide the policy for unscorable
    rows); EMPTY text is scorable — its ratios are defined as 0.0, so
    q_keep is a real False instead of a NULL that neither filters nor
    aggregates (the heuristic this model distills labels empty text
    0.0)."""
    n = F.length(c)
    nz = F.when(n > 0, n.cast("double"))
    # filtered split (see text_stats.token_count_col): boundary
    # tabs/newlines must not inflate the token features
    n_tok = F.size(F.filter(F.split(c, "[ \t\n\r]+"),
                            lambda x: x != ""))
    ln1p = F.round(F.log(F.lit(1.0) + n.cast("double")), 6)
    alnum = F.regexp_count(c, F.lit("[A-Za-z0-9]"))
    band_d = ln1p - F.lit(LEN_BAND_CENTER)
    return {
        "ln1p_chars": ln1p,
        # explicit d*d, not pow(d,2): a single IEEE multiply is the
        # same bit pattern in every engine; pow() implementations vary
        "len_band": F.round(band_d * band_d, 6),
        "punct_ratio": F.when(n == 0, F.lit(0.0)).otherwise(F.round(
            F.regexp_count(c, F.lit(r"[^A-Za-z0-9 \t\n\r]")) / nz, 6)),
        "digit_ratio": F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(F.regexp_count(c, F.lit("[0-9]")) / nz, 6)),
        "space_ratio": F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(F.regexp_count(c, F.lit("[ ]")) / nz, 6)),
        "mean_tok_len": F.coalesce(
            F.round(alnum / F.when(n_tok > 0, n_tok.cast("double")), 6),
            F.lit(0.0)),
        "ln1p_tokens": F.round(
            F.log(F.lit(1.0) + n_tok.cast("double")), 6),
    }


def quality_score_expr(c: Column,
                       coef: dict[str, float] = PRETRAINED) -> Column:
    """sigma(w.x + b) as one Catalyst expression, dot product
    associated in FEATURES order."""
    feats = quality_feature_cols(c)
    z = F.lit(float(coef["intercept"]))
    for name in FEATURES:
        z = z + F.lit(float(coef[name])) * feats[name]
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def score_quality(df: DataFrame, text_col: str,
                  coef: dict[str, float] = PRETRAINED,
                  threshold: float = 0.5) -> DataFrame:
    """Append ``q_score`` (rounded sigmoid) and ``q_keep`` columns.
    Pure scan-side compute — no shuffle, no UDF, no ML runtime."""
    s = quality_score_expr(F.col(text_col), coef)
    # q_keep references the q_score COLUMN: single evaluation of the
    # feature tree guaranteed, and the keep decision is consistent
    # with the published (rounded) score by construction
    return df.withColumn("q_score", s).withColumn(
        "q_keep", (F.col("q_score") >= F.lit(threshold)).cast("boolean"))


def heuristic_labels(df: DataFrame, text_col: str) -> DataFrame:
    """The seed labels the model distills: the driver's rule-based
    quality filter (non-empty and 150..420 chars — the same band
    `doc_quality_filter` serves)."""
    c = F.col(text_col)
    n = F.length(c)
    keep = (c.isNotNull() & (F.length(F.trim(c)) > 0)
            & (n >= 150) & (n <= 420))
    return df.withColumn("label", keep.cast("double"))


def train_quality_model(df: DataFrame, text_col: str,
                        label_col: str = "label",
                        max_iter: int = 100,
                        reg_param: float = 0.001,
                        return_model: bool = False):
    """Fit the linear quality model; returns {feature: weight} +
    'intercept' (plain doubles — the model IS its coefficient dict).
    Lightly ridge-regularized (the heuristic labels are linearly
    separable in this feature space, so lambda=0 drives the weights to
    infinity and saturates every score to 0/1 — useless as a ranking
    signal); unstandardized so weights bind directly to the rounded
    feature definitions above."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_feature_cols(F.col(text_col))
    base = df.select(F.col(label_col),
                     *[v.alias(k) for k, v in feats.items()]).na.drop()
    vec = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    lr = LogisticRegression(featuresCol="features", labelCol=label_col,
                            maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    model = lr.fit(vec.transform(base))
    out = {"intercept": float(model.intercept)}
    for name, w in zip(FEATURES, model.coefficients):
        out[name] = float(w)
    # return_model exposes the fitted pyspark.ml object (and the
    # assembler) so callers comparing transform() against the closed
    # form don't pay a second training job
    return (out, model, vec) if return_model else out
