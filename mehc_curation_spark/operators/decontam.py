"""Eval-set n-gram decontamination.

Benchmark-contamination screening as published for GPT-3 (Brown et
al. 2020, appendix C: 13-gram overlap) and PaLM (Chowdhery et al.
2022, §6.1: an example is contaminated when >=70% of its 8-grams were
seen in the eval set).  This is the *reverse* direction of
``cross_corpus_text_near_dups`` (which finds near-dup documents): here
the unit is the token n-gram, the eval side defines the contaminated
vocabulary, and the score is the fraction of a training document's
n-gram positions that collide with it.

No reference analog (the reference pipeline has no notion of an eval
corpus); this is a graft-only addition for the training-data mandate.

Physical shape at 100 TB
------------------------
* The eval corpus is small relative to training data, so its distinct
  n-gram keys are **broadcast**; the training side never shuffles its
  text.  Everything up to the per-document aggregation is map-side:
  tokenize -> n-grams -> explode -> broadcast hash join.
* Join keys are 16-hex-char md5 prefixes (64 bits), not the n-gram
  strings themselves, so the exploded frame carries fixed-width keys
  instead of ~50-byte strings.  md5 (not xxhash64) keeps the DuckDB
  oracle bit-identical.
* One shuffle for the per-doc (count, hits) aggregation and one for
  the join back onto the id frame (keeps zero-gram documents); both
  are slim (id + 2 longs).  With ``broadcast_eval=False`` the
  membership test becomes a shuffle left join on the gram key for the
  eval-corpus-too-big-to-broadcast case.

Tokenization is the corpus-wide convention (lower + filtered split on
whitespace runs) shared with operators/text_stats.py so contamination
fractions compose with token counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _toks(c: Column) -> Column:
    return F.when(c.isNotNull(),
                  F.filter(F.split(F.lower(c), "[ \t\n\r]+"),
                           lambda x: x != ""))


def _grams(c: Column, n: int) -> Column:
    toks = _toks(c)
    nt = F.size(toks)
    return F.when(nt >= n, F.transform(
        F.sequence(F.lit(1), nt - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)])))


def _gram_key(c: Column) -> Column:
    # 64-bit join surrogate; md5 so the DuckDB oracle can restate it.
    return F.substring(F.md5(c), 1, 16)


def eval_ngram_set(eval_df: DataFrame, text_col: str,
                   n: int = 8) -> DataFrame:
    """Distinct n-gram keys of the eval corpus: one column ``gk``."""
    return (eval_df
            .select(F.explode(_grams(F.col(text_col), n)).alias("_g"))
            .select(_gram_key(F.col("_g")).alias("gk"))
            .distinct())


def eval_ngram_contamination(df: DataFrame, eval_df: DataFrame,
                             id_col: str, text_col: str,
                             eval_text_col: str | None = None,
                             n: int = 8, threshold: float = 0.7,
                             broadcast_eval: bool = True) -> DataFrame:
    """Per-document contamination fraction against an eval corpus.

    Returns ``(id_col, n_ngrams, n_hit, contam_frac, contaminated)``
    for EVERY input document (zero-gram documents included with
    n_ngrams=0 and a NULL fraction).  The fraction is over n-gram
    *positions* (all occurrences), matching the PaLM definition; it is
    rounded to 6 dp so cross-engine comparison is ulp-safe.
    """
    ev = eval_ngram_set(eval_df, eval_text_col or text_col, n=n)
    if broadcast_eval:
        ev = F.broadcast(ev)

    grams = _grams(F.col(text_col), n)
    exploded = (df.select(F.col(id_col), F.explode(grams).alias("_g"))
                .withColumn("gk", _gram_key(F.col("_g")))
                .drop("_g"))
    hits = (exploded
            .join(ev.withColumn("_hit", F.lit(1)), "gk", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("_n"),
                 F.count("_hit").alias("n_hit")))

    base = df.select(F.col(id_col),
                     F.coalesce(F.size(grams), F.lit(0)).alias("n_ngrams"))
    out = (base.join(hits.drop("_n"), id_col, "left")
           .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
           .withColumn(
               "contam_frac",
               F.when(F.col("n_ngrams") > 0,
                      F.round(F.col("n_hit") /
                              F.col("n_ngrams").cast("double"), 6)))
           .withColumn(
               "contaminated",
               F.coalesce(F.col("contam_frac") >= F.lit(threshold),
                          F.lit(False))))
    return out
