"""Bounded-memory frequency sketches: mergeable Misra-Gries heavy
hitters over a term stream.

The exact heavy-hitter paths (``operators/vocab.py`` top-k by document
frequency, ``text_stats.corpus_frequent_ngrams``) shuffle one row per
DISTINCT term — fine while the vocabulary fits a shuffle, which a
100 TB web corpus's n-gram space does not. This module is the scale
path: each partition summarizes its term stream into at most
``num_counters`` (term, count) pairs with the Misra-Gries algorithm
(Misra & Gries 1982, "Finding repeated elements"), the per-partition
summaries merge by plain summation, and the merged sketch retains the
deterministic error bound of Agarwal et al. 2012, "Mergeable
Summaries" (PODS):

    est(t)  <=  f(t)  <=  est(t) + D

where ``f(t)`` is the true frequency and ``D`` is the total decrement
mass across partitions (``D <= n/(num_counters+1)``; each partition
reports its own decrement total exactly). Every term with
``f(t) > D`` is guaranteed present in the merged output — the sketch
can only miss tails, never true heavy hitters.

Physical shape: ONE pass over the exploded term stream inside a
``mapInPandas`` stage (per-Arrow-batch exact ``value_counts`` merged
into the bounded counter dict — the batched decrement variant, so the
Python loop runs per distinct-term-per-batch, not per occurrence),
then one slim shuffle of at most ``num_partitions * num_counters``
rows. No shuffle of the raw stream, no per-term state anywhere beyond
the fixed counter budget.

Reference scope note: the reference engine has no sketch machinery at
all (its only aggregation is the dedup groupby,
``mehc_curation/utils/common.py:96-113``); this operator exists for
the 100 TB training-data mandate (boilerplate/hot-token discovery
where the exact path's distinct-term shuffle would dominate).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_partition_sketch", "heavy_hitters_sketch",
           "tokens_frame", "heavy_hitter_tokens"]

# output of the per-partition stage: surviving counters, plus ONE
# row per partition with term=NULL carrying that partition's exact
# decrement total (the mergeable error mass).
_SKETCH_SCHEMA = "term string, cnt long"


def _mg_reduce(counts: dict, budget: int) -> int:
    """Shrink ``counts`` to at most ``budget`` entries by subtracting
    the (budget+1)-th largest count from every entry and dropping the
    non-positives (the batched Misra-Gries decrement). Returns the
    decrement applied (0 if already within budget)."""
    if len(counts) <= budget:
        return 0
    # threshold = (budget+1)-th largest value; subtracting it keeps at
    # most `budget` strictly-positive entries
    vals = sorted(counts.values(), reverse=True)
    thr = vals[budget]
    for t in list(counts):
        c = counts[t] - thr
        if c > 0:
            counts[t] = c
        else:
            del counts[t]
    return thr


def mg_partition_sketch(df: DataFrame, term_col: str,
                        num_counters: int = 4096) -> DataFrame:
    """Per-partition Misra-Gries summaries: (term, cnt) survivor rows
    plus one ``term IS NULL`` row per partition whose ``cnt`` is that
    partition's exact decrement total. NULL terms in the input are
    ignored (they carry no frequency information)."""
    if num_counters < 1:
        raise ValueError("num_counters must be >= 1")
    src = df.select(F.col(term_col).alias("term"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        decr = 0
        for b in batches:
            vc = b["term"].dropna().value_counts()
            for t, c in vc.items():
                counts[t] = counts.get(t, 0) + int(c)
            decr += _mg_reduce(counts, num_counters)
        out = pd.DataFrame({"term": list(counts.keys()) + [None],
                            "cnt": list(counts.values()) + [decr]})
        yield out.astype({"cnt": "int64"})

    return src.mapInPandas(run, schema=_SKETCH_SCHEMA)


def heavy_hitters_sketch(df: DataFrame, term_col: str,
                         num_counters: int = 4096,
                         top_k: Optional[int] = 50) -> DataFrame:
    """Merged heavy-hitter estimates from bounded-memory partition
    sketches.

    Returns (term, est_count, max_count, err_bound) — ``est_count`` is
    the merged lower bound, ``max_count = est_count + err_bound`` the
    upper, with ``err_bound`` the summed decrement mass D of every
    partition sketch (the Mergeable-Summaries guarantee: true count in
    [est, est+D], and no term with true count > D is absent). With
    ``num_counters`` >= the per-partition distinct-term count the
    sketch degrades to exact counts and D = 0 — which is what the
    value oracle pins at test scale; the bound columns make the
    approximation contract explicit at real scale.

    Deterministic: ties order by (est_count desc, term asc); the
    est/D sums are integer. ``top_k=None`` returns all survivors."""
    sk = mg_partition_sketch(df, term_col, num_counters)
    d_total = sk.filter(F.col("term").isNull()) \
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("err_bound"))
    ests = (sk.filter(F.col("term").isNotNull())
            .groupBy("term").agg(F.sum("cnt").alias("est_count")))
    out = (ests.crossJoin(F.broadcast(d_total))
           .select("term", "est_count",
                   (F.col("est_count") + F.col("err_bound"))
                   .alias("max_count"),
                   "err_bound")
           .orderBy(F.col("est_count").desc(), F.col("term").asc()))
    return out.limit(top_k) if top_k is not None else out


def tokens_frame(df: DataFrame, text_col: str) -> DataFrame:
    """One row per token occurrence: lowercase whitespace tokens, the
    corpus-wide tokenizer convention (same split/filter as
    ``text_stats.corpus_frequent_ngrams`` and the decontamination
    operators, so sketch counts reconcile with their exact twins)."""
    c = F.col(text_col)
    toks = F.when(c.isNotNull(),
                  F.filter(F.split(F.lower(c), "[ \t\n\r]+"),
                           lambda x: x != ""))
    return df.select(F.explode(toks).alias("term"))


def heavy_hitter_tokens(df: DataFrame, text_col: str,
                        num_counters: int = 4096,
                        top_k: Optional[int] = 50) -> DataFrame:
    """Sketch-based hot-token report over a text column."""
    return heavy_hitters_sketch(tokens_frame(df, text_col),
                                "term", num_counters, top_k)
