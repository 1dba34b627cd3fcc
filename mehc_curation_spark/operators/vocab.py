"""Corpus vocabulary operators: document-frequency heavy hitters and
per-document TF-IDF keywords.

Both are pure Catalyst (explode + two-phase aggregation + top-k), no
Python in the hot path. At 100 TB the shapes hold: the explode is
narrow, aggregations are map-side combinable on (term) / (doc, term),
and the heavy-hitter top-k compiles to TakeOrderedAndProject (per-
partition heaps + driver merge of k rows — never a full sort). The
term-statistics frame in TF-IDF is joined back by term; its
cardinality is the vocabulary (Heaps' law: ~10^7-10^8 terms at web
scale), a plain shuffled equi-join — small next to the corpus itself.

Reference analog: the curator's report counts token statistics per
rule (/root/reference/mehc_curation/utils/report.py); these operators
generalize that to corpus-level vocabulary analytics used for
stopword lists, boilerplate candidates, and keyword extraction in a
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Tokenizer shared by both operators: lowercase, trim, split on
#: whitespace runs — byte-identical to DuckDB
#: ``string_split_regex(lower(trim(text)), '[ \t\n\r]+')`` so the
#: driver oracle reproduces term sets exactly.
_WS = "[ \t\n\r]+"


def tokens_col(c: Column) -> Column:
    """Lowercased whitespace tokens; empty/blank text -> empty array
    (Spark's split('') would yield [''])."""
    t = F.lower(F.trim(c))
    return F.when(F.length(t) == 0,
                  F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def top_terms(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus heavy hitters: top-k terms by document frequency.

    Returns (term, doc_freq, tf_total) — number of documents
    containing the term and total occurrences — ordered by
    (doc_freq DESC, tf_total DESC, term ASC); the full tiebreak makes
    the k-selection deterministic. ``count_distinct`` plans as a
    two-phase partial-distinct aggregate; orderBy+limit plans as
    TakeOrderedAndProject.
    """
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(tokens_col(F.col(text_col))).alias("term"))
    agg = (ex.filter(F.col("term") != "")
             .groupBy("term")
             .agg(F.count_distinct("_id").alias("doc_freq"),
                  F.count("*").alias("tf_total")))
    return agg.orderBy(F.desc("doc_freq"), F.desc("tf_total"),
                       F.asc("term")).limit(k)


def tfidf_keywords(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", top_n: int = 3) -> DataFrame:
    """Top-n keywords per document by smoothed TF-IDF.

    score = (tf / doc_len) * (ln((N+1)/(df+1)) + 1), rounded to 6
    decimals; ranking breaks ties by term so per-document top-n is
    deterministic. N (corpus size) rides along as a broadcast scalar
    (crossJoin of a 1-row aggregate) so the whole thing stays one
    lazy plan — no driver-side count() action.
    """
    tf = (df.select(F.col(id_col).alias("_id"),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("_id", "term").agg(F.count("*").alias("tf_cnt")))
    doclen = tf.groupBy("_id").agg(F.sum("tf_cnt").alias("n_tok"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(doclen, "_id")
                .join(dfreq, "term")
                .crossJoin(F.broadcast(n_docs))
                .withColumn(
                    "score",
                    F.round((F.col("tf_cnt") / F.col("n_tok")) *
                            (F.log((F.col("n_docs") + F.lit(1)) /
                                   (F.col("dfreq") + F.lit(1))) + F.lit(1)),
                            6)))
    w = F.row_number().over(
        Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("term")))
    return (scored.withColumn("rank", w)
                  .filter(F.col("rank") <= top_n)
                  .select(F.col("_id").alias(id_col), "term", "score",
                          "rank"))
