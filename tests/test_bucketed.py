"""Bucketed-table co-location: a bucketed⋈bucketed join on the bucket
key and a groupBy on it must plan WITHOUT an Exchange (the 100 TB
story: one organized write deletes every future shuffle of the big
side). See mehc_curation_spark/io/bucketed.py for the design notes.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.bucketed import (
    cocolocated_join,
    read_bucketed,
    write_bucketed,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, pairs_df):
    # warehouse.dir is a static conf — tables land in the session's
    # default ./spark-warehouse; DROP TABLE removes the managed files.
    from mehc_curation_spark.stages.plan import build_labels_plan

    labels = build_labels_plan(pairs_df)
    write_bucketed(pairs_df.select("image_id", "phash", "caption"),
                   "pairs_b", "phash", n_buckets=8)
    write_bucketed(labels, "labels_b", "phash", n_buckets=8)
    yield "pairs_b", "labels_b"
    spark.sql("DROP TABLE IF EXISTS pairs_b")
    spark.sql("DROP TABLE IF EXISTS labels_b")


@pytest.fixture()
def no_broadcast(spark):
    """At 2000 fixture rows the optimizer (correctly) broadcasts the
    small side; disable broadcast to surface the plan a corpus-scale
    big⋈big join would get, where co-location is what matters."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_exchange(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = cocolocated_join(spark, left, right, on="phash")
    s = _formatted(joined)
    tree = s.split("\n\n")[0]
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, s
    assert not any("Exchange" in ln for ln in tree.splitlines()), s
    assert "Bucketed: true" in s, s
    # correctness: same result as the plain (shuffling) join
    plain = (spark.table(left).join(spark.table(right), "phash").count())
    assert joined.count() == plain


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = read_bucketed(spark, right).groupBy("phash").agg(
        F.count("*").alias("n"))
    tree = _formatted(agg).split("\n\n")[0]
    assert not any("Exchange" in ln for ln in tree.splitlines()), tree
    assert agg.count() > 0


def test_unbucketed_join_does_exchange(spark, bucketed_tables, pairs_df,
                                       no_broadcast):
    """Control: the same join against a NON-bucketed side must plan an
    Exchange — proves the no-exchange assertion above is meaningful."""
    left, _ = bucketed_tables
    joined = read_bucketed(spark, left).join(
        pairs_df.select("phash", "w"), "phash")
    tree = _formatted(joined).split("\n\n")[0]
    assert any("Exchange" in ln for ln in tree.splitlines()), tree
