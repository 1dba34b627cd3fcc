"""leakage_safe_split: near-dup components never straddle a split.

The operator composes connected_components (large-star/small-star)
with the u48 split hash keyed on the component's minimum id; these
tests pin the three contracts the composition must keep: (1) every
member of a component shares one split, (2) unmatched rows degrade to
exactly split_col of their own id, (3) NULL ids get a NULL split.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mehc_curation_spark.operators.sampling import (leakage_safe_split,
                                                    split_col)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i,) for i in ids],
        T.StructType([T.StructField("doc_id", T.StringType(), True)]))


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_components_share_split(spark):
    # chain a-b-c (a~b, b~c but never a~c directly) plus pair d-e:
    # transitivity must pull all of a,b,c into one split.
    docs = _docs(spark, ["a", "b", "c", "d", "e", "lone"])
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    out = leakage_safe_split(docs, edges, "doc_id", WEIGHTS).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert {by_id[i]["split_key"] for i in "abc"} == {"a"}
    assert len({by_id[i]["split"] for i in "abc"}) == 1
    assert {by_id[i]["split_key"] for i in "de"} == {"d"}
    assert len({by_id[i]["split"] for i in "de"}) == 1
    assert by_id["lone"]["split_key"] == "lone"


def test_unmatched_rows_equal_split_col(spark):
    # with no edges at all the operator must be exactly split_col
    ids = [f"doc-{i:03d}" for i in range(200)]
    docs = _docs(spark, ids)
    edges = _edges(spark, [("doc-000", "doc-001")])
    got = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(docs, edges, "doc_id",
                                       WEIGHTS).collect()}
    want = {r["doc_id"]: r["split"]
            for r in docs.select(
                "doc_id",
                split_col(F.col("doc_id"), WEIGHTS).alias("split"))
            .collect()}
    linked = {"doc-000", "doc-001"}
    for i in ids:
        if i not in linked:
            assert got[i] == want[i], i
    # the linked pair collapses onto the min id's own-split value
    assert got["doc-000"] == got["doc-001"] == want["doc-000"]


def test_null_id_gets_null_split(spark):
    docs = _docs(spark, ["a", None])
    edges = _edges(spark, [("a", "a")])
    rows = {r["doc_id"]: r
            for r in leakage_safe_split(docs, edges, "doc_id",
                                        WEIGHTS).collect()}
    assert rows[None]["split"] is None
    assert rows["a"]["split"] is not None


def test_all_rows_present_once(spark):
    ids = [f"d{i}" for i in range(50)]
    docs = _docs(spark, ids)
    edges = _edges(spark, [("d1", "d2"), ("d2", "d3"), ("d40", "d41")])
    out = leakage_safe_split(docs, edges, "doc_id", WEIGHTS)
    got = [r["doc_id"] for r in out.collect()]
    assert sorted(got) == sorted(ids)


def test_bad_weights_raise(spark):
    docs = _docs(spark, ["a"])
    edges = _edges(spark, [("a", "a")])
    with pytest.raises(ValueError):
        leakage_safe_split(docs, edges, "doc_id",
                           {"train": 0.9, "test": 0.2})
