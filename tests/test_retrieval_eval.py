"""kNN label-retrieval evaluation
(operators/similarity.py:retrieval_eval): hand-computed expectations,
no-relevant and NULL-label contracts, LSH-path invariants, guards.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import retrieval_eval


def _df(spark, id_name, rows, n_parts=2):
    return spark.createDataFrame(
        rows, f"{id_name} long, embedding array<float>, label int"
    ).repartition(n_parts)


def test_retrieval_eval_hand_computed(spark):
    # q0 (label 1): top-2 = x0 (cos .995, label 1), x1 (cos .10,
    #   label 1) -> first_rel_rank 1, rel_in_topk 2
    # q1 (label 2): top-2 = x2 (cos 1.0, label 2), x1 (cos .995,
    #   label 1) -> first_rel_rank 1, rel_in_topk 1
    # q2 (label 9): no label-9 index row -> NULL / 0
    q = _df(spark, "query_id", [
        (0, [1.0, 0.0], 1), (1, [0.0, 1.0], 2), (2, [0.7, 0.7], 9)])
    x = _df(spark, "vec_id", [
        (0, [0.99, 0.1], 1), (1, [0.1, 0.99], 1),
        (2, [0.0, 0.9], 2), (3, [-1.0, 0.0], 2)])
    res = {r["query_id"]: (r["first_rel_rank"], r["rel_in_topk"])
           for r in retrieval_eval(q, x, "embedding", "query_id",
                                   "vec_id", k=2,
                                   method="exact").collect()}
    assert res[0] == (1, 2)
    assert res[1] == (1, 1)
    assert res[2] == (None, 0)
    assert len(res) == 3  # every query appears exactly once


def test_retrieval_eval_null_label_matches_nothing(spark):
    q = _df(spark, "query_id", [(0, [1.0, 0.0], None)])
    x = _df(spark, "vec_id", [(0, [1.0, 0.0], None), (1, [0.9, 0.1], 1)])
    row = retrieval_eval(q, x, "embedding", "query_id", "vec_id",
                         k=2, method="exact").collect()[0]
    # NULL = NULL is not a match (SQL equality, shared with the oracle)
    assert row["first_rel_rank"] is None and row["rel_in_topk"] == 0


def test_retrieval_eval_lsh_invariants(spark):
    rng = np.random.default_rng(7)
    rows_q = [(i, [float(x) for x in rng.normal(size=8)], int(i % 3))
              for i in range(12)]
    rows_x = [(i, [float(x) for x in rng.normal(size=8)], int(i % 3))
              for i in range(60)]
    q = _df(spark, "query_id", rows_q)
    x = _df(spark, "vec_id", rows_x)
    ex = retrieval_eval(q, x, "embedding", "query_id", "vec_id", k=10,
                        method="exact").toPandas()
    ls = retrieval_eval(q, x, "embedding", "query_id", "vec_id", k=10,
                        method="lsh", n_planes=6,
                        probe_hamming=2).toPandas()
    assert set(ls["query_id"]) == set(ex["query_id"])  # full coverage
    # LSH ranks are positions among surfaced candidates: bounded by k,
    # and a query can never surface MORE relevant rows than exist in
    # the exact top-k universe of all index rows... rel_in_topk is
    # bounded by the total same-label index rows (20 per label here)
    assert (ls["rel_in_topk"] <= 10).all()
    fr = ls["first_rel_rank"].dropna()
    assert ((fr >= 1) & (fr <= 10)).all()


def test_retrieval_eval_guards(spark):
    q = _df(spark, "vec_id", [(0, [1.0, 0.0], 1)])
    x = _df(spark, "vec_id", [(1, [0.0, 1.0], 1)])
    with pytest.raises(ValueError, match="must differ"):
        retrieval_eval(q, x, "embedding", "vec_id", "vec_id")
    q2 = q.select(F.col("vec_id").alias("query_id"), "embedding", "label")
    with pytest.raises(ValueError, match="unknown method"):
        retrieval_eval(q2, x, "embedding", "query_id", "vec_id",
                       method="bogus")
    with pytest.raises(ValueError, match="max_rows"):
        big_x = _df(spark, "vec_id",
                    [(i, [1.0, 0.0], 1) for i in range(5)])
        retrieval_eval(q2, big_x, "embedding", "query_id", "vec_id",
                       method="exact", max_rows=3)
