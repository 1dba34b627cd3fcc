"""Margin-based pair mining (operators/similarity.py:margin_mine) —
the Artetxe & Schwenk 2019 ratio-margin criterion over bidirectional
kNN. Hand-computed expectations on a constructed corpus, guard rails,
and partition invariance of the exact path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import margin_mine


def _vecs_df(spark, name_id, vecs, n_parts=2):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, f"{name_id} long, embedding array<float>"
    ).repartition(n_parts)


def _expected_margins(qv, xv, k):
    """NumPy twin of the documented contract: cosines rounded to 4,
    integer-scaled top-k sums, one double division, round to 6."""
    qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    xn = xv / np.linalg.norm(xv, axis=1, keepdims=True)
    cos = np.round(qn @ xn.T, 4)
    scaled = np.round(cos * 10000).astype(np.int64)
    out = {}
    # forward/backward top-k with (cos desc, id asc) tie-break
    fwd = {qi: sorted(range(xv.shape[0]),
                      key=lambda j: (-cos[qi, j], j))[:k]
           for qi in range(qv.shape[0])}
    bwd = {j: sorted(range(qv.shape[0]),
                     key=lambda qi: (-cos[qi, j], qi))[:k]
           for j in range(xv.shape[0])}
    for qi, njs in fwd.items():
        sq, nq = int(scaled[qi, njs].sum()), len(njs)
        for j in njs:
            si = int(scaled[bwd[j], j].sum())
            ni = len(bwd[j])
            den = sq * ni + si * nq
            if den <= 0:
                continue
            out[(qi, j)] = round(
                float(scaled[qi, j] * 2 * nq * ni) / float(den), 6)
    return out


def test_margin_matches_numpy_twin(spark):
    rng = np.random.default_rng(3)
    qv = rng.normal(size=(6, 8))
    xv = rng.normal(size=(15, 8))
    q = _vecs_df(spark, "query_id", qv)
    x = _vecs_df(spark, "vec_id", xv)
    got = {(r["query_id"], r["vec_id"]): r["margin"]
           for r in margin_mine(q, x, "embedding", "query_id", "vec_id",
                                k=3, threshold=0.0,
                                method="exact").collect()}
    exp = _expected_margins(qv.astype(np.float32).astype(np.float64),
                            xv.astype(np.float32).astype(np.float64), k=3)
    assert got == exp


def test_margin_rank_and_threshold(spark):
    # two clusters: q0 ~ x0/x1 (one standout), q1 equidistant to all
    q = _vecs_df(spark, "query_id", [[1.0, 0.0], [0.0, 1.0]])
    x = _vecs_df(spark, "vec_id",
                 [[0.99, 0.14], [0.7, 0.71], [-1.0, 0.1], [0.1, -1.0]])
    res = margin_mine(q, x, "embedding", "query_id", "vec_id",
                      k=2, threshold=1.0, method="exact").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert all(r["margin"] >= 1.0 for r in rows)
    # q0's standout neighbor x0 must be its rank-1 match
    assert by_q[0][0]["vec_id"] == 0 or any(
        r["vec_id"] == 0 and r["rank"] == 1 for r in by_q[0])


def test_margin_exact_partition_invariant(spark):
    rng = np.random.default_rng(11)
    qv = rng.normal(size=(10, 6))
    xv = rng.normal(size=(30, 6))
    outs = []
    for parts in (1, 3, 7):
        q = _vecs_df(spark, "query_id", qv, n_parts=parts)
        x = _vecs_df(spark, "vec_id", xv, n_parts=parts)
        rows = margin_mine(q, x, "embedding", "query_id", "vec_id",
                           k=4, threshold=0.0, method="exact").collect()
        outs.append(sorted((r["query_id"], r["vec_id"], r["cos"],
                            r["margin"], r["rank"]) for r in rows))
    assert outs[0] == outs[1] == outs[2]


def test_margin_guards(spark):
    q = _vecs_df(spark, "vec_id", [[1.0, 0.0]])
    x = _vecs_df(spark, "vec_id", [[0.0, 1.0]])
    with pytest.raises(ValueError, match="must differ"):
        margin_mine(q, x, "embedding", "vec_id", "vec_id")
    q2 = q.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="unknown method"):
        margin_mine(q2, x, "embedding", "query_id", "vec_id",
                    method="bogus")
    big_q = _vecs_df(spark, "query_id", np.eye(4).tolist())
    with pytest.raises(ValueError, match="max_rows"):
        margin_mine(big_q, x, "embedding", "query_id", "vec_id",
                    method="exact", max_rows=2)
