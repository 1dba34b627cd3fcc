"""Connected components (large-star/small-star) vs a brute-force
union-find oracle, plus cluster-representative election."""

import random

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.graph import (
    connected_components,
    near_dup_clusters,
)


def _uf_components(edges):
    """Brute-force union-find; returns {node: min-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run_cc(spark, edges, num_partitions=None):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    if num_partitions:
        df = df.repartition(num_partitions)
    got = connected_components(df)
    return {r["id"]: r["component"] for r in got.collect()}


GRAPHS = {
    # a long chain forces many min-propagation hops; log^2 rounds must
    # still converge under max_iter
    "chain": [(i, i + 1) for i in range(60)],
    "two_cliques": [(a, b) for a in range(5) for b in range(5) if a < b]
    + [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b],
    "star": [(0, i) for i in range(1, 20)],
    "cycle": [(i, (i + 1) % 12) for i in range(12)],
    "self_loops_and_dups": [(1, 1), (1, 2), (2, 1), (2, 3), (7, 7), (8, 9),
                            (8, 9), (9, 8)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_union_find(spark, name):
    edges = GRAPHS[name]
    want = _uf_components([e for e in edges if e[0] != e[1]])
    got = _run_cc(spark, edges)
    # pure self-loop nodes (7,7) never form an edge; absent from both
    assert got == want


def test_cc_random_graphs_match(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [e for e in edges if e[0] != e[1]]
        assert _run_cc(spark, edges) == _uf_components(edges)


def test_cc_partition_invariant(spark):
    edges = GRAPHS["chain"] + GRAPHS["two_cliques"]
    a = _run_cc(spark, edges, num_partitions=1)
    b = _run_cc(spark, edges, num_partitions=13)
    assert a == b == _uf_components(edges)


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("img_b", "img_a"), ("img_b", "img_c"), ("img_x", "img_y")],
        "id_a string, id_b string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"img_a": "img_a", "img_b": "img_a", "img_c": "img_a",
                   "img_x": "img_x", "img_y": "img_x"}


def test_near_dup_clusters_rep_election(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (5, 50)],
        "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in
            near_dup_clusters(docs, pairs, "doc_id",
                              quality_col="n_chars").collect()}
    # cluster {1,2,3}: best quality 99 tie between 2 and 3 -> min id 2
    assert [rows[i]["cluster"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [rows[i]["is_rep"] for i in (1, 2, 3)] == [False, True, False]
    # singletons are their own representative
    assert rows[4]["cluster"] == 4 and rows[4]["is_rep"]
    assert rows[5]["cluster"] == 5 and rows[5]["is_rep"]


def test_near_dup_clusters_exactly_one_rep(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("q"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)] +
        [(i, i + 2) for i in range(50, 70)], "id_a long, id_b long")
    out = near_dup_clusters(docs, pairs, "doc_id", quality_col="q")
    per = out.groupBy("cluster").agg(
        F.sum(F.col("is_rep").cast("int")).alias("n_rep"))
    assert per.filter(F.col("n_rep") != 1).isEmpty()
    assert out.count() == 100
