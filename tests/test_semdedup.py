"""SemDeDup (cluster-then-within-cluster cosine dedup): keep rule,
soundness, partition invariance, degenerate inputs."""

import math

from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import semdedup


def _vecs(spark):
    """Two tight direction groups plus loners. Group A: ids 1,2,3 all
    pairwise cos ~1 (scaled copies of the same direction); group B:
    ids 10,11 likewise on an orthogonal direction; id 20 is a loner
    off both axes. With n_cells=2 and threshold=0.95, each group keeps
    exactly one member and the loner survives wherever it lands."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),
        (3, [0.99, 0.01, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 3.0, 0.0]),
        (20, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_one_survivor_per_dup_group(spark):
    out = semdedup(_vecs(spark), "embedding", "vec_id",
                   threshold=0.95, n_cells=2, seed=7)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 6  # every input row is labeled, none vanish
    kept = {i for i, r in rows.items() if r["keep"]}
    # group A and group B each keep exactly one member
    assert len(kept & {1, 2, 3}) == 1
    assert len(kept & {10, 11}) == 1
    assert 20 in kept  # the loner has no >=0.95 neighbor anywhere


def test_keeps_lowest_centroid_cos_member(spark):
    out = semdedup(_vecs(spark), "embedding", "vec_id",
                   threshold=0.95, n_cells=2, seed=7)
    rows = out.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell_rows in by_cell.values():
        grp = [r for r in cell_rows if r["vec_id"] in {1, 2, 3}]
        if len(grp) == 3:
            kept = [r for r in grp if r["keep"]]
            assert len(kept) == 1
            # survivor is the priority minimum: (centroid_cos, id)
            want = min(grp, key=lambda r: (r["centroid_cos"], r["vec_id"]))
            assert kept[0]["vec_id"] == want["vec_id"]


def test_partition_invariance(spark):
    df = _vecs(spark)
    a = sorted(tuple(r) for r in semdedup(
        df.repartition(1), "embedding", "vec_id",
        threshold=0.95, n_cells=2, seed=7).collect())
    b = sorted(tuple(r) for r in semdedup(
        df.repartition(5), "embedding", "vec_id",
        threshold=0.95, n_cells=2, seed=7).collect())
    assert a == b


def test_no_dups_keeps_everything(spark):
    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), float(i % 3), 1.0])
            for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, "embedding", "vec_id", threshold=0.9999,
                   n_cells=2, seed=7)
    assert out.filter(~F.col("keep")).isEmpty()
    assert out.count() == 8


def test_null_vector_survives_with_null_cell(spark):
    rows = [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           semdedup(df, "embedding", "vec_id",
                    threshold=0.95, n_cells=2, seed=7).collect()}
    # the NULL vector gets no cell, joins no pair, and is kept
    assert out[3]["cell"] is None and out[3]["keep"]
    assert sum(1 for r in out.values() if r["keep"] and r["cell"] is not None) == 1


def test_auto_n_cells_matches_explicit_floor(spark):
    """n_cells="auto" on a tiny corpus clamps to the floor of 8 and
    produces the same labels as n_cells=8 (one count job, passed
    through to the quantizer)."""
    df = _vecs(spark)
    a = sorted(tuple(r) for r in
               semdedup(df, "embedding", "vec_id",
                        threshold=0.95, n_cells="auto", seed=7).collect())
    b = sorted(tuple(r) for r in
               semdedup(df, "embedding", "vec_id",
                        threshold=0.95, n_cells=8, seed=7).collect())
    assert a == b
