"""Persisted IVF index: build / prune / append / parity with the
in-memory path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.operators.ann_index import (
    CELL_COL,
    append_to_ivf_index,
    ivf_topk_from_table,
    load_ivf_centers,
    probe_cells,
    save_ivf_index,
)
from mehc_curation_spark.operators.similarity import ivf_topk


def _vec_df(spark, n, dim=16, seed=3, id_start=0):
    rng = np.random.default_rng(seed)
    rows = [(id_start + i, rng.standard_normal(dim).tolist())
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_persisted_matches_in_memory(spark, tmp_path):
    rows, df = _vec_df(spark, 300)
    path = str(tmp_path / "ivf")
    save_ivf_index(df, "embedding", "vec_id", path, n_cells=8, seed=42)
    q = rows[17][1]
    got = ivf_topk_from_table(spark, path, q, k=5, n_probe=3).collect()
    exp = ivf_topk(df, "embedding", "vec_id", q, k=5, n_cells=8,
                   n_probe=3, seed=42).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == \
        [(r["vec_id"], r["cos"]) for r in exp]
    # the self row is rank 1 (its own cell is always the top probe)
    assert got[0]["vec_id"] == 17


def test_probe_reads_skip_files(spark, tmp_path):
    _, df = _vec_df(spark, 400)
    path = str(tmp_path / "ivf")
    table, centers = save_ivf_index(df, "embedding", "vec_id", path,
                                    n_cells=8, seed=42)
    # range-partitioned by cell → a single-cell probe prunes most files
    pruned_any = False
    for c in range(8):
        sel, total = table.files_pruned((CELL_COL, c, c))
        assert sel <= total
        pruned_any = pruned_any or sel < total
    assert pruned_any and total > 1


def test_append_uses_stored_centroids(spark, tmp_path):
    rows, df = _vec_df(spark, 200)
    path = str(tmp_path / "ivf")
    table, centers = save_ivf_index(df, "embedding", "vec_id", path,
                                    n_cells=8, seed=42)
    # append a near-copy of row 5 with a new id
    planted = (np.asarray(rows[5][1]) + 0.01).tolist()
    extra = spark.createDataFrame([(9000, planted)],
                                  "vec_id long, embedding array<double>")
    v2 = append_to_ivf_index(extra, path)
    assert v2 == table.current_version()
    # centroids identical on the new version (no drift across ingests)
    assert np.array_equal(load_ivf_centers(table), centers)
    assert np.array_equal(load_ivf_centers(table, version=v2), centers)
    # the appended vector is findable: probing around row 5 returns it
    got = ivf_topk_from_table(spark, path, rows[5][1], k=2, n_probe=2)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids[0] == 5 and 9000 in ids


def test_probe_cells_deterministic():
    centers = np.arange(24, dtype=np.float64).reshape(8, 3)
    assert probe_cells(centers, [0.0, 1.0, 2.0], 3) == [0, 1, 2]


def test_load_centers_rejects_plain_table(spark, tmp_path):
    path = str(tmp_path / "plain")
    SnapshotTable(path).write(spark.range(3), mode="overwrite")
    with pytest.raises(ValueError, match="not an IVF index"):
        load_ivf_centers(SnapshotTable(path))


def test_null_and_ragged_vectors_survive_persistence(spark, tmp_path):
    rows, df = _vec_df(spark, 100)
    bad = spark.createDataFrame([(900, None), (901, [1.0])],
                                "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    save_ivf_index(df.unionByName(bad), "embedding", "vec_id", path,
                   n_cells=4, seed=42)
    # NULL-cell rows are committed but never probed (cell IS NULL
    # fails every between filter); queries still work
    got = ivf_topk_from_table(spark, path, rows[0][1], k=3, n_probe=2)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids[0] == 0 and 900 not in ids and 901 not in ids


def test_compact_preserves_index_properties_and_stats(spark, tmp_path):
    """compact() must not brick a persisted index: centroids (manifest
    properties) and the ivf_cell stats columns survive the rewrite."""
    rows, df = _vec_df(spark, 200)
    path = str(tmp_path / "ivf")
    table, centers = save_ivf_index(df, "embedding", "vec_id", path,
                                    n_cells=8, seed=42)
    # a couple of appends -> the small-files case compaction exists for
    for j in range(2):
        extra = spark.createDataFrame(
            [(5000 + j, rows[j][1])], "vec_id long, embedding array<double>")
        append_to_ivf_index(extra, path)
    table.compact(spark, target_files=2)
    assert np.array_equal(load_ivf_centers(table), centers)
    m = table.manifest()
    assert m["properties"].get("compaction") is True
    assert any(CELL_COL in e for e in m["stats"].values())
    # queries still work and still match pre-compaction semantics
    got = ivf_topk_from_table(spark, path, rows[0][1], k=3, n_probe=2)
    assert [r["vec_id"] for r in got.collect()][0] == 0


def test_ivf_index_empty_input_raises(spark):
    from mehc_curation_spark.operators.similarity import ivf_index

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no trainable vectors"):
        ivf_index(empty, "embedding", n_cells=4, id_col="vec_id")
    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no trainable vectors"):
        ivf_index(nulls, "embedding", n_cells=4, id_col="vec_id")
