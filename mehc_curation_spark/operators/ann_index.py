"""Persisted IVF ANN index over the snapshot catalog.

Build-once / query-many similarity search — the 100 TB production
shape that the in-memory :func:`~mehc_curation_spark.operators.
similarity.ivf_topk` (which retrains per call) deliberately is not:

- :func:`save_ivf_index` trains the deterministic coarse quantizer
  once, assigns every vector its cell, RANGE-partitions the rows by
  cell id and commits them as a :class:`SnapshotTable` with per-file
  min/max stats on ``ivf_cell`` — so each data file covers a narrow
  contiguous band of cells and the manifest can prune whole files.
  The centroid matrix travels IN the manifest properties (a few KB),
  never a separate artifact to version or lose.
- :func:`append_to_ivf_index` assigns NEW vectors with the SAME
  stored centroids and appends them (atomic snapshot commit) — the
  incremental-ingest path; cell stats keep pruning sound because
  skipping falls back to reading any file without stats.
- :func:`ivf_topk_from_table` probes the ``n_probe`` nearest cells by
  reading ONLY the files whose cell range overlaps each probed cell
  (`SnapshotTable.read(between=...)`), then exact-cosine top-k inside
  the probed minority. At 1000 executors this is a metadata-pruned
  scan of ~n_probe/n_cells of the data — no shuffle at all on the
  query path.

No analog in the reference repo (its dedup has no index structures);
IVF partitioning follows Jégou et al., "Product Quantization for
Nearest Neighbor Search" (the coarse-quantizer stage), as the
in-memory variant does.
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.operators.similarity import (
    cosine_topk,
    ivf_index,
    make_cell_assign_udf,
)

CELL_COL = "ivf_cell"


def save_ivf_index(df: DataFrame, vec_col: str, id_col: str,
                   table_path: str, n_cells=16,
                   seed: int = 42) -> tuple[SnapshotTable, np.ndarray]:
    """Train + persist an IVF index; returns (table, centers).

    ``n_cells="auto"`` corpus-sizes the cell count (~1k vectors per
    cell — see :func:`..similarity.ivf_index`), the setting a
    build-once/query-many index should ship with.

    One snapshot commit: rows clustered by cell (range partition →
    contiguous cell bands per file, stats on ``ivf_cell``), centroids
    and index config in the manifest properties."""
    assigned, centers = ivf_index(df, vec_col, n_cells, seed, id_col=id_col)
    n_cells = len(centers)  # resolved count when "auto" was passed
    clustered = (assigned.withColumnRenamed("_ivf_cell", CELL_COL)
                 .repartitionByRange(n_cells, CELL_COL)
                 .sortWithinPartitions(CELL_COL))
    table = SnapshotTable(table_path)
    table.write(clustered, mode="overwrite",
                properties=_index_properties(centers, n_cells, vec_col,
                                             id_col, seed),
                stats_cols=(CELL_COL,))
    return table, centers


def _index_properties(centers: np.ndarray, n_cells: int, vec_col: str,
                      id_col: str, seed: int) -> dict:
    return {"ivf_centers": json.dumps(centers.tolist()),
            "ivf_n_cells": n_cells, "ivf_vec_col": vec_col,
            "ivf_id_col": id_col, "ivf_seed": seed}


def load_ivf_centers(table: SnapshotTable,
                     version: Optional[int] = None,
                     props: Optional[dict] = None) -> np.ndarray:
    """Pass ``props`` when the manifest is already loaded — it carries
    the full serialized centroid matrix, so re-parsing it is the
    single largest redundant read on the append/query paths."""
    if props is None:
        props = table.manifest(version).get("properties", {})
    if "ivf_centers" not in props:
        raise ValueError(f"{table.path}: not an IVF index table "
                         "(no ivf_centers in manifest properties)")
    return np.asarray(json.loads(props["ivf_centers"]), dtype=np.float64)


def append_to_ivf_index(df: DataFrame, table_path: str) -> int:
    """Assign new vectors with the STORED centroids and append them as
    one snapshot — cells never drift between ingests, so results for
    old rows are stable and pruning stays correct. Returns the new
    snapshot version.

    Concurrency: the centroids are captured BEFORE the commit race,
    so if a concurrent retrain (save_ivf_index overwrite) lands in
    between, this append's rows would be assigned under stale centers
    and its properties would clobber the fresh ones. After the commit
    wins, every intervening snapshot's centroids are checked against
    the ones used; any drift raises so the caller re-runs the append
    against the new index (mirrors catalog.compact()'s conflict
    abort)."""
    table = SnapshotTable(table_path)
    parent_v = table.current_version()
    props = table.manifest().get("properties", {})
    centers = load_ivf_centers(table, props=props)
    vec_col = props["ivf_vec_col"]
    n_cells = int(props["ivf_n_cells"])
    assigned = df.withColumn(CELL_COL,
                             make_cell_assign_udf(centers)(F.col(vec_col)))
    clustered = (assigned.repartitionByRange(max(1, n_cells // 4), CELL_COL)
                 .sortWithinPartitions(CELL_COL))
    # properties carry forward so load_ivf_centers works on any version
    v = table.write(clustered, mode="append",
                    properties=_index_properties(
                        centers, n_cells, vec_col,
                        props["ivf_id_col"], int(props["ivf_seed"])),
                    stats_cols=(CELL_COL,))
    for i in range(parent_v + 1, v):
        try:
            other = table.manifest(i).get("properties", {})
        except FileNotFoundError:
            continue
        if other.get("ivf_centers") != props.get("ivf_centers"):
            raise RuntimeError(
                "append_to_ivf_index: the index was retrained "
                f"concurrently (snapshot {i} carries different "
                "centroids) — this append's rows are assigned under "
                "stale centers; rebuild or re-run the append against "
                "the current index")
    return v


def probe_cells(centers: np.ndarray, query: Sequence[float],
                n_probe: int) -> list[int]:
    """The ``n_probe`` cell ids nearest to the query (stable order —
    deterministic ties), computed driver-side from the stored
    centroid matrix: no Spark job, no scan."""
    q = np.asarray(list(query), dtype=np.float64)
    d2 = ((centers - q[None, :]) ** 2).sum(axis=1)
    return [int(c) for c in np.argsort(d2, kind="stable")[:n_probe]]


def ivf_topk_from_table(spark: SparkSession, table_path: str,
                        query: Sequence[float], k: int = 10,
                        n_probe: int = 4, round_to: int = 4) -> DataFrame:
    """ANN top-k against a PERSISTED index: file-skipped reads of the
    probed cells only, exact cosine inside them. Matches the in-memory
    :func:`ivf_topk` exactly for the same (data, n_cells, seed,
    n_probe) — same centroids (deterministic trainer), same cells,
    same exact-cosine ranking."""
    table = SnapshotTable(table_path)
    props = table.manifest().get("properties", {})
    centers = load_ivf_centers(table, props=props)
    vec_col, id_col = props["ivf_vec_col"], props["ivf_id_col"]
    cells = probe_cells(centers, query, n_probe)
    # one skipped read per CONTIGUOUS cell run (appended files pack
    # several adjacent cells, so per-cell reads scanned the same file
    # once per cell it spans), exact cell membership via isin
    runs, start, prev = [], None, None
    for c in sorted(cells):
        if start is None:
            start = prev = c
        elif c == prev + 1:
            prev = c
        else:
            runs.append((start, prev))
            start = prev = c
    runs.append((start, prev))
    parts = [table.read(spark, between=(CELL_COL, lo, hi))
             for lo, hi in runs]
    cand = (reduce(DataFrame.unionByName, parts)
            .filter(F.col(CELL_COL).isin(*cells)).drop(CELL_COL))
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)
