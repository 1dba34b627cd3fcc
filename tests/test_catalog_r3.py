"""Round-3 catalog hardening: compaction conflict abort, sidecar
in-flight age guard, configurable data-skipping stats columns, and the
real-Iceberg routing branch."""

import os

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import (
    CommitConflictError,
    SnapshotTable,
    load_table,
)


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


# ---------------------------------------------------------------------------
# compact() aborts when an overwrite invalidated its base (ADVICE r2)
# ---------------------------------------------------------------------------

def test_compact_aborts_on_concurrent_overwrite(spark, tbl, monkeypatch):
    tbl.write(spark.range(10).toDF("id"))
    tbl.write(spark.range(10, 20).toDF("id"))

    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64):
        # first interception: a concurrent OVERWRITE lands between
        # compact()'s base-manifest read and its manifest CAS
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.write(spark.range(3).toDF("id"), mode="overwrite")
        return orig(self, build, max_attempts)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    with pytest.raises(CommitConflictError, match="invalidated"):
        tbl.compact(spark, target_files=1)
    # the overwrite's state survives untouched (no resurrected rows)
    assert tbl.read(spark).count() == 3


def test_compact_carries_forward_concurrent_append(spark, tbl, monkeypatch):
    tbl.write(spark.range(10).toDF("id"))

    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.write(spark.range(100, 105).toDF("id"), mode="append")
        return orig(self, build, max_attempts)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    tbl.compact(spark, target_files=1)  # appends are carried, no abort
    assert tbl.read(spark).count() == 15


# ---------------------------------------------------------------------------
# sidecar in-flight age guard (ADVICE r2)
# ---------------------------------------------------------------------------

def test_inflight_sidecars_survive_young_sweep(spark, tbl):
    tbl.write(spark.range(4).toDF("id"))
    # a live writer moved its parquet + sidecars but has not yet won
    # the manifest CAS: nothing of it may be swept while young
    inflight = os.path.join(tbl.data_dir, "cafe0001-part-9.parquet")
    crc = os.path.join(tbl.data_dir, ".cafe0001-part-9.parquet.crc")
    success = os.path.join(tbl.data_dir, "_SUCCESS")
    for p in (inflight, crc, success):
        open(p, "w").close()
    assert tbl.remove_orphan_files(older_than_sec=3600.0) == 0
    assert all(os.path.exists(p) for p in (inflight, crc, success))
    # past the age cutoff the whole set goes
    assert tbl.remove_orphan_files(older_than_sec=0.0) == 3
    assert not any(os.path.exists(p) for p in (inflight, crc, success))


def test_live_file_keeps_checksum_through_sweep(spark, tbl):
    tbl.write(spark.range(4).toDF("id"))
    committed = tbl.manifest()["files"][0]
    crc = os.path.join(tbl.data_dir, f".{committed}.crc")
    open(crc, "w").close()
    assert tbl.remove_orphan_files(older_than_sec=0.0) == 0
    assert os.path.exists(crc)


# ---------------------------------------------------------------------------
# configurable data-skipping stats columns (VERDICT r2 item 9)
# ---------------------------------------------------------------------------

def _banded_df(spark, lo, hi):
    return (spark.range(lo, hi).coalesce(1)
            .select(F.col("id").alias("phash"),
                    (F.col("id") * 10).alias("n_chars")))


def test_stats_cols_enable_pruning_on_second_column(spark, tbl):
    # three files with disjoint n_chars ranges, stats on BOTH columns
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        tbl.write(_banded_df(spark, lo, hi),
                  stats_cols=("phash", "n_chars"))
    sel, total = tbl.files_pruned(("n_chars", 250, 290))
    assert total == 3 and sel == 1
    got = tbl.read(spark, between=("n_chars", 250, 290))
    assert got.count() == 5  # rows 25..29
    # phash skipping still works too
    sel_p, _ = tbl.files_pruned(("phash", 0, 5))
    assert sel_p == 1


def test_default_stats_cols_record_no_second_column(spark, tbl):
    tbl.write(_banded_df(spark, 0, 10))
    stats = tbl.manifest()["stats"]
    assert all(set(v) == {"phash"} for v in stats.values())
    # no stats on n_chars -> skipping must be SOUND (reads everything)
    sel, total = tbl.files_pruned(("n_chars", 0, 1))
    assert sel == total


# ---------------------------------------------------------------------------
# real-Iceberg routing branch (VERDICT r2 item 10)
# ---------------------------------------------------------------------------

def _iceberg_available(spark) -> bool:
    try:
        spark.read.format("iceberg").load("nonexistent.catalog_probe")
        return True
    except Exception as e:
        return "DATA_SOURCE_NOT_FOUND" not in str(e) \
            and "Failed to find" not in str(e)


def test_load_table_routes_catalog_identifier_to_iceberg(spark):
    """A path-free identifier must reach the Iceberg reader and fail
    LOUDLY when no runtime jars are present — never silently fall back
    to a parquet read of a relative path."""
    if _iceberg_available(spark):
        pytest.skip("iceberg runtime present; routing covered by real read")
    with pytest.raises(Exception) as ei:
        load_table(spark, "db.some_table")
    msg = str(ei.value)
    assert "iceberg" in msg.lower() or "DATA_SOURCE_NOT_FOUND" in msg \
        or "Failed to find" in msg
