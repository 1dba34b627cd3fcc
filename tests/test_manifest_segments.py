"""Manifest segments (Iceberg manifest-file analog): above
SEGMENT_MIN_FILES entries the file list moves into immutable segment
files and each append commit writes O(delta) metadata instead of
rewriting the full O(table) listing; readers hydrate transparently;
expire GCs unreferenced segments with an in-flight age guard."""

import json
import os

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable


@pytest.fixture()
def small_seg(monkeypatch):
    monkeypatch.setattr(SnapshotTable, "SEGMENT_MIN_FILES", 2)
    monkeypatch.setattr(SnapshotTable, "SEGMENT_ORPHAN_AGE_SEC", 0.0)


def _raw(t, v=None):
    v = v if v is not None else t.current_version()
    with open(t._manifest_path(v)) as f:
        return json.load(f)


def _ids(spark, t, **kw):
    return sorted(r["id"] for r in t.read(spark, **kw).collect())


def test_segments_kick_in_and_stay_o_delta(spark, tmp_path, small_seg):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 2).toDF("id").repartition(1),
            stats_cols=("id",))
    assert "segments" not in _raw(t)  # below threshold: inline
    t.write(spark.range(2, 6).toDF("id").repartition(4))
    raw2 = _raw(t)
    assert raw2.get("segments") and "files" not in raw2
    assert raw2["n_files"] == len(t.manifest()["files"])
    # append-shaped commit: parent segments carried, ONE new segment
    t.write(spark.range(6, 9).toDF("id").repartition(3))
    raw3 = _raw(t)
    assert raw3["segments"][:len(raw2["segments"])] == raw2["segments"]
    assert len(raw3["segments"]) == len(raw2["segments"]) + 1
    # the manifest JSON itself is O(delta), not O(table)
    assert len(json.dumps(raw3)) < 2000
    # readers hydrate: data + time travel + stats skipping intact
    assert _ids(spark, t) == list(range(9))
    assert _ids(spark, t, version=2) == list(range(6))
    m = t.manifest()
    assert raw3["n_files"] == len(m["files"])
    assert set(m["stats"]) <= set(m["files"])
    sel, total = t.files_pruned(("id", 7, 8))
    assert sel < total


def test_metadata_only_commit_adds_no_segment(spark, tmp_path, small_seg):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 6).toDF("id").repartition(6),
            stats_cols=("id",))
    segs_before = _raw(t)["segments"]
    # MoR delete: files unchanged -> exactly the same segment list
    t.delete_where(spark, "id = 3", mode="mor", key_cols=("id",))
    raw = _raw(t)
    assert raw["segments"] == segs_before
    assert raw["deletes"]  # delete entry inline
    assert _ids(spark, t) == [0, 1, 2, 4, 5]


def test_rewrite_repacks_and_seq_survives(spark, tmp_path, small_seg):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 6).toDF("id").repartition(6),
            stats_cols=("id",))
    t.delete_where(spark, "id = 0", mode="mor", key_cols=("id",))
    t.write(spark.range(0, 1).toDF("id"))  # re-ingest id 0
    assert _ids(spark, t) == list(range(6))
    t.compact(spark, target_files=2)  # repack + settle
    raw = _raw(t)
    assert len(raw["segments"]) == 1
    assert not raw.get("deletes")
    assert _ids(spark, t) == list(range(6))


def test_segment_cap_triggers_repack(spark, tmp_path, small_seg, monkeypatch):
    monkeypatch.setattr(SnapshotTable, "SEGMENT_MAX_COUNT", 3)
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 4).toDF("id").repartition(4))
    for k in range(4, 8):
        t.write(spark.range(k, k + 1).toDF("id"))
    raw = _raw(t)
    assert len(raw["segments"]) <= 3
    assert _ids(spark, t) == list(range(8))


def test_expire_gcs_unreferenced_segments(spark, tmp_path, small_seg):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 5).toDF("id").repartition(5))
    t.write(spark.range(5, 6).toDF("id"))
    t.write(spark.range(0, 3).toDF("id").repartition(3),
            mode="overwrite")  # old segments now unreferenced at head
    all_segs = set(os.listdir(t.seg_dir))
    t.expire_snapshots(keep_last=1)
    kept = set(os.listdir(t.seg_dir))
    assert kept < all_segs  # something was GC'd
    assert set(_raw(t)["segments"]) <= kept  # live ones retained
    assert _ids(spark, t) == [0, 1, 2]


def test_tagged_snapshot_keeps_its_segments(spark, tmp_path, small_seg):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 5).toDF("id").repartition(5))
    t.tag("prod")
    v_tag = t.current_version()
    t.write(spark.range(5, 11).toDF("id").repartition(6),
            mode="overwrite")
    t.expire_snapshots(keep_last=1)
    # tagged snapshot still fully readable through its segments
    assert _ids(spark, t, version="prod") == list(range(5))
    assert _ids(spark, t, version=v_tag) == list(range(5))
