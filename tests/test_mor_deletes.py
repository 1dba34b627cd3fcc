"""Merge-on-read equality deletes: delete_where(mode='mor') stages a
delete-key file instead of rewriting data; read() anti-joins the keys;
apply_deletes()/compact() settle the debt (Iceberg v2 equality-delete
analog)."""

import os

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import CommitConflictError, SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(f"img{i:03d}", f"caption {i}", i % 7) for i in range(50)],
        ["image_id", "caption", "phash"])
    t.write(df, stats_cols=("image_id",))
    return t


def ids(df):
    return sorted(r[0] for r in df.select("image_id").collect())


def test_mor_delete_masks_on_read_without_rewriting(spark, tbl):
    files_before = set(tbl.manifest()["files"])
    v = tbl.delete_where(spark, F.col("phash") == 3, mode="mor")
    m = tbl.manifest()
    assert m["version"] == v
    assert set(m["files"]) == files_before  # data files untouched
    assert len(m["deletes"]) == 1
    assert m["deletes"][0]["cols"] == ["image_id"]
    got = tbl.read(spark)
    assert got.filter("phash = 3").count() == 0
    assert got.count() == 50 - 7  # i % 7 == 3 -> {3,10,17,24,31,38,45}
    # time travel: the pre-delete snapshot still shows everything
    assert tbl.read(spark, version=v - 1).count() == 50


def test_mor_delete_row_math(spark, tbl):
    n3 = tbl.read(spark).filter("phash = 3").count()
    tbl.delete_where(spark, F.col("phash") == 3, mode="mor")
    assert tbl.read(spark).count() == 50 - n3


def test_mor_deletes_accumulate_and_survive_append(spark, tbl):
    tbl.delete_where(spark, "phash = 0", mode="mor")
    tbl.delete_where(spark, "phash = 1", mode="mor")
    assert len(tbl.manifest()["deletes"]) == 2
    extra = spark.createDataFrame(
        [("img900", "new", 0)], ["image_id", "caption", "phash"])
    tbl.write(extra)  # append must carry the delete debt forward
    m = tbl.manifest()
    assert len(m["deletes"]) == 2
    got = tbl.read(spark)
    # the appended img900 has phash 0 but its image_id is not in the
    # delete-key file (equality deletes are BY KEY, not re-evaluated
    # predicates)
    assert got.filter("image_id = 'img900'").count() == 1
    assert got.filter("phash = 1").count() == 0


def test_mor_delete_already_masked_keys_not_rerecorded(spark, tbl):
    tbl.delete_where(spark, "phash = 2", mode="mor")
    # overlapping predicate: phash IN (2, 4) — the phash-2 keys are
    # already masked, so only phash-4 keys land in the second file
    tbl.delete_where(spark, "phash in (2, 4)", mode="mor")
    m = tbl.manifest()
    d2 = [d for d in m["deletes"]][1]
    keys = spark.read.parquet(
        os.path.join(tbl.data_dir, d2["file"]))
    joined = keys.join(
        tbl.read(spark, version=1).filter("phash = 2"),
        "image_id", "inner")
    assert joined.count() == 0


def test_mor_no_match_is_noop(spark, tbl):
    v = tbl.current_version()
    assert tbl.delete_where(spark, "phash = 999", mode="mor") == v
    assert "deletes" not in tbl.manifest() or not tbl.manifest().get("deletes")


def test_mor_null_key_refused(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "nk"))
    df = spark.createDataFrame(
        [(None, "x", 1), ("a", "y", 1)], ["image_id", "caption", "phash"])
    t.write(df)
    with pytest.raises(ValueError, match="NULL"):
        t.delete_where(spark, "phash = 1", mode="mor")


def test_apply_deletes_materializes_and_clears(spark, tbl):
    tbl.delete_where(spark, "phash = 5", mode="mor")
    expect = ids(tbl.read(spark))
    v = tbl.apply_deletes(spark)
    m = tbl.manifest()
    assert m["version"] == v
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect
    # physically gone: a raw scan of the current data files has no
    # phash-5 rows left
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(tbl.data_dir, f) for f in m["files"]])
    assert raw.filter("phash = 5").count() == 0


def test_apply_deletes_noop_when_clean(spark, tbl):
    assert tbl.apply_deletes(spark) == tbl.current_version()


def test_apply_deletes_pure_bookkeeping_when_keys_stale(spark, tbl):
    tbl.delete_where(spark, "phash = 6", mode="mor")
    # a cow delete then physically removes those same rows
    tbl.delete_where(spark, "phash = 6")
    v = tbl.apply_deletes(spark)
    m = tbl.manifest()
    assert m["version"] == v and not m.get("deletes")


def test_compact_settles_delete_debt(spark, tbl):
    tbl.delete_where(spark, "phash = 4", mode="mor")
    expect = ids(tbl.read(spark))
    tbl.compact(spark, target_files=2)
    m = tbl.manifest()
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect
    raw = spark.read.parquet(
        *[os.path.join(tbl.data_dir, f) for f in m["files"]])
    assert raw.filter("phash = 4").count() == 0


def test_update_and_merge_refused_with_pending_deletes(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor")
    with pytest.raises(CommitConflictError, match="merge-on-read"):
        tbl.update_where(spark, "phash = 2", {"caption": F.lit("x")})
    src = spark.createDataFrame(
        [("img001", "new", 1)], ["image_id", "caption", "phash"])
    with pytest.raises(CommitConflictError, match="merge-on-read"):
        tbl.merge_upsert(spark, src, "image_id")


def test_retention_keeps_delete_key_files(spark, tbl):
    tbl.delete_where(spark, "phash = 3", mode="mor")
    key_file = tbl.manifest()["deletes"][0]["file"]
    tbl.remove_orphan_files(older_than_sec=0.0)
    assert os.path.exists(os.path.join(tbl.data_dir, key_file))
    tbl.write(spark.createDataFrame(
        [("imgX", "y", 1)], ["image_id", "caption", "phash"]))
    tbl.expire_snapshots(keep_last=1)
    assert os.path.exists(os.path.join(tbl.data_dir, key_file))
    assert tbl.read(spark).filter("phash = 3").count() == 0


def test_snapshot_diff_sees_mor_delete(spark, tbl):
    v1 = tbl.current_version()
    victims = ids(tbl.read(spark).filter("phash = 2"))
    v2 = tbl.delete_where(spark, "phash = 2", mode="mor")
    diff = tbl.snapshot_diff(spark, v1, v2)
    rows = diff.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted(r["image_id"] for r in rows) == victims


def test_snapshot_diff_pruned_path_with_equal_deletes(spark, tbl):
    tbl.delete_where(spark, "phash = 2", mode="mor")
    v2 = tbl.current_version()
    v3 = tbl.write(spark.createDataFrame(
        [("imgZ", "z", 9)], ["image_id", "caption", "phash"]))
    diff = tbl.snapshot_diff(spark, v2, v3).collect()
    assert len(diff) == 1 and diff[0]["_change_type"] == "insert"
    assert diff[0]["image_id"] == "imgZ"


def test_read_incremental_masks_mor_deleted_appends(spark, tbl):
    v1 = tbl.current_version()
    tbl.write(spark.createDataFrame(
        [("imgA", "a", 1), ("imgB", "b", 1)],
        ["image_id", "caption", "phash"]))
    tbl.delete_where(spark, "image_id = 'imgA'", mode="mor")
    inc = tbl.read_incremental(spark, since_version=v1)
    assert ids(inc) == ["imgB"]


def test_mor_rollback_restores_mask(spark, tbl):
    tbl.delete_where(spark, "phash = 0", mode="mor")
    v_mor = tbl.current_version()
    masked = ids(tbl.read(spark))
    tbl.apply_deletes(spark)
    tbl.rollback(v_mor)
    m = tbl.manifest()
    assert m.get("deletes")
    assert ids(tbl.read(spark)) == masked


# ---------------------------------------------------------------------------
# position deletes (Iceberg v2 position-delete analog)
# ---------------------------------------------------------------------------

def test_pos_delete_masks_without_rewriting(spark, tbl):
    files_before = set(tbl.manifest()["files"])
    n5 = tbl.read(spark).filter("phash = 5").count()
    v = tbl.delete_where(spark, "phash = 5", mode="mor_pos")
    m = tbl.manifest()
    assert m["version"] == v
    assert set(m["files"]) == files_before
    assert m["deletes"][0]["kind"] == "pos"
    assert tbl.read(spark).filter("phash = 5").count() == 0
    assert tbl.read(spark).count() == 50 - n5
    assert tbl.read(spark, version=v - 1).count() == 50  # time travel


def test_pos_delete_handles_null_and_duplicate_keys(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "pk"))
    df = spark.createDataFrame(
        [(None, "kill me", 1), (None, "keep me", 2),
         ("dup", "kill me", 1), ("dup", "keep me", 2)],
        ["image_id", "caption", "phash"])
    t.write(df)
    # equality delete refuses NULL keys; position delete just works
    with pytest.raises(ValueError, match="NULL"):
        t.delete_where(spark, "phash = 1", mode="mor")
    t.delete_where(spark, "phash = 1", mode="mor_pos")
    got = t.read(spark).collect()
    assert sorted(r["caption"] for r in got) == ["keep me", "keep me"]
    # the duplicate-key row with phash=2 survived (an equality delete
    # on image_id would have over-deleted it)
    assert any(r["image_id"] == "dup" for r in got)


def test_pos_delete_blocks_cow_until_settled(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor_pos")
    with pytest.raises(CommitConflictError, match="POSITION"):
        tbl.delete_where(spark, "phash = 2")  # cow
    with pytest.raises(CommitConflictError, match="POSITION"):
        tbl.delete_ids(spark, "image_id", ["img001"])
    tbl.apply_deletes(spark)
    assert not tbl.manifest().get("deletes")
    # settled: cow delete proceeds
    tbl.delete_where(spark, "phash = 2")
    assert tbl.read(spark).filter("phash in (1, 2)").count() == 0


def test_eq_debt_does_not_block_cow_delete(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor")
    tbl.delete_where(spark, "phash = 2")  # cow rewrite, eq debt rides
    got = tbl.read(spark)
    assert got.filter("phash in (1, 2)").count() == 0
    assert len(tbl.manifest()["deletes"]) == 1  # eq debt carried


def test_pos_delete_survives_append_and_masks_only_old_rows(spark, tbl):
    tbl.delete_where(spark, "phash = 0", mode="mor_pos")
    masked = tbl.read(spark).count()
    tbl.write(spark.createDataFrame(
        [("imgN", "new", 0)], ["image_id", "caption", "phash"]))
    got = tbl.read(spark)
    assert got.count() == masked + 1
    assert got.filter("image_id = 'imgN'").count() == 1  # new row alive


def test_compact_settles_pos_debt(spark, tbl):
    tbl.delete_where(spark, "phash = 4", mode="mor_pos")
    expect = ids(tbl.read(spark))
    tbl.compact(spark, target_files=2)
    m = tbl.manifest()
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect


def test_mixed_eq_and_pos_debt_settles_together(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor")
    tbl.delete_where(spark, "phash = 2", mode="mor_pos")
    expect = ids(tbl.read(spark))
    assert len(tbl.manifest()["deletes"]) == 2
    tbl.apply_deletes(spark)
    m = tbl.manifest()
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect
    assert tbl.read(spark).filter("phash in (1, 2)").count() == 0


def test_pos_delete_nomatch_noop_and_no_rerecord(spark, tbl):
    v = tbl.current_version()
    assert tbl.delete_where(spark, "phash = 99", mode="mor_pos") == v
    tbl.delete_where(spark, "phash = 3", mode="mor_pos")
    # overlapping second delete: already-masked coordinates are not
    # re-recorded (the detection scan reads the MASKED table)
    tbl.delete_where(spark, "phash in (3, 4)", mode="mor_pos")
    import os as _os
    d2 = tbl.manifest()["deletes"][1]
    keys = spark.read.parquet(_os.path.join(tbl.data_dir, d2["file"]))
    # count masked coordinates == number of phash-4 rows only
    n4 = tbl.read(spark, version=1).filter("phash = 4").count()
    assert keys.count() == n4


def test_snapshot_diff_sees_pos_delete(spark, tbl):
    v1 = tbl.current_version()
    victims = ids(tbl.read(spark).filter("phash = 6"))
    v2 = tbl.delete_where(spark, "phash = 6", mode="mor_pos")
    rows = tbl.snapshot_diff(spark, v1, v2).collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted(r["image_id"] for r in rows) == victims


def test_health_reports_pos_debt(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor")
    tbl.delete_where(spark, "phash = 2", mode="mor_pos")
    h = tbl.health()
    assert h["pending_delete_files"] == 2
    assert h["pending_position_delete_files"] == 1
