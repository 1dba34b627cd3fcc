"""Copy-on-write row-level operations on the snapshot catalog:
DELETE (predicate + takedown-by-id with manifest-stats file pruning),
UPDATE-in-place, and MERGE upsert — the Iceberg v2 row-op analogs
(takedown / re-scrub / label-correction at corpus scale)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import (
    CommitConflictError,
    SnapshotTable,
)


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def _files(tbl):
    return list(tbl.manifest()["files"])


def _mk(spark, tbl):
    """Two appends with disjoint id ranges -> at least two files whose
    per-file id stats do not overlap."""
    df1 = spark.range(0, 100).toDF("id").withColumn(
        "txt", F.concat(F.lit("a"), F.col("id")))
    df2 = spark.range(1000, 1100).toDF("id").withColumn(
        "txt", F.concat(F.lit("b"), F.col("id")))
    tbl.write(df1.coalesce(1), stats_cols=("id",))
    tbl.write(df2.coalesce(1), stats_cols=("id",))
    return tbl


# ---------------------------------------------------------------------------
# delete_where
# ---------------------------------------------------------------------------

def test_delete_where_removes_only_matches(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    v = tbl.delete_where(spark, "id % 10 = 3")
    got = sorted(r["id"] for r in tbl.read(spark).collect())
    exp = sorted(i for i in list(range(100)) + list(range(1000, 1100))
                 if i % 10 != 3)
    assert got == exp
    assert tbl.current_version() == v
    # time travel still sees the pre-delete rows
    assert tbl.read(spark, version=v - 1).count() == 200
    # both files contained matches -> both rewritten
    assert not set(before) & set(_files(tbl))


def test_delete_where_rewrites_only_affected_files(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    tbl.delete_where(spark, (F.col("id") >= 1000) & (F.col("id") < 1010))
    after = _files(tbl)
    # the 0-99 file had no matching rows: its file survives byte-identical
    assert before[0] in after
    assert before[1] not in after
    assert tbl.read(spark).count() == 190


def test_delete_where_null_predicate_keeps_row(spark, tbl):
    df = spark.createDataFrame([(1, "x"), (2, None), (3, "y")],
                               "id long, txt string")
    tbl.write(df)
    tbl.delete_where(spark, F.col("txt") == "x")  # NULL -> not deleted
    assert sorted(r["id"] for r in tbl.read(spark).collect()) == [2, 3]


def test_delete_where_no_match_is_a_noop(spark, tbl):
    _mk(spark, tbl)
    v = tbl.current_version()
    assert tbl.delete_where(spark, "id < 0") == v
    assert tbl.current_version() == v


# ---------------------------------------------------------------------------
# delete_ids (takedown shape)
# ---------------------------------------------------------------------------

def test_delete_ids_prunes_files_by_stats(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    # ids live entirely in the second file's [1000,1099] range
    v = tbl.delete_ids(spark, "id", [1001, 1005, 999999])
    assert tbl.current_version() == v
    after = _files(tbl)
    assert before[0] in after          # pruned by stats, never rewritten
    assert before[1] not in after
    got = sorted(r["id"] for r in tbl.read(spark).collect())
    assert 1001 not in got and 1005 not in got
    assert len(got) == 198


def test_delete_ids_outside_all_ranges_is_noop(spark, tbl):
    _mk(spark, tbl)
    v = tbl.current_version()
    assert tbl.delete_ids(spark, "id", [5000, 6000]) == v


def test_delete_ids_large_list_broadcast_path(spark, tbl):
    _mk(spark, tbl)
    # >1000 ids forces the broadcast-join path; only 3 of them exist
    ids = [10, 20, 1050] + list(range(100000, 101200))
    tbl.delete_ids(spark, "id", ids)
    got = sorted(r["id"] for r in tbl.read(spark).collect())
    assert len(got) == 197
    assert not {10, 20, 1050} & set(got)


def test_delete_ids_rejects_null(spark, tbl):
    _mk(spark, tbl)
    with pytest.raises(ValueError, match="NULL id"):
        tbl.delete_ids(spark, "id", [1, None])


# ---------------------------------------------------------------------------
# update_where (re-scrub in place)
# ---------------------------------------------------------------------------

def test_update_where_updates_only_matches(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    tbl.update_where(spark, "id % 2 = 0",
                     {"txt": F.concat(F.lit("SCRUBBED:"), F.col("txt"))})
    rows = {r["id"]: r["txt"] for r in tbl.read(spark).collect()}
    assert rows[4] == "SCRUBBED:a4"
    assert rows[5] == "a5"
    assert rows[1002] == "SCRUBBED:b1002"
    assert len(rows) == 200
    assert not set(before) & set(_files(tbl))  # both files had matches


def test_update_where_rejects_unknown_column(spark, tbl):
    _mk(spark, tbl)
    with pytest.raises(ValueError, match="non-existent column"):
        tbl.update_where(spark, "id = 1", {"nope": F.lit("x")})


def test_update_where_rejects_type_change(spark, tbl):
    _mk(spark, tbl)
    with pytest.raises(ValueError, match="column types"):
        tbl.update_where(spark, "id = 1", {"txt": F.lit(3.14)})


def test_update_where_null_condition_leaves_row(spark, tbl):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, txt string")
    tbl.write(df)
    tbl.update_where(spark, F.col("txt") == "x", {"txt": F.lit("u")})
    rows = {r["id"]: r["txt"] for r in tbl.read(spark).collect()}
    assert rows == {1: "u", 2: None}


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------

def test_merge_upsert_updates_and_inserts(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    src = spark.createDataFrame(
        [(5, "UPD5"), (1001, "UPD1001"), (7777, "NEW")], "id long, txt string")
    tbl.merge_upsert(spark, src, "id")
    rows = {r["id"]: r["txt"] for r in tbl.read(spark).collect()}
    assert len(rows) == 201
    assert rows[5] == "UPD5" and rows[1001] == "UPD1001"
    assert rows[7777] == "NEW"
    assert rows[6] == "a6"
    assert not set(before) & set(_files(tbl))  # both files had matched keys


def test_merge_upsert_pure_insert_appends_without_rewrite(spark, tbl):
    _mk(spark, tbl)
    before = _files(tbl)
    src = spark.createDataFrame([(9000, "n")], "id long, txt string")
    tbl.merge_upsert(spark, src, "id")
    after = _files(tbl)
    assert set(before) <= set(after)  # nothing rewritten
    assert tbl.read(spark).count() == 201


def test_merge_upsert_column_order_reconciled(spark, tbl):
    _mk(spark, tbl)
    src = spark.createDataFrame([("swapped", 5)], "txt string, id long")
    tbl.merge_upsert(spark, src, "id")
    rows = {r["id"]: r["txt"] for r in tbl.read(spark).collect()}
    assert rows[5] == "swapped"


def test_merge_upsert_rejects_duplicate_keys(spark, tbl):
    _mk(spark, tbl)
    src = spark.createDataFrame([(5, "a"), (5, "b")], "id long, txt string")
    with pytest.raises(ValueError, match="duplicate source keys"):
        tbl.merge_upsert(spark, src, "id")


def test_merge_upsert_rejects_null_keys(spark, tbl):
    _mk(spark, tbl)
    src = spark.createDataFrame([(None, "a")], "id long, txt string")
    with pytest.raises(ValueError, match="NULL source key"):
        tbl.merge_upsert(spark, src, "id")


def test_merge_upsert_rejects_schema_mismatch(spark, tbl):
    _mk(spark, tbl)
    src = spark.createDataFrame([(5, "a", 1)], "id long, txt string, x long")
    with pytest.raises(ValueError, match="source columns"):
        tbl.merge_upsert(spark, src, "id")


# ---------------------------------------------------------------------------
# concurrency + layout guards
# ---------------------------------------------------------------------------

def test_delete_aborts_on_concurrent_overwrite(spark, tbl, monkeypatch):
    _mk(spark, tbl)
    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.write(spark.range(3).toDF("id")
                        .withColumn("txt", F.lit("z")), mode="overwrite")
        return orig(self, build, max_attempts)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    with pytest.raises(CommitConflictError, match="invalidated"):
        tbl.delete_where(spark, "id >= 0")
    assert tbl.read(spark).count() == 3  # overwrite state survives


def test_delete_carries_forward_concurrent_append(spark, tbl, monkeypatch):
    _mk(spark, tbl)
    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.write(spark.range(7777, 7778).toDF("id")
                        .withColumn("txt", F.lit("c")))
        return orig(self, build, max_attempts)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    tbl.delete_where(spark, "id < 50")
    got = sorted(r["id"] for r in tbl.read(spark).collect())
    assert 7777 in got  # concurrent append survived the rewrite commit
    assert min(got) == 50 and len(got) == 151


def test_row_ops_refused_on_ledger_tables(spark, tbl):
    _mk(spark, tbl)
    os.makedirs(os.path.join(tbl.path, "_ledger"), exist_ok=True)
    with open(os.path.join(tbl.path, "_ledger", "ledger.json"), "w") as f:
        json.dump({}, f)
    for fn in (lambda: tbl.delete_where(spark, "id = 1"),
               lambda: tbl.update_where(spark, "id = 1", {"txt": F.lit("x")}),
               lambda: tbl.merge_upsert(
                   spark, spark.createDataFrame([(1, "x")],
                                                "id long, txt string"), "id")):
        with pytest.raises(ValueError, match="ledger-managed"):
            fn()


def test_stats_refresh_after_delete_keeps_skipping(spark, tbl):
    _mk(spark, tbl)
    tbl.delete_where(spark, "id >= 1050")
    sel, total = tbl.files_pruned(("id", 2000, 3000))
    assert sel == 0 and total == 2  # rewritten file re-collected id stats
    sel, _ = tbl.files_pruned(("id", 1000, 1010))
    assert sel == 1


# ---------------------------------------------------------------------------
# snapshot_diff (row-level changelog)
# ---------------------------------------------------------------------------

class TestSnapshotDiff:
    def test_classifies_all_change_types(self, spark, tbl):
        _mk(spark, tbl)
        v1 = tbl.current_version()
        tbl.delete_where(spark, F.col("id") % 10 == 3)
        tbl.update_where(spark, F.col("id") % 10 == 4,
                         {"txt": F.upper(F.col("txt"))})
        tbl.merge_upsert(spark, spark.range(3).select(
            (F.col("id") + 5000).alias("id"),
            F.lit("new").alias("txt")), "id")
        pdf = tbl.snapshot_diff(spark, v1, id_col="id").toPandas()
        by = {k: set(g["id"]) for k, g in pdf.groupby("_change_type")}
        assert by["delete"] == {i for i in list(range(100))
                                + list(range(1000, 1100)) if i % 10 == 3}
        assert by["insert"] == {5000, 5001, 5002}
        assert by["update_before"] == by["update_after"] == \
            {i for i in list(range(100)) + list(range(1000, 1100))
             if i % 10 == 4}
        ua = pdf[pdf._change_type == "update_after"]
        assert all(t.startswith(("A", "B")) for t in ua["txt"])

    def test_same_version_and_compaction_empty(self, spark, tbl):
        _mk(spark, tbl)
        v = tbl.current_version()
        assert tbl.snapshot_diff(spark, v, id_col="id").count() == 0
        tbl.compact(spark, target_files=1)
        # rows moved files but did not change -> suppressed
        assert tbl.snapshot_diff(spark, v, id_col="id").count() == 0

    def test_common_files_never_read(self, spark, tbl):
        _mk(spark, tbl)
        v1 = tbl.current_version()
        # touch only the low-id file (stats-pruned delete)
        tbl.delete_ids(spark, "id", [3, 7])
        d = tbl.snapshot_diff(spark, v1, id_col="id")
        read = {os.path.basename(f) for f in d.inputFiles()}
        common = set(tbl.manifest(v1)["files"]) & \
            set(tbl.manifest()["files"])
        assert common, "expected the untouched file to be carried over"
        assert not {os.path.basename(f) for f in common} & read
        assert {r["id"] for r in d.collect()} == {3, 7}

    def test_schema_evolution_aligns_as_null(self, spark, tbl):
        _mk(spark, tbl)
        v1 = tbl.current_version()
        extra = spark.range(9000, 9003).toDF("id").select(
            "id", F.lit("x").alias("txt"), F.lit(1.5).alias("score"))
        tbl.write(extra.coalesce(1), mode="append", stats_cols=("id",),
                  allow_schema_evolution=True)
        pdf = tbl.snapshot_diff(spark, v1, id_col="id").toPandas()
        # old rows live in common files -> only the inserts appear
        assert set(pdf["_change_type"]) == {"insert"}
        assert set(pdf["id"]) == {9000, 9001, 9002}
        assert list(pdf["score"]) == [1.5, 1.5, 1.5]

    def test_bad_id_col_raises(self, spark, tbl):
        _mk(spark, tbl)
        v1 = tbl.current_version()
        tbl.delete_ids(spark, "id", [3])
        with pytest.raises(ValueError, match="id_col"):
            tbl.snapshot_diff(spark, v1, id_col="nope")


# ---------------------------------------------------------------------------
# review regressions: UPDATE pre-row semantics, schema evolution, pruning
# ---------------------------------------------------------------------------

class TestUpdateSemantics:
    def test_assignments_see_pre_update_row(self, spark, tbl):
        # SQL UPDATE evaluates every RHS against the OLD row: a swap
        # must swap (a withColumn chain would feed b the new a)
        df = spark.createDataFrame([(1, 10, 20), (2, 30, 40)],
                                   "id long, a long, b long")
        tbl.write(df.coalesce(1), stats_cols=("id",))
        tbl.update_where(spark, F.col("a") == 10,
                         {"a": F.col("b"), "b": F.col("a")})
        rows = {r["id"]: (r["a"], r["b"])
                for r in tbl.read(spark).collect()}
        assert rows[1] == (20, 10)
        assert rows[2] == (30, 40)

    def test_condition_on_assigned_column(self, spark, tbl):
        # condition references a column the first assignment rewrites:
        # the SECOND assignment must still fire (old-row condition)
        _mk(spark, tbl)
        tbl.update_where(spark, "txt = 'a1'",
                         {"txt": "'z1'", "id": "id + 100000"})
        rows = {r["txt"]: r["id"] for r in tbl.read(spark).collect()}
        assert rows["z1"] == 100001
        assert "a1" not in rows


class TestRowOpsAfterSchemaEvolution:
    def _evolve(self, spark, tbl):
        _mk(spark, tbl)  # two pre-evolution files (no `score`)
        extra = spark.range(9000, 9003).toDF("id").select(
            "id", F.lit("x").alias("txt"), F.lit(1.5).alias("score"))
        tbl.write(extra.coalesce(1), mode="append", stats_cols=("id",),
                  allow_schema_evolution=True)

    def test_update_condition_mixing_old_and_evolved_cols(self, spark, tbl):
        self._evolve(spark, tbl)
        # affected file predates the evolution -> needs NULL alignment
        tbl.update_where(spark, "(score > 2.0) OR id = 5",
                         {"txt": "upper(txt)"})
        rows = {r["id"]: r for r in tbl.read(spark).collect()}
        assert rows[5]["txt"] == "A5" and rows[5]["score"] is None
        assert rows[6]["txt"] == "a6"

    def test_merge_key_in_pre_evolution_file(self, spark, tbl):
        self._evolve(spark, tbl)
        src = spark.createDataFrame([(7, "merged", 9.9)],
                                    "id long, txt string, score double")
        tbl.merge_upsert(spark, src, "id")
        rows = {r["id"]: r for r in tbl.read(spark).collect()}
        assert rows[7]["txt"] == "merged" and rows[7]["score"] == 9.9
        assert rows[9000]["score"] == 1.5

    def test_delete_on_evolved_column(self, spark, tbl):
        self._evolve(spark, tbl)
        tbl.delete_where(spark, "score > 1.0")
        ids = {r["id"] for r in tbl.read(spark).collect()}
        assert not ids & {9000, 9001, 9002}
        assert 5 in ids  # NULL score -> condition NULL -> row kept


def test_merge_detection_pruned_by_key_stats(spark, tbl, monkeypatch):
    """A source whose key range cannot overlap a file's recorded
    min/max stats must never open that file — detection included."""
    _mk(spark, tbl)
    low_file = tbl.manifest(1)["files"][0]  # the 0-99 file
    calls = []
    orig = SnapshotTable._read_rel_files

    def spy(self, spark_, rel_files, with_file_col=False, align_to=None):
        calls.append(list(rel_files))
        return orig(self, spark_, rel_files,
                    with_file_col=with_file_col, align_to=align_to)
    monkeypatch.setattr(SnapshotTable, "_read_rel_files", spy)
    src = spark.createDataFrame([(1001, "upd"), (1098, "upd2")],
                                "id long, txt string")
    tbl.merge_upsert(spark, src, "id")
    assert calls, "expected at least the detection scan"
    assert all(low_file not in c for c in calls)
    rows = {r["id"]: r["txt"] for r in tbl.read(spark).collect()}
    assert rows[1001] == "upd" and rows[1098] == "upd2"
    assert rows[0] == "a0" and len(rows) == 200


def test_snapshot_diff_from_version_zero_is_all_inserts(spark, tbl):
    """from_version=0 = the empty pre-creation snapshot ('everything
    since creation'), never a silent diff of current-vs-current."""
    _mk(spark, tbl)
    pdf = tbl.snapshot_diff(spark, 0, id_col="id").toPandas()
    assert set(pdf["_change_type"]) == {"insert"}
    assert len(pdf) == 200
