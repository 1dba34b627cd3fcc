"""Sequence-number scoping of merge-on-read equality deletes
(Iceberg v2 data-sequence semantics, ADVICE r3 medium): a pending
equality delete masks only data files OLDER than itself, so a row
re-ingested after a takedown (same key, newer file) is visible, and
apply_deletes()/compact() never physically drop it.

Reference parity: mehc-curation has no snapshot store; this pins our
Iceberg-analog catalog against real Iceberg's documented scoping of
equality deletes by sequence number to older data files.
"""

import os

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import CommitConflictError, SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(f"img{i:03d}", f"caption {i}", i % 5) for i in range(30)],
        ["image_id", "caption", "phash"])
    t.write(df, stats_cols=("image_id",))
    return t


def ids(df):
    return sorted(r[0] for r in df.select("image_id").collect())


def _reingest(spark, tbl, key="img003", caption="re-ingested"):
    tbl.write(spark.createDataFrame(
        [(key, caption, 99)], ["image_id", "caption", "phash"]))


def test_reingested_key_visible_after_mor_delete(spark, tbl):
    tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    assert tbl.read(spark).filter("image_id = 'img003'").count() == 0
    _reingest(spark, tbl)
    got = tbl.read(spark).filter("image_id = 'img003'").collect()
    # the NEW row (newer file than the delete) is visible; the old
    # row stays masked
    assert len(got) == 1 and got[0]["caption"] == "re-ingested"
    # and the delete still masks the other keys it recorded
    tbl.delete_where(spark, "phash = 1", mode="mor")
    assert tbl.read(spark).filter(
        "phash = 1 and caption like 'caption%'").count() == 0


def test_manifest_records_seq_metadata(spark, tbl):
    v_del = tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    m = tbl.manifest()
    assert m["deletes"][0]["seq"] is not None
    fseq = m["file_seq"]
    old_files = tbl.manifest(v_del)["files"]
    new_files = [f for f in m["files"] if f not in old_files]
    assert new_files
    assert all(fseq[f] > m["deletes"][0]["seq"] for f in new_files)
    assert all(fseq[f] < m["deletes"][0]["seq"] for f in old_files)


def test_apply_deletes_keeps_reingested_row(spark, tbl):
    tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    expect = ids(tbl.read(spark))
    tbl.apply_deletes(spark)
    m = tbl.manifest()
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect
    # physically: the re-ingested row survives the raw scan, the old
    # one is gone
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(tbl.data_dir, f) for f in m["files"]])
    rows = raw.filter("image_id = 'img003'").collect()
    assert len(rows) == 1 and rows[0]["caption"] == "re-ingested"


def test_compact_keeps_reingested_row(spark, tbl):
    tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    expect = ids(tbl.read(spark))
    tbl.compact(spark, target_files=2)
    m = tbl.manifest()
    assert not m.get("deletes")
    assert ids(tbl.read(spark)) == expect
    raw = spark.read.parquet(
        *[os.path.join(tbl.data_dir, f) for f in m["files"]])
    rows = raw.filter("image_id = 'img003'").collect()
    assert len(rows) == 1 and rows[0]["caption"] == "re-ingested"


def test_cow_rewrite_preserves_delete_scoping(spark, tbl):
    # eq debt rides through a CoW delete (_commit_rewrite); rewritten
    # files must inherit the max replaced seq so the pending delete
    # still masks their rows — and a re-ingested row stays visible
    tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    before = ids(tbl.read(spark))
    tbl.delete_where(spark, "phash = 2")  # CoW rewrite of other rows
    got = ids(tbl.read(spark))
    assert got == sorted(set(before) - set(
        i for i in before if int(i[3:]) % 5 == 2 and i != "img003"))
    assert "img003" in got


def test_incremental_read_sees_reingested_key(spark, tbl):
    v1 = tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    inc = tbl.read_incremental(spark, since_version=v1)
    assert ids(inc) == ["img003"]


def test_snapshot_diff_reports_reingest_as_insert(spark, tbl):
    v1 = tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    rows = tbl.snapshot_diff(spark, v1).collect()
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "insert"
    assert rows[0]["image_id"] == "img003"


def test_legacy_seqless_delete_masks_table_wide(spark, tbl):
    # upgrade path: a manifest written before sequence scoping (no
    # seq on the entry, no file_seq) keeps the old table-wide mask
    import json

    tbl.delete_where(spark, "image_id = 'img003'", mode="mor")
    _reingest(spark, tbl)
    v = tbl.current_version()
    p = tbl._manifest_path(v)
    m = json.load(open(p))
    for d in m.get("deletes", []):
        d.pop("seq", None)
    m.pop("file_seq", None)
    m.pop("last_seq", None)
    json.dump(m, open(p, "w"))
    assert tbl.read(spark).filter("image_id = 'img003'").count() == 0


def test_compact_with_concurrent_append_of_deleted_key(
        spark, tbl, monkeypatch):
    # the full ADVICE r3 low: compact() settles a delete while a
    # concurrent append re-ingests a masked key — seq scoping means
    # the append was never masked, so settling changes nothing
    tbl.delete_where(spark, "image_id = 'img007'", mode="mor")
    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64, branch=None):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.write(spark.createDataFrame(
                [("img007", "concurrent", 99)],
                ["image_id", "caption", "phash"]))
        return orig(self, build, max_attempts, branch=branch)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    tbl.compact(spark, target_files=1)
    got = tbl.read(spark).filter("image_id = 'img007'").collect()
    assert len(got) == 1 and got[0]["caption"] == "concurrent"


def _strip_seqs(tbl):
    """Simulate a pre-upgrade manifest: drop the seq stamps from the
    pending delete entries (the files keep theirs — irrelevant, a
    seq-less entry masks table-wide regardless)."""
    import json

    p = tbl._manifest_path(tbl.current_version())
    m = json.load(open(p))
    for d in m["deletes"]:
        d.pop("seq", None)
    json.dump(m, open(p, "w"))
    tbl._seg_cache = {}


def test_compact_aborts_settling_legacy_delete_under_append(
        spark, tbl, monkeypatch):
    # legacy (seq-less) delete entries mask table-wide, so settling
    # them while files were appended concurrently WOULD unmask rows:
    # compact must refuse (ADVICE r3 low, upgrade corner). The
    # write-path legacy guard (ADVICE r4) kills this race at its
    # source for THIS code version, so the racing writer here
    # no-ops that guard — simulating a mixed-version deployment
    # where a pre-upgrade binary still appends — and compact's
    # defense-in-depth must still hold.
    tbl.delete_where(spark, "image_id = 'img007'", mode="mor")
    _strip_seqs(tbl)

    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64, branch=None):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            monkeypatch.setattr(
                SnapshotTable, "_require_no_legacy_deletes",
                lambda self, op, pm: None)
            clone.write(spark.createDataFrame(
                [("img007", "concurrent", 99)],
                ["image_id", "caption", "phash"]))
        return orig(self, build, max_attempts, branch=branch)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    with pytest.raises(CommitConflictError, match="legacy"):
        tbl.compact(spark, target_files=1)


def test_append_shaped_writes_refuse_legacy_debt(spark, tbl):
    # ADVICE r4 low: a legacy entry masks table-wide, so every
    # append-shaped commit whose rows claim sequence-scoped
    # visibility (plain append, MoR merge/update) must refuse instead
    # of committing rows the read side silently masks.
    tbl.delete_where(spark, "image_id = 'img007'", mode="mor")
    _strip_seqs(tbl)
    row = spark.createDataFrame(
        [("img007", "fresh", 99)], ["image_id", "caption", "phash"])
    with pytest.raises(CommitConflictError, match="LEGACY"):
        tbl.write(row)
    with pytest.raises(CommitConflictError, match="LEGACY"):
        tbl.merge_upsert(spark, row, "image_id", mode="mor")
    with pytest.raises(CommitConflictError, match="LEGACY"):
        tbl.update_where(spark, "image_id = 'img001'",
                         {"caption": F.lit("x")}, mode="mor",
                         key_cols=("image_id",))
    # settling the debt upgrades the table; the same writes then pass
    tbl.apply_deletes(spark)
    tbl.write(row)
    got = tbl.read(spark).filter("image_id = 'img007'").collect()
    assert len(got) == 1 and got[0]["caption"] == "fresh"


def test_concurrent_delete_still_masks_compacted_rows(
        spark, tbl, monkeypatch):
    # the reverse race: a MoR delete commits DURING compact (carried
    # forward); the compacted files inherit the max base seq, so the
    # carried delete (larger seq) still masks the rewritten rows
    orig = SnapshotTable._commit_manifest
    hit = {"done": False}

    def racing_commit(self, build, max_attempts=64, branch=None):
        if not hit["done"]:
            hit["done"] = True
            clone = SnapshotTable(self.path)
            monkeypatch.undo()
            clone.delete_where(spark, "phash = 3", mode="mor")
        return orig(self, build, max_attempts, branch=branch)

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", racing_commit)
    tbl.compact(spark, target_files=1)
    m = tbl.manifest()
    assert m.get("deletes")  # carried forward
    assert tbl.read(spark).filter("phash = 3").count() == 0


# ---------------------------------------------------------------------------
# merge-on-read MERGE (Iceberg v2 MoR upsert): one append-shaped
# commit = source rows + sequence-scoped equality delete of their
# keys. O(source) at any table size, no scan, no rewrite.
# ---------------------------------------------------------------------------

def _src(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, caption string, phash bigint")


def test_mor_merge_matches_cow_merge(spark, tmp_path):
    rows = [(f"img{i:03d}", f"caption {i}", i % 5) for i in range(30)]
    src_rows = [("img003", "corrected", 99),   # update
                ("img900", "brand new", 42)]   # insert
    a = SnapshotTable(str(tmp_path / "cow"))
    b = SnapshotTable(str(tmp_path / "mor"))
    for t in (a, b):
        t.write(spark.createDataFrame(
            rows, ["image_id", "caption", "phash"]),
            stats_cols=("image_id",))
    a.merge_upsert(spark, _src(spark, src_rows), "image_id")
    b.merge_upsert(spark, _src(spark, src_rows), "image_id", mode="mor")
    get = lambda t: sorted(map(tuple, t.read(spark).collect()))
    assert get(a) == get(b)
    # MoR side: data files grew (append), debt pending, no rewrite
    m = b.manifest()
    assert m.get("deletes") and m["deletes"][0]["seq"] is not None
    # settle → still identical, physically deduplicated
    b.apply_deletes(spark)
    assert get(a) == get(b)
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(b.data_dir, f) for f in b.manifest()["files"]])
    assert raw.filter("image_id = 'img003'").count() == 1


def test_mor_merge_legal_with_pending_debt_and_scoped(spark, tbl):
    # unlike CoW merge, MoR merge is allowed while equality debt is
    # pending: its rows carry a newer sequence than the old delete
    tbl.delete_where(spark, "image_id = 'img005'", mode="mor")
    tbl.merge_upsert(
        spark, _src(spark, [("img005", "resurrected", 77)]),
        "image_id", mode="mor")
    got = tbl.read(spark).filter("image_id = 'img005'").collect()
    assert len(got) == 1 and got[0]["caption"] == "resurrected"
    # and the older takedown still masks nothing it shouldn't
    assert tbl.read(spark).count() == 30


def test_mor_merge_chain_last_writer_wins(spark, tbl):
    tbl.merge_upsert(spark, _src(spark, [("img001", "v2", 1)]),
                     "image_id", mode="mor")
    tbl.merge_upsert(spark, _src(spark, [("img001", "v3", 1)]),
                     "image_id", mode="mor")
    got = tbl.read(spark).filter("image_id = 'img001'").collect()
    assert len(got) == 1 and got[0]["caption"] == "v3"
    tbl.compact(spark, target_files=1)
    got = tbl.read(spark).filter("image_id = 'img001'").collect()
    assert len(got) == 1 and got[0]["caption"] == "v3"


def test_mor_merge_validation(spark, tbl):
    with pytest.raises(ValueError, match="NULL"):
        tbl.merge_upsert(spark, _src(spark, [(None, "x", 1)]),
                         "image_id", mode="mor")
    with pytest.raises(ValueError, match="duplicate"):
        tbl.merge_upsert(
            spark, _src(spark, [("a", "x", 1), ("a", "y", 2)]),
            "image_id", mode="mor")


def test_mor_merge_snapshot_diff(spark, tbl):
    v1 = tbl.current_version()
    tbl.merge_upsert(
        spark, _src(spark, [("img002", "patched", 50),
                            ("imgZZ", "inserted", 51)]),
        "image_id", mode="mor")
    rows = tbl.snapshot_diff(spark, v1).collect()
    kinds = sorted((r["image_id"], r["_change_type"]) for r in rows)
    assert kinds == [("img002", "update_after"),
                     ("img002", "update_before"),
                     ("imgZZ", "insert")]


def test_mor_merge_cli(spark, tmp_path):
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t = SnapshotTable(str(tmp_path / "mc"))
    t.write(spark.createDataFrame(
        [("a", "one", 1), ("b", "two", 2)],
        ["image_id", "caption", "phash"]))
    srcp = str(tmp_path / "src.parquet")
    _src(spark, [("a", "ONE", 9), ("c", "three", 3)]) \
        .write.parquet(srcp)
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "table", "merge",
         "-o", t.path, "--source", srcp, "--mor"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    import json as _json
    out = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["pending_delete_files"] == 1
    got = {r["image_id"]: r["caption"] for r in t.read(spark).collect()}
    assert got == {"a": "ONE", "b": "two", "c": "three"}


# ---------------------------------------------------------------------------
# merge-on-read UPDATE: append post-update rows + equality-delete
# their keys in one commit (no rewrite)
# ---------------------------------------------------------------------------

def test_mor_update_matches_cow_update(spark, tmp_path):
    rows = [(f"img{i:03d}", f"caption {i}", i % 5) for i in range(30)]
    a = SnapshotTable(str(tmp_path / "ucow"))
    b = SnapshotTable(str(tmp_path / "umor"))
    for t in (a, b):
        t.write(spark.createDataFrame(
            rows, ["image_id", "caption", "phash"]),
            stats_cols=("image_id",))
    a.update_where(spark, "phash = 2", {"caption": F.lit("scrubbed")})
    files_before = set(b.manifest()["files"])
    b.update_where(spark, "phash = 2", {"caption": F.lit("scrubbed")},
                   mode="mor")
    get = lambda t: sorted(map(tuple, t.read(spark).collect()))
    assert get(a) == get(b)
    m = b.manifest()
    # no rewrite: every pre-update file still referenced, debt pending
    assert files_before <= set(m["files"])
    assert m.get("deletes")
    b.apply_deletes(spark)
    assert get(a) == get(b)


def test_mor_update_legal_with_pending_debt(spark, tbl):
    tbl.delete_where(spark, "image_id = 'img001'", mode="mor")
    tbl.update_where(spark, "phash = 3", {"caption": F.lit("fixed")},
                     mode="mor")
    got = tbl.read(spark)
    # masked row stays masked (not resurrected by the update)
    assert got.filter("image_id = 'img001'").count() == 0
    assert (got.filter("phash = 3").select("caption").distinct().collect()
            == [("fixed",)])


def test_mor_update_key_guards(spark, tbl):
    with pytest.raises(ValueError, match="key"):
        tbl.update_where(spark, "phash = 1",
                         {"image_id": F.lit("x")}, mode="mor")
    # no match -> noop, no debt
    v = tbl.current_version()
    assert tbl.update_where(spark, "phash = 999",
                            {"caption": F.lit("x")}, mode="mor") == v
    assert not tbl.manifest().get("deletes")


def test_mor_update_duplicate_keys_keep_group(spark, tmp_path):
    # two rows share a key; only one matches the condition — the
    # non-matching sibling must survive the key-level delete
    t = SnapshotTable(str(tmp_path / "dup"))
    t.write(spark.createDataFrame(
        [("k", "match me", 1), ("k", "keep me", 2), ("z", "other", 3)],
        ["image_id", "caption", "phash"]))
    t.update_where(spark, "phash = 1", {"caption": F.lit("updated")},
                   mode="mor")
    got = sorted((r["image_id"], r["caption"], r["phash"])
                 for r in t.read(spark).collect())
    assert got == [("k", "keep me", 2), ("k", "updated", 1),
                   ("z", "other", 3)]
