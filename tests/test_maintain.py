"""Table health report + one-shot maintenance: health() is
metadata-only; maintain() runs exactly what the health warrants
(settle MoR debt, compact, expire, sweep) and returns a
before/actions/after record."""

import os

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(f"img{i:03d}", f"caption {i}", i % 4) for i in range(40)],
        ["image_id", "caption", "phash"])
    t.write(df)
    return t


def test_health_fresh_table(tbl):
    h = tbl.health()
    assert h["version"] == 1 and h["snapshots_retained"] == 1
    assert h["data_files"] == len(tbl.manifest()["files"])
    assert h["small_files"] == h["data_files"]  # test files are tiny
    assert h["bytes_total"] > 0 and h["file_bytes_median"] > 0
    assert h["pending_delete_files"] == 0
    assert h["unreferenced_files"] == 0
    assert h["files_missing_on_disk"] == 0
    assert h["ledger_managed"] is False


def test_health_sees_debt_and_orphans(spark, tbl):
    tbl.delete_where(spark, "phash = 1", mode="mor")
    stray = os.path.join(tbl.data_dir, "stray-no-manifest.parquet")
    with open(stray, "wb") as f:
        f.write(b"not really parquet")
    h = tbl.health()
    assert h["pending_delete_files"] == 1
    assert h["unreferenced_files"] == 1
    # the delete-key file itself is referenced, not an orphan
    os.remove(stray)
    assert tbl.health()["unreferenced_files"] == 0


def test_maintain_compacts_settles_and_expires(spark, tbl):
    # fragment: three more appends -> >4 files, all tiny
    for i in range(3):
        tbl.write(spark.createDataFrame(
            [(f"new{i}", "x", 9)], ["image_id", "caption", "phash"]))
    tbl.delete_where(spark, "phash = 2", mode="mor")
    expect = sorted(r[0] for r in
                    tbl.read(spark).select("image_id").collect())
    rep = tbl.maintain(spark, target_files=2, keep_last=1)
    names = [a["action"] for a in rep["actions"]]
    assert names[0] == "compact"          # one rewrite settles the debt
    assert "apply_deletes" not in names   # no second rewrite
    assert "expire" in names
    after = rep["after"]
    assert after["pending_delete_files"] == 0
    assert after["data_files"] <= 2 + 0   # target_files
    assert after["snapshots_retained"] == 1
    assert after["unreferenced_files"] == 0  # expire swept old files
    got = sorted(r[0] for r in
                 tbl.read(spark).select("image_id").collect())
    assert got == expect


def test_maintain_applies_debt_without_compaction(spark, tbl):
    tbl.compact(spark, target_files=1)
    tbl.delete_where(spark, "phash = 3", mode="mor")
    rep = tbl.maintain(spark, target_files=8, keep_last=2)
    names = [a["action"] for a in rep["actions"]]
    assert "apply_deletes" in names and "compact" not in names
    assert rep["after"]["pending_delete_files"] == 0
    assert tbl.read(spark).filter("phash = 3").count() == 0


def test_maintain_noop_on_healthy_table(spark, tbl):
    tbl.compact(spark, target_files=1)
    tbl.expire_snapshots(keep_last=1)
    rep = tbl.maintain(spark, target_files=8, keep_last=2)
    assert rep["actions"] == []
    assert rep["before"]["version"] == rep["after"]["version"]


def test_maintain_skips_compaction_on_ledger_tables(spark, tbl):
    for i in range(10):
        tbl.write(spark.createDataFrame(
            [(f"l{i}", "x", 1)], ["image_id", "caption", "phash"]))
    os.makedirs(os.path.join(tbl.path, "_ledger"), exist_ok=True)
    with open(os.path.join(tbl.path, "_ledger", "ledger.json"), "w") as f:
        f.write("{}")
    rep = tbl.maintain(spark, target_files=2, keep_last=2)
    assert rep["before"]["ledger_managed"] is True
    assert "compact" not in [a["action"] for a in rep["actions"]]
