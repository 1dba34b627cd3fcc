"""Per-file bloom-filter point-lookup skipping in the snapshot
catalog: pruning power, soundness, survival through compaction and
row-op rewrites, takedown integration."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import SnapshotTable


@pytest.fixture()
def bloom_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    # ids deliberately interleaved across files so MIN/MAX ranges all
    # overlap and range skipping alone can never prune a point lookup
    df = spark.createDataFrame(
        [(f"img{i:04d}", i % 7, f"cap {i}") for i in range(400)],
        "image_id string, bucket int, caption string")
    t.write(df.repartition(8), mode="overwrite",
            stats_cols=("bucket",), bloom_cols=("image_id",))
    return t


def test_point_lookup_prunes_files(spark, bloom_table):
    sel, total = bloom_table.files_pruned(None, eq=("image_id", "img0042"))
    assert total == 8
    assert 1 <= sel < total  # bloom narrowed where ranges couldn't
    out = bloom_table.read(spark, eq=("image_id", "img0042")).collect()
    assert [r.image_id for r in out] == ["img0042"]


def test_absent_key_prunes_everything(spark, bloom_table):
    sel, total = bloom_table.files_pruned(None, eq=("image_id", "nope"))
    assert sel == 0
    df = bloom_table.read(spark, eq=("image_id", "nope"))
    assert df.count() == 0
    assert "image_id" in df.columns  # schema preserved on empty


def test_eq_matches_full_scan(spark, bloom_table):
    for key in ("img0000", "img0399", "img0207"):
        fast = sorted(map(tuple, bloom_table.read(
            spark, eq=("image_id", key)).collect()))
        slow = sorted(map(tuple, bloom_table.read(spark)
                          .filter(F.col("image_id") == key).collect()))
        assert fast == slow and len(fast) == 1


def test_no_bloom_recorded_is_sound(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "plain"))
    df = spark.createDataFrame([(f"a{i}", i) for i in range(20)],
                               "image_id string, v int")
    t.write(df.repartition(4), mode="overwrite")
    sel, total = t.files_pruned(None, eq=("image_id", "a5"))
    assert sel == total  # nothing recorded -> nothing pruned
    assert t.read(spark, eq=("image_id", "a5")).count() == 1


def test_unsupported_probe_type_is_sound(spark, bloom_table):
    # float probes can't be encoded: must scan, never mis-prune
    sel, total = bloom_table.files_pruned(None, eq=("bucket", 3.5))
    assert sel == 0 or sel <= total  # min/max may still prune
    # int bucket column has no bloom; eq read still correct
    n = bloom_table.read(spark, eq=("bucket", 3)).count()
    assert n == bloom_table.read(spark).filter("bucket = 3").count()


def test_eq_and_between_combined(spark, bloom_table):
    rows = bloom_table.read(
        spark, between=("bucket", 0, 3),
        eq=("image_id", "img0042")).collect()
    assert [r.image_id for r in rows] == ["img0042"]  # 42 % 7 == 0


def test_blooms_survive_compaction(spark, bloom_table):
    v = bloom_table.compact(spark, target_files=3)
    assert v > 1
    sel, total = bloom_table.files_pruned(None, eq=("image_id", "nope"))
    assert total == 3 and sel == 0  # rebuilt blooms still veto
    out = bloom_table.read(spark, eq=("image_id", "img0042")).collect()
    assert [r.image_id for r in out] == ["img0042"]


def test_blooms_survive_row_op_rewrite(spark, bloom_table):
    bloom_table.delete_ids(spark, "image_id", ["img0042"])
    assert bloom_table.read(
        spark, eq=("image_id", "img0042")).count() == 0
    # the rewritten file carries a fresh bloom: absent keys still prune
    sel, _ = bloom_table.files_pruned(None, eq=("image_id", "nope"))
    assert sel == 0


def test_takedown_probe_uses_bloom(spark, bloom_table):
    # an id absent from the table: bloom veto means NO detection scan
    # candidates at all, and the manifest version must not advance
    v0 = bloom_table.current_version()
    v1 = bloom_table.delete_ids(spark, "image_id", ["absent-id"])
    assert v0 == v1


def test_append_keeps_old_blooms(spark, bloom_table):
    extra = spark.createDataFrame([("zzz9999", 1, "new")],
                                  "image_id string, bucket int, caption string")
    bloom_table.write(extra.coalesce(1), mode="append",
                      stats_cols=("bucket",), bloom_cols=("image_id",))
    sel, total = bloom_table.files_pruned(None, eq=("image_id", "zzz9999"))
    assert total == 9 and sel == 1
    sel2, _ = bloom_table.files_pruned(None, eq=("image_id", "img0042"))
    assert 1 <= sel2 < 9
