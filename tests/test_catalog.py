"""SnapshotTable: atomic commit, append/overwrite lineage, time travel,
schema pinning, snapshot expiry."""

import os

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable, load_table


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def test_append_and_time_travel(spark, tbl):
    df1 = spark.range(5).toDF("id")
    df2 = spark.range(5, 8).toDF("id")
    v1 = tbl.write(df1)
    v2 = tbl.write(df2)
    assert (v1, v2) == (1, 2)
    assert tbl.read(spark, version=1).count() == 5
    assert tbl.read(spark).count() == 8
    assert tbl.manifest(2)["parent"] == 1


def test_overwrite_starts_fresh(spark, tbl):
    tbl.write(spark.range(5).toDF("id"))
    tbl.write(spark.range(2).toDF("id"), mode="overwrite")
    assert tbl.read(spark).count() == 2
    assert tbl.read(spark, version=1).count() == 5  # still time-travelable


def test_schema_pinned_on_append(spark, tbl):
    tbl.write(spark.range(3).toDF("id"))
    bad = spark.range(3).selectExpr("id", "id * 2 AS extra")
    with pytest.raises(ValueError, match="schema mismatch"):
        tbl.write(bad)


def test_expire_snapshots(spark, tbl):
    tbl.write(spark.range(5).toDF("id"))
    tbl.write(spark.range(3).toDF("id"), mode="overwrite")
    removed = tbl.expire_snapshots(keep_last=1)
    assert removed >= 1
    assert tbl.read(spark).count() == 3
    with pytest.raises(FileNotFoundError):
        # v1 manifest gone
        tbl.read(spark, version=1)


def test_load_table_fallback_paths(spark, tbl, tmp_path):
    tbl.write(spark.range(4).toDF("id"))
    assert load_table(spark, tbl.path).count() == 4
    plain = str(tmp_path / "plain")
    spark.range(6).toDF("id").write.parquet(plain)
    assert load_table(spark, plain).count() == 6
