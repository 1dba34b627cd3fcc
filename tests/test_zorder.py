"""Z-order clustered compaction: interleaved-bit Morton layout so
per-file min/max stats prune range reads on EVERY clustered column
(OPTIMIZE ZORDER BY analog)."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.operators.zorder import zorder_layout, zvalue_col


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def _grid(spark, n=64):
    """n x n grid in a z-hostile order (row-major by x, so a plain
    append skips on x but never on y)."""
    return (spark.range(n * n)
            .select((F.col("id") % n).alias("x"),
                    (F.col("id") / n).cast("long").alias("y"),
                    F.col("id").alias("payload")))


def test_zvalue_bit_interleave_exact(spark):
    """2-bit toy case, checked against the hand-computed Morton codes:
    z = y1 x1 y0 x0 (x at even bits, y at odd)."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = zvalue_col([F.col("x"), F.col("y")], [(0, 3), (0, 3)], bits=2)
    got = {(r["x"], r["y"]): r["z"]
           for r in df.withColumn("z", z).collect()}

    def morton(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out
    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zvalue_null_and_constant_columns(spark):
    df = spark.createDataFrame([(None, 5), (3, 5)], "x long, y long")
    z = zvalue_col([F.col("x"), F.col("y")], [(0, 3), (5, 5)], bits=2)
    got = [r["z"] for r in df.withColumn("z", z).collect()]
    # NULL x -> code 0; constant y -> code 0 everywhere
    assert got[0] == 0
    assert got[1] == 0b0101  # x=3 -> bits at even positions


def test_zorder_layout_validates(spark):
    df = _grid(spark, 8)
    with pytest.raises(ValueError, match="not in"):
        zorder_layout(df, ["nope"], 4)
    allnull = df.withColumn("x", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="all-NULL"):
        zorder_layout(allnull, ["x"], 4)
    with pytest.raises(ValueError, match="exceeds"):
        zvalue_col([F.col("x")] * 4, [(0, 1)] * 4, bits=16)


def test_clustered_compaction_prunes_both_columns(spark, tbl):
    """The observable point of z-order: after compact(cluster_by=(x,y))
    into 16 files, a narrow range on EITHER column selects a strict
    subset of files; the row-major layout only ever skipped on x."""
    n = 64
    tbl.write(_grid(spark, n).repartitionByRange(16, "x"),
              stats_cols=("x", "y"))
    # row-major baseline: x skips, y reads everything
    sel_y_before, total_before = tbl.files_pruned(("y", 10, 13))
    assert sel_y_before == total_before == 16

    tbl.compact(spark, target_files=16, cluster_by=("x", "y"))
    sel_x, total = tbl.files_pruned(("x", 10, 13))
    sel_y, _ = tbl.files_pruned(("y", 10, 13))
    assert total == 16
    assert sel_x <= total // 2, f"x prune too weak: {sel_x}/{total}"
    assert sel_y <= total // 2, f"y prune too weak: {sel_y}/{total}"
    # 2-D point-ish query: the AND of both prunes
    sel_xy, _ = tbl.files_pruned([("x", 10, 13), ("y", 10, 13)])
    assert sel_xy <= min(sel_x, sel_y)
    assert tbl.manifest()["properties"]["cluster_by"] == ["x", "y"]


def test_clustered_read_rows_exact(spark, tbl):
    """Pruned multi-range read returns exactly the relational answer
    (skipping is sound: no row lost, filter still applied row-level)."""
    n = 32
    tbl.write(_grid(spark, n), stats_cols=("x", "y"))
    tbl.compact(spark, target_files=8, cluster_by=("x", "y"))
    got = sorted(r["payload"] for r in tbl.read(
        spark, between=[("x", 3, 5), ("y", 7, 9)]).collect())
    exp = sorted(y * n + x for x in range(3, 6) for y in range(7, 10))
    assert got == exp


def test_single_between_still_works(spark, tbl):
    tbl.write(_grid(spark, 16), stats_cols=("x",))
    got = {r["payload"] for r in
           tbl.read(spark, between=("x", 0, 1)).collect()}
    assert got == {y * 16 + x for x in range(2) for y in range(16)}
