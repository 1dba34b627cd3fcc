"""semdedup oversize-cell guard + n_cells='auto' sizing (VERDICT r3
item 4): a cell that exceeds max_cell_rows must refuse loudly (its
applyInPandas pass requires the cell to fit executor memory) instead
of OOMing mid-stage, and 'auto' must size cells from the corpus."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import ivf_index, semdedup


def _emb(spark, n=64, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("float")
                  for i in range(dim)]).alias("embedding"))


def test_oversize_cell_refused(spark):
    df = _emb(spark, 64)
    with pytest.raises(Exception, match="max_cell_rows"):
        (semdedup(df, "embedding", "vec_id", threshold=0.99,
                  n_cells=2, max_cell_rows=10)
         .write.format("noop").mode("overwrite").save())


def test_normal_cells_pass_guard(spark):
    df = _emb(spark, 64)
    out = semdedup(df, "embedding", "vec_id", threshold=0.99,
                   n_cells=2, max_cell_rows=1000)
    assert out.count() == 64


def test_auto_n_cells_floors_at_8(spark):
    df = _emb(spark, 64)
    out = semdedup(df, "embedding", "vec_id", threshold=0.99,
                   n_cells="auto")
    # 64 rows -> 64//2048 = 0 -> clamped to 8 cells
    assert out.select("cell").distinct().count() <= 8
    assert out.count() == 64


def test_ivf_auto_n_cells_resolves(spark):
    df = _emb(spark, 64)
    assigned, centers = ivf_index(df, "embedding", n_cells="auto",
                                  id_col="vec_id")
    assert len(centers) == 8  # 64//1024 = 0 -> clamped to 8
    assert assigned.filter(F.col("_ivf_cell") >= 8).count() == 0
