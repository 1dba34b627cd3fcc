"""audit_sample: deterministic per-group QA exemplars — the salted
two-phase top-n must be exactly the naive single window, stable across
partitionings, and seed-rotatable."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mehc_curation_spark.operators.sampling import audit_sample, u48_col


def _df(spark, n=300):
    rows = [(i, None if i % 7 == 0 else f"r{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, "id long, reason string")


def _naive(df, n, seed=0):
    u = u48_col(F.concat(F.lit(f"audit:{seed}:"),
                         F.col("id").cast("string")))
    w = Window.partitionBy("reason").orderBy(u.asc(), F.col("id").asc())
    return (df.withColumn("audit_rank", F.row_number().over(w))
            .filter(F.col("audit_rank") <= n))


def _key(rows):
    return sorted((r["reason"] or "", r["id"], r["audit_rank"])
                  for r in rows)


def test_equals_naive_single_window(spark):
    df = _df(spark)
    got = audit_sample(df, "reason", "id", n_per_group=5).collect()
    want = _naive(df, 5).collect()
    assert _key(got) == _key(want)
    # every group (incl. the NULL reason) produced exactly 5 exemplars
    by_group = {}
    for r in got:
        by_group.setdefault(r["reason"], []).append(r["audit_rank"])
    assert set(by_group) == {None, "r0", "r1", "r2"}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_group.values())


def test_partition_invariance(spark):
    df = _df(spark)
    a = audit_sample(df, "reason", "id", n_per_group=4).collect()
    b = audit_sample(df.repartition(7, "id"), "reason", "id",
                     n_per_group=4).collect()
    assert _key(a) == _key(b)


def test_seed_rotates_exhibit(spark):
    df = _df(spark)
    a = {r["id"] for r in audit_sample(df, "reason", "id", 5,
                                       seed=0).collect()}
    b = {r["id"] for r in audit_sample(df, "reason", "id", 5,
                                       seed=1).collect()}
    assert a != b


def test_small_group_returns_all_rows(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
    got = audit_sample(df, "g", "id", n_per_group=10).collect()
    assert len(got) == 2
    assert sorted(r["audit_rank"] for r in got) == [1, 2]


def test_null_id_dropped_and_validation(spark):
    df = spark.createDataFrame([(None, "x"), (1, "x")], "id long, g string")
    got = audit_sample(df, "g", "id", n_per_group=5).collect()
    assert [r["id"] for r in got] == [1]
    with pytest.raises(ValueError):
        audit_sample(df, "g", "id", n_per_group=0)


def test_internal_column_collision_raises(spark):
    df = spark.createDataFrame([(1, "x", 9)], "id long, g string, _u long")
    with pytest.raises(ValueError, match="_u"):
        audit_sample(df, "g", "id", n_per_group=1)
