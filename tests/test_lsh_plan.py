"""Banded-LSH parameter planner: S-curve error areas, (bands, rows)
selection, auto-tuned minhash_near_dups, and the oracled plan table."""

import duckdb
import pytest

from mehc_curation_spark.operators.similarity import (
    lsh_error_areas, lsh_plan, lsh_plan_table, minhash_near_dups)


def test_plan_threshold_trend():
    # lower thresholds need steeper-earlier curves: more bands, fewer
    # rows; the picks walk monotonically as the threshold rises.
    picks = [lsh_plan(t, 32)[0] for t in (0.2, 0.4, 0.6, 0.8, 0.95)]
    assert picks == sorted(picks, reverse=True)
    assert lsh_plan(0.3, 32) == (16, 2)
    assert lsh_plan(0.5, 32) == (8, 4)
    assert lsh_plan(0.85, 32) == (2, 16)


def test_plan_uses_all_hashes():
    for t in (0.1, 0.3, 0.5, 0.7, 0.9):
        for k in (16, 32, 64):
            b, r = lsh_plan(t, k)
            assert b * r == k


def test_recall_bias_never_fewer_bands():
    # fn_weight > 1 can only push toward MORE bands (higher recall)
    for t in (0.3, 0.5, 0.7, 0.85):
        b1, _ = lsh_plan(t, 32, fn_weight=1.0)
        b4, _ = lsh_plan(t, 32, fn_weight=4.0)
        assert b4 >= b1


def test_error_areas_bounds_and_extremes():
    fp, fn = lsh_error_areas(8, 4, 0.5)
    assert 0.0 <= fp <= 0.5 and 0.0 <= fn <= 0.5
    # 32 bands of 1 row: candidate prob is huge everywhere -> fn ~ 0
    _, fn1 = lsh_error_areas(32, 1, 0.5)
    assert fn1 == pytest.approx(0.0, abs=1e-6)
    # 1 band of 32 rows: almost never fires below 1.0 -> fp ~ 0
    fp2, _ = lsh_error_areas(1, 32, 0.5)
    assert fp2 == pytest.approx(0.0, abs=1e-9)


def test_plan_validation():
    with pytest.raises(ValueError):
        lsh_plan(0.0, 32)
    with pytest.raises(ValueError):
        lsh_plan(1.0, 32)
    with pytest.raises(ValueError):
        lsh_plan(0.5, 0)


def test_plan_table_matches_pure_python_and_oracle(spark):
    pdf = lsh_plan_table(spark, thresholds=(0.3, 0.5, 0.7),
                         num_hashes=32, grid=200).toPandas()
    # rank-1 row per threshold == the fn_weight=1 planner pick
    for t in (0.3, 0.5, 0.7):
        row = pdf[(pdf.threshold == t) & (pdf.plan_rank == 1)].iloc[0]
        assert (row.bands, row.n_rows) == lsh_plan(t, 32)
    # value-for-value vs the DuckDB twin (the driver-oracle contract)
    sql = r"""
        WITH divs AS (
          SELECT t.threshold, b.bands, 32 // b.bands AS n_rows
          FROM (VALUES (0.3),(0.5),(0.7)) t(threshold)
          CROSS JOIN (VALUES (1),(2),(4),(8),(16),(32)) b(bands)
        ),
        grid AS (SELECT (i - 0.5)/200.0 AS s FROM generate_series(1,200) g(i)),
        e AS (
          SELECT threshold, bands, n_rows,
            SUM(CASE WHEN s < threshold
                THEN 1 - POWER(1 - POWER(s, n_rows), bands) ELSE 0 END)/200.0 AS fp,
            SUM(CASE WHEN s >= threshold
                THEN POWER(1 - POWER(s, n_rows), bands) ELSE 0 END)/200.0 AS fn
          FROM divs CROSS JOIN grid GROUP BY 1,2,3
        )
        SELECT threshold, bands, n_rows,
          ROUND(fp,6) AS fp_area, ROUND(fn,6) AS fn_area,
          ROUND(fp+fn,6) AS total_err,
          ROUND(fp+fn,6) AS weighted_err,
          ROW_NUMBER() OVER (PARTITION BY threshold
                             ORDER BY ROUND(fp+fn,6), bands) AS plan_rank
        FROM e
    """
    dpdf = duckdb.sql(sql).df()
    cols = list(pdf.columns)
    a = sorted(map(tuple, pdf[cols].astype(str).values.tolist()))
    b = sorted(map(tuple, dpdf[cols].astype(str).values.tolist()))
    assert a == b


def test_plan_table_weighted_rank_matches_auto_tuner(spark):
    # ADVICE r3: with fn_weight=4.0 (the auto-tuner's bias) the
    # table's rank-1 row must be the banding the auto-tuner picks
    pdf = lsh_plan_table(spark, thresholds=(0.3, 0.5, 0.7),
                         num_hashes=32, grid=200,
                         fn_weight=4.0).toPandas()
    for t in (0.3, 0.5, 0.7):
        row = pdf[(pdf.threshold == t) & (pdf.plan_rank == 1)].iloc[0]
        assert (row.bands, row.n_rows) == lsh_plan(t, 32, fn_weight=4.0)
        # components are rounded to 6dp independently of the weighted
        # sum: worst case |err| = 0.5e-6*(1 + 4) + 0.5e-6
        assert row.weighted_err == pytest.approx(
            row.fp_area + 4.0 * row.fn_area, abs=4e-6)


def test_auto_bands_matches_explicit(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta"[: 20 + (i % 9) * 3]
          + f" tail{i % 4}")
         for i in range(60)], "doc_id long, text string")
    # lsh_plan(0.3, 32, fn_weight=4) == (16, 2): auto == explicit 16
    auto = minhash_near_dups(docs, "doc_id", "text", threshold=0.3,
                             num_hashes=32, bands=None)
    expl = minhash_near_dups(docs, "doc_id", "text", threshold=0.3,
                             num_hashes=32, bands=16)
    assert sorted(map(tuple, auto.collect())) == \
        sorted(map(tuple, expl.collect()))
