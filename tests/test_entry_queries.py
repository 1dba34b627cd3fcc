"""Driver-contract simulation: run every queries() entry on Spark and
its oracle_sql() on DuckDB over the same sf0.01 parquet tables, and
compare row count + column names + order-insensitive values — the same
comparison CORRECTNESS_r{N}.json records.
"""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("∅")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = _duck(entry_mod.oracle_sql()[name])
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        spark_pdf.columns, duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf)
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    # noop write, NOT count(): count() lets Catalyst prune
    # cardinality-preserving projections, so a UDF column could contain
    # a crash that count() never executes (this caught a real simhash
    # bug). The noop sink materializes every output column.
    df.write.format("noop").mode("overwrite").save()
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert set(df.columns) >= {"image_id", "keep", "drop_reason",
                               "caption_scrubbed", "lang", "ppl"}


def test_exact_dedup_null_text_keep_first(spark):
    """NULL texts form one group and keep-first like any value
    (regression: the null-unsafe semi join silently dropped every
    NULL-text row)."""
    from mehc_curation_spark.operators.similarity import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "x"), (5, "y")],
        "doc_id long, text string")
    got = sorted(r["doc_id"]
                 for r in exact_dedup(df, "text", "doc_id").collect())
    assert got == [1, 3, 5]
