import os
import sys

import pytest

# Ensure the repo root is importable when pytest is run from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    # local[8]: the suite is one long chain of small Spark jobs on a
    # shared session, so per-job parallelism is the wall-clock lever
    # (measured: local[4] -> local[8] cut the full suite by ~25% on
    # the 32-core host; beyond 8 the ~2k-row jobs can't feed the
    # extra cores and scheduling overhead wins)
    s = (
        SparkSession.builder.master("local[8]")
        .appName("mehc-curation-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pairs_pdf():
    from mehc_curation_spark.fixtures import make_pairs_pdf

    return make_pairs_pdf(2000, seed=42)


@pytest.fixture(scope="session")
def pairs_df(spark, pairs_pdf, tmp_path_factory):
    # round-trip through parquet so Spark sees the exact on-disk types
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("pairs") / "pairs.parquet")
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pandas(pairs_pdf, schema=schema,
                                        preserve_index=False), p)
    return spark.read.parquet(p)
