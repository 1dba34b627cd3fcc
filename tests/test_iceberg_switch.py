"""Exercise ``load_table``'s real-Iceberg switch path (VERDICT r2
item 10).

The sandbox has no Iceberg runtime jars, so the full
write-and-read-back test self-skips; what ALWAYS runs is the routing
test: a catalog identifier (no path separator) must reach
``format("iceberg")`` and fail LOUDLY with the data-source-not-found
error — never fall back silently to the parquet/snapshot paths. When
a runtime jar appears, the skip lifts and the round-trip test covers
the branch for real.
"""

import pytest

from mehc_curation_spark.io.catalog import load_table


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:
        return False


def test_catalog_identifier_routes_to_iceberg_source(spark):
    """Without jars the branch must raise the iceberg-source lookup
    error (proof the identifier was routed to format('iceberg'), not
    silently misread as a path)."""
    if _iceberg_available(spark):
        pytest.skip("iceberg runtime present; routing proven by "
                    "test_iceberg_round_trip instead")
    # pyspark 4.1 surfaces the missing provider as a raw
    # Py4JJavaError(DATA_SOURCE_NOT_FOUND) from .load(), not an
    # AnalysisException — assert on the message, not the type
    with pytest.raises(Exception) as ei:
        load_table(spark, "db.some_table").collect()
    assert "iceberg" in str(ei.value).lower()
    assert "DATA_SOURCE_NOT_FOUND" in str(ei.value)


def test_iceberg_round_trip(spark, tmp_path):
    """Full write/read through a real Iceberg catalog — runs only when
    the runtime jars are on the classpath (never in this sandbox)."""
    if not _iceberg_available(spark):
        pytest.skip("no iceberg runtime jars on the classpath")
    spark.conf.set("spark.sql.catalog.graft_test",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse",
                   str(tmp_path / "warehouse"))
    spark.sql("CREATE TABLE graft_test.db.t (id BIGINT) USING iceberg")
    spark.range(5).writeTo("graft_test.db.t").append()
    got = load_table(spark, "graft_test.db.t")
    assert got.count() == 5
