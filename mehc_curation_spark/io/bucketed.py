"""Bucketed-table writer/reader — Spark bucketing for co-located joins.

Distinct from the hive ``bucket=pmod(phash,B)`` DIRECTORY partitioning
the resume ledger uses (that gives partition pruning + independent
units of work): Spark bucketing (``bucketBy`` + ``saveAsTable``)
records the hash-bucket layout in the catalog, so every subsequent
join or aggregation keyed on the bucket column reads the data already
hash-distributed — **no exchange** on either side of a bucketed⋈bucketed
join, and no exchange below a groupBy on the key. At corpus scale the
labels table is joined back to the pairs table (enrichment, audits,
re-curation diffs) far more often than it is written, so paying one
well-partitioned write to delete every future shuffle of the big side
is the right trade.

The reference has no analog (single-machine pandas); this implements
the build brief's "bucketing for co-located joins" item.

Caveats encoded here:
- bucketed tables must go through ``saveAsTable`` (the layout lives in
  the session catalog / metastore, not in parquet footers);
- both join sides need the SAME bucket count for a shuffle-free join;
- ``spark.sql.sources.bucketing.enabled`` (default true) must be on,
  and AQE happily keeps the no-exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str = "phash",
                   n_buckets: int = 64, mode: str = "overwrite") -> None:
    """Save ``df`` as a catalog table bucketed (and sorted) by ``key``.

    Sorting within buckets makes the downstream sort-merge join read
    pre-sorted runs — the join then needs neither exchange NOR sort.
    """
    (df.write.mode(mode)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cocolocated_join(spark: SparkSession, left_table: str,
                     right_table: str, on: str | list[str],
                     how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    With matching layouts Spark plans a SortMergeJoin with NO Exchange
    on either side (asserted by tests/test_bucketed.py) — the 100 TB
    join cost collapses to a co-located streaming merge.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how)
