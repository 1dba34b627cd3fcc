"""Dataset column profiler — the "what did I just ingest" utility a
curation pipeline runs before and after every stage: per-column null
counts, distinct counts, min/max and average rendered length, computed
in ONE aggregation pass over the table (no per-column rescans).

Scale notes (100 TB): the profile is a single partial-aggregable scan;
with ``exact_distinct=True`` Spark plans the multiple DISTINCT
aggregates via an Expand (one duplicated row stream per distinct
column), which is exact but multiplies the shuffle by the column
count — at corpus scale pass ``exact_distinct=False`` to use
``approx_count_distinct`` (HyperLogLog++, one ordinary partial agg, no
Expand). min/max/avg_len are plain partial aggregates either way.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Optional[Sequence[str]] = None,
                    exact_distinct: bool = True) -> DataFrame:
    """One row per profiled column:

    ``column, n_rows, n_nulls, n_distinct, min_val, max_val, avg_len``

    min/max are computed in the column's native type (so numeric
    columns order numerically) and rendered to string; ``avg_len`` is
    the mean character length of the string rendering (non-NULL rows).
    The whole profile is one ``agg`` + an in-plan explode — no driver
    collect, no second scan.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        nd = (F.countDistinct(F.col(c)) if exact_distinct
              else F.approx_count_distinct(F.col(c)))
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd.alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            F.round(F.avg(F.length(s)), 6).alias(f"_len_{c}"),
        ]
    one = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_d_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_val"),
            F.col(f"_max_{c}").alias("max_val"),
            F.col(f"_len_{c}").alias("avg_len"),
        )
        for c in cols
    ])
    return one.select(F.explode(structs).alias("p")).select("p.*")
