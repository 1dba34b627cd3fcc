"""Training-export shard writer: deterministic global shuffle +
size-balanced shard files — the "last mile" that turns a curated
corpus into the sharded artifact a training loader streams.

Training jobs want (a) the corpus pre-shuffled so sequential shard
reads are i.i.d.-ish, (b) shards of roughly equal size so data-
parallel readers finish together, and (c) the whole layout
reproducible bit-for-bit from (corpus, seed) so a re-export after a
fix produces the same shard membership (WebDataset / T5 / Megatron
loaders all assume this shape).

Spark-first design:

- **Shuffle order is a row property, not an engine artifact**: every
  row gets ``u48 = md5-derived 48-bit hash of (seed ":" id)`` (same
  portable construction as :mod:`..operators.sampling` — restated
  literally in the DuckDB oracle) and the export order is
  ``(u48, id)``. No ``orderBy(rand())``, no dependence on
  partitioning, engine or day.
- **Shard = fixed-point range of the hash axis**:
  ``shard = (u48 * n_shards) >> 48`` — exact integer math (u48 < 2^48
  and n_shards <= 2^15 keep the product inside a signed 64-bit long),
  uniform across arbitrary (non-power-of-two) shard counts. With
  thousands of rows per shard the per-shard byte totals concentrate
  tightly around the mean (sizing is hash-balanced, not
  planned-balanced — there is no global sort anywhere).
- **One shuffle total**: the intra-shard position window partitions by
  ``shard``, which leaves every shard wholly inside one task — the
  subsequent ``partitionBy("shard")`` write therefore emits exactly
  one file per shard with rows already in (u48, id) order, and no
  second exchange.

At 100 TB: pick ``target_bytes`` (e.g. 1 GiB) and the shard count is
derived from one map-combinable ``sum(length(bytes))`` aggregate; the
single shuffle moves each row once, and shard files stream out in
parallel across all executors.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mehc_curation_spark.operators.sampling import u48_col

#: (u48 * n_shards) must stay inside a signed 64-bit long.
MAX_SHARDS = 32768


def shuffle_key_col(id_c: Column, seed: int = 0) -> Column:
    """Portable 48-bit shuffle key: u48(md5(seed ":" id)). Different
    seeds give independent orders; the same seed reproduces the
    export anywhere."""
    return u48_col(F.concat(F.lit(f"{int(seed)}:"), id_c.cast("string")))


def assign_shards(df: DataFrame, id_col: str = "image_id",
                  n_shards: int | None = None,
                  target_bytes: int | None = None,
                  bytes_col: str = "bytes", seed: int = 0) -> DataFrame:
    """Append deterministic (shard, pos) export coordinates.

    Exactly one of ``n_shards`` / ``target_bytes`` must be given; with
    ``target_bytes`` the count is ``ceil(sum(length(bytes)) /
    target_bytes)`` from one aggregate over the payload column.
    ``pos`` is the 1-based position of the row inside its shard in the
    global shuffle order (u48, id) — the reproducible iteration order.
    """
    if (n_shards is None) == (target_bytes is None):
        raise ValueError("pass exactly one of n_shards / target_bytes")
    if n_shards is None:
        total = df.select(
            F.sum(F.coalesce(F.length(F.col(bytes_col)), F.lit(0)))
        ).first()[0] or 0
        n_shards = max(1, math.ceil(total / target_bytes))
    if not 1 <= n_shards <= MAX_SHARDS:
        raise ValueError(f"n_shards must be in [1, {MAX_SHARDS}]")
    u = shuffle_key_col(F.col(id_col), seed)
    out = df.withColumn("_u48", u) \
            .withColumn("shard",
                        F.shiftright(F.col("_u48") * F.lit(int(n_shards)),
                                     48).cast("int"))
    w = Window.partitionBy("shard").orderBy("_u48", F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_u48")


def export_shards(df: DataFrame, path: str, id_col: str = "image_id",
                  n_shards: int | None = None,
                  target_bytes: int | None = None,
                  bytes_col: str = "bytes", seed: int = 0,
                  compression: str = "zstd") -> dict:
    """Write the corpus as one parquet file per shard under
    ``path/shard=K/`` plus a ``_manifest.json`` recording the layout
    (underscore-prefixed so Spark's directory reader skips it).

    The position window already hash-partitions the data by shard, so
    the partitioned write reuses that exchange (one shuffle total) and
    each shard lands as a single file with rows in (u48, id) order.
    Returns the manifest dict (n_shards, seed, per-shard row/byte
    counts, min/max rows — the balance evidence).
    """
    s = assign_shards(df, id_col, n_shards=n_shards,
                      target_bytes=target_bytes, bytes_col=bytes_col,
                      seed=seed)
    s.write.mode("overwrite").partitionBy("shard") \
        .option("compression", compression).parquet(path)
    per = (s.groupBy("shard")
           .agg(F.count("*").alias("rows"),
                F.sum(F.coalesce(F.length(F.col(bytes_col)), F.lit(0)))
                 .alias("payload_bytes"))
           .orderBy("shard").collect())
    manifest = {
        "format": "parquet-shards-v1",
        "seed": int(seed),
        "id_col": id_col,
        "n_shards": len(per),
        "rows": int(sum(r["rows"] for r in per)),
        "payload_bytes": int(sum(r["payload_bytes"] for r in per)),
        "min_shard_rows": int(min(r["rows"] for r in per)) if per else 0,
        "max_shard_rows": int(max(r["rows"] for r in per)) if per else 0,
        "shards": [{"shard": int(r["shard"]), "rows": int(r["rows"]),
                    "payload_bytes": int(r["payload_bytes"])} for r in per],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
