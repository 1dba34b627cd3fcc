"""Streaming curation: rule labels on a file stream match the batch
pipeline (dedup off), and the stateful conflict flagger works."""

import os

import pandas as pd
import pytest

from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.stages.plan import build_labels_plan
from mehc_curation_spark.streaming.curate_stream import (
    flag_conflicts_stream,
    run_stream_labels,
)


def test_stream_labels_match_batch(spark, pairs_df, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pairs_df.limit(400).write.parquet(in_dir)

    q = run_stream_labels(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(300)

    got = (spark.read.parquet(out_dir).toPandas()
           .sort_values("image_id").reset_index(drop=True))
    cfg = CurationConfig(rm_dup_between_stages=False)
    want = (build_labels_plan(spark.read.parquet(in_dir), cfg).toPandas()
            .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_stream_restart_is_exactly_once(spark, pairs_df, tmp_path):
    """Re-running with the same checkpoint adds nothing; new files are
    picked up incrementally."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    pairs_df.limit(200).coalesce(1).write.mode("append").parquet(in_dir)

    run_stream_labels(spark, in_dir, out_dir, ck_dir).awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()
    run_stream_labels(spark, in_dir, out_dir, ck_dir).awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == n1  # no duplicates

    pairs_df.limit(300).coalesce(1).write.mode("append").parquet(in_dir)
    run_stream_labels(spark, in_dir, out_dir, ck_dir).awaitTermination(300)
    assert spark.read.parquet(out_dir).count() > n1


def test_conflict_flagger(spark, tmp_path):
    from mehc_curation_spark.schema import PAIRS_SCHEMA

    rows = [
        ("a1", None, None, None, "raw", "caption one", 7),
        ("a2", None, None, None, "raw", "caption one", 7),   # same -> ok
        ("a3", None, None, None, "raw", "caption two", 7),   # conflict from here
        ("b1", None, None, None, "raw", "unique", 8),
    ]
    in_dir = str(tmp_path / "cin")
    spark.createDataFrame(rows, PAIRS_SCHEMA).coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema(PAIRS_SCHEMA).parquet(in_dir)
    out = flag_conflicts_stream(stream)
    q = (out.writeStream.format("memory").queryName("conf")
         .option("checkpointLocation", str(tmp_path / "cck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {r["image_id"]: r["conflict_suspect"]
           for r in spark.sql("SELECT * FROM conf").collect()}
    assert got == {"a1": False, "a2": False, "a3": True, "b1": False}


def test_stream_lang_window_counts(spark, pairs_df, tmp_path):
    """Watermarked tumbling-window per-language rates: complete-mode
    memory sink totals must equal a batch groupBy over the same data,
    and the watermark must be registered in the plan."""
    from pyspark.sql import functions as F

    from mehc_curation_spark.streaming.curate_stream import (
        stream_lang_window_counts,
    )

    in_dir = str(tmp_path / "in")
    # synthesize event times across two 1-minute windows
    (pairs_df.limit(300)
     .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:30"))
                 + F.make_interval(secs=F.pmod(F.xxhash64("image_id"), F.lit(90))))
     .write.parquet(in_dir))

    src = spark.readStream.schema(
        spark.read.parquet(in_dir).schema).parquet(in_dir)
    from mehc_curation_spark.operators.udfs import curate_narrow_arrow
    from mehc_curation_spark.rules.registry import CurationConfig

    # per-row labels + ts (narrow only — windows need no dedup here);
    # ts re-attached via a stream-batch join
    ts_lookup = spark.read.parquet(in_dir).select("image_id", "ts")
    narrow = (curate_narrow_arrow(src, CurationConfig())
              .withColumn("keep", F.col("drop_reason").isNull())
              .join(ts_lookup, "image_id"))
    agg = stream_lang_window_counts(narrow, "ts")
    q = (agg.writeStream.format("memory").queryName("langwin")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.sql("select * from langwin").toPandas()
    assert (got["kept"] <= got["rows"]).all()
    # totals match a batch aggregate of the same labeled rows
    batch_narrow = curate_narrow_arrow(spark.read.parquet(in_dir),
                                       CurationConfig())
    batch = (batch_narrow.groupBy("lang").agg(F.count("*").alias("rows"))
             .toPandas().set_index("lang")["rows"])
    got_tot = got.groupby("lang")["rows"].sum()
    for lang, n in batch.items():
        assert got_tot.loc[lang] == n
    assert len(got["window"].drop_duplicates()) >= 2
