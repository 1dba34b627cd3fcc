"""SparkSession construction with the engine's tuned defaults.

Replaces the reference's per-call process-pool setup
(``/root/reference/mehc_curation/utils/common.py:41-59`` — n_cpu
clamping + ParallelPandas.initialize before every operator): one
long-lived session, long-lived reused Python workers, AQE on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mehc-curation-spark",
              master: str | None = None,
              cores: int = -1,
              shuffle_partitions: int | None = None,
              arrow_batch: int = 8192) -> SparkSession:
    """Build (or get) the tuned session.

    Args:
        master: explicit master URL; on a cluster leave None and let
            spark-submit decide. Locally, None → local[cores].
        cores: -1 = all cores (same clamping contract as the
            reference's n_cpu, ``common.py:41-59``).
        shuffle_partitions: default 2× cores locally (a cluster submit
            should size this to executors × cores × 2).
        arrow_batch: max Arrow records per batch. Size it by PAYLOAD
            BYTES, not rows: the JVM↔Python boundary has a measured
            ~60ms fixed cost per batch, so bigger batches win — but a
            batch must fit Python worker memory. 8192 rows × ~5 KB
            thumbnails ≈ 40 MB/batch (good); for megapixel images
            (~1 MB each) drop to 64-256 rows.
    """
    avail = os.cpu_count() or 1
    if cores == -1 or cores > avail:
        cores = avail
    elif cores <= 0:
        cores = 1
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    elif not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        b = b.master(f"local[{cores}]")
        # single-JVM local mode: driver heap IS the executor heap; the
        # 1g default GC-thrashes the window stage at high core counts
        # (only honored if the JVM isn't already up, e.g. getOrCreate
        # reuse or spark-submit, where --driver-memory rules)
        b = b.config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    b = (
        b.config("spark.sql.shuffle.partitions",
                 str(shuffle_partitions or max(8, cores * 2)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # SPARK_GRAFT_EXTRA_CONF: JSON dict of extra spark conf — the
    # local-CLI analog of `spark-submit --conf` (ops knobs like
    # spark.ui.enabled or JIT flags without code edits; the test
    # suite uses it for fast-start C1-only JVMs in subprocess runs)
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra:
        import json as _json

        for k, v in _json.loads(extra).items():
            b = b.config(k, str(v))
    return b.getOrCreate()
