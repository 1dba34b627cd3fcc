#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32)
plus the flagship image+caption curation pipeline over the
seed-deterministic synthetic pairs table, and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "curate_rows_per_sec": ...}

Extra keys document the curation throughput (the BASELINE.json metric:
captions filtered+scrubbed per second).

Usage:
    python bench.py                  # the driver's per-round invocation
    python bench.py --scaling        # local[8] vs local[32] efficiency
                                     # evidence -> BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q_window_top2_orders",
    "events_sessionize",
    "doc_lang_stats",
    "doc_exact_dedup",
    "doc_minhash_neardup",
    "doc_langid",
    "emb_cosine_topk",
]


def make_spark(cpus: int, app: str = "mehc-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )


def pairs_path(n_rows: int, seed: int = 42) -> str:
    from mehc_curation_spark.fixtures import write_pairs_parquet

    cache = os.environ.get("SPARK_GRAFT_PAIRS_CACHE",
                           os.path.join(os.path.dirname(__file__), ".bench_cache"))
    os.makedirs(cache, exist_ok=True)
    return write_pairs_parquet(cache, n_rows, seed)


def run_curate_bench(spark, n_rows: int) -> tuple[float, int]:
    """Run the full labels pipeline; return (seconds, rows)."""
    from mehc_curation_spark.stages.plan import build_labels_plan

    path = pairs_path(n_rows)
    df = spark.read.parquet(path)
    t0 = time.time()
    # count() forces full evaluation of every rule + dedup; the plan has
    # no cached state between runs (fresh lineage each call)
    labels = build_labels_plan(df)
    n = labels.count()
    return time.time() - t0, n


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pairs = int(os.environ.get("SPARK_GRAFT_PAIRS_N", "120000"))

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = run_headline(spark, sf_dir)
    curate_sec, curate_rows = run_curate_bench(spark, n_pairs)
    queries["curate_pairs"] = round(curate_sec, 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline_queries_plus_curation_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "cpus": cpus,
        "curate_rows": curate_rows,
        "curate_rows_per_sec": round(curate_rows / curate_sec, 1),
    }
    spark.stop()
    print(json.dumps(result))


def scaling() -> None:
    """local[8] vs local[32] on the same pairs input → BENCH/BASELINE.md.

    Evidence for the north_rule's N→4N scaling-efficiency criterion
    (no real cluster in this sandbox; see BASELINE.md protocol).
    """
    import subprocess

    n_pairs = int(os.environ.get("SPARK_GRAFT_PAIRS_N", "120000"))
    pairs_path(n_pairs)  # pre-generate so neither run pays generation

    results = {}
    for cpus in (8, 32):
        code = (
            "import bench, json, time; "
            f"spark = bench.make_spark({cpus}, 'mehc-scaling'); "
            "spark.sparkContext.setLogLevel('ERROR'); "
            f"sec, rows = bench.run_curate_bench(spark, {n_pairs}); "
            "spark.stop(); "
            "print(json.dumps({'sec': sec, 'rows': rows}))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    t8 = results[8]["rows"] / results[8]["sec"]
    t32 = results[32]["rows"] / results[32]["sec"]
    eff = (t32 / t8) / (32 / 8)
    md = f"""# BENCH — scaling evidence (N → 4N parallelism)

Protocol (BASELINE.md): identical curation job, identical deterministic
input ({results[8]['rows']} pairs, seed 42), run at two local
parallelism levels. Scaling efficiency = (T32/T8) / (32/8).

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[8]  | {results[8]['sec']:.1f} | {t8:,.0f} |
| local[32] | {results[32]['sec']:.1f} | {t32:,.0f} |

**Scaling efficiency: {eff:.3f}** (target >= 0.8)

Skew mitigation in effect: phash-keyed single exchange for all dedup
passes, AQE on, Arrow batch 2048, shuffle partitions = 2x cores,
salted two-phase aggregation for per-language stats.
"""
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"t8_rows_per_sec": round(t8, 1),
                      "t32_rows_per_sec": round(t32, 1),
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
