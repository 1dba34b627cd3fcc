"""RefinementStage — the full-pipeline orchestrator, graft of
``RefinementPipeline.complete_refinement``
(``/root/reference/mehc_curation/refinement/core/pipeline.py:23-291``).

Two modes:

- :meth:`complete_curation` / :func:`curate` — build the single lazy
  labels plan (all stages + dedup gates fused, one shuffle) and return
  it as a DataFrame. This is the flagship query.
- :func:`run_curate` — execute with durability: phash-bucket
  partitioned output, per-bucket lineage/metrics ledger, and
  checkpoint **resume of any failed bucket range** (sound because every
  pipeline operation is per-row or grouped by phash, and
  pmod(phash, B) assigns each phash to exactly one bucket — buckets are
  independent units of work).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mehc_curation_spark.io.ledger import Ledger
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import ID_COL, KEY_COL
from mehc_curation_spark.stages.plan import build_labels_plan

BUCKET_COL = "bucket"


def bucket_col(config: CurationConfig) -> F.Column:
    """Deterministic phash bucket: pmod(phash, B) — the explicit
    repartition/skew key (SURVEY.md §2.6, north_rule)."""
    return F.pmod(F.col(KEY_COL), F.lit(config.phash_buckets)).cast("int")


def _published_lang_stats(ledger: Ledger) -> dict:
    return ledger.read_aux("lang_stats.json") or {}


def per_bucket_counters(labels: DataFrame) -> dict[int, dict]:
    """Per-bucket {rows, kept, dropped-by-reason} from a labels-shaped
    frame carrying BUCKET_COL — the ledger's metric unit (shared by the
    batch and incremental committers so the two can never drift)."""
    stats = (
        labels.groupBy(BUCKET_COL, "drop_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_bucket: dict[int, dict] = {}
    for r in stats:
        b = int(r[BUCKET_COL])
        e = per_bucket.setdefault(b, {"rows": 0, "kept": 0, "dropped": {}})
        e["rows"] += r["n"]
        if r["drop_reason"] is None:
            e["kept"] += r["n"]
        else:
            e["dropped"][r["drop_reason"]] = r["n"]
    return per_bucket


def salted_lang_sums(labels: DataFrame, salt_factor: int) -> dict:
    """Raw per-language additive sums (rows/kept/ppl_sum) via the
    salted two-phase aggregation (north_rule: 'salted aggregation for
    per-language quality stats'): en is ~55% of a web corpus, so a
    single groupBy(lang) would send half the table to one reducer; the
    salt spreads the partial aggregation over S sub-keys and the final
    pass combines S rows per language."""
    salt = F.pmod(F.xxhash64(ID_COL), F.lit(salt_factor))
    partial = (
        labels.groupBy("lang", salt.alias("_salt"))
        .agg(F.count("*").alias("n"),
             F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
             F.sum("ppl").alias("ppl_sum"))
    )
    return {
        r["lang"]: {"rows": int(r["n"]), "kept": int(r["kept"]),
                    "ppl_sum": float(r["ppl_sum"])}
        for r in (
            partial.groupBy("lang")
            .agg(F.sum("n").alias("n"), F.sum("kept").alias("kept"),
                 F.sum("ppl_sum").alias("ppl_sum"))
            .collect()
        )
    }


def finalize_lang_stats(run_sums: dict) -> dict:
    """Derive the published keep_rate/mean_ppl view from raw sums."""
    return {
        lang: {
            "rows": s["rows"], "kept": s["kept"], "ppl_sum": s["ppl_sum"],
            "keep_rate": round(s["kept"] / s["rows"], 4) if s["rows"] else None,
            "mean_ppl": round(s["ppl_sum"] / s["rows"], 2) if s["rows"] else None,
        }
        for lang, s in run_sums.items()
    }


class RefinementStage:
    def __init__(self, df: DataFrame, config: CurationConfig = CurationConfig()):
        self.df = df
        self.config = config

    def complete_curation(self) -> DataFrame:
        """Lazy labels plan (image_id, phash, keep, drop_reason,
        caption_scrubbed, lang, lang_conf, ppl)."""
        return build_labels_plan(self.df, self.config)

    def curated(self) -> DataFrame:
        """Kept rows only, with final captions — the reference's
        'refined DataFrame' return shape."""
        labels = self.complete_curation()
        return labels.filter(F.col("keep")).drop("keep", "drop_reason")


def curate(df: DataFrame, config: CurationConfig = CurationConfig()) -> DataFrame:
    """Functional form of :meth:`RefinementStage.complete_curation`."""
    return build_labels_plan(df, config)


def run_curate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    config: CurationConfig = CurationConfig(),
    resume: bool = True,
    input_format: str = "parquet",
) -> dict:
    """Execute the pipeline durably with per-bucket checkpoint/resume.

    Output layout::

        <output_path>/data/bucket=<k>/*.parquet   labels, phash-bucketed
        <output_path>/_ledger/ledger.json         per-bucket lineage+metrics

    On resume, buckets already committed in the ledger are skipped —
    the graft of 'checkpoint resume of any failed partition range'
    (BASELINE.json north_rule).
    """
    from mehc_curation_spark.io.ingest import read_pairs

    ledger = Ledger(output_path)
    done = ledger.completed_buckets() if resume else set()

    df = read_pairs(spark, input_path, input_format)
    df = df.withColumn(BUCKET_COL, bucket_col(config))
    if done:
        df = df.filter(~F.col(BUCKET_COL).isin(*sorted(done)))
        if df.isEmpty():  # nothing left to resume — no-op
            # Same metrics-dict schema as a real run: publish the
            # already-committed lang_stats and latest snapshot version.
            from mehc_curation_spark.io.catalog import SnapshotTable

            return {"lang_stats": _published_lang_stats(ledger),
                    "snapshot_version": SnapshotTable(output_path).current_version(),
                    "buckets_done": sorted(done), "buckets_new": [],
                    "rows": 0, "kept": 0, "elapsed_sec": 0.0,
                    "rows_per_sec": None, "resumed_noop": True}

    # Explicit repartition on the bucket key: co-locates each phash's
    # rows (dedup needs it anyway) and defuses caption-length/language
    # skew by spreading rows across B buckets.
    t0 = time.time()
    labels = build_labels_plan(df, config)
    labels = labels.withColumn(BUCKET_COL, bucket_col(config))

    staging = ledger.staging_dir()
    (
        labels.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(staging)
    )
    elapsed = time.time() - t0

    # per-bucket metrics from the staged output (slim read)
    staged = spark.read.parquet(staging)
    per_bucket = per_bucket_counters(staged)

    # Per-language stats (salted — see salted_lang_sums). Computed from
    # the staging read — commit_buckets below MOVES the staged files
    # into the table.
    run_sums = salted_lang_sums(staged, config.salt_factor)
    # On resume this run saw only the not-yet-committed buckets, but the
    # published stats must describe the WHOLE committed table — merge
    # the raw per-language sums with the previously published ones
    # (exact: rows/kept/ppl_sum are all additive over disjoint buckets).
    # Merge ONLY when buckets were actually skipped: with resume=False
    # (or a fresh table) this run recomputed every bucket, and adding
    # the prior sums — which describe those same buckets — would
    # double-count every language.
    prior = (ledger.read_aux("lang_stats.json") or {}) if done else {}
    for lang, e in prior.items():
        s = run_sums.setdefault(lang, {"rows": 0, "kept": 0, "ppl_sum": 0.0})
        s["rows"] += int(e.get("rows", 0))
        s["kept"] += int(e.get("kept", 0))
        s["ppl_sum"] += float(e.get("ppl_sum", 0.0))
    lang_stats = finalize_lang_stats(run_sums)

    schema_json = staged.schema.json()

    # Durable commit, ordered so the LEDGER publish comes LAST (it is
    # what resume consults): files -> snapshot manifest -> aux stats ->
    # ledger. A crash anywhere before the final step leaves the
    # recomputed buckets un-published, so the next resume simply redoes
    # them — no state can go permanently stale (a crash AFTER the old
    # order's ledger publish left lang_stats/snapshot stale forever,
    # because the resume no-op path never republishes them). The whole
    # sequence holds the ledger's flock so two committers serialize.
    from mehc_curation_spark.io.catalog import SnapshotTable

    lock_fd = ledger._acquire_lock()
    try:
        ledger.move_buckets(staging, per_bucket)

        data_dir = os.path.join(output_path, "data")
        rel_files = []
        for b in sorted(per_bucket):
            bdir = os.path.join(data_dir, f"bucket={b}")
            for f in sorted(os.listdir(bdir)):
                if f.endswith(".parquet"):
                    rel_files.append(f"bucket={b}/{f}")
        # replace_prefixes: a resume=False rerun recomputes buckets the
        # parent snapshot already lists — their old files were just
        # deleted, so their entries must be replaced, not appended-to.
        snapshot_version = SnapshotTable(output_path).commit_files(
            rel_files, schema_json,
            properties={"buckets": sorted(per_bucket), "elapsed_sec": elapsed},
            replace_prefixes=[f"bucket={b}/" for b in per_bucket])

        ledger.write_aux("lang_stats.json", lang_stats)
        ledger.publish_buckets(per_bucket, elapsed)
    finally:
        os.close(lock_fd)

    total_rows = sum(e["rows"] for e in per_bucket.values())
    return {
        "lang_stats": lang_stats,
        "snapshot_version": snapshot_version,
        "buckets_done": sorted(done),
        "buckets_new": sorted(per_bucket),
        "rows": total_rows,
        "kept": sum(e["kept"] for e in per_bucket.values()),
        "elapsed_sec": elapsed,
        "rows_per_sec": (total_rows / elapsed) if elapsed > 0 else None,
        "resumed_noop": False,
    }
