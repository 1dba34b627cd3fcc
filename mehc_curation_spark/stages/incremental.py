"""Incremental curation — label ONLY newly-arrived rows, replaying
dedup for exactly the phash groups they touch.

The reference pipeline is batch-global: every run rescans the whole
corpus (``/root/reference/mehc_curation/refinement/core/pipeline.py:23-291``
re-reads and re-labels everything). At the 10^12-image design point a
daily 0.1% ingest makes that a 1000× overcompute. This module is the
continuous-ingestion answer, with one hard invariant:

    After increments D1..Dk, the labels table is byte-identical to
    ``run_curate`` over D1 ∪ .. ∪ Dk  (batch equivalence).

That is checkable (tests/test_incremental.py and the driver's
``pairs_curate_incremental_check`` query assert it literally) and it
pins down every semantic corner:

- **Per-row rules never replay.** The narrow phase (decode, langid,
  ppl, heuristics, scrubs — the expensive part, it reads ``bytes``) is
  history-free, so each input row pays it exactly once, in the
  increment that delivered it.
- **Dedup is corpus-global, so late rows can change OLD labels.** All
  dedup logic factorizes per phash group (stages/plan.py), so the
  replay set is exactly {rows whose phash appears in the increment}:
  a new alive caption can flip a previously-kept row to
  ``duplicate_conflict`` (drop-all-of-conflicting-key), and a new row
  with a smaller image_id can take over keep-first, flipping the old
  keeper to ``duplicate_perfect``. Monotonicity note: adding rows can
  only *shrink* the alive set of a group — a previously-dropped row
  never comes back — so incremental updates are retractions plus
  appends, never revivals.
- **Replay needs the pre-dedup state, not the bytes.** A `_state/`
  sidecar snapshot table persists each row's :func:`narrow_state`
  frame (stage-1 reason, scrub reason, the three 128-bit caption
  hashes, final caption, lang/ppl) — ~70 bytes/row, append-only, phash
  -bucketed like the labels. Replaying a group = union its stored
  state with the new rows' state and re-running
  :func:`apply_dedup_passes` — no input re-read, ever.

Physical shape at scale (the 100 TB story):

- New-row state stages once (`partitionBy(bucket)`), and everything
  downstream reads that staging — the Arrow decode stage runs once.
- Old state is read ONLY for affected buckets (hive partition pruning
  on ``bucket``) and then semi-joined to the increment's distinct
  phashes — the replay working set is proportional to the increment,
  not the corpus.
- Writes are Iceberg-style: buckets with changed old rows get their
  surviving + relabeled rows written as NEW files and the manifest
  swap (`commit_files` with ``replace_prefixes``) is the atomic step;
  buckets that only gained rows get a pure file append. Replaced
  files are unlinked AFTER the commit succeeds (pass
  ``keep_replaced_files=True`` to retain full time travel instead —
  default reclaims immediately, like `expire_snapshots`).
- The per-bucket ledger stays authoritative for resume/reporting:
  touched buckets' counters are recomputed from the committed data
  (absolute, not delta — idempotent), and the published per-language
  stats are rebuilt from the labels table (slim columns, ~1% of input
  size) because retractions change kept-counts in ways per-run deltas
  cannot describe.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.io.ledger import Ledger
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import ID_COL, KEY_COL
from mehc_curation_spark.stages.plan import (
    apply_dedup_passes,
    narrow_state,
    project_labels,
)
from mehc_curation_spark.stages.refinement import BUCKET_COL, bucket_col

STATE_DIR = "_state"

LABEL_COLS = (ID_COL, KEY_COL, "keep", "drop_reason", "caption_scrubbed",
              "lang", "lang_conf", "ppl")


def _state_table(output_path: str) -> SnapshotTable:
    return SnapshotTable(os.path.join(output_path, STATE_DIR))


def _move_in(staging: str, data_dir: str, tag: str) -> list[str]:
    """Move staged ``bucket=k/part-*.parquet`` files into the table's
    data dir under collision-free names; returns the relative paths.
    Non-destructive: existing files in the target dirs are untouched
    (the manifest swap decides what is live)."""
    rel = []
    for b in sorted(os.listdir(staging)):
        if not b.startswith(f"{BUCKET_COL}="):
            continue
        dst_dir = os.path.join(data_dir, b)
        os.makedirs(dst_dir, exist_ok=True)
        for f in sorted(os.listdir(os.path.join(staging, b))):
            if f.endswith(".parquet"):
                name = f"{tag}-{uuid.uuid4().hex[:8]}-{f}"
                os.replace(os.path.join(staging, b, f),
                           os.path.join(dst_dir, name))
                rel.append(f"{b}/{name}")
    return rel


def _publish_lang_stats(spark: SparkSession, ledger: Ledger,
                        labels_tbl: SnapshotTable,
                        config: CurationConfig) -> dict:
    """Rebuild the per-language stats from the committed labels table
    (salted two-phase agg, same shape run_curate publishes). Retraction
    flips change kept-counts of PAST increments, so the published stats
    are recomputed absolute rather than merged as deltas."""
    labels = labels_tbl.read(spark)
    salt = F.pmod(F.xxhash64(ID_COL), F.lit(config.salt_factor))
    partial = (
        labels.groupBy("lang", salt.alias("_salt"))
        .agg(F.count("*").alias("n"),
             F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
             F.sum("ppl").alias("ppl_sum"))
    )
    rows = (partial.groupBy("lang")
            .agg(F.sum("n").alias("n"), F.sum("kept").alias("kept"),
                 F.sum("ppl_sum").alias("ppl_sum"))
            .collect())
    lang_stats = {
        r["lang"]: {
            "rows": int(r["n"]), "kept": int(r["kept"]),
            "ppl_sum": float(r["ppl_sum"]),
            "keep_rate": round(int(r["kept"]) / int(r["n"]), 4)
            if r["n"] else None,
            "mean_ppl": round(float(r["ppl_sum"]) / int(r["n"]), 2)
            if r["n"] else None,
        }
        for r in rows
    }
    ledger.write_aux("lang_stats.json", lang_stats)
    return lang_stats


def _bucket_counters(spark: SparkSession, labels_tbl: SnapshotTable,
                     buckets: list[int]) -> dict[int, dict]:
    """Absolute per-bucket (rows, kept, dropped-by-reason) counters for
    the given buckets, from the committed snapshot."""
    labels = labels_tbl.read(spark).filter(
        F.col(BUCKET_COL).isin([int(b) for b in buckets]))
    stats = (labels.groupBy(BUCKET_COL, "drop_reason")
             .agg(F.count("*").alias("n")).collect())
    per_bucket: dict[int, dict] = {
        int(b): {"rows": 0, "kept": 0, "dropped": {}} for b in buckets}
    for r in stats:
        e = per_bucket[int(r[BUCKET_COL])]
        e["rows"] += r["n"]
        if r["drop_reason"] is None:
            e["kept"] += r["n"]
        else:
            e["dropped"][r["drop_reason"]] = r["n"]
    return per_bucket


def run_curate_increment(
    spark: SparkSession,
    new_input_path: str,
    output_path: str,
    config: CurationConfig = CurationConfig(),
    keep_replaced_files: bool = False,
) -> dict:
    """Curate the rows in ``new_input_path`` (an increment: rows NOT
    seen by any previous call) into the labels table at
    ``output_path``, preserving batch equivalence (module docstring).

    The first call on an empty output is the bootstrap: a full curate
    that also seeds the `_state/` sidecar. Later calls require the
    sidecar (a table created by plain ``run_curate`` has no state to
    replay — start it with this function instead).

    image_id values must be unique across ALL increments (they are the
    keep-first tiebreaker; a duplicate id is two claims to one row).

    Returns a metrics dict: ``rows_new/kept_new`` describe this
    increment's rows, ``relabeled_old`` counts previously-committed
    rows whose label changed (``retracted`` = the subset that flipped
    keep→drop), plus the write shape (``buckets_rewritten/appended``)
    and the new snapshot versions.
    """
    ledger = Ledger(output_path)
    labels_tbl = SnapshotTable(output_path)
    state_tbl = _state_table(output_path)
    first = not state_tbl.exists()
    if first and labels_tbl.exists():
        raise ValueError(
            f"{output_path}: labels table exists but has no {STATE_DIR}/ "
            "sidecar (created by run_curate?) — incremental curation "
            "needs the pre-dedup state; bootstrap the table with "
            "run_curate_increment from the start")

    t0 = time.time()
    df_new = spark.read.parquet(new_input_path)

    # ---- 1. narrow phase on the increment, staged ONCE ----------------
    stg_state = ledger.staging_dir()
    (narrow_state(df_new, config)
     .withColumn(BUCKET_COL, bucket_col(config))
     .repartition(F.col(BUCKET_COL))
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stg_state))
    state_new = spark.read.option("basePath", stg_state).parquet(stg_state)

    aff_buckets = sorted(
        r[0] for r in state_new.select(BUCKET_COL).distinct().collect())
    if not aff_buckets:
        raise ValueError(f"{new_input_path}: increment is empty")
    aff_ph = state_new.select(KEY_COL).distinct()

    # ---- 2. replay dedup over the affected phash groups ---------------
    if first:
        combined = state_new.withColumn("_is_new", F.lit(True))
    else:
        old_state = (
            state_tbl.read(spark)
            .filter(F.col(BUCKET_COL).isin(aff_buckets))
            .join(aff_ph, KEY_COL, "left_semi"))
        combined = (
            old_state.withColumn("_is_new", F.lit(False))
            .unionByName(state_new.withColumn("_is_new", F.lit(True))))

    # the replay set is increment-sized — the window strategy's shared
    # sort is the right physical plan here regardless of corpus skew
    relabeled = project_labels(
        apply_dedup_passes(combined, config, strategy="window"),
        BUCKET_COL, "_is_new")
    stg_lab = ledger.staging_dir()
    relabeled.write.mode("overwrite").parquet(stg_lab)
    la = spark.read.parquet(stg_lab)

    new_labels = la.filter(F.col("_is_new")).drop("_is_new")

    # ---- 3. diff old labels → retractions / relabels ------------------
    n_changed = n_retracted = 0
    rewrite_buckets: list[int] = []
    if not first:
        cur = labels_tbl.read(spark)
        cur_aff = (cur.filter(F.col(BUCKET_COL).isin(aff_buckets))
                   .join(aff_ph, KEY_COL, "left_semi"))
        old_relabel = la.filter(~F.col("_is_new")).drop("_is_new")
        same = (
            (F.col("n.keep") == F.col("o.keep"))
            & F.col("n.drop_reason").eqNullSafe(F.col("o.drop_reason"))
            & F.col("n.caption_scrubbed").eqNullSafe(
                F.col("o.caption_scrubbed")))
        changed = (
            old_relabel.alias("n")
            .join(cur_aff.alias("o"), ID_COL)
            .filter(~same)
            .select("n.*",
                    F.col("o.keep").alias("_was_kept")))
        changed = changed.cache()
        n_changed = changed.count()
        n_retracted = changed.filter(
            F.col("_was_kept") & ~F.col("keep")).count()
        rewrite_buckets = sorted(
            r[0] for r in changed.select(BUCKET_COL).distinct().collect())

    append_buckets = sorted(set(aff_buckets) - set(rewrite_buckets))

    # ---- 4. stage the final bucket contents ---------------------------
    stg_app = stg_rw = None
    if append_buckets:
        stg_app = ledger.staging_dir()
        (new_labels.filter(F.col(BUCKET_COL).isin(append_buckets))
         .repartition(F.col(BUCKET_COL))
         .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stg_app))
    if rewrite_buckets:
        # surviving old rows + relabeled rows + this increment's rows
        changed_ids = changed.select(ID_COL)
        survivors = (cur.filter(F.col(BUCKET_COL).isin(rewrite_buckets))
                     .join(changed_ids, ID_COL, "left_anti"))
        content = (
            survivors.select(*LABEL_COLS, BUCKET_COL)
            .unionByName(changed.select(*LABEL_COLS, BUCKET_COL))
            .unionByName(
                new_labels.filter(F.col(BUCKET_COL).isin(rewrite_buckets))
                .select(*LABEL_COLS, BUCKET_COL)))
        stg_rw = ledger.staging_dir()
        (content.repartition(F.col(BUCKET_COL))
         .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stg_rw))

    n_new = state_new.count()
    kept_new = int(new_labels.filter("keep").count())
    elapsed = time.time() - t0

    # ---- 5. durable commit (flock; manifest swap is the atomic step) --
    lock_fd = ledger._acquire_lock()
    try:
        ver = labels_tbl.current_version() + 1
        data_dir = os.path.join(output_path, "data")
        os.makedirs(data_dir, exist_ok=True)
        replaced = []
        if rewrite_buckets:
            m = labels_tbl.manifest()
            pref = tuple(f"{BUCKET_COL}={b}/" for b in rewrite_buckets)
            replaced = [f for f in m["files"] if f.startswith(pref)]
        rel_files = []
        if stg_app:
            rel_files += _move_in(stg_app, data_dir, f"inc{ver}")
        if stg_rw:
            rel_files += _move_in(stg_rw, data_dir, f"inc{ver}")

        snapshot_version = labels_tbl.commit_files(
            rel_files, la.drop("_is_new").schema.json(),
            properties={"increment": True, "rows_new": n_new,
                        "relabeled_old": n_changed,
                        "rewrite_buckets": rewrite_buckets,
                        "elapsed_sec": elapsed},
            replace_prefixes=[f"{BUCKET_COL}={b}/" for b in rewrite_buckets])

        # replaced files are no longer referenced by the NEW snapshot;
        # reclaim now (parent-snapshot time travel for these buckets
        # ends here, exactly like expire_snapshots) unless asked not to
        if not keep_replaced_files:
            for f in replaced:
                try:
                    os.unlink(os.path.join(data_dir, f))
                except FileNotFoundError:
                    pass

        state_rel = _move_in(stg_state, state_tbl.data_dir, f"inc{ver}")
        state_version = state_tbl.commit_files(
            state_rel, state_new.schema.json(),
            properties={"increment": True, "rows": n_new})

        per_bucket = _bucket_counters(spark, labels_tbl, aff_buckets)
        lang_stats = _publish_lang_stats(spark, ledger, labels_tbl, config)
        ledger.publish_buckets(per_bucket, elapsed)
    finally:
        os.close(lock_fd)
    if not first:
        changed.unpersist()

    return {
        "rows_new": n_new,
        "kept_new": kept_new,
        "relabeled_old": n_changed,
        "retracted": n_retracted,
        "buckets_appended": append_buckets,
        "buckets_rewritten": rewrite_buckets,
        "snapshot_version": snapshot_version,
        "state_version": state_version,
        "lang_stats": lang_stats,
        "elapsed_sec": elapsed,
        "rows_per_sec": (n_new / elapsed) if elapsed > 0 else None,
    }
