"""The curation label plan — ONE lazy DataFrame plan for the full
validate → scrub → normalize → dedup pipeline.

This is the Spark-first answer to the reference's eager step-at-a-time
execution (every operator materializes a full DataFrame copy,
``/root/reference/mehc_curation/validation/core/engine.py:40``,
``cleaning/core/engine.py:56-64``): all rules become columns on a
single lineage, Catalyst fuses the non-UDF parts into whole-stage
codegen, and the three inter-stage dedup passes share a single hash
exchange on ``phash``.

Design rules (the 100 TB story):

- **bytes never shuffle.** The decode UDF consumes the binary column
  straight off the scan; the projection after it is slim
  (id, phash, caption, label columns). Parquet column pruning keeps
  text-only runs from reading bytes at all when `validate=False`.
- **no branch, no join.** Dropped rows are not split off (that would
  re-run the scan per branch); instead `drop_reason` accumulates via
  coalesce — first failing rule wins, later rules see `alive =
  drop_reason IS NULL`.
- **narrow first, wide last — and the narrow phase is ONE Arrow
  stage.** All rules and scrubs are per-row, so the caption's whole
  evolution (original → PII-scrubbed → toxicity-scrubbed → normalized)
  is computed in a single fused ``mapInArrow`` crossing BEFORE any
  shuffle (see ``curate_narrow_arrow`` for the measured rationale).
  Python eval nodes do not preserve partitioning info, so putting them
  between window passes would force one exchange per dedup pass;
  keeping the three dedup window passes adjacent lets them share ONE
  hash exchange on phash (asserted by tests/test_plan_shape.py).
- **dedup sees only alive rows** via when(alive, …) inside the window
  aggregates — exact equivalent of the oracle deduping survivors only.
- ``dedup_strategy='auto'`` (the CLI / run_curate default) runs one
  small eager sampling job at plan-BUILD time (see
  :func:`choose_dedup_strategy`) to pick the physical dedup
  formulation; the returned plan itself is still one lazy lineage.
  The library default stays 'window' so `build_labels_plan` is fully
  lazy unless adaptivity is requested.

The reason-priority order is exactly the oracle's stage order even
though values are precomputed: stage-1 rules → dedup-1 → scrub drops →
dedup-2 → dedup-3; `coalesce` makes the earlier stage win, and the
when(alive, …) window inputs make each dedup pass see exactly the rows
the oracle's survivor set contains at that point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mehc_curation_spark.operators.udfs import curate_narrow_arrow
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import CAPTION_COL, ID_COL, KEY_COL


def _dedup_pass(df: DataFrame, caption_hash_col: str) -> DataFrame:
    """Append dedup drop-reasons for currently-alive rows (reference
    semantics, ``utils/common.py:88-113``: conflicting key ⇒ drop ALL
    its rows; otherwise keep-first of identical (key, caption)).

    Keys on a 128-bit caption hash column (see build_labels_plan), not
    the caption string: the window sorts then compare two longs instead
    of arbitrary-length UTF-8, and the exchange payload stays slim.
    """
    alive = F.col("drop_reason").isNull()
    h = F.col(caption_hash_col)
    alive_h = F.when(alive, h)
    w_key = Window.partitionBy(KEY_COL)
    w_prior = (
        Window.partitionBy(KEY_COL, f"{caption_hash_col}.a",
                           f"{caption_hash_col}.b")
        .orderBy(ID_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # ">1 distinct alive caption" as min!=max over the phash partition:
    # constant memory per row — a collect_set buffer per group was the
    # dominant GC source in this stage at high core counts — and both
    # window specs are satisfied by the SAME sort (phash, h.a, h.b, id),
    # so each dedup pass costs exactly one sort, no re-sort between the
    # two WindowExecs.
    conflict = F.min(alive_h).over(w_key) != F.max(alive_h).over(w_key)
    prior_alive = F.count(F.when(alive, F.lit(1))).over(w_prior)
    return df.withColumn(
        "drop_reason",
        F.coalesce(
            F.col("drop_reason"),
            F.when(conflict, F.lit("duplicate_conflict"))
            .when(prior_alive > 0, F.lit("duplicate_perfect")),
        ),
    )


def _dedup_pass_dual(df: DataFrame, caption_hash_col: str) -> DataFrame:
    """:func:`_dedup_pass` evolving a TWIN drop-reason
    (``_drop_reason_old``) computed as if only the rows with
    ``_is_old`` true existed, in the SAME window pass.

    Both twin window specs are satisfied by the identical
    (phash, h.a, h.b, id) sort the primary pass already performs, so
    the prior-label replay costs zero extra shuffles and zero extra
    sorts — just three more window aggregates over the sorted runs.
    Incremental curation (stages/incremental.py) derives "what was
    this old row's label before the increment arrived" from the twin
    instead of scanning the corpus-sized labels table."""
    alive = F.col("drop_reason").isNull()
    is_old = F.col("_is_old")
    alive_o = F.col("_drop_reason_old").isNull() & is_old
    h = F.col(caption_hash_col)
    w_key = Window.partitionBy(KEY_COL)
    w_prior = (
        Window.partitionBy(KEY_COL, f"{caption_hash_col}.a",
                           f"{caption_hash_col}.b")
        .orderBy(ID_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conflict = (F.min(F.when(alive, h)).over(w_key)
                != F.max(F.when(alive, h)).over(w_key))
    prior_alive = F.count(F.when(alive, F.lit(1))).over(w_prior)
    conflict_o = (F.min(F.when(alive_o, h)).over(w_key)
                  != F.max(F.when(alive_o, h)).over(w_key))
    prior_alive_o = F.count(F.when(alive_o, F.lit(1))).over(w_prior)
    # one select: every window expression evaluates against the
    # PRE-update reason columns
    return df.select(
        *[c for c in df.columns
          if c not in ("drop_reason", "_drop_reason_old")],
        F.coalesce(
            F.col("drop_reason"),
            F.when(conflict, F.lit("duplicate_conflict"))
            .when(prior_alive > 0, F.lit("duplicate_perfect")),
        ).alias("drop_reason"),
        F.coalesce(
            F.col("_drop_reason_old"),
            F.when(is_old & conflict_o, F.lit("duplicate_conflict"))
            .when(is_old & (prior_alive_o > 0),
                  F.lit("duplicate_perfect")),
        ).alias("_drop_reason_old"),
    )


def apply_dedup_passes_dual(state: DataFrame,
                            config: "CurationConfig",
                            is_old_col: str) -> DataFrame:
    """:func:`apply_dedup_passes` (window strategy) that ALSO carries
    the counterfactual ``_drop_reason_old`` — each row's drop reason
    as if only the ``is_old_col`` rows existed. Old rows whose two
    reasons differ are exactly the rows the increment relabels (the
    non-dedup label parts are per-row and cannot flip), so the
    incremental diff needs no join against stored labels."""
    gates = config.dedup_gates()
    out = state.withColumn("_is_old", F.col(is_old_col)) \
               .withColumn("_drop_reason_old",
                           F.when(F.col(is_old_col),
                                  F.col("drop_reason")))
    if gates[0]:
        out = _dedup_pass_dual(out, "_h_orig")
    folded = F.coalesce(F.col("drop_reason"), F.col("scrub_reason"))
    out = (out.withColumn("drop_reason", folded)
           .withColumn("_drop_reason_old",
                       F.when(F.col("_is_old"),
                              F.coalesce(F.col("_drop_reason_old"),
                                         F.col("scrub_reason")))))
    if gates[1]:
        out = _dedup_pass_dual(out, "_h_scrub")
    if gates[2]:
        out = _dedup_pass_dual(out, "_h_final")
    return out.drop("_is_old")


def _dedup_pass_agg(df: DataFrame, caption_hash_col: str) -> DataFrame:
    """Skew-robust variant of :func:`_dedup_pass` — identical
    semantics via two partial aggregations + joins instead of windows.

    A window pass sends EVERY row of a phash to one task; a single
    viral image (one phash with 10^7+ rows) hotspots that task at
    corpus scale. Here both facts the pass needs are aggregates with
    map-side partial combine:

    - ``first_alive``  = min alive image_id per (phash, caption-hash)
      → perfect-dup drop is ``alive AND id != first_alive``;
    - ``n_alive_caps`` = countDistinct alive caption-hash per phash
      → conflict drop is ``n_alive_caps > 1``.

    The hot key collapses to ONE row per aggregate before the join, and
    the join back to the big side is AQE-skew-splittable. Cost: two
    extra shuffles per pass vs the shared-sort windows — use via
    ``CurationConfig(dedup_strategy='agg')`` when key skew dominates;
    the default 'window' strategy is cheaper on balanced keys.
    """
    alive = F.col("drop_reason").isNull()
    h = F.col(caption_hash_col)
    ha, hb = f"{caption_hash_col}.a", f"{caption_hash_col}.b"
    firsts = (
        df.groupBy(F.col(KEY_COL).alias("_jk"), F.col(ha).alias("_ja"),
                   F.col(hb).alias("_jb"))
        .agg(F.min(F.when(alive, F.col(ID_COL))).alias("_first_alive"))
    )
    ncaps = (
        df.groupBy(F.col(KEY_COL).alias("_jk2"))
        .agg(F.count_distinct(F.when(alive, h)).alias("_n_alive_caps"))
    )
    # eqNullSafe on the hash fields: NULL captions hash to a NULL
    # struct (see _cap_hash) and must join back to their own firsts
    # group — plain equality would leave _first_alive NULL for them,
    # silently skipping the perfect-dup drop and diverging from the
    # window strategy / pandas oracle.
    out = (
        df.join(firsts, (F.col(KEY_COL) == F.col("_jk"))
                & F.col(ha).eqNullSafe(F.col("_ja"))
                & F.col(hb).eqNullSafe(F.col("_jb")),
                "left")
        .drop("_jk", "_ja", "_jb")
        .join(ncaps, F.col(KEY_COL) == F.col("_jk2"), "left")
        .drop("_jk2")
    )
    return out.withColumn(
        "drop_reason",
        F.coalesce(
            F.col("drop_reason"),
            F.when(F.col("_n_alive_caps") > 1, F.lit("duplicate_conflict"))
            .when(alive & (F.col(ID_COL) != F.col("_first_alive")),
                  F.lit("duplicate_perfect")),
        ),
    ).drop("_first_alive", "_n_alive_caps")


def _cap_hash(col_name: str) -> F.Column:
    """128-bit equality surrogate for a caption column: two xxhash64
    runs with independent seeds. At the 10^12-row design point a single
    64-bit hash would see ~10^4 birthday collisions corpus-wide (wrong
    merges of distinct captions); 128 bits pushes that to ~10^-15.
    Collisions only matter WITHIN one phash group, so even 64 bits is
    safe in practice — 128 makes it a non-question for the price of one
    extra long per row.

    Null-preserving: a NULL caption maps to a NULL struct (xxhash64 of
    an all-null input returns the seed, which would make NULL captions
    count as a distinct caption in conflict detection — the oracle's
    pandas ``nunique`` ignores nulls). With a NULL hash,
    ``when(alive, h)`` stays NULL, so min/max/count_distinct skip null
    captions, while the perfect-dup grouping (partitionBy / groupBy)
    still groups the nulls together, matching pandas ``duplicated``
    NaN-equality semantics."""
    return F.when(
        F.col(col_name).isNotNull(),
        F.struct(F.xxhash64(F.col(col_name)).alias("a"),
                 F.xxhash64(F.col(col_name), F.lit(1)).alias("b")))


def choose_dedup_strategy(df: DataFrame, config: CurationConfig) -> str:
    """Resolve ``dedup_strategy='auto'``: sample the phash histogram
    (slim single-column scan + map-side-combined count, a subsecond
    job even at bench scale) and pick the skew-robust 'agg' formulation
    when the hottest key's sample share exceeds
    ``config.dedup_hot_key_share`` — the viral-image case where a
    window pass would funnel one phash's 10^7+ rows into a single task.
    Both strategies produce byte-identical labels (asserted by
    tests/test_pipeline_oracle.py), so this is purely a physical-plan
    choice."""
    if config.dedup_strategy != "auto":
        return config.dedup_strategy
    sample = df.select(KEY_COL)
    if config.dedup_sample_fraction < 1.0:
        sample = sample.sample(fraction=config.dedup_sample_fraction, seed=42)
    row = (sample.groupBy(KEY_COL).count()
           .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
           .first())
    if not row or not row["n"]:
        return "window"
    return ("agg" if row["mx"] / row["n"] >= config.dedup_hot_key_share
            else "window")


def narrow_state(df: DataFrame,
                 config: CurationConfig = CurationConfig()) -> DataFrame:
    """Phase A: the narrow per-row computation (no shuffle) — the
    pre-dedup "state" frame every dedup pass keys on.

    ONE fused Arrow stage: decode gate + langid + ppl + heuristics +
    PII/toxicity scrub + post-scrub re-validation + normalization in a
    single JVM↔Python crossing; `bytes` is consumed and dropped there,
    before anything wide. See curate_narrow_arrow for the measured
    rationale. Emits drop_reason (stage 1), scrub_reason (stage 2,
    folded in AFTER dedup-1 by :func:`apply_dedup_passes`) and the
    caption variants the dedup passes key on.

    Shuffle hygiene: the original and post-scrub captions are ONLY
    dedup keys from here on (the output carries just cap_final), so
    they are replaced by 128-bit hashes before the exchange — the
    window sorts compare longs, and ~2 caption strings per row never
    shuffle. Computed JVM-side (xxhash64 codegen) right after the
    Arrow stage.

    This frame is also what incremental curation persists per row
    (stages/incremental.py): it is everything needed to REPLAY the
    dedup passes for a phash group when later-arriving rows join the
    group, without touching the original bytes again.
    """
    out = curate_narrow_arrow(df, config)
    return (
        out.withColumn("_h_orig", _cap_hash(CAPTION_COL))
        .withColumn("_h_scrub", _cap_hash("cap_scrub"))
        .withColumn("_h_final", _cap_hash("cap_final"))
        .drop(CAPTION_COL, "cap_scrub")
    )


def apply_dedup_passes(state: DataFrame, config: CurationConfig,
                       strategy: str = "window") -> DataFrame:
    """Phase B: the wide region (one exchange on phash) — the three
    gated dedup passes over a :func:`narrow_state` frame, with the
    scrub drops folded in between dedup-1 and dedup-2 (the oracle's
    stage order)."""
    gates = config.dedup_gates()
    pass_fn = _dedup_pass_agg if strategy == "agg" else _dedup_pass

    out = state
    if gates[0]:
        out = pass_fn(out, "_h_orig")

    out = out.withColumn(
        "drop_reason", F.coalesce(F.col("drop_reason"), F.col("scrub_reason")))

    if gates[1]:
        out = pass_fn(out, "_h_scrub")

    if gates[2]:
        out = pass_fn(out, "_h_final")
    return out


def project_labels(out: DataFrame, *extra_cols: str) -> DataFrame:
    """Final labels projection over a post-dedup frame. ``extra_cols``
    lets callers carry bookkeeping columns (e.g. the phash bucket)
    through the projection."""
    alive = F.col("drop_reason").isNull()
    return out.select(
        ID_COL,
        KEY_COL,
        alive.alias("keep"),
        "drop_reason",
        F.when(alive, F.col("cap_final")).alias("caption_scrubbed"),
        "lang",
        "lang_conf",
        "ppl",
        *extra_cols,
    )


def build_labels_plan(df: DataFrame,
                      config: CurationConfig = CurationConfig()) -> DataFrame:
    """Build the (lazy) labels DataFrame:

    ``image_id, phash, keep, drop_reason, caption_scrubbed,
    lang, lang_conf, ppl``

    Mirrors ``complete_refinement``'s stage chain and dedup gates
    (``refinement/core/pipeline.py:73-269``) with the graft rules.
    Composition of :func:`narrow_state` → :func:`apply_dedup_passes` →
    :func:`project_labels` (one lazy lineage; the split exists so
    incremental curation can persist and replay the middle).
    """
    gates = config.dedup_gates()
    strategy = (choose_dedup_strategy(df, config)
                if any(gates) else "window")
    return project_labels(
        apply_dedup_passes(narrow_state(df, config), config, strategy))
