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


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 10,
                    sample_fraction: float = 1.0,
                    id_col: Optional[str] = None) -> DataFrame:
    """Hot-key diagnostics BEFORE a join/groupBy commits to a key —
    the "will this shuffle melt an executor" check every 100 TB
    pipeline runs on its join keys (AQE's skew-join split reacts at
    runtime; this tells you up front, and sizes the salt).

    One row per top-``top_k`` key (count desc, key-string asc
    tie-break; NULL keys are a legitimate — and commonly the hottest —
    group and are reported, rendered as NULL):

    ``key, n, share, skew_ratio, suggested_salt``

    - ``share``       = n / total rows counted
    - ``skew_ratio``  = n / mean-rows-per-key (1.0 == perfectly even)
    - ``suggested_salt`` = ceil(skew_ratio): the salt factor that
      splits the key into chunks of at most the mean key size — the
      number ``per_domain_cap``-style salting wants.

    ``sample_fraction < 1`` counts only rows whose ``u48(id) <
    f * 2^48`` (the repo's portable ``hash_sample`` rule on
    ``id_col``, required then) — at corpus scale a 1% sample ranks
    hot keys reliably while shuffling 1% of the (key) pairs; counts
    and derived stats then DESCRIBE THE SAMPLE (scale n by 1/f
    mentally; share/skew_ratio are scale-free).

    Plan shape: one partial-aggregable groupBy(key) count, a
    TakeOrderedAndProject for the top-k (never a global sort), and a
    broadcast of the 1-row totals — the full key census never
    collects.
    """
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction in (0, 1], got {sample_fraction}")
    d = df
    if sample_fraction < 1.0:
        if id_col is None:
            raise ValueError("sample_fraction < 1 requires id_col")
        from mehc_curation_spark.operators.sampling import hash_sample
        d = hash_sample(df, id_col, sample_fraction)
    counts = d.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_n_keys"))
    top = (counts
           .orderBy(F.desc("n"), F.asc_nulls_first("key"))
           .limit(int(top_k)))
    mean = F.col("_total") / F.col("_n_keys")
    return (top.crossJoin(F.broadcast(totals))
            .select(
                "key", "n",
                F.round(F.col("n") / F.col("_total"), 6).alias("share"),
                F.round(F.col("n") / mean, 6).alias("skew_ratio"),
                F.ceil(F.col("n") / mean).cast("int")
                 .alias("suggested_salt"))
            .orderBy(F.desc("n"), F.asc_nulls_first("key")))


def join_fanout_report(left: DataFrame, right: DataFrame,
                       left_key: str, right_key: Optional[str] = None,
                       top_k: int = 10) -> DataFrame:
    """Pre-join fan-out diagnostics — "how many rows will this join
    EMIT per key, and which keys explode": per-key row counts on both
    sides and the exact per-key output cardinality ``n_left *
    n_right``, for the ``top_k`` keys by that product (desc, then
    key-string asc). ``share`` is the key's fraction of the TOTAL join
    output. Run it before a big equi-join the way ``key_skew_report``
    is run before a groupBy: a single key carrying 30% of the output
    is the AQE-skew-split / salting candidate.

    NULL keys are absent by construction — an equi-join emits nothing
    for NULL = NULL, so they contribute no fan-out (unlike
    ``key_skew_report``, where a NULL group is a real aggregation
    group). Keys on only one side likewise emit nothing and are
    dropped by the inner join of the two count tables.

    Plan shape: one partial-aggregable count per side (slim key rows
    shuffle, never the payloads), an inner join of the two count
    tables on the key, a TakeOrderedAndProject for the top-k, and a
    broadcast 1-row total.
    """
    rk = right_key or left_key
    lc = left.groupBy(F.col(left_key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(F.col(rk).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_right"))
    # DOUBLE product: two ~3e9-row sides overflow an int64 product —
    # exactly the extreme keys this report exists to flag (ANSI mode
    # would crash; non-ANSI would wrap negative and HIDE the key)
    j = lc.join(rc, "key").withColumn(
        "est_rows",
        F.col("n_left").cast("double") * F.col("n_right"))
    tot = j.agg(F.sum("est_rows").cast("double").alias("_total"))
    return (j.orderBy(F.desc("est_rows"), F.asc("key"))
            .limit(int(top_k))
            .crossJoin(F.broadcast(tot))
            .select("key", "n_left", "n_right", "est_rows",
                    F.round(F.col("est_rows") / F.col("_total"), 6)
                     .alias("share"))
            .orderBy(F.desc("est_rows"), F.asc("key")))


def score_drift(df_ref: DataFrame, df_new: DataFrame, col: str,
                n_buckets: int = 10) -> DataFrame:
    """Population stability index between two corpus versions' score
    distributions — the standard production-monitoring statistic for
    "did my quality/langid/aesthetic scores move after this ingest?"
    (complements io/card.card_drift's coarse rate flags with a
    distribution-level signal).

    Buckets are equal-width over the REFERENCE side's [min, max]
    (out-of-range new-side scores clamp to the edge buckets, so a
    shifted distribution piles up visibly at an edge); proportions are
    add-one smoothed (never a log of zero); per-bucket contribution
    (p_ref - p_new) * ln(p_ref / p_new) >= 0 always, and PSI = the
    sum (rule of thumb: < 0.1 stable, > 0.25 investigate).

    Physical shape: one min/max/count aggregate on the reference
    (three scalars to the driver), one count-only scan of the new
    side, then ONE map-combinable groupBy(bucket) per side — no
    window, no sort, and the groupBys are never evaluated twice
    (totals never re-aggregate the joined frame); the result is
    ``n_buckets`` rows
    (bucket, n_ref, n_new, p_ref, p_new, psi_contrib), each rounded
    to 6 decimals for engine parity. NULL and NaN scores are excluded
    on both sides (they carry no position in the distribution; an
    unfiltered NaN would poison max() and silently collapse every
    bucket into one, masking exactly the drift the monitor exists to
    catch).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    def _valid(df):
        c = F.col(col).cast("double")
        return df.filter(c.isNotNull() & ~F.isnan(c))

    ref, new = _valid(df_ref), _valid(df_new)
    # ONE reference pass yields bounds AND the ref total
    bounds = ref.agg(F.min(F.col(col).cast("double")).alias("lo"),
                     F.max(F.col(col).cast("double")).alias("hi"),
                     F.count("*").alias("tr")).first()
    if bounds["lo"] is None:
        raise ValueError(f"score_drift: reference side has no non-NULL "
                         f"'{col}' values")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = (hi - lo) / n_buckets if hi > lo else 1.0

    def bucket(c):
        return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), F.floor(
            (c.cast("double") - F.lit(lo)) / F.lit(width)))).cast("int")

    def counts(df, name):
        return (df.select(bucket(F.col(col)).alias("bucket"))
                .groupBy("bucket").agg(F.count("*").alias(name)))

    spark = df_ref.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    joined = (all_buckets
              .join(counts(ref, "n_ref"), "bucket", "left")
              .join(counts(new, "n_new"), "bucket", "left")
              .select("bucket",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_new", F.lit(0)).alias("n_new")))
    # totals come from count-only scans (column-pruned), never a
    # second evaluation of the bucket groupBys
    tr, tn = int(bounds["tr"]), new.count()
    p_ref = (F.col("n_ref") + 1).cast("double") / F.lit(float(tr + n_buckets))
    p_new = (F.col("n_new") + 1).cast("double") / F.lit(float(tn + n_buckets))
    return (joined
            .withColumn("p_ref", F.round(p_ref, 6))
            .withColumn("p_new", F.round(p_new, 6))
            .withColumn("psi_contrib",
                        F.round((p_ref - p_new) * F.log(p_ref / p_new), 6))
            .orderBy("bucket"))


def category_drift(df_ref: DataFrame, df_new: DataFrame, col: str,
                   top_k: int = 20) -> DataFrame:
    """PSI between two corpus versions' CATEGORICAL distributions —
    the companion of :func:`score_drift` for columns with no numeric
    axis (``lang``, ``fmt``, ``source``, ``drop_reason``). "Did this
    ingest silently shift the language mixture" is the drift question
    score buckets cannot answer.

    Category axis = the ``top_k`` reference-side values by count
    (descending, then value ascending — deterministic); every other
    value pools into ``__other__`` and NULL is its own ``__null__``
    category (a label column's NULL usually MEANS something — kept
    rows — and pooling it with the tail would hide a keep-rate
    drift). Proportions are add-one smoothed per category, so a
    category present on one side only still gets a finite
    contribution; PSI = sum of ``psi_contrib`` (same reading as
    score_drift: < 0.1 stable, > 0.25 investigate).

    A real value LITERALLY equal to ``__null__`` conflates with the
    NULL group, and a real ``__other__`` value outside the top-k
    merges with the tail pool (both documented, not detectable after
    the coalesce); a real ``__other__`` that makes the top-k would
    DOUBLE-COUNT an axis row, so that case raises instead. An empty
    reference side raises (every new-side distribution would read
    PSI 0.0 "stable" against it — the exact failure a drift monitor
    exists to catch).

    Physical shape: THREE jobs — the reference top-k (one
    map-combinable count aggregate, ``top_k`` rows to the driver),
    then one pooled count aggregate per side (``isin`` against the
    literal top-k list, no join anywhere); side totals are the sums
    of the pooled counts (pooling is total-preserving), so no extra
    count scans. The final smoothing/PSI arithmetic runs as Catalyst
    expressions over the local ``top_k + 1``-row result frame (same
    ``round`` semantics as the SQL oracle).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    def cat(c):
        return F.coalesce(F.col(c).cast("string"), F.lit("__null__"))

    def counts(df):
        return (df.select(cat(col).alias("val"))
                .groupBy("val").agg(F.count(F.lit(1)).alias("n")))

    rc, nc = counts(df_ref), counts(df_new)
    top_rows = rc.orderBy(F.desc("n"), F.asc("val")) \
                 .limit(int(top_k)).collect()
    if not top_rows:
        raise ValueError(
            f"category_drift: reference side has no rows for '{col}' — "
            "every distribution would read PSI 0.0 against it")
    top_names = [r["val"] for r in top_rows]
    if "__other__" in top_names:
        raise ValueError(
            "category_drift: the reference top-k contains the literal "
            "value '__other__', which collides with the tail-pool "
            "sentinel — rename that category upstream")

    def pooled(cdf):
        rows = (cdf.select(
                    F.when(F.col("val").isin(top_names), F.col("val"))
                     .otherwise(F.lit("__other__")).alias("category"), "n")
                .groupBy("category").agg(F.sum("n").alias("n")).collect())
        return {r["category"]: int(r["n"]) for r in rows}

    pr, pn = pooled(rc), pooled(nc)
    axis = top_names + ["__other__"]
    tr, tn = sum(pr.values()), sum(pn.values())
    n_cats = len(axis)
    spark = df_ref.sparkSession
    base = spark.createDataFrame(
        [(c, pr.get(c, 0), pn.get(c, 0)) for c in axis],
        "category string, n_ref long, n_new long")
    p_ref = (F.col("n_ref") + 1).cast("double") / F.lit(float(tr + n_cats))
    p_new = (F.col("n_new") + 1).cast("double") / F.lit(float(tn + n_cats))
    return (base
            .withColumn("p_ref", F.round(p_ref, 6))
            .withColumn("p_new", F.round(p_new, 6))
            .withColumn("psi_contrib",
                        F.round((p_ref - p_new) * F.log(p_ref / p_new), 6))
            .orderBy(F.desc("n_ref"), F.asc("category")))


def label_shift(df_old: DataFrame, df_new: DataFrame, id_col: str,
                label_col: str) -> DataFrame:
    """Label-transition matrix between two labelings of one corpus —
    the "what did this rules update actually change" audit. Run it
    after shipping a new PII pattern / threshold / rule version:
    the diagonal is stability, off-diagonal cells name exactly which
    decision flows grew (``kept -> dropped:pii`` is the reviewable
    one).

    Full outer join on the id (a row present on one side only gets
    ``__absent__`` on the other — ingest/takedown between versions is
    itself a transition worth seeing), NULL labels render as
    ``__null__``, and the matrix is
    ``(label_old, label_new, n, share)`` with ``share`` the cell's
    fraction of all joined rows (rounded to 6 decimals).

    Physical shape: one hash join on the id, then one map-combinable
    two-column groupBy; the matrix is at most ``(L+2)^2`` rows, so
    the final share window over it is trivially small.
    """
    lo = df_old.select(F.col(id_col).alias("_id"),
                       F.coalesce(F.col(label_col).cast("string"),
                                  F.lit("__null__")).alias("label_old"))
    ln = df_new.select(F.col(id_col).alias("_id"),
                       F.coalesce(F.col(label_col).cast("string"),
                                  F.lit("__null__")).alias("label_new"))
    m = (lo.join(ln, "_id", "full_outer")
         .select(F.coalesce("label_old", F.lit("__absent__"))
                  .alias("label_old"),
                 F.coalesce("label_new", F.lit("__absent__"))
                  .alias("label_new"))
         .groupBy("label_old", "label_new")
         .agg(F.count(F.lit(1)).alias("n")))
    from pyspark.sql.window import Window
    tot = F.sum("n").over(Window.partitionBy())
    return (m.withColumn("share", F.round(F.col("n") / tot, 6))
            .orderBy(F.desc("n"), F.asc("label_old"), F.asc("label_new")))


def rule_ablation(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass rule ablation/overlap report for a filter stack —
    "which rules pull their weight, which are redundant" (the
    filter-stack tuning table every published web-pipeline analysis
    tabulates; the reference prints only per-stage drop totals,
    `refinement/core/pipeline.py:92-118`, which cannot say whether a
    rule's drops are UNIQUE or shadowed by cheaper rules).

    ``rules`` maps rule name -> boolean Column over ``df``'s columns
    (True = the rule DROPS the row; NULL counts as False). Returns one
    row per rule::

        rule, n_drop (rows the rule fires on),
        n_unique (rows ONLY this rule fires on — the rule's real
        marginal contribution: delete a rule with n_unique=0 and the
        kept corpus does not change),
        n_any (rows any rule fires on), n_rows,
        drop_share (n_drop/n_rows), unique_share (n_unique/n_rows)

    Physical shape: every flag and every pairwise-overlap term folds
    into ONE map-combinable aggregate over a single scan (no
    per-rule rescans, no join, no window); the explode runs over the
    one aggregated row. Rule count is bounded (a stack is tens of
    rules), so the 2R aggregate expressions stay trivially small.
    """
    import functools
    import operator as op

    if not rules:
        raise ValueError("rules must be a non-empty mapping")
    names = list(rules)
    # positional aliases throughout, never name-interpolated ones: a
    # rule name with a dot would otherwise parse as a struct-field
    # access in F.col
    fcols = [f"_f_{i}" for i in range(len(names))]
    flags = df.select(*[
        F.coalesce(rules[n].cast("boolean"), F.lit(False)).alias(fc)
        for n, fc in zip(names, fcols)])
    aggs = []
    for i, fc in enumerate(fcols):
        others = [F.col(m) for m in fcols if m != fc]
        any_other = functools.reduce(op.or_, others, F.lit(False))
        aggs.append(F.sum(F.col(fc).cast("long")).alias(f"_d_{i}"))
        aggs.append(F.sum((F.col(fc) & ~any_other).cast("long"))
                    .alias(f"_u_{i}"))
    any_rule = functools.reduce(op.or_, [F.col(fc) for fc in fcols],
                                F.lit(False))
    aggs.append(F.sum(any_rule.cast("long")).alias("_any"))
    aggs.append(F.count(F.lit(1)).alias("_total"))
    row = flags.agg(*aggs)
    per_rule = F.array(*[
        F.struct(F.lit(n).alias("rule"),
                 F.col(f"_d_{i}").alias("n_drop"),
                 F.col(f"_u_{i}").alias("n_unique"))
        for i, n in enumerate(names)])
    return (row.select(F.explode(per_rule).alias("r"), "_any", "_total")
            .select(F.col("r.rule").alias("rule"),
                    F.col("r.n_drop").alias("n_drop"),
                    F.col("r.n_unique").alias("n_unique"),
                    F.col("_any").alias("n_any"),
                    F.col("_total").alias("n_rows"),
                    F.round(F.col("r.n_drop")
                            / F.greatest(F.col("_total"), F.lit(1)), 6)
                     .alias("drop_share"),
                    F.round(F.col("r.n_unique")
                            / F.greatest(F.col("_total"), F.lit(1)), 6)
                     .alias("unique_share")))


def threshold_sweep(df: DataFrame, score_col: str, label_col: str,
                    lo: float, hi: float, n_bins: int = 20,
                    group_col: Optional[str] = None) -> DataFrame:
    """Filter-threshold calibration sweep: for every candidate cutoff
    on a fixed-width grid over ``[lo, hi)``, the precision / recall /
    F1 of the rule "keep rows with ``score_col`` >= threshold" against
    the boolean ``label_col`` — the tuning curve for a quality /
    perplexity / alignment gate (the per-language ppl thresholds of
    this engine's own refinement stage are exactly this knob; cf. the
    reference's fixed per-step valid/invalid conditions,
    ``/root/reference/mehc_curation/validation/config/validation_config.py:22-86``,
    which a user calibrates by sweeping).

    ``group_col`` yields one independent curve per group (e.g. per
    language). Rows with NULL score or NULL label are excluded (and
    with ``group_col``, NULL groups too) — documented contract shared
    with the SQL oracle.

    Scale shape (100 TB): rows collapse into per-(group, bin) partial
    aggregates in ONE scan — map-side combinable, no row-level shuffle
    — and the cumulative >=-threshold counts come from a window over
    the ≤ ``n_groups * n_bins`` aggregated rows. Scores outside
    [lo, hi) clamp to the edge bins. Exact integer counts everywhere;
    precision/recall/F1 are single divisions of integers (F1 via
    2*TP / (kept + positives), algebraically 2TP/(2TP+FP+FN)), so
    every value is bit-reproducible across engines and partitionings.

    Returns one row per OCCUPIED (group?, bin) — empty bins yield no
    row: ``(group?, threshold, kept, tp, n_rows, n_pos, precision,
    recall, f1)`` — ``precision`` NULL when nothing is kept.
    """
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"threshold_sweep: n_bins={n_bins} must be >= 1")
    if not (hi > lo):
        raise ValueError(f"threshold_sweep: need hi > lo, got [{lo}, {hi})")
    step = (float(hi) - float(lo)) / int(n_bins)
    d = df.filter(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
    gcols = []
    if group_col is not None:
        d = d.filter(F.col(group_col).isNotNull())
        gcols = [group_col]
    bin_idx = F.least(
        F.greatest(F.floor((F.col(score_col).cast("double") - F.lit(float(lo)))
                           / F.lit(step)), F.lit(0)),
        F.lit(int(n_bins) - 1))
    per_bin = (d.select(*gcols, bin_idx.alias("_bin"),
                        F.col(label_col).cast("boolean").alias("_y"))
               .groupBy(*gcols, "_bin")
               .agg(F.count("*").alias("_n"),
                    F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_p")))
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    # kept(threshold=edge of bin b) = rows in bins >= b
    w_ge = (wg.orderBy(F.desc("_bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    totals = (per_bin
              .withColumn("kept", F.sum("_n").over(w_ge))
              .withColumn("tp", F.sum("_p").over(w_ge))
              .withColumn("n_rows", F.sum("_n").over(
                  wg.orderBy("_bin").rowsBetween(
                      Window.unboundedPreceding,
                      Window.unboundedFollowing)))
              .withColumn("n_pos", F.sum("_p").over(
                  wg.orderBy("_bin").rowsBetween(
                      Window.unboundedPreceding,
                      Window.unboundedFollowing))))
    threshold = F.round(F.lit(float(lo)) + F.col("_bin") * F.lit(step), 9)
    precision = F.when(F.col("kept") > 0,
                       F.round(F.col("tp").cast("double")
                               / F.col("kept").cast("double"), 6))
    recall = F.when(F.col("n_pos") > 0,
                    F.round(F.col("tp").cast("double")
                            / F.col("n_pos").cast("double"), 6))
    f1 = F.when(F.col("kept") + F.col("n_pos") > 0,
                F.round((F.lit(2.0) * F.col("tp").cast("double"))
                        / (F.col("kept") + F.col("n_pos")).cast("double"),
                        6))
    return totals.select(
        *gcols, threshold.alias("threshold"), "kept", "tp",
        "n_rows", "n_pos", precision.alias("precision"),
        recall.alias("recall"), f1.alias("f1"))


def reference_profile(df_ref: DataFrame, col: str,
                      n_buckets: int = 10) -> dict:
    """Driver-side reference distribution for drift checks against a
    STREAM (or any repeated cheap comparisons): the same equal-width
    bucketing :func:`score_drift` uses, collected once into a small
    dict ``{col, lo, hi, n_buckets, counts, total}`` that a
    foreachBatch callback can score micro-batches against without
    re-scanning the reference corpus per batch."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    c = F.col(col).cast("double")
    ref = df_ref.filter(c.isNotNull() & ~F.isnan(c))
    bounds = ref.agg(F.min(c).alias("lo"), F.max(c).alias("hi"),
                     F.count("*").alias("tr")).first()
    if bounds["lo"] is None:
        raise ValueError(f"reference_profile: no non-NULL '{col}' values")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    bucket = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), F.floor(
        (c - F.lit(lo)) / F.lit(width)))).cast("int")
    rows = (ref.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")).collect())
    counts = [0] * n_buckets
    for r in rows:
        counts[r["bucket"]] = r["n"]
    return {"col": col, "lo": lo, "hi": hi, "n_buckets": n_buckets,
            "counts": counts, "total": int(bounds["tr"])}


def psi_against_profile(new_counts: list, new_total: int,
                        profile: dict) -> float:
    """PSI of a new-side bucket-count vector against a
    :func:`reference_profile` — the EXACT arithmetic of
    :func:`score_drift` (add-one smoothing, per-bucket
    (p_ref - p_new) * ln(p_ref / p_new) rounded to 6, summed then
    rounded to 6), so a streaming monitor and the batch `drift` CLI
    agree to the last digit on the same data (pinned by test)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float) -> float:
        # Spark's F.round on a double is BigDecimal(shortest-repr)
        # HALF_UP; python's round() is HALF_EVEN — replicate Spark
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    nb = profile["n_buckets"]
    if len(new_counts) != nb:
        raise ValueError(f"psi_against_profile: expected {nb} counts, "
                         f"got {len(new_counts)}")
    tr, tn = profile["total"], new_total
    psi = 0.0
    for nr, nn in zip(profile["counts"], new_counts):
        p_ref = (nr + 1) / float(tr + nb)
        p_new = (nn + 1) / float(tn + nb)
        psi += _r6((p_ref - p_new) * math.log(p_ref / p_new))
    return _r6(psi)


def bucket_counts_for_profile(df: DataFrame, profile: dict) -> list:
    """Bucket a frame's ``profile['col']`` with the profile's bounds
    (same clamp-to-edges rule as :func:`score_drift`) and return the
    count vector aligned to ``profile['counts']``."""
    nb = profile["n_buckets"]
    lo, hi = profile["lo"], profile["hi"]
    width = (hi - lo) / nb if hi > lo else 1.0
    c = F.col(profile["col"]).cast("double")
    bucket = F.least(F.lit(nb - 1), F.greatest(F.lit(0), F.floor(
        (c - F.lit(lo)) / F.lit(width)))).cast("int")
    rows = (df.filter(c.isNotNull() & ~F.isnan(c))
            .select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")).collect())
    counts = [0] * nb
    for r in rows:
        counts[r["bucket"]] = r["n"]
    return counts


def calibration_report(df: DataFrame, prob_col: str, label_col: str,
                       n_bins: int = 10) -> DataFrame:
    """Reliability diagram + expected-calibration-error inputs for a
    probabilistic quality model (Guo et al. 2017, "On Calibration of
    Modern Neural Networks", ICML — the standard production check that
    a model's confidence means what it says; run it on the quality
    classifier before trusting its probabilities as sampling weights).

    Bins ``prob_col`` into ``n_bins`` equal-width bins over [0, 1]
    (probs clamp to the edge bins; NULL prob/label rows are excluded)
    and reports per OCCUPIED bin:

    ``bin, n, n_pos, conf, acc, gap``

    where ``conf`` is the bin's mean predicted probability, ``acc``
    its empirical positive rate, and ``gap = |acc - conf|``; ECE is
    ``sum(n_i * gap_i) / N`` over these rows. Determinism contract
    (shared with the SQL oracle): probabilities are rounded to 6 and
    scaled to exact integers before summing, so every mean is one
    double division of integer-valued operands — bit-reproducible
    across engines and partitionings.

    Scale shape: ONE map-combinable scan to per-bin integer counts;
    nothing else moves.
    """
    if n_bins < 1:
        raise ValueError(f"calibration_report: n_bins={n_bins} must be >= 1")
    p = F.col(prob_col).cast("double")
    d = df.filter(p.isNotNull() & ~F.isnan(p)
                  & F.col(label_col).isNotNull())
    bin_idx = F.least(F.greatest(F.floor(p * n_bins), F.lit(0)),
                      F.lit(int(n_bins) - 1))
    scaled = F.round(F.round(p, 6) * 1000000).cast("long")
    per = (d.select(bin_idx.alias("bin"), scaled.alias("_ps"),
                    F.col(label_col).cast("boolean").alias("_y"))
           .groupBy("bin")
           .agg(F.count("*").alias("n"),
                F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n_pos"),
                F.sum("_ps").alias("_sp")))
    conf = F.round(F.col("_sp").cast("double")
                   / (F.col("n").cast("double") * F.lit(1000000.0)), 6)
    acc = F.round(F.col("n_pos").cast("double")
                  / F.col("n").cast("double"), 6)
    return per.select(
        "bin", "n", "n_pos", conf.alias("conf"), acc.alias("acc"),
        F.round(F.abs(acc - conf), 6).alias("gap"))


def auc_report(df: DataFrame, score_col: str, label_col: str,
               group_col: Optional[str] = None) -> DataFrame:
    """ROC-AUC of a score against a boolean label via the
    Mann-Whitney U rank statistic (the textbook identity: AUC =
    P(score_pos > score_neg) + P(equal)/2), optionally one row per
    group — the third leg of the gate-tuning triad beside
    :func:`threshold_sweep` (operating points) and
    :func:`calibration_report` (probability quality).

    Computed distributively with NO per-row window: rows collapse to
    per-(group, score) counts in one map-combinable aggregation; a
    window over those aggregated rows (ordered by score) assigns each
    distinct score its midrank ``cum_before + (n + 1) / 2``; then
    ``AUC = (S - n_pos*(n_pos+1)/2) / (n_pos * n_neg)`` where S is the
    positives' midrank sum. Midranks are dyadic rationals (halves) and
    counts are exact integers, so the one final division is
    bit-reproducible across engines and partitionings. Ties get the
    standard average-rank treatment. NULL scores/labels (and NULL
    groups when grouped) are excluded; a group with no positives or no
    negatives reports NULL auc (undefined).

    Returns ``(group?, n, n_pos, n_neg, auc)``.
    """
    from pyspark.sql import Window

    p = F.col(score_col).cast("double")
    d = df.filter(p.isNotNull() & ~F.isnan(p)
                  & F.col(label_col).isNotNull())
    gcols = []
    if group_col is not None:
        d = d.filter(F.col(group_col).isNotNull())
        gcols = [group_col]
    per = (d.select(*gcols, p.alias("_s"),
                    F.col(label_col).cast("boolean").alias("_y"))
           .groupBy(*gcols, "_s")
           .agg(F.count("*").alias("_n"),
                F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_p")))
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    cum_before = F.coalesce(
        F.sum("_n").over(wg.orderBy("_s").rowsBetween(
            Window.unboundedPreceding, -1)), F.lit(0))
    midrank = cum_before.cast("double") + (F.col("_n") + 1) / F.lit(2.0)
    whole = wg.orderBy("_s").rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing)
    stats = (per.withColumn("_mr", midrank)
             .withColumn("_S", F.sum(F.col("_p") * F.col("_mr"))
                         .over(whole))
             .withColumn("n", F.sum("_n").over(whole))
             .withColumn("n_pos", F.sum("_p").over(whole))
             .withColumn("_rn", F.row_number().over(wg.orderBy("_s")))
             .filter(F.col("_rn") == 1))
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        F.round((F.col("_S")
                 - F.col("n_pos").cast("double")
                 * (F.col("n_pos") + 1).cast("double") / F.lit(2.0))
                / (F.col("n_pos").cast("double") * n_neg.cast("double")),
                6))
    return stats.select(*gcols, "n", "n_pos", n_neg.alias("n_neg"),
                        auc.alias("auc"))
