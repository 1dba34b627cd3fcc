"""Deterministic sampling / corpus-mixture rebalancing.

A training-data pipeline rarely ships a corpus as-crawled: the
language/domain mix is rebalanced by DOWN-SAMPLING over-represented
strata (the data-level counterpart of mixture reweighting — cf.
Xie et al. 2023, DoReMi, arXiv:2305.10429; every web-corpus paper's
"we sample X% of Common Crawl" step). Spark's ``sampleBy`` is
seed-dependent on partitioning and not reproducible across engines,
which makes audits impossible — so these samplers derive the keep
decision from the ROW ITSELF:

    u48(id) = first 6 bytes of md5(id), little-endian  (uniform 48-bit)
    keep    = u48 < fraction * 2^48

Properties a pipeline actually needs:
- **Deterministic & portable**: same rows selected on any engine, any
  partitioning, any day — the DuckDB oracle states the identical
  arithmetic (md5 is md5 everywhere; the byte-assembly is plain
  integer math, no engine hash functions involved).
- **Consistent across runs at different fractions**: fraction f' > f
  selects a SUPERSET of f's rows (u48 doesn't change), so growing a
  sample never discards work.
- **Stratified**: per-stratum fractions via a map column; unknown
  strata fall back to a default fraction.

Pure Catalyst (md5 + substring + conv — whole-stage codegen); the
per-row cost is one md5 of the id, not the payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U48_MAX = float(2 ** 48)


def u48_col(c: Column) -> Column:
    """Uniform 48-bit integer from md5(c): first 6 digest bytes
    assembled little-endian (byte i contributes * 256^i). 48 bits so
    the value and every threshold fit exactly in a long AND a double
    in both engines."""
    hexd = F.md5(c.cast("string"))
    out = F.lit(0).cast("long")
    for i in range(6):
        byte = F.conv(F.substring(hexd, 2 * i + 1, 2), 16, 10).cast("long")
        out = out + byte * F.lit(256 ** i).cast("long")
    return out


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on the id.

    NULL-id contract (all samplers here): a NULL id has no hash, so
    the row is DROPPED at any fraction — ids are required to be
    non-null in the pairs/documents schemas, and silently hashing
    NULL to a constant would correlate every such row's fate.
    """
    thr = int(fraction * _U48_MAX)
    return df.filter(u48_col(F.col(id_col)) < F.lit(thr))


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 1.0) -> DataFrame:
    """Per-stratum deterministic down-sampling: row kept iff
    u48(id) < fraction(stratum) * 2^48. The mixture-rebalancing
    primitive ("keep 25% of en, all of everything else")."""
    thr = F.lit(int(default_fraction * _U48_MAX)).cast("long")
    for k, f in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == k,
                     F.lit(int(f * _U48_MAX)).cast("long")).otherwise(thr)
    return df.filter(u48_col(F.col(id_col)) < thr)


def token_budget_sample(df: DataFrame, id_col: str, stratum_col: str,
                        text_col: str,
                        budgets: dict[str, int],
                        default_budget: int = 0) -> DataFrame:
    """Per-stratum TOKEN-budget sampling: keep rows in deterministic
    hash-priority order until each stratum's cumulative token count
    reaches its budget.

    Mixture construction is usually specified in TOKENS, not rows
    ("train on 50B en tokens, 10B de tokens"); row-fraction sampling
    over/undershoots because token counts per doc are heavy-tailed.
    Priority = (u48(id), id), the same portable hash order as
    :func:`stratified_sample`, so:

    - the selected set is identical on any engine/partitioning, and
    - a LARGER budget selects a superset of a smaller one (priority
      order never changes) — growing the mixture never discards data.

    A row is kept while the cumulative token count INCLUDING itself is
    <= budget (so the budget is never exceeded; a first doc larger
    than the whole budget is excluded).

    Physical shape — a naive running-sum window per stratum would sort
    each WHOLE stratum inside one task (strata are the hot keys: "en"
    is most of a web corpus), so the cumulative sum is computed at two
    levels instead:

    1. bucket the u48 priority axis into ``n_buckets`` equal ranges
       and aggregate per-(stratum, bucket) token sums — an ordinary
       partial-agg shuffle, no sort;
    2. a window over that TINY aggregate (strata x n_buckets rows)
       yields each bucket's base offset;
    3. the exact running sum then only needs a window partitioned by
       (stratum, bucket) — n_buckets-fold smaller sorts, uniformly
       sized because u48 is uniform — plus the broadcast base.

    Bit-identical to the single-window formulation (same (u48, id)
    order; ties share a bucket by construction).
    """
    from pyspark.sql.window import Window

    from mehc_curation_spark.operators.text_stats import token_count_col

    for c in ("n_tok", "cum_tok", "_u48", "_bkt", "_base", "_strat"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column, which this "
                "operator emits/uses internally — rename it first")
    bucket_bits = 12  # 4096 buckets: bucket = u48 >> (48 - bits)
    # NULL strata never equi-join/group together, so they are routed
    # through a sentinel (default budget applies via the when-chain)
    _NULLS = "\x00__null_stratum__"
    df = df.withColumn("_strat", F.coalesce(F.col(stratum_col),
                                            F.lit(_NULLS)))
    budget = F.lit(default_budget)
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(stratum_col) == s, F.lit(int(b))) \
                  .otherwise(budget)
    u = (df.select("*",
                   token_count_col(F.col(text_col)).alias("n_tok"),
                   u48_col(F.col(id_col)).alias("_u48"))
         .withColumn("_bkt", F.shiftright("_u48", 48 - bucket_bits)))
    per_bucket = (u.groupBy("_strat", "_bkt")
                  .agg(F.sum("n_tok").alias("_bt")))
    wb = (Window.partitionBy("_strat").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    base = per_bucket.select(
        "_strat", "_bkt",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_base"))
    wr = (Window.partitionBy("_strat", "_bkt")
          .orderBy("_u48", F.col(id_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        u.join(F.broadcast(base), ["_strat", "_bkt"])
        # bucket-level prune BEFORE the window: a bucket whose base
        # offset already exceeds the budget cannot contribute, so the
        # sort only ever sees ~budget worth of rows per stratum
        .filter(F.col("_base") <= budget)
        .withColumn("cum_tok", F.col("_base") + F.sum("n_tok").over(wr))
        .filter(F.col("cum_tok") <= budget)
        .drop("_u48", "_bkt", "_base", "_strat")
    )


def per_domain_cap(df: DataFrame, id_col: str, domain_col: str,
                   cap: int, seed: int = 0,
                   salt_buckets: int = 64) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen in deterministic
    hash-priority order — the C4 / RefinedWeb "limit documents per
    registered domain" rule (Raffel et al. 2020 §2.2 cap pages per
    domain; Penedo et al. 2023 dedup by source) that stops a single
    prolific site from dominating a web-scale mixture.

    Priority = (u48("domaincap:" seed ":" id), id): a row property,
    so the kept set is identical on any engine/partitioning and the
    DuckDB oracle can restate it as one ROW_NUMBER. The hash domain is
    prefixed so cap survival never correlates with the export shuffle
    key, split assignment or any sampler at the same seed. A larger
    ``cap`` keeps a strict superset (ranks don't change), so raising
    the cap never discards prior selections.

    Physical shape — domains are heavy-tailed (the whole reason the
    operator exists), so a single ROW_NUMBER window per domain would
    sort the hottest domain inside one task. Two phases instead:

    1. a salted window over (domain, u48 % salt_buckets) keeps each
       subgroup's top-``cap`` — uniformly sized sorts regardless of
       domain skew, and sound because a row in the global top-cap is
       a fortiori in its subgroup's top-cap;
    2. the exact window over (domain) then ranks at most
       ``salt_buckets * cap`` survivors per domain — bounded work per
       task no matter how large the domain.

    NULL domains group under a sentinel (they are one "domain", same
    convention as token_budget_sample); NULL ids are dropped (no
    hash — the module-wide sampler contract). Output = the kept rows
    with a 1-based ``domain_rank`` column appended.
    """
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    for c in ("domain_rank", "_u48", "_dom", "_salt", "_r1"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column, which this "
                "operator emits/uses internally — rename it first")
    _NULLS = "\x00__null_domain__"
    u = u48_col(F.concat(F.lit(f"domaincap:{int(seed)}:"),
                         F.col(id_col).cast("string")))
    d = (df.filter(F.col(id_col).isNotNull())
           .withColumn("_u48", u)
           .withColumn("_dom", F.coalesce(F.col(domain_col).cast("string"),
                                          F.lit(_NULLS)))
           .withColumn("_salt", F.pmod(F.col("_u48"),
                                       F.lit(int(salt_buckets)))))
    w1 = (Window.partitionBy("_dom", "_salt")
          .orderBy("_u48", F.col(id_col)))
    w2 = Window.partitionBy("_dom").orderBy("_u48", F.col(id_col))
    return (d.withColumn("_r1", F.row_number().over(w1))
             .filter(F.col("_r1") <= cap)
             .withColumn("domain_rank", F.row_number().over(w2))
             .filter(F.col("domain_rank") <= cap)
             .drop("_u48", "_dom", "_salt", "_r1"))


def quality_tiers(df: DataFrame, id_col: str, stratum_col: str,
                  score_col: str, n_tiers: int = 3,
                  labels: tuple = ("head", "middle", "tail")) -> DataFrame:
    """CCNet-style per-stratum quality tiers (Wenzek et al. 2020,
    arXiv:1911.00359): rank rows within each stratum by a quality
    score and cut into equal-count tiers — head/middle/tail per
    language. Downstream mixtures then oversample "head" data or drop
    "tail" wholesale, with per-language fairness built in (a global
    cut would grade low-resource languages against the dominant one).

    Deterministic: ``ntile`` over (score DESC, id) — ties broken by
    id, so tier assignment is stable across engines and partitionings.
    One window per stratum; same salting caveat as any per-language
    pass (strata are the hot keys; ntile needs the true stratum-wide
    ranking, so this pass accepts the sort).
    """
    from pyspark.sql.window import Window

    if n_tiers != len(labels):
        raise ValueError("labels must match n_tiers")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    t = F.ntile(n_tiers).over(w)
    lab = F.lit(labels[-1])
    for i in range(n_tiers - 1, -1, -1):
        lab = F.when(t == i + 1, F.lit(labels[i])).otherwise(lab)
    return df.select("*", lab.alias("tier"))


def quality_tiers_approx(df: DataFrame, id_col: str, stratum_col: str,
                         score_col: str, n_tiers: int = 3,
                         labels: tuple = ("head", "middle", "tail"),
                         accuracy: int = 10000) -> DataFrame:
    """Scale path for :func:`quality_tiers`: quantile-BOUNDARY tiers
    instead of an exact per-stratum ranking.

    The exact ntile needs the true stratum-wide sort — acceptable when
    the per-stratum data fits a handful of tasks, a bottleneck when one
    language is most of a web corpus. CCNet itself (Wenzek et al. 2020
    §4.4) cuts on perplexity QUANTILE thresholds, not exact ranks, so
    this is the paper-faithful formulation: one ``percentile_approx``
    aggregation per stratum (map-side combinable sketch, no sort, no
    window), boundaries broadcast back, tier = comparison in a scan.

    Differences from the exact cut, by construction: tier populations
    are approximately (not exactly) equal, rows whose score equals a
    boundary value all land in the same (LOWER) tier — the comparison
    is strict ``score > boundary`` — and the Greenwald-Khanna sketch
    carries ~1/accuracy relative rank error.
    Deterministic for a fixed input (the sketch merge is
    order-insensitive at these sizes; boundaries are data-dependent
    but partition-invariant).
    """
    if n_tiers != len(labels):
        raise ValueError("labels must match n_tiers")
    qs = [i / n_tiers for i in range(1, n_tiers)]
    # NULL strata never equi-join/group together: sentinel-coalesce so
    # null-stratum rows get their own boundaries (the exact
    # quality_tiers windows them as their own partition)
    _NULLS = "\x00__null_stratum__"
    keyed = df.withColumn("_strat", F.coalesce(F.col(stratum_col),
                                               F.lit(_NULLS)))
    bounds = (keyed.groupBy("_strat")
              .agg(F.percentile_approx(score_col, qs, accuracy)
                   .alias("_tier_bounds")))
    out = keyed.join(F.broadcast(bounds), "_strat", "left")
    # ascending quantiles: labels run head..tail = highest..lowest
    # score, so tier i (0-based from head) requires score > bounds[k-1-i]
    lab = F.lit(labels[-1])
    for i in range(n_tiers - 2, -1, -1):
        b = F.col("_tier_bounds").getItem(n_tiers - 2 - i)
        lab = F.when(F.col(score_col) > b, F.lit(labels[i])) \
               .otherwise(lab)
    return out.select(*df.columns, lab.alias("tier"))


def split_col(id_c: Column, weights: dict[str, float],
              seed: int = 0) -> Column:
    """Deterministic train/val/test split assignment: the u48 hash
    axis of (seed ":" id) is cut into consecutive ranges proportional
    to ``weights`` (insertion order; they must sum to <= 1.0, any
    remainder falls into the LAST split). The assignment is a row
    property — portable across engines/partitionings like every
    sampler here — and disjoint from the sampling decisions because
    the seed prefix changes the hash.

    Standard pipeline need: holding out eval data at corpus-build
    time (not training time) so dedup/decontamination can treat the
    held-out split as a reference corpus.

    The hash domain is prefixed ``"split:"`` so a split NEVER
    correlates with the export shuffle key or a sampling decision at
    the same seed (ranges of one shared u48 would concentrate the
    test split into the last export shards). A NULL id yields a NULL
    split (it has no hash; silently falling through the range CASE
    would concentrate every NULL-id row in the LAST split —
    a quiet eval-contamination vector).
    """
    total = sum(weights.values())
    if not weights or total > 1.0 + 1e-9:
        raise ValueError("weights must be non-empty and sum to <= 1.0")
    u = u48_col(F.concat(F.lit(f"split:{int(seed)}:"),
                         id_c.cast("string")))
    names = list(weights)
    # ascending cumulative thresholds; first matching range wins
    thr = []
    acc = 0.0
    for name in names:
        acc += weights[name]
        thr.append((name, int(acc * _U48_MAX)))
    out = F.lit(names[-1])
    for name, t in thr[:-1][::-1]:
        out = F.when(u < F.lit(t).cast("long"), F.lit(name)).otherwise(out)
    return F.when(id_c.isNotNull(), out)


def leakage_safe_split(df: DataFrame, pairs: DataFrame, id_col: str,
                       weights: dict[str, float], seed: int = 0,
                       src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicates never
    straddle a split boundary.

    Hashing each row's OWN id (:func:`split_col`) silently leaks when
    the corpus still contains near-duplicates — two 99%-identical
    documents land in train and test independently, and the held-out
    set stops measuring generalization (the published remedy is to
    split by duplicate CLUSTER, e.g. Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better",
    §4 train/test leakage). This operator assigns the split from the
    connected component of the near-dup pair graph: every member of a
    component shares the component's minimum id as its ``split_key``,
    so the whole cluster moves together; rows that matched nothing
    key on their own id and degrade to exactly :func:`split_col`.

    Scale shape: components come from the large-star/small-star
    edge-contraction loop (edges shuffle, never adjacency lists), the
    label join back to ``df`` is one hash join on the id, and the
    split itself is a pure-Catalyst hash over the key — no window, no
    driver state. The reference keeps no split notion (its pipeline
    curates a single corpus, `refinement/core/pipeline.py:52-90`);
    this is part of the training-data layer the graft adds.

    Returns ``df``'s columns plus ``split_key`` and ``split``. NULL
    ids get a NULL split (same contract as :func:`split_col`).
    """
    from .graph import connected_components

    comp = connected_components(pairs, src=src, dst=dst)
    keyed = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(df["*"],
                F.coalesce("component", df[id_col]).alias("split_key"))
    )
    return keyed.withColumn(
        "split", split_col(F.col("split_key"), weights, seed))


def temperature_resample(df: DataFrame, id_col: str, group_col: str,
                         alpha: float = 0.3, budget_frac: float = 0.5,
                         seed: int = 0) -> DataFrame:
    """Temperature-flattened group rebalancing — the multilingual
    sampling rule of mBERT/XLM-R (exponentiated-and-renormalized group
    shares, Conneau et al. 2020 §3.1; Devlin et al. 2019): head
    groups are downsampled and tail groups kept (or fully retained) so
    the output mixture follows p_g^alpha instead of the crawl's p_g.

    Target kept rows for group g:  K * p_g^alpha / sum_h p_h^alpha,
    with K = budget_frac * N; the within-group keep fraction is capped
    at 1 (tail groups smaller than their target keep everything — no
    upsampling, this is a sampler not a replicator). The keep decision
    is the repo's standard portable hash rule:
    u48("temp:<seed>:" + id) < keep_frac * 2^48 — a row property, so
    it is deterministic across engines and partitionings and composes
    with the other samplers (distinct hash domain).

    Plan shape: one grouped count (tiny table), the alpha weights
    computed over that table JVM-side, one broadcast join back —
    the corpus itself never shuffles. NULL group or NULL id rows are
    excluded (no stratum / no hash; documented contract, mirrored by
    the SQL oracle).

    Appends (n_group, keep_frac, kept) to the input columns.
    """
    if not (0.0 < budget_frac <= 1.0):
        raise ValueError(f"budget_frac in (0, 1], got {budget_frac}")
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    from pyspark.sql.window import Window

    d = df.filter(F.col(group_col).isNotNull()
                  & F.col(id_col).isNotNull())
    counts = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n_g"))
    w = Window.partitionBy()
    n_total = F.sum("_n_g").over(w)
    pw = F.pow(F.col("_n_g") / n_total, F.lit(float(alpha)))
    fr = (counts
          .withColumn("_pw", pw)
          .withColumn(
              "keep_frac",
              # association mirrors the SQL oracle EXACTLY
              # (((budget*N)*pw)/sum_pw)/n_g — a different grouping
              # can differ by 1 ulp and flip a kept decision
              F.least(F.lit(1.0),
                      F.lit(float(budget_frac)) * n_total
                      * F.col("_pw") / F.sum("_pw").over(w)
                      / F.col("_n_g")))
          .select(group_col, F.col("_n_g").cast("long").alias("n_group"),
                  "keep_frac"))
    u = u48_col(F.concat(F.lit(f"temp:{int(seed)}:"),
                         F.col(id_col).cast("string")))
    return (d.join(F.broadcast(fr), group_col)
            .withColumn(
                "kept",
                F.coalesce(u < F.col("keep_frac") * F.lit(float(2 ** 48)),
                           F.lit(False))))


def repeat_upsample(df: DataFrame, id_col: str, group_col: str,
                    epochs: dict[str, float],
                    default_epochs: float = 1.0,
                    seed: int = 0) -> DataFrame:
    """Materialize an epoch-weighted mixture with per-group repeat
    factors that may EXCEED 1 — the data-level form of "books ×2.4,
    web ×0.5" source weighting (LLaMA-style mixtures; Xie et al. 2023
    reweighting realized as physical rows for trainers that stream a
    flat corpus).

    A row in group g with factor r gets ``floor(r)`` guaranteed copies
    plus one extra iff ``u48("rep:<seed>:" + id) < frac(r) * 2^48`` —
    the repo's portable hash rule on its own domain, so the fractional
    epoch is an unbiased per-row Bernoulli that is deterministic
    across engines/partitionings and composes with the other samplers.
    ``r < 1`` degrades to plain down-sampling (0 or 1 copies);
    ``r == 0`` drops the group.

    Plan shape: pure narrow — a CASE over the driver-side dict, one
    ``explode(sequence(...))``; NO shuffle and NO group-count job (the
    factors are caller-supplied policy, not data-derived — use
    ``temperature_resample`` when they should come from the data).
    At 100 TB upsampling-by-explode is map-side row amplification:
    output partitions grow by ~max(r), which AQE re-splits downstream.

    Rows with a NULL group or NULL id are excluded (no policy / no
    hash; same contract as ``temperature_resample``, mirrored by the
    SQL oracle). Copies carry ``n_copies`` and ``copy_idx`` (0-based);
    downstream ids should derive ``id || '#' || copy_idx`` if copies
    must be distinct keys (the export shuffle otherwise co-locates
    them).
    """
    if default_epochs < 0.0:
        raise ValueError(f"default_epochs must be >= 0, got {default_epochs}")
    for k, v in epochs.items():
        if v < 0.0:
            raise ValueError(f"epochs[{k!r}] must be >= 0, got {v}")

    factor = F.lit(float(default_epochs))
    for k, v in sorted(epochs.items()):
        factor = F.when(F.col(group_col) == k,
                        F.lit(float(v))).otherwise(factor)
    base = F.floor(factor).cast("int")
    frac = factor - F.floor(factor)
    u = u48_col(F.concat(F.lit(f"rep:{int(seed)}:"),
                         F.col(id_col).cast("string")))
    n = (base + F.when(u < frac * F.lit(_U48_MAX), 1).otherwise(0))
    return (df.filter(F.col(group_col).isNotNull()
                      & F.col(id_col).isNotNull())
            .withColumn("n_copies", n)
            .filter(F.col("n_copies") > 0)
            .withColumn("copy_idx",
                        F.explode(F.sequence(F.lit(0),
                                             F.col("n_copies") - 1))))


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169) — select raw-corpus documents that look like a
# TARGET corpus, by importance weights over hashed n-gram features.
# ---------------------------------------------------------------------------

_DSIR_SCALE = 1_000_000  # weights quantized to 1e-6 nats, served as longs


def dsir_ngrams_col(text_col: Column) -> Column:
    """Unigrams + bigrams of the whitespace-lowercase tokenization —
    the DSIR paper's feature space. Pure Catalyst: split, filter,
    and a sequence-indexed transform for bigrams (guarded, since
    ``sequence(1, 0)`` would go descending rather than empty)."""
    toks = F.filter(F.split(F.lower(text_col), r"[ \t\n\r]+"),
                    lambda t: t != "")
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                           F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_bucket_col(ngram: Column, n_buckets: int) -> Column:
    """Feature bucket = u48('dsirb:' || ngram) % n_buckets — the
    hashing trick on a dedicated domain, restatable in any engine
    with md5 (never an engine-specific hash)."""
    return u48_col(F.concat(F.lit("dsirb:"), ngram)) % n_buckets


def dsir_bucket_counts(df: DataFrame, text_col: str,
                       n_buckets: int) -> dict[int, int]:
    """Exact per-bucket n-gram counts for a corpus: explode -> hash ->
    count. Map-side combine collapses the shuffle to at most
    ``n_buckets`` rows per task; the driver receives <= n_buckets
    longs. NULL texts contribute nothing."""
    rows = (df.select(F.explode(dsir_ngrams_col(F.col(text_col)))
                      .alias("_ng"))
            .select(dsir_bucket_col(F.col("_ng"), n_buckets).alias("_b"))
            .groupBy("_b").count().collect())
    return {int(r["_b"]): int(r["count"]) for r in rows}


def dsir_weights(target_counts: dict[int, int], raw_counts: dict[int, int],
                 n_buckets: int) -> list[int]:
    """Integer-quantized per-bucket log-likelihood ratios.

    w[b] = round(1e6 * (ln(t_b+1) - ln(T+B) - ln(r_b+1) + ln(R+B)))
    — add-one-smoothed multinomial log ratio in micro-nats. Quantizing
    ONCE, driver-side, is what makes the downstream score exact and
    engine-invariant: documents sum INTEGER weights (associative,
    partition-order-proof), never floats."""
    import math

    T = sum(target_counts.values()) + n_buckets
    R = sum(raw_counts.values()) + n_buckets
    return [round(_DSIR_SCALE
                  * (math.log(target_counts.get(b, 0) + 1) - math.log(T)
                     - math.log(raw_counts.get(b, 0) + 1) + math.log(R)))
            for b in range(n_buckets)]


def dsir_score_col(text_col: Column, weights: list[int]) -> Column:
    """Per-document importance log-weight in micro-nats: sum of the
    (plan-literal) bucket weights over the doc's n-grams. ZERO
    shuffle — one array transform + aggregate inside whole-stage
    codegen; the weight table rides in the plan as an array literal
    (same pattern as the opt-out list's plan-literal fast path).
    NULL text -> NULL score."""
    n_buckets = len(weights)
    warr = F.lit(weights)
    return F.when(
        text_col.isNotNull(),
        F.aggregate(
            dsir_ngrams_col(text_col),
            F.lit(0).cast("long"),
            lambda acc, ng: acc + F.element_at(
                warr, (dsir_bucket_col(ng, n_buckets) + 1).cast("int"))))


def dsir_fit(target_df: DataFrame, raw_df: DataFrame, text_col: str,
             n_buckets: int = 512) -> list[int]:
    """Fit the importance model: two corpus passes (tiny outputs),
    weights come back as plan-embeddable integers."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return dsir_weights(dsir_bucket_counts(target_df, text_col, n_buckets),
                        dsir_bucket_counts(raw_df, text_col, n_buckets),
                        n_buckets)


def gumbel_col(u: Column) -> Column:
    """Standard Gumbel noise from a u48 column: g = -ln(-ln((u+0.5)/2^48)).
    The +0.5 centers each lattice cell, keeping the argument strictly
    inside (0, 1) so neither ln can hit 0 or -inf."""
    unif = (u.cast("double") + F.lit(0.5)) / F.lit(_U48_MAX)
    return -F.log(-F.log(unif))


def dsir_resample(df: DataFrame, text_col: str, id_col: str,
                  weights: list[int], n: int,
                  seed: int = 0) -> DataFrame:
    """Gumbel-top-n importance resampling: keep the n documents with
    the largest (log-weight + Gumbel(u48('dsir:' seed ':' id))) —
    sampling WITHOUT replacement proportionally to the importance
    weights (the Gumbel-max trick), exactly the paper's selection
    rule. Deterministic given (corpus, weights, seed): the noise is a
    row property on a dedicated hash domain, so the same documents
    are selected on any engine or partitioning.

    Physical shape: score is a zero-shuffle codegen'd expression; the
    cut is orderBy + limit, which compiles to TakeOrderedAndProject —
    per-partition heaps of size n, never a global sort. For n beyond
    heap-friendly sizes, cut by score threshold instead (the
    token_budget_sample two-level pattern).

    NULL text or NULL id rows carry no score/noise and are excluded
    (same contract as temperature_resample). Output keeps every input
    column plus ``dsir_logw`` (micro-nats, exact long)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    for c in ("dsir_logw", "_g"):
        if c in df.columns:
            raise ValueError(f"dsir_resample: input already has {c!r}")
    u = u48_col(F.concat(F.lit(f"dsir:{int(seed)}:"),
                         F.col(id_col).cast("string")))
    scored = (df.filter(F.col(text_col).isNotNull()
                        & F.col(id_col).isNotNull())
              .withColumn("dsir_logw",
                          dsir_score_col(F.col(text_col), weights))
              .withColumn("_g", gumbel_col(u)))
    pri = F.col("dsir_logw").cast("double") / _DSIR_SCALE + F.col("_g")
    return (scored.orderBy(pri.desc(), F.col(id_col))
            .limit(n).drop("_g"))


def audit_sample(df: DataFrame, group_col: str, id_col: str,
                 n_per_group: int = 10, seed: int = 0) -> DataFrame:
    """Deterministic per-group exemplars for human QA — "show me N
    examples of every drop_reason" is the audit every rules change
    triggers, and grabbing the FIRST N of a partition silently
    over-samples one shard's quirks. Exemplars here are the N
    smallest values of a dedicated u48 hash axis per group: stable
    across engines/partitionings/reruns, and a different ``seed``
    rotates the exhibit without re-reading more data.

    NULL group values form their own group (for a label column NULL
    usually means "kept" — the audit wants those too); NULL ids are
    dropped (no hash — the shared sampler contract).

    Scale shape: a single ``row_number`` window partitioned by a
    ~10-value reason column would sort BILLIONS of rows in one task
    per reason. Instead top-n runs in two exact phases: (1) per
    (group, salt-of-hash) — 256 even slices per group, so every sort
    task is ~1/256th of a group and map-side parallel; (2) a second
    window over the surviving ``<= 256 * n`` rows per group. A row in
    the global top-n of its group is in the top-n of its salt slice a
    fortiori, so phase 1 never evicts a final exemplar — the result
    is identical to the naive single window (the SQL oracle states
    exactly that single-window form).

    Returns ``df``'s columns plus ``audit_rank`` (1-based within the
    group).
    """
    from pyspark.sql.window import Window

    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    for c in ("_u", "_salt", "_rk1", "audit_rank"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column, which this "
                "operator emits/uses internally — rename it first")
    u = u48_col(F.concat(F.lit(f"audit:{int(seed)}:"),
                         F.col(id_col).cast("string")))
    salted = (df.filter(F.col(id_col).isNotNull())
              .withColumn("_u", u)
              .withColumn("_salt", F.pmod(F.col("_u"), F.lit(256))))
    w1 = (Window.partitionBy(group_col, "_salt")
          .orderBy(F.col("_u").asc(), F.col(id_col).asc()))
    cand = (salted.withColumn("_rk1", F.row_number().over(w1))
            .filter(F.col("_rk1") <= n_per_group))
    w2 = (Window.partitionBy(group_col)
          .orderBy(F.col("_u").asc(), F.col(id_col).asc()))
    return (cand.withColumn("audit_rank", F.row_number().over(w2))
            .filter(F.col("audit_rank") <= n_per_group)
            .drop("_u", "_salt", "_rk1"))
