"""Text analysis operators for large-scale training-data curation:
token counting, quality scoring, document fingerprinting, language
stats with salted aggregation. All pure Catalyst expressions (JVM-side,
whole-stage codegen) unless noted.

These generalize the curation engine's caption rules to any text
corpus (driver `documents` table or the pairs table).
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas_udf type hints must resolve
                     # under `from __future__ import annotations`
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count_col(c: Column) -> Column:
    """Whitespace token count: split on whitespace runs, count the
    NON-EMPTY pieces. Filtering (rather than trimming first) is what
    makes boundary whitespace inert — F.trim strips only ASCII
    spaces, so 'a b\n' previously counted a phantom third token and
    '\t' counted two; most web text is newline-terminated, so the
    bias was systematic. NULL text -> NULL."""
    return F.size(F.filter(F.split(c, "[ \t\n\r]+"),
                           lambda x: x != ""))


def bpe_ish_token_count_col(c: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs and
    individual punctuation marks (a cheap deterministic stand-in for a
    real tokenizer's piece count)."""
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"))


def quality_score_cols(c: Column) -> dict[str, Column]:
    """Heuristic quality feature columns (length / punct / digit /
    whitespace ratios), integer-safe rounding for oracle parity."""
    n = F.length(c)
    nz = F.when(n > 0, n.cast("double")).otherwise(F.lit(None))
    return {
        "n_chars_q": n,
        "n_tokens": token_count_col(c),
        "punct_ratio": F.round(F.regexp_count(c, F.lit(r"[^A-Za-z0-9 \t\n\r]")) / nz, 6),
        "digit_ratio": F.round(F.regexp_count(c, F.lit("[0-9]")) / nz, 6),
        "space_ratio": F.round(F.regexp_count(c, F.lit("[ ]")) / nz, 6),
        "mean_token_len": F.round(
            F.regexp_count(c, F.lit("[A-Za-z0-9]")) /
            F.when(token_count_col(c) > 0, token_count_col(c).cast("double")), 6),
    }


def fingerprint_col(c: Column, n_hex: int = 16) -> Column:
    """Deterministic document fingerprint: md5-prefix of the
    whitespace-collapsed lowercase text. Stable across engines (md5 is
    md5 everywhere), unlike murmur/xxhash variants."""
    canon = F.regexp_replace(F.lower(F.trim(c)), "[ \t\n\r]+", " ")
    return F.substring(F.md5(canon.cast("binary")), 1, n_hex)


def repetition_stats_cols(c: Column) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher / RefinedWeb rule
    family — Rae et al. 2021 §A1.1, Penedo et al. 2023 — adapted to
    word units): boilerplate and template spam repeat tokens and token
    pairs far above natural prose rates.

    - ``n_words``          whitespace-token count (lowercased)
    - ``dup_word_frac``    1 - distinct/total words
    - ``dup_bigram_frac``  1 - distinct/total adjacent word pairs
                           (NULL when fewer than 2 words)

    Pure Catalyst array/lambda expressions — no UDF, whole-stage
    codegen, and exactly mirrorable in the DuckDB oracle's list
    functions. Ratios rounded to 6 decimals (cross-engine contract).
    """
    # filtered split: boundary tabs/newlines must not create phantom
    # '' words (same rationale as token_count_col); NULL text -> NULL
    toks = F.filter(F.split(F.lower(c), "[ \t\n\r]+"),
                    lambda x: x != "")
    toks = F.when(c.isNotNull(), toks)
    n = F.size(toks)
    nz = F.when(n > 0, n.cast("double"))
    # the when-guard matters: sequence(1, n-1) DESCENDS for n < 2
    # (Spark infers step -1), which would feed element_at(toks, 0)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1))))
    nb = F.when(n >= 2, (n - 1).cast("double"))
    return {
        "n_words": n,
        "dup_word_frac": F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / nz, 6),
        "dup_bigram_frac": F.round(
            F.lit(1.0) - F.size(F.array_distinct(bigrams)) / nb, 6),
    }


def corpus_frequent_ngrams(df: DataFrame, text_col: str, id_col: str,
                           n: int = 5, min_docs: int = 3,
                           k: int = 20) -> DataFrame:
    """Corpus-level boilerplate detection: the word n-grams that recur
    across the most documents (site headers, license blurbs, template
    spam — the spans substring-dedup papers target, cf. Lee et al.
    2022, arXiv:2107.06499, scoped here to fixed-length n-grams so the
    whole computation is two aggregations).

    Physical shape at scale: shingles explode map-side, then the
    (ngram, doc) pairs are DISTINCT'd before counting — so a document
    repeating one n-gram 10^4 times contributes one row to the count
    shuffle, and the per-ngram count aggregation enjoys map-side
    partial combine (no count_distinct value shuffle). Deterministic
    output: ties broken by the ngram string itself.

    Returns (ngram, n_docs), the top ``k`` by document frequency."""
    c = F.col(text_col)
    toks = F.when(c.isNotNull(),
                  F.filter(F.split(F.lower(c), "[ \t\n\r]+"),
                           lambda x: x != ""))
    nt = F.size(toks)
    grams = F.when(nt >= n, F.transform(
        F.sequence(F.lit(1), nt - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)])))
    pairs = (df.select(F.col(id_col).alias("_doc"),
                       F.explode(grams).alias("ngram"))
             .distinct())
    counts = pairs.groupBy("ngram").agg(F.count("*").alias("n_docs"))
    return (counts.filter(F.col("n_docs") >= min_docs)
            .orderBy(F.col("n_docs").desc(), F.col("ngram"))
            .limit(k))


def salted_lang_stats(df: DataFrame, lang_col: str = "lang",
                      len_col: str = "n_chars", salt: int = 8) -> DataFrame:
    """Per-language stats via two-phase salted aggregation.

    The skew story: one language can dominate a web corpus (en ≈ 55%
    in the fixture mix), so a plain groupBy(lang) funnels most rows to
    one reducer. Phase 1 groups by (lang, salt) — spreading the hot key
    over `salt` reducers with map-side partial aggregation — and the
    tiny phase-2 re-merge by lang is trivially balanced.
    (This is the graft requirement from SURVEY.md §2.6 / BASELINE
    north_star: "salted aggregation for per-language quality stats".)
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(lang_col), F.monotonically_increasing_id()),
                        F.lit(salt)))
    phase1 = salted.groupBy(lang_col, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(len_col).cast("double")).alias("_sum_len"),
        F.max(len_col).alias("_max_len"),
        F.min(len_col).alias("_min_len"),
    )
    return (
        phase1.groupBy(lang_col)
        .agg(
            F.sum("_n").alias("n_docs"),
            F.round(F.sum("_sum_len") / F.sum("_n"), 4).alias("avg_len"),
            F.max("_max_len").alias("max_len"),
            F.min("_min_len").alias("min_len"),
        )
    )


def source_reputation(df: DataFrame, source_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id",
                      salt: int = 8, max_dup_rate: float = 0.5,
                      max_rep: float = 0.2) -> DataFrame:
    """Source/domain-level reputation: aggregate quality per origin and
    flag low-reputation sources wholesale (the C4 / RefinedWeb domain-
    filtering shape — a domain that mostly emits duplicated or
    repetitive text gets dropped entirely, catching spam the per-doc
    rules miss row by row).

    Signals, all Catalyst:

    - ``exact_dup_rate``  fraction of the source's docs whose
      whitespace-canonical fingerprint already appeared under a
      smaller doc id anywhere in the corpus (cross-source plagiarism
      counts against the RE-publisher, keep-first semantics);
    - ``avg_dup_word_frac``  mean within-doc repetition
      (:func:`repetition_stats_cols`), NULL-skipping;
    - ``avg_tokens``  mean whitespace token count;
    - ``flagged``  exact_dup_rate > max_dup_rate OR
      avg_dup_word_frac > max_rep.

    Scale shape: one fingerprint aggregation (shuffle on fp — the
    dedup exchange every corpus pass already pays), then the same
    two-phase salted aggregation as :func:`salted_lang_stats`, because
    at web scale single domains are exactly the hot keys the north
    rule warns about.
    """
    # NULL text has no fingerprint: give each such doc an id-salted
    # SINGLETON fingerprint (same convention as exact_content_dedup's
    # NULL payloads) — a plain equi-join on a NULL _fp would silently
    # DROP those rows from every per-source statistic
    fp = F.coalesce(
        fingerprint_col(F.col(text_col)),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")))
    rep = repetition_stats_cols(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("_id"), F.col(source_col).alias("_src"),
        fp.alias("_fp"),
        rep["dup_word_frac"].alias("_dwf"),
        token_count_col(F.col(text_col)).alias("_tok"))
    fstats = base.groupBy("_fp").agg(F.min("_id").alias("_fp_min"))
    flagged_docs = (
        base.join(fstats, "_fp")
        .select("_src", "_tok", "_dwf",
                (F.col("_id") > F.col("_fp_min")).cast("long").alias("_dup"))
    )
    salted = flagged_docs.withColumn(
        "_salt", F.pmod(F.xxhash64("_src", F.monotonically_increasing_id()),
                        F.lit(salt)))
    phase1 = salted.groupBy("_src", "_salt").agg(
        F.count("*").alias("_n"),
        F.sum("_dup").alias("_nd"),
        F.sum(F.col("_tok").cast("double")).alias("_st"),
        F.sum("_dwf").alias("_sw"),
        F.count("_dwf").alias("_nw"),
    )
    out = phase1.groupBy("_src").agg(
        F.sum("_n").alias("n_docs"),
        F.round(F.sum("_nd") / F.sum("_n").cast("double"), 6)
         .alias("exact_dup_rate"),
        F.round(F.sum("_st") / F.sum("_n"), 6).alias("avg_tokens"),
        F.round(F.sum("_sw") /
                F.when(F.sum("_nw") > 0, F.sum("_nw").cast("double")), 6)
         .alias("avg_dup_word_frac"),
    )
    return out.select(
        F.col("_src").alias(source_col), "n_docs", "exact_dup_rate",
        "avg_tokens", "avg_dup_word_frac",
        ((F.col("exact_dup_rate") > max_dup_rate) |
         (F.coalesce("avg_dup_word_frac", F.lit(0.0)) > max_rep))
        .alias("flagged"))


def junk_caption_flags(c: Column) -> dict[str, Column]:
    """Stock-photo / crawl-junk caption flags — the LAION-style caption
    quality gates an image+caption curation pipeline runs before
    training-set admission (Schuhmann et al. 2022 §3 filter captions
    that are URLs, filenames, bare digit blobs, or photo boilerplate).

    All flags are single-pass Catalyst ``rlike`` predicates (Java
    regex), each chosen to parse identically under DuckDB's RE2 so the
    driver oracle can restate them verbatim:

    - ``has_url``         http(s):// or www. anywhere
    - ``has_email``       user@host.tld shape
    - ``long_digit_run``  >= 8 consecutive digits (SKUs, phone blobs)
    - ``filename_like``   an image-file extension (.jpg/.png/...)
    - ``photo_boilerplate`` bare "photo / image / picture" wording
    - ``is_junk``         any of the hard flags above EXCEPT
      photo_boilerplate (which is a soft signal: real captions say
      "a photograph of ..." too)

    NULL caption -> every flag NULL (rlike propagates NULL in both
    engines). The flags are cheap enough to fuse into the main curate
    scan at 100 TB — pure codegen, no shuffle, no UDF.
    """
    has_url = c.rlike(r"(?i)(https?://|www\.)")
    has_email = c.rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    digits = c.rlike(r"[0-9]{8,}")
    fname = c.rlike(r"(?i)\.(jpe?g|png|gif|webp|bmp|tiff?)\b")
    boiler = c.rlike(r"(?i)\b(photo(graph)?s?|image|picture)\b")
    return {
        "has_url": has_url,
        "has_email": has_email,
        "long_digit_run": digits,
        "filename_like": fname,
        "photo_boilerplate": boiler,
        "is_junk": has_url | has_email | digits | fname,
    }


# ---------------------------------------------------------------------------
# compression-ratio quality signal (the one UDF in this module)
# ---------------------------------------------------------------------------

def compression_ratio(text: str | None, level: int = 6) -> float | None:
    """Scalar twin of :func:`make_compression_ratio_udf`: deflate
    bytes / raw UTF-8 bytes, rounded to 6 decimals. Template spam and
    boilerplate compress far below natural prose (~0.4-0.6 for web
    text; <0.2 is almost always junk) — the signal CCNet/RefinedWeb-
    family pipelines use alongside the repetition fractions. Empty or
    NULL text -> NULL."""
    import zlib

    if text is None or len(text) == 0:
        return None
    raw = text.encode("utf-8")
    return round(len(zlib.compress(raw, level)) / len(raw), 6)


def make_compression_ratio_udf(level: int = 6):
    """Arrow-batched pandas UDF computing :func:`compression_ratio`.
    Per-row deflate is irreducibly scalar work, but it's embarrassingly
    parallel, shuffle-free and fuses into any scan — at 100 TB it costs
    one narrow pass like the other byte-level rules. Deterministic for
    a fixed zlib level (the scalar twin shares the code path, so the
    driver check's bitwise-parity assertion is meaningful for the
    Arrow/NULL plumbing, and partition-invariance is asserted
    separately)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        return pd.Series([compression_ratio(t, level) for t in s],
                         dtype="float64")

    return _ratio


def length_outliers(df: DataFrame, text_col: str = "text",
                    group_col: str = "lang", k: float = 3.5) -> DataFrame:
    """Robust per-group length-outlier detection (median + MAD).

    The modified z-score of Iglewicz & Hoaglin (1993):
    ``0.6745 * (len - median) / MAD`` per group, flagging documents
    whose length is freakishly far from their language's typical
    length — truncation artifacts, concatenation blowups, binary
    spill. Median/MAD (not mean/std) so the detector itself survives
    the outliers it hunts. When MAD = 0 (a majority of the group
    shares one exact length — common for templated captions) the
    standard fallback applies: ``(len - median) / (1.253314 *
    meanAD)``, using the mean absolute deviation. meanAD is computed
    as ``avg(long(2*|len - med|)) / 2`` — 2x deviations are exact
    integers even for interpolated .5 medians, so the average is an
    exact integer sum both here and in the SQL oracle (no
    float-summation order drift).

    Exact medians via ``F.median`` — two grouped aggregations on the
    (small-cardinality) group key with broadcast join-backs, so the
    full corpus shuffles only its (group, length) projection, never
    text. Groups where MAD = 0 (all-identical lengths) yield NULL
    robust_z and is_outlier = false, the standard convention. NULL
    text and NULL group rows are excluded. At 100 TB swap F.median for
    percentile_approx if the exact sort-based median on the largest
    language becomes the straggler — the operator contract stays the
    same. The two-level median makes three passes over the source
    (med, MAD-given-med, final labeling); persist the slim (id,
    group, length) projection upstream if the source scan dominates.

    Returns (id cols..., group, n_chars_len, med_len, mad_len,
    meanad_len, robust_z, is_outlier).
    """
    d = (df.filter(F.col(text_col).isNotNull()
                   & F.col(group_col).isNotNull())
         .withColumn("n_chars_len", F.length(F.col(text_col))))
    med = (d.groupBy(group_col)
           .agg(F.median("n_chars_len").alias("med_len")))
    d1 = d.join(F.broadcast(med), group_col)
    dev2 = (F.abs(F.col("n_chars_len") - F.col("med_len"))
            * 2).cast("long")
    mad = (d1.groupBy(group_col)
           .agg(F.median(F.abs(F.col("n_chars_len")
                               - F.col("med_len"))).alias("mad_len"),
                (F.avg(dev2) / 2).alias("meanad_len")))
    d2 = d1.join(F.broadcast(mad), group_col)
    diff = F.col("n_chars_len") - F.col("med_len")
    z = (F.when(F.col("mad_len") > 0,
                F.round(F.lit(0.6745) * diff / F.col("mad_len"), 6))
         .when(F.col("meanad_len") > 0,
               F.round(diff / (F.lit(1.253314) * F.col("meanad_len")), 6)))
    return (d2.withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(F.col("robust_z")) > F.lit(float(k)),
                                   F.lit(False))))
