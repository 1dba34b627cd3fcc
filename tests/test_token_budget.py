"""Token-budget sampling and quality tiers: determinism, superset
growth, budget respect, tier balance."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.sampling import (
    quality_tiers,
    token_budget_sample,
)


def _docs(spark, n=200):
    rows = [(i, "en" if i % 3 else "de", "tok " * (i % 17 + 1))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_budget_never_exceeded(spark):
    df = _docs(spark)
    out = token_budget_sample(df, "doc_id", "lang", "text",
                              {"en": 300, "de": 150})
    per = out.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()
    tot = {r["lang"]: r["t"] for r in per}
    assert tot["en"] <= 300 and tot["de"] <= 150
    # budgets actually bind (sample is a strict subset)
    assert out.count() < df.count()
    # and are nearly filled: next doc in priority order would overflow
    assert tot["en"] > 300 - 18 and tot["de"] > 150 - 18


def test_larger_budget_is_superset(spark):
    df = _docs(spark)
    small = {r["doc_id"] for r in
             token_budget_sample(df, "doc_id", "lang", "text",
                                 {"en": 200, "de": 100}).collect()}
    big = {r["doc_id"] for r in
           token_budget_sample(df, "doc_id", "lang", "text",
                               {"en": 500, "de": 400}).collect()}
    assert small <= big


def test_partition_invariance(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in
         token_budget_sample(df.repartition(1), "doc_id", "lang", "text",
                             {"en": 250, "de": 250}).collect()}
    b = {r["doc_id"] for r in
         token_budget_sample(df.repartition(13), "doc_id", "lang", "text",
                             {"en": 250, "de": 250}).collect()}
    assert a == b


def test_default_budget_zero_drops_unlisted_strata(spark):
    df = _docs(spark)
    out = token_budget_sample(df, "doc_id", "lang", "text", {"en": 100})
    assert out.filter(F.col("lang") == "de").isEmpty()


def test_quality_tiers_balanced_per_stratum(spark):
    df = _docs(spark).withColumn(
        "q", (F.col("doc_id") % 41).cast("double"))
    out = quality_tiers(df, "doc_id", "lang", "q")
    per = (out.groupBy("lang", "tier").count()
           .groupBy("lang")
           .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
           .collect())
    for r in per:
        assert r["mx"] - r["mn"] <= 1  # ntile equal-count cut
    # head really is higher-scored than tail within each lang
    stats = (out.groupBy("lang", "tier").agg(F.avg("q").alias("m"))
             .collect())
    m = {(r["lang"], r["tier"]): r["m"] for r in stats}
    for lang in ("en", "de"):
        assert m[(lang, "head")] > m[(lang, "middle")] > m[(lang, "tail")]


def test_quality_tiers_approx_matches_exact_cut(spark):
    """The quantile-boundary scale path agrees with the exact ntile on
    all but boundary-tied rows, with near-equal tier populations."""
    import pytest

    from mehc_curation_spark.operators.sampling import quality_tiers_approx

    rows = [(i, "en" if i % 2 else "de", float((i * 37) % 601) / 601.0)
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double")
    exact = {(r["doc_id"]): r["tier"] for r in
             quality_tiers(df, "doc_id", "lang", "q").collect()}
    approx = {(r["doc_id"]): r["tier"] for r in
              quality_tiers_approx(df, "doc_id", "lang", "q").collect()}
    assert set(approx) == set(exact)
    agree = sum(approx[k] == exact[k] for k in exact) / len(exact)
    assert agree >= 0.98
    from collections import Counter

    sizes = Counter(approx.values())
    for t in ("head", "middle", "tail"):
        assert abs(sizes[t] - 200) <= 8

    with pytest.raises(ValueError):
        quality_tiers_approx(df, "doc_id", "lang", "q", n_tiers=4)


# ---------------------------------------------------------------------------
# per-domain cap
# ---------------------------------------------------------------------------

def _cap_docs(spark, n=300, n_dom=5):
    """Skewed domains: domain 0 holds half the corpus."""
    rows = [(i, f"dom{0 if i % 2 == 0 else i % n_dom}", f"text {i}")
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, domain string, text string")


def _cap_local(ids_by_dom, cap, seed=0):
    """Single-window formulation: top-cap per domain in (u48, id)."""
    import hashlib

    def u48(i):
        return int.from_bytes(
            hashlib.md5(f"domaincap:{seed}:{i}".encode()).digest()[:6],
            "little")
    out = {}
    for dom, ids in ids_by_dom.items():
        for rank, i in enumerate(sorted(ids, key=lambda x: (u48(x), x)),
                                 start=1):
            if rank <= cap:
                out[i] = (dom, rank)
    return out


def test_domain_cap_matches_single_window(spark):
    from collections import defaultdict

    from mehc_curation_spark.operators.sampling import per_domain_cap

    df = _cap_docs(spark)
    got = {r["doc_id"]: (r["domain"], r["domain_rank"])
           for r in per_domain_cap(df, "doc_id", "domain", cap=7)
           .select("doc_id", "domain", "domain_rank").collect()}
    by_dom = defaultdict(list)
    for r in df.select("doc_id", "domain").collect():
        by_dom[r["domain"]].append(r["doc_id"])
    assert got == _cap_local(by_dom, 7)


def test_domain_cap_salt_and_partition_invariant(spark):
    from mehc_curation_spark.operators.sampling import per_domain_cap

    df = _cap_docs(spark)
    a = {r["doc_id"] for r in per_domain_cap(
        df.repartition(1), "doc_id", "domain", cap=5).collect()}
    b = {r["doc_id"] for r in per_domain_cap(
        df.repartition(13), "doc_id", "domain", cap=5,
        salt_buckets=3).collect()}
    assert a == b


def test_domain_cap_larger_cap_is_superset(spark):
    from mehc_curation_spark.operators.sampling import per_domain_cap

    df = _cap_docs(spark)
    small = {r["doc_id"] for r in
             per_domain_cap(df, "doc_id", "domain", cap=3).collect()}
    big = {r["doc_id"] for r in
           per_domain_cap(df, "doc_id", "domain", cap=9).collect()}
    assert small < big


def test_domain_cap_null_handling(spark):
    from mehc_curation_spark.operators.sampling import per_domain_cap

    rows = [(1, None), (2, None), (3, None), (4, "a"), (None, "a")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = per_domain_cap(df, "doc_id", "domain", cap=2).collect()
    # NULL domains form ONE group (capped together); NULL ids dropped
    null_dom = [r for r in out if r["domain"] is None]
    assert len(null_dom) == 2
    assert all(r["doc_id"] is not None for r in out)
    assert {r["doc_id"] for r in out if r["domain"] == "a"} == {4}


def test_domain_cap_validation(spark):
    import pytest as _pytest

    from mehc_curation_spark.operators.sampling import per_domain_cap

    df = _cap_docs(spark, n=10)
    with _pytest.raises(ValueError, match="cap"):
        per_domain_cap(df, "doc_id", "domain", cap=0)
    with _pytest.raises(ValueError, match="domain_rank"):
        per_domain_cap(df.withColumn("domain_rank", F.lit(1)),
                       "doc_id", "domain", cap=1)


def test_domain_cap_rejects_all_reserved_columns(spark):
    """Every internal column — including _r1, which the operator
    overwrites with row_number and then drops — must be refused on
    input, not silently clobbered."""
    import pytest as _pytest

    from mehc_curation_spark.operators.sampling import per_domain_cap
    base = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("domain"))
    for c in ("domain_rank", "_u48", "_dom", "_salt", "_r1"):
        bad = base.withColumn(c, F.lit(1))
        with _pytest.raises(ValueError, match=c):
            per_domain_cap(bad, "doc_id", "domain", cap=2)
