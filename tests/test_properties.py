"""Property-based spot checks (SURVEY §5.2 item 7) over adversarial
generated text — hypothesis drives inputs the fixture corpus never
produces (astral-plane codepoints, lone surrogates-adjacent text,
pathological whitespace, huge repeats)."""

from hypothesis import given, settings, strategies as st

from mehc_curation_spark.rules.heuristics import heuristic_reason
from mehc_curation_spark.rules.pii import scrub_pii
from mehc_curation_spark.rules.textnorm import normalize_canonical, normalize_lossy
from mehc_curation_spark.rules.toxicity import scrub_toxicity

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
    max_size=600,
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_pii_scrub_idempotent(t):
    once, _, _ = scrub_pii(t)
    twice, _, _ = scrub_pii(once)
    assert twice == once


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_toxicity_scrub_idempotent_mask(t):
    once, _ = scrub_toxicity(t, "mask")
    twice, _ = scrub_toxicity(once, "mask")
    assert twice == once


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_normalize_chain_idempotent(t):
    def norm(x):
        x, _ = normalize_lossy(x)
        x, _ = normalize_canonical(x)
        return x

    once = norm(t)
    assert norm(once) == once


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_heuristic_reason_total_and_stable(t):
    """Never raises, always returns a registered reason or None, and is
    deterministic."""
    from mehc_curation_spark.rules.heuristics import REASONS

    r1 = heuristic_reason(t)
    r2 = heuristic_reason(t)
    assert r1 == r2
    assert r1 is None or r1 in REASONS


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_never_raises_and_returns_str(t):
    for method in ("mask", "drop_sentence"):
        out, diff = scrub_toxicity(t, method)
        assert isinstance(out, str)
        assert diff in (0, 1, None)
    out, hit, emptied = scrub_pii(t)
    assert isinstance(out, str)
    assert isinstance(hit, bool) and isinstance(emptied, bool)


def test_tokenizer_triple_parity(spark):
    """The similarity tokenizer must agree byte-for-byte across all
    THREE engines that implement it — Python (_tokenize), Catalyst
    (the word_shingles_col split chain) and DuckDB (the oracle's
    string_split_regex(trim(lower(text)))) — on adversarial
    whitespace: NBSP and other Unicode spaces (which str.split()
    would eat — the round-1 ADVICE divergence), leading tabs (which
    produce an empty first token in all engines since trim strips
    SPACES only), CR/LF runs, and CJK text."""
    import duckdb
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.similarity import _tokenize

    cases = [
        "plain words here",
        "\tleading tab",
        "trailing newline\n",
        "  spaces  around  ",
        "nbsp\xa0inside words",
        "ideographic　space",
        "line sep and para",
        "mixed \t\r\n runs \t here",
        "汉字 描述 图片",
        "word",
        "",
        " \t\n\r ",
    ]
    # Catalyst: identical expression chain to word_shingles_col
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i int, t string")
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col("t"))),
                                    "[ \t\n\r]+", " "), " ")
    spark_toks = {r["i"]: r["toks"]
                  for r in df.select("i", toks.alias("toks")).collect()}
    con = duckdb.connect()
    for i, c in enumerate(cases):
        py = _tokenize(c)
        duck = con.execute(
            r"SELECT string_split_regex(trim(lower(?)), '[ \t\n\r]+')",
            [c]).fetchone()[0]
        assert py == duck == spark_toks[i], (
            repr(c), py, duck, spark_toks[i])


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_hashed_jaccard_equals_string_jaccard(a, b):
    """The 64-bit shingle-hash Jaccard (what ngram_jaccard computes
    JVM-side on long arrays) must equal the string-set Jaccard (what
    the DuckDB oracle computes) on arbitrary text — i.e. the
    position-weighted XOR hash has no structural collisions and the
    tokenizer agrees with itself."""
    from mehc_curation_spark.operators.similarity import (
        _shingle_hashes_np,
        _tokenize,
    )

    def gram_set(t, k=3):
        toks = _tokenize(t.lower().strip(" "))
        if len(toks) < k:
            return set()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    def jac(x, y):
        if not x and not y:
            return None
        return len(x & y) / max(len(x | y), 1)

    hs_a = set(_shingle_hashes_np(a, 3).tolist())
    hs_b = set(_shingle_hashes_np(b, 3).tolist())
    gs_a, gs_b = gram_set(a), gram_set(b)
    assert len(hs_a) == len(gs_a) and len(hs_b) == len(gs_b)
    assert jac(hs_a, hs_b) == jac(gs_a, gs_b), (repr(a), repr(b))
