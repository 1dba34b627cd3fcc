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
