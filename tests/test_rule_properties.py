"""Property-based tests (hypothesis) over the pure-Python rule kernels.

The reference's test strategy (SURVEY.md §5) is fixture-based; these
extend it with randomized invariants over the scalar rule functions —
the single source of semantics that the Catalyst twins and the DuckDB
oracles are pinned against elsewhere (tests/test_rules.py golden
fixtures, driver value oracles). Pure Python: no SparkSession, so the
whole file runs in seconds.

Each invariant here was probed at 2-5k examples (including adversarial
alphabets) before being committed; the one deliberate NON-invariant —
scrub_pii is not a fixpoint on chained spans — is characterized by an
explicit test and documented in rules/pii.py.
"""

import re
import unicodedata

from hypothesis import given, settings, strategies as st

from mehc_curation_spark.rules.heuristics import REASONS, heuristic_reason
from mehc_curation_spark.rules.pii import _COMPILED, scrub_pii
from mehc_curation_spark.rules.textnorm import (normalize_canonical,
                                               normalize_lossy)
from mehc_curation_spark.rules.toxicity import (_WORD_RX, TOXICITY_LEXICON,
                                                scrub_toxicity)

TEXT = st.text(max_size=200)
COMMON = settings(max_examples=300, deadline=None)

_WS_RUN = re.compile(r"\s\s|\A\s|\s\Z")


@COMMON
@given(TEXT)
def test_normalize_lossy_idempotent(s):
    a, _ = normalize_lossy(s)
    b, changed = normalize_lossy(a)
    assert a == b and not changed


@COMMON
@given(TEXT)
def test_normalize_lossy_postconditions(s):
    out, changed = normalize_lossy(s)
    assert changed == (out != s)
    # collapsed whitespace, no leading/trailing blanks
    assert not _WS_RUN.search(out)
    # no combining marks, no non-BMP symbols survive
    assert all(unicodedata.category(c) != "Mn" for c in out)
    assert all(ord(c) <= 0xFFFF for c in out)


@COMMON
@given(TEXT)
def test_normalize_canonical_idempotent(s):
    a, _ = normalize_canonical(s)
    b, changed = normalize_canonical(a)
    assert a == b and not changed


@COMMON
@given(TEXT)
def test_normalization_pipeline_composition_idempotent(s):
    """lossy→canonical (the stage order, SURVEY §2.3) reaches a fixed
    point in one application — captions can be re-curated without
    drifting, which exact dedup by normalized caption relies on."""
    l1, _ = normalize_lossy(s)
    c1, _ = normalize_canonical(l1)
    l2, _ = normalize_lossy(c1)
    c2, _ = normalize_canonical(l2)
    assert c1 == c2


@COMMON
@given(TEXT)
def test_scrub_pii_flags_consistent(s):
    out, hit, became_empty = scrub_pii(s)
    assert hit == (out != s)
    if became_empty:
        assert hit and out.strip(" \t\n\r") == "" != s.strip(" \t\n\r")


_LOCAL = st.from_regex(r"[A-Za-z0-9]{1,12}(?:[._%+-][A-Za-z0-9]{1,8})?",
                       fullmatch=True)
_DOMAIN = st.from_regex(r"[A-Za-z0-9]{1,10}\.[A-Za-z]{2,6}", fullmatch=True)
_CLEAN = st.from_regex(r"[a-z ]{0,20}", fullmatch=True)


@COMMON
@given(_CLEAN, _LOCAL, _DOMAIN, _CLEAN)
def test_scrub_pii_removes_constructed_email(pre, local, domain, post):
    # word-boundary the neighbors so the email stands alone, as in
    # real captions ("contact me at x@y.com please")
    s = f"{pre} {local}@{domain} {post}"
    out, hit, _ = scrub_pii(s)
    assert hit
    assert f"{local}@{domain}" not in out


@COMMON
@given(_CLEAN, st.from_regex(r"[0-9]{3}-[0-9]{2}-[0-9]{4}", fullmatch=True))
def test_scrub_pii_removes_ssn(pre, ssn):
    out, hit, _ = scrub_pii(f"{pre} {ssn} tail")
    assert hit and ssn not in out


def test_scrub_pii_single_pass_characterization():
    """Documented NON-invariant (rules/pii.py contract): one pass of
    the ordered chain is not a fixpoint on chained spans — removing
    '@alice' exposes '@bob', which was not standalone in the original.
    The twins (Catalyst regexp_replace chain, DuckDB oracle) share
    exactly these semantics, so this pins the contract rather than
    flagging a divergence. A second application converges here."""
    once, hit, _ = scrub_pii("ping @alice@bob now")
    assert hit and once == "ping @bob now"
    twice, hit2, _ = scrub_pii(once)
    assert hit2 and twice == "ping  now"
    assert scrub_pii(twice)[0] == twice


@COMMON
@given(TEXT)
def test_scrub_toxicity_mask_invariants(s):
    out, diff = scrub_toxicity(s, "mask")
    if diff is None:  # unprocessable: control chars → exact passthrough
        assert out == s
        return
    assert len(out) == len(s)  # mask preserves length
    assert diff == (1 if out != s else 0)
    # every standalone lexicon token was masked, and masking ('*' is a
    # non-word char) cannot mint new standalone tokens
    assert not _WORD_RX.search(out)


_TOX_TEXT = st.text(
    alphabet=sorted(set("".join(TOXICITY_LEXICON)) | set(" .!?xyz*FG")),
    max_size=150)


@COMMON
@given(_TOX_TEXT)
def test_scrub_toxicity_drop_sentence_invariants(s):
    out, diff = scrub_toxicity(s, "drop_sentence")
    if diff is None:
        assert out == s
        return
    assert not _WORD_RX.search(out)
    # dropped sentences only — the output is a subsequence of the input
    it = iter(s)
    assert all(c in it for c in out)


@COMMON
@given(TEXT)
def test_heuristic_reason_in_vocabulary(s):
    r = heuristic_reason(s)
    assert r is None or r in REASONS
    assert heuristic_reason(s) == r  # deterministic


def test_null_passthrough_everywhere():
    assert normalize_lossy(None) == (None, False)
    assert normalize_canonical(None) == (None, False)
    assert scrub_pii(None) == (None, False, False)
    assert scrub_toxicity(None, "mask") == (None, None)
    assert scrub_toxicity(None, "drop_sentence") == (None, None)


@COMMON
@given(TEXT)
def test_pii_patterns_are_python_java_common_subset(s):
    """The scalar chain must stay inside the regex subset the Catalyst
    twin can execute: every compiled pattern applies without error to
    arbitrary unicode (no catastrophic constructs, no backrefs)."""
    for _, rx, repl in _COMPILED:
        rx.sub(repl, s)
