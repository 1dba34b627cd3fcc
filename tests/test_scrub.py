"""Scrubber byte-equality fixtures (FIXTURES.md T4) + engine parity:
the Catalyst regexp_replace chain must equal the Python re chain
byte-for-byte, and scrubbing must be idempotent."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.udfs import pii_scrub_col
from mehc_curation_spark.rules.pii import scrub_pii
from mehc_curation_spark.rules.textnorm import normalize_canonical, normalize_lossy
from mehc_curation_spark.rules.toxicity import scrub_toxicity

PII_CASES = [
    ("mail me at bob@example.com now", "mail me at  now", True),
    ("visit https://example.com/x?q=1 today", "visit  today", True),
    ("see www.site.org/page", "see ", True),
    ("ssn 123-45-6789 here", "ssn  here", True),
    ("call 555-123-4567 ok", "call  ok", True),
    ("call +1 555 123 4567 ok", "call  ok", True),
    ("ping @handle42 please", "ping  please", True),
    ("no pii in this caption", "no pii in this caption", False),
    ("a@b", "a@b", False),                          # not a full email
    ("version 1-2-3 stays", "version 1-2-3 stays", False),
    ("bob@example.com", "", True),                  # all-PII -> emptied
]


@pytest.mark.parametrize("inp,out,hit", PII_CASES)
def test_pii_python(inp, out, hit):
    got, got_hit, _ = scrub_pii(inp)
    assert got == out
    assert got_hit == hit


def test_pii_passthrough_on_null():
    # quirk §4.2.5: failure/None passes through unchanged
    assert scrub_pii(None) == (None, False, False)


def test_pii_idempotent():
    for inp, _, _ in PII_CASES:
        once, _, _ = scrub_pii(inp)
        twice, _, _ = scrub_pii(once)
        assert once == twice


def test_pii_catalyst_byte_equal(spark, pairs_pdf):
    """Java regexp_replace chain == Python re chain over the corpus."""
    caps = [c for c, _, _ in PII_CASES] + list(pairs_pdf["caption"].dropna())
    df = spark.createDataFrame(pd.DataFrame({"c": caps}))
    got = df.select(pii_scrub_col(F.col("c")).alias("s")).toPandas()["s"].tolist()
    want = [scrub_pii(c)[0] for c in caps]
    assert got == want


TOX_MASK_CASES = [
    ("this is frakking great", "this is ******** great", 1),
    ("Gorram it all.", "****** it all.", 1),
    ("totally fine text", "totally fine text", 0),
    ("smegheadish is a different word", "smegheadish is a different word", 0),
]


@pytest.mark.parametrize("inp,out,diff", TOX_MASK_CASES)
def test_toxicity_mask(inp, out, diff):
    assert scrub_toxicity(inp, "mask") == (out, diff)


def test_toxicity_drop_sentence():
    inp = "nice photo. this is frakking bad. more text here."
    out, diff = scrub_toxicity(inp, "drop_sentence")
    assert out == "nice photo. more text here."
    assert diff == 1


def test_toxicity_unprocessable_passthrough():
    # control char -> (input unchanged, None) like the reference's
    # parse-failure fallthrough (cleaning_utils.py:88-90)
    inp = "text with bell \x07 char"
    assert scrub_toxicity(inp, "mask") == (inp, None)
    assert scrub_toxicity(None, "mask") == (None, None)


def test_toxicity_bad_method_raises():
    with pytest.raises(ValueError):
        scrub_toxicity("x", "boyle")  # graft names are mask|drop_sentence


NORM_CASES_LOSSY = [
    ("hello   world", "hello world", True),
    ("ﬁre", "fire", True),                       # NFKC ligature
    ("café", "cafe", True),                      # diacritic strip
    ("emoji 🌞 gone", "emoji gone", True),
    ("plain text", "plain text", False),
]


@pytest.mark.parametrize("inp,out,ch", NORM_CASES_LOSSY)
def test_normalize_lossy(inp, out, ch):
    assert normalize_lossy(inp) == (out, ch)


NORM_CASES_CANON = [
    ("1,5 km away", "1.5 km away", True),
    ("speed 3,5km", "speed 3.5 km", True),
    ("“quoted” — dash", '"quoted" - dash', True),
    ("1,500 people", "1.500 people", True),      # documented: all digit commas
    ("already fine", "already fine", False),
]


@pytest.mark.parametrize("inp,out,ch", NORM_CASES_CANON)
def test_normalize_canonical(inp, out, ch):
    assert normalize_canonical(inp) == (out, ch)


def test_normalize_idempotent(pairs_pdf):
    for c in pairs_pdf["caption"].dropna().head(500):
        l1, _ = normalize_lossy(c)
        l2, _ = normalize_lossy(l1)
        assert l1 == l2
        c1, _ = normalize_canonical(l1)
        c2, _ = normalize_canonical(c1)
        assert c1 == c2


def test_scrub_pipeline_idempotent(pairs_pdf):
    """scrub(scrub(x)) == scrub(x) for the full scrub chain."""
    for c in pairs_pdf["caption"].dropna().head(300):
        s1 = scrub_toxicity(scrub_pii(c)[0], "mask")[0]
        if s1 is None:
            continue
        s2 = scrub_toxicity(scrub_pii(s1)[0], "mask")[0]
        assert s1 == s2
