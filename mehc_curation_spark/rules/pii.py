"""PII scrubbing — the graft analog of salt stripping.

The reference strips salt fragments from the molecule payload and
reports ``(cleaned, diff, is_missing)``
(``/root/reference/mehc_curation/cleaning/utils/cleaning_utils.py:32-73``).
Here PII spans (emails, phones, URLs, SSNs, @handles) are removed from
the caption and the same triple shape is emitted:
``(caption_scrubbed, pii_hit, became_empty)``.

Patterns are written in the common subset of Java (Spark
``regexp_replace``) and Python ``re`` regex syntax so the Catalyst
fast path and this reference implementation produce byte-identical
output. No backreferences (keeps them DuckDB/RE2-friendly too).

Semantics contract: ONE pass of the ordered pattern chain — the same
single application the reference makes of its salt stripper
(``cleaning_utils.py:32-73``) and the only semantics expressible
identically in Python ``re``, Catalyst ``regexp_replace`` and the
DuckDB oracle. A single pass is deliberately NOT a fixpoint on
adversarial chained spans (property-tested characterization:
``"@alice@bob"`` → removing ``@alice`` exposes ``@bob``, which was not
standalone in the original text); corpora where chained PII matters
should run the scrub stage twice — every twin is deterministic and
composes.
"""

from __future__ import annotations

import re

# Ordered: email before handle (emails contain '@'), url before phone
# (urls may contain digit runs). Each entry: (name, pattern, replacement).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", ""),
    # explicit blank class: Java \s is ASCII-only, Python \s is Unicode —
    # [^ \t\n\r] means the same thing to both engines (and to RE2)
    ("url", r"(?:https?://|www\.)[^ \t\n\r]+", ""),
    ("ssn", r"(?<![0-9])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9])", ""),
    (
        "phone",
        r"(?<![0-9])(?:\+[0-9]{1,2}[ -])?\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}(?![0-9])",
        "",
    ),
    ("handle", r"(?<![A-Za-z0-9_])@[A-Za-z0-9_]{2,}", ""),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def scrub_pii(caption: str | None) -> tuple[str | None, bool, bool]:
    """Scrub one caption → (caption_scrubbed, pii_hit, became_empty).

    Parse-failure fallthrough (quirk §4.2.5 of SURVEY.md): a null
    caption is returned unchanged with no flags, mirroring
    ``cleaning_utils.py:46-50`` returning the input on failure.
    """
    if caption is None:
        return None, False, False
    out = caption
    for _, rx, repl in _COMPILED:
        out = rx.sub(repl, out)
    hit = out != caption
    # explicit blank set — identical semantics to the Catalyst
    # regexp_like(^[ \t\n\r]*$) used by the Spark pipeline
    blank = " \t\n\r"
    became_empty = hit and out.strip(blank) == "" and caption.strip(blank) != ""
    return out, hit, became_empty
