"""PII audit: per-document counts per PII class, pure Catalyst.

The scrub stage (rules/pii.py, the graft analog of the reference's
salt stripper ``cleaning_utils.py:32-73``) *removes* PII; compliance
reporting needs the other direction — HOW MUCH of each class a corpus
carries, per document, so takedown/retention decisions can be ranked.
This module counts spans per class and adds a class the scrubber does
not cover: 16-digit payment-card numbers validated by the Luhn
checksum (ISO/IEC 7812), so digit noise does not inflate the count.

Engine notes
------------
* Everything is Catalyst expressions — regexp_count / regexp_replace /
  higher-order array functions. No UDF, no shuffle: the audit is a
  pure map over the corpus and scales embarrassingly.
* Classes are counted on the *residue* after earlier classes are
  removed (email -> url -> card -> ssn -> phone -> handle), the same
  ordered-chain semantics the scrubber applies, so one span is never
  double-counted (an email's ``@domain`` tail is not also a handle).
* Patterns here are the RE2-safe variants of rules/pii.py: the scrub
  patterns' lookarounds (``(?<![0-9])``) are dropped because the
  DuckDB value oracle runs RE2, which has no lookaround. Both engines
  interpret the remaining syntax identically (no ambiguous
  alternation, so leftmost-first == leftmost-longest).
* The Luhn check runs inside ``F.filter`` over the extracted card
  candidates: digits are read positionally with ``Column.substr``,
  doubled at odd positions from the right, and summed with
  ``F.aggregate`` — whole-stage-codegen'd JVM arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RE2-safe audit variants of rules/pii.py PII_PATTERNS (see module
# docstring for why lookarounds are dropped), plus the card class.
AUDIT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"(?:https?://|www\.)[^ \t\n\r]+"),
    ("card", r"[0-9]{4}([ -]?[0-9]{4}){3}"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", r"(?:\+[0-9]{1,2}[ -])?\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}"),
    # scrub variant carries (?<![A-Za-z0-9_]); residue counting after
    # email removal makes the lookbehind unnecessary here
    ("handle", r"@[A-Za-z0-9_]{2,}"),
]

CARD_RE = dict(AUDIT_PATTERNS)["card"]


def luhn_valid_col(m: Column) -> Column:
    """Luhn checksum over a 16-digit candidate (separators allowed)."""
    ds = F.regexp_replace(m, "[ -]", "")

    def term(i: Column) -> Column:
        d = F.ascii(ds.substr(i, F.lit(1))) - F.lit(48)
        dbl = d * 2
        return F.when((F.lit(16) - i) % 2 == 1,
                      F.when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), F.lit(16)),
                        F.lit(0), lambda acc, i: acc + term(i))
    return total % 10 == 0


def pii_audit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII class counts.

    Returns ``(id_col, n_email, n_url, n_card_like, n_card_valid,
    n_ssn, n_phone, n_handle, n_pii, has_pii)`` where ``n_card_valid``
    counts only Luhn-passing candidates and ``n_pii`` sums the six
    class counts (card counted by the valid count). NULL text audits
    as all-zero, ``has_pii = false``.
    """
    residue = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat in AUDIT_PATTERNS:
        if name == "card":
            cands = F.regexp_extract_all(residue, F.lit(pat), 0)
            counts["n_card_like"] = F.coalesce(F.size(cands), F.lit(0))
            counts["n_card_valid"] = F.coalesce(
                F.size(F.filter(cands, luhn_valid_col)), F.lit(0))
        else:
            counts[f"n_{name}"] = F.coalesce(
                F.regexp_count(residue, F.lit(pat)), F.lit(0))
        residue = F.regexp_replace(residue, pat, "")

    n_pii = (counts["n_email"] + counts["n_url"] + counts["n_card_valid"]
             + counts["n_ssn"] + counts["n_phone"] + counts["n_handle"])
    ordered = ["n_email", "n_url", "n_card_like", "n_card_valid",
               "n_ssn", "n_phone", "n_handle"]
    return df.select(
        F.col(id_col),
        *[counts[k].alias(k) for k in ordered],
        n_pii.alias("n_pii"),
        (n_pii > 0).alias("has_pii"),
    )
