"""Cheap heuristic caption-quality rules — graft analog of the
reference's pure-string mixture predicate
(``/root/reference/mehc_curation/validation/utils/validation_utils.py:34-42``):
no model, no decode, just character statistics.

Two implementations that MUST agree exactly (tested against each other
on the fixture corpus):

- :func:`heuristic_reason` — scalar Python, used by the oracle curator.
- :func:`heuristic_reason_col` — pure Catalyst column expression, used
  by the Spark pipeline (whole-stage-codegen'd, no Python in the hot
  path).

All thresholds are integers and all ratio checks are integer
cross-multiplications (``2*letters < len`` rather than
``letters/len < 0.5``) so there is no float divergence between the
two engines. Regexes use the Java/Python/RE2 common subset except the
repetition rule, which needs a backreference (supported by both Java
and Python ``re``; the DuckDB-facing query variants avoid it).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# Thresholds (integers only — see module docstring).
MIN_LEN = 3
MAX_LEN = 512
MAX_REPEAT_RUN = 9          # a run of 10+ identical chars ⇒ junk
# letters/len >= 1/4 (NOT 1/2: with both ratios at 1/2 the digit rule
# would be unreachable — letters>=n/2 and digits>n/2 can't both hold)
ALPHA_NUM = 1
ALPHA_DEN = 4
DIGIT_NUM = 1               # digits/len <= 1/2  ⇔ 2*digits <= len
DIGIT_DEN = 2

_REPEAT_RX = re.compile(r"(.)\1{" + str(MAX_REPEAT_RUN) + r",}", re.DOTALL)
_BLANK = " \t\n\r"  # explicit blank set (Java \s and Python \s disagree on Unicode)

# Ordered (rule, reason). First failing rule wins — mirrors the
# reference's first-failing-step semantics in the refinement chain.
REASONS = (
    "caption_null",
    "caption_empty",
    "caption_too_short",
    "caption_too_long",
    "caption_invalid_utf8",
    "caption_repetition",
    "caption_low_alpha",
    "caption_high_digit",
)


def heuristic_reason(caption: Optional[str]) -> Optional[str]:
    """Scalar mirror of :func:`heuristic_reason_col`. None = pass."""
    if caption is None:
        return "caption_null"
    n = len(caption)
    if caption.strip(_BLANK) == "":
        return "caption_empty"
    if n < MIN_LEN:
        return "caption_too_short"
    if n > MAX_LEN:
        return "caption_too_long"
    if "�" in caption:
        return "caption_invalid_utf8"
    if _REPEAT_RX.search(caption):
        return "caption_repetition"
    # str.isalpha() is Unicode category L*, same set as Java \p{L}
    letters = sum(ch.isalpha() for ch in caption)
    if ALPHA_DEN * letters < ALPHA_NUM * n:
        return "caption_low_alpha"
    digits = sum(c.isdigit() and c.isascii() for c in caption)
    if DIGIT_DEN * digits > DIGIT_NUM * n:
        return "caption_high_digit"
    return None


def heuristic_reason_col(c: Column) -> Column:
    """Catalyst expression: first failing heuristic reason, else NULL.

    Uses only built-in functions (length / trim / regexp_count /
    regexp_like) so the whole rule stays inside whole-stage codegen.
    """
    n = F.length(c)
    letters = F.regexp_count(c, F.lit(r"\p{L}"))
    digits = F.regexp_count(c, F.lit("[0-9]"))
    return (
        F.when(c.isNull(), F.lit("caption_null"))
        .when(F.regexp_like(c, F.lit("^[ \t\n\r]*$")), F.lit("caption_empty"))
        .when(n < MIN_LEN, F.lit("caption_too_short"))
        .when(n > MAX_LEN, F.lit("caption_too_long"))
        .when(c.contains("�"), F.lit("caption_invalid_utf8"))
        .when(
            F.regexp_like(c, F.lit(r"(?s)(.)\1{" + str(MAX_REPEAT_RUN) + r",}")),
            F.lit("caption_repetition"),
        )
        .when(F.lit(ALPHA_DEN) * letters < F.lit(ALPHA_NUM) * n, F.lit("caption_low_alpha"))
        .when(F.lit(DIGIT_DEN) * digits > F.lit(DIGIT_NUM) * n, F.lit("caption_high_digit"))
        .otherwise(F.lit(None).cast("string"))
    )
