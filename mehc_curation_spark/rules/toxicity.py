"""Toxicity scrubbing — the graft analog of charge neutralization.

The reference neutralizes charges with a selectable method
(``method="boyle"|"rdkit"``,
``/root/reference/mehc_curation/cleaning/utils/cleaning_utils.py:75-121``)
and returns ``(smiles, diff)`` with diff ∈ {1, 0, None}: 1 = changed,
0 = unchanged, None = unprocessable (row later dropped,
``cleaning/core/engine.py:129-136``).

Graft: mask or drop sentences containing toxicity-lexicon tokens.

- method="mask"          (analog of "boyle", the default): each lexicon
  word is replaced by '*' of the same length.
- method="drop_sentence" (analog of "rdkit"): sentences containing a
  lexicon word are removed entirely.

Unprocessable = caption contains C0 control characters other than
tab/newline/CR — returned unchanged with diff=None (parse-failure
fallthrough, ``cleaning_utils.py:88-90``).

The lexicon is a deliberately fictional pseudo-profanity list (sci-fi
expletives) so the repo contains no real slurs; the fixtures inject
tokens from this same list.
"""

from __future__ import annotations

import re

TOXICITY_LEXICON: tuple[str, ...] = (
    "frakking",
    "gorram",
    "smeghead",
    "drokk",
    "felgercarb",
    "shazbot",
    "grokflarg",
    "blarghole",
)

METHODS = ("mask", "drop_sentence")

_WORD_RX = re.compile(
    r"(?<![A-Za-z0-9_])(" + "|".join(TOXICITY_LEXICON) + r")(?![A-Za-z0-9_])",
    re.IGNORECASE,
)
# A sentence = shortest run ending in . ! ? (with trailing spaces) or end.
_SENT_RX = re.compile(r"[^.!?]*[.!?]+\s*|[^.!?]+$")
_CTRL_RX = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def scrub_toxicity(caption: str | None, method: str = "mask"):
    """Scrub one caption → (caption_out, diff) with diff ∈ {1, 0, None}."""
    if method not in METHODS:
        raise ValueError(f"Unknown method: {method}. Must be one of {METHODS}")
    if caption is None:
        return None, None
    if _CTRL_RX.search(caption):
        return caption, None  # unprocessable: passthrough + None sentinel
    if method == "mask":
        out = _WORD_RX.sub(lambda m: "*" * len(m.group(0)), caption)
    else:
        kept = [s for s in _SENT_RX.findall(caption) if not _WORD_RX.search(s)]
        out = "".join(kept)
    return out, 1 if out != caption else 0
