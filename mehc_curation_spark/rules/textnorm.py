"""Caption normalization — graft analogs of the reference's
stereo/tautomer normalizers.

- :func:`normalize_lossy` (analog of ``destereoisomerize``,
  ``/root/reference/mehc_curation/normalization/utils/normalization_utils.py:72-93``):
  lossy canonical form — NFKC, strip combining marks (diacritics),
  drop non-BMP symbols/emoji, collapse whitespace runs.
- :func:`normalize_canonical` (analog of ``detautomerize``,
  ``normalization_utils.py:31-70``): rewrite near-equivalent textual
  variants of one meaning into a canonical form (decimal commas,
  unit spacing, typographic quotes/dashes) so variants collide for
  dedup.

Both return ``(new_caption, changed)`` mirroring the reference's
``(smi, diff)`` tuples, with passthrough-on-failure (None in → None
out, changed=False). Order is semantic: lossy before canonical, as the
reference orders destereoisomerize before detautomerize
(``normalization/core/pipeline.py:89``).
"""

from __future__ import annotations

import re
import unicodedata

_WS_RX = re.compile(r"\s+")
_EMOJI_RX = re.compile("[\U00010000-\U0010FFFF☀-➿️]")
_DECIMAL_COMMA_RX = re.compile(r"(?<=[0-9]),(?=[0-9])")
_UNIT_RX = re.compile(r"(?<=[0-9])(km|cm|mm|kg|mg|ml|kmh|mph|px)(?![A-Za-z])")
_QUOTES = {"‘": "'", "’": "'", "“": '"', "”": '"',
           "–": "-", "—": "-", " ": " "}


def normalize_lossy(caption: str | None) -> tuple[str | None, bool]:
    """NFKC + strip diacritics/emoji + collapse whitespace."""
    if caption is None:
        return None, False
    out = unicodedata.normalize("NFKC", caption)
    # strip combining marks: NFD then drop category Mn
    out = "".join(c for c in unicodedata.normalize("NFD", out)
                  if unicodedata.category(c) != "Mn")
    out = unicodedata.normalize("NFC", out)
    out = _EMOJI_RX.sub("", out)
    out = _WS_RX.sub(" ", out).strip()
    return out, out != caption


def normalize_canonical(caption: str | None) -> tuple[str | None, bool]:
    """Canonicalize numbers/units/typography ("1,5 km" → "1.5 km")."""
    if caption is None:
        return None, False
    out = caption
    for k, v in _QUOTES.items():
        out = out.replace(k, v)
    out = _DECIMAL_COMMA_RX.sub(".", out)
    out = _UNIT_RX.sub(r" \1", out)
    return out, out != caption
