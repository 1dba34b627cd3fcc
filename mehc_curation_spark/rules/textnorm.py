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


# ---------------------------------------------------------------------------
# mojibake repair (UTF-8 bytes mis-decoded as cp1252/latin-1)
# ---------------------------------------------------------------------------

# The single most common real-web encoding damage: a UTF-8 document
# decoded as cp1252 somewhere in the crawl chain turns every non-ASCII
# char into a 2-3 char garble ("é" -> "Ã©", "'" -> "â€™"). The repair
# map is DERIVED, not hand-typed: key = target.encode('utf-8') decoded
# byte-per-byte as cp1252 with a latin-1 fallback for the five code
# points cp1252 leaves undefined (0x81 8D 8F 90 9D) — the same
# "sloppy cp1252" convention ftfy uses (public: ftfy docs, Speer 2019).

_MOJIBAKE_TARGETS = (
    "’‘“”–—…"   # ’ ‘ “ ” – — …
    "¡¿«»°©®· "
    "€£¥"                            # € £ ¥
    "éèêëáàâäãåçíìîïñóòôöõúùûüýßœæø"
    "ÉÈÁÀÄÇÍÑÓÖÚÜ"
)


def _cp1252ish(bs: bytes) -> str:
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))  # latin-1 fallback (undefined cp1252)
    return "".join(out)


#: garbled-sequence -> intended char, longest keys first so that a key
#: sharing a prefix with a longer one can never shadow it.
MOJIBAKE_MAP: dict[str, str] = dict(sorted(
    {_cp1252ish(t.encode("utf-8")): t for t in _MOJIBAKE_TARGETS}.items(),
    key=lambda kv: (-len(kv[0]), kv[0])))


def fix_mojibake(s: str | None) -> str | None:
    """Scalar twin of :func:`fix_mojibake_col` (same map, same order)."""
    if s is None:
        return None
    for k, v in MOJIBAKE_MAP.items():
        if k in s:
            s = s.replace(k, v)
    return s


def fix_mojibake_col(c):
    """Catalyst mojibake repair: a chain of literal ``replace`` calls
    (no regex — the garbles contain metacharacters) applied in the
    fixed longest-first order. ~60 replaces fuse into one codegen
    stage; NULL propagates. Not a full re-decoder: text that was
    double-mojibaked needs two passes (same caveat as ftfy's fast
    path)."""
    from pyspark.sql import functions as F

    out = c
    for k, v in MOJIBAKE_MAP.items():
        out = F.replace(out, F.lit(k), F.lit(v))
    return out
