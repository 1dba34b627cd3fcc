"""Seed-deterministic synthetic image+caption corpus (FIXTURES.md T1).

Generates the exact `input_hint` table shape::

    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash bigint

with skewed language and caption-length distributions, injected PII /
toxicity / low-quality captions, corrupted image payloads, and planted
perfect + partial duplicates — everything the curation rules and the
dedup semantics need to be exercised. No external data; a fixed seed
reproduces the table bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from mehc_curation_spark.codecs.image import encode_image, decode_image
from mehc_curation_spark.codecs.phash import phash64
from mehc_curation_spark.rules.langid import _SEED, LANGS
from mehc_curation_spark.rules.toxicity import TOXICITY_LEXICON

# Skewed language mix (en-heavy, per FIXTURES.md).
_LANG_P = {"en": 0.55, "de": 0.12, "fr": 0.10, "es": 0.10, "vi": 0.07, "zh": 0.06}

_PII_SAMPLES = (
    "contact user{i}@example.com for details",
    "call 555-123-4567 now",
    "visit https://example.com/p/{i} today",
    "ssn 123-45-6789 on file",
    "follow @handle{i} online",
    "mail to sales.team+x@mail.example.org please",
)

_FMT_P = {"raw": 0.25, "bmp": 0.25, "png": 0.30, "jpegq": 0.20}
_SIZES = (16, 24, 32, 48, 64)


def _vocab() -> dict[str, list[str]]:
    v = {}
    for lang in LANGS:
        if lang == "zh":
            v[lang] = _SEED[lang].replace("。", "").replace("，", "")
        else:
            v[lang] = sorted(set(_SEED[lang].replace(".", " ").split()))
    return v


_VOCAB = _vocab()


def _caption(rng: np.random.Generator, lang: str) -> str:
    if lang == "zh":
        # contiguous seed substrings so the char-trigram stats are real
        text = _VOCAB[lang]
        k = int(np.clip(rng.lognormal(1.0, 0.5), 2, 8))
        parts = []
        for _ in range(k):
            ln = int(rng.integers(3, 9))
            st = int(rng.integers(0, len(text) - ln))
            parts.append(text[st : st + ln])
        return "".join(parts)
    words = _VOCAB[lang]
    # log-normal word count → heavy-tailed caption lengths (skew driver)
    k = int(np.clip(rng.lognormal(1.9, 0.6), 3, 60))
    idx = rng.integers(0, len(words), k)
    return " ".join(words[i] for i in idx)


def _decorate(rng: np.random.Generator, cap: str) -> str:
    r = rng.random()
    if r < 0.08:
        cap += f" {rng.integers(1,99)},{rng.integers(1,9)}km"
    elif r < 0.13:
        cap += " 🌞"
    elif r < 0.18:
        cap = cap.replace(" ", "  ", 1)
    elif r < 0.23:
        cap = "“" + cap + "”"
    elif r < 0.28:
        cap += " café ès ño"
    return cap


def _low_quality(rng: np.random.Generator, kind: str, lang: str) -> str:
    if kind == "gibberish":
        letters = "abcdefghijklmnopqrstuvwxyz"
        return "".join(letters[i] for i in rng.integers(0, 26, 40))
    if kind == "repeats":
        return "photo " + "a" * (10 + int(rng.integers(0, 20))) + " end"
    if kind == "symbols":
        return "".join("!@#$%^&*()_+"[i] for i in rng.integers(0, 12, 20))
    if kind == "too_short":
        return "ok"
    if kind == "too_long":
        return ("very long caption " * 40)[:600]
    if kind == "empty":
        return "" if rng.random() < 0.5 else "   "
    if kind == "invalid_utf8":
        return "broken � caption text here"
    if kind == "control":
        return _caption(rng, lang) + "\x07"
    if kind == "high_digit":
        # >50% digits but >=25% letters, so it reaches the digit rule
        return "".join(str(i) for i in rng.integers(0, 10, 15)) + " photos"
    raise ValueError(kind)


def _image(rng: np.random.Generator) -> np.ndarray:
    w = int(_SIZES[rng.integers(0, len(_SIZES))])
    h = int(_SIZES[rng.integers(0, len(_SIZES))])
    kind = rng.integers(0, 4)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == 0:  # tilted gradient, random phase/slope/colors
        a, b = rng.uniform(0.5, 4.0, 2)
        base = (a * xx + b * yy) * (255.0 / (a * w + b * h))
        px = np.stack([np.clip(base * c + o, 0, 255)
                       for c, o in zip(rng.uniform(0.4, 1.0, 3), rng.uniform(0, 60, 3))], axis=2)
    elif kind == 1:  # checkerboard, random period/colors
        p = int(rng.integers(2, 9))
        mask = ((xx // p + yy // p) % 2).astype(np.float64)
        c0, c1 = rng.integers(0, 256, (2, 3))
        px = mask[:, :, None] * c1 + (1 - mask[:, :, None]) * c0
    elif kind == 2:  # noise
        px = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    else:  # color blocks
        px = np.zeros((h, w, 3))
        for _ in range(int(rng.integers(2, 6))):
            x0, y0 = rng.integers(0, w), rng.integers(0, h)
            x1, y1 = rng.integers(x0 + 1, w + 1), rng.integers(y0 + 1, h + 1)
            px[y0:y1, x0:x1] = rng.integers(0, 256, 3)
    return px.astype(np.uint8)


def _corrupt(rng: np.random.Generator, data: bytes) -> bytes:
    r = rng.random()
    if r < 0.4:
        return data[: max(1, len(data) // 3)]          # truncated
    if r < 0.7:
        return b"XX" + data[2:]                        # wrong magic
    return b""                                         # empty payload


def make_pairs_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Generate the T1 `pairs` table as a pandas DataFrame of n rows."""
    rng = np.random.default_rng(seed)
    n_perfect = int(n * 0.03)
    n_partial = int(n * 0.02)
    n_base = n - n_perfect - n_partial

    lang_names = list(_LANG_P)
    lang_p = np.array([_LANG_P[l] for l in lang_names])
    lang_p = lang_p / lang_p.sum()

    cat_names = ["normal", "pii", "toxic", "gibberish", "repeats", "symbols",
                 "too_short", "too_long", "empty", "invalid_utf8", "control",
                 "high_digit"]
    cat_p = np.array([0.775, 0.08, 0.04, 0.02, 0.01, 0.01,
                      0.01, 0.01, 0.005, 0.005, 0.005, 0.04])
    cat_p = cat_p / cat_p.sum()

    rows: list[dict] = []
    for i in range(n_base):
        lang = lang_names[rng.choice(len(lang_names), p=lang_p)]
        cat = cat_names[rng.choice(len(cat_names), p=cat_p)]
        if cat == "normal":
            cap = _decorate(rng, _caption(rng, lang))
        elif cat == "pii":
            tmpl = _PII_SAMPLES[rng.integers(0, len(_PII_SAMPLES))]
            pii = tmpl.format(i=int(rng.integers(0, 10_000)))
            cap = (pii if rng.random() < 0.25          # caption that is ALL pii
                   else _caption(rng, lang) + " " + pii)
        elif cat == "toxic":
            tok = TOXICITY_LEXICON[rng.integers(0, len(TOXICITY_LEXICON))]
            base = _caption(rng, lang)
            cap = (base + " " + tok + ".") if rng.random() < 0.5 else \
                  (base + ". this is " + tok + " stuff. more text here.")
        else:
            cap = _low_quality(rng, cat, lang)

        px = _image(rng)
        h, w = px.shape[:2]
        fmt = list(_FMT_P)[rng.choice(len(_FMT_P), p=np.array(list(_FMT_P.values())))]
        data = encode_image(px, fmt)
        if rng.random() < 0.01:
            data = _corrupt(rng, data)
            ph = int(rng.integers(-(2**62), 2**62))    # phash meaningless for corrupt rows
        else:
            ph = phash64(decode_image(data, fmt, w, h))
        rows.append({"bytes": data, "w": w, "h": h, "fmt": fmt,
                     "caption": cap, "phash": ph, "_lang": lang})

    # planted perfect duplicates: identical (bytes, w, h, fmt, caption, phash)
    for _ in range(n_perfect):
        src = rows[int(rng.integers(0, n_base))]
        rows.append(dict(src))

    # planted partial duplicates: same image/phash, different caption
    for _ in range(n_partial):
        src = rows[int(rng.integers(0, n_base))]
        r = dict(src)
        r["caption"] = _caption(rng, src["_lang"])
        rows.append(r)

    perm = rng.permutation(len(rows))
    out = [rows[j] for j in perm]
    for k, r in enumerate(out):
        r["image_id"] = f"img_{k:08x}"
        r.pop("_lang", None)

    pdf = pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt",
                                     "caption", "phash"])
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


# Bump when ANY generation logic that affects fixture CONTENT changes
# (codec output, corruption rates, caption text, phash derivation):
# the version is part of every cache filename, so stale caches written
# by an older generator can never be silently reused against a freshly
# generated oracle (fv2 = post float32-IDCT decode).
FIXTURE_VERSION = 2


def write_pairs_parquet(path: str, n: int, seed: int = 42,
                        row_group_size: int = 2048) -> str:
    """Materialize the pairs table as a parquet file; returns the path.

    Cached: if the file already exists it is reused (generation of the
    bench-scale table is minutes of NumPy work).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not path.endswith(".parquet"):
        # directory (existing or not) → file inside it. Deciding by
        # os.path.isdir alone once wrote the table AS the cache dir
        # when the dir didn't exist yet.
        os.makedirs(path, exist_ok=True)
        path = os.path.join(
            path, f"pairs_n{n}_s{seed}_fv{FIXTURE_VERSION}.parquet")
    if os.path.exists(path):
        return path
    pdf = make_pairs_pdf(n, seed)
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
    ])
    tbl = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)
    return path
