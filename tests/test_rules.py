"""Per-rule keep/drop fixtures (FIXTURES.md T3) + scalar/Catalyst
equivalence for the heuristic rules."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.rules.decode import decode_reason
from mehc_curation_spark.rules.heuristics import heuristic_reason, heuristic_reason_col
from mehc_curation_spark.rules.langid import classify_batch, LANGS
from mehc_curation_spark.codecs.image import encode_image
import numpy as np


HEURISTIC_CASES = [
    (None, "caption_null"),
    ("", "caption_empty"),
    ("   ", "caption_empty"),
    (" \t\n", "caption_empty"),
    ("ok", "caption_too_short"),
    ("ab" * 257, "caption_too_long"),
    ("broken � text", "caption_invalid_utf8"),
    ("photo aaaaaaaaaaaa end", "caption_repetition"),
    ("!!!???!!!***###", "caption_low_alpha"),
    ("123456789012345 photos", "caption_high_digit"),
    ("a normal caption about a dog", None),
    ("一张小棕狗的照片", None),          # CJK letters count as alpha
    ("café ès ño naïve", None),          # accented letters
    ("abc", None),                        # exactly MIN_LEN
    ("ab" * 256, None),                   # exactly MAX_LEN, no repeat run
    ("photo aaaaaaaaa end", None),        # 9-run is allowed
]


@pytest.mark.parametrize("caption,expected", HEURISTIC_CASES)
def test_heuristic_scalar(caption, expected):
    assert heuristic_reason(caption) == expected


def test_heuristic_catalyst_matches_scalar(spark):
    pdf = pd.DataFrame({"caption": [c for c, _ in HEURISTIC_CASES]})
    df = spark.createDataFrame(pdf)
    got = (
        df.select(heuristic_reason_col(F.col("caption")).alias("r"))
        .toPandas()["r"]
        .where(lambda s: s.notna(), None)
        .tolist()
    )
    want = [heuristic_reason(c) for c, _ in HEURISTIC_CASES]
    assert got == want


def test_heuristic_catalyst_matches_scalar_on_corpus(spark, pairs_pdf, pairs_df):
    """Exact agreement across the whole fixture corpus."""
    got = (
        pairs_df.select("image_id",
                        heuristic_reason_col(F.col("caption")).alias("r"))
        .toPandas().sort_values("image_id")["r"]
        .where(lambda s: s.notna(), None).tolist()
    )
    want = [heuristic_reason(c) for c in
            pairs_pdf.sort_values("image_id")["caption"]]
    assert got == want


def test_decode_reasons():
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    ok = encode_image(px, "png")
    assert decode_reason(ok, "png", 16, 16) is None
    assert decode_reason(None, "png", 16, 16) == "image_null"
    assert decode_reason(b"", "png", 16, 16) == "image_null"
    assert decode_reason(ok, "png", 0, 16) == "image_bad_dims"
    assert decode_reason(ok, "png", 17, 16) == "image_bad_dims"
    assert decode_reason(ok[:10], "png", 16, 16) == "image_undecodable"
    assert decode_reason(ok, "weird", 16, 16) == "image_undecodable"


def test_langid_on_seed_like_text():
    texts = [
        "the small dog runs across the green field in the morning",
        "der kleine hund läuft über die grüne wiese am morgen",
        "le petit chien court à travers le champ vert le matin",
        "el pequeño perro corre por el campo verde por la mañana",
        "chú chó nhỏ chạy qua cánh đồng xanh vào buổi sáng",
        "小狗早上跑过绿色的田野",
    ]
    langs, confs, ppls = classify_batch(texts)
    assert list(langs) == list(LANGS)
    assert (confs > 0.05).all()
    # below each language's configured ppl ceiling
    from mehc_curation_spark.rules.registry import CurationConfig
    thr = CurationConfig().ppl_threshold_map()
    assert all(p < thr[l] for l, p in zip(langs, ppls))


def test_langid_unknown_for_empty_and_short():
    langs, confs, ppls = classify_batch(["", "ab", None])
    assert list(langs) == ["und", "und", "und"]
    assert (confs == 0).all()


def test_langid_deterministic():
    texts = ["the quick brown fox", "ein kleiner brauner hund"]
    a = classify_batch(texts)
    b = classify_batch(texts)
    for x, y in zip(a, b):
        assert (x == y).all()


def test_mojibake_scalar_and_catalyst_agree(spark):
    from pyspark.sql import functions as F

    from mehc_curation_spark.rules.textnorm import (
        fix_mojibake, fix_mojibake_col)

    samples = [
        "cafÃ© â€” donâ€™t",          # accents + dashes + quote
        "â€œquotedâ€\x9d â€¦ naÃ¯ve",  # undefined-cp1252 byte path
        "â‚¬5 Â«okÂ» Ã±oÃ±o",
        "plain ascii stays",
        "",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["f"] for r in
           df.select(fix_mojibake_col(F.col("t")).alias("f")).collect()]
    assert got == [fix_mojibake(s) for s in samples]
    assert got[0] == "café — don’t"
    assert got[1] == "“quoted” … naïve"
    assert got[2] == "€5 «ok» ñoño"
    assert got[3] == "plain ascii stays"


def test_mojibake_map_derived_not_typed():
    from mehc_curation_spark.rules.textnorm import MOJIBAKE_MAP

    from mehc_curation_spark.rules.textnorm import _cp1252ish

    for k, v in MOJIBAKE_MAP.items():
        assert k != v
        # every key really is the cp1252-ish mis-decode of its target
        assert k == _cp1252ish(v.encode("utf-8"))
    # longest-first ordering so prefix keys can't shadow longer ones
    lens = [len(k) for k in MOJIBAKE_MAP]
    assert lens == sorted(lens, reverse=True)
