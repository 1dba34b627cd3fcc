"""Unit tests for the LAION-style junk-caption flags
(operators/text_stats.py junk_caption_flags) — each flag exercised
with literal rows, including the NULL-propagation contract."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.text_stats import junk_caption_flags


def _flags(spark, caption):
    df = spark.createDataFrame([(caption,)], "caption string")
    cols = junk_caption_flags(F.col("caption"))
    row = df.select(*[v.alias(k) for k, v in cols.items()]).first()
    return row.asDict()


def test_url_flag(spark):
    r = _flags(spark, "see https://example.com/pic now")
    assert r["has_url"] and r["is_junk"]
    assert _flags(spark, "visit WWW.example.org")["has_url"]
    assert not _flags(spark, "a dog on a lawn")["has_url"]


def test_email_flag(spark):
    r = _flags(spark, "contact me at a.b+c@mail.example.org please")
    assert r["has_email"] and r["is_junk"]
    assert not _flags(spark, "the @ symbol alone")["has_email"]


def test_digit_run_flag(spark):
    assert _flags(spark, "sku 123456789 in stock")["long_digit_run"]
    assert not _flags(spark, "built in 1995, 20km away")["long_digit_run"]


def test_filename_flag(spark):
    for name in ("IMG_0042.JPG", "photo.jpeg there", "x.png", "y.webp",
                 "z.tiff end"):
        assert _flags(spark, name)["filename_like"], name
    assert not _flags(spark, "jpeg compression artifacts")["filename_like"]


def test_boilerplate_is_soft(spark):
    r = _flags(spark, "a photograph of a mountain")
    assert r["photo_boilerplate"]
    # boilerplate alone must NOT mark the caption junk
    assert r["is_junk"] is False


def test_null_caption_propagates(spark):
    r = _flags(spark, None)
    assert all(v is None for v in r.values()), r


def test_clean_caption_all_false(spark):
    r = _flags(spark, "two boats near a quiet harbor at dusk")
    assert all(v is False for v in r.values()), r


def test_compression_ratio_scalar():
    from mehc_curation_spark.operators.text_stats import compression_ratio

    assert compression_ratio(None) is None
    assert compression_ratio("") is None
    spam = compression_ratio("abc " * 200)
    prose = compression_ratio(
        "two boats drift near the quiet harbor while gulls wheel over "
        "the breakwater and a late ferry sounds its horn")
    assert spam is not None and prose is not None and spam < prose


def test_compression_ratio_udf_matches_scalar(spark):
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.text_stats import (
        compression_ratio, make_compression_ratio_udf)

    samples = ["hello world", "aaaa" * 50, "", None, "mixed 123 !?"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["r"] for r in df.select(
        make_compression_ratio_udf()(F.col("t")).alias("r")).collect()]
    assert got == [compression_ratio(s) for s in samples]
