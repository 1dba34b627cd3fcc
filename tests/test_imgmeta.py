"""PNG metadata audit / embed / strip (operators/imgmeta.py)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.codecs.image import decode_image, encode_image
from mehc_curation_spark.operators.imgmeta import (
    embed_png_text_bytes,
    embed_provenance,
    image_metadata_audit,
    iter_png_chunks,
    strip_image_metadata,
    strip_png_metadata_bytes,
)


def _px(seed, w=8, h=6):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _inject_before_iend(data: bytes, chunk: bytes) -> bytes:
    idx = data.rindex(b"IEND") - 4
    return data[:idx] + chunk + data[idx:]


@pytest.fixture(scope="module")
def meta_df(spark):
    rows = []
    for i in range(6):
        png = encode_image(_px(i), "png")
        rows.append((f"p{i}", png, 8, 6, "png"))
    bmp = encode_image(_px(99), "bmp")
    rows.append(("b0", bmp, 8, 6, "bmp"))
    rows.append(("n0", None, 8, 6, "png"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")


class TestAudit:
    def test_clean_corpus_audits_empty(self, meta_df):
        got = image_metadata_audit(meta_df).toPandas().set_index("image_id")
        for i in range(6):
            r = got.loc[f"p{i}"]
            assert list(r["meta_chunks"]) == [] and r["meta_bytes"] == 0
            assert not r["has_text_meta"] and not r["has_trailing"]
        assert list(got.loc["b0"]["meta_chunks"]) == []
        assert got.loc["n0"]["meta_chunks"] is None

    def test_exif_and_time_flags(self, spark):
        png = encode_image(_px(1), "png")
        png = _inject_before_iend(png, _chunk(b"eXIf", b"\x00" * 16))
        png = _inject_before_iend(png, _chunk(b"tIME", b"\x00" * 7))
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert set(r["meta_chunks"]) == {"eXIf", "tIME"}
        assert r["has_exif"] and r["has_time"] and not r["has_text_meta"]
        assert r["meta_bytes"] == (12 + 16) + (12 + 7)

    def test_pixel_affecting_ancillary_not_metadata(self, spark):
        """tRNS/gAMA affect rendering: they surface in other_ancillary,
        count zero removable bytes, and survive the strip verbatim."""
        png = encode_image(_px(2), "png")
        png = _inject_before_iend(png, _chunk(b"gAMA", b"\x00\x01\x86\xa0"))
        png = _inject_before_iend(png, _chunk(b"tRNS", b"\x00\x01\x02"))
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert list(r["meta_chunks"]) == [] and r["meta_bytes"] == 0
        assert set(r["other_ancillary"]) == {"gAMA", "tRNS"}
        assert strip_png_metadata_bytes(png) == png

    def test_trailing_bytes_counted(self, spark):
        png = encode_image(_px(3), "png") + b"JUNKJUNK"
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert r["has_trailing"] and r["meta_bytes"] == 8
        assert list(r["meta_chunks"]) == []

    def test_text_keys_surface(self, spark):
        png = embed_png_text_bytes(encode_image(_px(2), "png"),
                                   "source", "http://example.com/a")
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert r["meta_chunks"] == ["tEXt"] and r["text_keys"] == ["source"]
        assert r["has_text_meta"]

    def test_corrupt_png_audits_null(self, spark):
        png = encode_image(_px(3), "png")[:20]
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert r["meta_chunks"] is None and r["meta_bytes"] is None


class TestStrip:
    def test_strip_undoes_embed_byte_exact(self, spark, meta_df):
        tagged = embed_provenance(meta_df.filter("bytes is not null"),
                                  value_col="image_id")
        stripped = strip_image_metadata(tagged)
        back = {r["image_id"]: r["bytes"] for r in stripped.collect()}
        orig = {r["image_id"]: r["bytes"]
                for r in meta_df.filter("bytes is not null").collect()}
        assert back == orig

    def test_pixels_identical_through_embed_and_strip(self):
        px = _px(4)
        png = encode_image(px, "png")
        tagged = embed_png_text_bytes(png, "license", "CC-BY")
        assert np.array_equal(decode_image(tagged, "png", 8, 6), px)
        assert np.array_equal(
            decode_image(strip_png_metadata_bytes(tagged), "png", 8, 6), px)

    def test_trailing_junk_after_iend_removed(self):
        png = encode_image(_px(5), "png") + b"JUNKJUNK"
        out = strip_png_metadata_bytes(png)
        assert out == encode_image(_px(5), "png")

    def test_audit_clean_implies_strip_identity(self, spark):
        """The contract the check queries lean on: meta_bytes == 0
        <=> strip returns the input byte-for-byte — including a PNG
        carrying preserved (pixel-affecting) ancillary chunks."""
        png = encode_image(_px(8), "png")
        png = _inject_before_iend(png, _chunk(b"sRGB", b"\x00"))
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert r["meta_bytes"] == 0
        assert strip_png_metadata_bytes(png) == png

    def test_non_png_passthrough_and_nulls(self, spark, meta_df):
        out = {r["image_id"]: r["bytes"]
               for r in strip_image_metadata(meta_df).collect()}
        src = {r["image_id"]: r["bytes"] for r in meta_df.collect()}
        assert out["b0"] == src["b0"]
        assert out["n0"] is None

    def test_corrupt_png_passes_through_unchanged(self, spark):
        png = encode_image(_px(6), "png")[:20]
        df = spark.createDataFrame([("x", png, "png")],
                                   "image_id string, bytes binary, fmt string")
        assert bytes(strip_image_metadata(df).first()["bytes"]) == png
        tagged = embed_provenance(df, value_col="image_id")
        assert bytes(tagged.first()["bytes"]) == png


class TestEmbed:
    def test_unicode_value_uses_itxt_and_round_trips(self, spark):
        """Non-latin-1 provenance must NOT be silently dropped: it
        goes into an iTXt chunk (UTF-8 per spec), audits as text
        metadata, and the strip still returns the original bytes."""
        png = encode_image(_px(7), "png")
        val = "José’s café — 東京"
        tagged = embed_png_text_bytes(png, "source", val)
        assert b"iTXt" in tagged
        df = spark.createDataFrame([("x", tagged, "png")],
                                   "image_id string, bytes binary, fmt string")
        r = image_metadata_audit(df).first()
        assert r["meta_chunks"] == ["iTXt"] and r["has_text_meta"]
        assert r["text_keys"] == ["source"]
        assert strip_png_metadata_bytes(tagged) == png

    def test_bad_key_raises_eagerly(self):
        from mehc_curation_spark.operators.imgmeta import make_embed_text_udf

        with pytest.raises(UnicodeEncodeError):
            make_embed_text_udf("clé—日本")


class TestChunkWalk:
    def test_iter_requires_iend(self):
        png = encode_image(_px(7), "png")
        idx = png.rindex(b"IEND") - 4
        with pytest.raises(ValueError, match="IEND"):
            list(iter_png_chunks(png[:idx]))

    def test_embed_requires_ihdr(self):
        with pytest.raises(ValueError, match="not a PNG"):
            embed_png_text_bytes(b"\x00" * 30, "k", "v")
