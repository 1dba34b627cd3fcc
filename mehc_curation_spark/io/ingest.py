"""CSV / JSONL ingestion of the pairs table with a pinned schema.

Reference parity: the reference's source is a CSV scan with inferred
schema and positional payload addressing
(`/root/reference/mehc_curation/validation/core/engine.py:37-42`);
here the interchange schema is pinned EXPLICITLY (never
``inferSchema`` — schema inference is a second full pass over the
data at scale) and the binary image payload travels base64-encoded in
a ``bytes_b64`` column, decoded to ``binary`` at the boundary.

Null discipline: text formats cannot natively distinguish NULL from
the empty string, and the curation rules treat them differently
(``caption_missing`` vs ``caption_empty``), so both sides of the
interchange use an explicit ``\\N`` null sentinel (the classic
mysqldump/Hive convention) with quoted-empty meaning the empty
string.

Scale notes: CSV files are line-splittable only when fields contain
no raw newlines, so the CSV writer REFUSES captions containing
newline/CR (quoting them would be valid CSV but force
``multiLine=true`` readers, which cannot split a file across tasks —
at 100 TB that serializes the scan); it likewise refuses a caption
that IS the ``\\N`` sentinel (unescapable collision). Newline- or
sentinel-bearing text belongs in JSONL, which escapes natively and
stays splittable unconditionally. Both readers run ``mode=FAILFAST``
— a malformed row should fail the ingest loudly, not silently null
out a payload (PERMISSIVE would).
"""

from __future__ import annotations

import base64
import csv
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mehc_curation_spark.schema import PAIRS_SCHEMA

NULL_SENTINEL = r"\N"

#: Interchange schema: PAIRS_SCHEMA with the binary payload as base64.
PAIRS_TEXT_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("bytes_b64", StringType(), True),
    StructField("w", IntegerType(), True),
    StructField("h", IntegerType(), True),
    StructField("fmt", StringType(), True),
    StructField("caption", StringType(), True),
    StructField("phash", LongType(), True),
])


def _decode(df: DataFrame) -> DataFrame:
    """bytes_b64 -> binary bytes, projecting to the pinned pairs
    schema (column order included)."""
    return df.select(
        "image_id",
        F.unbase64("bytes_b64").alias("bytes"),
        "w", "h", "fmt", "caption", "phash")


def read_pairs_csv(spark: SparkSession, path: str) -> DataFrame:
    df = (spark.read
          .schema(PAIRS_TEXT_SCHEMA)
          .option("header", True)
          .option("nullValue", NULL_SENTINEL)
          .option("emptyValue", "")
          # RFC-4180 doubled-quote escaping (what csv.writer and
          # DuckDB emit); Spark's default escape is backslash
          .option("escape", '"')
          .option("mode", "FAILFAST")
          .csv(path))
    return _decode(df)


def read_pairs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    df = (spark.read
          .schema(PAIRS_TEXT_SCHEMA)
          .option("mode", "FAILFAST")
          .json(path))
    return _decode(df)


def read_pairs_wds(spark: SparkSession, path: str) -> DataFrame:
    """Read a WebDataset tar-shard directory (the LAION distribution
    shape — ``shard-*.tar`` of ``<id>.img`` + ``<id>.json`` members,
    e.g. one produced by :func:`..io.export.export_webdataset`) into
    the pinned pairs schema: the JSON sidecar parses against an
    explicit metadata schema (never inferred) and the payload maps to
    the binary ``bytes`` column.

    Tar members carry no null/empty distinction, so a zero-length
    payload reads back as NULL ``bytes`` — which keeps the decode
    gate's reason labels stable across an export → ingest round trip
    (the writer renders NULL payloads as empty members)."""
    from mehc_curation_spark.io.export import read_webdataset

    meta_schema = StructType([
        StructField("caption", StringType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("phash", LongType(), True),
    ])
    rt = read_webdataset(spark, path)
    m = F.from_json("meta", meta_schema)
    return rt.select(
        "image_id",
        F.when(F.length("bytes") == 0, F.lit(None).cast("binary"))
         .otherwise(F.col("bytes")).alias("bytes"),
        m["w"].alias("w"), m["h"].alias("h"), m["fmt"].alias("fmt"),
        m["caption"].alias("caption"), m["phash"].alias("phash"))


def read_pairs(spark: SparkSession, path: str,
               fmt: str = "parquet") -> DataFrame:
    """Format dispatch for the curate input. ``parquet`` reads the
    native table; ``csv``/``jsonl`` read the base64 interchange shape
    and decode to the identical pinned schema; ``wds`` reads a
    WebDataset tar-shard directory."""
    if fmt == "parquet":
        return spark.read.schema(PAIRS_SCHEMA).parquet(path)
    if fmt == "csv":
        return read_pairs_csv(spark, path)
    if fmt == "jsonl":
        return read_pairs_jsonl(spark, path)
    if fmt == "wds":
        return read_pairs_wds(spark, path)
    raise ValueError(f"unknown input format {fmt!r} "
                     "(expected parquet|csv|jsonl|wds)")


# ---------------------------------------------------------------------------
# local writers (fixtures / round-trip tests / small exports)
# ---------------------------------------------------------------------------

def write_pairs_csv(pdf, path: str) -> str:
    """Write a pairs pandas frame as one interchange CSV (driver-side
    helper for fixtures and tests; a distributed export would be
    ``df.write.csv`` with the same options)."""
    cols = [f.name for f in PAIRS_TEXT_SCHEMA.fields]
    for c in ("image_id", "fmt", "caption"):
        vals = pdf[c].dropna().astype(str)
        if vals.str.contains("[\r\n]", regex=True).any():
            raise ValueError(
                f"{c} values contain newline/CR: raw newlines make CSV "
                "non-splittable at scale — use write_pairs_jsonl instead")
        if (vals == NULL_SENTINEL).any():
            raise ValueError(
                f"a {c} value equals the {NULL_SENTINEL!r} null sentinel "
                "(unescapable in CSV) — use write_pairs_jsonl instead")
    # QUOTE_ALL: an UNQUOTED empty field is indistinguishable from a
    # null to CSV readers; quoted "" reads as the empty string and a
    # quoted sentinel still reads as NULL (verified for Spark's
    # univocity parser and DuckDB's allow_quoted_nulls default).
    with open(path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f, quoting=csv.QUOTE_ALL)
        wr.writerow(cols)
        for r in pdf.itertuples(index=False):
            b = r.bytes
            wr.writerow([
                r.image_id,
                NULL_SENTINEL if b is None
                else base64.b64encode(b).decode("ascii"),
                NULL_SENTINEL if r.w is None else int(r.w),
                NULL_SENTINEL if r.h is None else int(r.h),
                NULL_SENTINEL if r.fmt is None else r.fmt,
                NULL_SENTINEL if r.caption is None else r.caption,
                NULL_SENTINEL if r.phash is None else int(r.phash),
            ])
    return path


def write_pairs_jsonl(pdf, path: str) -> str:
    """Write a pairs pandas frame as interchange JSONL (NULLs are
    native JSON nulls — no sentinel needed)."""
    with open(path, "w", encoding="utf-8") as f:
        for r in pdf.itertuples(index=False):
            f.write(json.dumps({
                "image_id": r.image_id,
                "bytes_b64": None if r.bytes is None
                else base64.b64encode(r.bytes).decode("ascii"),
                "w": None if r.w is None else int(r.w),
                "h": None if r.h is None else int(r.h),
                "fmt": r.fmt,
                "caption": r.caption,
                "phash": None if r.phash is None else int(r.phash),
            }, ensure_ascii=False) + "\n")
    return path
