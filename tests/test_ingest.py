"""CSV/JSONL ingestion (io/ingest.py): interchange round-trips, null
discipline, FAILFAST, and curate-over-CSV label equality."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.ingest import (
    read_pairs,
    read_pairs_csv,
    read_pairs_jsonl,
    write_pairs_csv,
    write_pairs_jsonl,
)


@pytest.fixture(scope="module")
def text_fixtures(pairs_pdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("ingest")
    csv_p = write_pairs_csv(pairs_pdf, str(base / "pairs.csv"))
    jl_p = write_pairs_jsonl(pairs_pdf, str(base / "pairs.jsonl"))
    return csv_p, jl_p


def _norm(df):
    return (df.withColumn("b64", F.regexp_replace(
                F.base64("bytes"), "[\\r\\n]", ""))
            .drop("bytes").toPandas()
            .sort_values("image_id").reset_index(drop=True))


class TestIngestRoundTrip:
    @pytest.mark.parametrize("fmt", ["csv", "jsonl"])
    def test_equals_parquet_read(self, spark, pairs_df, text_fixtures, fmt):
        csv_p, jl_p = text_fixtures
        got = _norm(read_pairs(spark, csv_p if fmt == "csv" else jl_p, fmt))
        exp = _norm(pairs_df)
        assert list(got.columns) == list(exp.columns)
        for c in exp.columns:
            a = exp[c].fillna("∅").astype(str)
            b = got[c].fillna("∅").astype(str)
            assert a.equals(b), (fmt, c)

    def test_schema_is_pinned(self, spark, text_fixtures):
        csv_p, jl_p = text_fixtures
        for df in (read_pairs_csv(spark, csv_p),
                   read_pairs_jsonl(spark, jl_p)):
            assert [f.name for f in df.schema.fields] == \
                ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            assert df.schema["bytes"].dataType.typeName() == "binary"
            assert df.schema["phash"].dataType.typeName() == "long"

    def test_empty_vs_null_caption(self, spark, tmp_path):
        import pandas as pd
        pdf = pd.DataFrame({
            "image_id": ["a", "b", "c"],
            "bytes": [b"", None, b"xy"],
            "w": [1, 2, 3], "h": [1, 2, 3],
            "fmt": ["raw"] * 3,
            "caption": ["", None, "  "],
            "phash": [1, 2, 3],
        })
        p = write_pairs_csv(pdf, str(tmp_path / "nulls.csv"))
        rows = {r["image_id"]: r for r in read_pairs_csv(spark, p).collect()}
        assert rows["a"]["caption"] == "" and bytes(rows["a"]["bytes"]) == b""
        assert rows["b"]["caption"] is None and rows["b"]["bytes"] is None
        assert rows["c"]["caption"] == "  "

    def test_failfast_on_malformed(self, spark, tmp_path):
        p = str(tmp_path / "bad.csv")
        with open(p, "w") as f:
            f.write("image_id,bytes_b64,w,h,fmt,caption,phash\n")
            f.write('"a","eHk=","notanint","2","raw","hi","3"\n')
        with pytest.raises(Exception):
            read_pairs_csv(spark, p).collect()

    def test_unknown_format_raises(self, spark):
        with pytest.raises(ValueError):
            read_pairs(spark, "/tmp/x", "orc")


def test_curate_over_csv_matches_parquet(spark, pairs_pdf, pairs_df,
                                         text_fixtures):
    """End-to-end: the labels plan over CSV-ingested input equals the
    plan over the parquet table byte-for-byte."""
    from mehc_curation_spark.stages.plan import build_labels_plan

    csv_p, _ = text_fixtures
    a = (build_labels_plan(read_pairs_csv(spark, csv_p)).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (build_labels_plan(pairs_df).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    for c in a.columns:
        assert a[c].fillna("∅").astype(str).equals(
            b[c].fillna("∅").astype(str)), c


class TestIngestHardening:
    def test_csv_writer_refuses_newline_captions(self, tmp_path):
        import pandas as pd
        pdf = pd.DataFrame({
            "image_id": ["a"], "bytes": [b"x"], "w": [1], "h": [1],
            "fmt": ["raw"], "caption": ["line one\nline two"],
            "phash": [1],
        })
        with pytest.raises(ValueError, match="jsonl"):
            write_pairs_csv(pdf, str(tmp_path / "nl.csv"))
        # a caption that IS the null sentinel collides unescapably
        pdf2 = pdf.assign(caption=[r"\N"])
        with pytest.raises(ValueError, match="jsonl"):
            write_pairs_csv(pdf2, str(tmp_path / "sn.csv"))
        # JSONL is the sanctioned path and must round-trip both
        import json as _json
        p = write_pairs_jsonl(pd.concat([pdf, pdf2]),
                              str(tmp_path / "nl.jsonl"))
        lines = [_json.loads(l) for l in open(p)]
        assert [l["caption"] for l in lines] == \
            ["line one\nline two", r"\N"]

    def test_jsonl_roundtrips_newlines(self, spark, tmp_path):
        import pandas as pd
        caps = ["line one\nline two", "tab\there", "quote\"inside",
                "unicode é中文 \U0001f600", None, ""]
        pdf = pd.DataFrame({
            "image_id": [f"r{i}" for i in range(len(caps))],
            "bytes": [bytes([i]) for i in range(len(caps))],
            "w": [1] * len(caps), "h": [1] * len(caps),
            "fmt": ["raw"] * len(caps), "caption": caps,
            "phash": list(range(len(caps))),
        })
        p = write_pairs_jsonl(pdf, str(tmp_path / "rt.jsonl"))
        got = {r["image_id"]: r["caption"]
               for r in read_pairs_jsonl(spark, p).collect()}
        for i, c in enumerate(caps):
            assert got[f"r{i}"] == c, (i, c, got[f"r{i}"])

    def test_csv_property_roundtrip(self, spark, tmp_path):
        """Property-ish: adversarial single-line captions round-trip
        the CSV interchange exactly (quotes, commas, control chars,
        unicode, sentinel-lookalike, leading/trailing spaces)."""
        import pandas as pd
        caps = ['"fully quoted"', "comma, inside", "semicolon;pipe|",
                "  leading and trailing  ", "\t tab", "bell\x07char",
                "\\\\N", "NaN", "null", "None", "é中",
                "=1+2", "'single'", "a" * 500]
        pdf = pd.DataFrame({
            "image_id": [f"c{i:02d}" for i in range(len(caps))],
            "bytes": [b"x"] * len(caps),
            "w": [1] * len(caps), "h": [1] * len(caps),
            "fmt": ["raw"] * len(caps), "caption": caps,
            "phash": list(range(len(caps))),
        })
        p = write_pairs_csv(pdf, str(tmp_path / "adv.csv"))
        got = {r["image_id"]: r["caption"]
               for r in read_pairs_csv(spark, p).collect()}
        for i, c in enumerate(caps):
            assert got[f"c{i:02d}"] == c, (i, c, got[f"c{i:02d}"])


def test_curate_over_wds_matches_parquet(spark, pairs_df, tmp_path):
    """End-to-end: the labels plan over a WebDataset tar ingest equals
    the plan over the parquet table byte-for-byte — including NULL
    payloads, which the tar layer renders as empty members and the
    reader maps back to NULL so decode-gate reasons are stable."""
    from mehc_curation_spark.io.export import export_webdataset
    from mehc_curation_spark.io.ingest import read_pairs
    from mehc_curation_spark.stages.plan import build_labels_plan

    p = str(tmp_path / "wds_in")
    export_webdataset(pairs_df, p, n_shards=3, seed=0)
    a = (build_labels_plan(read_pairs(spark, p, "wds")).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (build_labels_plan(pairs_df).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert a[c].fillna("∅").astype(str).equals(
            b[c].fillna("∅").astype(str)), c
