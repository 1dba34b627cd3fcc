"""Persisted MinHash text-signature index (decontaminate without
re-shingling the reference corpus)."""

import pytest

from mehc_curation_spark.operators.similarity import (
    cross_corpus_text_near_dups,
    read_text_index,
    text_dups_against_index,
    write_text_index,
)

SF = "/root/testdata/sf0.001/documents.parquet"


def _split(spark):
    docs = spark.read.parquet(SF)
    cand = docs.filter("doc_id % 2 = 1").selectExpr(
        "doc_id as cand_id", "text")
    ref = docs.filter("doc_id % 2 = 0").selectExpr(
        "doc_id as ref_id", "text")
    return cand, ref


def test_index_equals_direct(spark, tmp_path):
    cand, ref = _split(spark)
    direct = sorted(tuple(r) for r in cross_corpus_text_near_dups(
        cand, ref, "cand_id", "ref_id", "text", threshold=0.3).collect())
    assert direct, "fixture mutation pairs must straddle the split"
    p = str(tmp_path / "tidx")
    res = write_text_index(ref, p, "ref_id", "text")
    assert res["version"] == 1 and res["bands"] == 8
    idx, cfg = read_text_index(spark, p)
    via = sorted(tuple(r) for r in text_dups_against_index(
        cand, idx, "cand_id", "text", threshold=0.3, **cfg).collect())
    assert via == direct


def test_append_and_config_guard(spark, tmp_path):
    cand, ref = _split(spark)
    p = str(tmp_path / "tidx")
    # build from an empty-ish first half, then append the rest: the
    # final index must behave like one built in a single shot
    half_a = ref.filter("ref_id % 4 = 0")
    half_b = ref.filter("ref_id % 4 = 2")
    write_text_index(half_a, p, "ref_id", "text")
    res = write_text_index(half_b, p, "ref_id", "text", mode="append")
    assert res["version"] == 2
    idx, cfg = read_text_index(spark, p)
    assert idx.count() == ref.count()
    whole = str(tmp_path / "whole")
    write_text_index(ref, whole, "ref_id", "text")
    idx_w, _ = read_text_index(spark, whole)
    a = sorted(tuple(r) for r in text_dups_against_index(
        cand, idx, "cand_id", "text", **cfg).collect())
    b = sorted(tuple(r) for r in text_dups_against_index(
        cand, idx_w, "cand_id", "text", **cfg).collect())
    assert a == b
    with pytest.raises(ValueError, match="banding config"):
        write_text_index(half_b, p, "ref_id", "text", bands=4,
                         mode="append")


def test_plain_table_refused(spark, tmp_path):
    """A snapshot table without recorded banding properties is NOT a
    text index: read refuses; append refuses (unknown provenance)."""
    from mehc_curation_spark.io.catalog import SnapshotTable
    p = str(tmp_path / "plain")
    SnapshotTable(p).write(spark.range(3).selectExpr(
        "CAST(id AS STRING) ref_id",
        "array(CAST(id AS BIGINT)) shingles",
        "array(CAST(id AS BIGINT)) band_keys"))
    with pytest.raises(ValueError, match="lacks banding properties"):
        read_text_index(spark, p)
    _, ref = _split(spark)
    with pytest.raises(ValueError, match="banding config"):
        write_text_index(ref.limit(5), p, "ref_id", "text",
                         mode="append")
