"""Dedup semantics (FIXTURES.md T5) — direct ports of the reference
behaviors at /root/reference/mehc_curation/utils/common.py:88-131."""

import pandas as pd
import pytest

from mehc_curation_spark.operators.dedup import deduplicate, dup_reason_col


@pytest.fixture(scope="module")
def dedup_df(spark):
    rows = [
        # perfect dup: keep-first (common.py:88-90)
        ("i1", 100, "same caption"),
        ("i2", 100, "same caption"),
        # partial dup: conflicting key -> drop ALL (common.py:102-113)
        ("i3", 200, "caption A"),
        ("i4", 200, "caption B"),
        # unique
        ("i5", 300, "unique caption"),
        # conflicting key with an internal perfect pair: still all dropped
        ("i6", 400, "caption X"),
        ("i7", 400, "caption X"),
        ("i8", 400, "caption Y"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "phash", "caption"]))


def test_dup_reason_col(dedup_df):
    got = {r["image_id"]: r["dup_reason"]
           for r in dup_reason_col(dedup_df).collect()}
    assert got == {
        "i1": None,
        "i2": "duplicate_perfect",
        "i3": "duplicate_conflict",
        "i4": "duplicate_conflict",
        "i5": None,
        "i6": "duplicate_conflict",
        "i7": "duplicate_conflict",
        "i8": "duplicate_conflict",
    }


def test_deduplicate_cleaned(dedup_df):
    cleaned = deduplicate(dedup_df, partial_dup_cols=["phash"])
    kept = sorted(r["image_id"] for r in cleaned.collect())
    assert kept == ["i1", "i5"]


def test_deduplicate_report_and_counters(dedup_df):
    cleaned, dups_info, fmt = deduplicate(
        dedup_df, partial_dup_cols=["phash"],
        show_dup_info=True, return_format_data=True)
    info = {r["phash"]: (r["is_perfect_dups"], list(r["indexes"]))
            for r in dups_info.collect()}
    # one report row per duplicated key (common.py:115-121), flagged,
    # with the member-id list (common.py:123-131)
    # key 400 is MIXED ((k,X),(k,X),(k,Y)): the reference flags it
    # perfect (common.py:121 `isin(perfect_dups)` — any full-row dup
    # wins the flag even for a conflicting key)
    assert info == {
        100: (True, ["i1", "i2"]),
        200: (False, ["i3", "i4"]),
        400: (True, ["i6", "i7", "i8"]),
    }
    assert fmt == {
        "duplicate_validation_input": 8,
        "perfect_dups": 2,
        "partial_dups": 1,
        "validation_unique": 2,
    }


def test_multi_column_partial_key(spark):
    """common.py:107-113: multi-col keys group natively in Spark."""
    rows = [
        ("a", 1, "x", "p"),
        ("b", 1, "x", "q"),   # same (phash, caption), extra differs -> conflict
        ("c", 1, "y", "p"),   # different key (phash, caption)
        ("d", 2, "z", "r"),
        ("e", 2, "z", "r"),   # perfect dup of d
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "phash", "caption", "extra"]))
    cleaned = deduplicate(df, partial_dup_cols=["phash", "caption"])
    kept = sorted(r["image_id"] for r in cleaned.collect())
    assert kept == ["c", "d"]


def test_dedup_idempotent(spark, pairs_df):
    slim = pairs_df.select("image_id", "phash", "caption")
    once = deduplicate(slim, partial_dup_cols=["phash"])
    twice = deduplicate(once, partial_dup_cols=["phash"])
    assert once.count() == twice.count()


def test_deduplicate_with_validate(spark, pairs_df):
    """validate=True runs the decode gate before dedup (reference
    common.py:66-83): result equals validate-then-dedup composed by
    hand, and the gate's counters ride along in format_data."""
    from mehc_curation_spark.stages.validation import ValidationStage

    got, fmt = deduplicate(pairs_df, validate=True, return_format_data=True)
    manual_valid = ValidationStage(pairs_df).validate()
    exp = deduplicate(manual_valid)

    g = (got.select("image_id").toPandas()
         .sort_values("image_id").reset_index(drop=True))
    e = (exp.select("image_id").toPandas()
         .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(g, e)

    v = fmt["validation"]
    assert v["input"] == pairs_df.count()
    assert v["valid"] == manual_valid.count()
    assert v["input"] == v["valid"] + v["invalid"]
    assert fmt["duplicate_validation_input"] == v["valid"]
