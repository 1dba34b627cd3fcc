"""Round-3 dedup fixes: the rejected export reconciles with
validate=True, and the standalone dedup report renders."""

import pandas as pd
from pyspark.sql import functions as F

from mehc_curation_spark.io.reports import render_dedup_report
from mehc_curation_spark.operators.dedup import DUP_REASON_COL, deduplicate


def test_rejected_export_includes_validation_drops(spark, pairs_df):
    """ADVICE r2: with validate=True + return_rejected=True, rows the
    decode gate dropped must appear in the rejected export (labeled
    with their decode reason) — previously they were in neither
    output."""
    from mehc_curation_spark.stages.validation import ValidationStage

    cleaned, fmt, rejected = deduplicate(
        pairs_df, validate=True, return_format_data=True,
        return_rejected=True)
    n_in = pairs_df.count()
    n_valid = ValidationStage(pairs_df).validate().count()
    n_cleaned, n_rejected = cleaned.count(), rejected.count()
    # full reconciliation: every input row lands in exactly one output
    assert n_cleaned + n_rejected == n_in
    reasons = {r[DUP_REASON_COL] for r in
               rejected.select(DUP_REASON_COL).distinct().collect()}
    decode_reasons = reasons - {"duplicate_perfect", "duplicate_conflict"}
    assert decode_reasons  # the gate's drops are present, with causes
    n_gate = rejected.filter(
        ~F.col(DUP_REASON_COL).isin("duplicate_perfect",
                                    "duplicate_conflict")).count()
    assert n_gate == n_in - n_valid == fmt["validation"]["invalid"]
    # and the dedup-labeled part matches the validate-then-dedup path
    assert fmt["duplicate_validation_input"] == n_valid


def test_rejected_export_without_validate_unchanged(spark, pairs_df):
    slim = pairs_df.select("image_id", "phash", "caption")
    cleaned, rejected = deduplicate(slim, partial_dup_cols=["phash"],
                                    return_rejected=True)
    assert cleaned.count() + rejected.count() == slim.count()
    reasons = {r[DUP_REASON_COL] for r in
               rejected.select(DUP_REASON_COL).distinct().collect()}
    assert reasons <= {"duplicate_perfect", "duplicate_conflict"}


def test_render_dedup_report(spark):
    rows = [(1, 7, "a"), (2, 7, "a"), (3, 8, "b"), (4, 8, "c"), (5, 9, "d")]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    cleaned, fmt = deduplicate(df, partial_dup_cols=["phash"],
                               return_format_data=True)
    report = render_dedup_report(fmt)
    assert "DEDUPLICATION" in report
    assert f"Number of input rows:          {fmt['duplicate_validation_input']}" in report
    assert f"Number of unique rows kept:    {fmt['validation_unique']}" in report
    assert str(fmt["perfect_dups"]) in report


def test_deduplicate_get_report_flag(spark, capsys):
    """get_report=True appends (and print_logs prints) the rendered
    standalone report, mirroring the reference's in-call rendering
    (common.py:140-186)."""
    rows = [(1, 7, "a"), (2, 7, "a"), (3, 9, "d")]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    cleaned, report = deduplicate(df, partial_dup_cols=["phash"],
                                  get_report=True, print_logs=True)
    assert "DEDUPLICATION" in report
    assert "Number of input rows:          3" in report
    assert report in capsys.readouterr().out
    assert cleaned.count() == 2


class TestExactContentDedup:
    """exact_content_dedup: binary-payload exact dedup on an md5
    digest surrogate — slim shuffle, null-safe, keep-first by id."""

    def _df(self, spark):
        rows = [
            ("a", bytearray(b"\x01\x02")),
            ("b", bytearray(b"\x01\x02")),   # dup of a
            ("c", bytearray(b"\x03")),
            ("d", None),                     # nulls are never dups
            ("e", None),
            ("f", bytearray(b"\x01\x02")),   # dup of a,b
        ]
        return spark.createDataFrame(rows, "image_id string, bytes binary")

    def test_labels(self, spark):
        from mehc_curation_spark.operators.dedup import exact_content_dedup

        got = {r.image_id: (r.grp_n, r.keep)
               for r in exact_content_dedup(self._df(spark)).collect()}
        assert got == {"a": (3, True), "b": (3, False), "c": (1, True),
                       "d": (1, True), "e": (1, True), "f": (3, False)}

    def test_single_exchange_and_no_bytes_shuffle(self, spark):
        import contextlib
        import io as _io

        from mehc_curation_spark.operators.dedup import exact_content_dedup

        out = exact_content_dedup(self._df(spark))
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        tree = buf.getvalue()
        exchanges = [ln for ln in tree.splitlines() if "Exchange" in ln]
        assert len(exchanges) == 1, tree
        # the digest, not the payload, is the shuffle key
        assert "_digest" in exchanges[0]
