"""Checkpoint/resume + ledger + report tests (SURVEY.md §5.2 items 5-6).

The resume unit is a phash bucket (pmod(phash, B)): every pipeline
operation is per-row or grouped by phash, so buckets are independent —
killing after k buckets and resuming must reproduce the exact output
of an uninterrupted run.
"""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.ledger import Ledger
from mehc_curation_spark.io.reports import render_report
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.stages.refinement import run_curate

CFG = CurationConfig(phash_buckets=8)


@pytest.fixture(scope="module")
def input_path(pairs_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("resume") / "pairs_in")
    pairs_df.write.mode("overwrite").parquet(p)
    return p


def _read_labels(spark, out):
    return (spark.read.parquet(os.path.join(out, "data"))
            .toPandas().sort_values("image_id").reset_index(drop=True))


def test_run_and_ledger(spark, input_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume") / "labels_full")
    m = run_curate(spark, input_path, out, CFG)
    assert m["rows"] == 2000
    led = Ledger(out).read()
    assert len(led["buckets"]) == CFG.phash_buckets
    # ledger row counts match the data
    labels = _read_labels(spark, out)
    by_bucket = labels.groupby(labels["phash"].mod(CFG.phash_buckets)).size()
    for b, entry in led["buckets"].items():
        assert entry["rows"] == int(by_bucket.loc[int(b)])
        assert entry["kept"] + sum(entry["dropped"].values()) == entry["rows"]


def test_resume_after_partial_run(spark, input_path, tmp_path_factory):
    """Run buckets {0,1,2} only (simulated crash), then resume; final
    output must equal a clean full run."""
    full_out = str(tmp_path_factory.mktemp("resume") / "full")
    run_curate(spark, input_path, full_out, CFG)
    full = _read_labels(spark, full_out)

    part_out = str(tmp_path_factory.mktemp("resume") / "partial")
    # simulate a failed run: curate only a bucket range by pre-filtering
    df = spark.read.parquet(input_path)
    sub_in = str(tmp_path_factory.mktemp("resume") / "subset")
    df.filter(F.pmod(F.col("phash"), F.lit(CFG.phash_buckets)) < 3) \
      .write.parquet(sub_in)
    run_curate(spark, sub_in, part_out, CFG)
    assert len(Ledger(part_out).completed_buckets()) == 3

    # resume with the full input: only buckets 3..7 are recomputed
    m = run_curate(spark, input_path, part_out, CFG, resume=True)
    assert sorted(m["buckets_new"]) == [3, 4, 5, 6, 7]
    resumed = _read_labels(spark, part_out)
    pd.testing.assert_frame_equal(
        resumed.reset_index(drop=True), full.reset_index(drop=True))


def test_resume_noop_when_complete(spark, input_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume") / "noop")
    m1 = run_curate(spark, input_path, out, CFG)
    m2 = run_curate(spark, input_path, out, CFG, resume=True)
    assert m2["rows"] == 0 and m2["buckets_new"] == []
    # metrics dict schema is identical between a real run and a no-op
    assert set(m2) == set(m1)
    assert m2["snapshot_version"] == m1["snapshot_version"]
    assert m2["lang_stats"] == m1["lang_stats"]


def test_resume_lang_stats_cover_whole_table(spark, input_path,
                                             tmp_path_factory):
    """After a partial run + resume, the published lang_stats must
    describe the WHOLE committed table, not just the resumed subset
    (regression: write_aux used to overwrite with this-run-only sums)."""
    full_out = str(tmp_path_factory.mktemp("resume") / "ls_full")
    m_full = run_curate(spark, input_path, full_out, CFG)

    part_out = str(tmp_path_factory.mktemp("resume") / "ls_part")
    sub_in = str(tmp_path_factory.mktemp("resume") / "ls_subset")
    df = spark.read.parquet(input_path)
    df.filter(F.pmod(F.col("phash"), F.lit(CFG.phash_buckets)) < 3) \
      .write.parquet(sub_in)
    run_curate(spark, sub_in, part_out, CFG)
    m_res = run_curate(spark, input_path, part_out, CFG, resume=True)

    assert set(m_res["lang_stats"]) == set(m_full["lang_stats"])
    for lang, e in m_full["lang_stats"].items():
        r = m_res["lang_stats"][lang]
        assert r["rows"] == e["rows"] and r["kept"] == e["kept"], (lang, r, e)
        assert abs(r["ppl_sum"] - e["ppl_sum"]) <= 1e-6 * max(1.0, e["ppl_sum"])
    # the published aux file carries the merged numbers too
    assert Ledger(part_out).read_aux("lang_stats.json") == m_res["lang_stats"]


def test_report_golden(spark, input_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume") / "report")
    run_curate(spark, input_path, out, CFG)
    led = Ledger(out).read()
    reasons: dict[str, int] = {}
    total = 0
    for e in led["buckets"].values():
        total += e["rows"]
        for k, v in e["dropped"].items():
            reasons[k] = reasons.get(k, 0) + v
    rep = render_report(reasons, total, CFG)
    assert "Input rows:              2000" in rep
    assert "perfect duplicates:" in rep.lower() or "perfect duplicates:" in rep
    # deterministic: same fixture => identical report text
    rep2 = render_report(reasons, total, CFG)
    assert rep == rep2


def test_snapshot_lineage_over_commits(spark, input_path, tmp_path_factory):
    """Each run_curate commit publishes a SnapshotTable manifest:
    time travel sees the partial-run state, the current snapshot sees
    everything, and the bucket partition column survives reads."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    out = str(tmp_path_factory.mktemp("resume") / "snap")
    sub_in = str(tmp_path_factory.mktemp("resume") / "snap_subset")
    df = spark.read.parquet(input_path)
    df.filter(F.pmod(F.col("phash"), F.lit(CFG.phash_buckets)) < 3) \
      .write.parquet(sub_in)
    m1 = run_curate(spark, sub_in, out, CFG)
    m2 = run_curate(spark, input_path, out, CFG, resume=True)
    assert m1["snapshot_version"] == 1 and m2["snapshot_version"] == 2

    t = SnapshotTable(out)
    v1 = t.read(spark, version=1)
    v2 = t.read(spark)
    assert set(r["bucket"] for r in v1.select("bucket").distinct().collect()) \
        == {0, 1, 2}
    assert v2.count() == 2000
    assert set(r["bucket"] for r in v2.select("bucket").distinct().collect()) \
        == set(range(CFG.phash_buckets))


def test_stage_reports_golden(spark, pairs_df):
    """Per-stage report renderers (reference template granularity:
    one numbered {input, bad, good} section per step)."""
    from mehc_curation_spark.io.reports import (
        render_cleaning_report,
        render_normalization_report,
        render_validation_report,
    )
    from mehc_curation_spark.stages.cleaning import CleaningStage
    from mehc_curation_spark.stages.normalization import NormalizationStage
    from mehc_curation_spark.stages.validation import ValidationStage

    _, vm = ValidationStage(pairs_df).complete_validation(True)
    vr = render_validation_report(vm)
    assert "1. VALIDATION" in vr and "0. DECODE CHECK" in vr
    assert f"Number of input captions: {vm['validate']['input']}" in vr
    assert f"Number of undecodable images: {vm['validate']['invalid']}" in vr
    # chained: each step's input == previous step's valid
    assert vm["rm_low_quality"]["input"] == vm["validate"]["valid"]
    for num, key in (("1.1", "rm_low_quality"), ("1.2", "rm_unknown_lang"),
                     ("1.3", "rm_high_ppl")):
        assert f"{num}." in vr and str(vm[key]["invalid"]) in vr

    _, cm = CleaningStage(pairs_df).complete_cleaning("mask", True)
    cr = render_cleaning_report(cm)
    assert "2. CLEANING" in cr and "2.1. PII SCRUB" in cr
    assert "2.2. TOXICITY SCRUB" in cr
    assert f"PII hits: {cm['scrub_pii']['pii_hits']}" in cr
    assert f"unprocessable captions: {cm['scrub_toxicity']['unprocessable']}" in cr

    _, nm = NormalizationStage(pairs_df).complete_normalization(True)
    nr = render_normalization_report(nm)
    assert "3. NORMALIZATION" in nr
    assert f"lossy-normalized captions: {nm['normalized_lossy']}" in nr
    assert f"canonicalized captions: {nm['normalized_canonical']}" in nr

    # deterministic goldenness: same inputs -> byte-identical text
    assert vr == render_validation_report(vm)
    assert cr == render_cleaning_report(cm)
    assert nr == render_normalization_report(nm)


def test_no_resume_rerun_does_not_double_lang_stats(spark, input_path,
                                                    tmp_path_factory):
    """Re-running with resume=False over an existing output recomputes
    every bucket; the published lang_stats must describe the table
    once, not prior+current summed (round-2 review regression)."""
    out = str(tmp_path_factory.mktemp("resume") / "norsum")
    m1 = run_curate(spark, input_path, out, CFG)
    m2 = run_curate(spark, input_path, out, CFG, resume=False)
    for lang, e in m1["lang_stats"].items():
        r = m2["lang_stats"][lang]
        assert r["rows"] == e["rows"] and r["kept"] == e["kept"], (lang, r, e)


def test_no_resume_rerun_snapshot_readable(spark, input_path,
                                           tmp_path_factory):
    """A resume=False rerun physically replaces every bucket's files;
    the new snapshot must replace (not append to) the parent's entries
    for those buckets, or it references deleted files (regression for
    the stale-entry append)."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    out = str(tmp_path_factory.mktemp("resume") / "snapread")
    run_curate(spark, input_path, out, CFG)
    m2 = run_curate(spark, input_path, out, CFG, resume=False)
    assert m2["snapshot_version"] == 2
    t = SnapshotTable(out)
    # the latest snapshot reads cleanly and covers the whole table
    assert t.read(spark).count() == 2000
    # and no manifest entry points at a missing file
    for f in t.manifest()["files"]:
        assert os.path.exists(os.path.join(out, "data", f)), f
