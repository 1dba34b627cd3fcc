"""Physical-plan shape assertions — the scale story, checked in CI.

At 100 TB the difference between 1 and 3 shuffles of the slim label
stream is the job's cost; these tests pin the plan shape so a refactor
can't silently regress it.
"""

import io
import contextlib

import pytest

from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.stages.plan import build_labels_plan


def _formatted(plan) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plan_str(pairs_df):
    return _formatted(build_labels_plan(pairs_df, CurationConfig()))


def test_single_exchange(plan_str):
    """All three dedup passes must share ONE hash exchange on phash."""
    tree = plan_str.split("\n\n")[0]
    n_exchange = sum("Exchange" in ln for ln in tree.splitlines())
    assert n_exchange == 1, plan_str


def test_exchange_is_on_phash(plan_str):
    assert "hashpartitioning(phash" in plan_str


def test_one_python_eval_per_udf(plan_str):
    """decode+langid fuse into one Arrow eval; toxicity and normalize
    are one each — struct fields must not re-trigger evaluation."""
    tree = plan_str.split("\n\n")[0]
    n_py = sum("ArrowEvalPython" in ln for ln in tree.splitlines())
    assert n_py <= 3, plan_str


def test_bytes_not_read_when_validation_off(pairs_df):
    """Column pruning: with the decode gate off, the scan must not read
    the binary column at all (ReadSchema excludes `bytes`)."""
    cfg = CurationConfig(validate=False)
    s = _formatted(build_labels_plan(pairs_df, cfg))
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln]
    assert read_schema and "bytes" not in read_schema[0], s


def test_no_sort_outside_windows(plan_str):
    """Sorts only serve the dedup windows (6 windows -> <=6 sorts)."""
    tree = plan_str.split("\n\n")[0]
    n_sort = sum(ln.strip().startswith("+- Sort") or ln.strip().startswith("Sort")
                 for ln in tree.splitlines())
    assert n_sort <= 6, plan_str


def test_bucket_partition_pruning(spark, tmp_path, pairs_df):
    """Scale story: the curated output is hive-partitioned on
    bucket=pmod(phash,B); a single-bucket read must prune the scan to
    that bucket's files (PartitionFilters, not a post-scan filter)."""
    from mehc_curation_spark.rules.registry import CurationConfig
    from mehc_curation_spark.stages.refinement import run_curate

    inp = str(tmp_path / "pairs.parquet")
    pairs_df.write.parquet(inp)
    out = str(tmp_path / "out")
    run_curate(spark, inp, out, CurationConfig(phash_buckets=8))
    df = spark.read.parquet(f"{out}/data").filter("bucket = 3")
    s = _formatted(df)
    pf = [ln for ln in s.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0], s
    # the filter reached the scan: no rows from other buckets survive
    assert df.select("bucket").distinct().collect()[0]["bucket"] == 3
