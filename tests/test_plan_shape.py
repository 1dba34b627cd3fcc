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


def test_one_python_crossing(plan_str):
    """The ENTIRE narrow phase (decode, langid+ppl, heuristics, PII +
    toxicity scrubs, normalization) is ONE MapInArrow crossing — no
    ArrowEvalPython nodes may appear (a pandas UDF sneaking into the
    labels plan would add a second JVM<->Python round trip)."""
    tree = plan_str.split("\n\n")[0]
    n_arrow = sum("MapInArrow" in ln for ln in tree.splitlines())
    n_py = sum("ArrowEvalPython" in ln for ln in tree.splitlines())
    assert n_arrow == 1 and n_py == 0, plan_str


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


SF_DIR = "/root/testdata/sf0.01"


def test_q1_filter_pushed_to_scan(spark):
    """The shipdate predicate must reach the parquet scan as a
    PushedFilter, and the scan must read only the 6 needed columns."""
    import __spark_entry__ as entry_mod

    s = _formatted(entry_mod.q1_pricing_summary(spark, SF_DIR))
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_shipdate" in pushed[0], s
    rs = [ln for ln in s.splitlines() if "ReadSchema" in ln]
    assert rs and "l_comment" not in rs[0] and "l_orderkey" not in rs[0], s


def test_q3_q5_broadcast_small_dims(spark):
    """Small dimension sides must broadcast (no shuffle of lineitem
    for the dim joins): q3 broadcasts customer, q5 broadcasts
    customer/nation/region."""
    import __spark_entry__ as entry_mod

    s3 = _formatted(entry_mod.q3_top_revenue_orders(spark, SF_DIR))
    assert "BroadcastHashJoin" in s3, s3
    s5 = _formatted(entry_mod.q5_region_revenue(spark, SF_DIR))
    assert s5.count("BroadcastHashJoin") >= 3, s5


def test_lsh_paths_have_no_cartesian(spark):
    """Every LSH candidate generator must join through banded buckets —
    a CartesianProduct/BroadcastNestedLoop in the plan means the
    all-pairs scale-killer leaked in."""
    import __spark_entry__ as entry_mod

    for q in (entry_mod.doc_minhash_neardup, entry_mod.pairs_phash_neardup,
              entry_mod.doc_simhash_neardup, entry_mod.emb_near_dup_lsh):
        s = _formatted(q(spark, SF_DIR))
        assert "CartesianProduct" not in s, (q.__name__, s)
        assert "BroadcastNestedLoopJoin" not in s, (q.__name__, s)


def test_curate_narrow_stage_before_exchange(pairs_df):
    """The fused Arrow stage (ONE MapInArrow node — the whole narrow
    phase) must sit below the single exchange: caption bytes are
    consumed at the scan side, never shuffled."""
    s = _formatted(build_labels_plan(pairs_df, CurationConfig()))
    tree = s.split("\n\n")[0].splitlines()
    arrow_idx = [i for i, ln in enumerate(tree) if "MapInArrow" in ln]
    ex_idx = [i for i, ln in enumerate(tree) if "Exchange" in ln]
    assert len(arrow_idx) == 1 and ex_idx, s
    # formatted trees print top-down: the exchange appears ABOVE
    # (smaller index than) the Arrow stage feeding it
    assert min(ex_idx) < arrow_idx[0], s


def test_bench_replicate_preserves_dup_structure(spark):
    """The scaling bench's deterministic row replication must keep the
    planted-duplicate structure per replica (equal phashes stay equal
    within a replica, ids stay globally distinct) — the property that
    makes the replicated corpus a fair proxy workload."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    df = spark.read.parquet(bench.pairs_path(4096))
    rep = bench._load_pairs(spark, 4096, replicate=3)
    n = df.count()
    assert rep.count() == 3 * n
    assert rep.select("image_id").distinct().count() == 3 * n
    # per-replica phash group sizes match the original's
    from pyspark.sql import functions as F

    orig_hist = sorted(r["c"] for r in df.groupBy("phash")
                       .agg(F.count("*").alias("c")).collect())
    for k in range(3):
        sub = rep.filter(F.col("image_id").endswith(f"_{k}"))
        hist = sorted(r["c"] for r in sub.groupBy("phash")
                      .agg(F.count("*").alias("c")).collect())
        assert hist == orig_hist, k
