"""Plan-shape assertions for the round-3 operators — pins each one's
shuffle budget so a refactor can't silently regress the scale story."""

import contextlib
import io

from pyspark.sql import functions as F


def _formatted(plan) -> str:
    """Simple-mode physical plan: one line per node with inline
    arguments (formatted mode splits arguments into a details section,
    which makes per-node key assertions awkward)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain()
    return buf.getvalue()


def _tree(plan) -> str:
    return _formatted(plan)


def _count(tree: str, token: str) -> int:
    return sum(token in ln for ln in tree.splitlines())


def _docs(spark, n=50):
    rows = [(i, "en" if i % 3 else "de",
             " ".join(f"w{i}_{j}" for j in range(i % 30 + 1)))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_chunking_has_no_exchange(spark):
    """Chunking is row-parallel: explode + slice, zero shuffles."""
    from mehc_curation_spark.operators.chunking import chunk_documents

    tree = _tree(chunk_documents(_docs(spark), "doc_id", "text",
                                 chunk_tokens=8, overlap=2))
    assert _count(tree, "Exchange") == 0, tree


def test_alignment_has_no_exchange_and_no_python(spark):
    """The CLIP-filter is pure column arithmetic: no shuffle, no
    Python eval node."""
    from mehc_curation_spark.operators.similarity import alignment_filter

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0])],
        "id long, va array<float>, vb array<float>")
    tree = _tree(alignment_filter(df, "va", "vb"))
    assert _count(tree, "Exchange") == 0, tree
    assert _count(tree, "ArrowEvalPython") == 0, tree
    assert _count(tree, "BatchEvalPython") == 0, tree


def test_token_budget_shuffles_only_on_stratum_bucket(spark):
    """Two-level cumulative sum: the bucket aggregate and the
    per-(stratum, bucket) window share the SAME partitioning key, the
    bucket-base map comes back as a broadcast join, and no exchange may
    partition on the stratum alone (that would be the whole-stratum
    sort this formulation exists to avoid)."""
    from mehc_curation_spark.operators.sampling import token_budget_sample

    import re

    plan = token_budget_sample(_docs(spark), "doc_id", "lang", "text",
                               {"en": 100, "de": 50})
    s = _formatted(plan)
    assert _count(s, "BroadcastHashJoin") == 1, s
    keys = [m.group(1)
            for m in re.finditer(r"hashpartitioning\(([^)]*)\)", s)]
    # the stratum key is the null-safe `_strat` surrogate
    # (coalesce(lang, sentinel) — NULL strata fix), not raw `lang`
    both = [k for k in keys if "_strat" in k and "_bkt" in k]
    strat_only = [k for k in keys if "_strat" in k and "_bkt" not in k]
    # raw rows shuffle on (stratum, bucket) twice (bucket aggregate +
    # running-sum window); exactly ONE stratum-only exchange exists and
    # it feeds the window over the TINY per-bucket aggregate, never the
    # full data — pinned by it living on the aggregate branch
    assert len(both) == 2 and len(strat_only) == 1, s
    lines = s.splitlines()
    idx = next(i for i, ln in enumerate(lines)
               if "hashpartitioning" in ln and "_strat" in ln
               and "_bkt" not in ln)
    assert any("HashAggregate" in ln for ln in lines[idx:idx + 3]), s


def test_semdedup_single_cell_exchange(spark):
    """One shuffle on the cell id feeds the in-cell GEMM stage; the
    only other exchange allowed is the quantizer's tiny training
    sample collect (a LocalLimit/CollectLimit, not a hash exchange on
    the full data)."""
    from mehc_curation_spark.operators.similarity import semdedup

    rows = [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tree = _tree(semdedup(df, "embedding", "vec_id",
                          threshold=0.9, n_cells=4))
    hash_ex = [ln for ln in tree.splitlines()
               if "Exchange hashpartitioning" in ln]
    assert len(hash_ex) == 1 and "_ivf_cell" in hash_ex[0], tree


def test_pack_chunks_single_shard_exchange(spark):
    from mehc_curation_spark.operators.chunking import pack_chunks

    df = spark.createDataFrame([(f"u{i}", i % 9 + 1) for i in range(40)],
                               "uid string, n_tok long")
    tree = _tree(pack_chunks(df, "uid", "n_tok", seq_tokens=16))
    hash_ex = [ln for ln in tree.splitlines()
               if "Exchange hashpartitioning" in ln]
    assert len(hash_ex) == 1 and "_shard" in hash_ex[0], tree


def test_line_dedup_exchange_budget(spark):
    """Line dedup pays for: the md5-key aggregate, the winner join
    back, and the per-doc reassembly — every exchange keyed on the
    slim hash or the doc id, never on raw line text."""
    from mehc_curation_spark.operators.similarity import line_dedup

    tree = _tree(line_dedup(_docs(spark), "doc_id", "text"))
    hash_ex = [ln for ln in tree.splitlines()
               if "Exchange hashpartitioning" in ln]
    assert 0 < len(hash_ex) <= 4, tree
    for ln in hash_ex:
        assert "_h" in ln or "_id" in ln, tree
    assert _count(tree, "hashpartitioning(_line") == 0, tree


def test_bpe_round_is_partial_agg_plus_takeordered(spark):
    """One BPE merge round must plan as map-combinable aggregation
    (partial+final HashAggregate on the pair key) feeding
    TakeOrderedAndProject(limit=1) — never a full sort of the pair
    table, never more than one row to the driver."""
    from mehc_curation_spark.operators.vocab import tokens_col

    words = (_docs(spark)
             .select(F.explode(tokens_col(F.col("text"))).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("freq"))
             .withColumn("syms", F.split("w", "(?<=.)(?=.)"))
             .select("freq", "syms"))
    pairs = words.select("freq", F.explode(F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (x, i) -> struct(x AS a, syms[i + 1] AS b))")).alias("p"))
    best = (pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))
            .filter(F.col("cnt") >= 2)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1))
    tree = _tree(best)
    assert "TakeOrderedAndProject(limit=1" in tree, tree
    assert _count(tree, "HashAggregate") >= 4, tree  # partial+final x2
    assert "Sort [" not in tree.replace(
        "TakeOrderedAndProject", ""), tree  # no global sort node


def test_url_canonicalization_no_exchange_no_python(spark):
    """Canonicalization rides the scan: zero shuffles, zero Python."""
    from mehc_curation_spark.operators.urls import canonicalize_url_col

    df = spark.createDataFrame([(1, "https://a.com/x")],
                               "id long, url string")
    tree = _tree(df.select(canonicalize_url_col(F.col("url"))))
    assert _count(tree, "Exchange") == 0
    assert _count(tree, "Python") == 0 and _count(tree, "Arrow") == 0


def test_url_dedup_single_exchange_no_join(spark):
    """Keep-first per canonical url = EXACTLY one hash-agg exchange
    (min(struct(id, rest)) with map-side partial combine) and NO join
    — an agg-then-semi-join would shuffle the corpus twice against a
    corpus-sized keeper set."""
    from mehc_curation_spark.operators.urls import url_dedup

    df = spark.createDataFrame(
        [(i, f"https://s{i % 3}.com/p") for i in range(50)],
        "id long, url string")
    tree = _tree(url_dedup(df, "url", "id"))
    assert _count(tree, "Exchange") == 1
    assert _count(tree, "Join") == 0
    assert _count(tree, "partial_min") >= 1


def test_html_extraction_no_exchange_no_python(spark):
    from mehc_curation_spark.operators.html import extract_text_col

    df = spark.createDataFrame([(1, "<p>x</p>")], "id long, html string")
    tree = _tree(df.select(extract_text_col(F.col("html"))))
    assert _count(tree, "Exchange") == 0
    assert _count(tree, "Python") == 0 and _count(tree, "Arrow") == 0


def test_optout_literal_path_no_exchange(spark):
    """Under the literal threshold the gate is a pure filter on the
    scan — no join, no shuffle, no Python."""
    from mehc_curation_spark.operators.compliance import apply_optout

    df = spark.createDataFrame([(1, "https://a.com/x")],
                               "id long, url string")
    opt = spark.createDataFrame([("a.com",)], "domain string")
    tree = _tree(apply_optout(df, "url", opt))
    assert _count(tree, "Exchange") == 0
    assert _count(tree, "Python") == 0 and _count(tree, "Arrow") == 0


def test_zorder_layout_single_range_exchange(spark):
    """The clustered rewrite pays exactly ONE range exchange."""
    from mehc_curation_spark.operators.zorder import zorder_layout

    df = spark.createDataFrame([(i, i % 7) for i in range(100)],
                               "x long, y long")
    tree = _tree(zorder_layout(df, ["x", "y"], 4,
                               ranges=[(0, 99), (0, 6)]))
    assert _count(tree, "Exchange") == 1
    assert "rangepartitioning" in tree.lower()
    assert _count(tree, "Python") == 0 and _count(tree, "Arrow") == 0


def test_edit_dups_shuffles_only_prefix_key(spark):
    """Both self-join sides shuffle on the blocking prefix only; the
    threshold-bounded levenshtein is evaluated INSIDE the join (no
    post-join filter pass), and no Python node appears. AQE collapses
    the two identical side subtrees into one exchange + reuse at
    runtime."""
    from mehc_curation_spark.operators.similarity import edit_distance_dups

    tree = _tree(edit_distance_dups(_docs(spark)))
    ex = [ln for ln in tree.splitlines()
          if "Exchange hashpartitioning" in ln]
    assert len(ex) == 2 and all("_pfx" in ln for ln in ex), tree
    join_lines = [ln for ln in tree.splitlines() if "Join" in ln]
    assert any("levenshtein" in ln for ln in join_lines), tree
    assert _count(tree, "EvalPython") == 0, tree


def test_length_outliers_broadcasts_group_stats(spark):
    """The per-group median/MAD tables join back via broadcast — the
    full corpus never shuffles; the only exchanges are the
    small-cardinality group aggregations."""
    from mehc_curation_spark.operators.text_stats import length_outliers

    tree = _tree(length_outliers(_docs(spark)))
    assert _count(tree, "BroadcastHashJoin") == 3, tree
    assert _count(tree, "SortMergeJoin") == 0, tree
    ex = [ln for ln in tree.splitlines()
          if "Exchange hashpartitioning" in ln]
    assert all("lang" in ln for ln in ex), tree


def test_payload_transforms_have_no_exchange(spark):
    """resize / crop / color stats are embarrassingly parallel: one
    MapInPandas (Arrow) stage, zero shuffles — the payload crosses the
    JVM->Python boundary once and never moves between executors."""
    from mehc_curation_spark.operators.multimodal import (
        crop_borders,
        image_color_stats,
        resize_images,
    )

    pairs = spark.createDataFrame(
        [("a", b"\x00" * 16, 2, 2, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    for op in (lambda d: resize_images(d, target=8),
               crop_borders, image_color_stats):
        tree = _tree(op(pairs))
        assert _count(tree, "Exchange") == 0, tree
        assert _count(tree, "MapInPandas") == 1, tree


def test_dsir_score_no_exchange_no_python(spark):
    """DSIR scoring is a plan-literal weight lookup + array aggregate:
    pure codegen — zero shuffles, zero Python eval nodes."""
    from mehc_curation_spark.operators.sampling import dsir_score_col

    tree = _tree(_docs(spark).select(
        "doc_id", dsir_score_col(F.col("text"), [1] * 64).alias("s")))
    assert _count(tree, "Exchange") == 0, tree
    assert _count(tree, "ArrowEvalPython") == 0, tree
    assert _count(tree, "BatchEvalPython") == 0, tree


def test_dsir_resample_takeordered_no_global_sort(spark):
    """The Gumbel-top-n cut must compile to TakeOrderedAndProject
    (per-partition heaps), never a global Sort + Limit."""
    from mehc_curation_spark.operators.sampling import dsir_resample

    tree = _tree(dsir_resample(_docs(spark), "text", "doc_id",
                               [1] * 64, n=5))
    assert _count(tree, "TakeOrderedAndProject") == 1, tree
    assert _count(tree, "Exchange") == 0, tree


def test_pq_adc_scan_no_shuffle_single_takeordered(spark):
    """The PQ candidate cut: encode + ADC are Arrow map stages over a
    narrow plan; the refine cut is TakeOrderedAndProject; the only
    shuffle in the whole top-k is the final k-row ordering inside
    cosine_topk's own cut."""
    import numpy as np

    from mehc_curation_spark.operators.pq import pq_topk

    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = pq_topk(df, "embedding", "vec_id", rows[0][1], k=5, m=2,
                   n_codes=4, refine=20)
    tree = _tree(plan)
    assert _count(tree, "TakeOrderedAndProject") == 2, tree  # refine + k
    assert _count(tree, "Exchange") == 0, tree


def test_metadata_audit_and_strip_no_exchange(spark):
    """Payload-metadata ops are single Arrow stages over the bytes
    column: no shuffle anywhere."""
    from mehc_curation_spark.operators.imgmeta import (
        image_metadata_audit,
        strip_image_metadata,
    )

    df = spark.createDataFrame(
        [("a", b"\x00", "raw")], "image_id string, bytes binary, fmt string")
    assert _count(_tree(image_metadata_audit(df)), "Exchange") == 0
    assert _count(_tree(strip_image_metadata(df)), "Exchange") == 0


def test_category_drift_plan_budget(spark):
    """category_drift: the per-side pooled counts run as
    map-combinable hash aggregates with an isin CASE against the
    driver-collected top-k (no join anywhere), and the returned frame
    is local arithmetic — no join, no window, no Python in its plan
    either."""
    from mehc_curation_spark.operators.profile import category_drift

    d = _docs(spark, 60)
    tree = _tree(category_drift(d, d, "lang", top_k=3))
    assert _count(tree, "Join") == 0, tree
    assert _count(tree, "Window") == 0, tree
    assert _count(tree, "ArrowEvalPython") == 0, tree


def test_label_shift_single_join_no_python(spark):
    """label_shift: one join on the id, one two-column hash
    aggregate; the share window runs over the tiny matrix, and
    nothing crosses into Python."""
    from mehc_curation_spark.operators.profile import label_shift

    d = _docs(spark, 60).select(
        "doc_id", F.when(F.col("lang") == "en", "keep").alias("label"))
    tree = _tree(label_shift(d, d, "doc_id", "label"))
    joins = (_count(tree, "SortMergeJoin")
             + _count(tree, "BroadcastHashJoin")
             + _count(tree, "ShuffledHashJoin"))
    assert joins == 1, tree
    assert _count(tree, "ArrowEvalPython") == 0, tree
    assert _count(tree, "BatchEvalPython") == 0, tree


def test_leakage_safe_split_no_python_no_window(spark):
    """leakage_safe_split beyond the component loop: the label
    join-back is one join and the split itself is pure Catalyst
    (hash + CASE) — no Python eval, no window, no extra exchange on
    the data rows beyond the join."""
    from mehc_curation_spark.operators.sampling import leakage_safe_split

    d = _docs(spark, 40)
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = leakage_safe_split(d, edges, "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1})
    tree = _tree(out)
    assert _count(tree, "ArrowEvalPython") == 0, tree
    assert _count(tree, "BatchEvalPython") == 0, tree
    assert _count(tree, "Window") == 0, tree


def test_rule_ablation_single_aggregate_no_join(spark):
    """rule_ablation folds every flag and overlap term into ONE
    map-combinable aggregate over a single scan: no join, no window,
    no Python."""
    from mehc_curation_spark.operators.profile import rule_ablation

    d = _docs(spark, 40)
    tree = _tree(rule_ablation(d, {
        "short": F.length("text") < 20,
        "de": F.col("lang") == "de"}))
    assert _count(tree, "Join") == 0, tree
    assert _count(tree, "Window") == 0, tree
    assert _count(tree, "ArrowEvalPython") == 0, tree
    assert _count(tree, "HashAggregate") >= 1, tree


def test_threshold_sweep_one_rowlevel_exchange(spark):
    """threshold_sweep: rows collapse via ONE partial-aggregable
    hash aggregate (one row-level exchange on (group, bin)); the
    cumulative windows run over the aggregated minority. Pin: exactly
    2 hash exchanges total (agg + window regroup), no Python."""
    from mehc_curation_spark.operators.profile import threshold_sweep

    d = _docs(spark).withColumn("_y", F.col("doc_id") % 2 == 0)
    tree = _tree(threshold_sweep(d, "doc_id", "_y", lo=0.0, hi=50.0,
                                 n_bins=10, group_col="lang"))
    ex = [ln for ln in tree.splitlines()
          if "Exchange hashpartitioning" in ln]
    assert len(ex) == 2, tree
    # the row-level aggregate is partial (map-side combine present)
    assert _count(tree, "partial_count") >= 1 or \
        _count(tree, "HashAggregate") >= 2, tree
    assert "Python" not in tree and "BatchEvalPython" not in tree


def test_calibration_report_single_exchange_no_python(spark):
    from mehc_curation_spark.operators.profile import calibration_report

    d = _docs(spark).withColumn(
        "_p", (F.col("doc_id") % 97) / F.lit(97.0)).withColumn(
        "_y", F.col("doc_id") % 2 == 0)
    tree = _tree(calibration_report(d, "_p", "_y", n_bins=10))
    assert _count(tree, "Exchange") == 1, tree
    assert "Python" not in tree


def test_auc_report_no_rowlevel_window(spark):
    """auc_report: the ONLY row-level shuffle is the per-(group,
    score) aggregate; every Window node runs over the aggregated
    frame (its partitioning keys are the group, never per-row)."""
    from mehc_curation_spark.operators.profile import auc_report

    d = _docs(spark).withColumn("_y", F.col("doc_id") % 2 == 0)
    tree = _tree(auc_report(d, "doc_id", "_y", group_col="lang"))
    ex = [ln for ln in tree.splitlines()
          if "Exchange hashpartitioning" in ln]
    # one row-level agg exchange on (lang, score) + one regroup of the
    # aggregated rows onto (lang) for the windows
    assert len(ex) == 2, tree
    assert "Python" not in tree
