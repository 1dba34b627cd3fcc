"""Round-3 similarity additions: arbitrary-k shingle mixing, vectorized
simhash, the O(n^2) guard, single-pass shingling, deterministic IVF and
the batched ANN kNN join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import (
    _pos_mix,
    _shingle_hashes_np,
    ann_join,
    embedding_near_dups_exact,
    ivf_index,
    ivf_topk,
    minhash_near_dups,
    minhash_signatures,
    shingle_table,
    simhash64_udf,
)


# ---------------------------------------------------------------------------
# _pos_mix (ADVICE r2: k > 8 reused multipliers every 8 positions)
# ---------------------------------------------------------------------------

def test_pos_mix_k_le_8_unchanged():
    # hash stability: default/typical k keeps the original constants
    assert _pos_mix(3) == _pos_mix(8)[:3]
    assert _pos_mix(1)[0] == 0x9E3779B97F4A7C15


def test_pos_mix_k_gt_8_all_distinct_and_odd():
    mix = _pos_mix(32)
    assert len(set(mix)) == 32
    assert all(m % 2 == 1 for m in mix)


def test_k10_swap_8_apart_no_longer_collides():
    toks = [f"t{i}" for i in range(10)]
    swapped = toks[:]
    swapped[0], swapped[8] = swapped[8], swapped[0]
    ha = _shingle_hashes_np(" ".join(toks), 10)
    hb = _shingle_hashes_np(" ".join(swapped), 10)
    assert ha[0] != hb[0]


# ---------------------------------------------------------------------------
# vectorized simhash == scalar reference implementation
# ---------------------------------------------------------------------------

def _simhash_scalar(t):
    """The r2 per-token-loop implementation, kept as the test oracle."""
    import hashlib

    if not isinstance(t, str) or not t.strip():
        return 0
    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in t.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        bits = ((np.uint64(h) >> shifts) & np.uint64(1)).astype(np.int64)
        votes += 2 * bits - 1
    val = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            val |= np.uint64(1) << np.uint64(b)
    return int(val.astype(np.int64))


def test_simhash_vectorized_matches_scalar(spark):
    import random
    import string

    random.seed(11)
    texts = [None, "", "   ", "\t\n", "a", "a a a", "Hello WORLD hello"]
    for _ in range(200):
        n = random.randint(0, 30)
        texts.append(" ".join(
            "".join(random.choices(string.ascii_letters + "09", k=random.randint(1, 6)))
            for _ in range(n)))
    # batch ending in an EMPTY doc: the shape that broke the first
    # vectorization attempt (clipped reduceat start truncated the
    # preceding doc's segment)
    texts += ["tail doc one two three", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["s"] for r in
           df.select("i", simhash64_udf("t").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _simhash_scalar(t), (i, t)


# ---------------------------------------------------------------------------
# O(n^2) guard
# ---------------------------------------------------------------------------

def test_exact_near_dup_guard_fires(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="embedding_near_dups_lsh"):
        embedding_near_dups_exact(df, "embedding", "vec_id", max_rows=5)
    # None disables; small inputs under the cap pass untouched
    assert embedding_near_dups_exact(
        df, "embedding", "vec_id", threshold=1.1, max_rows=10).count() == 0


# ---------------------------------------------------------------------------
# single-pass shingling (VERDICT r2 item 4)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i % 7} "
                f"eta theta iota kappa word{i % 3}") for i in range(60)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact dups
    rows += [(200, None), (201, "one two")]            # shingle-less
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_single_sig_eval_and_cached_shingles(docs_df):
    out = minhash_near_dups(docs_df, "doc_id", "text", threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE minhash eval node (the r2 filter-on-UDF-output shape
    # extracted it twice), and every shingle UDF occurrence sits inside
    # a cached InMemoryRelation (one shingling pass at runtime)
    assert plan.count("ArrowEvalPython [minhash_sig") == 1
    assert plan.count("shingle_hashes") == plan.count("InMemoryRelation")
    assert plan.count("InMemoryRelation") >= 1


def test_sig_paths_bit_equal(docs_df):
    sh = shingle_table(docs_df, "doc_id", "text", 3)
    a = minhash_signatures(docs_df, "doc_id", "text", 16, 3) \
        .toPandas().sort_values("_id").reset_index(drop=True)
    b = minhash_signatures(docs_df, "doc_id", "text", 16, 3, shingles=sh) \
        .toPandas().sort_values("_id").reset_index(drop=True)
    assert a.equals(b)
    # shingle-less rows (NULL text, < k tokens) drop out of signatures
    assert not set(a["_id"]) & {200, 201}


def test_minhash_near_dups_finds_planted_dups(docs_df):
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_near_dups(docs_df, "doc_id", "text",
                             threshold=0.99).collect()}
    assert {(i, 100 + i) for i in range(5)} <= got


# ---------------------------------------------------------------------------
# deterministic IVF (VERDICT r2 item 5)
# ---------------------------------------------------------------------------

def test_ivf_partition_invariant(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    results, centers_list = [], []
    for parts in (1, 7, 32):
        d = df.repartition(parts)
        _, centers = ivf_index(d, "embedding", n_cells=8, id_col="vec_id")
        centers_list.append(centers)
        res = ivf_topk(d, "embedding", "vec_id", q, k=5,
                       n_cells=8, n_probe=3).collect()
        results.append([(r["vec_id"], r["cos"]) for r in res])
    assert np.array_equal(centers_list[0], centers_list[1])
    assert np.array_equal(centers_list[0], centers_list[2])
    assert results[0] == results[1] == results[2]


def test_ivf_recall_vs_brute(spark):
    from mehc_curation_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    rest = df.filter(F.col("vec_id") != 0)
    ann = {r["vec_id"] for r in
           ivf_topk(rest, "embedding", "vec_id", q, k=10,
                    n_cells=8, n_probe=4).collect()}
    brute = [r["vec_id"] for r in
             cosine_topk(rest, "embedding", "vec_id", q, k=10).collect()]
    assert len(ann & set(brute)) >= 8  # n_probe=4 of 8 cells


# ---------------------------------------------------------------------------
# batched ANN kNN join
# ---------------------------------------------------------------------------

def test_ann_join_full_k_and_subset_of_brute(spark):
    from mehc_curation_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(9)
    dim = 16
    idx_rows = [(i, rng.standard_normal(dim).tolist()) for i in range(500)]
    idx = spark.createDataFrame(idx_rows, "vec_id long, embedding array<double>")
    # queries = perturbed copies of index rows → a clear true neighbor
    q_rows = [(qi, (np.asarray(idx_rows[qi * 50][1])
                    + 0.05 * rng.standard_normal(dim)).tolist())
              for qi in range(6)]
    qdf = spark.createDataFrame(q_rows, "query_id long, embedding array<double>")

    got = ann_join(qdf, idx, "embedding", "query_id", "vec_id",
                   k=5, n_planes=8, probe_hamming=3).toPandas()
    counts = got.groupby("query_id").size()
    assert len(counts) == 6 and (counts == 5).all()
    # ranks are 1..5 per query, cos descending
    for qid, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == [1, 2, 3, 4, 5]
        assert list(grp["cos"]) == sorted(grp["cos"], reverse=True)
        # the planted near-identical vector is the rank-1 neighbor
        assert grp.iloc[0]["vec_id"] == qid * 50
        # subset-of-brute: every hit inside that query's brute top-25
        brute = {r["vec_id"] for r in cosine_topk(
            idx, "embedding", "vec_id", q_rows[int(qid)][1], k=25).collect()}
        assert set(grp["vec_id"]) <= brute


def test_ann_join_null_embeddings_ignored(spark):
    rng = np.random.default_rng(1)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(50)]
    rows += [(900, None), (901, [1.0])]  # NULL + ragged index vectors
    idx = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(0, rows[3][1])],
                                "query_id long, embedding array<double>")
    got = ann_join(qdf, idx, "embedding", "query_id", "vec_id",
                   k=5, n_planes=6, probe_hamming=2).toPandas()
    assert not set(got["vec_id"]) & {900, 901}
    assert len(got) == 5


def test_cross_corpus_near_dups_planted(spark):
    from mehc_curation_spark.operators.similarity import (
        cross_corpus_near_dups,
    )

    rng = np.random.default_rng(7)
    dim = 16
    ref_rows = [(i, rng.standard_normal(dim).tolist()) for i in range(60)]
    ref = spark.createDataFrame(ref_rows, "ref_id long, embedding array<double>")
    # candidates: 40 random (orthogonal-ish, cos ~ N(0, 1/sqrt(16)))
    # + 5 planted near-copies of reference rows
    cand_rows = [(100 + i, rng.standard_normal(dim).tolist())
                 for i in range(40)]
    planted = {200 + j: 10 * j for j in range(5)}
    cand_rows += [(cid, (np.asarray(ref_rows[rid][1])
                         + 0.02 * rng.standard_normal(dim)).tolist())
                  for cid, rid in planted.items()]
    cand = spark.createDataFrame(cand_rows,
                                 "cand_id long, embedding array<double>")

    got = cross_corpus_near_dups(cand, ref, "embedding", "cand_id", "ref_id",
                                 threshold=0.9, n_planes=8,
                                 probe_hamming=3).toPandas()
    # every planted copy is flagged with ITS reference row; at
    # threshold 0.9 no random candidate can cross (d=16 gaussians)
    assert dict(zip(got["cand_id"], got["ref_id"])) == planted
    assert (got["cos"] >= 0.9).all()
    # one row per flagged candidate (k=1 semantics)
    assert got["cand_id"].is_unique


def test_ann_join_empty_index_raises(spark):
    from mehc_curation_spark.operators.similarity import ann_join

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(0, [1.0] * 8)],
                                "query_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer vector dim"):
        ann_join(qdf, empty, "embedding", "query_id", "vec_id")
    # all-NULL index: same clear error instead of a TypeError
    nulls = spark.createDataFrame([(1, None)],
                                  "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer vector dim"):
        ann_join(qdf, nulls, "embedding", "query_id", "vec_id")


def test_minhash_shingle_cache_bounded(docs_df):
    """Repeated minhash_near_dups calls must not accumulate pinned
    shingle caches — each call releases its predecessor's."""
    import mehc_curation_spark.operators.similarity as sim

    r1 = sim.minhash_near_dups(docs_df, "doc_id", "text")
    n1 = r1.count()
    first_cached = sim._SHINGLE_CACHE_HOLDER[0]
    r2 = sim.minhash_near_dups(docs_df, "doc_id", "text")
    assert len(sim._SHINGLE_CACHE_HOLDER) == 1
    assert sim._SHINGLE_CACHE_HOLDER[0] is not first_cached
    # the older result is still CORRECT (recomputes without its cache)
    assert r1.count() == n1 == r2.count()


def test_cross_corpus_text_near_dups_planted(spark):
    from mehc_curation_spark.operators.similarity import (
        cross_corpus_text_near_dups,
        ngram_jaccard,
    )

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge by the river bank today")
    ref_rows = [(i, f"reference document number {i} about topic {i % 7} "
                    f"with unique filler words alpha{i} beta{i} gamma{i}")
                for i in range(20)] + [(100, base)]
    cand_rows = [(200 + i, f"candidate text {i} wholly different tokens "
                           f"delta{i} epsilon{i} zeta{i} eta{i} theta{i}")
                 for i in range(20)]
    # near-copy of ref 100: one word changed -> high but < 1 jaccard
    cand_rows += [(300, base.replace("today", "tonight"))]
    ref = spark.createDataFrame(ref_rows, "ref_id long, text string")
    cand = spark.createDataFrame(cand_rows, "cand_id long, text string")

    got = cross_corpus_text_near_dups(cand, ref, "cand_id", "ref_id",
                                      "text", threshold=0.5).toPandas()
    assert list(zip(got["cand_id"], got["ref_id"])) == [(300, 100)]
    assert (got["jaccard"] > 0.5).all() and (got["jaccard"] < 1.0).all()


class TestReviewRegressions3:
    """Third self-review batch: ANSI division, dim inference, band
    masks, NULL-text reputation, stream-scope canonicalization."""

    def test_cosine_zero_vector_scores_zero(self, spark):
        from mehc_curation_spark.operators.similarity import cosine_topk
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
            "vec_id long, embedding array<double>")
        got = {r["vec_id"]: r["cos"] for r in
               cosine_topk(df, "embedding", "vec_id", [1.0, 0.0],
                           k=3).collect()}
        assert got[1] == 0.0  # zero vector: no ANSI DIVIDE_BY_ZERO
        assert got[0] == 1.0

    def test_lsh_dim_inference_errors_clearly(self, spark):
        import pytest as _pt

        from mehc_curation_spark.operators.similarity import (
            embedding_near_dups_lsh,
        )
        empty = spark.createDataFrame([], "vec_id long, "
                                          "embedding array<float>")
        with _pt.raises(ValueError, match="pass dim"):
            embedding_near_dups_lsh(empty, "embedding", "vec_id")
        # NULL leading vector: inferred from the non-null max
        df = spark.createDataFrame(
            [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.001])],
            "vec_id long, embedding array<double>")
        out = embedding_near_dups_lsh(df, "embedding", "vec_id",
                                      threshold=0.9)
        assert out.count() >= 0  # plans and runs

    def test_phash_neardup_hamming_zero(self, spark):
        from mehc_curation_spark.operators.similarity import phash_near_dups
        df = spark.createDataFrame(
            [("a", -1), ("b", -1), ("c", 7)],
            "image_id string, phash long")
        got = phash_near_dups(df, "phash", "image_id", max_hamming=0) \
            .collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == \
            [("a", "b", 0)]

    def test_source_reputation_counts_null_text(self, spark):
        from mehc_curation_spark.operators.text_stats import (
            source_reputation,
        )
        df = spark.createDataFrame(
            [(1, "s1", None), (2, "s1", None), (3, "s1", "real text here"),
             (4, "s2", None)],
            "doc_id long, source string, text string")
        got = {r["source"]: r for r in
               source_reputation(df, "source", "text", "doc_id").collect()}
        assert got["s1"]["n_docs"] == 3      # NULL texts are counted
        assert got["s2"]["n_docs"] == 1      # all-NULL source survives
        assert got["s1"]["exact_dup_rate"] == 0.0  # NULLs aren't dups

    def test_stream_scope_canonical(self, tmp_path):
        import os

        from mehc_curation_spark.streaming.curate_stream import (
            _stream_scope,
        )
        d = tmp_path / "ckpt"
        d.mkdir()
        cwd = os.getcwd()
        try:
            os.chdir(tmp_path)
            assert _stream_scope("ckpt") == _stream_scope(str(d)) \
                == _stream_scope(str(d) + "/")
        finally:
            os.chdir(cwd)
