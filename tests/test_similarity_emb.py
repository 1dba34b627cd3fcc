"""Embedding-cosine near-dup: exact baseline vs banded-LSH scale path.

Planted structure: pairs of near-identical vectors (cos >= ~0.99)
in a sea of random gaussians (cos ~ 0 at dim 64). The LSH variant
verifies candidates with the same exact cosine, so its result set
must be a SUBSET of the exact variant's; for near-identical vectors
the hyperplane sign bits almost always agree per band, so recall on
the planted pairs should be ~1.
"""

import numpy as np
import pytest

from mehc_curation_spark.operators.similarity import (
    embedding_near_dups_exact,
    embedding_near_dups_lsh,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    dim, n_noise, n_pairs = 64, 120, 12
    rows = []
    vid = 0
    for _ in range(n_noise):
        rows.append((vid, rng.standard_normal(dim).astype(float).tolist()))
        vid += 1
    planted = []
    for _ in range(n_pairs):
        base = rng.standard_normal(dim)
        twin = base + 0.02 * rng.standard_normal(dim)
        rows.append((vid, base.astype(float).tolist()))
        rows.append((vid + 1, twin.astype(float).tolist()))
        planted.append((vid, vid + 1))
        vid += 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, planted


def test_exact_finds_planted_pairs(emb_df):
    df, planted = emb_df
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups_exact(df, "embedding", "vec_id",
                                     threshold=0.9).collect()}
    assert set(planted) <= got
    # random gaussians at dim 64 essentially never reach cos 0.9
    assert len(got) == len(planted)


def test_lsh_subset_of_exact_and_high_recall(emb_df):
    df, planted = emb_df
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups_exact(df, "embedding", "vec_id",
                                       threshold=0.9).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups_lsh(df, "embedding", "vec_id",
                                   threshold=0.9, n_planes=16,
                                   bands=4).collect()}
    assert lsh <= exact
    recall = len(lsh & set(planted)) / len(planted)
    assert recall >= 0.9, (recall, sorted(set(planted) - lsh))


# ---------------------------------------------------------------------------
# phash hamming near-dup
# ---------------------------------------------------------------------------

def test_phash_near_dups_exact_guarantee(spark):
    """d <= max_hamming pairs are ALWAYS found (pigeonhole over d+1
    bands — this is a guarantee, not probabilistic LSH); pairs beyond
    the radius are excluded by the popcount verify."""
    from mehc_curation_spark.operators.similarity import phash_near_dups

    import random
    rnd = random.Random(9)
    rows = []
    planted = []
    vid = 0
    base_hashes = [rnd.getrandbits(64) - (1 << 63) for _ in range(40)]
    for h in base_hashes:
        rows.append((f"i{vid}", h))
        vid += 1
    # twins at hamming 1..4 (must all be found)
    for d in (1, 2, 3, 4):
        h = base_hashes[d]
        flipped = h
        for bit in rnd.sample(range(64), d):
            flipped ^= (1 << bit)
            if flipped >= (1 << 63):
                flipped -= (1 << 64)
        rows.append((f"twin{d}", flipped))
        planted.append(tuple(sorted((f"i{d}", f"twin{d}"))))
    # a far pair: hamming ~32, must NOT be matched with its base
    far = base_hashes[0] ^ ((1 << 32) - 1)
    if far >= (1 << 63):
        far -= (1 << 64)
    rows.append(("far0", far))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {tuple(sorted((r["id_a"], r["id_b"])))
           for r in phash_near_dups(df, "phash", "image_id",
                                    max_hamming=4).collect()}
    assert set(planted) <= got, sorted(set(planted) - got)
    assert ("far0", "i0") not in got and ("i0", "far0") not in got
    for r in phash_near_dups(df, "phash", "image_id", max_hamming=4).collect():
        assert r["hamming"] <= 4


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------

def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF with generous probing on clustered data must recover most of
    the brute-force top-k (the recall baseline relationship the
    operator documents)."""
    import numpy as np

    from mehc_curation_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(5)
    dim, n_clusters, per = 32, 8, 40
    rows, vid = [], 0
    centers = rng.standard_normal((n_clusters, dim)) * 3
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((vid, v.astype(float).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = (centers[0] + rng.standard_normal(dim) * 0.1).tolist()
    brute = [r["vec_id"] for r in
             cosine_topk(df, "embedding", "vec_id", q, k=10).collect()]
    ivf = [r["vec_id"] for r in
           ivf_topk(df, "embedding", "vec_id", q, k=10,
                    n_cells=8, n_probe=3).collect()]
    recall = len(set(brute) & set(ivf)) / 10
    assert recall >= 0.8, (recall, brute, ivf)


def test_alignment_filter_keep_rule(spark):
    """CLIP-filter shape: identical directions align (cos 1), orthogonal
    don't, NULL sides drop, zero vectors score 0 by the safe norm."""
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.similarity import (
        alignment_filter,
        alignment_scores,
    )

    rows = [
        (1, [1.0, 0.0], [2.0, 0.0]),   # same direction -> 1.0
        (2, [1.0, 0.0], [0.0, 1.0]),   # orthogonal -> 0.0
        (3, None, [1.0, 0.0]),         # NULL side -> NULL, dropped
        (4, [0.0, 0.0], [1.0, 0.0]),   # zero vector -> 0.0
    ]
    df = spark.createDataFrame(
        rows, "id long, va array<float>, vb array<float>")
    sc = {r["id"]: r["alignment_cos"] for r in
          alignment_scores(df, "va", "vb").collect()}
    assert sc[1] == 1.0 and sc[2] == 0.0 and sc[3] is None and sc[4] == 0.0
    kept = {r["id"] for r in
            alignment_filter(df, "va", "vb", threshold=0.3).collect()}
    assert kept == {1}


def test_linear_head_known_value(spark):
    from mehc_curation_spark.operators.similarity import (
        aesthetic_scores, head_weights, linear_head_col)
    from pyspark.sql import functions as F

    w, b = head_weights(4, seed=11)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 2.0, 0.0, 0.0])],
        "id long, v array<float>")
    got = {r["id"]: r["s"] for r in df.select(
        "id", F.round(linear_head_col(F.col("v"), w, b), 6).alias("s")
    ).collect()}
    assert got[1] == round(w[0] + b, 6)
    assert got[2] == round(2 * w[1] + b, 6)


def test_linear_head_null_and_ragged_score_null(spark):
    from mehc_curation_spark.operators.similarity import aesthetic_scores

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None), (3, [1.0, 2.0])],
        "vec_id long, embedding array<float>")
    rows = {r["vec_id"]: r for r in
            aesthetic_scores(df, "embedding", "vec_id", dim=4).collect()}
    assert rows[1]["aesthetic"] is not None
    assert rows[2]["aesthetic"] is None and rows[2]["pass_aesthetic"] is None
    assert rows[3]["aesthetic"] is None and rows[3]["pass_aesthetic"] is None


class TestHardNegatives:
    def _df(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = []
        for i in range(40):
            v = rng.normal(size=8)
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
        # 100: exact duplicate of anchor 0 (cos = 1.0 -> excluded)
        rows.append((100, rows[0][1]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_excludes_self_and_near_dups(self, spark):
        from mehc_curation_spark.operators.similarity import hard_negatives

        df = self._df(spark)
        got = hard_negatives(df, "embedding", "vec_id", k=3,
                             max_cos=0.98, probe_hamming=3).collect()
        assert all(r["anchor_id"] != r["negative_id"] for r in got)
        assert all(r["cos"] < 0.98 for r in got)
        # anchor 0's duplicate (id 100) must never be its negative
        zero = [r["negative_id"] for r in got if r["anchor_id"] == 0]
        assert 100 not in zero and zero  # excluded, yet others found

    def test_negatives_subset_of_brute(self, spark):
        import numpy as np

        from mehc_curation_spark.operators.similarity import hard_negatives

        df = self._df(spark)
        pdf = df.toPandas()
        vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
                for r in pdf.itertuples()}
        got = hard_negatives(df, "embedding", "vec_id", k=3,
                             max_cos=0.98, probe_hamming=3).collect()
        for r in got:
            a, n = vecs[r["anchor_id"]], vecs[r["negative_id"]]
            cos = float(a @ n / (np.linalg.norm(a) * np.linalg.norm(n)))
            assert abs(round(cos, 4) - r["cos"]) <= 1e-4

    def test_k_fetch_validation(self, spark):
        import pytest as _pytest

        from mehc_curation_spark.operators.similarity import hard_negatives

        df = self._df(spark)
        with _pytest.raises(ValueError):
            hard_negatives(df, "embedding", "vec_id", k=5, k_fetch=5)
