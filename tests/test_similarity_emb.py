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
