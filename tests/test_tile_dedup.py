"""Partial-image dedup by per-tile perceptual hashes."""

import numpy as np
import pytest

from mehc_curation_spark.codecs.image import encode_image
from mehc_curation_spark.codecs.phash import phash64, tile_phashes_of
from mehc_curation_spark.operators.multimodal import (tile_near_dups,
                                                      tile_phashes)


def _img(rng, h=64, w=64):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _row(image_id, px, fmt="png"):
    return (image_id, encode_image(px, fmt), px.shape[1], px.shape[0],
            fmt, "caption", 0)


SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
          "caption string, phash long")


def test_kernel_flat_and_degenerate_tiles_omitted():
    rng = np.random.default_rng(1)
    px = _img(rng)
    px[:32, :32] = 50  # one flat quadrant
    got = dict(tile_phashes_of(px, 2))
    assert 0 not in got and len(got) == 3
    # h < grid: row bands collapse, no crash, <= grid^2 tiles
    tiny = rng.integers(0, 256, (2, 40, 3), dtype=np.uint8)
    idxs = [k for k, _ in tile_phashes_of(tiny, 4)]
    assert len(idxs) == len(set(idxs)) and len(idxs) <= 8


def test_overlay_variant_found_global_phash_blind(spark):
    """A localized stamp leaves 15/16 tiles identical: tile dedup must
    pair the variant with the original even when the global hamming
    gate would not."""
    rng = np.random.default_rng(7)
    base = _img(rng)
    stamped = base.copy()
    stamped[0:16, 0:16] = 255 - stamped[0:16, 0:16]  # invert one tile
    others = [_row(f"bg{i}", _img(rng)) for i in range(6)]
    df = spark.createDataFrame(
        [_row("orig", base), _row("stamp", stamped)] + others, SCHEMA)
    out = {(r["id_a"], r["id_b"]): r["n_match"]
           for r in tile_near_dups(df, grid=4, min_match=6).collect()}
    assert out == {("orig", "stamp"): 15}


def test_lossy_reencode_variant_found(spark):
    # a jpeg-requantized copy keeps most tile hashes (per-tile phash
    # is robust to quantization noise): must pair at min_match=6
    from mehc_curation_spark.codecs.image import decode_image
    rng = np.random.default_rng(7)
    base = _img(rng)
    lossy = decode_image(encode_image(base, "jpegq"), "jpegq", 64, 64)
    df = spark.createDataFrame(
        [_row("orig", base), _row("lossy", lossy)], SCHEMA)
    out = tile_near_dups(df, grid=4, min_match=6).collect()
    assert len(out) == 1 and out[0]["n_match"] >= 6


def test_undecodable_and_bucket_guard(spark):
    rng = np.random.default_rng(3)
    a = _img(rng)
    rows = [_row("a", a), _row("b", a)]  # identical -> 16 matches
    rows.append(("broken", b"\x00\x01", 64, 64, "png", "c", 0))
    df = spark.createDataFrame(rows, SCHEMA)
    out = tile_near_dups(df, grid=4, min_match=16).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("a", "b")]
    # max_bucket guard: 5 identical images, bucket size 5 > 4 -> no pairs
    many = [_row(f"m{i}", a) for i in range(5)]
    out2 = tile_near_dups(spark.createDataFrame(many, SCHEMA),
                          grid=4, min_match=1, max_bucket=4).collect()
    assert out2 == []


def test_distributed_equals_kernel(spark):
    rng = np.random.default_rng(11)
    imgs = {f"i{k}": _img(rng, h=rng.integers(16, 64),
                          w=rng.integers(16, 64)) for k in range(20)}
    df = spark.createDataFrame(
        [_row(i, px) for i, px in imgs.items()], SCHEMA)
    got = sorted((r["image_id"], r["tile_idx"], r["tile_hash"])
                 for r in tile_phashes(df, grid=3).collect())
    exp = sorted((i, k, v) for i, px in imgs.items()
                 for k, v in tile_phashes_of(px, 3))
    assert got == exp


def test_plan_single_arrow_stage_slim_shuffle(spark):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame([_row("x", _img(rng))], SCHEMA)
    plan = (tile_near_dups(df)._jdf.queryExecution()
            .executedPlan().toString())
    # pixels cross Python once; only slim rows shuffle afterwards
    assert plan.count("MapInPandas") == 1


def test_cross_corpus_tile_dups(spark):
    from mehc_curation_spark.operators.multimodal import (
        cross_corpus_tile_dups,
    )
    rng = np.random.default_rng(13)
    ref_imgs = {f"r{i}": _img(rng) for i in range(5)}
    leak = ref_imgs["r2"].copy()
    leak[0:16, 0:16] = 0  # overlay-variant of a reference image
    cand_rows = [_row("fresh1", _img(rng)), _row("leak", leak),
                 _row("fresh2", _img(rng))]
    ref = spark.createDataFrame(
        [_row(i, px) for i, px in ref_imgs.items()], SCHEMA)
    cand = spark.createDataFrame(cand_rows, SCHEMA)
    out = {(r["cand_id"], r["ref_id"]): r["n_match"] for r in
           cross_corpus_tile_dups(cand, ref, min_match=6).collect()}
    assert set(out) == {("leak", "r2")}
    assert out[("leak", "r2")] >= 14  # only the stamped tile(s) differ


def test_cross_corpus_bucket_guard_both_sides(spark):
    from mehc_curation_spark.operators.multimodal import (
        cross_corpus_tile_dups,
    )
    rng = np.random.default_rng(17)
    a = _img(rng)
    cand = spark.createDataFrame([_row(f"c{i}", a) for i in range(3)],
                                 SCHEMA)
    ref = spark.createDataFrame([_row(f"r{i}", a) for i in range(3)],
                                SCHEMA)
    # membership 3 > max_bucket=2 on both sides -> all keys skipped
    assert cross_corpus_tile_dups(cand, ref, min_match=1,
                                  max_bucket=2).collect() == []
    # relaxed guard finds the full 3x3 grid of identical images
    out = cross_corpus_tile_dups(cand, ref, min_match=16,
                                 max_bucket=16).collect()
    assert len(out) == 9


def test_flip_invariant_phash(spark):
    """compute_phash(flip_invariant=True): a horizontally mirrored
    copy gets the SAME hash as the original (exact-dedup key), while
    plain phash puts them far apart."""
    from mehc_curation_spark.codecs.phash import phash64
    from mehc_curation_spark.operators.multimodal import compute_phash

    rng = np.random.default_rng(21)
    base = _img(rng)
    mirrored = base[:, ::-1].copy()
    df = spark.createDataFrame(
        [_row("orig", base), _row("flip", mirrored),
         ("broken", b"\x00", 64, 64, "png", "c", 0)], SCHEMA)
    out = {r["image_id"]: (r["decode_ok"], r["phash_computed"])
           for r in compute_phash(df, flip_invariant=True).collect()}
    assert out["orig"] == out["flip"] and out["orig"][0] is True
    assert out["broken"] == (False, None)
    plain_ham = bin((phash64(base) ^ phash64(mirrored))
                    & (2 ** 64 - 1)).count("1")
    assert plain_ham > 8  # plain phash cannot pair them


def test_dihedral_invariant_phash(spark):
    """compute_phash(dihedral_invariant=True): every member of the D4
    orbit — 90/180/270 rotations, mirror, mirrored rotations — hashes
    to the SAME canonical value; plain phash sees the rotations as
    distant. Rotated variants swap w/h, exercising the non-square
    decode path too."""
    from mehc_curation_spark.codecs.phash import phash64_dihedral
    from mehc_curation_spark.operators.multimodal import compute_phash

    rng = np.random.default_rng(22)
    base = _img(rng, h=48, w=64)
    variants = {
        "orig": base,
        "rot90": np.rot90(base).copy(),
        "rot180": np.rot90(base, 2).copy(),
        "rot270": np.rot90(base, 3).copy(),
        "mirror": base[:, ::-1].copy(),
        "mirror_rot90": np.rot90(base[:, ::-1]).copy(),
    }
    df = spark.createDataFrame(
        [_row(k, v) for k, v in variants.items()]
        + [("broken", b"\x00", 64, 48, "png", "c", 0)], SCHEMA)
    out = {r["image_id"]: (r["decode_ok"], r["phash_computed"])
           for r in compute_phash(df, dihedral_invariant=True).collect()}
    canon = out["orig"]
    assert canon[0] is True and canon[1] is not None
    for k in variants:
        assert out[k] == canon, k
    assert out["broken"] == (False, None)
    # the distributed value IS the codec function of the pixels
    assert canon[1] == phash64_dihedral(base)
    # plain phash puts a 90-deg rotation far away
    plain_ham = bin((phash64(base) ^ phash64(variants["rot90"]))
                    & (2 ** 64 - 1)).count("1")
    assert plain_ham > 8


def test_cross_corpus_single_decode_per_side(spark):
    # each corpus must decode exactly ONCE: the skew guard is a window
    # over the tile rows, not a second consumption of the Arrow stage
    from mehc_curation_spark.operators.multimodal import (
        cross_corpus_tile_dups,
    )
    rng = np.random.default_rng(23)
    cand = spark.createDataFrame([_row("c", _img(rng))], SCHEMA)
    ref = spark.createDataFrame([_row("r", _img(rng))], SCHEMA)
    plan = (cross_corpus_tile_dups(cand, ref)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 2


def test_tile_near_dups_custom_id_col(spark):
    rng = np.random.default_rng(29)
    a = _img(rng)
    df = spark.createDataFrame(
        [("k1", a.tobytes(), 64, 64, "raw", "c", 0),
         ("k2", a.tobytes(), 64, 64, "raw", "c", 0)],
        "img_key string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long")
    out = tile_near_dups(df, min_match=16, id_col="img_key").collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("k1", "k2")]


def test_batched_kernel_matches_scalar():
    """The batched tile kernel must be BIT-IDENTICAL to the scalar
    per-tile specification across dims (odd sizes, tiles differing by
    1px, tiny images, flat bands) and grids."""
    from mehc_curation_spark.codecs.phash import (_tile_phashes_scalar,
                                                  tile_phashes_of)
    rng = np.random.default_rng(31)
    for _ in range(40):
        h, w = int(rng.integers(2, 80)), int(rng.integers(2, 80))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if rng.random() < 0.5:
            px[: max(1, h // 4)] = 7  # letterbox band
        for g in (2, 4, 5):
            assert tile_phashes_of(px, g) == _tile_phashes_scalar(px, g)


def test_index_path_equals_direct_and_appends(spark, tmp_path):
    from mehc_curation_spark.operators.multimodal import (
        cross_corpus_tile_dups,
        read_tile_index,
        tile_dups_against_index,
        write_tile_index,
    )
    rng = np.random.default_rng(41)
    ref_imgs = {f"r{i}": _img(rng) for i in range(4)}
    leak = ref_imgs["r1"].copy()
    leak[0:16, 0:16] = 0
    ref = spark.createDataFrame(
        [_row(i, px) for i, px in ref_imgs.items()], SCHEMA)
    cand = spark.createDataFrame(
        [_row("leak", leak), _row("fresh", _img(rng))], SCHEMA)

    idx_path = str(tmp_path / "tile_idx")
    res = write_tile_index(ref, idx_path, grid=4)
    assert res["version"] == 1 and res["grid"] == 4
    index, grid = read_tile_index(spark, idx_path)
    assert grid == 4

    direct = sorted((r["cand_id"], r["ref_id"], r["n_match"]) for r in
                    cross_corpus_tile_dups(cand, ref).collect())
    via_idx = sorted((r["cand_id"], r["ref_id"], r["n_match"]) for r in
                     tile_dups_against_index(cand, index).collect())
    assert direct == via_idx and len(direct) == 1

    # append a new reference batch: now a copy of it must match too.
    # (15, not 16: the zeroed stamp tile is luma-flat and excluded on
    # BOTH sides, so even identical images share 15 informative tiles)
    extra = spark.createDataFrame([_row("r_new", leak)], SCHEMA)
    write_tile_index(extra, idx_path, grid=4, mode="append")
    index2, _ = read_tile_index(spark, idx_path)
    got = {(r["cand_id"], r["ref_id"]) for r in
           tile_dups_against_index(cand, index2, min_match=15).collect()}
    assert ("leak", "r_new") in got

    # grid mismatch on append is refused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="grid"):
        write_tile_index(extra, idx_path, grid=2, mode="append")


def test_plain_table_not_a_tile_index(spark, tmp_path):
    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.operators.multimodal import read_tile_index
    p = str(tmp_path / "plain")
    SnapshotTable(p).write(spark.range(3).selectExpr(
        "CAST(id AS STRING) ref_id", "CAST(id AS INT) tile_idx",
        "id tile_hash"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="tile_grid"):
        read_tile_index(spark, p)
