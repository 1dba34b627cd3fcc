"""End-to-end gate: Spark pipeline labels vs the pure-pandas oracle.

BASELINE.json north_rule requires F1 >= 0.99 on keep/drop and
byte-equal scrubbed captions; since both engines share one rule
implementation the tests assert exact equality (F1 == 1.0).
"""

import numpy as np
import pandas as pd
import pytest

from mehc_curation_spark.oracle import curate_oracle
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.stages.plan import build_labels_plan


def _compare(spark_labels: pd.DataFrame, oracle_labels: pd.DataFrame):
    s = spark_labels.sort_values("image_id").reset_index(drop=True)
    o = oracle_labels.sort_values("image_id").reset_index(drop=True)
    assert len(s) == len(o)
    assert (s["image_id"] == o["image_id"]).all()

    # F1 on keep/drop
    tp = int((s["keep"] & o["keep"]).sum())
    fp = int((s["keep"] & ~o["keep"]).sum())
    fn = int((~s["keep"] & o["keep"]).sum())
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    return f1, s, o


@pytest.fixture(scope="module")
def labels(spark, pairs_df, pairs_pdf):
    cfg = CurationConfig()
    s = build_labels_plan(pairs_df, cfg).toPandas()
    o = curate_oracle(pairs_pdf, cfg)
    return s, o


def test_keep_f1(labels):
    s, o = labels
    f1, s, o = _compare(s, o)
    assert f1 >= 0.99, f"F1 {f1}"
    # target is exact equality (shared rule implementation)
    mism = s[s["keep"] != o["keep"]]
    assert len(mism) == 0, mism.head(20)


def test_drop_reasons_exact(labels):
    s, o = labels
    _, s, o = _compare(s, o)
    sr = s["drop_reason"].fillna("<kept>")
    orr = o["drop_reason"].fillna("<kept>")
    bad = s[(sr != orr)]
    assert len(bad) == 0, bad.head(20).to_string()


def test_scrubbed_caption_byte_equal(labels):
    s, o = labels
    _, s, o = _compare(s, o)
    ks = s[s["keep"]]["caption_scrubbed"]
    ko = o[o["keep"]]["caption_scrubbed"]
    mismatch = [(a, b) for a, b in zip(ks, ko) if a != b]
    assert not mismatch, mismatch[:10]


def test_lang_ppl_bitwise(labels):
    s, o = labels
    _, s, o = _compare(s, o)
    assert (s["lang"] == o["lang"]).all()
    np.testing.assert_array_equal(s["ppl"].to_numpy(), o["ppl"].to_numpy())
    np.testing.assert_array_equal(s["lang_conf"].to_numpy(),
                                  o["lang_conf"].to_numpy())


def test_partition_count_invariance(spark, pairs_df, pairs_pdf):
    """Same labels at different parallelism (order-independence)."""
    cfg = CurationConfig()
    a = (build_labels_plan(pairs_df.repartition(3), cfg)
         .toPandas().sort_values("image_id").reset_index(drop=True))
    b = (build_labels_plan(pairs_df.repartition(17), cfg)
         .toPandas().sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("strategy", ["window", "agg"])
def test_null_caption_parity(spark, strategy):
    """Alive NULL captions must not perturb dedup or scrub labels.

    Regression for two round-1 bugs: (a) _cap_hash mapped NULL to a
    non-null struct so a phash group with one real caption + an alive
    null-caption row got a spurious duplicate_conflict; (b) the fused
    Arrow stage skipped scrub_toxicity for None, missing the oracle's
    scrub_unprocessable on alive null-caption rows.
    """
    cfg = CurationConfig(validate=False, rm_low_quality=False,
                         rm_unknown_lang=False, rm_high_ppl=False,
                         dedup_strategy=strategy)
    pdf = pd.DataFrame({
        "image_id": [f"i{k:02d}" for k in range(8)],
        "bytes": [None] * 8,
        "w": pd.array([8] * 8, dtype="int32"),
        "h": pd.array([8] * 8, dtype="int32"),
        "fmt": ["raw"] * 8,
        # phash 1: real + real-dup + null  -> keep, perfect, unprocessable
        # phash 2: null + null             -> nulls group as one caption
        # phash 3: real A + real B + null  -> conflict drops all
        "caption": ["a cat sits", "a cat sits", None,
                    None, None,
                    "a dog runs", "a bird flies", None],
        "phash": pd.array([1, 1, 1, 2, 2, 3, 3, 3], dtype="int64"),
    })
    df = spark.createDataFrame(
        pdf, schema=("image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long"))
    s = (build_labels_plan(df, cfg).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    o = (curate_oracle(pdf, cfg)
         .sort_values("image_id").reset_index(drop=True))
    assert (s["keep"].to_numpy() == o["keep"].to_numpy()).all(), \
        pd.concat([s[["image_id", "keep", "drop_reason"]],
                   o[["keep", "drop_reason"]].add_suffix("_o")], axis=1)
    assert (s["drop_reason"].fillna("<kept>")
            == o["drop_reason"].fillna("<kept>")).all()


def test_auto_dedup_strategy(spark, pairs_df):
    """'auto' picks 'agg' on a corpus with a planted 10%-hot phash and
    'window' on the balanced fixture — and the auto-built labels match
    the forced-'window' labels byte-for-byte (VERDICT r1 item 10)."""
    from pyspark.sql import functions as F

    from mehc_curation_spark.stages.plan import choose_dedup_strategy

    cfg = CurationConfig(dedup_strategy="auto", dedup_sample_fraction=1.0)
    assert choose_dedup_strategy(pairs_df, cfg) == "window"

    # plant a viral phash on 10% of rows
    hot = pairs_df.withColumn(
        "phash",
        F.when(F.xxhash64("image_id") % 10 == 0, F.lit(424242))
        .otherwise(F.col("phash")))
    assert choose_dedup_strategy(hot, cfg) == "agg"

    auto = (build_labels_plan(hot, cfg).toPandas()
            .sort_values("image_id").reset_index(drop=True))
    win = (build_labels_plan(hot, cfg.with_(dedup_strategy="window"))
           .toPandas().sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, win)


def test_agg_dedup_strategy_matches_window(spark, pairs_df):
    """The skew-robust aggregate+join dedup formulation must produce
    byte-identical labels to the window formulation (and hence to the
    oracle)."""
    from mehc_curation_spark.rules.registry import CurationConfig
    from mehc_curation_spark.stages.plan import build_labels_plan

    win = (build_labels_plan(pairs_df, CurationConfig()).toPandas()
           .sort_values("image_id").reset_index(drop=True))
    agg = (build_labels_plan(pairs_df, CurationConfig(dedup_strategy="agg"))
           .toPandas().sort_values("image_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(win, agg)


def test_agg_strategy_null_caption_dedup1(spark):
    """Null captions ALIVE at dedup-1 (decode gate on, decodable
    bytes, text gates off): the agg strategy must drop the second
    null-caption row as duplicate_perfect exactly like the window
    strategy — regression for the null-unsafe firsts join (a plain
    equi-join on the NULL hash struct never matched, silently skipping
    the perfect-dup drop)."""
    import numpy as np

    from mehc_curation_spark.codecs.image import encode_image

    rng = np.random.default_rng(0)
    raw = encode_image(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), "raw")
    pdf = pd.DataFrame({
        "image_id": ["i0", "i1", "i2"],
        "bytes": [raw] * 3, "w": [8] * 3, "h": [8] * 3, "fmt": ["raw"] * 3,
        "caption": [None, None, "a cat sits on the mat today"],
        "phash": [1, 1, 2]})
    df = spark.createDataFrame(
        pdf, schema=("image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long"))
    cfg = CurationConfig(rm_low_quality=False, rm_unknown_lang=False,
                         rm_high_ppl=False, scrub_pii=False,
                         scrub_toxicity=False, validate_post_scrub=False,
                         normalize_lossy=False, normalize_canonical=False)
    res = {}
    for strat in ("window", "agg"):
        s = build_labels_plan(df, cfg.with_(dedup_strategy=strat)).toPandas()
        res[strat] = dict(zip(s["image_id"], s["drop_reason"]))
    assert res["window"] == res["agg"], res
    assert res["agg"]["i1"] == "duplicate_perfect", res


def test_image_quality_gate_parity(spark, pairs_df, pairs_pdf):
    """Opt-in image-quality gate: Spark labels == oracle labels with
    the gate on, img_* reasons actually fire, and the gate only ever
    shrinks the kept set."""
    cfg = CurationConfig(rm_low_quality_image=True)
    s = (build_labels_plan(pairs_df, cfg).toPandas()
         .sort_values("image_id").reset_index(drop=True))
    o = (curate_oracle(pairs_pdf, cfg)
         .sort_values("image_id").reset_index(drop=True))
    assert (s["keep"] == o["keep"]).all()
    assert (s["drop_reason"].fillna("#") == o["drop_reason"].fillna("#")).all()
    img_reasons = set(s["drop_reason"].dropna()) & {
        "img_too_small", "img_extreme_aspect", "img_blurry",
        "img_low_entropy", "img_flat"}
    assert img_reasons, "gate enabled but no img_* reason fired"

    base = (build_labels_plan(pairs_df, CurationConfig()).toPandas()
            .sort_values("image_id").reset_index(drop=True))
    # NOT monotone through dedup: dropping a conflicting caption can
    # un-conflict its phash group, re-admitting rows. The invariant is
    # reason-scoped: newly-dropped rows fall to the img gate or to
    # re-grouped dedup; newly-kept rows were dedup drops before.
    dup = {"duplicate_perfect", "duplicate_conflict"}
    newly_dropped = s[base["keep"] & ~s["keep"]]["drop_reason"]
    assert newly_dropped.isin({
        "img_too_small", "img_extreme_aspect", "img_blurry",
        "img_low_entropy", "img_flat"} | dup).all()
    assert len(newly_dropped) > 0
    newly_kept = base[s["keep"] & ~base["keep"]]["drop_reason"]
    assert newly_kept.isin(dup).all()


def test_image_quality_requires_validate():
    with pytest.raises(ValueError, match="requires validate"):
        CurationConfig(validate=False,
                       rm_low_quality_image=True).iq_thresholds()
