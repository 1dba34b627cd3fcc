"""compute_phash (operators/multimodal.py): pixel-space perceptual
hashing — exact parity with the scalar kernel and the 64-bit
precision hazard of Arrow-serializing long columns with NULLs."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.multimodal import compute_phash


def test_matches_scalar_kernel_exactly(spark, pairs_pdf, pairs_df):
    from mehc_curation_spark.codecs.image import DecodeError, decode_image
    from mehc_curation_spark.codecs.phash import phash64

    got = {r["image_id"]: (r["decode_ok"], r["phash_computed"])
           for r in compute_phash(pairs_df).collect()}
    n_checked = 0
    for r in pairs_pdf.itertuples(index=False):
        try:
            exp = (True, phash64(decode_image(
                r.bytes, r.fmt, int(r.w), int(r.h))))
        except (DecodeError, TypeError, ValueError):
            exp = (False, None)
        assert got[r.image_id] == exp, r.image_id
        n_checked += 1
    assert n_checked == len(pairs_pdf)
    # fixture plants ~1% corruption, so both branches were exercised
    assert any(not ok for ok, _ in got.values())


def test_low_bits_survive_nulls_in_batch(spark):
    """Regression: an OBJECT column mixing python ints and Nones goes
    through float64 in PySpark's Arrow writer and silently zeroes the
    low bits of 64-bit hashes. compute_phash must keep full-precision
    values even when undecodable rows share its batches."""
    from mehc_curation_spark.codecs.image import encode_image
    from mehc_curation_spark.codecs.phash import phash64
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    expected = {}
    for i in range(64):
        px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        data = encode_image(px, "raw")
        rid = f"x{i:03d}"
        rows.append((rid, bytearray(data), 24, 24, "raw"))
        expected[rid] = phash64(px)
    # one garbage payload per 8 rows -> every batch sees a NULL
    for i in range(8):
        rows.append((f"bad{i}", bytearray(b"nope"), 24, 24, "raw"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    got = {r["image_id"]: r["phash_computed"]
           for r in compute_phash(df.repartition(8)).collect()}
    for rid, exp in expected.items():
        assert got[rid] == exp, (rid, got[rid], exp)  # EXACT, all 64 bits
    for i in range(8):
        assert got[f"bad{i}"] is None


def test_feeds_dedup_key(spark, pairs_df):
    """The computed key joins back as a drop-in phash column."""
    ph = compute_phash(pairs_df).select(
        "image_id", F.col("phash_computed").alias("phash2"))
    j = pairs_df.join(ph, "image_id")
    n = j.filter(F.col("phash2").isNotNull()).count()
    assert n > 0.9 * pairs_df.count()
