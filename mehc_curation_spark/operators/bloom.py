"""Spark-native Bloom-filter prefilter for cross-corpus dedup.

Spark's own ``bloom_filter_agg`` is an internal expression this build
does not register, and AQE's runtime row-level filters only inject
within one join plan — neither serves the training-data shape "build a
filter over the REFERENCE corpus once, prefilter the huge candidate
corpus map-side, then run the expensive verify only on survivors". So
this module builds one natively:

- **Build** is pure Catalyst: each key's ``n_hashes`` bit positions
  come from ``xxhash64(key, seed+i) mod n_bits`` (JVM-side, codegen),
  and the bitmap is a two-phase ``bit_or`` aggregation of 64-bit words
  keyed by ``position >> 6`` — at most ``n_bits / 64`` rows ever reach
  the driver regardless of corpus size.
- **Probe** computes the SAME position expression (shared builder =
  guaranteed hash parity) and tests bits with a vectorized Arrow UDF
  over the closure-captured numpy bitmap. PySpark broadcasts pickled
  UDF commands above 1 MB automatically, so the bitmap ships to each
  executor once, not per task.

Guarantee: a Bloom filter has NO false negatives — every candidate
whose key exists in the reference corpus survives the prefilter; the
false-positive rate is ~(1 - e^(-k*n/m))^k for n keys, m bits, k
hashes. At 100 TB the candidate corpus never shuffles at all for the
membership test (narrow map stage); the reference side aggregates to
m/64 longs. Reference corpora beyond ~10^8 keys (bitmap >> 1 GB)
should fall back to the exact broadcast/shuffle semi-join or a
partitioned-bloom variant.

No analog in the reference repo (its dedup is within-corpus, pandas
isin — /root/reference/mehc_curation/utils/common.py:121); this is
the cross-corpus prefilter the build brief's 100 TB dedup mandate
implies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions_col(key: Column, n_bits: int, n_hashes: int,
                   seed: int) -> Column:
    """array<long> of the key's bit positions — the ONE definition
    both build and probe use, so parity is structural, not tested-for.
    ``pmod`` keeps positions non-negative; NULL keys are the caller's
    problem (xxhash64 of NULL degenerates to the seed, so callers gate
    NULLs out first)."""
    return F.array([
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(n_bits))
        for i in range(n_hashes)
    ])


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 1 << 20,
                n_hashes: int = 5, seed: int = 42) -> np.ndarray:
    """Aggregate the reference corpus into a Bloom bitmap:
    ``uint64[n_bits / 64]``. Runs ONE Spark job (explode + two-phase
    bit_or agg); the collected frame is at most ``n_bits / 64`` rows
    however large the corpus. NULL keys are skipped (they are not
    members of anything)."""
    assert n_bits % 64 == 0
    pos = (df.filter(F.col(key_col).isNotNull())
             .select(F.explode(_positions_col(F.col(key_col), n_bits,
                                              n_hashes, seed)).alias("p")))
    # shiftleft's Python API takes only int literals for the shift
    # amount, so the per-position word is an expr
    words = (pos.groupBy(F.shiftright("p", 6).alias("w"))
                .agg(F.bit_or(
                    F.expr("shiftleft(1L, cast(pmod(p, 64) as int))")
                ).alias("bits")))
    bitmap = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words.collect():
        bitmap[r["w"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def bloom_member_col(key: Column, bitmap: np.ndarray, n_hashes: int = 5,
                     seed: int = 42) -> Column:
    """Boolean membership test column. Hashing stays JVM-side (the
    shared position expression); only the bitmap lookup crosses to
    Python, vectorized over the whole Arrow batch. NULL keys -> NULL."""
    n_bits = int(bitmap.shape[0]) * 64
    bm = bitmap  # closure capture; >1MB pickled commands are broadcast

    @pandas_udf("boolean")
    def _member(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(pos.to_numpy())          # (rows, n_hashes) int64
        w = mat >> 6
        b = (mat & 63).astype(np.uint64)
        hit = (bm[w] >> b) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return F.when(key.isNull(), F.lit(None).cast("boolean")).otherwise(
        _member(_positions_col(key, n_bits, n_hashes, seed)))


def bloom_prefilter(cand_df: DataFrame, ref_df: DataFrame, key_col: str,
                    ref_key_col: str | None = None, n_bits: int = 1 << 20,
                    n_hashes: int = 5, seed: int = 42) -> DataFrame:
    """Keep the candidate rows whose ``key_col`` is POSSIBLY present in
    the reference corpus (superset-of-exact by the no-false-negative
    property; the false-positive tail is what the downstream exact /
    MinHash / cosine verify removes). Candidate rows with NULL keys are
    dropped (a NULL key matches nothing). The candidate side is a
    narrow map stage — zero shuffles, zero joins."""
    ref_key = ref_key_col or key_col
    bitmap = bloom_build(ref_df, ref_key, n_bits, n_hashes, seed)
    member = bloom_member_col(F.col(key_col), bitmap, n_hashes, seed)
    return cand_df.filter(member)
