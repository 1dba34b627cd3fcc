"""Z-order (Morton) clustering expression — multi-column data-skipping
layout, built entirely from Catalyst bitwise ops (JVM-side, codegen'd;
no Python in the hot path).

Why: per-file min/max stats skip files only when file boundaries align
with the queried column. A table sorted (or merely appended) in one
order skips on ~one column; a 10^12-row corpus queried by BOTH
``n_chars`` and ``doc_id`` (or ``lang`` bucket and ``phash`` range)
reads everything for the second column. Interleaving the bits of the
clustering columns into one z-value and range-partitioning on it gives
every file a tight hyper-rectangle in ALL clustered dimensions, so a
range predicate on any of them prunes ~sqrt-fraction of the files
(Delta/Iceberg ``OPTIMIZE ZORDER BY`` is this exact move; Morton 1966).

Design for 100 TB: the per-column min/max normalization is ONE small
aggregate; the z-value itself is a constant folded chain of
shift/and/or expressions inside whole-stage codegen; the layout write
is ONE range exchange (`repartitionByRange` samples the z-values).
Nothing crosses to Python.

Reference parity note: the reference engine has no clustering layout
(flat CSV in/out — mehc_curation/utils/io_utils.py); this is part of
the Iceberg-table scale story the graft adds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_col", "zorder_layout"]

#: bits kept per column after range normalization. 16 bits = 65k
#: distinct cells per dimension — far finer than any realistic file
#: count, and 4 columns still fit one signed long (64 bits).
DEFAULT_BITS = 16


def _normalize_u(col: Column, lo, hi, bits: int) -> Column:
    """Scale a numeric column into ``[0, 2^bits)`` using the observed
    [lo, hi] range. Constant range (hi == lo) maps to 0; NULLs map to
    0 (they cluster together at the low corner, keeping their file
    ranges tight instead of poisoning every file)."""
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo)))
              / F.lit(span) * F.lit(float(top)))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(top)))
    return F.coalesce(F.floor(clamped).cast("long"), F.lit(0).cast("long"))


def zvalue_col(cols: Sequence[Column], ranges: Sequence[tuple],
               bits: int = DEFAULT_BITS) -> Column:
    """Interleave ``bits`` bits of each normalized column into one
    z-value long: output bit ``i*N + j`` is bit ``i`` of column ``j``.
    Pure Catalyst (shiftleft / shiftright / bitwise and-or), so the
    whole chain constant-folds into codegen.
    """
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError(f"zvalue_col: 1-4 columns, got {n}")
    if bits * n > 63:
        raise ValueError(f"zvalue_col: {n} cols x {bits} bits exceeds "
                         "a signed long")
    codes = [_normalize_u(c, lo, hi, bits) for c, (lo, hi) in
             zip(cols, ranges)]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(code, i).bitwiseAND(F.lit(1)),
                            i * n + j))
    return z


def zorder_layout(df: DataFrame, cluster_by: Sequence[str],
                  n_files: int, bits: int = DEFAULT_BITS,
                  ranges: Optional[Sequence[tuple]] = None) -> DataFrame:
    """Return ``df`` laid out for z-order file clustering: range-
    partitioned into ``n_files`` partitions of contiguous z-value and
    sorted within each, so every written file covers a tight
    hyper-rectangle of the clustered columns. Columns must be numeric
    (cast-able to double for range normalization).

    ``ranges`` ([(lo, hi)] per column) skips the min/max aggregate when
    the caller already knows the bounds (e.g. manifest stats).
    """
    cluster_by = list(cluster_by)
    missing = [c for c in cluster_by if c not in df.columns]
    if missing:
        raise ValueError(f"zorder_layout: columns {missing} not in "
                         f"{df.columns}")
    if ranges is None:
        row = df.agg(*[f(c).alias(f"{t}_{i}")
                       for i, c in enumerate(cluster_by)
                       for t, f in (("lo", F.min), ("hi", F.max))]).first()
        ranges = [(row[f"lo_{i}"], row[f"hi_{i}"])
                  for i in range(len(cluster_by))]
    for c, (lo, hi) in zip(cluster_by, ranges):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_layout: column {c!r} is all-NULL or "
                "non-aggregatable; z-order needs numeric ranges")
    z = zvalue_col([F.col(c) for c in cluster_by], ranges, bits)
    return (df.withColumn("_zv", z)
              .repartitionByRange(max(1, n_files), "_zv")
              .sortWithinPartitions("_zv")
              .drop("_zv"))
