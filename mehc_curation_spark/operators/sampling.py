"""Deterministic sampling / corpus-mixture rebalancing.

A training-data pipeline rarely ships a corpus as-crawled: the
language/domain mix is rebalanced by DOWN-SAMPLING over-represented
strata (the data-level counterpart of mixture reweighting — cf.
Xie et al. 2023, DoReMi, arXiv:2305.10429; every web-corpus paper's
"we sample X% of Common Crawl" step). Spark's ``sampleBy`` is
seed-dependent on partitioning and not reproducible across engines,
which makes audits impossible — so these samplers derive the keep
decision from the ROW ITSELF:

    u48(id) = first 6 bytes of md5(id), little-endian  (uniform 48-bit)
    keep    = u48 < fraction * 2^48

Properties a pipeline actually needs:
- **Deterministic & portable**: same rows selected on any engine, any
  partitioning, any day — the DuckDB oracle states the identical
  arithmetic (md5 is md5 everywhere; the byte-assembly is plain
  integer math, no engine hash functions involved).
- **Consistent across runs at different fractions**: fraction f' > f
  selects a SUPERSET of f's rows (u48 doesn't change), so growing a
  sample never discards work.
- **Stratified**: per-stratum fractions via a map column; unknown
  strata fall back to a default fraction.

Pure Catalyst (md5 + substring + conv — whole-stage codegen); the
per-row cost is one md5 of the id, not the payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U48_MAX = float(2 ** 48)


def u48_col(c: Column) -> Column:
    """Uniform 48-bit integer from md5(c): first 6 digest bytes
    assembled little-endian (byte i contributes * 256^i). 48 bits so
    the value and every threshold fit exactly in a long AND a double
    in both engines."""
    hexd = F.md5(c.cast("string"))
    out = F.lit(0).cast("long")
    for i in range(6):
        byte = F.conv(F.substring(hexd, 2 * i + 1, 2), 16, 10).cast("long")
        out = out + byte * F.lit(256 ** i).cast("long")
    return out


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on the id."""
    thr = int(fraction * _U48_MAX)
    return df.filter(u48_col(F.col(id_col)) < F.lit(thr))


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 1.0) -> DataFrame:
    """Per-stratum deterministic down-sampling: row kept iff
    u48(id) < fraction(stratum) * 2^48. The mixture-rebalancing
    primitive ("keep 25% of en, all of everything else")."""
    thr = F.lit(int(default_fraction * _U48_MAX)).cast("long")
    for k, f in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == k,
                     F.lit(int(f * _U48_MAX)).cast("long")).otherwise(thr)
    return df.filter(u48_col(F.col(id_col)) < thr)
