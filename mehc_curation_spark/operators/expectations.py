"""Declarative data-quality expectations over DataFrames and snapshot
tables: named rules (not-null, unique, range, regex, set membership,
arbitrary SQL predicate) evaluated in ONE aggregate pass, row-level
enforcement with a quarantine frame, and a gate for the snapshot
catalog's write-audit-publish flow (publish a staged branch only when
the audit rules hold).

This is the contract layer a 10^12-row corpus needs between "a job
wrote rows" and "downstream may read them": the reference pipeline
hard-codes its gates inside each stage
(/root/reference/mehc_curation/refinement/core/pipeline.py:74-81);
here the same idea is generalized to user-declared per-table rules,
in the shape popularized by Delta Live Tables expectations and Great
Expectations (public docs; API re-designed for Catalyst one-pass
evaluation, no code taken).

Scale notes:
- ``expectation_report`` compiles every row-level rule into a
  conditional SUM inside a single global aggregate — one job, one
  map-side-combined exchange carrying exactly one row per partition,
  regardless of rule count. No per-rule pass, no collect of data rows.
- ``expect_unique`` needs exact distinct counts; each distinct column
  adds an Expand branch to the same aggregate (Spark's standard
  multi-count-distinct plan). Still one job; the shuffle carries
  (rule-count + 1) slim columns.
- ``enforce_expectations`` is a pure narrow select/filter — zero
  shuffles; the quarantine frame shares the scan via the usual
  lazy-plan reuse.

NULL semantics (pinned, oracle-tested): ``expect_not_null`` is the
ONLY rule that fails on NULL. Value-shape rules (range / regex / set)
PASS on NULL — missingness is one defect, malformation another, and
conflating them double-counts every NULL under two rules. A raw
``expect_sql`` predicate that evaluates to NULL counts as a FAILURE
(unknown is not evidence of validity — same strictness as
``alignment_filter``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "expect_not_null",
    "expect_in_range",
    "expect_matches",
    "expect_in_set",
    "expect_sql",
    "expect_unique",
    "expectation_report",
    "enforce_expectations",
    "audit_branch",
    "publish_if_valid",
]


@dataclass(frozen=True)
class Expectation:
    """One named rule. ``predicate`` is a row-level boolean Column
    (True = row passes) for row rules; ``unique_col`` is set instead
    for the table-level uniqueness rule. ``max_fail_fraction`` is the
    tolerated violation share (0.0 = strict); the report's ``passed``
    compares against it."""

    name: str
    predicate: Optional[Column] = None
    unique_col: Optional[str] = None
    max_fail_fraction: float = 0.0

    def __post_init__(self):
        if (self.predicate is None) == (self.unique_col is None):
            raise ValueError(
                f"expectation {self.name!r}: exactly one of predicate "
                f"/ unique_col must be set")
        if not (0.0 <= self.max_fail_fraction < 1.0):
            raise ValueError(
                f"expectation {self.name!r}: max_fail_fraction must "
                f"be in [0, 1), got {self.max_fail_fraction}")


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def expect_not_null(col: Union[str, Column], name: Optional[str] = None,
                    max_fail_fraction: float = 0.0) -> Expectation:
    cn = col if isinstance(col, str) else "expr"
    return Expectation(name or f"{cn}_not_null", _col(col).isNotNull(),
                       max_fail_fraction=max_fail_fraction)


def expect_in_range(col: Union[str, Column], lo, hi,
                    name: Optional[str] = None,
                    max_fail_fraction: float = 0.0) -> Expectation:
    """Closed interval [lo, hi]; NULL passes (see module NULL
    semantics)."""
    c = _col(col)
    cn = col if isinstance(col, str) else "expr"
    pred = c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))
    return Expectation(name or f"{cn}_in_range", pred,
                       max_fail_fraction=max_fail_fraction)


def expect_matches(col: Union[str, Column], pattern: str,
                   name: Optional[str] = None,
                   max_fail_fraction: float = 0.0) -> Expectation:
    """Full-match NOT required: ``rlike`` search semantics, anchor
    with ^...$ when the whole value must conform. NULL passes."""
    c = _col(col)
    cn = col if isinstance(col, str) else "expr"
    pred = c.isNull() | c.rlike(pattern)
    return Expectation(name or f"{cn}_matches", pred,
                       max_fail_fraction=max_fail_fraction)


def expect_in_set(col: Union[str, Column], values: Sequence,
                  name: Optional[str] = None,
                  max_fail_fraction: float = 0.0) -> Expectation:
    """NULL passes; membership is the strict SQL IN over literals."""
    c = _col(col)
    cn = col if isinstance(col, str) else "expr"
    pred = c.isNull() | c.isin(list(values))
    return Expectation(name or f"{cn}_in_set", pred,
                       max_fail_fraction=max_fail_fraction)


def expect_sql(name: str, sql_predicate: str,
               max_fail_fraction: float = 0.0) -> Expectation:
    """Arbitrary SQL boolean expression; a NULL result counts as a
    FAILURE (the caller wrote the whole predicate, so NULL handling is
    the caller's to encode — strict by default)."""
    return Expectation(name, F.expr(sql_predicate),
                       max_fail_fraction=max_fail_fraction)


def expect_unique(col: str, name: Optional[str] = None,
                  max_fail_fraction: float = 0.0) -> Expectation:
    """Table-level uniqueness over non-NULL values of ``col``:
    violations = count(col) - count(distinct col) (the surplus
    copies). NULL keys are not evaluated (missingness belongs to
    ``expect_not_null``)."""
    return Expectation(name or f"{col}_unique", unique_col=col,
                       max_fail_fraction=max_fail_fraction)


def _fail_flag(e: Expectation) -> Column:
    """1 when the row VIOLATES e (NULL predicate = violation)."""
    return F.when(F.coalesce(e.predicate, F.lit(False)), F.lit(0)) \
            .otherwise(F.lit(1))


def expectation_report(df: DataFrame,
                       expectations: Sequence[Expectation]) -> DataFrame:
    """Evaluate every rule in ONE aggregate job; returns one report
    row per rule: ``rule, n_evaluated, n_violations, fail_fraction,
    max_fail_fraction, passed`` (sorted by rule name — deterministic
    and oracle-friendly).

    The single-row aggregate is exploded JVM-side into the per-rule
    rows — nothing is collected to the driver."""
    if not expectations:
        raise ValueError("expectation_report: no expectations given")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {sorted(names)}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        if e.predicate is not None:
            aggs.append(F.sum(_fail_flag(e)).alias(f"__v{i}"))
        else:
            aggs.append(F.count(e.unique_col).alias(f"__e{i}"))
            aggs.append(F.count_distinct(F.col(e.unique_col))
                        .alias(f"__d{i}"))
    one = df.agg(*aggs)

    entries = []
    for i, e in enumerate(expectations):
        if e.predicate is not None:
            n_eval = F.col("__n")
            n_viol = F.coalesce(F.col(f"__v{i}"), F.lit(0))
        else:
            n_eval = F.col(f"__e{i}")
            n_viol = F.col(f"__e{i}") - F.col(f"__d{i}")
        entries.append(F.struct(
            F.lit(e.name).alias("rule"),
            n_eval.cast("long").alias("n_evaluated"),
            n_viol.cast("long").alias("n_violations"),
            F.round(n_viol / F.when(n_eval > 0, n_eval.cast("double")),
                    6).alias("fail_fraction"),
            F.lit(float(e.max_fail_fraction)).alias("max_fail_fraction"),
            # empty table (or all-NULL unique key) has no evidence of
            # violation -> passes
            F.when(n_eval > 0,
                   (n_viol / n_eval.cast("double"))
                   <= F.lit(float(e.max_fail_fraction)))
             .otherwise(F.lit(True)).alias("passed"),
        ))
    return (one.select(F.explode(F.array(*entries)).alias("r"))
               .select("r.*").orderBy("rule"))


def enforce_expectations(df: DataFrame,
                         expectations: Sequence[Expectation],
                         ) -> tuple[DataFrame, DataFrame]:
    """Row-level enforcement: returns ``(clean, quarantine)`` where
    quarantine rows carry ``failed_expectations`` — the
    alphabetically-sorted array of violated rule names — and clean
    rows are exactly the input rows violating nothing. Table-level
    (unique) rules cannot be attributed to single rows and are
    rejected here; run them through :func:`expectation_report`.

    Pure narrow plan: one select + two filters over the same scan,
    zero shuffles. ``max_fail_fraction`` is a REPORT concept; row
    enforcement is per-row and ignores it by design (a tolerated
    aggregate failure rate still quarantines each offending row).
    """
    row_rules = [e for e in expectations if e.predicate is not None]
    if len(row_rules) != len(expectations):
        bad = [e.name for e in expectations if e.predicate is None]
        raise ValueError(
            f"enforce_expectations: table-level rules {bad} cannot be "
            f"enforced per-row; use expectation_report for them")
    if not row_rules:
        raise ValueError("enforce_expectations: no expectations given")
    rules_sorted = sorted(row_rules, key=lambda e: e.name)
    fails = F.filter(
        F.array(*[F.when(_fail_flag(e) == 1, F.lit(e.name))
                  for e in rules_sorted]),
        lambda x: x.isNotNull())
    tagged = df.withColumn("failed_expectations", fails)
    clean = (tagged.filter(F.size("failed_expectations") == 0)
                   .drop("failed_expectations"))
    quarantine = tagged.filter(F.size("failed_expectations") > 0)
    return clean, quarantine


def audit_branch(table, spark, branch: str,
                 expectations: Sequence[Expectation],
                 ) -> tuple[bool, DataFrame]:
    """Run the rules against a staged branch's head (the AUDIT step of
    write-audit-publish). Returns ``(ok, report_df)``; reads the
    branch via the catalog's ref-aware read, so time travel, schema
    evolution and data skipping all apply."""
    df = table.read(spark, version=branch)
    report = expectation_report(df, expectations)
    ok = report.filter(~F.col("passed")).limit(1).count() == 0
    return ok, report


def publish_if_valid(table, spark, branch: str,
                     expectations: Sequence[Expectation]) -> int:
    """The full WAP gate: audit ``branch``; fast-forward ``main`` to
    it only when every rule passes, else raise with the failing rules
    named (the staged branch stays for inspection)."""
    ok, report = audit_branch(table, spark, branch, expectations)
    if not ok:
        failing = [r["rule"] for r in
                   report.filter(~F.col("passed")).collect()]
        raise ValueError(
            f"audit of branch {branch!r} failed expectations "
            f"{failing}; main not advanced (branch kept for "
            f"inspection)")
    return table.fast_forward("main", branch)
