"""URL canonicalization + canonical-URL deduplication — the web-crawl
front door of a training-data pipeline (CCNet / DataComp-style: the
same page is crawled under http/https, with/without www, with tracking
params, fragments, default ports, trailing slashes — all of which must
collapse to ONE identity before any text-level dedup runs).

Everything is built from Catalyst string/regexp/array expressions
(JVM-side, whole-stage codegen) — no UDF, no Python in the hot path —
so at 10^12 rows the canonicalization is free relative to the scan and
the dedup is one hash aggregate on the canonical key.

Reference parity note: the reference engine has no URL surface (its
inputs are id+SMILES CSVs — mehc_curation/utils/io_utils.py); this is
part of the web-scale ingestion story the graft adds, same tier as
language-ID and boilerplate scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url_col", "url_dedup", "TRACKING_PARAM_RE"]

#: fully-anchored match for query params that carry tracking state,
#: not content identity (utm_* et al). Kept RE2-compatible so a SQL
#: oracle (DuckDB regexp_matches) can restate it verbatim.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)(=.*)?$"


def canonicalize_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as a pure Catalyst
    expression:

    0. remove ALL whitespace (browsers strip tabs/newlines from URLs;
       a literal space is never URL data — %20 is — and removing them
       outright is what makes the chain idempotent on junk input);
    1. strip the fragment (``#...``);
    2. lowercase the scheme and host (path/query stay case-sensitive);
    3. drop the scheme's default port (``:80`` http, ``:443`` https);
    4. drop a leading ``www.``;
    5. drop tracking query params (:data:`TRACKING_PARAM_RE`), sort
       the survivors bytewise, and drop the ``?`` when none survive;
    6. strip trailing slashes from the path (empty path → ``/``).

    NULL in → NULL out. Non-URL strings pass through steps that don't
    apply (no scheme → no scheme-dependent port strip).
    """
    u = F.regexp_replace(F.regexp_replace(url, r"\s+", ""), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")
    # scheme-less input stays scheme-less (prepending '://' would make
    # the result re-parse differently — canonicalization must be
    # idempotent: canon(canon(u)) == canon(u), pinned by tests)
    prefix = F.when(scheme == "", F.lit("")) \
              .otherwise(F.concat(scheme, F.lit("://")))
    return F.when(
        url.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(prefix, host, path,
                 F.when(qs != "", F.concat(F.lit("?"), qs))
                 .otherwise(F.lit(""))))


def url_dedup(df: DataFrame, url_col: str, id_col: str,
              canon_col: str = "canonical_url") -> DataFrame:
    """Keep-first deduplication by CANONICAL url: one row per
    canonical form, the keeper being the smallest ``id_col``
    (deterministic across partitionings; ties broken by the remaining
    columns). Rows whose URL is NULL are kept as-is (no identity to
    collapse on).

    Scale shape: canonicalization is codegen'd into the scan and the
    keep-first is ONE hash aggregate — ``min(struct(id, rest...))``
    per canonical key, with map-side partial combine. No join back:
    an agg-then-semi-join plan would shuffle the corpus a second time
    against a keeper set that is itself corpus-sized (never
    broadcastable), which is exactly the shape that falls over at
    10^12 rows.
    """
    canon = df.withColumn(canon_col, canonicalize_url_col(F.col(url_col)))
    rest = [c for c in canon.columns
            if c not in (canon_col, id_col)]
    kept = (canon.filter(F.col(canon_col).isNotNull())
            .groupBy(canon_col)
            .agg(F.min(F.struct(id_col, *rest)).alias("_keep"))
            .select(canon_col, "_keep.*")
            .select(*canon.columns))
    return kept.unionByName(canon.filter(F.col(canon_col).isNull()))
