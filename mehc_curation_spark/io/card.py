"""Dataset card — the summary artifact shipped alongside a curated
corpus (datasheet/dataset-card practice: Gebru et al. 2021,
arXiv:1803.09010; every released web corpus publishes one).

One cheap aggregation pass over the corpus (plus one per-language
rollup): row/token/char totals, token-length percentiles, language
mix, exact-duplicate rate (md5 fingerprint cardinality), distilled
quality-model keep rate. Everything is an aggregate — no window, no
sort, no Python; at 100 TB this is a single map-side-combinable sweep.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_card(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 lang_col: Optional[str] = "lang",
                 top_langs: int = 10,
                 exact_distinct: bool = False) -> dict:
    """Compute the card as a plain dict (JSON-ready).

    ``exact_distinct=False`` (default) estimates fingerprint
    cardinality with HyperLogLog++ (rsd 1%) — the scale-correct choice;
    pass True for the exact count when reconciling small corpora.
    """
    from mehc_curation_spark.operators.quality_model import score_quality
    from mehc_curation_spark.operators.text_stats import (
        fingerprint_col,
        token_count_col,
    )

    base = (score_quality(df, text_col)
            .select(F.col(id_col),
                    F.col(text_col).alias("_text"),
                    token_count_col(F.col(text_col)).alias("_ntok"),
                    F.length(text_col).alias("_nchr"),
                    fingerprint_col(F.col(text_col)).alias("_fp"),
                    "q_score", "q_keep",
                    *( [F.col(lang_col).alias("_lang")]
                       if lang_col else [] )))
    distinct_fp = (F.count_distinct("_fp") if exact_distinct
                   else F.approx_count_distinct("_fp", 0.01))
    agg = base.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("_text").isNull().cast("long")).alias("null_text"),
        F.sum("_ntok").alias("tokens"),
        F.sum("_nchr").alias("chars"),
        F.percentile_approx("_ntok", [0.5, 0.95, 0.99], 10000)
         .alias("tok_p"),
        distinct_fp.alias("distinct_fp"),
        F.round(F.avg("q_score"), 4).alias("mean_q_score"),
        F.sum(F.col("q_keep").cast("long")).alias("q_kept"),
    ).first()
    rows = agg["rows"]
    nn = rows - int(agg["null_text"] or 0)   # rows with a fingerprint
    card = {
        "rows": rows,
        "null_text": int(agg["null_text"] or 0),
        "tokens": int(agg["tokens"] or 0),
        "chars": int(agg["chars"] or 0),
        "tokens_per_doc": {
            "p50": int(agg["tok_p"][0]) if agg["tok_p"] else 0,
            "p95": int(agg["tok_p"][1]) if agg["tok_p"] else 0,
            "p99": int(agg["tok_p"][2]) if agg["tok_p"] else 0,
        },
        "distinct_fingerprints": int(agg["distinct_fp"] or 0),
        # rate over rows that HAVE a fingerprint (NULL text carries no
        # fingerprint and must not read as a duplicate), clamped at 0
        # because the HLL estimator can overshoot the true cardinality
        "exact_dup_rate": round(max(
            0.0, 1.0 - (agg["distinct_fp"] or 0) / nn), 4) if nn else 0.0,
        "dup_estimator": "exact" if exact_distinct else "hll_rsd1pct",
        "quality": {"mean_q_score": float(agg["mean_q_score"] or 0.0),
                    "keep_rate": round((agg["q_kept"] or 0) / rows, 4)
                    if rows else 0.0},
    }
    if lang_col:
        langs = (base.groupBy("_lang").agg(F.count("*").alias("n"))
                 .orderBy(F.desc("n"), F.asc_nulls_last("_lang"))
                 .limit(top_langs).collect())
        card["languages"] = [
            {"lang": r["_lang"], "rows": r["n"],
             "share": round(r["n"] / rows, 4) if rows else 0.0}
            for r in langs]
    return card


def render_card(card: dict, title: str = "DATASET CARD") -> str:
    lines = [
        "=" * 46,
        f" {title}",
        "=" * 46,
        f"Rows:                    {card['rows']:,}",
        f"  null text:             {card['null_text']:,}",
        f"Tokens:                  {card['tokens']:,}",
        f"Chars:                   {card['chars']:,}",
        (f"Tokens/doc p50/p95/p99:  {card['tokens_per_doc']['p50']}"
         f" / {card['tokens_per_doc']['p95']}"
         f" / {card['tokens_per_doc']['p99']}"),
        (f"Exact-dup rate:          {card['exact_dup_rate']:.2%}"
         f"  ({card['dup_estimator']})"),
        (f"Quality keep rate:       {card['quality']['keep_rate']:.2%}"
         f"  (mean score {card['quality']['mean_q_score']:.4f})"),
    ]
    if "languages" in card:
        lines.append("Languages:")
        for e in card["languages"]:
            lines.append(f"  {str(e['lang']):<10} {e['rows']:>10,}"
                         f"  {e['share']:.2%}")
    lines.append("=" * 46)
    return "\n".join(lines)


#: Default drift thresholds: relative/absolute shifts that should page
#: a pipeline owner between corpus versions.
DRIFT_THRESHOLDS = {
    "dup_rate_jump": 0.02,    # absolute increase in exact-dup rate
    "keep_rate_drop": 0.02,   # absolute drop in quality keep rate
    "lang_tv": 0.10,          # total-variation distance of language mix
    "tok_p50_rel": 0.20,      # relative shift of the median doc length
}


def card_drift(old: dict, new: dict,
               thresholds: Optional[dict] = None) -> dict:
    """Compare two dataset cards (successive corpus versions) and flag
    regressions — the drift check a continuous-ingestion pipeline runs
    after every increment (duplicate blow-ups, quality collapses,
    language-mix shifts are the classic silent failures).

    Pure dict arithmetic over already-computed cards (no second corpus
    pass): deltas are rounded to 4 decimals, the language shift is the
    total-variation distance over the union of the cards' language
    rollups (compute the cards with ``top_langs`` >= the corpus's
    language count for the exact mix; truncated rollups make this a
    lower bound). Returns {deltas, flags, ok}.
    """
    th = dict(DRIFT_THRESHOLDS, **(thresholds or {}))
    old_p50 = old["tokens_per_doc"]["p50"]
    shares_old = {e["lang"]: e["share"] for e in old.get("languages", [])}
    shares_new = {e["lang"]: e["share"] for e in new.get("languages", [])}
    tv = round(sum(abs(shares_new.get(k, 0.0) - shares_old.get(k, 0.0))
                   for k in set(shares_old) | set(shares_new)) / 2.0, 4)
    deltas = {
        "rows_rel": round(new["rows"] / old["rows"] - 1.0, 4)
        if old["rows"] else None,
        "dup_rate": round(new["exact_dup_rate"] - old["exact_dup_rate"], 4),
        "keep_rate": round(new["quality"]["keep_rate"]
                           - old["quality"]["keep_rate"], 4),
        "tok_p50_rel": round(new["tokens_per_doc"]["p50"] / old_p50 - 1.0, 4)
        if old_p50 else None,
        "lang_tv": tv,
    }
    flags = sorted(
        name for name, hit in (
            ("dup_rate_jump", deltas["dup_rate"] > th["dup_rate_jump"]),
            ("keep_rate_drop", -deltas["keep_rate"] > th["keep_rate_drop"]),
            ("lang_tv", tv > th["lang_tv"]),
            ("tok_p50_rel",
             deltas["tok_p50_rel"] is not None
             and abs(deltas["tok_p50_rel"]) > th["tok_p50_rel"]),
        ) if hit)
    return {"deltas": deltas, "flags": flags, "ok": not flags}
