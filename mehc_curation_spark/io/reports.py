"""Text-report rendering — graft of the reference's template sink
(``/root/reference/mehc_curation/utils/report_utils.py:42-53`` and the
section assembly at ``refinement/core/template_manager.py:24-93``):
small driver-side aggregates rendered through ``str.format`` templates,
sections included only for enabled rules.
"""

from __future__ import annotations

from mehc_curation_spark.rules.registry import CurationConfig

_HEADER = """\
==========================================
 mehc-curation-spark :: curation report
==========================================
Input rows:              {input_rows}
Kept rows:               {kept_rows}
Dropped rows:            {dropped_rows}
"""

_SECTIONS = {
    "validation": """\
-- image validation (decode gate) --------
undecodable:             {image_undecodable}
null payload:            {image_null}
bad dimensions:          {image_bad_dims}
""",
    "heuristics": """\
-- caption heuristics --------------------
empty/short/long:        {caption_size_drops}
repetition:              {caption_repetition}
low alpha / high digit:  {caption_charclass_drops}
invalid utf-8:           {caption_invalid_utf8}
""",
    "langid": """\
-- language identification ---------------
low confidence:          {lang_low_conf}
not allowed:             {lang_not_allowed}
""",
    "perplexity": """\
-- perplexity gate -----------------------
too high:                {ppl_too_high}
""",
    "pii": """\
-- PII scrub -----------------------------
emptied by scrub:        {scrub_emptied}
""",
    "toxicity": """\
-- toxicity scrub ------------------------
unprocessable:           {scrub_unprocessable}
""",
    "dedup": """\
-- deduplication -------------------------
perfect duplicates:      {duplicate_perfect}
conflicting phash:       {duplicate_conflict}
""",
}


def render_report(reason_counts: dict[str, int], total: int,
                  config: CurationConfig = CurationConfig()) -> str:
    """Render the curation report from a {drop_reason: count} dict."""
    g = lambda *ks: sum(reason_counts.get(k, 0) for k in ks)
    dropped = sum(reason_counts.values())
    data = {
        "input_rows": total,
        "kept_rows": total - dropped,
        "dropped_rows": dropped,
        "image_undecodable": g("image_undecodable"),
        "image_null": g("image_null"),
        "image_bad_dims": g("image_bad_dims"),
        "caption_size_drops": g("caption_null", "caption_empty",
                                "caption_too_short", "caption_too_long"),
        "caption_repetition": g("caption_repetition"),
        "caption_charclass_drops": g("caption_low_alpha", "caption_high_digit"),
        "caption_invalid_utf8": g("caption_invalid_utf8"),
        "lang_low_conf": g("lang_low_conf"),
        "lang_not_allowed": g("lang_not_allowed"),
        "ppl_too_high": g("ppl_too_high"),
        "scrub_emptied": g("scrub_emptied"),
        "scrub_unprocessable": g("scrub_unprocessable"),
        "duplicate_perfect": g("duplicate_perfect"),
        "duplicate_conflict": g("duplicate_conflict"),
    }
    parts = [_HEADER]
    if config.validate:
        parts.append(_SECTIONS["validation"])
    if config.rm_low_quality:
        parts.append(_SECTIONS["heuristics"])
    if config.rm_unknown_lang:
        parts.append(_SECTIONS["langid"])
    if config.rm_high_ppl:
        parts.append(_SECTIONS["perplexity"])
    if config.scrub_pii:
        parts.append(_SECTIONS["pii"])
    if config.scrub_toxicity:
        parts.append(_SECTIONS["toxicity"])
    if config.rm_dup_between_stages:
        parts.append(_SECTIONS["dedup"])
    return "".join(parts).format(**data)
