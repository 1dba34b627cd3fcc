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
    "imgquality": """\
-- image quality gate --------------------
too small:               {img_too_small}
extreme aspect:          {img_extreme_aspect}
blurry:                  {img_blurry}
low entropy:             {img_low_entropy}
flat:                    {img_flat}
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


# ---------------------------------------------------------------------------
# Stage-scoped reports — the reference renders one report per stage,
# each step a {input, bad, good} triple under a numbered heading
# (template_report/validation_title.txt + validity_check.txt etc.,
# assembled by validation/core/template_manager.py). Same granularity
# here with the graft's step names.
# ---------------------------------------------------------------------------

_STAGE_TITLE = """\
*****************************************************************
*                       {title}
*****************************************************************
"""

_STEP = """\
================================================
{num}. {name}
================================================
Number of input captions: {input}
Number of {bad_label}: {bad}
Number of {good_label}: {good}
"""


def _step(num: str, name: str, fmt: dict, bad_key: str, bad_label: str,
          good_label: str, good: int | None = None) -> str:
    bad = fmt[bad_key]
    return _STEP.format(num=num, name=name, input=fmt["input"],
                        bad_label=bad_label, bad=bad,
                        good_label=good_label,
                        good=fmt["input"] - bad if good is None else good)


def render_validation_report(metrics: dict,
                             config: CurationConfig = CurationConfig()) -> str:
    """Per-step validation report (≅ template_report/refining.txt:1-35:
    VALIDITY CHECK / 1.1-1.3 removals, graft step names)."""
    parts = [_STAGE_TITLE.format(title="1. VALIDATION")]
    if config.validate and "validate" in metrics:
        m = metrics["validate"]
        parts.append(_step("0", "DECODE CHECK", m, "invalid",
                           "undecodable images", "valid images",
                           good=m["valid"]))
    if config.rm_low_quality and "rm_low_quality" in metrics:
        m = metrics["rm_low_quality"]
        parts.append(_step("1.1", "LOW-QUALITY REMOVAL", m, "invalid",
                           "low-quality captions", "quality captions",
                           good=m["valid"]))
    if config.rm_unknown_lang and "rm_unknown_lang" in metrics:
        m = metrics["rm_unknown_lang"]
        parts.append(_step("1.2", "UNKNOWN-LANGUAGE REMOVAL", m, "invalid",
                           "unknown-language captions", "allowed-language captions",
                           good=m["valid"]))
    if config.rm_high_ppl and "rm_high_ppl" in metrics:
        m = metrics["rm_high_ppl"]
        parts.append(_step("1.3", "HIGH-PERPLEXITY REMOVAL", m, "invalid",
                           "high-perplexity captions", "fluent captions",
                           good=m["valid"]))
    return "\n".join(parts)


def render_cleaning_report(metrics: dict,
                           config: CurationConfig = CurationConfig()) -> str:
    """Per-step cleaning report (≅ salt_cleaning.txt + neutralization.txt
    with the graft's PII/toxicity step names)."""
    parts = [_STAGE_TITLE.format(title="2. CLEANING")]
    if config.scrub_pii and "scrub_pii" in metrics:
        m = metrics["scrub_pii"]
        parts.append(_step("2.1", "PII SCRUB", m, "emptied",
                           "captions emptied by scrub",
                           "post-scrub captions"))
        parts.append(f"Number of captions with PII hits: {m['pii_hits']}\n")
    if config.scrub_toxicity and "scrub_toxicity" in metrics:
        m = metrics["scrub_toxicity"]
        parts.append(_step("2.2", "TOXICITY SCRUB", m, "unprocessable",
                           "unprocessable captions",
                           "post-scrub captions"))
        parts.append(f"Number of scrubbed captions: {m['neutralized']}\n")
    return "\n".join(parts)


def render_normalization_report(metrics: dict,
                                config: CurationConfig = CurationConfig()) -> str:
    """Per-step normalization report (≅ destereoisomerization.txt +
    detautomerization.txt; rewrites, no drops)."""
    parts = [_STAGE_TITLE.format(title="3. NORMALIZATION"), """\
================================================
3. NORMALIZATION (rewrites, no drops)
================================================
Number of input captions: {input}
Number of lossy-normalized captions: {normalized_lossy}
Number of canonicalized captions: {normalized_canonical}
""".format(**metrics)]
    return "\n".join(parts)


_DEDUP_REPORT = """\
*****************************************************************
*                       DEDUPLICATION
*****************************************************************
================================================
Duplicate validation
================================================
Number of input rows:          {duplicate_validation_input}
Keys with perfect duplicates:  {perfect_dups}
Keys with conflicting values:  {partial_dups}
Number of unique rows kept:    {validation_unique}
"""


def render_dedup_report(format_data: dict) -> str:
    """Standalone dedup report — the reference's ``deduplicate()``
    renders its own template with a fallback when the template file is
    missing (``/root/reference/mehc_curation/utils/common.py:140-174``);
    this is the graft's equivalent over the counters dict that
    ``operators.dedup.deduplicate(return_format_data=True)`` returns.
    A nested ``validation`` block (validate=True) is appended as one
    extra line per counter."""
    out = _DEDUP_REPORT.format(**{
        k: format_data.get(k, 0)
        for k in ("duplicate_validation_input", "perfect_dups",
                  "partial_dups", "validation_unique")})
    val = format_data.get("validation")
    if val:
        out += ("-- pre-dedup image validation ----------\n"
                + "".join(f"{k}: {v}\n" for k, v in val.items()))
    return out


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
        "img_too_small": g("img_too_small"),
        "img_extreme_aspect": g("img_extreme_aspect"),
        "img_blurry": g("img_blurry"),
        "img_low_entropy": g("img_low_entropy"),
        "img_flat": g("img_flat"),
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
    if config.rm_low_quality_image:
        parts.append(_SECTIONS["imgquality"])
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
