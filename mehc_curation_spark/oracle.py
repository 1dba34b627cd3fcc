"""Single-process pure-pandas reference curator (the oracle).

Implements the exact same pipeline the Spark engine runs — same rule
registry, same shared rule functions, same stage ordering and dedup
gates (mirroring ``complete_refinement``,
``/root/reference/mehc_curation/refinement/core/pipeline.py:23-291``) —
but eagerly, single-threaded, over a pandas DataFrame. The Spark
pipeline's keep/drop labels are graded against this output (target
F1 ≥ 0.99; in practice exact equality since both import the same rule
code).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mehc_curation_spark.rules.decode import decode_reason
from mehc_curation_spark.rules.heuristics import heuristic_reason
from mehc_curation_spark.rules.langid import classify_batch, UNKNOWN
from mehc_curation_spark.rules.pii import scrub_pii
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.rules.textnorm import normalize_canonical, normalize_lossy
from mehc_curation_spark.rules.toxicity import scrub_toxicity

_DEFAULT_PPL = 4000.0


def _dedup_reasons(sub: pd.DataFrame) -> pd.Series:
    """Drop reasons for one dedup pass over the current survivors.

    Exact reproduction of the reference semantics
    (``utils/common.py:88-113``) on key=phash:

    - a phash with >1 distinct current caption is *conflicting*:
      ALL its rows are dropped ('duplicate_conflict') — not keep-first;
    - otherwise duplicate (phash, caption) rows beyond the first
      (ordered by image_id) are dropped ('duplicate_perfect').
    """
    s = sub.sort_values("image_id")
    nuniq = s.groupby("phash")["caption"].transform("nunique")
    conflict = nuniq > 1
    perfect = s.duplicated(subset=["phash", "caption"], keep="first") & ~conflict
    reasons = pd.Series(np.where(conflict, "duplicate_conflict",
                                 np.where(perfect, "duplicate_perfect", None)),
                        index=s.index, dtype=object)
    return reasons.reindex(sub.index)


def curate_oracle(pdf: pd.DataFrame,
                  config: CurationConfig = CurationConfig()) -> pd.DataFrame:
    """Run the full curation pipeline in pandas.

    Returns the labels table (FIXTURES.md T2):
    ``image_id, keep, drop_reason, caption_scrubbed, lang, lang_conf, ppl``.
    """
    n = len(pdf)
    work = pdf.reset_index(drop=True)
    caption = work["caption"].copy()          # evolves through stages
    keep = np.ones(n, dtype=bool)
    reason = np.full(n, None, dtype=object)

    def drop(mask: np.ndarray, why) -> None:
        m = keep & np.asarray(mask, dtype=bool)
        reason[m] = why if isinstance(why, str) else np.asarray(why, dtype=object)[m]
        keep[m] = False

    # langid + perplexity computed once on the original caption for all
    # rows (labels are reported even for dropped rows).
    langs, confs, ppls = classify_batch(list(work["caption"]))

    # ---- stage 1: validation -------------------------------------------
    if config.validate:
        from mehc_curation_spark.rules.decode import decode_quality_reason

        iq = config.iq_thresholds()
        reasons = np.array(
            [decode_quality_reason(b, f, w, h, iq) for b, f, w, h in
             zip(work["bytes"], work["fmt"], work["w"], work["h"])],
            dtype=object)
        drop(pd.notnull(reasons), reasons)

    if config.rm_low_quality:
        reasons = np.array([heuristic_reason(c) if k else None
                            for c, k in zip(caption, keep)], dtype=object)
        drop(pd.notnull(reasons), reasons)

    if config.rm_unknown_lang:
        low = (langs == UNKNOWN) | (confs < config.min_lang_margin)
        drop(low, "lang_low_conf")
        not_allowed = ~np.isin(langs.astype(str), config.allowed_langs) & ~low
        drop(not_allowed, "lang_not_allowed")

    if config.rm_high_ppl:
        thr_map = config.ppl_threshold_map()
        thr = np.array([thr_map.get(l, _DEFAULT_PPL) for l in langs])
        drop(ppls > thr, "ppl_too_high")

    gates = config.dedup_gates()
    if gates[0]:
        sub = pd.DataFrame({"image_id": work["image_id"], "phash": work["phash"],
                            "caption": caption})[keep]
        r = _dedup_reasons(sub)
        drop(r.reindex(range(n)).notna().to_numpy(), r.reindex(range(n)).to_numpy())

    # ---- stage 2: cleaning (scrubs) ------------------------------------
    if config.scrub_pii:
        res = [scrub_pii(c) if k else (c, False, False)
               for c, k in zip(caption, keep)]
        caption = pd.Series([r[0] for r in res], index=caption.index, dtype=object)
        emptied = np.array([r[2] for r in res], dtype=bool)
        drop(emptied, "scrub_emptied")

    if config.scrub_toxicity:
        res = [scrub_toxicity(c, config.toxicity_method) if k else (c, 0)
               for c, k in zip(caption, keep)]
        caption = pd.Series([r[0] for r in res], index=caption.index, dtype=object)
        unproc = np.array([k and r[1] is None
                           for r, k in zip(res, keep)], dtype=bool)
        drop(unproc, "scrub_unprocessable")

    if config.validate_post_scrub:
        # ≅ validate_post_neutr: re-filters rows, counters discarded
        # (refinement/core/pipeline.py:217-228): scrubbing may have
        # degraded the caption below the heuristic floor.
        reasons = np.array([heuristic_reason(c) if k else None
                            for c, k in zip(caption, keep)], dtype=object)
        drop(pd.notnull(reasons), reasons)

    if gates[1]:
        sub = pd.DataFrame({"image_id": work["image_id"], "phash": work["phash"],
                            "caption": caption})[keep]
        r = _dedup_reasons(sub)
        drop(r.reindex(range(n)).notna().to_numpy(), r.reindex(range(n)).to_numpy())

    # ---- stage 3: normalization ----------------------------------------
    if config.normalize_lossy:
        caption = pd.Series([normalize_lossy(c)[0] if k else c
                             for c, k in zip(caption, keep)],
                            index=caption.index, dtype=object)
    if config.normalize_canonical:
        caption = pd.Series([normalize_canonical(c)[0] if k else c
                             for c, k in zip(caption, keep)],
                            index=caption.index, dtype=object)

    if gates[2]:
        sub = pd.DataFrame({"image_id": work["image_id"], "phash": work["phash"],
                            "caption": caption})[keep]
        r = _dedup_reasons(sub)
        drop(r.reindex(range(n)).notna().to_numpy(), r.reindex(range(n)).to_numpy())

    out = pd.DataFrame({
        "image_id": work["image_id"],
        "keep": keep,
        "drop_reason": reason,
        "caption_scrubbed": np.where(keep, caption, None),
        "lang": langs.astype(object),
        "lang_conf": confs,
        "ppl": ppls,
    })
    return out
