"""Declarative rule registry + pipeline configuration.

Graft of the reference's per-stage step registries
(``/root/reference/mehc_curation/validation/config/validation_config.py:22-86``,
``cleaning/config/cleaning_config.py:19-50``,
``normalization/config/normalization_config.py:19-48``): every rule is
declared once — name, stage, drop reason, report template key — and
both engines (Spark pipeline and pandas oracle) iterate the same
registry in the same order, so keep/drop decisions line up by
construction.

Thresholds live here (single place), all integers or fixed decimals.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from mehc_curation_spark.rules.langid import LANGS


@dataclass(frozen=True)
class RuleConfig:
    """One curation rule (≅ ValidationStepConfig entry)."""

    name: str               # rule id, also the engine dispatch key
    stage: int              # 1=validation, 2=cleaning, 3=normalization
    kind: str               # 'filter' | 'scrub' | 'normalize'
    drop_reasons: tuple[str, ...]  # reasons this rule can emit
    template_key: str       # report section key
    enabled_by: str         # CurationConfig toggle attribute name


# Ordered — order is semantic, mirrors complete_refinement's fixed
# chain (/root/reference/mehc_curation/refinement/core/pipeline.py:104-269).
RULES: tuple[RuleConfig, ...] = (
    RuleConfig("decode_image", 1, "filter",
               ("image_null", "image_undecodable", "image_bad_dims"),
               "validation", "validate"),
    RuleConfig("heuristics", 1, "filter",
               ("caption_null", "caption_empty", "caption_too_short",
                "caption_too_long", "caption_invalid_utf8",
                "caption_repetition", "caption_low_alpha",
                "caption_high_digit"),
               "heuristics", "rm_low_quality"),
    RuleConfig("langid", 1, "filter",
               ("lang_low_conf", "lang_not_allowed"),
               "langid", "rm_unknown_lang"),
    RuleConfig("perplexity", 1, "filter",
               ("ppl_too_high",),
               "perplexity", "rm_high_ppl"),
    RuleConfig("pii_scrub", 2, "scrub",
               ("scrub_emptied",),
               "pii", "scrub_pii"),
    RuleConfig("toxicity_scrub", 2, "scrub",
               ("scrub_unprocessable",),
               "toxicity", "scrub_toxicity"),
    RuleConfig("normalize_lossy", 3, "normalize", (), "norm_lossy",
               "normalize_lossy"),
    RuleConfig("normalize_canonical", 3, "normalize", (), "norm_canon",
               "normalize_canonical"),
)

DEDUP_REASONS = ("duplicate_perfect", "duplicate_conflict")


@dataclass(frozen=True)
class CurationConfig:
    """Toggle set mirroring complete_refinement's signature
    (11 boolean gates + method switch,
    ``refinement/core/pipeline.py:23-50``)."""

    validate: bool = True              # decode gate
    # graft-only opt-in: image-quality gate (blur/entropy/flat/dims)
    # sharing the decode gate's single decode; requires validate=True
    rm_low_quality_image: bool = False
    rm_low_quality: bool = True        # heuristic gate
    rm_unknown_lang: bool = True       # langid gate
    rm_high_ppl: bool = True           # perplexity gate
    scrub_pii: bool = True
    scrub_toxicity: bool = True
    toxicity_method: str = "mask"      # 'mask' | 'drop_sentence' (≅ boyle|rdkit)
    validate_post_scrub: bool = True   # ≅ validate_post_neutr (counters discarded)
    normalize_lossy: bool = True
    normalize_canonical: bool = True
    rm_dup_between_stages: bool = True

    # thresholds
    allowed_langs: tuple[str, ...] = LANGS
    # top1−top2 avg trigram logprob margin; calibrated on the fixture
    # corpus: junk margin ~0.0-0.08, in-language captions ≫ 0.05.
    min_lang_margin: float = 0.05
    # per-language ppl ceilings (fixture p95-p99 of in-language captions;
    # the smoothing floor — fully unseen text — sits at ~83k).
    ppl_thresholds: tuple[tuple[str, float], ...] = (
        ("en", 30000.0), ("de", 30000.0), ("fr", 45000.0),
        ("es", 45000.0), ("vi", 30000.0), ("zh", 45000.0),
    )

    # scale knobs (≅ n_cpu/split_factor, utils/common.py:41-59 — here
    # they map to Spark partitioning instead of a process pool)
    phash_buckets: int = 64            # repartition key: pmod(phash, B)
    salt_factor: int = 8               # salt buckets for per-lang stats
    # 'window' = one shared exchange + per-pass sorts (cheapest on
    # balanced keys; the library default — plan building stays fully
    # lazy); 'agg' = partial-aggregate + join (skew-robust when single
    # phashes are huge — see plan._dedup_pass_agg); 'auto' = sample the
    # phash histogram at plan-build time and pick 'agg' when one key's
    # share exceeds dedup_hot_key_share (a viral image at corpus
    # scale). 'auto' pays one slim column-pruned sampling job per plan
    # build (~2s at bench scale), so it is the default for the durable
    # CLI/run_curate path where it amortizes, not for the library API.
    dedup_strategy: str = "window"
    dedup_hot_key_share: float = 0.05   # max key share that 'auto' tolerates
    dedup_sample_fraction: float = 0.05  # phash sample for the histogram

    # image-quality thresholds (used when rm_low_quality_image is on;
    # defaults calibrated on the fixture corpus to drop a modest
    # fraction — production corpora want stricter min_dim/blur)
    iq_min_dim: int = 16
    iq_max_aspect: float = 8.0
    iq_min_blur_var: float = 1.0
    iq_min_entropy: float = 0.5
    iq_max_flat_frac: float = 0.98

    def ppl_threshold_map(self) -> dict[str, float]:
        return dict(self.ppl_thresholds)

    def iq_thresholds(self):
        """(min_dim, max_aspect, min_blur_var, min_entropy,
        max_flat_frac) when the image-quality gate is on, else None —
        the shape ``rules.decode.decode_quality_reason`` takes."""
        if not self.rm_low_quality_image:
            return None
        if not self.validate:
            raise ValueError(
                "rm_low_quality_image requires validate=True: the "
                "quality gate judges the pixels the decode gate decodes")
        return (self.iq_min_dim, self.iq_max_aspect, self.iq_min_blur_var,
                self.iq_min_entropy, self.iq_max_flat_frac)

    def dedup_gates(self) -> tuple[bool, bool, bool]:
        """When to dedup after each stage — exact reproduction of the
        gate logic at refinement/core/pipeline.py:74-81."""
        after1 = (self.validate or self.rm_low_quality
                  or self.rm_unknown_lang or self.rm_high_ppl)
        after2 = self.scrub_pii or self.scrub_toxicity
        after3 = self.normalize_lossy or self.normalize_canonical
        d = self.rm_dup_between_stages
        return (d and after1, d and after2, d and after3)

    def with_(self, **kw) -> "CurationConfig":
        return replace(self, **kw)
