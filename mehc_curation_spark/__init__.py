"""mehc_curation_spark — a PySpark-native image+caption curation engine.

A from-scratch reimplementation of the capabilities of
``biochem-data-sci/mehc-curation`` (reference at ``/root/reference``)
recast as a language-ID + quality-filter + PII/toxicity-scrub pipeline
over tables of image+caption pairs, designed for 10^12-image scale.

Public API mirrors the reference's four stage classes
(``/root/reference/mehc_curation/{validation,cleaning,normalization,
refinement}/__init__.py``) re-expressed as composable DataFrame
transforms:

- :class:`ValidationStage`  — decode / heuristic / langid / perplexity gates
- :class:`CleaningStage`    — PII scrub + toxicity scrub
- :class:`NormalizationStage` — lossy + canonical text normalization
- :class:`RefinementStage`  — full curate() orchestration with dedup gates
- :func:`deduplicate`       — phash dedup with drop-all-conflicting semantics
"""

from mehc_curation_spark.schema import PAIRS_SCHEMA, CAPTION_COL, KEY_COL, ID_COL
from mehc_curation_spark.operators.dedup import deduplicate
from mehc_curation_spark.stages.validation import ValidationStage
from mehc_curation_spark.stages.cleaning import CleaningStage
from mehc_curation_spark.stages.normalization import NormalizationStage
from mehc_curation_spark.stages.refinement import RefinementStage, curate

__version__ = "0.1.0"

__all__ = [
    "PAIRS_SCHEMA",
    "CAPTION_COL",
    "KEY_COL",
    "ID_COL",
    "deduplicate",
    "ValidationStage",
    "CleaningStage",
    "NormalizationStage",
    "RefinementStage",
    "curate",
]
