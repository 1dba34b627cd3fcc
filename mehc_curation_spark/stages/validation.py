"""ValidationStage — graft of the reference's ``ValidationStage``
(``/root/reference/mehc_curation/validation/__init__.py:11-19`` →
``validation/core/pipeline.py``): the four row-classifier gates,
re-expressed as lazy boolean filters.

Reference step → graft step:

- ``validate_smi``        → :meth:`validate`         (image decode gate, F1)
- ``rm_mixture``          → :meth:`rm_low_quality`   (heuristic text rules, F2)
- ``rm_inorganic``        → :meth:`rm_unknown_lang`  (langid gate, F3)
- ``rm_organometallic``   → :meth:`rm_high_ppl`      (perplexity gate, F4)

Each step returns the kept DataFrame and, when requested, the same
``{input, invalid, valid}`` counter dict shape the reference builds
(``validation/utils/validation_utils.py:163-168``), computed in one
aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mehc_curation_spark.operators.udfs import decode_reason_udf, langid_udf
from mehc_curation_spark.rules.heuristics import heuristic_reason_col
from mehc_curation_spark.rules.langid import UNKNOWN
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import CAPTION_COL


def _split(df: DataFrame, bad: F.Column, return_format_data: bool,
           keys: tuple[str, str, str] = ("input", "invalid", "valid")):
    kept = df.filter(~F.coalesce(bad, F.lit(False)))
    if not return_format_data:
        return kept
    row = df.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.coalesce(bad, F.lit(False)), 1).otherwise(0)).alias("bad"),
    ).first()
    fmt = {keys[0]: row["n"], keys[1]: int(row["bad"] or 0),
           keys[2]: row["n"] - int(row["bad"] or 0)}
    return kept, fmt


class ValidationStage:
    def __init__(self, df: DataFrame, config: CurationConfig = CurationConfig()):
        self.df = df
        self.config = config

    def validate(self, return_format_data: bool = False):
        """Decode gate: drop rows whose image payload fails to decode."""
        reason = decode_reason_udf(F.col("bytes"), F.col("fmt"),
                                   F.col("w"), F.col("h"))
        return _split(self.df, reason.isNotNull(), return_format_data)

    def validate_with_rejected(self, reason_col: str,
                               return_format_data: bool = False):
        """Decode gate returning BOTH sides: ``(kept, rejected)`` with
        the rejected rows carrying their decode reason in
        ``reason_col`` (plus ``(..., fmt)`` when requested) — the
        single implementation behind every rejected-row export, so the
        gate's predicate and counter shape cannot drift between the
        keep-only and export paths (a round-3 review finding)."""
        base = self.df.withColumn(
            "_vreason", decode_reason_udf(F.col("bytes"), F.col("fmt"),
                                          F.col("w"), F.col("h")))
        rejected = (base.filter(F.col("_vreason").isNotNull())
                    .withColumn(reason_col, F.col("_vreason"))
                    .drop("_vreason"))
        res = _split(base, F.col("_vreason").isNotNull(),
                     return_format_data)
        if return_format_data:
            return res[0].drop("_vreason"), rejected, res[1]
        return res.drop("_vreason"), rejected

    def rm_low_quality(self, return_format_data: bool = False):
        """Heuristic caption-quality gate (pure Catalyst expressions)."""
        reason = heuristic_reason_col(F.col(CAPTION_COL))
        return _split(self.df, reason.isNotNull(), return_format_data)

    def rm_unknown_lang(self, return_format_data: bool = False):
        """Language-ID gate: keep confident, allowed-language captions."""
        c = self.config
        df = self.df.withColumn("_lid", langid_udf(F.col(CAPTION_COL)))
        bad = (
            (F.col("_lid.lang") == UNKNOWN)
            | (F.col("_lid.lang_conf") < c.min_lang_margin)
            | ~F.col("_lid.lang").isin(*c.allowed_langs)
        )
        res = _split(df, bad, return_format_data)
        if return_format_data:
            return res[0].drop("_lid"), res[1]
        return res.drop("_lid")

    def rm_high_ppl(self, return_format_data: bool = False):
        """Perplexity gate with per-language thresholds."""
        c = self.config
        df = self.df.withColumn("_lid", langid_udf(F.col(CAPTION_COL)))
        mapping = F.create_map(*[F.lit(x) for kv in c.ppl_threshold_map().items()
                                 for x in kv])
        thr = F.coalesce(F.element_at(mapping, F.col("_lid.lang")), F.lit(4000.0))
        res = _split(df, F.col("_lid.ppl") > thr, return_format_data)
        if return_format_data:
            return res[0].drop("_lid"), res[1]
        return res.drop("_lid")

    def complete_validation(self, return_format_data: bool = False):
        """All four gates in registry order (≅ complete_validation,
        ``validation/core/pipeline.py:95-195``).

        Two stage-API efficiencies vs naive gate chaining (a round-2
        review finding): the langid model runs ONCE and feeds both the
        language and the perplexity gate, and with
        ``return_format_data`` each intermediate is persisted so the
        four metric jobs do not re-execute the decode UDF over the
        whole upstream lineage four times. (The fused labels plan in
        ``stages/plan.py`` remains the flagship path; this is the
        reference-parity per-stage API.)"""
        c = self.config
        metrics: dict = {}
        cached: list[DataFrame] = []

        def _cache(d: DataFrame) -> DataFrame:
            if not return_format_data:
                return d
            from pyspark.storagelevel import StorageLevel

            d = d.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(d)
            return d

        def _gate(d: DataFrame, name: str, bad) -> DataFrame:
            res = _split(d, bad, return_format_data)
            if return_format_data:
                kept, metrics[name] = res
                return _cache(kept)
            return res

        try:
            df = _cache(self.df)
            reason = decode_reason_udf(F.col("bytes"), F.col("fmt"),
                                       F.col("w"), F.col("h"))
            df = _gate(df, "validate", reason.isNotNull())
            df = _gate(df, "rm_low_quality",
                       heuristic_reason_col(F.col(CAPTION_COL)).isNotNull())

            lid = _cache(df.withColumn("_lid", langid_udf(F.col(CAPTION_COL))))
            bad_lang = (
                (F.col("_lid.lang") == UNKNOWN)
                | (F.col("_lid.lang_conf") < c.min_lang_margin)
                | ~F.col("_lid.lang").isin(*c.allowed_langs)
            )
            lid = _gate(lid, "rm_unknown_lang", bad_lang)
            mapping = F.create_map(*[F.lit(x)
                                     for kv in c.ppl_threshold_map().items()
                                     for x in kv])
            thr = F.coalesce(F.element_at(mapping, F.col("_lid.lang")),
                             F.lit(4000.0))
            lid = _gate(lid, "rm_high_ppl", F.col("_lid.ppl") > thr)
            out = lid.drop("_lid")
            if return_format_data:
                # materialize while the caches are alive; the caller
                # gets a lazy frame over the ORIGINAL lineage
                out = out.localCheckpoint(eager=True)
            return (out, metrics) if return_format_data else out
        finally:
            for d in cached:
                d.unpersist()
