"""CleaningStage — graft of the reference's ``CleaningStage``
(``/root/reference/mehc_curation/cleaning/__init__.py:10-18``):

- ``cl_salt``     → :meth:`scrub_pii`      (PII span removal, P2 + F5)
- ``neutralize``  → :meth:`scrub_toxicity` (toxicity mask/drop, P3 + F6,
  method switch ≅ boyle|rdkit at ``cleaning/core/pipeline.py:41-58``)

Both replace the caption column in place (the reference swaps its
payload column, ``cleaning/core/engine.py:55-73``) and drop rows that
became empty / unprocessable (``cleaning/core/engine.py:66-70,129-136``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mehc_curation_spark.operators.udfs import make_toxicity_udf, pii_scrub_col
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import CAPTION_COL

_BLANK_RX = "^[ \t\n\r]*$"


class CleaningStage:
    def __init__(self, df: DataFrame, config: CurationConfig = CurationConfig()):
        self.df = df
        self.config = config

    def scrub_pii(self, return_format_data: bool = False):
        scrubbed = pii_scrub_col(F.col(CAPTION_COL))
        emptied = (
            (scrubbed != F.col(CAPTION_COL))
            & F.regexp_like(scrubbed, F.lit(_BLANK_RX))
            & ~F.regexp_like(F.col(CAPTION_COL), F.lit(_BLANK_RX))
        )
        out = (
            self.df.withColumn("_emptied", emptied)
            .withColumn("_hit", scrubbed != F.col(CAPTION_COL))
            .withColumn(CAPTION_COL, scrubbed)
        )
        kept = out.filter(~F.coalesce(F.col("_emptied"), F.lit(False)))
        if return_format_data:
            row = out.select(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("_hit"), 1).otherwise(0)).alias("hits"),
                F.sum(F.when(F.col("_emptied"), 1).otherwise(0)).alias("emptied"),
            ).first()
            fmt = {"input": row["n"], "pii_hits": int(row["hits"] or 0),
                   "emptied": int(row["emptied"] or 0)}
            return kept.drop("_emptied", "_hit"), fmt
        return kept.drop("_emptied", "_hit")

    def scrub_toxicity(self, method: str | None = None,
                       return_format_data: bool = False):
        method = method or self.config.toxicity_method
        tox = make_toxicity_udf(method)
        out = self.df.withColumn("_tox", tox(F.col(CAPTION_COL)))
        out = (
            out.withColumn(CAPTION_COL, F.col("_tox.caption"))
            .withColumn("_diff", F.col("_tox.diff"))
            .drop("_tox")
        )
        kept = out.filter(F.col("_diff").isNotNull())
        if return_format_data:
            row = out.select(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("_diff") == 1, 1).otherwise(0)).alias("changed"),
                F.sum(F.when(F.col("_diff").isNull(), 1).otherwise(0)).alias("unproc"),
            ).first()
            fmt = {"input": row["n"], "neutralized": int(row["changed"] or 0),
                   "unprocessable": int(row["unproc"] or 0)}
            return kept.drop("_diff"), fmt
        return kept.drop("_diff")

    def complete_cleaning(self, method: str | None = None,
                          return_format_data: bool = False):
        """≅ complete_cleaning (``cleaning/core/pipeline.py:60-136``)."""
        if return_format_data:
            df, m1 = CleaningStage(self.df, self.config).scrub_pii(True)
            df, m2 = CleaningStage(df, self.config).scrub_toxicity(method, True)
            return df, {"scrub_pii": m1, "scrub_toxicity": m2}
        df = CleaningStage(self.df, self.config).scrub_pii()
        return CleaningStage(df, self.config).scrub_toxicity(method)
