"""NormalizationStage — graft of the reference's ``NormalizationStage``
(``/root/reference/mehc_curation/normalization/__init__.py:10-18``):

- ``destereoisomerize`` → :meth:`normalize_lossy`     (P4)
- ``detautomerize``     → :meth:`normalize_canonical` (P5)

Order is semantic (lossy before canonical), mirroring the comment at
``normalization/core/pipeline.py:89``. No rows are dropped here; the
caption column is rewritten and a changed-count is reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mehc_curation_spark.operators.udfs import make_normalize_udf
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.schema import CAPTION_COL


class NormalizationStage:
    def __init__(self, df: DataFrame, config: CurationConfig = CurationConfig()):
        self.df = df
        self.config = config

    def _run(self, lossy: bool, canonical: bool, return_format_data: bool):
        norm = make_normalize_udf(lossy, canonical)
        out = self.df.withColumn("_norm", norm(F.col(CAPTION_COL)))
        res = (
            out.withColumn(CAPTION_COL, F.col("_norm.caption"))
            .withColumn("_cl", F.col("_norm.changed_lossy"))
            .withColumn("_cc", F.col("_norm.changed_canon"))
            .drop("_norm")
        )
        if return_format_data:
            row = res.select(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("_cl"), 1).otherwise(0)).alias("cl"),
                F.sum(F.when(F.col("_cc"), 1).otherwise(0)).alias("cc"),
            ).first()
            fmt = {"input": row["n"],
                   "normalized_lossy": int(row["cl"] or 0),
                   "normalized_canonical": int(row["cc"] or 0)}
            return res.drop("_cl", "_cc"), fmt
        return res.drop("_cl", "_cc")

    def normalize_lossy(self, return_format_data: bool = False):
        return self._run(True, False, return_format_data)

    def normalize_canonical(self, return_format_data: bool = False):
        return self._run(False, True, return_format_data)

    def complete_normalization(self, return_format_data: bool = False):
        """≅ complete_normalization (``normalization/core/pipeline.py:59-136``)."""
        return self._run(True, True, return_format_data)
