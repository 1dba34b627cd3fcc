"""Curation rules — the single source of truth shared by the Spark
pipeline (vectorized pandas UDFs / Catalyst expressions) and the
pure-pandas oracle curator (`mehc_curation_spark.oracle`).

Graft analog of the reference's declarative step registries
(``/root/reference/mehc_curation/validation/config/validation_config.py:22-86``
and the cleaning/normalization equivalents).
"""
