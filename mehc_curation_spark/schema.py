"""Input/output schemas for the curation engine.

The reference infers its schema from ``pd.read_csv`` and addresses the
payload positionally (first column = SMILES;
``/root/reference/mehc_curation/validation/core/engine.py:37-42``).
Here the schema is pinned explicitly at the table boundary and the
payload/key columns are configured by name in one place.
"""

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Column-name configuration (replaces the reference's positional
# first-column-is-payload convention).
ID_COL = "image_id"       # stable row identity (replaces pandas index)
CAPTION_COL = "caption"   # the text payload (plays the SMILES role)
KEY_COL = "phash"         # dedup key (plays the canonical-SMILES role)

# Exact input shape from BASELINE.json input_hint.
PAIRS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

# Label columns emitted by the pipeline (appended to the input schema
# in the curated output snapshot).
LABEL_FIELDS = [
    StructField("keep", BooleanType(), False),
    StructField("drop_reason", StringType(), True),   # first failing rule
    StructField("caption_scrubbed", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("lang_conf", DoubleType(), True),
    StructField("ppl", DoubleType(), True),
]

LABELS_SCHEMA = StructType([PAIRS_SCHEMA["image_id"]] + LABEL_FIELDS)

OUTPUT_SCHEMA = StructType(list(PAIRS_SCHEMA.fields) + LABEL_FIELDS)

# Formats understood by the codecs package. 'raw'/'bmp'/'png' are
# lossless; 'jpegq' is the quantizing-DCT lossy codec (PSNR >= 40 dB).
LOSSLESS_FMTS = ("raw", "bmp", "png")
LOSSY_FMTS = ("jpegq",)
ALL_FMTS = LOSSLESS_FMTS + LOSSY_FMTS
