"""Arrow-vectorized pandas UDFs + Catalyst expression builders for the
curation rules.

The reference applies arbitrary per-row Python lambdas via a process
pool (``p_apply`` sites, e.g.
``/root/reference/mehc_curation/validation/core/engine.py:41``,
``cleaning/core/engine.py:37-51``). Here every Python-side rule is an
Arrow-batched pandas UDF (one JVM↔Python round trip per batch, long-
lived workers), and anything expressible as a Catalyst expression
(heuristics, PII regex chain) stays JVM-side entirely.

All UDFs call the exact same functions the pandas oracle calls
(`mehc_curation_spark.rules.*`) — label parity is by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# DataType objects (not DDL strings): DDL parsing requires an active
# SparkSession, which module import must not.
_LANGID_T = StructType([
    StructField("lang", StringType()),
    StructField("lang_conf", DoubleType()),
    StructField("ppl", DoubleType()),
])
_PII_T = StructType([
    StructField("caption_scrubbed", StringType()),
    StructField("pii_hit", BooleanType()),
    StructField("became_empty", BooleanType()),
])
_TOX_T = StructType([
    StructField("caption", StringType()),
    StructField("diff", IntegerType()),
])
_NORM_T = StructType([
    StructField("caption", StringType()),
    StructField("changed_lossy", BooleanType()),
    StructField("changed_canon", BooleanType()),
])

from mehc_curation_spark.rules.pii import PII_PATTERNS, scrub_pii


# ---------------------------------------------------------------------------
# F1: image decode gate (needs bytes; the only operator that does)
# ---------------------------------------------------------------------------

@pandas_udf(StringType())
def decode_reason_udf(data: pd.Series, fmt: pd.Series,
                      w: pd.Series, h: pd.Series) -> pd.Series:
    # Imported inside the UDF so executors resolve it from --py-files.
    from mehc_curation_spark.rules.decode import decode_reason

    return pd.Series(
        [decode_reason(b, f, int(ww) if pd.notna(ww) else None,
                       int(hh) if pd.notna(hh) else None)
         for b, f, ww, hh in zip(data, fmt, w, h)],
        dtype=object,
    )


ROW_LABELS_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("phash", LongType()),
    StructField("caption", StringType()),
    StructField("drop_reason", StringType()),
    StructField("lang", StringType()),
    StructField("lang_conf", DoubleType()),
    StructField("ppl", DoubleType()),
])


def decode_langid_arrow(df, validate: bool = True):
    """Fused decode-gate + langid/ppl as ONE mapInArrow stage.

    The binary column crosses the JVM↔Python boundary exactly once and
    never becomes a pandas object column (Arrow buffers → per-row
    memoryview slices). Measured on this box: a trivial pandas UDF over
    the bytes column costs ~80 s / 400k rows while the mapInArrow path
    is ~2.4x cheaper — the boundary has a large per-batch fixed cost,
    so the two models share one crossing.

    Input: pairs-shaped DataFrame. Output: slim labeled rows
    (ROW_LABELS_SCHEMA) — `bytes` is consumed and dropped here.
    """
    import pyarrow as pa

    cols = (["image_id", "phash", "caption", "bytes", "fmt", "w", "h"]
            if validate else ["image_id", "phash", "caption"])

    def run(batches):
        from mehc_curation_spark.rules.decode import decode_reason
        from mehc_curation_spark.rules.langid import classify_batch

        for batch in batches:
            captions = batch.column("caption").to_pylist()
            langs, confs, ppls = classify_batch(captions)
            if validate:
                data = batch.column("bytes").to_pylist()
                fmts = batch.column("fmt").to_pylist()
                ws = batch.column("w").to_pylist()
                hs = batch.column("h").to_pylist()
                reasons = [decode_reason(b, f, w, h)
                           for b, f, w, h in zip(data, fmts, ws, hs)]
            else:
                reasons = [None] * batch.num_rows
            yield pa.RecordBatch.from_arrays(
                [batch.column("image_id"), batch.column("phash"),
                 batch.column("caption"),
                 pa.array(reasons, type=pa.string()),
                 pa.array(list(langs), type=pa.string()),
                 pa.array(confs, type=pa.float64()),
                 pa.array(ppls, type=pa.float64())],
                ["image_id", "phash", "caption", "drop_reason",
                 "lang", "lang_conf", "ppl"],
            )

    return df.select(*cols).mapInArrow(run, ROW_LABELS_SCHEMA)


# ---------------------------------------------------------------------------
# F3/F4: language-ID + perplexity (batched NumPy model scoring)
# ---------------------------------------------------------------------------

@pandas_udf(_LANGID_T)
def langid_udf(caption: pd.Series) -> pd.DataFrame:
    from mehc_curation_spark.rules.langid import classify_batch

    langs, confs, ppls = classify_batch(list(caption))
    return pd.DataFrame({"lang": langs, "lang_conf": confs, "ppl": ppls})


# ---------------------------------------------------------------------------
# P2: PII scrub — Catalyst fast path + pandas fallback
# ---------------------------------------------------------------------------

def pii_scrub_col(c: Column) -> Column:
    """Pure-Catalyst regexp_replace chain (whole-stage codegen).

    The patterns are written in the Java/Python common regex subset;
    byte-equality with :func:`rules.pii.scrub_pii` is asserted by
    tests/test_scrub.py over the full fixture corpus.
    """
    out = c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


@pandas_udf(_PII_T)
def pii_scrub_udf(caption: pd.Series) -> pd.DataFrame:
    rows = [scrub_pii(c) for c in caption]
    return pd.DataFrame(rows, columns=["caption_scrubbed", "pii_hit", "became_empty"])


# ---------------------------------------------------------------------------
# P3: toxicity scrub (method switch ≅ boyle|rdkit)
# ---------------------------------------------------------------------------

def make_toxicity_udf(method: str):
    @pandas_udf(_TOX_T)
    def toxicity_udf(caption: pd.Series) -> pd.DataFrame:
        from mehc_curation_spark.rules.toxicity import scrub_toxicity

        rows = [scrub_toxicity(c, method) for c in caption]
        return pd.DataFrame(rows, columns=["caption", "diff"])

    return toxicity_udf


# ---------------------------------------------------------------------------
# P4+P5: normalization (NFKC etc. — stdlib unicodedata, no Spark builtin)
# ---------------------------------------------------------------------------

def make_normalize_udf(lossy: bool, canonical: bool):
    @pandas_udf(_NORM_T)
    def normalize_udf(caption: pd.Series) -> pd.DataFrame:
        from mehc_curation_spark.rules.textnorm import (
            normalize_canonical,
            normalize_lossy,
        )

        out, ch_l, ch_c = [], [], []
        for c in caption:
            cl, cc = False, False
            if lossy:
                c, cl = normalize_lossy(c)
            if canonical:
                c, cc = normalize_canonical(c)
            out.append(c)
            ch_l.append(cl)
            ch_c.append(cc)
        return pd.DataFrame(
            {"caption": out, "changed_lossy": ch_l, "changed_canon": ch_c}
        )

    return normalize_udf
