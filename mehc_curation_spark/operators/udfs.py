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
_TOX_T = StructType([
    StructField("caption", StringType()),
    StructField("diff", IntegerType()),
])
_NORM_T = StructType([
    StructField("caption", StringType()),
    StructField("changed_lossy", BooleanType()),
    StructField("changed_canon", BooleanType()),
])

from mehc_curation_spark.rules.pii import PII_PATTERNS


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


NARROW_LABELS_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("phash", LongType()),
    StructField("caption", StringType()),
    StructField("drop_reason", StringType()),
    StructField("scrub_reason", StringType()),
    StructField("cap_scrub", StringType()),
    StructField("cap_final", StringType()),
    StructField("lang", StringType()),
    StructField("lang_conf", DoubleType()),
    StructField("ppl", DoubleType()),
])


def curate_narrow_arrow(df, config):
    """The ENTIRE narrow phase of the curation pipeline as ONE
    ``mapInArrow`` stage: decode gate, langid+ppl, heuristics, PII +
    toxicity scrub, post-scrub re-validation and normalization all
    happen in a single JVM↔Python crossing.

    Rationale (measured on this box): the per-row Python rule cost is
    ~150 µs total while every extra ArrowEvalPython node pays the
    caption column across the boundary twice plus per-batch framing —
    the three-crossing variant (decode+langid / toxicity / normalize,
    with heuristics+PII as JVM regex chains) spent >80% of its narrow-
    stage wall time outside the rule functions. One crossing also
    shortens the lineage Catalyst has to carry under AQE.

    Label parity with the pandas oracle is by construction: this calls
    the exact same ``rules.*`` scalar functions in the exact same
    priority order (decode → heuristics → langid → ppl; scrub_emptied →
    scrub_unprocessable → post-scrub heuristics).

    Output columns (NARROW_LABELS_SCHEMA):

    - ``drop_reason``   stage-1 reason (pre-dedup-1), else null
    - ``scrub_reason``  stage-2 reason, applied by the plan AFTER the
                        first dedup pass (coalesce order = oracle order)
    - ``caption``       original caption  (dedup-1 key)
    - ``cap_scrub``     post-PII+toxicity caption (dedup-2 key)
    - ``cap_final``     post-normalization caption (dedup-3 key, output)

    Values are computed for every row regardless of earlier drops (the
    plan's windows gate on aliveness); this matches the current plan
    semantics and keeps the stage branch-free.
    """
    import pyarrow as pa

    validate = config.validate
    config.iq_thresholds()  # eager: reject iq-without-validate at plan build
    cols = (["image_id", "phash", "caption", "bytes", "fmt", "w", "h"]
            if validate else ["image_id", "phash", "caption"])
    cfg = config  # closure-captured dataclass (tiny, pickles with the func)

    def run(batches):
        import numpy as np

        from mehc_curation_spark.rules.decode import decode_quality_reason
        from mehc_curation_spark.rules.heuristics import heuristic_reason
        from mehc_curation_spark.rules.langid import UNKNOWN, classify_batch
        from mehc_curation_spark.rules.pii import scrub_pii
        from mehc_curation_spark.rules.textnorm import (
            normalize_canonical,
            normalize_lossy,
        )
        from mehc_curation_spark.rules.toxicity import scrub_toxicity

        thr_map = cfg.ppl_threshold_map()
        allowed = set(cfg.allowed_langs)
        iq = cfg.iq_thresholds()

        for batch in batches:
            captions = batch.column("caption").to_pylist()
            n = batch.num_rows
            langs, confs, ppls = classify_batch(captions)

            # ---- stage-1 reasons, first-failing-rule priority ----
            reasons: list = [None] * n
            if validate:
                data = batch.column("bytes").to_pylist()
                fmts = batch.column("fmt").to_pylist()
                ws = batch.column("w").to_pylist()
                hs = batch.column("h").to_pylist()
                reasons = [decode_quality_reason(b, f, w, h, iq)
                           for b, f, w, h in zip(data, fmts, ws, hs)]
            if cfg.rm_low_quality:
                reasons = [r if r is not None else heuristic_reason(c)
                           for r, c in zip(reasons, captions)]
            if cfg.rm_unknown_lang:
                low = (langs == UNKNOWN) | (confs < cfg.min_lang_margin)
                reasons = [
                    r if r is not None else
                    ("lang_low_conf" if lo else
                     (None if l in allowed else "lang_not_allowed"))
                    for r, lo, l in zip(reasons, low, langs)]
            if cfg.rm_high_ppl:
                thr = np.array([thr_map.get(l, 4000.0) for l in langs])
                high = ppls > thr
                reasons = [r if r is not None else
                           ("ppl_too_high" if hi else None)
                           for r, hi in zip(reasons, high)]

            # ---- caption evolution + stage-2 reasons ----
            scrub_reasons: list = [None] * n
            cap2 = captions
            if cfg.scrub_pii:
                res = [scrub_pii(c) if c is not None else (c, False, False)
                       for c in captions]
                cap2 = [r[0] for r in res]
                scrub_reasons = ["scrub_emptied" if r[2] else None for r in res]
            cap3 = cap2
            if cfg.scrub_toxicity:
                # Called unconditionally: scrub_toxicity(None) returns
                # (None, None), so an alive null-caption row gets
                # scrub_unprocessable — exactly the oracle's
                # `k and r[1] is None` behavior (oracle.py:111-117).
                res = [scrub_toxicity(c, cfg.toxicity_method) for c in cap2]
                cap3 = [r[0] for r in res]
                scrub_reasons = [
                    s if s is not None else
                    ("scrub_unprocessable" if r[1] is None else None)
                    for s, r in zip(scrub_reasons, res)]
            if cfg.validate_post_scrub:
                # ≅ validate_post_neutr: re-filter, counters discarded
                # (refinement/core/pipeline.py:217-228)
                scrub_reasons = [s if s is not None else heuristic_reason(c)
                                 for s, c in zip(scrub_reasons, cap3)]
            cap4 = cap3
            if cfg.normalize_lossy:
                cap4 = [normalize_lossy(c)[0] if c is not None else c
                        for c in cap4]
            if cfg.normalize_canonical:
                cap4 = [normalize_canonical(c)[0] if c is not None else c
                        for c in cap4]

            yield pa.RecordBatch.from_arrays(
                [batch.column("image_id"), batch.column("phash"),
                 batch.column("caption"),
                 pa.array(reasons, type=pa.string()),
                 pa.array(scrub_reasons, type=pa.string()),
                 pa.array(cap3, type=pa.string()),
                 pa.array(cap4, type=pa.string()),
                 pa.array(list(langs), type=pa.string()),
                 pa.array(confs, type=pa.float64()),
                 pa.array(ppls, type=pa.float64())],
                NARROW_LABELS_SCHEMA.fieldNames(),
            )

    return df.select(*cols).mapInArrow(run, NARROW_LABELS_SCHEMA)


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
