"""Deduplication — Spark reimplementation of the reference's shared
``deduplicate()`` (``/root/reference/mehc_curation/utils/common.py:8-196``),
keyed on ``phash`` (D1–D7 in SURVEY.md §2.4).

Semantics preserved exactly (incl. quirk §4.2.1):

- *perfect duplicates*: identical (key, payload) rows beyond the first
  (ordered by image_id) are dropped, first kept (``common.py:88-90``);
- *partial duplicates*: a key whose payload column has >1 distinct
  value is **conflicting — ALL of its rows are dropped**, not
  keep-first (``common.py:96-113``);
- *dup report*: one row per duplicated key with ``is_perfect_dups``
  flag and the list of member row ids (``common.py:115-131``) —
  `collect_list(image_id)` replaces the pandas index list.

Physical shape (the 100 TB story): everything runs on a slim
projection (id, key, payload) — never the image bytes. The per-row
labeling variant uses two window functions that share ONE hash
exchange on the key (`Window.partitionBy(key)` and
`partitionBy(key, payload)` are both satisfied by clustering on key),
so consecutive dedup passes over an already key-partitioned stream add
sorts but no further shuffles.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mehc_curation_spark.schema import CAPTION_COL, ID_COL, KEY_COL

DUP_REASON_COL = "dup_reason"


def dup_reason_col(df: DataFrame, key: str = KEY_COL,
                   payload: str = CAPTION_COL, id_col: str = ID_COL,
                   out_col: str = DUP_REASON_COL) -> DataFrame:
    """Append a dup-reason column: 'duplicate_conflict' for every row of
    a conflicting key, 'duplicate_perfect' for non-first identical rows,
    NULL for survivors. One shuffle (hash on `key`)."""
    w_key = Window.partitionBy(key)
    w_row = Window.partitionBy(key, payload).orderBy(id_col)
    # approx distinct is not allowed here (exactness is semantic);
    # size(collect_set) is exact and key groups are small by nature.
    n_payloads = F.size(F.collect_set(payload).over(w_key))
    rn = F.row_number().over(w_row)
    return df.withColumn(
        out_col,
        F.when(n_payloads > 1, F.lit("duplicate_conflict"))
        .when(rn > 1, F.lit("duplicate_perfect"))
        .otherwise(F.lit(None).cast("string")),
    )


def deduplicate(
    df: DataFrame,
    partial_dup_cols: Optional[Sequence[str]] = None,
    payload: str = CAPTION_COL,
    id_col: str = ID_COL,
    show_dup_info: bool = False,
    return_format_data: bool = False,
    validate: bool = False,
    return_rejected: bool = False,
    get_report: bool = False,
    print_logs: bool = False,
):
    """Standalone dedup mirroring the reference's public
    ``deduplicate()`` return shapes (``common.py:20-39`` docstring):

    Returns ``cleaned_df`` and, per flags, ``dups_info`` (key,
    is_perfect_dups, indexes=collect_list(id)) and the counters dict.

    `partial_dup_cols` defaults to [KEY_COL] — the graft analog of the
    reference defaulting to the first (payload) column
    (``common.py:93-94``).

    ``validate=True`` runs the image-decode gate first and dedups only
    the survivors, mirroring the reference's pre-validation pass
    (``common.py:66-83``: ValidationStage.validate_smi with
    dedup disabled, counters folded into format_data under
    'validation').

    ``get_report=True`` appends the rendered standalone dedup report
    string (and ``print_logs=True`` prints it), mirroring the
    reference's self-rendered template with fallback
    (``common.py:140-186``).

    ``return_rejected=True`` appends the dropped rows labeled with a
    ``dup_reason`` column — computed from the SAME all-column conflict
    semantics as the cleaned output, so a rejected-row export always
    reconciles with it (a caption-only labeling would disagree when
    rows share a key+caption but differ in another column). With
    ``validate=True`` the export ALSO carries the rows the decode gate
    dropped, labeled with their decode reason (ADVICE r2: they
    previously appeared in neither output).
    """
    keys = list(partial_dup_cols) if partial_dup_cols else [KEY_COL]
    validate_format_data = {}
    validation_rejected = None
    if validate:
        # local import mirrors the reference's circular-import guard
        from mehc_curation_spark.stages.validation import ValidationStage

        stage = ValidationStage(df)
        if return_rejected:
            # one shared implementation of gate + export + counters
            # (validate_with_rejected) so the keep-only and export
            # paths cannot drift
            if return_format_data:
                df, validation_rejected, validate_format_data = \
                    stage.validate_with_rejected(DUP_REASON_COL, True)
            else:
                df, validation_rejected = \
                    stage.validate_with_rejected(DUP_REASON_COL)
        elif return_format_data:
            df, validate_format_data = stage.validate(
                return_format_data=True)
        else:
            df = stage.validate()
    # id_col plays the pandas-index role (row identity, not a value
    # column) — it must not participate in conflict / full-row checks.
    others = [c for c in df.columns if c not in keys and c != id_col]
    # 128-bit equality surrogates (same trick as plan._cap_hash,
    # null-preserving): the window aggregation state and sort keys are
    # 16-byte structs instead of raw payloads, so a viral key's
    # collect_set buffers megabytes of hashes instead of gigabytes of
    # image bytes and the row_number sort never compares binary blobs.
    # (The payload rows themselves still cross the exchange exactly
    # once — they have to reach the output — but no payload enters any
    # aggregation buffer or comparator.) Two distinct payloads
    # colliding in 128 bits is ~2^-128 per pair — a non-question.
    labeled = df
    hcols = []
    for i, c in enumerate(others):
        h = f"_h{i}"
        labeled = labeled.withColumn(h, F.when(
            F.col(c).isNotNull(),
            F.struct(F.xxhash64(F.col(c)).alias("a"),
                     F.xxhash64(F.col(c), F.lit(1)).alias("b"))))
        hcols.append(h)
    # conflicting keys: any non-key column with >1 distinct value
    w_key = Window.partitionBy(*keys)
    conflict = F.lit(False)
    for h in hcols:
        conflict = conflict | (F.size(F.collect_set(F.col(h)).over(w_key)) > 1)
    w_row = Window.partitionBy(*keys, *hcols).orderBy(
        id_col if id_col in df.columns else keys[0])
    labeled = (
        labeled.withColumn("_conflict", conflict)
        .withColumn("_rn", F.row_number().over(w_row))
    )
    drop_cols = ["_conflict", "_rn", *hcols]
    cleaned = (
        labeled.filter(~F.col("_conflict") & (F.col("_rn") == 1))
        .drop(*drop_cols)
    )
    rejected = (
        labeled.filter(F.col("_conflict") | (F.col("_rn") > 1))
        .withColumn(DUP_REASON_COL,
                    F.when(F.col("_conflict"), F.lit("duplicate_conflict"))
                    .otherwise(F.lit("duplicate_perfect")))
        .drop(*drop_cols)
    )
    if validation_rejected is not None:
        rejected = rejected.unionByName(validation_rejected)
    if not (show_dup_info or return_format_data or return_rejected
            or get_report):
        return cleaned

    dup_rows = labeled.filter(F.col("_conflict") | (F.col("_rn") > 1))
    # one report row per duplicated key, flagged perfect vs partial
    # (≅ common.py:115-121); indexes = member ids (≅ common.py:123-131)
    idx_agg = (F.sort_array(F.collect_list(id_col)).alias("indexes")
               if id_col in df.columns else F.count("*").alias("indexes"))
    # is_perfect_dups follows the reference exactly (common.py:121:
    # `isin(perfect_dups)`): a key is flagged perfect when it has ANY
    # full-row duplicate beyond the first — even if it is ALSO
    # conflicting (mixed keys like (k,a),(k,a),(k,b) count as perfect).
    dups_info = (
        dup_rows.groupBy(*keys)
        .agg(
            F.max(F.col("_rn") > 1).alias("is_perfect_dups"),
        )
        .join(df.groupBy(*keys).agg(idx_agg), on=keys, how="left")
    )
    out = [cleaned]
    if show_dup_info:
        out.append(dups_info)
    fmt = None
    if return_format_data or get_report:
        n_in = df.count()
        n_unique = cleaned.count()
        flags = {r["is_perfect_dups"]: r["cnt"]
                 for r in dups_info.groupBy("is_perfect_dups")
                 .agg(F.count("*").alias("cnt")).collect()}
        fmt = {
            "duplicate_validation_input": n_in,
            "perfect_dups": int(flags.get(True, 0)),
            "partial_dups": int(flags.get(False, 0)),
            "validation_unique": n_unique,
        }
        if validate_format_data:
            fmt["validation"] = validate_format_data
        if return_format_data:
            out.append(fmt)
    if return_rejected:
        out.append(rejected)
    if get_report:
        from mehc_curation_spark.io.reports import render_dedup_report

        report = render_dedup_report(fmt)
        if print_logs:
            print(report)
        out.append(report)
    return tuple(out) if len(out) > 1 else out[0]


def exact_content_dedup(df: DataFrame, bytes_col: str = "bytes",
                        id_col: str = "image_id") -> DataFrame:
    """Exact duplicate labeling over opaque binary payloads (image /
    audio / video bytes): group on a 128-bit md5 content digest
    computed AT THE SCAN, keep-first by id within each group.

    Returns ``(id, grp_n, keep)`` — ``keep`` is True for the first row
    (ordered by id) of each digest group, ``grp_n`` is the group size.

    The 100 TB story: the payload column never shuffles — only the
    (id, 32-hex-char digest) projection crosses the exchange, so a
    petabyte of images deduplicates with a ~50-byte-per-row shuffle.
    Both windows hash-partition on the digest, so Catalyst satisfies
    them with ONE exchange. NULL payloads are never duplicates of each
    other: the digest is salted with the row id so each NULL row forms
    its own singleton group (keep=True, grp_n=1) — which also removes
    the all-NULLs skew partition a naive group-on-digest would create.
    md5 equality stands in for byte equality at a ~2^-64 birthday risk
    per 10^9 distinct payloads; the driver oracle groups DuckDB on the
    raw blob, so a collision would surface as a value mismatch.

    Reference analog: perfect-duplicate removal keyed on content
    rather than phash (/root/reference/mehc_curation/utils/common.py:88-90).
    """
    digest = F.when(
        F.col(bytes_col).isNotNull(), F.md5(F.col(bytes_col))
    ).otherwise(F.concat(F.lit("null:"), F.col(id_col).cast("string")))
    slim = df.select(F.col(id_col), digest.alias("_digest"))
    wg = Window.partitionBy("_digest")
    wr = Window.partitionBy("_digest").orderBy(id_col)
    return (slim
            .withColumn("grp_n", F.count("*").over(wg))
            .withColumn("keep", F.row_number().over(wr) == F.lit(1))
            .drop("_digest"))
