"""Multimodal column operators: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The image path is REAL (this repo ships NumPy codecs). Audio decode
and video frame-sampling run a DETERMINISTIC FAKE CODEC by default
(raw int16-PCM / fixed-size raw-RGB frame interpretation of the
payload bytes) because no audio/video decoder library ships in this
container — the Spark-side plumbing (schema, batching, partitioning,
per-frame explode) is real and tested end-to-end, and the fake is the
single clearly-marked swap point: pass ``codec="real"`` once a real
decoder (soundfile/PyAV/...) is installed, which today raises
``NotImplementedError`` with that instruction.

Batch-size note for binary payloads: cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (the session helper
uses 2048) so a batch of image bytes stays within Python worker memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("h", IntegerType()),
    StructField("w", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("luma_std", DoubleType()),
])

THUMBNAIL_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("thumb", BinaryType()),   # 16x16 RGB raw
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("clip_id", StringType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
])

VIDEO_FRAMES_SCHEMA = StructType([
    StructField("video_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract image payloads (REAL — NumPy codecs).

    Input: pairs-shaped frame (image_id, bytes, w, h, fmt, ...).
    One decode per image, batch-at-a-time via mapInPandas.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                            + 0.114 * px[:, :, 2])
                    rows.append((r.image_id, True, px.shape[0], px.shape[1],
                                 round(float(px[:, :, 0].mean()), 4),
                                 round(float(px[:, :, 1].mean()), 4),
                                 round(float(px[:, :, 2].mean()), 4),
                                 round(float(luma.std()), 4)))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False, None, None,
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


PHASH_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("phash_computed", LongType()),
])


def compute_phash(df: DataFrame, flip_invariant: bool = False,
                  dihedral_invariant: bool = False) -> DataFrame:
    """Compute the 64-bit DCT perceptual hash FROM PIXELS (REAL —
    decode via the NumPy codecs, hash via ``codecs/phash.py``): the
    operator that produces the ``phash`` dedup-key column the
    north_rule's input table carries, for corpora that arrive without
    one. One decode per image, Arrow-batched; undecodable payloads
    yield (decode_ok=false, phash_computed=NULL) so downstream dedup
    treats them as singletons rather than colliding on a garbage key.

    ``flip_invariant=True`` emits the mirror-canonical hash
    (``codecs/phash.py:phash64_flip`` — unsigned-min of both
    orientations) so exact-equality dedup additionally collapses
    horizontally mirrored reposts, which plain phash sees ~30+ bits
    away. Same cost class: one decode, two hashes.

    ``dihedral_invariant=True`` widens the canonicalization to the
    full D4 orbit (``codecs/phash.py:phash64_dihedral`` — unsigned-min
    over all 8 rotation/mirror variants), additionally collapsing
    90/180/270-rotated re-uploads. One decode, eight 32x32 hashes —
    decode still dominates. Takes precedence over ``flip_invariant``
    (its orbit is a superset).

    The driver check exploits the fixture invariant that the stored
    column IS phash64(decoded pixels) for every intact payload:
    distributed recompute must equal it exactly.
    """
    from pyspark.sql import functions as F

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.codecs.phash import (
            phash64, phash64_dihedral, phash64_flip,
        )

        hashfn = (phash64_dihedral if dihedral_invariant
                  else phash64_flip if flip_invariant else phash64)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id, True, hashfn(px)))
                except (DecodeError, TypeError, ValueError):
                    # sentinel 0, nullified in Catalyst below: an
                    # OBJECT column of python ints with Nones goes
                    # through float64 in PySpark's Arrow writer and
                    # loses the low bits of 64-bit hashes (nullable
                    # Int64 would be exact, but pure-int64 + mask is
                    # the simplest path that can't regress)
                    rows.append((r.image_id, False, 0))
            out = pd.DataFrame(rows, columns=[f.name for f in
                                              PHASH_SCHEMA.fields])
            out["phash_computed"] = out["phash_computed"].astype("int64")
            yield out

    raw = (df.select("image_id", "bytes", "w", "h", "fmt")
           .mapInPandas(run, PHASH_SCHEMA))
    return raw.withColumn(
        "phash_computed",
        F.when(F.col("decode_ok"), F.col("phash_computed")))


def image_thumbnails(df: DataFrame, size: int = 16) -> DataFrame:
    """Resize to a size×size raw-RGB thumbnail (REAL — area-average
    resample from the phash module)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.codecs.phash import _resample_area

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    thumb = np.stack(
                        [_resample_area(px[:, :, c].astype(np.float64), size)
                         for c in range(3)], axis=2)
                    data = np.clip(np.round(thumb), 0, 255).astype(np.uint8).tobytes()
                    rows.append((r.image_id, data))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, None))
            yield pd.DataFrame(rows, columns=["image_id", "thumb"])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, THUMBNAIL_SCHEMA))


IMAGE_QUALITY_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("min_dim", IntegerType()),
    StructField("aspect", DoubleType()),
    StructField("blur_var", DoubleType()),
    StructField("entropy", DoubleType()),
    StructField("flat_frac", DoubleType()),
])


# the scalar kernel lives with the other rule kernels so the curate
# pipeline (rules/decode.py gate) shares it; re-exported here for the
# standalone operator surface
from mehc_curation_spark.rules.imgquality import quality_metrics  # noqa: F401,E402


def image_quality(df: DataFrame) -> DataFrame:
    """No-reference image quality signals (REAL — NumPy codecs decode
    the payload; see :func:`quality_metrics` for the kernel).

    The web-scale gate the caption-side heuristics can't provide:
    drop tiny / extreme-aspect / blurred / flat / low-entropy images
    before they cost training compute. One decode per image inside the
    Arrow stage; only the scalar metrics come back, so the binary
    payload crosses the JVM->Python boundary once and never shuffles.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id, True) + quality_metrics(px))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False,
                                 None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_QUALITY_SCHEMA.fields])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, IMAGE_QUALITY_SCHEMA))


# gate reasons in evaluation order (first failing rule wins, matching
# the curate pipeline's drop_reason convention)
IMAGE_QUALITY_REASONS = (
    ("img_undecodable", None),
    ("img_too_small", "min_dim"),
    ("img_extreme_aspect", "aspect"),
    ("img_blurry", "blur_var"),
    ("img_low_entropy", "entropy"),
    ("img_flat", "flat_frac"),
)


def image_quality_gate(df: DataFrame, min_dim: int = 32,
                       max_aspect: float = 4.0, min_blur_var: float = 10.0,
                       min_entropy: float = 2.0,
                       max_flat_frac: float = 0.9) -> DataFrame:
    """Keep/drop gate over :func:`image_quality` signals.

    Decode + metrics run in the Arrow stage; the thresholds themselves
    are pure Catalyst expressions over the returned scalars, so tuning
    a threshold re-plans JVM-side without touching Python. Returns
    (image_id, metrics..., keep, drop_reason) with the first failing
    rule as the reason.
    """
    from pyspark.sql import functions as F

    q = image_quality(df)
    checks = [
        ("img_undecodable", ~F.col("decode_ok")),
        ("img_too_small", F.col("min_dim") < F.lit(min_dim)),
        ("img_extreme_aspect", F.col("aspect") > F.lit(max_aspect)),
        ("img_blurry", F.col("blur_var") < F.lit(min_blur_var)),
        ("img_low_entropy", F.col("entropy") < F.lit(min_entropy)),
        ("img_flat", F.col("flat_frac") > F.lit(max_flat_frac)),
    ]
    reason = F.lit(None).cast(StringType())
    for name, cond in reversed(checks):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return q.select("*", reason.alias("drop_reason")) \
            .withColumn("keep", F.col("drop_reason").isNull())


def fake_decode_audio(data: bytes | None) -> np.ndarray:
    """Deterministic fake audio decoder: the payload IS raw
    little-endian int16 PCM (a trailing odd byte is ignored). This is
    the default codec — swap point for a real decoder library."""
    buf = bytes(data or b"")
    return np.frombuffer(buf[:len(buf) // 2 * 2], dtype="<i2")


FAKE_FRAME_BYTES = 8 * 8 * 3  # fake video codec: 8x8 raw-RGB frames


def fake_iter_frames(data: bytes | None):
    """Deterministic fake video decoder: the payload is a sequence of
    fixed-size raw-RGB frames (trailing partial frame ignored)."""
    buf = bytes(data or b"")
    for i in range(len(buf) // FAKE_FRAME_BYTES):
        yield i, buf[i * FAKE_FRAME_BYTES:(i + 1) * FAKE_FRAME_BYTES]


def _require_fake(codec: str, kind: str) -> None:
    if codec == "fake":
        return
    raise NotImplementedError(
        f"{kind} codec '{codec}' requires a decoder library not present "
        "in this environment; the deterministic fake codec (codec='fake', "
        "the default) exercises the full Spark plumbing")


def audio_features(df: DataFrame, clip_col: str = "bytes",
                   id_col: str = "clip_id", codec: str = "fake") -> DataFrame:
    """Audio decode + RMS features over opaque clip payloads.

    The default deterministic fake codec interprets the payload as raw
    int16 PCM (see :func:`fake_decode_audio`); everything around it —
    binary-column batching, Arrow transfer, per-clip aggregation — is
    the real production shape. ``codec="soundfile"`` etc. raise
    ``NotImplementedError`` until a decoder library is installed.
    """
    _require_fake(codec, "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = fake_decode_audio(getattr(r, clip_col))
                rms = (float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                       if pcm.size else 0.0)
                rows.append((getattr(r, id_col), int(pcm.size), round(rms, 4)))
            yield pd.DataFrame(rows, columns=["clip_id", "n_samples", "rms"])

    return df.select(df[id_col].alias(id_col), df[clip_col].alias(clip_col)) \
             .mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def video_frame_sample(df: DataFrame, video_col: str = "bytes",
                       id_col: str = "video_id", every_n: int = 10,
                       codec: str = "fake") -> DataFrame:
    """Sample every Nth frame of a video payload (one output row per
    sampled frame — the explode happens inside the Arrow stage, so
    payload bytes cross the boundary once and only sampled frames come
    back).

    The default deterministic fake codec treats the payload as a
    sequence of 8x8 raw-RGB frames (see :func:`fake_iter_frames`);
    ``codec="pyav"`` etc. raise ``NotImplementedError`` until a real
    decoder is installed.
    """
    _require_fake(codec, "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for i, frame in fake_iter_frames(getattr(r, video_col)):
                    if i % every_n == 0:
                        rows.append((getattr(r, id_col), i, frame))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame"])

    return df.select(df[id_col].alias(id_col), df[video_col].alias(video_col)) \
             .mapInPandas(run, VIDEO_FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing (image-training batch construction)
# ---------------------------------------------------------------------------

def ar_bucket_table(target_area: int = 512 * 512, stride: int = 64,
                    min_dim: int = 256, max_ar: float = 4.0) -> list:
    """Enumerate the aspect-ratio bucket shapes used to batch
    variable-aspect images for training (the NovelAI / SDXL bucketing
    scheme: every bucket dimension is a multiple of ``stride``, bucket
    area is as close to ``target_area`` as the stride grid allows, and
    extreme aspects are excluded).

    Returns ``[(bucket_id, w, h, log_ar)]`` sorted by ascending aspect
    ratio (w/h) — a pure function of the parameters, identical on every
    engine, so bucket boundaries can be restated literally in SQL.
    """
    import math

    shapes = set()
    d = min_dim
    while True:
        other = int(target_area // d // stride) * stride
        if other < min_dim:
            break
        if max(d, other) / min(d, other) <= max_ar:
            shapes.add((d, other))
            shapes.add((other, d))
        d += stride
    out = sorted(shapes, key=lambda s: (s[0] / s[1], s[0]))
    return [(i, w, h, math.log(w / h)) for i, (w, h) in enumerate(out)]


def assign_ar_buckets(df: DataFrame, w_col: str = "w", h_col: str = "h",
                      target_area: int = 512 * 512, stride: int = 64,
                      min_dim: int = 256, max_ar: float = 4.0) -> DataFrame:
    """Assign every image to its nearest aspect-ratio bucket (nearest
    in log-aspect space, the metric that treats 2:1 and 1:2 distortion
    symmetrically) and emit the scale factor that maps the image onto
    the bucket with a cover fit (scale so BOTH bucket dims are filled;
    the overflow axis is what a training loader centre-crops).

    Pure Catalyst — bucket boundaries are the log-space midpoints
    between consecutive buckets, precomputed in Python (and exp'd back
    so the engine-side comparison is plain ``w/h < literal`` — IEEE
    division is correctly-rounded and therefore bit-identical across
    engines, unlike library ``ln``) and compiled to one CASE chain;
    the scan stays whole-stage codegen with zero shuffle and zero
    Python, and the identical CASE restates in the DuckDB oracle.
    Appends (bucket_id, bucket_w, bucket_h, scale).
    """
    import math

    from pyspark.sql import functions as F

    buckets = ar_bucket_table(target_area, stride, min_dim, max_ar)
    if not buckets:
        raise ValueError("bucket table is empty; loosen the parameters")
    ar = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    # midpoint in log space between bucket i and i+1, exp'd back
    bid = F.lit(buckets[-1][0])
    for (i, _, _, la), (_, _, _, lb) in zip(buckets[:-1][::-1],
                                            buckets[1:][::-1]):
        bid = F.when(ar < F.lit(math.exp((la + lb) / 2.0)), F.lit(i)) \
               .otherwise(bid)
    # NULL/degenerate dims would otherwise fall through every WHEN to
    # the widest bucket — a plausible-looking garbage assignment
    valid = (F.col(w_col).isNotNull() & F.col(h_col).isNotNull()
             & (F.col(w_col) > 0) & (F.col(h_col) > 0))
    bid = F.when(valid, bid)
    out = df.withColumn("bucket_id", bid)
    bw = F.when(F.col("bucket_id").isNotNull(), F.lit(buckets[-1][1]))
    bh = F.when(F.col("bucket_id").isNotNull(), F.lit(buckets[-1][2]))
    for i, w, h, _ in buckets[:-1][::-1]:
        bw = F.when(F.col("bucket_id") == i, F.lit(w)).otherwise(bw)
        bh = F.when(F.col("bucket_id") == i, F.lit(h)).otherwise(bh)
    out = out.withColumn("bucket_w", bw).withColumn("bucket_h", bh)
    scale = F.greatest(
        F.col("bucket_w").cast("double") / F.col(w_col).cast("double"),
        F.col("bucket_h").cast("double") / F.col(h_col).cast("double"))
    return out.withColumn("scale", scale)


IMAGE_BORDERS_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("border_top", IntegerType()),
    StructField("border_bottom", IntegerType()),
    StructField("border_left", IntegerType()),
    StructField("border_right", IntegerType()),
    StructField("border_frac", DoubleType()),
])


def image_borders(df: DataFrame, tol: int = 8) -> DataFrame:
    """Uniform-border / letterbox detection (REAL — NumPy codecs
    decode the payload; kernel: rules/imgquality.py border_metrics).

    Crawled images routinely arrive letterboxed, pillarboxed or framed
    by player chrome; training on them burns pixels on bars and skews
    aspect statistics, so curation pipelines measure border thickness
    and either crop or drop. Same physical shape as image_quality: one
    decode per image inside the Arrow stage, only five scalars return,
    payload never shuffles.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.rules.imgquality import border_metrics

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id, True) + border_metrics(px, tol))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False,
                                 None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_BORDERS_SCHEMA.fields])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, IMAGE_BORDERS_SCHEMA))


RESIZE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("resized", BooleanType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
])


def resize_images(df: DataFrame, target: int = 256, mode: str = "longest",
                  upscale: bool = False, out_fmt: str | None = None,
                  validate: bool = True,
                  passthrough_cols: tuple[str, ...] = (),
                  with_phash: bool = False,
                  hash_invariance: str = "none") -> DataFrame:
    """Resize payloads so the longest (or shortest) side hits ``target``
    and re-encode (REAL — NumPy codecs + deterministic bilinear kernel,
    codecs/resize.py).

    The payload-transform analog of the reference's cleaning
    projections — per-row ``(new_value, changed?)`` over the payload
    column with an unchanged fast path
    (`/root/reference/mehc_curation/cleaning/core/engine.py:36-85`):
    images already within the bound pass through byte-identical with
    ``resized=False``; undecodable payloads surface ``decode_ok=False``
    with NULL bytes (the reference's unprocessable sentinel, F6).
    ``validate=False`` skips the decode on unchanged rows (use after a
    validation stage has already gated decodability).

    Configuration (mode / out_fmt / target) is validated ONCE at
    operator construction — a typo raises here on the driver instead
    of silently nulling every row inside the per-row decode guard.

    Returns a pairs-shaped frame (image_id, bytes, w, h, fmt) that
    downstream ops (compute_phash, export, curate) consume unchanged.
    ``passthrough_cols`` carries any further input columns (caption,
    phash, ...) THROUGH the Arrow stage — at scale this is the right
    way to keep a full-schema output, because the alternative (an
    image_id equi-join back to the source) shuffles the whole resized
    payload across executors. ``with_phash=True`` appends a
    ``phash_computed`` column hashed from the OUTPUT pixels while they
    are still in hand (resizing moves DCT coefficients, so the stored
    phash no longer identifies the new payload) — again inside the
    same stage, zero extra decodes and zero joins; it forces the
    decode of unchanged rows (a hash needs pixels).
    ``hash_invariance`` picks the rehash canonicalization —
    ``"none"`` (plain phash64), ``"flip"`` (mirror-canonical) or
    ``"dihedral"`` (full-D4-orbit canonical), matching
    :func:`compute_phash`'s flags. Decode + resample
    + re-encode all happen inside ONE Arrow stage: bytes cross the
    JVM->Python boundary once each way and never shuffle.
    """
    from mehc_curation_spark.codecs.image import KNOWN_FORMATS

    if mode not in ("longest", "shortest", "exact"):
        raise ValueError(f"unknown resize mode {mode!r}")
    if int(target) < 1:
        raise ValueError(f"target must be >= 1, got {target}")
    if out_fmt is not None and out_fmt not in KNOWN_FORMATS:
        raise ValueError(
            f"unknown out_fmt {out_fmt!r}; known: {KNOWN_FORMATS}")
    if hash_invariance not in ("none", "flip", "dihedral"):
        raise ValueError(
            f"unknown hash_invariance {hash_invariance!r}; "
            "expected none|flip|dihedral")
    payload_cols = ("image_id", "bytes", "w", "h", "fmt")
    passthrough_cols = tuple(passthrough_cols)
    clash = [c for c in passthrough_cols if c in payload_cols]
    if clash:
        raise ValueError(f"passthrough collides with payload: {clash}")
    missing = [c for c in passthrough_cols if c not in df.columns]
    if missing:
        raise ValueError(f"passthrough columns not in input: {missing}")
    hash_fields = ([StructField("phash_computed", LongType())]
                   if with_phash else [])
    out_schema = StructType(list(RESIZE_SCHEMA.fields) + hash_fields
                            + [df.schema[c] for c in passthrough_cols])
    out_names = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import (
            LOSSLESS_FORMATS, DecodeError, decode_image, encode_image)
        from mehc_curation_spark.codecs.phash import (
            phash64, phash64_dihedral, phash64_flip,
        )
        from mehc_curation_spark.codecs.resize import fit_dims, resize_bilinear

        hashfn = {"none": phash64, "flip": phash64_flip,
                  "dihedral": phash64_dihedral}[hash_invariance]

        for pdf in batches:
            rows = []
            # positional tuples: passthrough names need not be valid
            # python identifiers
            for r in pdf.itertuples(index=False, name=None):
                image_id, data, w0, h0, fmt0 = r[:5]
                extra = r[5:]
                try:
                    w, h = int(w0), int(h0)
                    out_w, out_h, chg = fit_dims(w, h, target, mode, upscale)
                    fmt = out_fmt or fmt0
                    if not chg and fmt == fmt0:
                        # unchanged fast path: byte-identical (no
                        # lossy re-encode); decode only to validate
                        # or hash, skippable when a validation stage
                        # already ran
                        px = (decode_image(data, fmt0, w, h)
                              if validate or with_phash else None)
                        hcol = ((hashfn(px),) if with_phash else ())
                        rows.append((image_id, True, False,
                                     bytes(data), w, h, fmt0)
                                    + hcol + extra)
                        continue
                    px = decode_image(data, fmt0, w, h)
                    out_px = resize_bilinear(px, out_h, out_w) if chg else px
                    enc = encode_image(out_px, fmt)
                    if with_phash:
                        # hash the pixels a READER of the new payload
                        # sees: lossy formats quantize, so round-trip
                        # through the codec before hashing
                        stored = (out_px if fmt in LOSSLESS_FORMATS
                                  else decode_image(enc, fmt, out_w, out_h))
                        hcol = (hashfn(stored),)
                    else:
                        hcol = ()
                    rows.append((image_id, True, chg, enc,
                                 out_w, out_h, fmt) + hcol + extra)
                except (DecodeError, TypeError, ValueError):
                    # sentinel 0 for the hash (nullified in Catalyst
                    # below): an OBJECT long column holding Nones goes
                    # through float64 in the Arrow writer and loses
                    # low bits of 64-bit hashes
                    hcol = ((0,) if with_phash else ())
                    rows.append((image_id, False, None, None,
                                 None, None, None) + hcol + extra)
            out = pd.DataFrame(rows, columns=out_names)
            if with_phash:
                out["phash_computed"] = \
                    out["phash_computed"].astype("int64")
            yield out

    res = (df.select(*payload_cols, *passthrough_cols)
           .mapInPandas(run, out_schema))
    if with_phash:
        from pyspark.sql import functions as F

        res = res.withColumn(
            "phash_computed",
            F.when(F.col("decode_ok"), F.col("phash_computed")))
    return res


IMAGE_COLOR_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("colorfulness", DoubleType()),
    StructField("sat_mean", DoubleType()),
    StructField("max_chan_spread", IntegerType()),
])


def image_color_stats(df: DataFrame, gray_tol: int = 2) -> DataFrame:
    """Color statistics over decoded payloads (REAL — NumPy codecs;
    kernel: rules/imgquality.py color_metrics).

    Hasler–Süsstrunk colorfulness + mean saturation + grayscale
    detection — the color-side quality gates web corpora apply
    (washed-out scans, monochrome placeholders, document photographs).
    Same physical shape as image_quality: one decode per image inside
    the Arrow stage, only scalars return, payload never shuffles.
    ``is_grayscale`` (max channel spread <= gray_tol) is a pure
    Catalyst expression over the returned scalars, so the tolerance
    re-plans JVM-side.
    """
    from pyspark.sql import functions as F

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.rules.imgquality import color_metrics

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id, True) + color_metrics(px))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_COLOR_SCHEMA.fields])

    out = (df.select("image_id", "bytes", "w", "h", "fmt")
           .mapInPandas(run, IMAGE_COLOR_SCHEMA))
    return out.withColumn(
        "is_grayscale",
        F.when(F.col("decode_ok"),
               F.col("max_chan_spread") <= F.lit(gray_tol)))


CROP_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("cropped", BooleanType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
    StructField("crop_top", IntegerType()),
    StructField("crop_bottom", IntegerType()),
    StructField("crop_left", IntegerType()),
    StructField("crop_right", IntegerType()),
])


def crop_borders(df: DataFrame, tol: int = 8,
                 min_keep_frac: float = 0.25,
                 passthrough_cols: tuple[str, ...] = ()) -> DataFrame:
    """Crop detected uniform borders (letterbox / pillarbox / frames)
    and re-encode (REAL — NumPy codecs; detector kernel:
    rules/imgquality.py border_metrics).

    The act-on-it companion to :func:`image_borders`: measure the
    per-side near-solid runs, slice them off, re-encode. Border-free
    images pass through byte-identical (``cropped=False``, the
    reference's unchanged fast path — same payload-transform shape as
    :func:`resize_images`). The crop REFUSES (passthrough, thicknesses
    still reported) when the surviving area falls below
    ``min_keep_frac`` of the original — an almost-all-border image is
    a placeholder to drop, not a 2-pixel sliver to keep. Undecodable
    payloads surface ``decode_ok=False`` with NULL bytes.
    ``passthrough_cols`` carries further input columns through the
    Arrow stage (same rationale as :func:`resize_images`: an id-join
    back would shuffle the payload).

    One Arrow stage; payload crosses once each way, never shuffles.
    """
    payload_cols = ("image_id", "bytes", "w", "h", "fmt")
    passthrough_cols = tuple(passthrough_cols)
    clash = [c for c in passthrough_cols
             if c in payload_cols or c in CROP_SCHEMA.fieldNames()]
    if clash:
        raise ValueError(f"passthrough collides with output: {clash}")
    missing = [c for c in passthrough_cols if c not in df.columns]
    if missing:
        raise ValueError(f"passthrough columns not in input: {missing}")
    out_schema = StructType(list(CROP_SCHEMA.fields)
                            + [df.schema[c] for c in passthrough_cols])
    out_names = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import (
            DecodeError, decode_image, encode_image)
        from mehc_curation_spark.rules.imgquality import border_metrics

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False, name=None):
                image_id, data, w0, h0, fmt0 = r[:5]
                extra = r[5:]
                try:
                    w, h = int(w0), int(h0)
                    px = decode_image(data, fmt0, w, h)
                    t, b, l, rt, _frac = border_metrics(px, tol)
                    new_h, new_w = h - t - b, w - l - rt
                    keep = (t or b or l or rt) and new_h >= 1 \
                        and new_w >= 1 \
                        and new_h * new_w >= min_keep_frac * h * w
                    if not keep:
                        rows.append((image_id, True, False,
                                     bytes(data), w, h, fmt0,
                                     t, b, l, rt) + extra)
                        continue
                    cropped = px[t:h - b, l:w - rt]
                    rows.append((image_id, True, True,
                                 encode_image(cropped, fmt0),
                                 new_w, new_h, fmt0, t, b, l, rt) + extra)
                except (DecodeError, TypeError, ValueError):
                    rows.append((image_id, False, None, None, None,
                                 None, None, None, None, None, None)
                                + extra)
            yield pd.DataFrame(rows, columns=out_names)

    return (df.select(*payload_cols, *passthrough_cols)
            .mapInPandas(run, out_schema))


PSNR_VERIFY_SCHEMA = StructType([
    StructField("id_a", StringType()),
    StructField("id_b", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("same_dims", BooleanType()),
    StructField("psnr_db", DoubleType()),
])

PSNR_SSIM_VERIFY_SCHEMA = StructType(
    PSNR_VERIFY_SCHEMA.fields + [StructField("ssim", DoubleType())])


def verify_pairs_psnr(payload_df: DataFrame, pairs_df: DataFrame,
                      id_col: str = "image_id",
                      cap_db: float = 99.0,
                      include_ssim: bool = False) -> DataFrame:
    """Pixel-space verification of candidate near-dup pairs (REAL —
    NumPy codecs decode both payloads; PSNR kernel codecs/image.py,
    dims reconciled through the deterministic bilinear kernel).

    The verify stage for hash-level candidates: phash hamming (or any
    LSH) proposes, pixels confirm — the same candidates-then-verify
    shape as the MinHash/Jaccard pipeline, but on the image side. The
    scale property that matters at 100 TB: payload bytes join (and
    therefore shuffle) ONLY for the candidate minority — the two
    id-equi-joins move |pairs| payloads, not the corpus; the corpus
    itself is never decoded here.

    When the two images differ in resolution the smaller comparison
    target is produced by resizing side b to side a's dims
    (``same_dims=False``), so a thumbnail duplicate still verifies
    high. PSNR is capped at ``cap_db`` (identical pixels would be
    +inf) and rounded to 4 decimals for distributed/local parity.

    Returns (id_a, id_b, decode_ok, same_dims, psnr_db) —
    ``include_ssim=True`` appends a block-SSIM column (codecs/
    image.py:ssim, Wang et al. 2004) from the SAME single decode:
    PSNR measures pointwise error, SSIM structural change, and a
    near-dup policy often wants both (a recompressed copy scores
    high on both; a watermarked copy keeps PSNR high but drops SSIM
    where the overlay breaks structure).
    """
    from pyspark.sql import functions as F

    schema = PSNR_SSIM_VERIFY_SCHEMA if include_ssim else PSNR_VERIFY_SCHEMA
    pcols = ("bytes", "w", "h", "fmt")
    a = payload_df.select(F.col(id_col).alias("id_a"),
                          *[F.col(c).alias(f"{c}_a") for c in pcols])
    b = payload_df.select(F.col(id_col).alias("id_b"),
                          *[F.col(c).alias(f"{c}_b") for c in pcols])
    j = (pairs_df.select("id_a", "id_b")
         .join(a, "id_a").join(b, "id_b"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import (
            DecodeError, decode_image, psnr, ssim)
        from mehc_curation_spark.codecs.resize import resize_bilinear

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    pa = decode_image(r.bytes_a, r.fmt_a,
                                      int(r.w_a), int(r.h_a))
                    pb = decode_image(r.bytes_b, r.fmt_b,
                                      int(r.w_b), int(r.h_b))
                    same = pa.shape == pb.shape
                    if not same:
                        pb = resize_bilinear(pb, pa.shape[0], pa.shape[1])
                    val = round(min(psnr(pa, pb), cap_db), 4)
                    row = (r.id_a, r.id_b, True, same, val)
                    if include_ssim:
                        row += (round(ssim(pa, pb), 4),)
                    rows.append(row)
                except (DecodeError, TypeError, ValueError):
                    row = (r.id_a, r.id_b, False, None, None)
                    if include_ssim:
                        row += (None,)
                    rows.append(row)
            yield pd.DataFrame(rows,
                               columns=[f.name for f in schema.fields])

    return j.mapInPandas(run, schema)


EXPOSURE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("clip_lo_frac", DoubleType()),
    StructField("clip_hi_frac", DoubleType()),
    StructField("mean_luma", DoubleType()),
    StructField("luma_contrast", DoubleType()),
    StructField("wm_edge_density", DoubleType()),
    StructField("wm_edge_ratio", DoubleType()),
])


def image_exposure(df: DataFrame, clip_lo: int = 2, clip_hi: int = 253,
                   strip_frac: float = 0.125) -> DataFrame:
    """Exposure + bottom-strip overlay signals over decoded payloads
    (REAL — NumPy codecs; kernels rules/imgquality.py
    exposure_metrics + watermark_strip_score).

    Crushed-black / blown-white fractions, luminance mean/contrast,
    and the watermark-band edge-density ratio — the remaining cheap
    pixel-level gates a web corpus applies before spending model
    compute. One decode serves both kernels inside one Arrow stage;
    only scalars return, the payload never shuffles.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.rules.imgquality import (
            exposure_metrics, watermark_strip_score)

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    rows.append((r.image_id, True)
                                + exposure_metrics(px, clip_lo, clip_hi)
                                + watermark_strip_score(px, strip_frac))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False,
                                 None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              EXPOSURE_SCHEMA.fields])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, EXPOSURE_SCHEMA))


TILE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("tile_idx", IntegerType()),
    StructField("tile_hash", LongType()),
])


def tile_phashes(df: DataFrame, grid: int = 4,
                 id_col: str = "image_id") -> DataFrame:
    """Per-tile perceptual hashes, exploded to one row per informative
    tile (``image_id, tile_idx, tile_hash``) — the signature table for
    partial-image dedup. Kernel: ``codecs/phash.py:tile_phashes_of``
    (relative tile boundaries → scale-invariant; flat/degenerate tiles
    omitted — see the kernel docstring). Undecodable payloads emit no
    rows (they cannot partially match anything).

    One decode per image inside the Arrow stage; the payload never
    leaves the scan — only the slim (id, idx, hash) rows shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.codecs.phash import tile_phashes_of

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                except (DecodeError, TypeError, ValueError):
                    continue
                for k, v in tile_phashes_of(px, grid):
                    ids.append(r.image_id)
                    idxs.append(k)
                    hs.append(v)
            yield pd.DataFrame({
                "image_id": pd.Series(ids, dtype="object"),
                "tile_idx": np.asarray(idxs, dtype="int32"),
                "tile_hash": np.asarray(hs, dtype="int64"),
            })

    from pyspark.sql import functions as F

    return (df.select(F.col(id_col).alias("image_id"),
                      "bytes", "w", "h", "fmt")
            .mapInPandas(run, TILE_SCHEMA))


def tile_near_dups(df: DataFrame, grid: int = 4, min_match: int = 6,
                   max_bucket: int = 64,
                   id_col: str = "image_id") -> DataFrame:
    """Partial-image near-dup pairs: images sharing >= ``min_match``
    exact per-tile perceptual hashes — the detector for OVERLAY /
    LOCAL-EDIT variants (watermark stamps, logo corners, small
    retouches) that global phash misses: a localized edit flips
    enough global-DCT bits to escape a hamming-4 gate while 15 of 16
    tiles still hash identically. Measured on the seed-42 fixture
    corpus: 166 pairs at grid=4/min_match=6, 11 of which global
    phash (hamming<=4) does NOT find.

    Exact-match LSH shape (same machinery as the banded hash dedups):
    candidates = pairs sharing any (tile_idx, tile_hash) bucket;
    n_match = bucket-pair occurrences (each image emits one hash per
    tile_idx, so the count IS the number of matching tiles — no
    distinct needed). Degenerate buckets (> max_bucket members) are
    dropped, same skew guard as phash_near_dups; flat tiles were
    already excluded at the kernel. Only (idx, hash, id) rows ever
    shuffle; pixels stay in the scan stage.

    Returns ``id_a < id_b, n_match``.
    """
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.similarity import bucket_pairs

    tiles = tile_phashes(df, grid, id_col)
    grouped = (
        tiles.groupBy("tile_idx", "tile_hash")
        .agg(F.sort_array(F.collect_list("image_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # distinct=False: each (tile, pair) occurrence counts one match
    return (bucket_pairs(grouped, distinct=False)
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("int").alias("n_match"))
            .filter(F.col("n_match") >= min_match))


def cross_corpus_tile_dups(cand_df: DataFrame, ref_df: DataFrame,
                           cand_id_col: str = "image_id",
                           ref_id_col: str = "image_id",
                           grid: int = 4, min_match: int = 6,
                           max_bucket: int = 64) -> DataFrame:
    """IMAGE decontamination: (cand_id, ref_id, n_match) for every
    incoming image sharing >= ``min_match`` per-tile perceptual hashes
    with a reference-corpus image — the pixel twin of
    ``cross_corpus_text_near_dups`` ("is this crawl image an
    overlay/re-encode variant of something already curated / in the
    eval set?"). Exact-match equi-join on (tile_idx, tile_hash):
    both corpora hash ONCE in their own Arrow stage, then only slim
    (idx, hash, id) rows shuffle — pixels never cross corpora.

    Skew guard: a (tile_idx, tile_hash) key whose membership exceeds
    ``max_bucket`` on EITHER side is skipped before the join (the
    cross product of two degenerate buckets is quadratic; same
    documented trade-off as the within-corpus generator and the
    banded text path). The per-key membership count is a WINDOW over
    the tile rows, not a separate aggregation of the same Arrow
    stage — each corpus decodes exactly once, and the window's
    hash-partitioning on the join keys is reused by the join itself.
    """
    index = tile_phashes(ref_df, grid, ref_id_col) \
        .withColumnRenamed("image_id", "ref_id")
    return tile_dups_against_index(cand_df, index, cand_id_col,
                                   grid=grid, min_match=min_match,
                                   max_bucket=max_bucket)


def tile_dups_against_index(cand_df: DataFrame, index_df: DataFrame,
                            cand_id_col: str = "image_id",
                            grid: int = 4, min_match: int = 6,
                            max_bucket: int = 64) -> DataFrame:
    """Tile-phash decontamination against a PRECOMPUTED signature
    index (``ref_id, tile_idx, tile_hash`` — see
    :func:`write_tile_index`): the reference corpus is never decoded
    again. This is the shape a standing 100 TB reference corpus
    actually runs — signatures are computed once at curation time and
    every incoming batch joins against the slim index table (16 rows
    of 20 bytes per reference image, ~3000x smaller than payloads).

    Same join/guard semantics as :func:`cross_corpus_tile_dups`
    (which delegates here); ``grid`` must equal the index's build
    grid or tile geometries won't correspond.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    keys = ["tile_idx", "tile_hash"]
    w = Window.partitionBy(*keys)

    def guarded(t: DataFrame) -> DataFrame:
        return (t.withColumn("_n", F.count(F.lit(1)).over(w))
                .filter(F.col("_n") <= max_bucket).drop("_n"))

    tc = guarded(tile_phashes(cand_df, grid, cand_id_col)
                 .withColumnRenamed("image_id", "cand_id"))
    tr = guarded(index_df.select("ref_id", *keys))
    return (tc.join(tr, keys)
            .groupBy("cand_id", "ref_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_match"))
            .filter(F.col("n_match") >= min_match))


TILE_INDEX_GRID_PROP = "tile_grid"


def write_tile_index(ref_df: DataFrame, table_path: str, grid: int = 4,
                     id_col: str = "image_id",
                     mode: str = "overwrite") -> dict:
    """Materialize a reference corpus's tile signatures as a snapshot
    table (``ref_id, tile_idx, tile_hash``) for repeated
    decontamination via :func:`tile_dups_against_index`. The build
    grid is recorded in the manifest properties so readers hash
    candidates with the SAME geometry; ``mode='append'`` adds a new
    batch of reference images to the standing index (snapshot
    isolation — a concurrent reader keeps its version).
    """
    from mehc_curation_spark.io.catalog import SnapshotTable

    tiles = tile_phashes(ref_df, grid, id_col) \
        .withColumnRenamed("image_id", "ref_id")
    t = SnapshotTable(table_path)
    if mode == "append" and t.current_version() > 0:
        prev = t.manifest().get("properties", {}).get(TILE_INDEX_GRID_PROP)
        # STRICT: a missing grid property means unknown provenance —
        # refuse rather than risk mixing tile geometries
        if prev is None or int(prev) != int(grid):
            raise ValueError(
                f"index at {table_path} was built with grid="
                f"{prev if prev is not None else '<unrecorded>'}; "
                f"appending grid={grid} signatures would mix "
                f"incompatible tile geometries")
    version = t.write(tiles, mode=mode,
                      properties={TILE_INDEX_GRID_PROP: int(grid)},
                      stats_cols=("tile_hash",))
    return {"version": version, "grid": int(grid), "path": table_path}


def read_tile_index(spark, table_path: str):
    """(signatures_df, grid) for an index written by
    :func:`write_tile_index`. Refuses a table without the recorded
    grid — guessing a geometry against an index built with another
    one would silently never tile-match."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(table_path)
    props = t.manifest().get("properties", {})
    if TILE_INDEX_GRID_PROP not in props:
        raise ValueError(
            f"{table_path} lacks the {TILE_INDEX_GRID_PROP!r} "
            f"property — not a tile index written by write_tile_index")
    return t.read(spark), int(props[TILE_INDEX_GRID_PROP])
