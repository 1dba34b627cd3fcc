"""Image decode gate — shared reason logic (rule F1).

Graft analog of ``validate_smi`` (RDKit parse gate,
``/root/reference/mehc_curation/validation/utils/validation_utils.py:26-32``):
payload that does not decode ⇒ row invalid. Used by both the oracle
and the Spark mapInPandas batch UDF so reason strings match exactly.
"""

from __future__ import annotations

from typing import Optional

from mehc_curation_spark.codecs.image import DecodeError, decode_image

MAX_DIM = 4096


def decode_reason(data, fmt, w, h) -> Optional[str]:
    """None if the payload decodes cleanly, else the drop reason."""
    return decode_quality_reason(data, fmt, w, h, iq=None)


def decode_quality_reason(data, fmt, w, h, iq=None) -> Optional[str]:
    """Decode gate plus (optionally) the image-quality gate, with ONE
    decode for both — the pixels never get decoded twice.

    ``iq``: None (decode checks only, == :func:`decode_reason`) or the
    threshold 5-tuple (min_dim, max_aspect, min_blur_var, min_entropy,
    max_flat_frac) from ``CurationConfig.iq_thresholds()``. Decode
    reasons keep priority over quality reasons (a payload must decode
    before it can be judged).
    """
    if data is None or (isinstance(data, (bytes, bytearray)) and len(data) == 0):
        return "image_null"
    if w is None or h is None or w <= 0 or h <= 0 or w > MAX_DIM or h > MAX_DIM:
        return "image_bad_dims"
    try:
        px = decode_image(data, fmt, int(w), int(h))
    except DecodeError as e:
        if "dims" in str(e):
            return "image_bad_dims"
        return "image_undecodable"
    if iq is None:
        return None
    from mehc_curation_spark.rules.imgquality import quality_reason

    return quality_reason(px, *iq)
