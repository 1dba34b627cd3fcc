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
    if data is None or (isinstance(data, (bytes, bytearray)) and len(data) == 0):
        return "image_null"
    if w is None or h is None or w <= 0 or h <= 0 or w > MAX_DIM or h > MAX_DIM:
        return "image_bad_dims"
    try:
        decode_image(data, fmt, int(w), int(h))
    except DecodeError as e:
        if "dims" in str(e):
            return "image_bad_dims"
        return "image_undecodable"
    return None
