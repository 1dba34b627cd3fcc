"""Image-payload metadata: audit, embed, and scrub PNG ancillary chunks.

The image-side twin of the caption PII scrub: PNG payloads can carry
textual metadata (tEXt / iTXt / zTXt — author, comments, source URLs),
timestamps (tIME) and full EXIF blocks (eXIf — which may embed GPS
coordinates), none of which affect the decoded pixels. A 10^12-image
corpus assembled from crawls must be able to (a) AUDIT what metadata
rides inside the payload bytes, (b) STRIP it before publication (the
scrub: PII and provenance live there), and (c) EMBED its own
provenance (license / source tags) at write time.

All three are byte-splicing operations over the chunk framing — the
pixel data (IDAT) is never re-encoded, so the scrub's invariant is
byte-level: ``strip(embed(x)) == x`` for a payload with no prior
metadata, and decoded pixels are bit-identical through any of them.

Chunk taxonomy follows the PNG spec (ISO/IEC 15948 §5.4): a chunk is
ancillary iff bit 5 of its first tag byte is set (lowercase first
letter); critical chunks (IHDR, PLTE, IDAT, IEND) are the image.
Formats without a metadata container in this corpus (raw, bmp, jpegq —
see codecs/image.py) audit as empty and pass through the scrub
unchanged.

Scale shape: one vectorized Arrow batch stage per operator (pandas
UDF over the binary column), zero shuffles, zero decode — the chunk
walk touches framing bytes only, so the scrub runs at IO speed.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_TEXT_TAGS = (b"tEXt", b"iTXt", b"zTXt")


def iter_png_chunks(data: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (tag, raw_chunk_bytes) over a PNG stream, stopping after
    IEND. ``raw_chunk_bytes`` is the full framed chunk (length + tag +
    payload + crc) so callers can splice without recomputing CRCs.
    Raises ValueError on a non-PNG signature or truncated framing —
    callers map that to an unauditable/unstrippable row, mirroring the
    decode gate's DecodeError contract."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        end = pos + 12 + length
        if end > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[pos + 4:pos + 8]
        yield tag, data[pos:end]
        if tag == b"IEND":
            return
        pos = end
    raise ValueError("PNG stream ended without IEND")


def _is_ancillary(tag: bytes) -> bool:
    return bool(tag[0] & 0x20)


def _audit_one(data: Optional[bytes], fmt: Optional[str]):
    """(chunks, text_keys, meta_bytes, has_text, has_exif, has_time)
    for one payload; all-NULL row when the payload is NULL or the PNG
    framing is broken (unauditable ≠ clean)."""
    if data is None:
        return (None, None, None, None, None, None)
    if fmt != "png":
        return ([], [], 0, False, False, False)
    chunks, keys, nbytes = [], [], 0
    try:
        for tag, raw in iter_png_chunks(bytes(data)):
            if not _is_ancillary(tag):
                continue
            chunks.append(tag.decode("latin-1"))
            nbytes += len(raw)
            if tag in _TEXT_TAGS:
                payload = raw[8:-4]
                keys.append(payload.split(b"\x00", 1)[0]
                            .decode("latin-1", "replace"))
    except ValueError:
        return (None, None, None, None, None, None)
    return (chunks, keys, nbytes,
            any(c.encode("latin-1") in _TEXT_TAGS for c in chunks),
            "eXIf" in chunks, "tIME" in chunks)


_AUDIT_T = StructType([
    StructField("meta_chunks", ArrayType(StringType())),
    StructField("text_keys", ArrayType(StringType())),
    StructField("meta_bytes", LongType()),
    StructField("has_text_meta", BooleanType()),
    StructField("has_exif", BooleanType()),
    StructField("has_time", BooleanType()),
])


def make_metadata_audit_udf():
    @pandas_udf(_AUDIT_T)
    def audit_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
        rows = [_audit_one(d, f) for d, f in zip(data, fmt)]
        return pd.DataFrame(rows, columns=[f.name for f in _AUDIT_T.fields])

    return audit_udf


def image_metadata_audit(df: DataFrame, bytes_col: str = "bytes",
                         fmt_col: str = "fmt") -> DataFrame:
    """Append the metadata-audit columns (chunk tags in stream order,
    tEXt/iTXt/zTXt keys, framed ancillary byte total, and the three
    policy booleans). One Arrow stage, no decode, no shuffle."""
    res = make_metadata_audit_udf()(F.col(bytes_col), F.col(fmt_col))
    return df.withColumn("_meta", res).select("*", "_meta.*").drop("_meta")


def strip_png_metadata_bytes(data: bytes) -> bytes:
    """Keep only critical chunks (and nothing after IEND); kept bytes
    are spliced verbatim — CRCs and IDAT compression untouched."""
    out = [_PNG_SIG]
    for tag, raw in iter_png_chunks(data):
        if not _is_ancillary(tag):
            out.append(raw)
    return b"".join(out)


def make_strip_metadata_udf():
    """NULL-in → NULL-out; non-PNG formats pass through unchanged;
    a PNG whose framing fails to parse passes through UNCHANGED —
    an unparseable payload cannot carry provable metadata, the decode
    gate drops it downstream anyway, and passthrough keeps the scrub
    total and idempotent (the audit marks such rows NULL =
    unauditable, so policy can still quarantine them). Mirrors the
    reference's neutralize passthrough-on-failure quirk (SURVEY
    §4.2.5)."""
    @pandas_udf(BinaryType())
    def strip_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for d, f in zip(data, fmt):
            if d is None:
                out.append(None)
            elif f != "png":
                out.append(bytes(d))
            else:
                try:
                    out.append(strip_png_metadata_bytes(bytes(d)))
                except ValueError:
                    out.append(bytes(d))
        return pd.Series(out, dtype=object)

    return strip_udf


def strip_image_metadata(df: DataFrame, bytes_col: str = "bytes",
                         fmt_col: str = "fmt") -> DataFrame:
    """Replace ``bytes_col`` with the metadata-free payload (see
    :func:`make_strip_metadata_udf` for the NULL contract)."""
    return df.withColumn(
        bytes_col,
        make_strip_metadata_udf()(F.col(bytes_col), F.col(fmt_col)))


def embed_png_text_bytes(data: bytes, key: str, value: str) -> bytes:
    """Insert one tEXt chunk (latin-1 per spec) right after IHDR —
    the provenance-tagging write path (license / source-url tags).
    Idempotence is the caller's concern; CRC computed for the new
    chunk only."""
    payload = key.encode("latin-1") + b"\x00" + value.encode("latin-1")
    chunk = (struct.pack(">I", len(payload)) + b"tEXt" + payload
             + struct.pack(">I", zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF))
    out, inserted = [_PNG_SIG], False
    for tag, raw in iter_png_chunks(data):
        out.append(raw)
        if tag == b"IHDR" and not inserted:
            out.append(chunk)
            inserted = True
    if not inserted:
        raise ValueError("PNG stream has no IHDR")
    return b"".join(out)


def make_embed_text_udf(key: str):
    """tEXt embedder: value comes from a second string column (so
    per-row provenance — source ids, licenses — rides along). Non-PNG,
    NULL and unparseable payloads pass through unchanged (a corrupt
    stream cannot be stamped; same totality policy as the strip)."""
    @pandas_udf(BinaryType())
    def embed_udf(data: pd.Series, fmt: pd.Series,
                  value: pd.Series) -> pd.Series:
        out = []
        for d, f, v in zip(data, fmt, value):
            if d is None or f != "png" or v is None:
                out.append(None if d is None else bytes(d))
            else:
                try:
                    out.append(embed_png_text_bytes(bytes(d), key, str(v)))
                except ValueError:
                    out.append(bytes(d))
        return pd.Series(out, dtype=object)

    return embed_udf


def embed_provenance(df: DataFrame, value_col: str, key: str = "source",
                     bytes_col: str = "bytes",
                     fmt_col: str = "fmt") -> DataFrame:
    """Stamp ``key``=``value_col`` into every PNG payload as a tEXt
    chunk (the write-side provenance op the scrub undoes)."""
    return df.withColumn(
        bytes_col,
        make_embed_text_udf(key)(F.col(bytes_col), F.col(fmt_col),
                                 F.col(value_col)))
