"""Image-payload metadata: audit, embed, and scrub PNG metadata chunks.

The image-side twin of the caption PII scrub: PNG payloads can carry
textual metadata (tEXt / iTXt / zTXt — author, comments, source URLs),
timestamps (tIME) and full EXIF blocks (eXIf — which may embed GPS
coordinates), none of which affect the decoded pixels. A 10^12-image
corpus assembled from crawls must be able to (a) AUDIT what metadata
rides inside the payload bytes, (b) STRIP it before publication (the
scrub: PII and provenance live there), and (c) EMBED its own
provenance (license / source tags) at write time.

All three are byte-splicing operations over the chunk framing — the
pixel data (IDAT) is never re-encoded. The scrub removes EXACTLY the
metadata chunk set the audit reports (``_META_TAGS``: tEXt, iTXt,
zTXt, tIME, eXIf) plus any bytes trailing the IEND chunk (crawled
polyglot files hide payloads there); every other chunk — critical or
ancillary — is spliced through verbatim, because ancillary chunks
like tRNS/gAMA/sRGB/iCCP/sBIT DO affect rendering and deleting them
would corrupt the published corpus. Audit-clean therefore implies
strip-identity byte for byte, and decoded pixels are bit-identical
through any of the three ops.

Chunk taxonomy follows the PNG spec (ISO/IEC 15948 §5.4 / §11.3);
``other_ancillary`` surfaces preserved non-metadata ancillary tags so
policy can still quarantine exotic payloads. Formats without a
metadata container in this corpus (raw, bmp, jpegq — see
codecs/image.py) audit as empty and pass through the scrub unchanged.

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
# exactly what the scrub removes — textual/time/EXIF metadata; other
# ancillary chunks (tRNS, gAMA, sRGB, iCCP, sBIT, ...) affect
# rendering and are preserved verbatim
_META_TAGS = _TEXT_TAGS + (b"tIME", b"eXIf")


def parse_png_chunks(data: bytes) -> tuple[list[tuple[bytes, bytes]], int]:
    """(chunks, n_trailing_bytes) over a PNG stream. Each chunk is
    (tag, raw_framed_bytes) — length + tag + payload + crc, so callers
    can splice without recomputing CRCs; ``n_trailing_bytes`` counts
    anything after IEND. Raises ValueError on a non-PNG signature or
    truncated framing — callers map that to an unauditable/
    unstrippable row, mirroring the decode gate's DecodeError
    contract."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    chunks: list[tuple[bytes, bytes]] = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        end = pos + 12 + length
        if end > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[pos + 4:pos + 8]
        chunks.append((tag, data[pos:end]))
        pos = end
        if tag == b"IEND":
            return chunks, len(data) - pos
    raise ValueError("PNG stream ended without IEND")


def iter_png_chunks(data: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Chunk iterator over :func:`parse_png_chunks` (compat shim)."""
    yield from parse_png_chunks(data)[0]


def _is_ancillary(tag: bytes) -> bool:
    return bool(tag[0] & 0x20)


_AUDIT_NULL = (None,) * 8


def _audit_one(data: Optional[bytes], fmt: Optional[str]):
    """(meta_chunks, other_ancillary, text_keys, meta_bytes, has_text,
    has_exif, has_time, has_trailing) for one payload; all-NULL row
    when the payload is NULL or the PNG framing is broken
    (unauditable ≠ clean). ``meta_bytes`` counts framed strippable
    chunks PLUS post-IEND trailing bytes — exactly the bytes the
    scrub removes, so audit-clean <=> strip-identity."""
    if data is None:
        return _AUDIT_NULL
    if fmt != "png":
        return ([], [], [], 0, False, False, False, False)
    meta, other, keys, nbytes = [], [], [], 0
    try:
        chunks, trailing = parse_png_chunks(bytes(data))
    except ValueError:
        return _AUDIT_NULL
    for tag, raw in chunks:
        if tag in _META_TAGS:
            meta.append(tag.decode("latin-1"))
            nbytes += len(raw)
            if tag in _TEXT_TAGS:
                payload = raw[8:-4]
                keys.append(payload.split(b"\x00", 1)[0]
                            .decode("latin-1", "replace"))
        elif _is_ancillary(tag):
            other.append(tag.decode("latin-1"))
    nbytes += trailing
    return (meta, other, keys, nbytes, bool(keys),
            "eXIf" in meta, "tIME" in meta, trailing > 0)


_AUDIT_T = StructType([
    StructField("meta_chunks", ArrayType(StringType())),
    StructField("other_ancillary", ArrayType(StringType())),
    StructField("text_keys", ArrayType(StringType())),
    StructField("meta_bytes", LongType()),
    StructField("has_text_meta", BooleanType()),
    StructField("has_exif", BooleanType()),
    StructField("has_time", BooleanType()),
    StructField("has_trailing", BooleanType()),
])


def make_metadata_audit_udf():
    @pandas_udf(_AUDIT_T)
    def audit_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
        rows = [_audit_one(d, f) for d, f in zip(data, fmt)]
        return pd.DataFrame(rows, columns=[f.name for f in _AUDIT_T.fields])

    return audit_udf


def image_metadata_audit(df: DataFrame, bytes_col: str = "bytes",
                         fmt_col: str = "fmt") -> DataFrame:
    """Append the metadata-audit columns (strippable chunk tags in
    stream order, preserved ancillary tags, tEXt/iTXt/zTXt keys,
    removable byte total, and the policy booleans). One Arrow stage,
    no decode, no shuffle."""
    res = make_metadata_audit_udf()(F.col(bytes_col), F.col(fmt_col))
    return df.withColumn("_meta", res).select("*", "_meta.*").drop("_meta")


def strip_png_metadata_bytes(data: bytes) -> bytes:
    """Remove metadata chunks (``_META_TAGS``) and post-IEND trailing
    bytes; every other chunk — critical or rendering-relevant
    ancillary — is spliced verbatim (CRCs and IDAT compression
    untouched)."""
    chunks, _ = parse_png_chunks(data)
    out = [_PNG_SIG]
    for tag, raw in chunks:
        if tag not in _META_TAGS:
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
    """Insert one text chunk right after IHDR — the provenance-tagging
    write path (license / source-url tags). Latin-1 values use tEXt;
    anything wider goes into iTXt (UTF-8 per spec §11.3.4.4,
    uncompressed, empty language/translated-keyword), so no value is
    ever silently dropped. Keys must be latin-1 (spec keyword rule).
    Idempotence is the caller's concern; CRC computed for the new
    chunk only."""
    kb = key.encode("latin-1")  # raises for non-latin-1 keys: caller bug
    try:
        payload = kb + b"\x00" + value.encode("latin-1")
        tag = b"tEXt"
    except UnicodeEncodeError:
        payload = kb + b"\x00\x00\x00\x00\x00" + value.encode("utf-8")
        tag = b"iTXt"
    chunk = (struct.pack(">I", len(payload)) + tag + payload
             + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))
    chunks, trailing_n = parse_png_chunks(data)
    out, inserted = [_PNG_SIG], False
    for tag_i, raw in chunks:
        out.append(raw)
        if tag_i == b"IHDR" and not inserted:
            out.append(chunk)
            inserted = True
    if not inserted:
        raise ValueError("PNG stream has no IHDR")
    if trailing_n:
        out.append(data[len(data) - trailing_n:])
    return b"".join(out)


def make_embed_text_udf(key: str):
    """Text-chunk embedder: value comes from a second string column
    (so per-row provenance — source ids, licenses — rides along).
    Non-PNG, NULL and unparseable payloads pass through unchanged (a
    corrupt stream cannot be stamped; same totality policy as the
    strip). The key is validated eagerly — a bad key is a caller bug,
    never a silent passthrough."""
    key.encode("latin-1")  # eager: ValueError/UnicodeEncodeError now
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
    """Stamp ``key``=``value_col`` into every PNG payload as a text
    chunk (the write-side provenance op the scrub undoes)."""
    return df.withColumn(
        bytes_col,
        make_embed_text_udf(key)(F.col(bytes_col), F.col(fmt_col),
                                 F.col(value_col)))
