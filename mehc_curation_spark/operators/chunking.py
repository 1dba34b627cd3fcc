"""Document chunking — fixed-size token windows with overlap.

Pretraining and retrieval pipelines consume CHUNKS, not documents: a
context-window-sized slice of tokens, overlapping its neighbor so no
span is ever split across a boundary without context (the standard
chunker in every RAG stack and the doc->sample step of pretraining
data prep). One row in, ``ceil((n - overlap) / step)`` rows out.

Pure Catalyst end to end: tokenize once per row, explode a
``sequence`` of chunk indices, ``slice`` the shared token array per
chunk — whole-stage codegen, no Python, no shuffle (chunking is
embarrassingly row-parallel; the output is written partition-aligned
with the input).

Integer-exact chunk-count arithmetic ((n - overlap + step - 1) div
step) so the DuckDB value oracle reproduces the row set without any
float ceil edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split each document into overlapping ``chunk_tokens``-token
    windows advancing by ``chunk_tokens - overlap``.

    Chunk i covers tokens [i*step, i*step + chunk_tokens); the last
    chunk is short rather than padded. Documents with no tokens (NULL,
    empty, whitespace) produce NO rows — a chunker feeds a trainer,
    and an empty sample is not a sample. Tokens are the whitespace
    contract shared with ``token_count_col``; rejoined with single
    spaces (chunk text is a NEW sample, not a byte-slice of the
    original).

    Returns (id, chunk_id, n_tok, chunk_text), deterministic on any
    partitioning (chunk_id derives from position alone).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = F.trim(F.col(text_col))
    # empties filtered (the _tokenize contract): F.trim strips spaces
    # only, so a "\n"-only doc would otherwise split into ["", ""]
    toks = F.when(F.col(text_col).isNull() | (F.length(t) == 0),
                  F.array().cast("array<string>")) \
            .otherwise(F.filter(F.split(t, "[ \t\n\r]+"),
                                lambda x: x != ""))
    n = F.col("_n")
    n_chunks = F.greatest(
        ((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step))
        .cast("long"), F.lit(1).cast("long"))
    base = (df.select(F.col(id_col), toks.alias("_toks"),
                      F.size(toks).alias("_n"))
            .filter(F.col("_n") > 0)
            .select(id_col, "_toks",
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         n_chunks - 1)).alias("chunk_id")))
    chunk = F.slice(F.col("_toks"),
                    (F.col("chunk_id") * step + 1).cast("int"),
                    chunk_tokens)
    return base.select(
        id_col, "chunk_id",
        F.size(chunk).alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"))
