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
        F.expr(f"(_n - {int(overlap)} + {int(step) - 1}) div {int(step)}"),
        F.lit(1).cast("long"))
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


def pack_chunks(df: DataFrame, id_col: str, n_tok_col: str,
                seq_tokens: int = 2048, shard_bits: int = 8) -> DataFrame:
    """Sample packing: assemble chunks into fixed-capacity training
    sequences (T5's "packing", Raffel et al. 2020 §3.1.2; standard in
    every LLM pretraining stack — unpacked batches waste the context
    window on padding).

    Exact global first-fit packing is inherently sequential, so the
    distributed form packs WITHIN hash shards: rows are ranged into
    2^shard_bits shards by the top bits of u48(id) (uniform, so shards
    are even), and each shard runs one greedy next-fit pass in
    (u48, id) priority order — if the next chunk would overflow
    ``seq_tokens``, a new sequence starts. A chunk larger than the
    whole capacity becomes its own sequence flagged ``oversize``
    (the trainer's truncate-or-reject decision, not the packer's).

    Shard-local packing costs at most one partially-filled sequence
    per shard versus the sequential ideal — at 2^8 shards over
    billions of chunks the fill-rate loss is noise, and every shard
    packs in parallel. Deterministic and partition-invariant: shard
    membership and order derive from the row, and each shard's pass is
    sequential within one task.

    Returns the input plus (shard, seq_id, seq_pos, oversize):
    sequence ``(shard, seq_id)`` is globally unique; ``seq_pos`` is
    the chunk's token offset inside its sequence.

    ``id_col`` must be row-UNIQUE (for chunker output, concat the doc
    id with the chunk id first) — it is the total order that makes the
    packing deterministic.
    """
    from mehc_curation_spark.operators.sampling import u48_col

    if seq_tokens <= 0:
        raise ValueError("seq_tokens must be positive")
    cap = int(seq_tokens)
    keyed = df.select("*", u48_col(F.col(id_col)).alias("_u48")) \
              .withColumn("_shard", F.shiftright("_u48", 48 - shard_bits))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema
    ) + ", seq_id long, seq_pos long, oversize boolean"

    def _pack(key, pdf):
        p = pdf.sort_values(["_u48", id_col], kind="stable") \
               .reset_index(drop=True)
        if p[n_tok_col].isna().any():
            raise ValueError(
                f"pack_chunks: NULL {n_tok_col!r} values in shard "
                f"{int(key[0])} — filter or fill token counts before "
                "packing")
        seq_ids, seq_pos, oversize = [], [], []
        seq, fill = 0, 0
        for n in p[n_tok_col]:
            n = int(n)
            if n > cap:
                if fill > 0:
                    seq += 1
                seq_ids.append(seq)
                seq_pos.append(0)
                oversize.append(True)
                seq += 1
                fill = 0
                continue
            if fill + n > cap:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            seq_pos.append(fill)
            oversize.append(False)
            fill += n
        p["seq_id"] = seq_ids
        p["seq_pos"] = seq_pos
        p["oversize"] = oversize
        return p

    return (keyed.groupBy("_shard").applyInPandas(_pack, out_schema)
            .withColumnRenamed("_shard", "shard")
            .drop("_u48"))
