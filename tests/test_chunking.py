"""Document chunking: window coverage, overlap, tail handling, empties."""

import pytest

from mehc_curation_spark.operators.chunking import chunk_documents


def test_chunks_cover_with_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    out = sorted(chunk_documents(df, "doc_id", "text",
                                 chunk_tokens=4, overlap=1).collect(),
                 key=lambda r: r["chunk_id"])
    # step 3: ceil((10-1)/3) = 3 chunks cover all 10 tokens; a 4th
    # chunk starting at 9 would add no NEW tokens and is not emitted
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"
    assert out[2]["chunk_text"] == "w6 w7 w8 w9"
    assert [r["n_tok"] for r in out] == [4, 4, 4]


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "just three tokens")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text",
                          chunk_tokens=512, overlap=64).collect()
    assert len(out) == 1
    assert out[0]["chunk_id"] == 0 and out[0]["n_tok"] == 3
    assert out[0]["chunk_text"] == "just three tokens"


def test_empty_and_null_docs_produce_no_chunks(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "   \n "),
                                (4, "one real doc")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {4}


def test_no_overlap_partitions_exactly(spark):
    words = [f"t{i}" for i in range(9)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    out = sorted(chunk_documents(df, "doc_id", "text",
                                 chunk_tokens=3, overlap=0).collect(),
                 key=lambda r: r["chunk_id"])
    assert len(out) == 3
    rejoined = " ".join(r["chunk_text"] for r in out)
    assert rejoined == " ".join(words)


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"x{i}_{j}" for j in range(i % 23)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in
               chunk_documents(df.repartition(1), "doc_id", "text",
                               chunk_tokens=5, overlap=2).collect())
    b = sorted(tuple(r) for r in
               chunk_documents(df.repartition(7), "doc_id", "text",
                               chunk_tokens=5, overlap=2).collect())
    assert a == b


def test_pack_chunks_capacity_and_coverage(spark):
    from pyspark.sql import functions as F

    from mehc_curation_spark.operators.chunking import pack_chunks

    rows = [(f"c{i}", (i * 13) % 90 + 10) for i in range(300)]
    df = spark.createDataFrame(rows, "uid string, n_tok long")
    out = pack_chunks(df, "uid", "n_tok", seq_tokens=128, shard_bits=2)
    assert out.count() == 300  # every chunk assigned exactly once
    per_seq = (out.groupBy("shard", "seq_id")
               .agg(F.sum("n_tok").alias("t"),
                    F.max("oversize").alias("ov")).collect())
    assert all(r["t"] <= 128 for r in per_seq if not r["ov"])
    # fill rate: greedy next-fit over 10..99-token chunks into 128
    total = sum(r["t"] for r in per_seq)
    assert total / (128 * len(per_seq)) >= 0.6
    # seq_pos is the running offset inside each sequence
    chk = (out.groupBy("shard", "seq_id")
           .agg(F.max(F.col("seq_pos") + F.col("n_tok")).alias("end"),
                F.sum("n_tok").alias("t")).collect())
    assert all(r["end"] == r["t"] for r in chk)


def test_pack_chunks_oversize_isolated(spark):
    from mehc_curation_spark.operators.chunking import pack_chunks

    rows = [("a", 50), ("b", 500), ("c", 60)]
    df = spark.createDataFrame(rows, "uid string, n_tok long")
    out = {r["uid"]: r for r in
           pack_chunks(df, "uid", "n_tok", seq_tokens=128,
                       shard_bits=0).collect()}
    assert out["b"]["oversize"]
    # the oversize chunk sits alone in its sequence
    b_seq = (out["b"]["shard"], out["b"]["seq_id"])
    others = {(r["shard"], r["seq_id"]) for k, r in out.items() if k != "b"}
    assert b_seq not in others


def test_pack_chunks_partition_invariance(spark):
    from mehc_curation_spark.operators.chunking import pack_chunks

    rows = [(f"u{i}", i % 40 + 5) for i in range(200)]
    df = spark.createDataFrame(rows, "uid string, n_tok long")
    a = sorted(tuple(r) for r in
               pack_chunks(df.repartition(1), "uid", "n_tok",
                           seq_tokens=64).collect())
    b = sorted(tuple(r) for r in
               pack_chunks(df.repartition(9), "uid", "n_tok",
                           seq_tokens=64).collect())
    assert a == b
