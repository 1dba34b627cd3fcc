"""Unigram-LM tokenizer (SentencePiece-style, hard EM): distributed
train == scalar twin bit-exactly, Viterbi encode parity, coverage."""

import math

from pyspark.sql import functions as F

from mehc_curation_spark.operators.vocab import (
    UNK_LOGP,
    _unigram_logp,
    _unigram_viterbi,
    unigram_encode_local,
    unigram_encode_udf,
    unigram_train,
    unigram_train_local,
)

TEXTS = ([f"the quick brown fox {i % 7} jumps over the lazy dog" +
          (" dogs" * (i % 3)) for i in range(120)]
         + ["tokenization internationalization tokenizer token"] * 25
         + ["ünïcode tëst ünïcode", None, "", "   ", "\tx\n"])


def _df(spark, par=1):
    return spark.createDataFrame([(t,) for t in TEXTS],
                                 "text string").repartition(par)


def test_train_matches_scalar_twin_any_partitioning(spark):
    exp = unigram_train_local(TEXTS, vocab_size=60, em_rounds=2)
    for par in (1, 13):
        got = unigram_train(_df(spark, par), vocab_size=60, em_rounds=2)
        assert got == exp, f"partitioning {par} diverged"
    # ordering contract: (units DESC, piece ASC)
    assert exp == sorted(exp, key=lambda t: (-t[1], t[0]))


def test_single_chars_always_survive_prune(spark):
    v = dict(unigram_train_local(TEXTS, vocab_size=40, em_rounds=2))
    corpus_chars = {c for t in TEXTS if t
                    for w in t.lower().split() for c in w}
    assert corpus_chars <= {p for p in v if len(p) == 1}


def test_encode_parity_and_lossless(spark):
    v = unigram_train_local(TEXTS, vocab_size=60, em_rounds=2)
    enc = unigram_encode_udf(v)
    got = [r["t"] for r in _df(spark, 7)
           .select(enc(F.col("text")).alias("t")).collect()]
    # repartition scrambles order; compare as multisets of tuples
    exp = unigram_encode_local(TEXTS, v)
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    for t, toks in zip(TEXTS, exp):
        norm = "".join((t or "").lower().split())
        assert "".join(toks) == norm


def test_encode_handles_unseen_chars(spark):
    v = unigram_train_local(["abc abc ab"], vocab_size=10, em_rounds=1)
    out = unigram_encode_local(["abc XYZ@! abc"], v)[0]
    assert "".join(out) == "abcxyz@!abc"  # total, falls back to chars


def test_viterbi_prefers_probable_then_fewer_pieces():
    logp, _ = _unigram_logp({"ab": 100, "a": 1, "b": 1, "c": 1,
                             "abc": 90})
    # 'abc' as one piece: log(90/193); as ab+c: log(100)+log(1)-2log(193)
    assert _unigram_viterbi("abc", logp, 3) == ["abc"]
    # unseen char mid-word takes the UNK path exactly once
    out = _unigram_viterbi("aZb", logp, 3)
    assert out == ["a", "Z", "b"]
    score = sum(logp.get(p, UNK_LOGP) for p in out)
    assert math.isfinite(score)


def test_empty_and_null_rows(spark):
    v = unigram_train_local(TEXTS, vocab_size=30, em_rounds=1)
    assert unigram_encode_local([None, "", "  \t"], v) == [[], [], []]
