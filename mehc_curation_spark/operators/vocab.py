"""Corpus vocabulary operators: document-frequency heavy hitters and
per-document TF-IDF keywords.

Both are pure Catalyst (explode + two-phase aggregation + top-k), no
Python in the hot path. At 100 TB the shapes hold: the explode is
narrow, aggregations are map-side combinable on (term) / (doc, term),
and the heavy-hitter top-k compiles to TakeOrderedAndProject (per-
partition heaps + driver merge of k rows — never a full sort). The
term-statistics frame in TF-IDF is joined back by term; its
cardinality is the vocabulary (Heaps' law: ~10^7-10^8 terms at web
scale), a plain shuffled equi-join — small next to the corpus itself.

Reference analog: the curator's report counts token statistics per
rule (/root/reference/mehc_curation/utils/report.py); these operators
generalize that to corpus-level vocabulary analytics used for
stopword lists, boilerplate candidates, and keyword extraction in a
training-data pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Tokenizer shared by both operators: lowercase, trim, split on
#: whitespace runs — byte-identical to DuckDB
#: ``string_split_regex(lower(trim(text)), '[ \t\n\r]+')`` so the
#: driver oracle reproduces term sets exactly.
_WS = "[ \t\n\r]+"


def tokens_col(c: Column) -> Column:
    """Lowercased whitespace tokens; empty/blank text -> empty array
    (Spark's split('') would yield [''])."""
    t = F.lower(F.trim(c))
    return F.when(F.length(t) == 0,
                  F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def top_terms(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus heavy hitters: top-k terms by document frequency.

    Returns (term, doc_freq, tf_total) — number of documents
    containing the term and total occurrences — ordered by
    (doc_freq DESC, tf_total DESC, term ASC); the full tiebreak makes
    the k-selection deterministic. ``count_distinct`` plans as a
    two-phase partial-distinct aggregate; orderBy+limit plans as
    TakeOrderedAndProject.
    """
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(tokens_col(F.col(text_col))).alias("term"))
    agg = (ex.filter(F.col("term") != "")
             .groupBy("term")
             .agg(F.count_distinct("_id").alias("doc_freq"),
                  F.count("*").alias("tf_total")))
    return agg.orderBy(F.desc("doc_freq"), F.desc("tf_total"),
                       F.asc("term")).limit(k)


def tfidf_keywords(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", top_n: int = 3) -> DataFrame:
    """Top-n keywords per document by smoothed TF-IDF.

    score = (tf / doc_len) * (ln((N+1)/(df+1)) + 1), rounded to 6
    decimals; ranking breaks ties by term so per-document top-n is
    deterministic. N (corpus size) rides along as a broadcast scalar
    (crossJoin of a 1-row aggregate) so the whole thing stays one
    lazy plan — no driver-side count() action.
    """
    tf = (df.select(F.col(id_col).alias("_id"),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("_id", "term").agg(F.count("*").alias("tf_cnt")))
    doclen = tf.groupBy("_id").agg(F.sum("tf_cnt").alias("n_tok"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(doclen, "_id")
                .join(dfreq, "term")
                .crossJoin(F.broadcast(n_docs))
                .withColumn(
                    "score",
                    F.round((F.col("tf_cnt") / F.col("n_tok")) *
                            (F.log((F.col("n_docs") + F.lit(1)) /
                                   (F.col("dfreq") + F.lit(1))) + F.lit(1)),
                            6)))
    w = F.row_number().over(
        Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("term")))
    return (scored.withColumn("rank", w)
                  .filter(F.col("rank") <= top_n)
                  .select(F.col("_id").alias(id_col), "term", "score",
                          "rank"))


# ---------------------------------------------------------------------------
# Distributed BPE merge learning (tokenizer training)
# ---------------------------------------------------------------------------

def _merge_pair_col(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b inside a
    symbol array, as one Catalyst ``aggregate`` fold (matches the
    classic BPE apply: after a merge the scan continues AFTER the
    merged token, so 'aaaa' under (a,a) becomes [aa, aa])."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        hit = (F.size(acc) > 0) & \
              (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b))
        return (F.when(hit,
                       F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                                F.array(F.lit(merged))))
                 .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 40, min_freq: int = 2,
              checkpoint_every: int = 10) -> list:
    """Learn byte-pair-encoding merges over the corpus (Sennrich et
    al. 2016, arXiv:1508.07909) — the tokenizer-training step of a
    pretraining pipeline — as a driver-orchestrated iterative
    DataFrame algorithm.

    Shape: the corpus collapses FIRST to the (word, freq) table (one
    explode + one aggregation over the raw text — the only pass that
    ever touches the corpus); every merge round then runs on that
    vocabulary-sized frame: adjacent-pair counts via a Catalyst
    ``transform`` explode and a map-combinable sum, the argmax pair
    via ``orderBy(...).limit(1)`` (TakeOrderedAndProject — one row to
    the driver per round), and the merge applied as one Catalyst fold
    (:func:`_merge_pair_col`). At web scale the vocabulary is ~1e7-1e8
    distinct words (Heaps' law), so 40 rounds shuffle vocabulary-sized
    pair tables, never the corpus. ``localCheckpoint`` every
    ``checkpoint_every`` rounds truncates the growing lineage (same
    pattern as ``operators/graph.py``).

    Deterministic: ties on pair count break by (left, right) code-
    point order — bit-reproducible against the scalar twin
    :func:`bpe_train_local`, which the driver check asserts.

    Returns ``[(left, right)]`` in merge order (< n_merges when no
    pair reaches ``min_freq``).
    """
    words = (df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
               .filter(F.col("w") != "")
               .groupBy("w").agg(F.count("*").alias("freq"))
               .withColumn("syms", F.split("w", "(?<=.)(?=.)"))
               .select("freq", "syms"))
    merges: list = []
    for i in range(n_merges):
        pairs = words.select(
            "freq",
            F.explode(F.expr(
                "transform(slice(syms, 1, size(syms) - 1),"
                " (x, i) -> struct(x AS a, syms[i + 1] AS b))")).alias("p"))
        best = (pairs.groupBy("p.a", "p.b")
                     .agg(F.sum("freq").alias("cnt"))
                     .filter(F.col("cnt") >= min_freq)
                     .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                     .limit(1).collect())
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.withColumn("syms", _merge_pair_col(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_train_local(texts: list, n_merges: int = 40,
                    min_freq: int = 2) -> list:
    """Scalar twin of :func:`bpe_train` — same tokenizer, same greedy
    merge, same (count DESC, left ASC, right ASC) tie-break — used by
    the driver check to assert the distributed merge list exactly."""
    import re
    from collections import Counter

    wfreq: Counter = Counter()
    for t in texts:
        t = (t or "").lower().strip()
        if t:
            wfreq.update(tok for tok in re.split(r"[ \t\n\r]+", t) if tok)
    vocab = {w: (list(w), f) for w, f in wfreq.items()}
    merges: list = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, f in vocab.values():
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] += f
        cand = [(c, p) for p, c in pc.items() if c >= min_freq]
        if not cand:
            break
        cnt, (a, b) = min(cand, key=lambda t: (-t[0], t[1]))
        merges.append((a, b))
        for w, (syms, f) in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = (out, f)
    return merges


def bpe_encode_udf(merges: list):
    """Vectorized tokenizer APPLY for a trained merge list: returns a
    pandas UDF mapping text -> array<string> of BPE tokens.

    Encoding replays the merges in training order (each greedy
    left-to-right — identical semantics to :func:`bpe_train`'s fold),
    restricted per word to the merges whose parts can occur in it;
    distinct words are memoized per worker, so the per-row cost on a
    web corpus is a dict hit (Zipf: the head covers most tokens).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    frozen = [tuple(m) for m in merges]
    # hoisted OUTSIDE the UDF body: the closure (and its memo) is
    # deserialized once per task, so the Zipf head segments once per
    # task instead of once per Arrow batch
    memo: dict = {}

    @pandas_udf(ArrayType(StringType()))
    def encode(text: pd.Series) -> pd.Series:
        import re

        def seg_word(w: str) -> list:
            got = memo.get(w)
            if got is None:
                syms = list(w)
                for a, b in frozen:
                    if len(syms) < 2:
                        break
                    out = []
                    for s in syms:
                        if out and out[-1] == a and s == b:
                            out[-1] = a + b
                        else:
                            out.append(s)
                    syms = out
                got = memo[w] = syms
            return got

        res = []
        for t in text:
            if t is None or not (t := t.lower().strip()):
                res.append([])
                continue
            toks: list = []
            for w in re.split(r"[ \t\n\r]+", t):
                if w:
                    toks.extend(seg_word(w))
            res.append(toks)
        return pd.Series(res)

    return encode


def bpe_encode_local(texts: list, merges: list) -> list:
    """Scalar twin of :func:`bpe_encode_udf` (same tokenizer, same
    replay) for the driver check."""
    import re

    frozen = [tuple(m) for m in merges]
    out = []
    for t in texts:
        t = (t or "").lower().strip()
        if not t:
            out.append([])
            continue
        toks: list = []
        for w in re.split(r"[ \t\n\r]+", t):
            if not w:
                continue
            syms = list(w)
            for a, b in frozen:
                if len(syms) < 2:
                    break
                nxt: list = []
                for s in syms:
                    if nxt and nxt[-1] == a and s == b:
                        nxt[-1] = a + b
                    else:
                        nxt.append(s)
                syms = nxt
            toks.extend(syms)
        out.append(toks)
    return out


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style; Kudo 2018, arXiv:1804.10959)
# ---------------------------------------------------------------------------

#: log-prob charged for a character absent from the vocabulary at
#: encode time (training guarantees corpus coverage; this is the
#: unseen-at-serve fallback)
UNK_LOGP = -100.0


def _unigram_viterbi(word: str, logp: dict, max_len: int) -> list:
    """Best segmentation of ``word`` under piece log-probs: maximize
    total log-prob; ties break to FEWER pieces, then to the LONGER
    final piece. Out-of-vocabulary single characters are allowed at
    :data:`UNK_LOGP` so segmentation is total. ONE implementation
    shared by the distributed E-step, the encode UDF and the scalar
    twins — parity by construction, pinned by the driver check."""
    n = len(word)
    neg = float("-inf")
    # per position: (score, -n_pieces, last_piece_len, backptr)
    best = [(0.0, 0, 0, -1)] + [(neg, 0, 0, -1)] * n
    for j in range(1, n + 1):
        bj = None
        for ln in range(1, min(max_len, j) + 1):
            i = j - ln
            si = best[i]
            if si[0] == neg:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if ln != 1:
                    continue
                lp = UNK_LOGP
            key = (si[0] + lp, si[1] - 1, ln)
            if bj is None or key > (bj[0], bj[1], bj[2]):
                bj = (key[0], key[1], key[2], i)
        best[j] = bj if bj is not None else (neg, 0, 0, -1)
    out: list = []
    j = n
    while j > 0:
        i = best[j][3]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _unigram_logp(counts: dict) -> tuple[dict, int]:
    """(log-probs, max piece length) from integer count units —
    computed the same way everywhere a trained vocab is served."""
    import math

    total = sum(counts.values())
    lt = math.log(total)
    return ({p: math.log(c) - lt for p, c in counts.items()},
            max((len(p) for p in counts), default=1))


def _unigram_em_rounds(words: list, counts: dict, singles: set,
                       vocab_size: int, em_rounds: int,
                       seg_counts) -> list:
    """Shared EM/prune driver (hard-EM / Viterbi counts): the
    distributed trainer and the scalar twin differ ONLY in how
    ``seg_counts(words, logp, max_len) -> {piece: units}`` is
    computed. Hard EM keeps every per-round count an INTEGER, so the
    distributed aggregation is an exact long sum — bit-deterministic
    across partitionings, which soft EM's order-dependent float sums
    cannot be.

    Single characters always survive (with a floor count of 1 when a
    round stops using them) — segmentation must stay total."""
    for _ in range(em_rounds):
        logp, max_len = _unigram_logp(counts)
        new = seg_counts(words, logp, max_len)
        counts = {p: u for p, u in new.items() if u > 0}
        for ch in singles:
            if ch not in counts:
                counts[ch] = 1
        keep_multi = sorted(
            ((p, u) for p, u in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]))[:max(0, vocab_size - len(singles))]
        counts = {**{ch: counts[ch] for ch in singles},
                  **dict(keep_multi)}
    return sorted(counts.items(), key=lambda t: (-t[1], t[0]))


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 120, seed_max_len: int = 4,
                  seed_size: int = 1200, em_rounds: int = 2,
                  min_freq: int = 2) -> list:
    """Train a unigram-LM tokenizer vocabulary (SentencePiece-style,
    Kudo 2018) over the corpus, distributed:

    1. ONE pass collapses the corpus to the (word, freq) table — the
       only stage that ever touches the corpus (same shape as
       :func:`bpe_train`);
    2. seed pieces = the ``seed_size`` most frequent substrings up to
       ``seed_max_len`` chars (freq-weighted, overlaps counted), via
       a Catalyst substring explode + map-combinable sum, PLUS every
       single character (coverage guarantee);
    3. ``em_rounds`` of hard EM: each round Viterbi-segments every
       DISTINCT word under the current piece probabilities (a pandas
       UDF over the vocabulary-sized word table — the Zipf head, not
       the corpus) and re-counts pieces as freq-weighted INTEGER
       units summed with an exact long aggregation, then prunes to
       ``vocab_size`` keeping all single chars.

    Hard EM (Viterbi counts) is chosen deliberately: soft EM's float
    expected counts depend on reduction order across partitions, so
    two runs of the same job could train different vocabularies.
    Integer units make the trainer bit-deterministic — asserted
    against the scalar twin :func:`unigram_train_local` by the driver
    check.

    Returns ``[(piece, units)]`` sorted (units DESC, piece ASC).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    words_df = (df.select(F.explode(tokens_col(F.col(text_col)))
                          .alias("w"))
                .filter(F.col("w") != "")
                .groupBy("w").agg(F.count("*").alias("freq")))
    words_df = words_df.persist()
    try:
        subs = words_df.select(
            "freq",
            F.explode(F.expr(
                f"flatten(transform(sequence(1, length(w)), "
                f"s -> transform(sequence(1, least({int(seed_max_len)}, "
                f"length(w) - s + 1)), l -> substring(w, s, l))))"
            )).alias("p"))
        seed = subs.groupBy("p").agg(F.sum("freq").alias("units"))
        singles_rows = (seed.filter(F.length("p") == 1)
                        .select("p", "units").collect())
        top_rows = (seed.filter((F.length("p") > 1)
                                & (F.col("units") >= min_freq))
                    .orderBy(F.desc("units"), F.asc("p"))
                    .limit(int(seed_size)).collect())
        singles = {r["p"] for r in singles_rows}
        counts = {r["p"]: int(r["units"])
                  for r in [*singles_rows, *top_rows]}
        words = [(r["w"], int(r["freq"])) for r in words_df.collect()]

        def seg_counts_dist(_words_unused, logp, max_len):
            schema = ArrayType(StructType([
                StructField("p", StringType()),
                StructField("u", LongType()),
            ]))

            @pandas_udf(schema)
            def seg(w: pd.Series, freq: pd.Series) -> pd.Series:
                out = []
                for word, f in zip(w, freq):
                    pieces = _unigram_viterbi(word, logp, max_len)
                    out.append([(p, int(f)) for p in pieces])
                return pd.Series(out)

            agg = (words_df
                   .select(F.explode(seg(F.col("w"), F.col("freq")))
                           .alias("e"))
                   .groupBy("e.p").agg(F.sum("e.u").alias("u"))
                   .collect())
            return {r["p"]: int(r["u"]) for r in agg}

        return _unigram_em_rounds(words, counts, singles, vocab_size,
                                  em_rounds, seg_counts_dist)
    finally:
        words_df.unpersist()


def unigram_train_local(texts: list, vocab_size: int = 120,
                        seed_max_len: int = 4, seed_size: int = 1200,
                        em_rounds: int = 2, min_freq: int = 2) -> list:
    """Scalar twin of :func:`unigram_train` — same tokenizer, same
    seed counting, same hard-EM rounds and (units DESC, piece ASC)
    ordering — used by the driver check to assert the distributed
    vocabulary EXACTLY."""
    import re
    from collections import Counter

    wfreq: Counter = Counter()
    for t in texts:
        t = (t or "").lower().strip()
        if t:
            wfreq.update(tok for tok in re.split(r"[ \t\n\r]+", t) if tok)
    sub: Counter = Counter()
    for w, f in wfreq.items():
        for s in range(len(w)):
            for ln in range(1, min(seed_max_len, len(w) - s) + 1):
                sub[w[s:s + ln]] += f
    singles = {p for p in sub if len(p) == 1}
    counts = {p: u for p, u in sub.items() if len(p) == 1}
    top = sorted(((p, u) for p, u in sub.items()
                  if len(p) > 1 and u >= min_freq),
                 key=lambda t: (-t[1], t[0]))[:seed_size]
    counts.update(dict(top))
    words = list(wfreq.items())

    def seg_counts_local(ws, logp, max_len):
        c: Counter = Counter()
        for w, f in ws:
            for p in _unigram_viterbi(w, logp, max_len):
                c[p] += f
        return c

    return _unigram_em_rounds(words, counts, singles, vocab_size,
                              em_rounds, seg_counts_local)


def unigram_encode_udf(vocab: list):
    """Vectorized tokenizer APPLY for a trained unigram vocabulary
    ``[(piece, units)]``: pandas UDF mapping text -> array<string> of
    pieces (Viterbi under the trained probabilities — the SAME
    :func:`_unigram_viterbi` the trainer used). Distinct words memoize
    per worker (Zipf head = dict hits)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    logp, max_len = _unigram_logp(dict(vocab))
    memo: dict = {}

    @pandas_udf(ArrayType(StringType()))
    def encode(text: pd.Series) -> pd.Series:
        import re

        res = []
        for t in text:
            if t is None or not (t := t.lower().strip()):
                res.append([])
                continue
            toks: list = []
            for w in re.split(r"[ \t\n\r]+", t):
                if w:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _unigram_viterbi(w, logp, max_len)
                    toks.extend(got)
            res.append(toks)
        return pd.Series(res)

    return encode


def unigram_encode_local(texts: list, vocab: list) -> list:
    """Scalar twin of :func:`unigram_encode_udf` for the driver
    check."""
    import re

    logp, max_len = _unigram_logp(dict(vocab))
    out = []
    for t in texts:
        t = (t or "").lower().strip()
        if not t:
            out.append([])
            continue
        toks: list = []
        for w in re.split(r"[ \t\n\r]+", t):
            if w:
                toks.extend(_unigram_viterbi(w, logp, max_len))
        out.append(toks)
    return out
