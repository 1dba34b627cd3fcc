"""Prefix-blocked Levenshtein near-dup pairs."""

from mehc_curation_spark.operators.similarity import edit_distance_dups


def _pairs(df, **kw):
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_dups(df, **kw).collect()}


def test_planted_typos(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"),
         (2, "the quick brown fox jumps over the dogs"),     # +1 char
         (3, "the quick brown fix jumps over the dog"),      # 1 sub
         (4, "a completely different sentence here"),
         (5, "the quick brown fox jumps over the dog")],     # exact dup of 1
        "doc_id long, text string")
    got = _pairs(df, max_dist=2)
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 5)] == 0
    assert got[(2, 3)] == 2 and got[(2, 5)] == 1 and got[(3, 5)] == 1
    assert not any(4 in p for p in got)


def test_threshold_excludes_far_pairs(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh 1234567890"), (2, "abcdefgh 0987654321")],
        "doc_id long, text string")
    assert _pairs(df, max_dist=3) == {}
    assert (1, 2) in _pairs(df, max_dist=10)


def test_blocking_contract(spark):
    # different prefixes never pair even at distance 1
    df = spark.createDataFrame(
        [(1, "Xbcdefgh same tail"), (2, "Ybcdefgh same tail"),
         (3, None), (4, "short")],
        "doc_id long, text string")
    assert _pairs(df, max_dist=5) == {}


def test_prefix_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello World again"), (2, "hello world again")],
        "doc_id long, text string")
    got = _pairs(df, max_dist=5)
    assert got == {(1, 2): 2}  # H->h, W->w


def test_max_block_skips_hot_keys(spark):
    rows = [(i, f"prefix!! tail {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _pairs(df, max_dist=50, max_block=5) == {}
    assert len(_pairs(df, max_dist=50, max_block=100)) == 45


def test_unicode_distance_counts_codepoints(spark):
    """The operator's distance is CODEPOINT-based (Spark semantics):
    café vs cafe is ONE edit even though the byte diff is two. The
    driver oracle restricts itself to the byte==codepoint domain
    because DuckDB's levenshtein counts bytes (documented in
    doc_edit_dups)."""
    df = spark.createDataFrame(
        [(1, "café del mar sunset"), (2, "cafe del mar sunset")],
        "doc_id long, text string")
    got = _pairs(df, max_dist=1, prefix_len=3)
    assert got == {(1, 2): 1}


def test_partition_invariant(spark):
    rows = [(i, "common prefix with tail number %d" % (i % 7))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = _pairs(df.repartition(1), max_dist=3)
    b = _pairs(df.repartition(13), max_dist=3)
    assert a == b and len(a) > 0
