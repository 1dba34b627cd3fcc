"""URL canonicalization + canonical-URL dedup (crawl-noise collapse
before any text-level dedup)."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.urls import (
    canonicalize_url_col,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonicalize_url_col(F.col("url")).alias("c"))
            .collect()]


def test_canonical_cases(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/A/b?utm_source=x&b=2&a=1#frag",
        "https://example.com/A/b?a=1&b=2",
        "http://example.com:80/c/",
        "http://example.com/c",
        "https://example.com",
        "https://example.com/",
        "https://example.com/d?gclid=z",
        "https://example.com/d?id=3&utm_campaign=y&ref=tw",
        "https://example.com/x//",      # multi trailing slash
        "https://example.com/p?B=2&a=1",  # params sort bytewise, case kept
    ])
    assert got[0] == got[1] == "https://example.com/A/b?a=1&b=2"
    assert got[2] == got[3] == "http://example.com/c"
    assert got[4] == got[5] == "https://example.com/"
    assert got[6] == "https://example.com/d"
    assert got[7] == "https://example.com/d?id=3"
    assert got[8] == "https://example.com/x"
    assert got[9] == "https://example.com/p?B=2&a=1"  # 'B' < 'a' bytewise


def test_canonical_null_and_nonurl(spark):
    got = _canon(spark, [None, "not a url at all"])
    assert got[0] is None
    assert got[1] is not None  # passes through without crashing


def test_url_dedup_keep_first_and_null_kept(spark):
    df = spark.createDataFrame(
        [(1, "https://www.a.com/x"),
         (2, "https://a.com/x/"),      # same canonical as 1
         (3, "https://a.com/y"),
         (4, None)],
        "id long, url string")
    out = url_dedup(df, "url", "id").orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 3, 4]
    assert out[0]["canonical_url"] == "https://a.com/x"
    assert out[2]["canonical_url"] is None


def test_url_dedup_partition_invariant(spark):
    rows = [(i, f"https://s{i % 5}.com/p?utm_source=u&k={i % 3}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, url string")
    a = {r["id"] for r in url_dedup(df.repartition(1), "url", "id")
         .collect()}
    b = {r["id"] for r in url_dedup(df.repartition(13), "url", "id")
         .collect()}
    assert a == b and len(a) == 15  # 5 hosts x 3 k-values


def test_canonicalization_idempotent_on_adversarial_batch(spark):
    """canon(canon(u)) == canon(u) over a seeded grammar of URL-ish
    and junk strings — ONE Spark job for the whole batch (the op has
    no scalar twin; idempotence is its contract invariant)."""
    import random

    rng = random.Random(1234)
    schemes = ["http", "https", "HTTP", "ftp", ""]
    hosts = ["www.Ex.COM", "ex.com:443", "ex.com:80", "a.b.c", "", "127.0.0.1:8080"]
    paths = ["", "/", "/x", "/x/", "//", "/a b", "/x/y/z///"]
    queries = ["", "?", "?a=1", "?utm_source=x", "?b=2&a=1&a=0",
               "?ref&ref=2", "?=v", "?a==b&"]
    frags = ["", "#", "#f", "#a#b"]
    urls = []
    for _ in range(1500):
        if rng.random() < 0.15:
            urls.append("".join(rng.choice("<>?&#:/=%a1 ")
                                for _ in range(rng.randint(0, 30))))
        else:
            s = rng.choice(schemes)
            urls.append((s + "://" if s else "") + rng.choice(hosts)
                        + rng.choice(paths) + rng.choice(queries)
                        + rng.choice(frags))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    c1 = canonicalize_url_col(F.col("url"))
    once = df.select(c1.alias("c")).collect()
    again = (df.select(c1.alias("c"))
             .select(canonicalize_url_col(F.col("c")).alias("c2"),
                     F.col("c")).collect())
    assert all(r["c2"] == r["c"] for r in again)
    assert all(r["c"] is not None for r in once)  # total on junk
