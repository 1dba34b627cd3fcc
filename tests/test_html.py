"""HTML → visible-text extraction (WET-extraction analog)."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.html import extract_text_col


def _ex(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "html string")
    return [r["t"] for r in
            df.select(extract_text_col(F.col("html")).alias("t"))
            .collect()]


def test_extraction_pins(spark):
    got = _ex(spark, [
        # full page: head/nav/script/footer dropped, blocks newline
        '<html><head><title>T</title></head><body>'
        '<nav><a href="/">Home</a></nav>'
        '<h1>Hello &amp; welcome</h1>'
        '<p>line one</p><p>line   two</p>'
        '<script>var x = "<p>not text</p>";</script>'
        '<footer>chrome</footer></body></html>',
        # <br> variants, comments, entities
        'a<br>b<br/>c<br />d<!-- gone --><p>&lt;tag&gt; &quot;q&quot;'
        ' &#39;s&#39;&nbsp;end</p>',
        # <head> must not swallow <header>; case-insensitive tags
        '<header>kept header text</header><P>UPPER</P>',
        # tags spanning lines; style with attributes
        '<style type="text/css">\np { color: red }\n</style>real',
        None,
        "",
        "plain text, no markup at all",
    ])
    assert got[0] == "Hello & welcome\nline one\nline two"
    # opening <p> strips silently (only CLOSERS newline), so 'd'
    # joins the paragraph text on one line
    assert got[1] == 'a\nb\nc\nd<tag> "q" \'s\' end'
    assert got[2] == "kept header text\nUPPER"
    assert got[3] == "real"
    assert got[4] is None
    assert got[5] == ""
    assert got[6] == "plain text, no markup at all"


def test_amp_decoded_last(spark):
    # &amp;lt; must become the TEXT "&lt;", never "<"
    got = _ex(spark, ["<p>&amp;lt;literal&amp;gt;</p>"])
    assert got[0] == "&lt;literal&gt;"


def test_nested_blocks_and_lists(spark):
    got = _ex(spark, [
        "<ul><li>one</li><li>two</li></ul><div>tail</div>",
        "<aside>sidebar</aside><blockquote>quoted</blockquote>after",
    ])
    assert got[0] == "one\ntwo\ntail"
    assert got[1] == "quoted\nafter"


def test_extraction_total_on_adversarial_batch(spark):
    """Never raises and never returns NULL for non-NULL input, over a
    seeded batch of broken markup (unclosed tags, nested comments,
    entity fragments, angle-bracket soup) — ONE Spark job."""
    import random

    rng = random.Random(99)
    bits = ["<p>", "</p>", "<div", ">", "<!--", "-->", "&amp;", "&",
            "<script>", "</script>", "<br", "/>", "text", " ", "\n",
            "<head>", "</head>", "<h1>", "</h1>", "&#39;", "<<>>", "\t"]
    docs = ["".join(rng.choice(bits)
                    for _ in range(rng.randint(0, 40)))
            for _ in range(1200)]
    df = spark.createDataFrame([(d,) for d in docs], "html string")
    out = df.select(extract_text_col(F.col("html")).alias("t")).collect()
    assert all(r["t"] is not None for r in out)
    assert all("\x00" not in r["t"] for r in out)
