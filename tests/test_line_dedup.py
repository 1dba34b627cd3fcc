"""Corpus-wide line dedup: keep-first rewrite, short-line immunity,
round-trip when clean, NULL text."""

from pyspark.sql import functions as F

from mehc_curation_spark.operators.similarity import line_dedup


def test_duplicate_line_removed_after_first_sighting(spark):
    banner = "subscribe to our newsletter for updates"
    rows = [
        (1, f"alpha article body text here\n{banner}\nmore alpha prose"),
        (2, f"{banner}\nbeta article body text here"),
        (3, f"gamma article body text here\n{banner}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(df, "doc_id", "text").collect()}
    # first occurrence (doc 1, pos 1) survives; later copies vanish
    assert banner in out[1]["text_clean"]
    assert banner not in out[2]["text_clean"]
    assert banner not in out[3]["text_clean"]
    assert out[2]["text_clean"] == "beta article body text here"
    assert out[3]["text_clean"] == "gamma article body text here"
    assert (out[1]["n_dropped"], out[2]["n_dropped"],
            out[3]["n_dropped"]) == (0, 1, 1)


def test_short_lines_never_dedup(spark):
    rows = [(1, "Home\nlong unique first document content"),
            (2, "Home\nlong unique second document content")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_clean"] for r in
           line_dedup(df, "doc_id", "text").collect()}
    assert out[1].startswith("Home\n") and out[2].startswith("Home\n")


def test_clean_corpus_round_trips(spark):
    rows = [(1, "one unique line of text\n\nanother unique line\n"),
            (2, "a totally different document body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] == rows[0][1]
    assert out[2]["text_clean"] == rows[1][1]
    assert out[1]["n_lines"] == 4  # trailing '\n' -> empty 4th line


def test_within_doc_repeat_also_dedups(spark):
    rows = [(1, "repeated chorus line of this song\n"
                "verse one goes right here now\n"
                "repeated chorus line of this song")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = line_dedup(df, "doc_id", "text").first()
    assert r["text_clean"].count("repeated chorus") == 1
    assert r["n_dropped"] == 1


def test_null_text_passes_through(spark):
    rows = [(1, None), (2, "a real document body line here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] is None
    assert out[1]["n_lines"] == 0 and out[1]["n_dropped"] == 0
    assert out[2]["text_clean"] == "a real document body line here"


def test_partition_invariance(spark):
    rows = [(i, f"shared boilerplate banner line\nunique body {i}")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in
               line_dedup(df.repartition(1), "doc_id", "text").collect())
    b = sorted(tuple(r) for r in
               line_dedup(df.repartition(7), "doc_id", "text").collect())
    assert a == b
    # exactly one survivor of the banner, in the smallest (id, pos)
    keep = [r for r in a if "banner" in (r[1] or "")]
    assert len(keep) == 1 and keep[0][0] == 0
