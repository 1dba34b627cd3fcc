"""Round-3 streaming hardening: conflict-state processing-time timeout
and the stream high-watermark that survives snapshot expiry."""

import os
import time

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.schema import PAIRS_SCHEMA
from mehc_curation_spark.streaming.curate_stream import (
    _advance_stream_hwm,
    _batch_committed,
    _read_stream_hwm,
    _stream_scope,
    flag_conflicts_stream,
    run_stream_to_snapshot_table,
)


def _conflict_rows(spark, tmp_path, timeout_ms, tag):
    """ONE long-lived free-running query over a growing parquet dir,
    stepped by POLLING the sink. With ProcessingTimeTimeout the
    stateful operator answers shouldRunAnotherBatch=true on every tick
    (processing time always advances), so BOTH trigger(availableNow)
    and processAllAvailable() block forever while timers are live —
    polling the output is the only synchronization that works."""
    in_dir = str(tmp_path / f"in_{tag}")
    out_dir = str(tmp_path / f"out_{tag}")
    ck_dir = str(tmp_path / f"ck_{tag}")
    os.makedirs(in_dir)

    def write(rows):
        spark.createDataFrame(rows, PAIRS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    def read_out():
        try:
            return {r["image_id"]: r["conflict_suspect"]
                    for r in spark.read.parquet(out_dir).collect()}
        except Exception:  # sink metadata not created yet
            return {}

    def wait_for(image_id, deadline_sec=120):
        end = time.time() + deadline_sec
        while time.time() < end:
            got = read_out()
            if image_id in got:
                return got
            time.sleep(0.5)
        raise AssertionError(f"{image_id} never reached the sink; "
                             f"have {sorted(read_out())}")

    # batch 1 must exist before the stream starts (an empty dir makes
    # the first trigger a no-op)
    write([("a1", None, None, None, "raw", "one", 7)])
    stream = (spark.readStream.schema(PAIRS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out = flag_conflicts_stream(stream, state_timeout_ms=timeout_ms)
    q = (out.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ck_dir)
         .outputMode("append").start())
    try:
        wait_for("a1")  # batch 1: phash 7 sees caption "one"
        time.sleep(3.0)  # past the 500ms processing-time deadline;
        # timer-driven empty batches fire the timeout for idle key 7
        write([("b1", None, None, None, "raw", "other", 8)])
        wait_for("b1")
        # phash 7 returns with a DIFFERENT caption
        write([("a2", None, None, None, "raw", "two", 7)])
        got = wait_for("a2")
    finally:
        q.stop()
    return got


def test_conflict_state_expires_after_timeout(spark, tmp_path):
    got = _conflict_rows(spark, tmp_path, timeout_ms=500, tag="t")
    # state for phash 7 expired between batches -> caption "two" starts
    # a FRESH state and is not flagged
    assert got["a2"] is False


def test_conflict_state_persists_without_timeout(spark, tmp_path):
    got = _conflict_rows(spark, tmp_path, timeout_ms=None, tag="n")
    # control: with NoTimeout the same sequence IS a conflict
    assert got["a2"] is True


# ---------------------------------------------------------------------------
# stream high-watermark survives snapshot expiry (ADVICE r2)
# ---------------------------------------------------------------------------

def test_hwm_survives_snapshot_expiry(spark, pairs_df, tmp_path):
    in_dir = str(tmp_path / "sin")
    tbl_dir = str(tmp_path / "stbl")
    ck_dir = str(tmp_path / "sck")
    os.makedirs(in_dir)

    pairs_df.limit(50).coalesce(1).write.mode("append").parquet(in_dir)
    run_stream_to_snapshot_table(spark, in_dir, tbl_dir, ck_dir) \
        .awaitTermination(300)
    pairs_df.limit(80).coalesce(1).write.mode("append").parquet(in_dir)
    run_stream_to_snapshot_table(spark, in_dir, tbl_dir, ck_dir) \
        .awaitTermination(300)

    table = SnapshotTable(tbl_dir)
    scope = _stream_scope(ck_dir)
    assert _read_stream_hwm(table, scope) >= 1
    # expire everything but the newest snapshot: the manifest that
    # recorded batch 0 is gone...
    table.expire_snapshots(keep_last=1)
    # ...but a replay of batch 0 is STILL detected as committed (the
    # manifest walk alone would say False here and duplicate the rows)
    assert _batch_committed(table, scope, 0) is True
    assert _batch_committed(table, scope, 1) is True
    assert _batch_committed(table, scope, 2) is False


def test_hwm_monotone_and_scoped(tmp_path):
    table = SnapshotTable(str(tmp_path / "t"))
    s1, s2 = _stream_scope("/ck/one"), _stream_scope("/ck/two")
    _advance_stream_hwm(table, s1, 5)
    _advance_stream_hwm(table, s1, 3)  # lower id never regresses it
    assert _read_stream_hwm(table, s1) == 5
    assert _read_stream_hwm(table, s2) == -1  # other stream unaffected
    assert _batch_committed(table, s1, 4) is True
    assert _batch_committed(table, s2, 4) is False


def test_batch_committed_is_scope_isolated(spark, tmp_path):
    """Two streams feeding ONE table must not cross-match batch ids:
    stream B's fresh batch 0 is NOT 'already committed' because stream
    A once committed a batch 0, and A's replay detection ignores B's
    interleaved commits (monotonicity only holds per scope)."""
    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.streaming.curate_stream import (
        _advance_stream_hwm,
        _batch_committed,
        _stream_scope,
    )

    table = SnapshotTable(str(tmp_path / "t"))
    scope_a = _stream_scope("/ck/a")
    scope_b = _stream_scope("/ck/b")
    one = spark.range(1).toDF("n")

    # stream A commits batches 0..2 (hwm advanced only to 1 —
    # simulating a crash after committing bid 2's snapshot)
    for bid in (0, 1, 2):
        table.write(one, mode="append",
                    properties={"stream_batch_id": bid,
                                "stream_scope": scope_a})
    _advance_stream_hwm(table, scope_a, 1)

    # B is brand new: nothing of A's may answer for it
    assert not _batch_committed(table, scope_b, 0)
    assert not _batch_committed(table, scope_b, 2)
    # B commits its own batch 0; A's ids stay invisible to B and
    # B's to A
    table.write(one, mode="append",
                properties={"stream_batch_id": 0,
                            "stream_scope": scope_b})
    assert _batch_committed(table, scope_b, 0)
    assert not _batch_committed(table, scope_b, 1)
    # A's replay of bid 2 (above its hwm) still found via the walk,
    # even though B's bid-0 commit sits above it in snapshot order
    assert _batch_committed(table, scope_a, 2)
    assert not _batch_committed(table, scope_a, 3)


def test_stream_decontaminate_against_text_index(spark, tmp_path):
    """Streaming decontamination: a standing text-signature index is
    built from a reference corpus; two micro-batch arrivals stream
    through run_stream_decontaminate; contaminated rows (near-copies
    of reference docs) never reach the snapshot table, clean ones all
    do, per-batch flag counts ride in the manifest properties, and a
    replayed batch id commits nothing twice."""
    from mehc_curation_spark.operators.similarity import write_text_index
    from mehc_curation_spark.streaming.curate_stream import (
        DOCS_STREAM_SCHEMA,
        run_stream_decontaminate,
    )

    ref_rows = [(100 + i, f"the quick brown fox jumps over dog {i} "
                 f"unique tail {i}", "en", "ref", 40) for i in range(5)]
    ref = spark.createDataFrame(ref_rows, DOCS_STREAM_SCHEMA) \
        .withColumnRenamed("doc_id", "ref_id")
    idx_path = str(tmp_path / "txt_idx")
    write_text_index(ref.selectExpr("ref_id", "text"), idx_path,
                     ref_id_col="ref_id", num_hashes=32, bands=16,
                     shingle_k=3)

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    tbl = str(tmp_path / "clean_tbl")
    ck = str(tmp_path / "ck")

    def arrive(rows):
        spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    # batch 1: one near-copy of ref doc 0 + two clean docs
    arrive([(1, "the quick brown fox jumps over dog 0 unique tail 0",
             "en", "crawl", 40),
            (2, "completely different content about spark engines",
             "en", "crawl", 40),
            (3, "another clean document with fresh words", "en",
             "crawl", 40)])
    run_stream_decontaminate(spark, in_dir, idx_path, tbl, ck,
                             threshold=0.5).awaitTermination(300)
    # batch 2: one more contaminated + one clean + one NULL-id row
    # (unprovable rows must NOT land in a table whose contract is
    # "clean" — they are excluded and counted)
    arrive([(4, "the quick brown fox jumps over dog 3 unique tail 3",
             "en", "crawl", 40),
            (5, "yet more novel text that matches nothing", "en",
             "crawl", 40),
            (None, "the quick brown fox jumps over dog 1 unique tail 1",
             "en", "crawl", 40)])
    run_stream_decontaminate(spark, in_dir, idx_path, tbl, ck,
                             threshold=0.5).awaitTermination(300)

    t = SnapshotTable(tbl)
    got = sorted(r["doc_id"] for r in t.read(spark).collect())
    assert got == [2, 3, 5]
    props = t.manifest().get("properties", {})
    assert props["decontam_flagged"] == 1 and props["decontam_in"] == 3
    assert props["decontam_null_id"] == 1
    v_before = t.current_version()

    # replay: same checkpoint, no new arrivals -> no new snapshot
    run_stream_decontaminate(spark, in_dir, idx_path, tbl, ck,
                             threshold=0.5).awaitTermination(300)
    assert t.current_version() == v_before
    assert sorted(r["doc_id"] for r in t.read(spark).collect()) == [2, 3, 5]


def test_stream_drift_monitor(spark, tmp_path):
    """Streaming drift monitor: micro-batches scored against a
    standing reference profile; an on-distribution batch reads
    stable, a shifted one reads investigate; the stored PSI equals
    score_drift's batch value EXACTLY (shared arithmetic); replay
    with the same checkpoint rewrites nothing new."""
    from mehc_curation_spark.operators.profile import (
        reference_profile,
        score_drift,
    )
    from mehc_curation_spark.streaming.curate_stream import (
        DOCS_STREAM_SCHEMA,
        run_stream_drift,
    )

    def rows(shift, n=400, base=0):
        return [(base + i, f"doc {i}", "en", "crawl",
                 shift + (i * 7) % 100) for i in range(n)]

    ref = spark.createDataFrame(rows(0), DOCS_STREAM_SCHEMA)
    profile = reference_profile(ref, "n_chars", n_buckets=10)

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out = str(tmp_path / "drift_out")
    ck = str(tmp_path / "drift_ck")

    def arrive(rws):
        spark.createDataFrame(rws, DOCS_STREAM_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    arrive(rows(0, base=1000))          # same distribution
    run_stream_drift(spark, in_dir, out, ck,
                     profile).awaitTermination(300)
    arrive(rows(400, base=2000))        # hard shift: clamps to top bucket
    run_stream_drift(spark, in_dir, out, ck,
                     profile).awaitTermination(300)

    got = {r["batch_id"]: r for r in
           spark.read.parquet(out + "/batch_id=*").collect()}
    assert len(got) == 2
    b0, b1 = got[0], got[1]
    assert b0["n_rows"] == 400 and b1["n_rows"] == 400
    assert b0["verdict"] == "stable" and b0["psi"] < 0.1
    assert b1["verdict"] == "investigate" and b1["psi"] > 0.25

    # bit-identical to the batch-mode monitor on the same data
    batch2 = spark.createDataFrame(rows(400, base=2000),
                                   DOCS_STREAM_SCHEMA)
    contribs = score_drift(ref, batch2, "n_chars",
                           n_buckets=10).collect()
    assert round(sum(r["psi_contrib"] for r in contribs), 6) == b1["psi"]

    # replay: no new arrivals -> no new batch dirs, old rows untouched
    import glob
    dirs_before = sorted(glob.glob(out + "/batch_id=*"))
    run_stream_drift(spark, in_dir, out, ck,
                     profile).awaitTermination(300)
    assert sorted(glob.glob(out + "/batch_id=*")) == dirs_before
    again = {r["batch_id"]: r["psi"] for r in
             spark.read.parquet(out + "/batch_id=*").collect()}
    assert again == {0: b0["psi"], 1: b1["psi"]}


# ---------------------------------------------------------------------------
# inline maintenance: long-lived streams must not accumulate tiny files
# ---------------------------------------------------------------------------

def test_stream_inline_maintenance(spark, pairs_df, tmp_path):
    in_dir = str(tmp_path / "min")
    tbl_dir = str(tmp_path / "mtbl")
    ck_dir = str(tmp_path / "mck")
    os.makedirs(in_dir)

    # deterministic 4x10 split (limit/offset order is not stable
    # across executions of the same plan)
    all_ids = sorted(r[0] for r in
                     pairs_df.select("image_id").collect())[:40]
    chunks = [pairs_df.filter(
        pairs_df.image_id.isin(all_ids[10 * i:10 * i + 10])).coalesce(1)
        for i in range(4)]
    expect_ids = set()
    for i, c in enumerate(chunks):
        expect_ids.update(all_ids[10 * i:10 * i + 10])
        c.write.mode("append").parquet(in_dir)
        run_stream_to_snapshot_table(
            spark, in_dir, tbl_dir, ck_dir,
            transform=lambda s: s,
            maintain_every=2, maintain_target_files=1,
            maintain_keep_last=1).awaitTermination(300)

    table = SnapshotTable(tbl_dir)
    h = table.health()
    # 4 micro-batches committed; maintenance after ids 1 and 3 keeps
    # the table at ~target_files, not one-file-set-per-batch
    assert h["data_files"] <= 2
    assert h["snapshots_retained"] <= 3  # expire ran
    assert h["unreferenced_files"] == 0 or h["unreferenced_files"] < 4
    # exactly-once despite the expiry: rows are the union, no dup/loss
    got = [r["image_id"] for r in
           table.read(spark).select("image_id").collect()]
    assert len(got) == len(set(got)) == len(expect_ids)
    assert set(got) == expect_ids
    scope = _stream_scope(ck_dir)
    # replay of any settled batch is still detected as committed
    assert _batch_committed(table, scope, 0) is True
    assert _batch_committed(table, scope, 3) is True
    assert _batch_committed(table, scope, 4) is False


# ---------------------------------------------------------------------------
# lambda-split divergence bound (VERDICT r3 item 7): streaming
# conflict_suspect vs the authoritative batch conflict labels may
# differ ONLY on rows that ARRIVED before their phash's conflict
# became observable — never on later rows, and never on
# non-conflicted phashes.
# ---------------------------------------------------------------------------

def test_stream_vs_batch_conflict_divergence_bound(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    # arrival script: list of micro-batches (one parquet file each,
    # maxFilesPerTrigger=1 + spaced mtimes pin the order)
    batches = [
        # b0: g7 consistent so far; g8 conflicts WITHIN the batch
        # (id order a1 < a2 < a3); g9 consistent forever
        [("a1", None, None, None, "raw", "A", 8),
         ("a2", None, None, None, "raw", "B", 8),
         ("a3", None, None, None, "raw", "A", 8),
         ("g1", None, None, None, "raw", "X", 7),
         ("n1", None, None, None, "raw", "ok", 9)],
        # b1: g7 now conflicts (D after X); null caption on g9 must
        # not create a conflict
        [("g2", None, None, None, "raw", "D", 7),
         ("n2", None, None, None, "raw", None, 9)],
        # b2: post-conflict arrivals on both conflicted phashes
        [("g3", None, None, None, "raw", "X", 7),
         ("a4", None, None, None, "raw", "A", 8),
         ("n3", None, None, None, "raw", "ok", 9)],
    ]
    from mehc_curation_spark.schema import PAIRS_SCHEMA

    in_dir = str(tmp_path / "din")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        sub = os.path.join(in_dir, f"b{i}.parquet")
        (spark.createDataFrame(rows, PAIRS_SCHEMA)
         .coalesce(1).write.parquet(sub))
        # spaced mtimes: the file source admits files oldest-first
        for root, _d, fs in os.walk(sub):
            for f in fs:
                os.utime(os.path.join(root, f), (1000 + i * 100,) * 2)
        os.utime(sub, (1000 + i * 100,) * 2)

    stream = (spark.readStream.schema(PAIRS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false")
              .parquet(in_dir + "/*"))
    out = flag_conflicts_stream(stream)  # no timeout: bound is exact
    q = (out.writeStream.format("memory").queryName("div")
         .option("checkpointLocation", str(tmp_path / "dck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    flags = {r["image_id"]: r["conflict_suspect"]
             for r in spark.sql("SELECT * FROM div").collect()}
    assert len(flags) == sum(len(b) for b in batches)

    # authoritative batch rule: a phash with >1 distinct non-null
    # caption drops ALL its rows
    all_rows = [r for b in batches for r in b]
    caps = {}
    for (iid, _b, _w, _h, _f, cap, ph) in all_rows:
        if cap is not None:
            caps.setdefault(ph, set()).add(cap)
    batch_conflicted = {iid for (iid, _b, _w, _h, _f, cap, ph)
                        in all_rows if len(caps.get(ph, ())) > 1}

    # arrival-order emulation of the streaming rule → the conflict
    # point of each phash (first row at/after which flags must fire)
    state = {}
    expect = {}
    for b in batches:
        for (iid, _b, _w, _h, _f, cap, ph) in sorted(b):
            cap0, conf = state.get(ph, (None, False))
            if cap is not None:
                if cap0 is None:
                    cap0 = cap
                elif cap != cap0:
                    conf = True
            state[ph] = (cap0, conf)
            expect[iid] = conf

    # 1. determinism: the operator implements exactly the arrival rule
    assert flags == expect
    # 2. soundness: a flag never fires outside the batch conflict set
    flagged = {i for i, v in flags.items() if v}
    assert flagged <= batch_conflicted
    # 3. bound: divergence from batch is EXACTLY the pre-observation
    #    prefix — every conflicted row arriving at/after its phash's
    #    conflict point is flagged
    divergent = batch_conflicted - flagged
    assert divergent == {"a1", "g1"}
    # (only the rows that arrived BEFORE their phash's second
    # distinct caption diverge; "a2"/"g2" REVEAL the conflict and are
    # flagged immediately, "a3"/"a4"/"g3" arrive after and MUST be)
    assert flags["a2"] and flags["g2"]
    assert flags["a3"] and flags["a4"] and flags["g3"]
    # non-conflicted phash (9, incl. its null caption) never flagged
    assert not flags["n1"] and not flags["n2"] and not flags["n3"]


# ---------------------------------------------------------------------------
# streaming into a table carrying delete debt (VERDICT r4 Next #6):
# the original takedown-race scenario driven END-TO-END through the
# stream path — a key taken down via MoR equality delete is
# re-ingested by a later micro-batch, stays visible under sequence
# scoping, and inline maintenance settles the debt without touching
# the re-ingested row.
# ---------------------------------------------------------------------------

def test_stream_ingest_over_pending_takedown(spark, pairs_df, tmp_path):
    in_dir = str(tmp_path / "tin")
    tbl_dir = str(tmp_path / "ttbl")
    ck_dir = str(tmp_path / "tck")
    os.makedirs(in_dir)

    all_ids = sorted(r[0] for r in
                     pairs_df.select("image_id").collect())[:20]
    first, second = all_ids[:10], all_ids[10:]
    victim = first[0]

    # batch 0: ingest the first chunk through the stream
    (pairs_df.filter(pairs_df.image_id.isin(first)).coalesce(1)
     .write.mode("append").parquet(in_dir))
    run_stream_to_snapshot_table(
        spark, in_dir, tbl_dir, ck_dir,
        transform=lambda s: s).awaitTermination(300)
    table = SnapshotTable(tbl_dir)
    assert table.read(spark).filter(
        f"image_id = '{victim}'").count() == 1

    # takedown lands between micro-batches (MoR: no rewrite)
    table.delete_where(spark, f"image_id = '{victim}'", mode="mor")
    assert table.manifest().get("deletes")
    assert table.read(spark).filter(
        f"image_id = '{victim}'").count() == 0

    # batch 1: the stream re-ingests the victim key + fresh rows;
    # the append commits ONTO the debt-carrying table and sequence
    # scoping keeps the new copy out of the older delete's reach
    reingest = pairs_df.filter(
        pairs_df.image_id.isin(second + [victim])).coalesce(1)
    reingest.write.mode("append").parquet(in_dir)
    run_stream_to_snapshot_table(
        spark, in_dir, tbl_dir, ck_dir,
        transform=lambda s: s,
        maintain_every=2, maintain_target_files=1,
        maintain_keep_last=1).awaitTermination(300)

    got = table.read(spark).filter(
        f"image_id = '{victim}'").collect()
    assert len(got) == 1  # re-ingested copy visible, old copy masked
    # inline maintenance (every 2nd batch -> after batch 1) settled
    # the debt: no pending entries, raw file scan holds no masked row
    assert not table.manifest().get("deletes")
    assert table.health()["pending_delete_files"] == 0
    ids = [r["image_id"] for r in
           table.read(spark).select("image_id").collect()]
    assert sorted(ids) == sorted(set(first + second))
    assert ids.count(victim) == 1
