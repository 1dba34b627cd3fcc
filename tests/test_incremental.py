"""Incremental curation (stages/incremental.py) — the invariant under
test is BATCH EQUIVALENCE: after any sequence of increments, the
labels table must equal run_curate over the union of all increments,
including retractions of previously-kept rows whose phash group a
later increment made conflicted (or out-keep-first'd)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mehc_curation_spark.io.catalog import SnapshotTable
from mehc_curation_spark.io.ledger import Ledger
from mehc_curation_spark.rules.registry import CurationConfig
from mehc_curation_spark.stages.incremental import run_curate_increment
from mehc_curation_spark.stages.plan import build_labels_plan

CFG = CurationConfig(phash_buckets=8)

_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("bytes", pa.binary()),
    ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
    ("caption", pa.string()), ("phash", pa.int64()),
])


def _write(pdf: pd.DataFrame, path: str) -> str:
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=_SCHEMA, preserve_index=False),
        path)
    return path


def _labels_pdf(df) -> pd.DataFrame:
    cols = ["image_id", "phash", "keep", "drop_reason",
            "caption_scrubbed", "lang", "lang_conf", "ppl"]
    return (df.select(*cols).toPandas()
            .sort_values("image_id").reset_index(drop=True))


def _assert_batch_equal(spark, out: str, full_pdf: pd.DataFrame):
    got = _labels_pdf(SnapshotTable(out).read(spark))
    full_p = os.path.join(os.path.dirname(out), "full_ref.parquet")
    _write(full_pdf, full_p)
    exp = _labels_pdf(build_labels_plan(spark.read.parquet(full_p), CFG))
    assert len(got) == len(exp)
    for c in exp.columns:
        g, e = got[c], exp[c]
        if g.dtype == object:
            g, e = g.fillna("#"), e.fillna("#")
        assert (g == e).all(), f"column {c} diverges from batch"


@pytest.fixture(scope="module")
def corpus():
    from mehc_curation_spark.fixtures import make_pairs_pdf

    return make_pairs_pdf(3000, seed=42)


def test_bootstrap_equals_batch(spark, corpus, tmp_path):
    inp = _write(corpus, str(tmp_path / "full.parquet"))
    out = str(tmp_path / "out")
    m = run_curate_increment(spark, inp, out, CFG)
    assert m["rows_new"] == 3000
    assert m["relabeled_old"] == 0 and m["buckets_rewritten"] == []
    _assert_batch_equal(spark, out, corpus)
    # state sidecar seeded, one row per input row
    st = SnapshotTable(os.path.join(out, "_state"))
    assert st.read(spark).count() == 3000


def test_three_increments_equal_batch_with_retractions(
        spark, corpus, tmp_path):
    # interleaved split (row index mod 3): later increments carry
    # SMALLER image_ids than some earlier rows for the same phash
    # groups, so both retraction kinds occur (keep-first takeover →
    # duplicate_perfect flip; new alive caption → duplicate_conflict)
    out = str(tmp_path / "out")
    metrics = []
    for i in range(3):
        chunk = corpus.iloc[i::3].reset_index(drop=True)
        inp = _write(chunk, str(tmp_path / f"inc{i}.parquet"))
        metrics.append(run_curate_increment(spark, inp, out, CFG))

    assert sum(m["rows_new"] for m in metrics) == 3000
    # the fixture plants phash dup/conflict groups densely enough that
    # an interleaved split MUST relabel old rows — if this ever reads
    # 0 the mechanism under test did not run
    assert sum(m["relabeled_old"] for m in metrics[1:]) > 0
    assert sum(m["retracted"] for m in metrics[1:]) > 0
    assert any(m["buckets_rewritten"] for m in metrics[1:])
    for m in metrics:
        assert not (set(m["buckets_rewritten"])
                    & set(m["buckets_appended"]))
    _assert_batch_equal(spark, out, corpus)


def test_ledger_and_lang_stats_match_batch(spark, corpus, tmp_path):
    from mehc_curation_spark.stages.refinement import run_curate

    out_inc = str(tmp_path / "inc_out")
    for i in range(2):
        chunk = corpus.iloc[i::2].reset_index(drop=True)
        inp = _write(chunk, str(tmp_path / f"i{i}.parquet"))
        last = run_curate_increment(spark, inp, out_inc, CFG)

    inp_full = _write(corpus, str(tmp_path / "full.parquet"))
    out_batch = str(tmp_path / "batch_out")
    batch = run_curate(spark, inp_full, out_batch, CFG)

    assert set(last["lang_stats"]) == set(batch["lang_stats"])
    for lang, e in batch["lang_stats"].items():
        g = last["lang_stats"][lang]
        assert (g["rows"], g["kept"], g["keep_rate"]) == (
            e["rows"], e["kept"], e["keep_rate"])
        # ppl_sum differs only by float summation order
        assert abs(g["ppl_sum"] - e["ppl_sum"]) < 1e-6 * max(
            1.0, abs(e["ppl_sum"]))

    def totals(path):
        led = Ledger(path).read()
        rows = kept = 0
        dropped: dict[str, int] = {}
        for e in led["buckets"].values():
            rows += e["rows"]
            kept += e["kept"]
            for k, v in e["dropped"].items():
                dropped[k] = dropped.get(k, 0) + v
        return rows, kept, dropped

    assert totals(out_inc) == totals(out_batch)


def test_fresh_phashes_touch_nothing_old(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    base = corpus.iloc[:1500].reset_index(drop=True)
    run_curate_increment(
        spark, _write(base, str(tmp_path / "b.parquet")), out, CFG)

    fresh = corpus.iloc[1500:1700].reset_index(drop=True).copy()
    # phashes disjoint from every existing group → no replayed old rows
    fresh["phash"] = [10**15 + 7919 * i for i in range(len(fresh))]
    m = run_curate_increment(
        spark, _write(fresh, str(tmp_path / "f.parquet")), out, CFG)
    assert m["relabeled_old"] == 0 and m["retracted"] == 0
    assert m["buckets_rewritten"] == []
    assert m["rows_new"] == 200
    full = pd.concat([base, fresh], ignore_index=True)
    _assert_batch_equal(spark, out, full)


def test_refuses_stateless_table(spark, corpus, tmp_path):
    from mehc_curation_spark.stages.refinement import run_curate

    out = str(tmp_path / "out")
    run_curate(spark, _write(corpus.iloc[:500], str(tmp_path / "a.parquet")),
               out, CFG)
    with pytest.raises(ValueError, match="_state"):
        run_curate_increment(
            spark, _write(corpus.iloc[500:600].reset_index(drop=True),
                          str(tmp_path / "b.parquet")), out, CFG)


def test_raw_data_dir_matches_snapshot_after_rewrites(
        spark, corpus, tmp_path):
    """CoW mode: replaced files are unlinked post-commit, so a plain
    spark.read.parquet(out/data) sees exactly the live snapshot."""
    out = str(tmp_path / "out")
    for i in range(2):
        chunk = corpus.iloc[i::2].reset_index(drop=True)
        run_curate_increment(
            spark, _write(chunk, str(tmp_path / f"c{i}.parquet")), out, CFG,
            flip_mode="cow")
    raw = spark.read.parquet(os.path.join(out, "data"))
    snap = SnapshotTable(out).read(spark)
    assert raw.count() == snap.count() == 3000
    assert raw.select("image_id").distinct().count() == 3000


def test_mor_flip_debt_and_settle(spark, corpus, tmp_path):
    """MoR mode (default): flip commits are append-shaped — the data
    dir carries the masked old copies plus one equality-delete key
    file per flip commit — while the SNAPSHOT read resolves to the
    exact batch labels. Settling rewrites only the flip buckets and
    restores physical == logical."""
    from mehc_curation_spark.io.ledger import Ledger
    from mehc_curation_spark.stages.incremental import _settle_label_debt

    out = str(tmp_path / "out")
    flips = 0
    for i in range(2):
        chunk = corpus.iloc[i::2].reset_index(drop=True)
        m = run_curate_increment(
            spark, _write(chunk, str(tmp_path / f"c{i}.parquet")), out, CFG)
        flips += m["relabeled_old"]
    assert flips > 0  # non-vacuous: retraction machinery ran
    tbl = SnapshotTable(out)
    dels = tbl.manifest().get("deletes") or []
    assert len(dels) == 1 and dels[0]["cols"] == ["image_id"]
    assert dels[0]["buckets"]  # settle targets recorded
    data_files = [f for f in tbl.manifest()["files"]]
    raw = spark.read.parquet(*[os.path.join(out, "data", f)
                               for f in data_files])
    assert raw.count() == 3000 + flips  # masked copies still on disk
    _assert_batch_equal(spark, out, corpus)  # read resolves the masks

    v = _settle_label_debt(spark, Ledger(out), tbl)
    assert v == tbl.current_version()
    assert not (tbl.manifest().get("deletes") or [])
    raw2 = spark.read.parquet(os.path.join(out, "data"))
    assert raw2.count() == tbl.read(spark).count() == 3000
    _assert_batch_equal(spark, out, corpus)  # settle changed nothing

    # delete key files reclaimed with the replaced copies
    deldir = os.path.join(out, "data", "_deletes")
    assert not os.path.isdir(deldir) or not os.listdir(deldir)


def test_mor_auto_settle_threshold(spark, corpus, tmp_path):
    """settle_deletes_after=1: every flip commit settles inline, so
    debt never survives an increment and labels stay batch-equal."""
    out = str(tmp_path / "out")
    for i in range(3):
        chunk = corpus.iloc[i::3].reset_index(drop=True)
        m = run_curate_increment(
            spark, _write(chunk, str(tmp_path / f"c{i}.parquet")), out, CFG,
            settle_deletes_after=1)
        assert m["delete_entries_pending"] == 0
    tbl = SnapshotTable(out)
    assert not (tbl.manifest().get("deletes") or [])
    raw = spark.read.parquet(os.path.join(out, "data"))
    assert raw.count() == tbl.read(spark).count() == 3000
    _assert_batch_equal(spark, out, corpus)


def test_cow_after_mor_settles_first(spark, corpus, tmp_path):
    """A CoW increment on a table carrying MoR flip debt settles the
    debt before its prefix-replacement commit (which the catalog
    refuses under live debt) — mixing modes stays batch-equal."""
    out = str(tmp_path / "out")
    thirds = [corpus.iloc[i::3].reset_index(drop=True) for i in range(3)]
    run_curate_increment(
        spark, _write(thirds[0], str(tmp_path / "c0.parquet")), out, CFG)
    m1 = run_curate_increment(
        spark, _write(thirds[1], str(tmp_path / "c1.parquet")), out, CFG)
    assert m1["relabeled_old"] > 0  # debt actually pending
    assert SnapshotTable(out).manifest().get("deletes")
    m2 = run_curate_increment(
        spark, _write(thirds[2], str(tmp_path / "c2.parquet")), out, CFG,
        flip_mode="cow")
    assert m2["flip_mode"] == "cow"
    assert not (SnapshotTable(out).manifest().get("deletes") or [])
    _assert_batch_equal(spark, out, corpus)


def test_config_drift_refused(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    run_curate_increment(
        spark, _write(corpus.iloc[:500], str(tmp_path / "a.parquet")),
        out, CFG)
    with pytest.raises(ValueError, match="config drift.*phash_buckets"):
        run_curate_increment(
            spark, _write(corpus.iloc[500:600].reset_index(drop=True),
                          str(tmp_path / "b.parquet")),
            out, CurationConfig(phash_buckets=16))


def test_empty_increment_is_noop(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    m0 = run_curate_increment(
        spark, _write(corpus.iloc[:500], str(tmp_path / "a.parquet")),
        out, CFG)
    empty = corpus.iloc[0:0]
    m1 = run_curate_increment(
        spark, _write(empty, str(tmp_path / "e.parquet")), out, CFG)
    assert m1["rows_new"] == 0 and m1["relabeled_old"] == 0
    assert m1["snapshot_version"] == m0["snapshot_version"]
    assert m1["state_version"] == m0["state_version"]
    assert m1["lang_stats"] == m0["lang_stats"]


def test_crash_between_commits_heals_forward(
        spark, corpus, tmp_path, monkeypatch):
    """Kill the run between the labels commit and the state commit;
    the next increment must roll the state forward (write-ahead
    properties + deterministic staged names) and preserve batch
    equivalence."""
    out = str(tmp_path / "out")
    chunks = [corpus.iloc[i::3].reset_index(drop=True) for i in range(3)]
    run_curate_increment(
        spark, _write(chunks[0], str(tmp_path / "c0.parquet")), out, CFG)

    orig = SnapshotTable.commit_files
    armed = {"on": True}

    def failing(self, *a, **k):
        if armed["on"] and self.path.rstrip("/").endswith("_state"):
            armed["on"] = False
            raise RuntimeError("simulated crash before state commit")
        return orig(self, *a, **k)

    monkeypatch.setattr(SnapshotTable, "commit_files", failing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_curate_increment(
            spark, _write(chunks[1], str(tmp_path / "c1.parquet")),
            out, CFG)
    monkeypatch.setattr(SnapshotTable, "commit_files", orig)

    # labels are one inc ahead of state on disk right now
    lab_inc = (SnapshotTable(out).manifest().get("properties") or {})["inc_id"]
    st = SnapshotTable(os.path.join(out, "_state"))
    st_inc = (st.manifest().get("properties") or {}).get("inc_id", 0) \
        if st.exists() else 0
    assert lab_inc == st_inc + 1

    m = run_curate_increment(
        spark, _write(chunks[2], str(tmp_path / "c2.parquet")), out, CFG)
    assert m["rows_new"] == len(chunks[2])
    # healed: state now covers every row ever ingested
    assert st.read(spark).count() == 3000
    _assert_batch_equal(spark, out, corpus)


def test_staging_cleaned_after_success(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    for i in range(2):
        run_curate_increment(
            spark, _write(corpus.iloc[i::2].reset_index(drop=True),
                          str(tmp_path / f"s{i}.parquet")), out, CFG)
    stg = os.path.join(out, "_staging")
    leftovers = os.listdir(stg) if os.path.isdir(stg) else []
    assert leftovers == []


def test_compact_increments_preserves_everything(spark, corpus, tmp_path):
    from mehc_curation_spark.stages.incremental import compact_increments

    out = str(tmp_path / "out")
    for i in range(3):
        run_curate_increment(
            spark, _write(corpus.iloc[i::3].reset_index(drop=True),
                          str(tmp_path / f"k{i}.parquet")), out, CFG)

    t = SnapshotTable(out)
    before = t.manifest()["files"]
    assert any(  # the thing compaction fixes must exist first
        sum(1 for f in before if f.startswith(f"bucket={b}/")) > 1
        for b in range(8))
    pre_ledger = Ledger(out).read()["buckets"]

    res = compact_increments(spark, out)
    assert res["labels"]["buckets_compacted"] > 0
    after = t.manifest()["files"]
    per_bucket = {}
    for f in after:
        per_bucket[f.split("/", 1)[0]] = \
            per_bucket.get(f.split("/", 1)[0], 0) + 1
    assert all(v == 1 for v in per_bucket.values())
    # rows + labels identical; raw dir clean; ledger untouched
    _assert_batch_equal(spark, out, corpus)
    raw = spark.read.parquet(os.path.join(out, "data"))
    assert raw.count() == 3000
    assert Ledger(out).read()["buckets"] == pre_ledger
    st = SnapshotTable(os.path.join(out, "_state"))
    assert st.read(spark).count() == 3000

    # the protocol survives: another increment after compaction works
    extra = corpus.iloc[:100].copy()
    extra["image_id"] = ["zz_" + str(i) for i in range(100)]
    m = run_curate_increment(
        spark, _write(extra, str(tmp_path / "k3.parquet")), out, CFG)
    assert m["rows_new"] == 100
    assert t.read(spark).count() == 3100


def test_snapshot_table_input_consumes_deltas(spark, corpus, tmp_path):
    """The stream→ingest-table→increment loop: each call consumes
    exactly the ingest table's CDC delta, tracked by a watermark in
    the output's properties; an already-consumed version no-ops."""
    ingest = SnapshotTable(str(tmp_path / "ingest"))
    out = str(tmp_path / "out")

    c0 = corpus.iloc[0::2].reset_index(drop=True)
    c1 = corpus.iloc[1::2].reset_index(drop=True)
    _write(c0, str(tmp_path / "w0.parquet"))
    ingest.write(spark.read.parquet(str(tmp_path / "w0.parquet")),
                 mode="append")
    m0 = run_curate_increment(spark, ingest.path, out, CFG)
    assert m0["rows_new"] == 1500

    # nothing new yet → no-op
    mn = run_curate_increment(spark, ingest.path, out, CFG)
    assert mn["rows_new"] == 0
    assert mn["snapshot_version"] == m0["snapshot_version"]

    _write(c1, str(tmp_path / "w1.parquet"))
    ingest.write(spark.read.parquet(str(tmp_path / "w1.parquet")),
                 mode="append")
    m1 = run_curate_increment(spark, ingest.path, out, CFG)
    assert m1["rows_new"] == 1500
    _assert_batch_equal(spark, out, corpus)

    # a different snapshot-table source is refused (watermarks are
    # per-table); plain parquet increments remain allowed
    other = SnapshotTable(str(tmp_path / "other"))
    other.write(spark.read.parquet(str(tmp_path / "w0.parquet")),
                mode="append")
    with pytest.raises(ValueError, match="bound to input table"):
        run_curate_increment(spark, other.path, out, CFG)


def test_stream_to_bronze_to_incremental_end_to_end(
        spark, corpus, tmp_path):
    """The full continuous pipeline: streaming raw ingestion lands
    micro-batches in a bronze snapshot table (exactly-once), and
    scheduled run_curate_increment calls consume its CDC deltas —
    final labels must equal one batch run over everything streamed."""
    from mehc_curation_spark.streaming.curate_stream import (
        run_stream_ingest_raw,
    )

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    ckpt = str(tmp_path / "ckpt")
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "out")

    for i in range(2):
        chunk = corpus.iloc[i::2].reset_index(drop=True)
        _write(chunk, str(tmp_path / f"w{i}.parquet"))
        spark.read.parquet(str(tmp_path / f"w{i}.parquet")) \
            .write.parquet(os.path.join(inp, f"part_{i}"))
        q = run_stream_ingest_raw(spark, os.path.join(inp, "*"),
                                  bronze, ckpt)
        q.awaitTermination(120)
        m = run_curate_increment(spark, bronze, out, CFG)
        assert m["rows_new"] == 1500

    assert SnapshotTable(bronze).read(spark).count() == 3000
    _assert_batch_equal(spark, out, corpus)


def test_source_rewrite_and_expiry_are_refused(spark, corpus, tmp_path):
    """Per-file CDC tracking refuses a source whose history was
    rewritten (compaction renames every file → the whole corpus would
    re-list as 'new') or whose consumed-watermark manifest was
    expired."""
    ingest = SnapshotTable(str(tmp_path / "ingest"))
    out = str(tmp_path / "out")
    _write(corpus.iloc[:500], str(tmp_path / "w0.parquet"))
    ingest.write(spark.read.parquet(str(tmp_path / "w0.parquet")),
                 mode="append")
    run_curate_increment(spark, ingest.path, out, CFG)

    _write(corpus.iloc[500:1000].reset_index(drop=True),
           str(tmp_path / "w1.parquet"))
    ingest.write(spark.read.parquet(str(tmp_path / "w1.parquet")),
                 mode="append")
    ingest.compact(spark, target_files=1)  # rewrites every file
    with pytest.raises(ValueError, match="history was rewritten"):
        run_curate_increment(spark, ingest.path, out, CFG)

    # fresh pair of tables for the expiry case
    ingest2 = SnapshotTable(str(tmp_path / "ingest2"))
    out2 = str(tmp_path / "out2")
    ingest2.write(spark.read.parquet(str(tmp_path / "w0.parquet")),
                  mode="append")
    run_curate_increment(spark, ingest2.path, out2, CFG)
    ingest2.write(spark.read.parquet(str(tmp_path / "w1.parquet")),
                  mode="append")
    ingest2.expire_snapshots(keep_last=1)  # drops the consumed v1
    with pytest.raises(ValueError, match="expired"):
        run_curate_increment(spark, ingest2.path, out2, CFG)


def test_empty_delta_advances_watermark(spark, corpus, tmp_path):
    ingest = SnapshotTable(str(tmp_path / "ingest"))
    out = str(tmp_path / "out")
    _write(corpus.iloc[:500], str(tmp_path / "w0.parquet"))
    ingest.write(spark.read.parquet(str(tmp_path / "w0.parquet")),
                 mode="append")
    run_curate_increment(spark, ingest.path, out, CFG)

    empty = spark.read.parquet(str(tmp_path / "w0.parquet")).limit(0)
    ingest.write(empty, mode="append")
    m = run_curate_increment(spark, ingest.path, out, CFG)
    assert m["rows_new"] == 0
    st = SnapshotTable(os.path.join(out, "_state"))
    assert (st.manifest()["properties"]["input_version_consumed"]
            == ingest.current_version())


def test_stale_staging_swept_on_next_run(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    _write(corpus.iloc[:500], str(tmp_path / "a.parquet"))
    run_curate_increment(spark, str(tmp_path / "a.parquet"), out, CFG)
    junk = os.path.join(out, "_staging", "deadbeef0000")
    os.makedirs(junk)
    open(os.path.join(junk, "leftover.parquet"), "w").close()
    _write(corpus.iloc[500:600].reset_index(drop=True),
           str(tmp_path / "b.parquet"))
    run_curate_increment(spark, str(tmp_path / "b.parquet"), out, CFG)
    assert not os.path.exists(junk)


def test_crash_before_ledger_publish_heals(
        spark, corpus, tmp_path, monkeypatch):
    """Kill the run between the snapshot commits and the ledger
    publish; the next increment's _heal_ledger must absolute-recompute
    the gap so the delta-based counters stay exact."""
    out = str(tmp_path / "out")
    chunks = [corpus.iloc[i::3].reset_index(drop=True) for i in range(3)]
    run_curate_increment(
        spark, _write(chunks[0], str(tmp_path / "l0.parquet")), out, CFG)

    orig = Ledger.publish_buckets
    armed = {"on": True}

    def failing(self, *a, **k):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("simulated crash before ledger publish")
        return orig(self, *a, **k)

    monkeypatch.setattr(Ledger, "publish_buckets", failing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_curate_increment(
            spark, _write(chunks[1], str(tmp_path / "l1.parquet")),
            out, CFG)
    monkeypatch.setattr(Ledger, "publish_buckets", orig)

    run_curate_increment(
        spark, _write(chunks[2], str(tmp_path / "l2.parquet")), out, CFG)

    # ledger totals must equal an absolute recompute of the table
    led = Ledger(out).read()["buckets"]
    labels = SnapshotTable(out).read(spark)
    from mehc_curation_spark.stages.refinement import per_bucket_counters
    absolute = per_bucket_counters(labels)
    got = {int(b): e for b, e in
           ((b, {"rows": e["rows"], "kept": e["kept"],
                 "dropped": e["dropped"]}) for b, e in led.items())}
    assert got == absolute
    _assert_batch_equal(spark, out, corpus)


@pytest.mark.parametrize("seed", [13, 59])
def test_random_increment_schedules_stay_batch_equal(
        spark, corpus, tmp_path, seed):
    """r5 model-style fuzz over the MoR flip machinery: feed the
    corpus as a RANDOM partition of 4-6 increments in random order,
    with per-increment random flip_mode (mor/cow mixing exercises the
    settle-before-CoW path), a random settle threshold (including 0 =
    never settle inline), and occasional explicit mid-schedule
    settles/compactions. After EVERY increment the snapshot read must
    be batch-equal to the union-so-far; at the end the debt settles
    clean and physical == logical."""
    import random

    from mehc_curation_spark.stages.incremental import (
        _settle_label_debt,
        compact_increments,
    )

    rng = random.Random(seed)
    n_inc = rng.randrange(4, 7)
    # random partition of row indices into n_inc nonempty chunks
    idx = list(range(len(corpus)))
    rng.shuffle(idx)
    bounds = sorted(rng.sample(range(1, len(idx)), n_inc - 1))
    chunks = [sorted(idx[a:b]) for a, b in
              zip([0] + bounds, bounds + [len(idx)])]
    out = str(tmp_path / "out")
    seen = []
    for i, chunk in enumerate(chunks):
        part = corpus.iloc[chunk].reset_index(drop=True)
        seen.append(part)
        mode = rng.choice(["mor", "mor", "cow"])  # bias to default
        settle_after = rng.choice([0, 1, 2, 16])
        m = run_curate_increment(
            spark, _write(part, str(tmp_path / f"i{i}.parquet")), out,
            CFG, flip_mode=mode, settle_deletes_after=settle_after)
        assert m["flip_mode"] == mode
        _assert_batch_equal(
            spark, out, pd.concat(seen, ignore_index=True))
        if rng.random() < 0.3:
            _settle_label_debt(spark, Ledger(out), SnapshotTable(out))
            _assert_batch_equal(
                spark, out, pd.concat(seen, ignore_index=True))
        if rng.random() < 0.2:
            compact_increments(spark, out)
            _assert_batch_equal(
                spark, out, pd.concat(seen, ignore_index=True))
    _settle_label_debt(spark, Ledger(out), SnapshotTable(out))
    tbl = SnapshotTable(out)
    assert not (tbl.manifest().get("deletes") or [])
    raw = spark.read.parquet(os.path.join(out, "data"))
    assert raw.count() == tbl.read(spark).count() == len(corpus)
    _assert_batch_equal(spark, out, corpus)
