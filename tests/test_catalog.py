"""SnapshotTable: atomic commit, append/overwrite lineage, time travel,
schema pinning, snapshot expiry."""

import os

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable, load_table


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def test_append_and_time_travel(spark, tbl):
    df1 = spark.range(5).toDF("id")
    df2 = spark.range(5, 8).toDF("id")
    v1 = tbl.write(df1)
    v2 = tbl.write(df2)
    assert (v1, v2) == (1, 2)
    assert tbl.read(spark, version=1).count() == 5
    assert tbl.read(spark).count() == 8
    assert tbl.manifest(2)["parent"] == 1


def test_overwrite_starts_fresh(spark, tbl):
    tbl.write(spark.range(5).toDF("id"))
    tbl.write(spark.range(2).toDF("id"), mode="overwrite")
    assert tbl.read(spark).count() == 2
    assert tbl.read(spark, version=1).count() == 5  # still time-travelable


def test_schema_pinned_on_append(spark, tbl):
    tbl.write(spark.range(3).toDF("id"))
    bad = spark.range(3).selectExpr("id", "id * 2 AS extra")
    with pytest.raises(ValueError, match="schema mismatch"):
        tbl.write(bad)


def test_expire_snapshots(spark, tbl):
    tbl.write(spark.range(5).toDF("id"))
    tbl.write(spark.range(3).toDF("id"), mode="overwrite")
    removed = tbl.expire_snapshots(keep_last=1)
    assert removed >= 1
    assert tbl.read(spark).count() == 3
    with pytest.raises(FileNotFoundError):
        # v1 manifest gone
        tbl.read(spark, version=1)


def test_load_table_fallback_paths(spark, tbl, tmp_path):
    tbl.write(spark.range(4).toDF("id"))
    assert load_table(spark, tbl.path).count() == 4
    plain = str(tmp_path / "plain")
    spark.range(6).toDF("id").write.parquet(plain)
    assert load_table(spark, plain).count() == 6


def test_concurrent_manifest_commits(tmp_path):
    """Two (here: eight) simultaneous committers must not lose updates:
    the hard-link CAS gives each a unique version and the loser retries
    against the winner's manifest, so the final file list is the union
    (VERDICT r1 item 9)."""
    import os
    import threading

    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(str(tmp_path / "cc"))
    os.makedirs(t.data_dir, exist_ok=True)
    n = 8
    for i in range(n):
        open(os.path.join(t.data_dir, f"f{i}.parquet"), "w").close()

    versions: list[int] = []
    errs: list[Exception] = []
    barrier = threading.Barrier(n)

    def commit(i):
        try:
            barrier.wait()
            versions.append(t.commit_files([f"f{i}.parquet"], "{}"))
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(n)]
    [th.start() for th in threads]
    [th.join() for th in threads]

    assert not errs, errs
    assert sorted(versions) == list(range(1, n + 1))  # unique, gapless
    final = t.manifest()
    assert sorted(final["files"]) == [f"f{i}.parquet" for i in range(n)]
    # lineage intact: every snapshot's parent is the previous version
    for v in range(2, n + 1):
        assert t.manifest(v)["parent"] == v - 1


def test_concurrent_ledger_commits(tmp_path):
    """Two simultaneous ledger committers (disjoint bucket ranges):
    the commit lock serializes the read-modify-write, so the final
    ledger holds BOTH writers' bucket entries."""
    import os
    import threading

    from mehc_curation_spark.io.ledger import Ledger

    led = Ledger(str(tmp_path / "lc"))
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def commit(buckets):
        try:
            staging = led.staging_dir()
            for b in buckets:
                os.makedirs(os.path.join(staging, f"bucket={b}"))
            barrier.wait()
            led.commit_buckets(
                staging, {b: {"rows": 10, "kept": 5, "dropped": {}}
                          for b in buckets}, 1.0)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    a = threading.Thread(target=commit, args=([0, 1, 2],))
    b = threading.Thread(target=commit, args=([3, 4, 5],))
    a.start(); b.start(); a.join(); b.join()

    assert not errs, errs
    state = led.read()
    assert sorted(int(k) for k in state["buckets"]) == [0, 1, 2, 3, 4, 5]
    assert state["version"] == 2 and len(state["runs"]) == 2


def test_file_stats_skipping_and_incremental(spark, pairs_df, tmp_path):
    """Iceberg-analog manifest stats: a phash-range read must prune at
    the FILE level (footer min/max recorded at commit) and still return
    exactly the rows a full-scan filter would; incremental read returns
    only the files the newer snapshot added."""
    from pyspark.sql import functions as F

    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(str(tmp_path / "skip"))
    # two commits of phash-disjoint halves, each range-partitioned into
    # several files so min/max ranges are tight per file
    lo_half = pairs_df.filter(F.col("phash") < 0).repartitionByRange(4, "phash")
    hi_half = pairs_df.filter(F.col("phash") >= 0).repartitionByRange(4, "phash")
    v1 = t.write(lo_half, mode="append")
    v2 = t.write(hi_half, mode="append")
    assert (v1, v2) == (1, 2)
    assert t.manifest()["stats"], "no file stats recorded at commit"

    lo, hi = -(2**62), -1  # negative-phash range only
    sel, total = t.files_pruned(("phash", lo, hi))
    assert sel < total, (sel, total)

    got = t.read(spark, between=("phash", lo, hi))
    exp = t.read(spark).filter((F.col("phash") >= lo) & (F.col("phash") <= hi))
    assert got.count() == exp.count() > 0

    inc = t.read_incremental(spark, since_version=1)
    assert inc.count() == hi_half.count()
    assert inc.filter(F.col("phash") < 0).count() == 0


def test_stream_to_snapshot_table_exactly_once(spark, pairs_df, tmp_path):
    """foreachBatch streaming ingestion into the snapshot table: the
    stream's rows land exactly once (restart with the same checkpoint
    adds only NEW input), every micro-batch is a snapshot, and replayed
    batch ids are skipped idempotently."""
    import os

    from pyspark.sql import functions as F

    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.streaming.curate_stream import (
        run_stream_to_snapshot_table,
    )

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "tbl")
    a = pairs_df.filter(F.col("image_id") < "img_001000")
    b = pairs_df.filter(F.col("image_id") >= "img_001000")
    a.write.parquet(os.path.join(inp, "part_a"))

    q = run_stream_to_snapshot_table(spark, os.path.join(inp, "*"), table, ckpt)
    q.awaitTermination(120)
    t = SnapshotTable(table)
    n1 = t.read(spark).count()
    assert n1 == a.count()
    assert t.manifest()["properties"]["stream_batch_id"] == 0

    # restart with the same checkpoint: only the new file is processed
    b.write.parquet(os.path.join(inp, "part_b"))
    q2 = run_stream_to_snapshot_table(spark, os.path.join(inp, "*"), table, ckpt)
    q2.awaitTermination(120)
    assert t.read(spark).count() == a.count() + b.count()

    # idempotence: re-running with nothing new commits nothing
    v = t.current_version()
    q3 = run_stream_to_snapshot_table(spark, os.path.join(inp, "*"), table, ckpt)
    q3.awaitTermination(120)
    assert t.current_version() == v


def test_schema_evolution_add_column(spark, tmp_path):
    """Iceberg add-column analog: an append with an additive schema is
    accepted under allow_schema_evolution; old files read as NULL for
    the new column, time travel preserves the old schema, and a
    non-additive change (dropped column) still raises."""
    import pytest
    from pyspark.sql import functions as F

    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(str(tmp_path / "evo"))
    v1_df = spark.range(5).select(F.col("id").alias("image_id"),
                                  (F.col("id") * 10).alias("phash"))
    t.write(v1_df, mode="append")

    v2_df = v1_df.withColumn("quality", F.lit(0.9))
    with pytest.raises(ValueError):  # default: pinned schema
        t.write(v2_df, mode="append")
    v2 = t.write(v2_df, mode="append", allow_schema_evolution=True)
    assert v2 == 2

    cur = t.read(spark)
    assert "quality" in cur.columns
    assert cur.count() == 10
    assert cur.filter(F.col("quality").isNull()).count() == 5  # old files
    assert "quality" not in t.read(spark, version=1).columns

    # non-additive (column dropped) is rejected even with the flag
    with pytest.raises(ValueError):
        t.write(v1_df.select("image_id"), mode="append",
                allow_schema_evolution=True)


def test_compaction_and_orphan_cleanup(spark, tmp_path):
    """compact(): many-small-file table -> one overwrite snapshot with
    few right-sized files, identical rows, pre-compaction versions
    still time-travelable; remove_orphan_files() deletes only
    unreferenced leftovers."""
    import os

    from pyspark.sql import functions as F

    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(str(tmp_path / "cp"))
    # 6 appends x 4 files = 24 small files (streaming-ingestion shape)
    for i in range(6):
        t.write(spark.range(i * 100, (i + 1) * 100)
                .select(F.col("id").alias("image_id"),
                        (F.col("id") * 7).alias("phash"))
                .repartition(4), mode="append")
    pre = t.manifest()
    assert len(pre["files"]) == 24

    v = t.compact(spark, target_files=2)
    post = t.manifest()
    assert post["properties"]["compaction"] is True
    assert len(post["files"]) <= 2
    assert t.read(spark).count() == 600
    # time travel to the pre-compaction snapshot still works
    assert t.read(spark, version=v - 1).count() == 600
    assert len(t.manifest(v - 1)["files"]) == 24

    # plant an orphan (crashed writer's moved-but-uncommitted file):
    # a FRESH unreferenced file is spared by the default age guard
    # (it could be an in-flight writer racing the CAS)...
    orphan = os.path.join(t.data_dir, "deadbeef-orphan.parquet")
    open(orphan, "w").close()
    assert t.remove_orphan_files() == 0 and os.path.exists(orphan)
    # ...and swept once past the cutoff
    removed = t.remove_orphan_files(older_than_sec=0.0)
    assert removed == 1 and not os.path.exists(orphan)
    # nothing referenced was touched
    assert t.read(spark).count() == 600
    assert t.read(spark, version=v - 1).count() == 600


# ---------------------------------------------------------------------------
# refs: tags + rollback (Iceberg ref analog)
# ---------------------------------------------------------------------------

class TestTagsAndRollback:
    def test_tag_resolves_everywhere_manifest_does(self, spark, tbl):
        tbl.write(spark.range(5).toDF("id"))
        tbl.write(spark.range(5, 8).toDF("id"))
        assert tbl.tag("prod", 1) == 1
        assert tbl.tags() == {"prod": 1}
        # every manifest-routed read accepts the tag
        assert tbl.read(spark, version="prod").count() == 5
        assert tbl.manifest("prod")["version"] == 1
        pdf = tbl.snapshot_diff(spark, "prod", id_col="id").toPandas()
        assert set(pdf["_change_type"]) == {"insert"}
        assert set(pdf["id"]) == {5, 6, 7}

    def test_tag_default_current_and_retag_moves(self, spark, tbl):
        tbl.write(spark.range(3).toDF("id"))
        assert tbl.tag("latest") == 1
        tbl.write(spark.range(3, 5).toDF("id"))
        assert tbl.tag("latest") == 2  # re-tag moves the name
        assert tbl.tags() == {"latest": 2}
        tbl.drop_tag("latest")
        assert tbl.tags() == {}
        with pytest.raises(KeyError):
            tbl.drop_tag("latest")
        with pytest.raises(KeyError, match="no tag"):
            tbl.read(spark, version="latest")

    def test_tag_nonexistent_version_refused(self, spark, tbl):
        tbl.write(spark.range(3).toDF("id"))
        with pytest.raises(FileNotFoundError):
            tbl.tag("future", 99)

    def test_tagged_snapshot_survives_expire(self, spark, tbl):
        tbl.write(spark.range(3).toDF("id"))
        tbl.write(spark.range(3, 6).toDF("id"), mode="overwrite")
        tbl.write(spark.range(6, 9).toDF("id"), mode="overwrite")
        tbl.tag("audit", 1)
        tbl.expire_snapshots(keep_last=1)
        # v1 manifest + data retained by the tag; v2 expired
        assert tbl.read(spark, version="audit").count() == 3
        assert sorted(r["id"] for r in
                      tbl.read(spark, version="audit").collect()) == [0, 1, 2]
        with pytest.raises(FileNotFoundError):
            tbl.manifest(2)
        # dropping the tag releases v1 on the next expire
        tbl.drop_tag("audit")
        tbl.expire_snapshots(keep_last=1)
        with pytest.raises(FileNotFoundError):
            tbl.manifest(1)

    def test_rollback_restores_content_as_new_version(self, spark, tbl):
        tbl.write(spark.range(5).toDF("id"))
        tbl.write(spark.range(100, 103).toDF("id"), mode="overwrite")
        v = tbl.rollback(1)
        assert v == 3 and tbl.current_version() == 3
        assert sorted(r["id"] for r in tbl.read(spark).collect()) == \
            [0, 1, 2, 3, 4]
        assert tbl.manifest()["properties"]["rollback_of"] == 1
        # history preserved: v2 still readable
        assert tbl.read(spark, version=2).count() == 3
        # rollback accepts a tag
        tbl.tag("v2", 2)
        tbl.rollback("v2")
        assert sorted(r["id"] for r in tbl.read(spark).collect()) == \
            [100, 101, 102]

    def test_rollback_to_expired_snapshot_refused(self, spark, tbl):
        tbl.write(spark.range(3).toDF("id"))
        tbl.write(spark.range(5).toDF("id"), mode="overwrite")
        tbl.expire_snapshots(keep_last=1)
        with pytest.raises(FileNotFoundError, match="rollback"):
            tbl.rollback(1)


def test_corrupt_refs_json_refuses_instead_of_empty(spark, tbl):
    """A refs.json that exists but does not parse must RAISE — mapping
    it to {} would let expire delete tagged (legal-hold) snapshots and
    the next mutation would overwrite the evidence."""
    tbl.write(spark.range(3).toDF("id"))
    tbl.tag("hold", 1)
    with open(tbl._refs_path(), "w") as f:
        f.write('{"tags": {"hold": ')  # truncated
    with pytest.raises(ValueError, match="corrupt"):
        tbl.tags()
    with pytest.raises(ValueError, match="corrupt"):
        tbl.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="corrupt"):
        tbl.tag("other", 1)


def test_concurrent_tag_vs_expire_never_dangles(spark, tmp_path):
    """Race taggers against expirers: whatever interleaving happens,
    an accepted tag() must never end up pointing at a snapshot whose
    manifest an expire removed (the refs lock serializes tag
    validation with expire's retention decision; a tag that loses the
    race raises instead of dangling)."""
    import threading

    from mehc_curation_spark.io.catalog import SnapshotTable

    t = SnapshotTable(str(tmp_path / "race"))
    n_vers = 6
    for i in range(n_vers):
        t.write(spark.range(i * 10, i * 10 + 5).toDF("id"),
                mode="overwrite")

    accepted: list[tuple[str, int]] = []
    rejected: list[str] = []
    errs: list[Exception] = []
    barrier = threading.Barrier(5)

    def tagger(k):
        try:
            barrier.wait()
            for v in range(1, n_vers + 1):
                name = f"tag{k}_{v}"
                try:
                    accepted.append((name, t.tag(name, v)))
                except FileNotFoundError:
                    rejected.append(name)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    def expirer():
        try:
            barrier.wait()
            t.expire_snapshots(keep_last=1)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=tagger, args=(k,))
               for k in range(4)] + [threading.Thread(target=expirer)]
    [th.start() for th in threads]
    [th.join() for th in threads]

    assert not errs, errs
    # THE invariant: every accepted tag's manifest still exists
    tags = t.tags()
    for name, v in accepted:
        if name in tags:  # still present (nothing untags here)
            assert os.path.exists(t._manifest_path(tags[name])), \
                f"dangling tag {name} -> v{tags[name]}"
    # and tagged snapshots stay readable
    for name in list(tags):
        assert t.read(spark, version=name).count() == 5
