"""CLI surface tests (subprocess — the CLI owns its SparkSession):
per-step rejected-row exports (--get_output), mirroring the
reference's per-step invalid-rows CSVs
(/root/reference/mehc_curation/validation/core/output_manager.py:16-59).
"""

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pairs_file(tmp_path_factory):
    from mehc_curation_spark.fixtures import write_pairs_parquet

    return write_pairs_parquet(
        str(tmp_path_factory.mktemp("cli") / "pairs"), 2000, seed=7)


# fast-start JVMs for the subprocess CLI runs: these tests are wall-
# clock bound by ~40 cold Spark starts, not by the tiny jobs inside;
# C1-only JIT + no UI server cut each start by several seconds with
# identical results (the suite checks VALUES, never throughput)
_FAST_JVM = {
    "SPARK_GRAFT_EXTRA_CONF": json.dumps({
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.extraJavaOptions": "-XX:TieredStopAtLevel=1",
    }),
}


def _run(args):
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", *args],
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env={**os.environ, **_FAST_JVM})
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


def test_curate_get_output_matches_ledger(pairs_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "curate_out")
    _run(["curate", "-i", pairs_file, "-o", out, "--cores", "4",
          "--get_output"])

    rej_dir = os.path.join(out, "rejected")
    parts = sorted(d for d in os.listdir(rej_dir)
                   if d.startswith("drop_reason="))
    assert parts, "no per-reason partitions written"

    # per-reason counts must equal the ledger's dropped counters
    with open(os.path.join(out, "_ledger", "ledger.json")) as f:
        led = json.load(f)
    exp: dict[str, int] = {}
    for e in led["buckets"].values():
        for k, v in e["dropped"].items():
            exp[k] = exp.get(k, 0) + v
    got = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT drop_reason, COUNT(*) FROM "
            f"read_parquet('{rej_dir}/*/*.parquet', hive_partitioning=true) "
            f"GROUP BY drop_reason").fetchall()
    }
    assert got == exp


def test_validate_get_output_per_reason(pairs_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "val_out")
    proc = _run(["validate", "-i", pairs_file, "-o", out, "--cores", "4",
                 "--get_output"])
    fmt = json.loads(proc.stdout.strip().splitlines()[-1])

    rej_dir = os.path.join(out, "rejected")
    rows = duckdb.sql(
        f"SELECT drop_reason, COUNT(*) FROM "
        f"read_parquet('{rej_dir}/*/*.parquet', hive_partitioning=true) "
        f"GROUP BY drop_reason").fetchall()
    got = {r[0]: r[1] for r in rows}
    assert got, "no rejected rows exported"

    # every exported reason belongs to a validation-stage rule, and the
    # total equals the sum of the stage counters' invalid counts
    from mehc_curation_spark.rules.registry import RULES

    stage1_reasons = {r for rule in RULES if rule.stage == 1
                      for r in rule.drop_reasons}
    assert set(got) <= stage1_reasons, set(got) - stage1_reasons
    n_invalid = sum(step["invalid"] for step in fmt.values())
    assert sum(got.values()) == n_invalid


def test_table_maintenance_cli(pairs_file, tmp_path_factory):
    """table compact/expire/orphans/history over a curate output."""
    out = str(tmp_path_factory.mktemp("cli") / "tbl_out")
    _run(["curate", "-i", pairs_file, "-o", out, "--cores", "4"])

    hist = json.loads(_run(["table", "history", "-o", out])
                      .stdout.strip().splitlines()[-1])
    assert hist["current"] == 1 and hist["snapshots"][0]["files"] > 0

    # compact REFUSES on a ledger-managed curate table: its layout is
    # already one file per bucket and the resume ledger owns it
    # (compaction applies to snapshot-native tables, covered by
    # test_catalog.py::test_compaction_and_orphan_cleanup)
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark",
         "table", "compact", "-o", out, "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode != 0
    assert "ledger-managed" in (proc.stderr + proc.stdout)

    orph = json.loads(_run(["table", "orphans", "-o", out])
                      .stdout.strip().splitlines()[-1])
    assert orph["orphans_removed"] == 0  # nothing dangling

    exp = json.loads(_run(["table", "expire", "-o", out, "--keep_last", "1"])
                     .stdout.strip().splitlines()[-1])
    assert exp["files_removed"] == 0 and exp["current"] == 1


def test_table_row_ops_cli(tmp_path_factory):
    """table delete/takedown/update/merge: copy-on-write row-level
    changes driven through the CLI; final state checked by reading the
    manifest's CURRENT file list with duckdb."""
    base = tmp_path_factory.mktemp("cli_rowops")
    src_p = str(base / "rows.parquet")
    upd_p = str(base / "upsert.parquet")
    tbl = str(base / "t")
    duckdb.sql(
        "COPY (SELECT CAST(i AS BIGINT) AS id, 'cap_' || i AS caption "
        "FROM range(100) r(i)) TO '" + src_p + "' (FORMAT PARQUET)")
    duckdb.sql(
        "COPY (SELECT CAST(5 AS BIGINT) AS id, 'UPD' AS caption "
        "UNION ALL SELECT 900, 'NEW') TO '" + upd_p + "' (FORMAT PARQUET)")
    ids_file = str(base / "takedown.txt")
    with open(ids_file, "w") as f:
        f.write("7\n8\n")
    boot = (
        "from mehc_curation_spark.session import get_spark\n"
        "from mehc_curation_spark.io.catalog import SnapshotTable\n"
        f"s = get_spark('boot', cores=4)\n"
        f"SnapshotTable({tbl!r}).write(s.read.parquet({src_p!r}))\n")
    proc = subprocess.run([sys.executable, "-c", boot], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]

    def current_rows():
        with open(sorted(
                (os.path.join(tbl, "_snapshots", f)
                 for f in os.listdir(os.path.join(tbl, "_snapshots"))
                 if f.endswith(".json")))[-1]) as f:
            m = json.load(f)
        files = [os.path.join(tbl, "data", rf) for rf in m["files"]]
        lst = "[" + ",".join(f"'{p}'" for p in files) + "]"
        return {r[0]: r[1] for r in duckdb.sql(
            f"SELECT id, caption FROM read_parquet({lst})").fetchall()}

    out = json.loads(_run(["table", "delete", "-o", tbl, "--cores", "4",
                           "--where", "id % 10 = 9"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True
    rows = current_rows()
    assert len(rows) == 90 and 9 not in rows

    out = json.loads(_run(["table", "takedown", "-o", tbl, "--cores", "4",
                           "--ids", ids_file, "--id_col", "id"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True
    rows = current_rows()
    assert len(rows) == 88 and 7 not in rows and 8 not in rows

    out = json.loads(_run(["table", "update", "-o", tbl, "--cores", "4",
                           "--where", "id < 2",
                           "--set", "caption=upper(caption)"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True
    rows = current_rows()
    assert rows[0] == "CAP_0" and rows[1] == "CAP_1" and rows[2] == "cap_2"

    out = json.loads(_run(["table", "merge", "-o", tbl, "--cores", "4",
                           "--source", upd_p, "--key", "id"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True
    rows = current_rows()
    assert rows[5] == "UPD" and rows[900] == "NEW" and len(rows) == 89

    # a _state sidecar dir must NOT reroute row actions into the
    # incremental-compaction intercept (only `compact` reroutes) — a
    # takedown that silently compacts instead is a legal-hold failure
    os.makedirs(os.path.join(tbl, "_state"), exist_ok=True)
    out = json.loads(_run(["table", "delete", "-o", tbl, "--cores", "4",
                           "--where", "id = 2"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True
    rows = current_rows()
    assert 2 not in rows and len(rows) == 88


def test_table_mor_delete_cli(tmp_path_factory):
    """table delete --mor + apply_deletes: the merge-on-read takedown
    round-trip through the CLI — delete records keys without touching
    data files, apply_deletes settles the debt physically."""
    base = tmp_path_factory.mktemp("cli_mor")
    src_p = str(base / "rows.parquet")
    tbl = str(base / "t")
    duckdb.sql(
        "COPY (SELECT 'img' || i AS image_id, 'cap_' || i AS caption, "
        "CAST(i % 5 AS BIGINT) AS phash FROM range(60) r(i)) "
        "TO '" + src_p + "' (FORMAT PARQUET)")
    boot = (
        "from mehc_curation_spark.session import get_spark\n"
        "from mehc_curation_spark.io.catalog import SnapshotTable\n"
        "s = get_spark('boot', cores=4)\n"
        f"SnapshotTable({tbl!r}).write(s.read.parquet({src_p!r}))\n")
    proc = subprocess.run([sys.executable, "-c", boot], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]

    def manifest():
        with open(sorted(
                (os.path.join(tbl, "_snapshots", f)
                 for f in os.listdir(os.path.join(tbl, "_snapshots"))
                 if f.endswith(".json")))[-1]) as f:
            return json.load(f)

    files_before = set(manifest()["files"])
    out = json.loads(_run(["table", "delete", "-o", tbl, "--cores", "4",
                           "--where", "phash = 3", "--mor"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True and out["pending_delete_files"] == 1
    m = manifest()
    assert set(m["files"]) == files_before  # no data rewrite
    assert m["deletes"][0]["cols"] == ["image_id"]

    out = json.loads(_run(["table", "apply_deletes", "-o", tbl,
                           "--cores", "4"])
                     .stdout.strip().splitlines()[-1])
    assert out["changed"] is True and out["settled_delete_files"] == 1
    m = manifest()
    assert not m.get("deletes")
    files = [os.path.join(tbl, "data", rf) for rf in m["files"]]
    lst = "[" + ",".join(f"'{p}'" for p in files) + "]"
    n3, n = duckdb.sql(
        f"SELECT count(*) FILTER (phash = 3), count(*) "
        f"FROM read_parquet({lst})").fetchone()
    assert n3 == 0 and n == 48  # 60 - 12 (i%5==3)

    # --mor with takedown must refuse, not silently ignore
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "table", "takedown",
         "-o", tbl, "--ids", "img1", "--mor", "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode != 0 and "--mor" in proc.stderr


def test_crossdedup_cli_text_and_embedding(tmp_path_factory):
    """crossdedup subcommand: decontaminate candidates vs a reference
    corpus via both engines (text MinHash bands, embedding LSH kNN).
    Counts in the printed JSON must reconcile with the written data."""
    base = tmp_path_factory.mktemp("cli_xd")
    cand_p = str(base / "cand.parquet")
    ref_p = str(base / "ref.parquet")
    # deterministic split of the shared docs corpus: odd ids are the
    # candidates, even ids the reference; exact dups across the split
    # don't exist, but near-dups do (fixture mutation pairs)
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id % 2 = 1) TO '{cand_p}' (FORMAT PARQUET)")
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id % 2 = 0) TO '{ref_p}' (FORMAT PARQUET)")

    out = str(base / "out_text")
    res = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", ref_p, "-o", out,
         "--mode", "text", "--threshold", "0.3", "--drop",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["mode"] == "text"
    assert res["candidates"] == 250
    assert res["kept"] == res["candidates"] - res["flagged"]
    kept_rows = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet')"
    ).fetchone()[0]
    assert kept_rows == res["kept"]
    # every flagged candidate id appears in matches; none in data/
    overlap = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet') d "
        f"JOIN read_parquet('{out}/matches/*.parquet') m "
        f"ON d.doc_id = m.cand_id").fetchone()[0]
    assert overlap == 0

    out_e = str(base / "out_emb")
    cand_e = str(base / "cand_e.parquet")
    ref_e = str(base / "ref_e.parquet")
    duckdb.sql(
        "COPY (SELECT vec_id, embedding FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
        f"WHERE vec_id % 2 = 1) TO '{cand_e}' (FORMAT PARQUET)")
    duckdb.sql(
        "COPY (SELECT vec_id, embedding FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
        f"WHERE vec_id % 2 = 0) TO '{ref_e}' (FORMAT PARQUET)")
    res_e = json.loads(_run(
        ["crossdedup", "-i", cand_e, "-r", ref_e, "-o", out_e,
         "--mode", "embedding", "--threshold", "0.8",
         "--id_col", "vec_id", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    assert res_e["mode"] == "embedding"
    assert res_e["kept"] + res_e["flagged"] == res_e["candidates"]
    # soundness: every reported pair truly clears the threshold
    bad = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out_e}/matches/*.parquet') "
        "WHERE cos < 0.8").fetchone()[0]
    assert bad == 0


def test_curate_incremental_cli(tmp_path_factory):
    """--incremental: two chunks through the CLI must land the same
    rows-per-reason totals as one batch CLI run over the union."""
    import pyarrow.parquet as pq

    from mehc_curation_spark.fixtures import write_pairs_parquet

    base = tmp_path_factory.mktemp("cli_inc")
    full = pq.read_table(write_pairs_parquet(str(base), 2000, seed=7))
    for i in range(2):
        pq.write_table(full.take(list(range(i, full.num_rows, 2))),
                       str(base / f"inc{i}.parquet"))

    # settle_deletes_after=1: every MoR flip commit settles inline, so
    # the raw-glob reads below stay valid (no masked copies / delete
    # key files on disk) while still driving the default MoR path +
    # the bucket-aware settle through the real CLI
    out = str(base / "out")
    m0 = json.loads(_run(["curate", "-i", str(base / "inc0.parquet"),
                          "-o", out, "--incremental", "--cores", "4",
                          "--settle_deletes_after", "1"])
                    .stdout.strip().splitlines()[-1])
    m1 = json.loads(_run(["curate", "-i", str(base / "inc1.parquet"),
                          "-o", out, "--incremental", "--cores", "4",
                          "--settle_deletes_after", "1"])
                    .stdout.strip().splitlines()[-1])
    assert m0["rows_new"] + m1["rows_new"] == 2000
    assert m1["relabeled_old"] > 0  # interleaved split must retract
    assert m1["flip_mode"] == "mor"
    assert m1["delete_entries_pending"] == 0  # settled inline

    out_b = str(base / "out_batch")
    pq.write_table(full, str(base / "full.parquet"))
    _run(["curate", "-i", str(base / "full.parquet"), "-o", out_b,
          "--cores", "4"])

    def reason_totals(path):
        rows = duckdb.sql(
            f"SELECT coalesce(drop_reason,'#'), COUNT(*) FROM "
            f"read_parquet('{path}/data/*/*.parquet') GROUP BY 1"
        ).fetchall()
        return dict(rows)

    assert reason_totals(out) == reason_totals(out_b)

    # table compact routes incremental tables to the bucket-aware
    # compactor (labels + state) instead of refusing
    res = json.loads(_run(["table", "compact", "-o", out, "--cores", "4"])
                     .stdout.strip().splitlines()[-1])
    assert res["labels"]["files_after"] <= res["labels"]["files_before"]
    assert reason_totals(out) == reason_totals(out_b)


def test_qscore_cli(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_qs")
    out = str(base / "out")
    res = json.loads(_run(
        ["qscore", "-i", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--train", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    assert res["rows"] == 500 and res["trained"] is True
    assert 0 < res["kept"] < res["rows"]
    with open(os.path.join(out, "model.json")) as f:
        coef = json.load(f)
    assert "intercept" in coef and coef["len_band"] < 0
    n_scored = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/scores/*.parquet') "
        "WHERE q_score BETWEEN 0 AND 1").fetchone()[0]
    assert n_scored == 500


def test_phash_cli_dihedral(pairs_file, tmp_path_factory):
    """phash subcommand: summary reconciles with the written parquet;
    dihedral canonicalization never increases the distinct-hash count
    vs plain (orbit members merge, nothing splits)."""
    base = tmp_path_factory.mktemp("cli_ph")
    plain = json.loads(_run(
        ["phash", "-i", pairs_file, "-o", str(base / "plain"),
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    dih = json.loads(_run(
        ["phash", "-i", pairs_file, "-o", str(base / "dih"),
         "--invariance", "dihedral", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    assert plain["rows"] == dih["rows"] == 2000
    assert plain["decoded"] == dih["decoded"]
    assert 0 < plain["failed"] < 100
    assert dih["distinct_hashes"] <= plain["distinct_hashes"]
    n, n_null = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN phash_computed IS NULL "
        f"THEN 1 ELSE 0 END) FROM "
        f"read_parquet('{base}/dih/hashes/*.parquet')").fetchone()
    assert n == 2000 and n_null == dih["failed"]


def test_clusters_cli_text_and_phash(tmp_path_factory, pairs_file):
    """clusters subcommand: near-dup pairs resolved to connected
    components, one representative per cluster, keep_reps output
    reconciling with the JSON counts."""
    base = tmp_path_factory.mktemp("cli_cl")

    out = str(base / "out_text")
    res = json.loads(_run(
        ["clusters", "-i", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--mode", "text", "--threshold", "0.5",
         "--quality_col", "n_chars", "--keep_reps", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert res["mode"] == "text"
    assert res["rows"] == 500
    assert res["dropped_non_reps"] == res["rows"] - res["clusters"]
    assert 0 < res["clusters"] < res["rows"]
    kept = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet')"
    ).fetchone()[0]
    assert kept == res["clusters"]
    # exactly one representative per cluster
    bad = duckdb.sql(
        f"SELECT COUNT(*) FROM (SELECT cluster, "
        f"SUM(CASE WHEN is_rep THEN 1 ELSE 0 END) n "
        f"FROM read_parquet('{out}/clusters/*.parquet') "
        f"GROUP BY cluster) WHERE n <> 1").fetchone()[0]
    assert bad == 0

    out_p = str(base / "out_phash")
    res_p = json.loads(_run(
        ["clusters", "-i", pairs_file, "-o", out_p, "--mode", "phash",
         "--max_hamming", "4", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert res_p["rows"] == 2000
    assert 0 < res_p["clusters"] < 2000


def test_semdedup_cli(tmp_path_factory):
    """semdedup subcommand: labels cover every row, JSON counts
    reconcile with both written outputs, --drop keeps keep=true only."""
    base = tmp_path_factory.mktemp("cli_sd")
    out = str(base / "out")
    res = json.loads(_run(
        ["semdedup", "-i", "/root/testdata/sf0.001/embeddings.parquet",
         "-o", out, "--threshold", "0.4", "--n_cells", "8", "--drop",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["rows"] == 500
    assert res["kept"] + res["dropped"] == 500
    assert 0 < res["dropped"] < 500  # the fixture plants near-dups
    n_lab, n_kept = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN keep THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{out}/labels/*.parquet')").fetchone()
    assert n_lab == 500 and n_kept == res["kept"]
    n_data = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet')"
    ).fetchone()[0]
    assert n_data == res["kept"]


def test_chunk_cli_plain_and_packed(tmp_path_factory):
    """chunk subcommand: JSON counts reconcile with written parquet in
    both modes; packed output partitions by shard and never overfills."""
    base = tmp_path_factory.mktemp("cli_ck")
    out = str(base / "out")
    res = json.loads(_run(
        ["chunk", "-i", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--chunk_tokens", "64", "--overlap", "16",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    n, tok = duckdb.sql(
        f"SELECT COUNT(*), SUM(n_tok) FROM "
        f"read_parquet('{out}/data/*.parquet')").fetchone()
    assert res["chunks"] == n and res["tokens"] == tok
    assert res["packed"] is False

    out_p = str(base / "out_packed")
    res_p = json.loads(_run(
        ["chunk", "-i", "/root/testdata/sf0.001/documents.parquet",
         "-o", out_p, "--chunk_tokens", "64", "--overlap", "16",
         "--pack", "--seq_tokens", "128", "--shard_bits", "3",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res_p["chunks"] == res["chunks"]  # packing loses nothing
    assert 0.5 <= res_p["fill_rate"] <= 1.0
    over = duckdb.sql(
        f"SELECT COUNT(*) FROM (SELECT shard, seq_id, SUM(n_tok) t, "
        f"MAX(oversize::INT) ov FROM "
        f"read_parquet('{out_p}/data/**/*.parquet', hive_partitioning=1) "
        f"GROUP BY shard, seq_id) WHERE t > 128 AND ov = 0").fetchone()[0]
    assert over == 0


def test_card_cli_reconciles_with_sql(tmp_path_factory):
    """card subcommand: every count in the card must reproduce in SQL
    over the same parquet (exact-dup mode for exact reconciliation)."""
    base = tmp_path_factory.mktemp("cli_card")
    out = str(base / "out")
    res = json.loads(_run(
        ["card", "-i", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--exact", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    src = "/root/testdata/sf0.001/documents.parquet"
    rows, nulls, chars = duckdb.sql(
        f"SELECT COUNT(*), SUM((text IS NULL)::INT), "
        f"SUM(LENGTH(text)) FROM read_parquet('{src}')").fetchone()
    assert res["rows"] == rows and res["null_text"] == nulls
    assert res["chars"] == chars
    toks = duckdb.sql(
        f"SELECT SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE "
        f"LEN(regexp_split_to_array(TRIM(text), '[ \t\n\r]+')) END) "
        f"FROM read_parquet('{src}')").fetchone()[0]
    assert res["tokens"] == toks
    nfp = duckdb.sql(
        "SELECT COUNT(DISTINCT substr(md5(regexp_replace(LOWER("
        f"TRIM(text)), '[ \t\n\r]+', ' ', 'g')), 1, 16)) "
        f"FROM read_parquet('{src}') WHERE text IS NOT NULL").fetchone()[0]
    # NULL text rows fingerprint to NULL (not counted by count_distinct)
    assert res["distinct_fingerprints"] == nfp
    assert sum(e["rows"] for e in res["languages"]) == rows
    with open(os.path.join(out, "card.txt")) as f:
        txt = f.read()
    assert "DATASET CARD" in txt and f"{rows:,}" in txt


def test_spark_submit_pyfiles_end_to_end(pairs_file, tmp_path_factory):
    """The cluster-ship path the north rule names: build the --py-files
    zip, run spark-submit from a CLEAN working directory (only the zip
    provides the package), and require exact label parity with the
    pandas oracle."""
    import shutil

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                "bin", "spark-submit")
    if not os.path.exists(spark_submit):  # pragma: no cover
        pytest.skip("no spark-submit launcher in this pyspark install")
    base = tmp_path_factory.mktemp("cli_submit")
    zip_path = str(base / "pkg.zip")
    _run(["package", "-o", zip_path])
    assert os.path.getsize(zip_path) > 10_000
    # clean cwd: copy ONLY the driver script next to nothing else
    shutil.copy(os.path.join(REPO, "submit_curate.py"),
                str(base / "submit_curate.py"))
    out = str(base / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "submit_curate.py", "curate", "-i", pairs_file, "-o", out],
        cwd=str(base), capture_output=True, text=True, timeout=600,
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]

    from mehc_curation_spark.fixtures import make_pairs_pdf
    from mehc_curation_spark.oracle import curate_oracle

    got = duckdb.sql(
        f"SELECT * FROM read_parquet('{out}/**/*.parquet')").df() \
        .sort_values("image_id").reset_index(drop=True)
    exp = curate_oracle(make_pairs_pdf(2000, seed=7)) \
        .sort_values("image_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["keep"] == exp["keep"]).all()
    assert (got["caption_scrubbed"].fillna("#")
            == exp["caption_scrubbed"].fillna("#")).all()


def test_crossdedup_cli_exact_bloom(tmp_path_factory):
    """crossdedup --mode exact: Bloom-prefiltered exact text match.
    Plants 5 exact cross-corpus duplicates and checks every one is
    flagged (no false negatives) with counts reconciling."""
    base = tmp_path_factory.mktemp("cli_xd_exact")
    cand_p = str(base / "cand.parquet")
    ref_p = str(base / "ref.parquet")
    docs = "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM {docs} WHERE doc_id % 2 = 0) "
        f"TO '{ref_p}' (FORMAT PARQUET)")
    # candidates = odd ids, plus 5 rows copied verbatim from the
    # reference under fresh ids -> exactly these must be flagged
    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM {docs} WHERE doc_id % 2 = 1 "
        f"      AND text NOT IN (SELECT text FROM {docs} "
        f"                       WHERE doc_id % 2 = 0) "
        f"UNION ALL "
        f"SELECT * FROM (SELECT doc_id + 100000 AS doc_id, text "
        f"               FROM {docs} WHERE doc_id % 2 = 0 "
        f"               ORDER BY doc_id LIMIT 5)) "
        f"TO '{cand_p}' (FORMAT PARQUET)")
    planted = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{cand_p}') "
        f"WHERE doc_id >= 100000").fetchone()[0]
    assert planted > 0

    out = str(base / "out_exact")
    res = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", ref_p, "-o", out,
         "--mode", "exact", "--drop", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert res["mode"] == "exact"
    assert res["flagged"] == planted
    flagged = duckdb.sql(
        f"SELECT DISTINCT cand_id FROM "
        f"read_parquet('{out}/matches/*.parquet')").fetchall()
    assert all(c[0] >= 100000 for c in flagged)
    kept_rows = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet')"
    ).fetchone()[0]
    assert kept_rows == res["kept"]


def test_export_cli_shards(pairs_file, tmp_path_factory):
    """export subcommand: JSON layout reconciles with the on-disk
    manifest and the shard dirs; shards are hash-balanced."""
    out = str(tmp_path_factory.mktemp("cli_ex") / "shards")
    res = json.loads(_run(
        ["export", "-i", pairs_file, "-o", out, "--n_shards", "6",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["n_shards"] == 6 and res["rows"] == 2000
    import glob as _glob
    import os as _os
    dirs = sorted(_glob.glob(_os.path.join(out, "shard=*")))
    assert len(dirs) == 6
    with open(_os.path.join(out, "_manifest.json")) as f:
        disk = json.load(f)
    assert disk["rows"] == 2000 and len(disk["shards"]) == 6
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/shard=*/*.parquet')"
    ).fetchone()[0]
    assert n == 2000


def test_curate_cli_csv_input(tmp_path_factory):
    """curate --input_format csv produces the same ledger totals as
    the parquet run over the identical corpus."""
    from mehc_curation_spark.fixtures import (
        make_pairs_pdf,
        write_pairs_parquet,
    )
    from mehc_curation_spark.io.ingest import write_pairs_csv

    base = tmp_path_factory.mktemp("cli_csv")
    pq = write_pairs_parquet(str(base / "pq"), 1000, seed=13)
    csv_p = write_pairs_csv(make_pairs_pdf(1000, seed=13),
                            str(base / "pairs.csv"))
    m_pq = json.loads(_run(
        ["curate", "-i", pq, "-o", str(base / "out_pq"), "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    m_csv = json.loads(_run(
        ["curate", "-i", csv_p, "-o", str(base / "out_csv"),
         "--input_format", "csv", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    drop = ("elapsed_sec", "rows_per_sec")
    assert {k: v for k, v in m_csv.items() if k not in drop} == \
           {k: v for k, v in m_pq.items() if k not in drop}


def test_curate_cli_wds_input(tmp_path_factory):
    """curate --input_format wds (a WebDataset tar-shard directory)
    produces the same ledger totals as the parquet run over the
    identical corpus — the export -> re-ingest -> curate loop."""
    from pyspark.sql import SparkSession

    from mehc_curation_spark.fixtures import write_pairs_parquet
    from mehc_curation_spark.io.export import export_webdataset

    base = tmp_path_factory.mktemp("cli_wds_in")
    pq = write_pairs_parquet(str(base / "pq"), 1000, seed=13)
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    export_webdataset(spark.read.parquet(pq), str(base / "tars"),
                      n_shards=3, seed=0)
    m_pq = json.loads(_run(
        ["curate", "-i", pq, "-o", str(base / "out_pq"), "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    m_wds = json.loads(_run(
        ["curate", "-i", str(base / "tars"), "-o", str(base / "out_wds"),
         "--input_format", "wds", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    drop = ("elapsed_sec", "rows_per_sec")
    assert {k: v for k, v in m_wds.items() if k not in drop} == \
           {k: v for k, v in m_pq.items() if k not in drop}


def test_export_cli_wds(pairs_file, tmp_path_factory):
    """export --format wds writes tar shards whose manifest totals
    reconcile with the JSON summary."""
    out = str(tmp_path_factory.mktemp("cli_wds") / "wds")
    res = json.loads(_run(
        ["export", "-i", pairs_file, "-o", out, "--n_shards", "3",
         "--format", "wds", "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["format"] == "webdataset-tar-v1"
    assert res["n_shards"] == 3 and res["rows"] == 2000
    import glob as _glob
    import os as _os
    tars = sorted(_glob.glob(_os.path.join(out, "shard-*.tar")))
    assert len(tars) == 3
    with open(_os.path.join(out, "_manifest.json")) as f:
        disk = json.load(f)
    assert sum(s["rows"] for s in disk["shards"]) == 2000


def test_export_cli_verify_and_resume(pairs_file, tmp_path_factory):
    """export --verify detects a truncated shard; --resume repairs it."""
    out = str(tmp_path_factory.mktemp("cli_vr") / "wds")
    _run(["export", "-i", pairs_file, "-o", out, "--n_shards", "2",
          "--format", "wds", "--cores", "4"])
    v = json.loads(_run(
        ["export", "-i", pairs_file, "-o", out, "--format", "wds",
         "--verify", "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert v["ok"]
    with open(os.path.join(out, "shard-00000.tar"), "r+b") as f:
        f.truncate(10)
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "export",
         "-i", pairs_file, "-o", out, "--format", "wds", "--verify",
         "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 3
    assert json.loads(proc.stdout.strip().splitlines()[-1])[
        "mismatched"] == [0]
    res = json.loads(_run(
        ["export", "-i", pairs_file, "-o", out, "--format", "wds",
         "--resume", "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["n_shards"] == 2
    v2 = json.loads(_run(
        ["export", "-i", pairs_file, "-o", out, "--format", "wds",
         "--verify", "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert v2["ok"]


def test_optout_cli_drop_and_label(tmp_path_factory):
    """optout subcommand: parent-domain coverage, substring traps
    survive, JSON summary reconciles with the written parquet."""
    base = tmp_path_factory.mktemp("cli_optout")
    src = str(base / "docs.parquet")
    lst = str(base / "optout.txt")
    duckdb.sql(
        "COPY (SELECT CAST(i AS BIGINT) AS doc_id, "
        "CASE WHEN i % 3 = 0 THEN 'https://a.optedout.com/p' || i "
        "     WHEN i % 3 = 1 THEN 'https://notoptedout.com/p' || i "
        "     ELSE 'https://clean.org/p' || i END AS url "
        "FROM range(90) r(i)) TO '" + src + "' (FORMAT PARQUET)")
    with open(lst, "w") as f:
        f.write("optedout.com\n\n")

    out1 = str(base / "dropped")
    proc = _run(["optout", "-i", src, "-o", out1, "--list", lst,
                 "--cores", "4"])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary == {"rows_in": 90, "rows_out": 60,
                       "list_entries": 1, "mode": "drop",
                       "dropped": 30}
    kept = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out1}/data/*.parquet') "
        "WHERE url LIKE '%optedout.com%' "
        "AND url NOT LIKE '%notoptedout%'").fetchone()[0]
    assert kept == 0

    out2 = str(base / "labeled")
    proc = _run(["optout", "-i", src, "-o", out2, "--list", lst,
                 "--label", "--cores", "4"])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "label" and summary["opted_out"] == 30
    assert summary["rows_out"] == 90


def test_tokenize_cli_unigram_and_model_reuse(tmp_path_factory):
    """tokenize subcommand: unigram train+encode writes model.json +
    tokens parquet; re-encoding with --model reproduces identical
    token counts (the model round-trips through JSON)."""
    base = tmp_path_factory.mktemp("cli_tok")
    src = str(base / "docs.parquet")
    duckdb.sql(
        "COPY (SELECT CAST(i AS BIGINT) AS doc_id, "
        "'the quick brown fox ' || (i % 7) || ' jumps over the dog' "
        "AS text FROM range(300) r(i)) TO '" + src
        + "' (FORMAT PARQUET)")

    out1 = str(base / "trained")
    s1 = json.loads(_run(["tokenize", "-i", src, "-o", out1,
                          "--algo", "unigram", "--vocab_size", "40",
                          "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert s1["algo"] == "unigram" and s1["rows"] == 300
    assert s1["model_size"] <= 40 and s1["total_tokens"] > 0
    assert os.path.exists(os.path.join(out1, "model.json"))

    out2 = str(base / "reused")
    s2 = json.loads(_run(["tokenize", "-i", src, "-o", out2,
                          "--algo", "unigram",
                          "--model", os.path.join(out1, "model.json"),
                          "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert s2["total_tokens"] == s1["total_tokens"]

    # algo mismatch against a saved model refuses
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "tokenize",
         "-i", src, "-o", str(base / "x"), "--algo", "bpe",
         "--model", os.path.join(out1, "model.json"), "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode != 0
    assert "unigram model" in (proc.stderr + proc.stdout)


def test_crossdedup_cli_image_tiles(pairs_file, tmp_path_factory):
    """crossdedup --mode image: per-tile phash decontamination over
    pairs-shaped payload parquet. Odd/even image_id split of the
    fixture corpus; planted variant groups straddle the split, so
    matches must be found. JSON counts reconcile with the data."""
    base = tmp_path_factory.mktemp("cli_xd_img")
    cand_p = str(base / "cand.parquet")
    ref_p = str(base / "ref.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{pairs_file}') "
        "WHERE substr(md5(image_id), 1, 1) < '8') "
        f"TO '{cand_p}' (FORMAT PARQUET)")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{pairs_file}') "
        "WHERE substr(md5(image_id), 1, 1) >= '8') "
        f"TO '{ref_p}' (FORMAT PARQUET)")
    n_cand = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{cand_p}')").fetchone()[0]
    out = str(base / "out_img")
    res = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", ref_p, "-o", out,
         "--mode", "image", "--id_col", "image_id", "--drop",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["mode"] == "image" and res["threshold"] == 6.0
    assert res["candidates"] == n_cand
    assert 0 < res["flagged"] < res["candidates"]
    assert res["kept"] == res["candidates"] - res["flagged"]
    kept_rows = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/data/*.parquet')"
    ).fetchone()[0]
    assert kept_rows == res["kept"]
    n_match_min = duckdb.sql(
        f"SELECT MIN(n_match) FROM read_parquet('{out}/matches/*.parquet')"
    ).fetchone()[0]
    assert n_match_min >= 6


def test_clusters_cli_tiles(pairs_file, tmp_path_factory):
    """clusters --mode tiles: partial-image near-dup pairs resolved to
    connected components with one representative each."""
    out = str(tmp_path_factory.mktemp("cli_cl_tiles") / "out")
    res = json.loads(_run(
        ["clusters", "-i", pairs_file, "-o", out, "--mode", "tiles",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["mode"] == "tiles" and res["threshold"] == 6.0
    assert res["rows"] > res["clusters"] > 0
    # exactly one representative per cluster
    reps = duckdb.sql(
        f"SELECT COUNT(*) FILTER (is_rep), COUNT(DISTINCT cluster) "
        f"FROM read_parquet('{out}/clusters/*.parquet')").fetchone()
    assert reps[0] == reps[1] == res["clusters"]


def test_tile_threshold_and_id_col_validation(pairs_file, tmp_path_factory):
    """Tile modes must REFUSE a similarity-style fractional threshold
    (int(0.9)=0 would pair everything) and fail fast on a wrong id
    column instead of an opaque AnalysisException."""
    out = str(tmp_path_factory.mktemp("cli_val") / "o")
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "clusters",
         "-i", pairs_file, "-o", out, "--mode", "tiles",
         "--threshold", "0.9", "--cores", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "matching-tile COUNT" in (proc.stderr + proc.stdout)
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "crossdedup",
         "-i", pairs_file, "-r", pairs_file, "-o", out,
         "--mode", "image", "--id_col", "nope", "--cores", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "not found" in (proc.stderr + proc.stdout)


def test_tileindex_cli_and_index_crossdedup(pairs_file, tmp_path_factory):
    """tileindex builds a signature snapshot table; crossdedup
    --reference_is_index must produce the same matches as direct
    image mode over the same split, without re-decoding the ref."""
    base = tmp_path_factory.mktemp("cli_tidx")
    cand_p = str(base / "cand.parquet")
    ref_p = str(base / "ref.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{pairs_file}') "
        "WHERE substr(md5(image_id), 1, 1) < '8') "
        f"TO '{cand_p}' (FORMAT PARQUET)")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{pairs_file}') "
        "WHERE substr(md5(image_id), 1, 1) >= '8') "
        f"TO '{ref_p}' (FORMAT PARQUET)")
    idx = str(base / "idx")
    res = json.loads(_run(
        ["tileindex", "-i", ref_p, "-o", idx, "--cores", "4"])
        .stdout.strip().splitlines()[-1])
    assert res["version"] == 1 and res["grid"] == 4
    assert res["n_tiles"] >= res["n_images"] > 0

    out_d = str(base / "direct")
    direct = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", ref_p, "-o", out_d,
         "--mode", "image", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    out_i = str(base / "via_idx")
    via = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", idx, "-o", out_i,
         "--mode", "image", "--reference_is_index", "--cores", "4"])
        .stdout.strip().splitlines()[-1])
    assert via["flagged"] == direct["flagged"] > 0
    pairs_eq = duckdb.sql(
        f"SELECT (SELECT COUNT(*) FROM read_parquet('{out_d}/matches/*.parquet') a "
        f" JOIN read_parquet('{out_i}/matches/*.parquet') b "
        f" USING (cand_id, ref_id, n_match)) = "
        f"(SELECT COUNT(*) FROM read_parquet('{out_d}/matches/*.parquet'))"
    ).fetchone()[0]
    assert pairs_eq


def test_textindex_cli_and_index_crossdedup(tmp_path_factory):
    """textindex + crossdedup --mode text --reference_is_index must
    reproduce the direct text mode's matches over the same split."""
    base = tmp_path_factory.mktemp("cli_txidx")
    cand_p = str(base / "cand.parquet")
    ref_p = str(base / "ref.parquet")
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id % 2 = 1) TO '{cand_p}' (FORMAT PARQUET)")
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id % 2 = 0) TO '{ref_p}' (FORMAT PARQUET)")
    idx = str(base / "idx")
    res = json.loads(_run(
        ["textindex", "-i", ref_p, "-o", idx, "--cores", "4"])
        .stdout.strip().splitlines()[-1])
    assert res["version"] == 1 and res["n_docs"] == 250

    out_d = str(base / "direct")
    direct = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", ref_p, "-o", out_d,
         "--mode", "text", "--threshold", "0.3", "--cores", "4"])
        .stdout.strip().splitlines()[-1])
    out_i = str(base / "via_idx")
    via = json.loads(_run(
        ["crossdedup", "-i", cand_p, "-r", idx, "-o", out_i,
         "--mode", "text", "--threshold", "0.3",
         "--reference_is_index", "--cores", "4"])
        .stdout.strip().splitlines()[-1])
    assert via["flagged"] == direct["flagged"] > 0
    same = duckdb.sql(
        f"SELECT (SELECT COUNT(*) FROM read_parquet('{out_d}/matches/*.parquet') a "
        f" JOIN read_parquet('{out_i}/matches/*.parquet') b "
        f" USING (cand_id, ref_id, jaccard)) = "
        f"(SELECT COUNT(*) FROM read_parquet('{out_d}/matches/*.parquet'))"
    ).fetchone()[0]
    assert same


def test_skew_cli_census_and_join(tmp_path_factory):
    """skew subcommand: one-table hot-key census and two-table join
    fan-out, one JSON line per reported key."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    out = _run(["skew", "-i", docs, "--key", "source",
                "--top_k", "3", "--cores", "2"]).stdout
    rows = [json.loads(x) for x in out.strip().splitlines()
            if x.startswith("{")]
    assert len(rows) == 3
    assert rows[0]["n"] >= rows[-1]["n"]
    assert all(r["suggested_salt"] >= 1 for r in rows)
    exp = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{docs}') GROUP BY source "
        f"ORDER BY 1 DESC LIMIT 1").fetchone()[0]
    assert rows[0]["n"] == exp

    out = _run(["skew", "-i", docs, "--key", "source", "--join", docs,
                "--top_k", "2", "--cores", "2"]).stdout
    rows = [json.loads(x) for x in out.strip().splitlines()
            if x.startswith("{")]
    assert len(rows) == 2
    assert rows[0]["est_rows"] == rows[0]["n_left"] * rows[0]["n_right"]


def test_dsir_cli_scores_and_selection(tmp_path_factory):
    """dsir subcommand: scores_only writes the whole corpus with exact
    integer micro-nat scores; selection returns exactly n rows whose
    mean importance exceeds the corpus mean (the resampler pulls
    target-like documents)."""
    base = tmp_path_factory.mktemp("cli_dsir")
    docs = "/root/testdata/sf0.001/documents.parquet"
    target = str(base / "target.parquet")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{docs}') "
               f"WHERE lang = 'en') TO '{target}' (FORMAT PARQUET)")

    out_s = str(base / "scores")
    res = json.loads(_run(
        ["dsir", "-i", docs, "-t", target, "-o", out_s, "--scores_only",
         "--buckets", "256", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    assert res["rows"] == 500 and res["selected"] is None
    corpus_mean = duckdb.sql(
        f"SELECT AVG(dsir_logw) FROM read_parquet('{out_s}/data/*.parquet')"
    ).fetchone()[0]

    out = str(base / "sel")
    res = json.loads(_run(
        ["dsir", "-i", docs, "-t", target, "-o", out, "-n", "100",
         "--buckets", "256", "--cores", "4"]).stdout.strip()
        .splitlines()[-1])
    assert res["rows"] == 100 and res["requested"] == 100
    sel_mean, n_sel = duckdb.sql(
        f"SELECT AVG(dsir_logw), COUNT(*) "
        f"FROM read_parquet('{out}/data/*.parquet')").fetchone()
    assert n_sel == 100
    assert sel_mean > corpus_mean


def test_metascrub_cli(pairs_file, tmp_path_factory):
    """metascrub subcommand: audit reports the fixture corpus clean
    (its PNG encoder writes no ancillary chunks) apart from the
    planted corrupt payloads (unauditable), and the strip pass leaves
    every auditable payload byte-identical."""
    base = tmp_path_factory.mktemp("cli_meta")

    out_a = str(base / "audit")
    res = json.loads(_run(
        ["metascrub", "-i", pairs_file, "-o", out_a, "--audit_only",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["stripped"] is False
    assert res["rows_with_metadata"] == 0
    assert res["unauditable_rows"] > 0  # planted corrupt PNGs
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{out_a}/data/*.parquet') LIMIT 0"
    ).columns
    assert "meta_chunks" in cols and "has_exif" in cols

    out_s = str(base / "strip")
    res = json.loads(_run(
        ["metascrub", "-i", pairs_file, "-o", out_s,
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["stripped"] is True and res["rows"] == 2000
    n_diff = duckdb.sql(f"""
        SELECT COUNT(*) FROM read_parquet('{pairs_file}') a
        JOIN read_parquet('{out_s}/data/*.parquet') b USING (image_id)
        WHERE (a.bytes IS NULL) <> (b.bytes IS NULL)
           OR (a.bytes IS NOT NULL AND hex(a.bytes) <> hex(b.bytes))
    """).fetchone()[0]
    assert n_diff == 0


def test_drift_cli(tmp_path_factory):
    """drift subcommand: PSI between the en and non-en length
    distributions of the sf0.001 documents must be positive with the
    buckets reconciling against DuckDB counts."""
    base = tmp_path_factory.mktemp("cli_drift")
    docs = "/root/testdata/sf0.001/documents.parquet"
    ref = str(base / "ref.parquet")
    new = str(base / "new.parquet")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{docs}') WHERE "
               f"lang = 'en') TO '{ref}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{docs}') WHERE "
               f"lang <> 'en') TO '{new}' (FORMAT PARQUET)")
    res = json.loads(_run(
        ["drift", "-i", new, "-r", ref, "--col", "n_chars",
         "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["verdict"] in ("stable", "moderate", "investigate")
    assert len(res["buckets"]) == 10
    n_ref = sum(b["n_ref"] for b in res["buckets"])
    exp = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{ref}') "
                     "WHERE n_chars IS NOT NULL").fetchone()[0]
    assert n_ref == exp
    assert res["psi"] == round(sum(b["psi_contrib"]
                                   for b in res["buckets"]), 6)


def test_drift_cli_categorical(tmp_path_factory):
    """drift --categorical: PSI over the lang mixture of two document
    slices; category counts must reconcile with DuckDB and pooling
    must land in __other__."""
    base = tmp_path_factory.mktemp("cli_catdrift")
    docs = "/root/testdata/sf0.001/documents.parquet"
    ref = str(base / "ref.parquet")
    new = str(base / "new.parquet")
    # slice by id parity so both sides carry every language
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{docs}') WHERE "
               f"doc_id % 2 = 0) TO '{ref}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{docs}') WHERE "
               f"doc_id % 2 = 1) TO '{new}' (FORMAT PARQUET)")
    res = json.loads(_run(
        ["drift", "-i", new, "-r", ref, "--col", "lang", "--categorical",
         "--top_k", "2", "--cores", "4"]).stdout.strip().splitlines()[-1])
    assert res["verdict"] in ("stable", "moderate", "investigate")
    cats = {b["category"] for b in res["buckets"]}
    assert "__other__" in cats and len(cats) == 3  # top 2 + __other__
    n_ref = sum(b["n_ref"] for b in res["buckets"])
    exp = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{ref}')").fetchone()[0]
    assert n_ref == exp
    assert res["psi"] == round(sum(b["psi_contrib"]
                                   for b in res["buckets"]), 6)


def test_missing_path_friendly_error(tmp_path_factory):
    """A nonexistent local -i path fails fast with a one-line error on
    stderr and exit 2, before Spark startup (so: quickly)."""
    import time

    out = str(tmp_path_factory.mktemp("cli_err") / "out")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "curate",
         "-i", "/no/such/pairs.parquet", "-o", out, "--cores", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 2
    assert "path does not exist" in proc.stderr
    assert "/no/such/pairs.parquet" in proc.stderr
    assert "Traceback" not in proc.stderr
    # no Spark session was paid for: well under JVM startup cost
    assert time.time() - t0 < 30
    # URIs and globs are passed through to the storage layer (the
    # check must not reject them pre-Spark just because os.path says
    # they don't exist): a glob of a real dir still runs.
    docs = "/root/testdata/sf0.001"
    proc2 = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "skew",
         "-i", os.path.join(docs, "documents*.parquet"),
         "--key", "lang", "--cores", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc2.returncode == 0, proc2.stderr[-3000:]


def test_curate_resume_noop_message(pairs_file, tmp_path_factory):
    """Re-running a completed curate resumes from the bucket ledger:
    exit 0, resumed_noop=true in the metrics JSON, and an explicit
    'nothing to do' notice on stderr (was silent — verify-recipe
    friction)."""
    out = str(tmp_path_factory.mktemp("cli_noop") / "curate_out")
    first = json.loads(_run(
        ["curate", "-i", pairs_file, "-o", out, "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert first["resumed_noop"] is False

    again = _run(["curate", "-i", pairs_file, "-o", out, "--cores", "4"])
    metrics = json.loads(again.stdout.strip().splitlines()[-1])
    assert metrics["resumed_noop"] is True
    assert metrics["rows"] == 0 and metrics["buckets_new"] == []
    assert "nothing to do" in again.stderr
    assert "--no_resume" in again.stderr


def test_sweep_cli(tmp_path_factory):
    """sweep: per-lang P/R/F1 curves; totals reconcile with DuckDB and
    the reported best-F1 cutoff actually maximizes the curve."""
    base = tmp_path_factory.mktemp("cli_sweep")
    docs = "/root/testdata/sf0.001/documents.parquet"
    inp = str(base / "scored.parquet")
    duckdb.sql(f"COPY (SELECT *, text LIKE '%the%' AS marker FROM "
               f"read_parquet('{docs}')) TO '{inp}' (FORMAT PARQUET)")
    res = json.loads(_run(
        ["sweep", "-i", inp, "--score_col", "n_chars",
         "--label_col", "marker", "--lo", "0", "--hi", "600",
         "--bins", "6", "--group_col", "lang", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert res["group_col"] == "lang" and res["curve"]
    # per-lang n_rows must equal the corpus's non-null counts
    exp = dict(duckdb.sql(
        f"SELECT lang, COUNT(*) FROM read_parquet('{inp}') "
        f"WHERE n_chars IS NOT NULL AND lang IS NOT NULL "
        f"GROUP BY lang").fetchall())
    got = {r["lang"]: r["n_rows"] for r in res["curve"]}
    assert got == exp
    # best_f1 per lang matches the max over that lang's curve
    for lang, b in res["best_f1"].items():
        rows = [r for r in res["curve"] if r["lang"] == lang
                and r["f1"] is not None]
        assert b["f1"] == max(r["f1"] for r in rows)


def test_mine_cli(tmp_path_factory):
    """mine: margin-mined pairs written to parquet; JSON summary
    reconciles; every pair respects the threshold; exact and lsh
    modes agree on the pairs lsh surfaces (one-sided margin bias)."""
    base = tmp_path_factory.mktemp("cli_mine")
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    q = str(base / "q.parquet")
    r = str(base / "r.parquet")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{emb}') WHERE "
               f"vec_id % 4 = 0) TO '{q}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{emb}') WHERE "
               f"vec_id % 4 <> 0) TO '{r}' (FORMAT PARQUET)")
    out = str(base / "mined")
    res = json.loads(_run(
        ["mine", "-i", q, "-r", r, "-o", out, "-k", "4",
         "--threshold", "1.1", "--method", "exact", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    rows = duckdb.sql(
        f"SELECT COUNT(*), MIN(margin), COUNT(DISTINCT query_id) "
        f"FROM read_parquet('{out}/data/*.parquet')").fetchone()
    assert rows[0] == res["n_pairs"] > 0
    assert rows[1] >= 1.1
    assert rows[2] == res["n_queries_matched"]

    out2 = str(base / "mined_lsh")
    res2 = json.loads(_run(
        ["mine", "-i", q, "-r", r, "-o", out2, "-k", "4",
         "--threshold", "1.1", "--method", "lsh", "--probe_hamming",
         "4", "--cores", "4"]).stdout.strip().splitlines()[-1])
    # one-sided ANN bias: on every pair both paths surface, the lsh
    # margin is >= the exact margin (documented in margin_mine)
    n_viol = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out2}/data/*.parquet') l "
        f"JOIN read_parquet('{out}/data/*.parquet') e "
        f"USING (query_id, index_id) WHERE l.margin < e.margin"
    ).fetchone()[0]
    assert n_viol == 0 and res2["n_pairs"] > 0


def test_evalmodel_cli(tmp_path_factory):
    """evalmodel: AUC + best-F1 + calibration/ECE in one JSON; AUC
    reconciles with a DuckDB midrank recomputation; ECE equals the
    weighted per-bin gap sum."""
    base = tmp_path_factory.mktemp("cli_eval")
    docs = "/root/testdata/sf0.001/documents.parquet"
    inp = str(base / "scored.parquet")
    # synthetic probability correlated with the label via n_chars
    duckdb.sql(f"COPY (SELECT *, (n_chars % 97) / 97.0 AS p, "
               f"n_chars >= 250 AS y FROM read_parquet('{docs}')) "
               f"TO '{inp}' (FORMAT PARQUET)")
    res = json.loads(_run(
        ["evalmodel", "-i", inp, "--score_col", "p", "--label_col",
         "y", "--bins", "10", "--prob", "--cores", "4"]
    ).stdout.strip().splitlines()[-1])
    assert len(res["auc"]) == 1
    a = res["auc"][0]
    exp = duckdb.sql(f"""
        WITH d AS (SELECT p AS s, CASE WHEN y THEN 1 ELSE 0 END AS yy
                   FROM read_parquet('{inp}')
                   WHERE p IS NOT NULL AND y IS NOT NULL),
        r AS (SELECT yy, RANK() OVER (ORDER BY s) +
                     (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS mr
              FROM d)
        SELECT ROUND((SUM(CASE WHEN yy=1 THEN mr END)
                      - SUM(yy) * (SUM(yy) + 1) / 2.0)
                     / (SUM(yy) * (COUNT(*) - SUM(yy))), 6) FROM r
    """).fetchone()[0]
    assert a["auc"] == exp
    assert "__all__" in res["best_f1"]
    cal = res["calibration"]
    n_tot = sum(r["n"] for r in cal)
    assert res["ece"] == round(
        sum(r["n"] * r["gap"] for r in cal) / n_tot, 6)


def test_expect_cli(tmp_path_factory):
    """expect subcommand: rule report reconciles with DuckDB CASE
    sums over the same corpus; --quarantine splits the rows exactly;
    exit code 1 signals the failing gate, 0 a passing one."""
    base = tmp_path_factory.mktemp("cli_expect")
    docs = "/root/testdata/sf0.001/documents.parquet"
    qdir = str(base / "q")
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "expect",
         "-i", docs, "--not_null", "lang", "--unique", "doc_id",
         "--range", "n_chars:0:200", "--matches", r"lang:^[a-z]{2}$",
         "--quarantine", qdir, "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert proc.returncode == (0 if res["all_passed"] else 1)
    rep = {r["rule"]: r for r in res["rules"]}
    exp = duckdb.sql(f"""
        SELECT SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
               SUM(CASE WHEN n_chars IS NULL THEN 0
                        WHEN n_chars BETWEEN 0 AND 200 THEN 0
                        ELSE 1 END),
               COUNT(doc_id) - COUNT(DISTINCT doc_id),
               COUNT(*)
        FROM read_parquet('{docs}')
    """).fetchone()
    assert rep["lang_not_null"]["n_violations"] == exp[0]
    assert rep["n_chars_in_range"]["n_violations"] == exp[1]
    assert rep["doc_id_unique"]["n_violations"] == exp[2]
    assert res["clean_rows"] + res["quarantine_rows"] == exp[3]
    # quarantine rows = rows violating at least one ROW rule
    # (uniqueness is table-level and excluded from enforcement)
    n_bad = duckdb.sql(f"""
        SELECT COUNT(*) FROM read_parquet('{docs}')
        WHERE lang IS NULL
           OR (n_chars IS NOT NULL AND n_chars NOT BETWEEN 0 AND 200)
           OR (lang IS NOT NULL AND NOT regexp_matches(lang, '^[a-z]{{2}}$'))
    """).fetchone()[0]
    assert res["quarantine_rows"] == n_bad
    got = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{qdir}/quarantine/*.parquet')"
    ).fetchone()[0]
    assert got == n_bad


def test_expect_cli_passing_gate(tmp_path_factory):
    """A rule set the corpus satisfies exits 0 with all_passed."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "expect",
         "-i", docs, "--not_null", "doc_id", "--unique", "doc_id",
         "--cores", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["all_passed"]
