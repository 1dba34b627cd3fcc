"""Snapshot-table branches (Iceberg branch-refs analog): the
write-audit-publish workflow — stage commits on a branch, default
readers keep seeing main, fast-forward publishes. Cites the model
semantics of Iceberg refs (public: iceberg.apache.org/docs branching
& WAP); no reference-repo analog (its output is overwrite-only CSV).
"""

import json
import os
import subprocess
import sys
import threading

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def _ids(spark, t, version=None):
    return sorted(r["id"] for r in t.read(spark, version=version).collect())


def test_branch_write_isolated_from_main(spark, tbl):
    tbl.write(spark.range(3).toDF("id"))
    assert tbl.create_branch("audit") == 1
    # main pinned at the pre-branch head
    assert tbl.branches() == {"main": 1, "audit": 1}

    tbl.write(spark.range(3, 6).toDF("id"), branch="audit")
    # default readers still see main; branch readers see the append
    assert _ids(spark, tbl) == [0, 1, 2]
    assert _ids(spark, tbl, version="audit") == [0, 1, 2, 3, 4, 5]
    assert tbl.branches()["audit"] == 2
    assert tbl.branches()["main"] == 1
    # the log is still one linear sequence
    assert tbl.current_version() == 2
    assert tbl.manifest(2)["branch"] == "audit"
    assert tbl.manifest(2)["parent"] == 1


def test_publish_fast_forward(spark, tbl):
    tbl.write(spark.range(2).toDF("id"))
    tbl.create_branch("audit")
    tbl.write(spark.range(2, 4).toDF("id"), branch="audit")
    tbl.write(spark.range(4, 5).toDF("id"), branch="audit")
    assert _ids(spark, tbl) == [0, 1]
    head = tbl.fast_forward("main", "audit")
    assert head == tbl.branches()["audit"]
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4]


def test_fast_forward_refuses_divergence(spark, tbl):
    tbl.write(spark.range(2).toDF("id"))
    tbl.create_branch("audit")
    tbl.write(spark.range(2, 4).toDF("id"), branch="audit")
    # main advances independently -> diverged
    tbl.write(spark.range(9, 10).toDF("id"))
    assert _ids(spark, tbl) == [0, 1, 9]
    with pytest.raises(ValueError, match="diverged"):
        tbl.fast_forward("main", "audit")
    # audit is unaffected and still readable
    assert _ids(spark, tbl, version="audit") == [0, 1, 2, 3]


def test_default_commits_advance_main_when_branched(spark, tbl):
    tbl.write(spark.range(2).toDF("id"))
    tbl.create_branch("audit")
    tbl.write(spark.range(2, 3).toDF("id"))  # default -> main
    assert tbl.branches()["main"] == 2
    assert _ids(spark, tbl) == [0, 1, 2]
    assert _ids(spark, tbl, version="audit") == [0, 1]


def test_ref_namespace_and_guards(spark, tbl):
    tbl.write(spark.range(1).toDF("id"))
    tbl.tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_branch("v1")
    tbl.create_branch("audit")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_branch("audit")
    with pytest.raises(ValueError, match="'main' is implicit"):
        tbl.create_branch("main")
    with pytest.raises(ValueError, match="cannot drop 'main'"):
        tbl.drop_branch("main")
    with pytest.raises(KeyError, match="no branch"):
        tbl.write(spark.range(1, 2).toDF("id"), branch="nope")
    tbl.drop_branch("audit")
    with pytest.raises(KeyError, match="no branch"):
        tbl.drop_branch("audit")
    # a table that never branched refuses branch writes loudly
    t2 = SnapshotTable(str(tbl.path) + "2")
    t2.write(spark.range(1).toDF("id"))
    with pytest.raises(KeyError, match="no branch"):
        t2.write(spark.range(1, 2).toDF("id"), branch="audit")


def test_expire_keeps_branch_heads(spark, tbl):
    tbl.write(spark.range(2).toDF("id"))
    tbl.create_branch("audit")
    tbl.write(spark.range(2, 4).toDF("id"), branch="audit")  # v2 = head
    for i in range(4, 8):
        tbl.write(spark.range(i, i + 1).toDF("id"))  # advance main/log
    tbl.expire_snapshots(keep_last=1)
    # both heads still readable
    assert _ids(spark, tbl, version="audit") == [0, 1, 2, 3]
    assert max(_ids(spark, tbl)) == 7
    # main's head is retained even though keep_last=1 counts from the
    # log tip (which is an audit-free main commit)
    assert os.path.exists(tbl._manifest_path(tbl.branches()["audit"]))


def test_concurrent_same_branch_writers_lose_no_update(spark, tbl):
    tbl.write(spark.range(1).toDF("id"))
    tbl.create_branch("audit")
    errs = []

    def w(lo):
        try:
            tbl.write(spark.range(lo, lo + 1).toDF("id"), branch="audit")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=w, args=(10 * i,)) for i in range(1, 5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = _ids(spark, tbl, version="audit")
    assert got == [0, 10, 20, 30, 40]
    assert _ids(spark, tbl) == [0]  # main untouched


def test_branch_cli_wap_roundtrip(spark, tmp_path):
    """CLI WAP loop: branch -> (API write to branch) -> publish;
    history reports heads; dropbranch cleans up."""
    t = SnapshotTable(str(tmp_path / "cli_t"))
    t.write(spark.range(3).toDF("id"))

    def run(*args):
        proc = subprocess.run(
            [sys.executable, "-m", "mehc_curation_spark", "table",
             *args, "-o", t.path],
            cwd=REPO, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    res = run("branch", "--name", "audit")
    assert res["branches"] == {"main": 1, "audit": 1}
    t.write(spark.range(3, 5).toDF("id"), branch="audit")
    hist = run("history")
    assert hist["read_head"] == 1 and hist["branches"]["audit"] == 2
    pub = run("publish", "--name", "audit")
    assert pub["main_head"] == 2
    assert sorted(r["id"] for r in t.read(spark).collect()) == \
        [0, 1, 2, 3, 4]
    res = run("dropbranch", "--name", "audit")
    assert "audit" not in res["branches"]


def test_incremental_read_between_refs(spark, tbl):
    """The WAP audit read: read_incremental accepts refs, so
    'exactly what did the staged branch add on top of main' is one
    incremental read — no version numbers in hand."""
    tbl.write(spark.range(3).toDF("id"))
    tbl.create_branch("audit")
    tbl.write(spark.range(3, 6).toDF("id"), branch="audit")
    inc = tbl.read_incremental(spark, since_version="main",
                               to_version="audit")
    assert sorted(r["id"] for r in inc.collect()) == [3, 4, 5]
    # and the row-level changelog agrees
    diff = tbl.snapshot_diff(spark, from_version="main",
                             to_version="audit", id_col="id")
    got = sorted((r["id"], r["_change_type"]) for r in diff.collect())
    assert got == [(3, "insert"), (4, "insert"), (5, "insert")]


# ---------------------------------------------------------------------------
# WAP under concurrency: main advances while audit holds staged work
# (VERDICT r3 item 6 — rebase-or-refuse publish semantics)
# ---------------------------------------------------------------------------

def test_rebase_publish_after_main_advanced(spark, tbl):
    tbl.write(spark.range(0, 2).toDF("id"))          # v1
    tbl.create_branch("audit")
    tbl.write(spark.range(10, 12).toDF("id"), branch="audit")  # staged
    # main advances independently: append then compact
    tbl.write(spark.range(2, 4).toDF("id"), branch="main")
    tbl.compact(spark, target_files=1)
    # fast-forward must refuse the divergence...
    with pytest.raises(ValueError, match="diverged"):
        tbl.fast_forward("main", "audit")
    # ...and rebase_publish resolves it: the audit branch's
    # append-only delta lands as one commit on main's current head
    v = tbl.rebase_publish("audit")
    assert tbl.branches()["main"] == v
    assert tbl.branches()["audit"] == v  # re-pointed, no longer diverged
    assert _ids(spark, tbl) == [0, 1, 2, 3, 10, 11]
    m = tbl.manifest(v)
    assert m["properties"]["rebase_publish_of"] == "audit"
    # a subsequent plain publish works again (no divergence left)
    tbl.write(spark.range(20, 21).toDF("id"), branch="audit")
    tbl.fast_forward("main", "audit")
    assert _ids(spark, tbl) == [0, 1, 2, 3, 10, 11, 20]


def test_rebase_publish_refuses_non_append_branch(spark, tbl):
    tbl.write(spark.range(0, 4).toDF("id"))
    tbl.create_branch("audit")
    # the branch REWRITES (overwrite) instead of appending
    tbl.write(spark.range(50, 52).toDF("id"), mode="overwrite",
              branch="audit")
    tbl.write(spark.range(4, 6).toDF("id"), branch="main")  # diverge
    from mehc_curation_spark.io.catalog import CommitConflictError
    with pytest.raises(CommitConflictError, match="append-only"):
        tbl.rebase_publish("audit")
    # main untouched by the refused publish
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4, 5]


def test_rebase_publish_noop_and_fast_forward_paths(spark, tbl):
    tbl.write(spark.range(0, 2).toDF("id"))
    tbl.create_branch("audit")
    # nothing staged: no-op returns main's head
    assert tbl.rebase_publish("audit") == tbl.branches()["main"]
    # staged but main did NOT move: falls through to fast_forward
    tbl.write(spark.range(5, 7).toDF("id"), branch="audit")
    v = tbl.rebase_publish("audit")
    assert tbl.branches()["main"] == v
    assert _ids(spark, tbl) == [0, 1, 5, 6]


def test_rebase_publish_cli(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "c"))
    t.write(spark.range(0, 2).toDF("id"))
    t.create_branch("audit")
    t.write(spark.range(10, 12).toDF("id"), branch="audit")
    t.write(spark.range(2, 3).toDF("id"), branch="main")
    # plain publish exits non-zero on divergence
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "table", "publish",
         "-o", t.path, "--name", "audit"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "diverged" in proc.stderr
    # --rebase resolves
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "table", "publish",
         "-o", t.path, "--name", "audit", "--rebase"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["rebased"] is True
    assert _ids(spark, t) == [0, 1, 2, 10, 11]


def test_rebase_publish_refuses_takedown_race(spark, tbl):
    """ADVICE r4: an equality-delete takedown committed on main while
    the branch was staged must block rebase_publish — replaying the
    branch delta with a fresh sequence would let its copies of the
    taken-down keys escape the delete and resurface removed content."""
    from mehc_curation_spark.io.catalog import CommitConflictError

    tbl.write(spark.range(0, 4).toDF("id"))
    tbl.create_branch("audit")
    # the branch stages a copy of id=2 (the key about to be taken down)
    tbl.write(spark.range(2, 3).toDF("id"), branch="audit")
    # main advances AND takes down id=2 via MoR equality delete
    tbl.write(spark.range(4, 6).toDF("id"), branch="main")
    tbl.delete_where(spark, "id = 2", mode="mor", key_cols=("id",))
    assert _ids(spark, tbl) == [0, 1, 3, 4, 5]
    with pytest.raises(CommitConflictError, match="taken-down"):
        tbl.rebase_publish("audit")
    # main untouched; the takedown still holds
    assert _ids(spark, tbl) == [0, 1, 3, 4, 5]
    # settling the debt on main clears the conflict; the publish then
    # lands and the branch's copy of id=2 is legitimately visible
    # (it post-dates the settled delete, like any fresh re-ingest)
    tbl.apply_deletes(spark)
    v = tbl.rebase_publish("audit")
    assert tbl.branches()["main"] == v
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4, 5]


def test_rebase_publish_ok_when_delete_predates_base(spark, tbl):
    """An equality delete already pending AT the merge base predates
    the staged work (same semantics as appending to a debt-carrying
    table) — it must NOT block the publish."""
    tbl.write(spark.range(0, 4).toDF("id"))
    tbl.delete_where(spark, "id = 1", mode="mor", key_cols=("id",))
    tbl.create_branch("audit")
    tbl.write(spark.range(10, 12).toDF("id"), branch="audit")
    tbl.write(spark.range(4, 6).toDF("id"), branch="main")  # diverge
    v = tbl.rebase_publish("audit")
    assert tbl.branches()["main"] == v
    assert _ids(spark, tbl) == [0, 2, 3, 4, 5, 10, 11]
