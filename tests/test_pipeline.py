"""Pipeline recipe runner: spec parsing/substitution units plus a
subprocess end-to-end chain with resume and failure-stop semantics."""

import json
import os
import subprocess
import sys

import pytest

from mehc_curation_spark.pipeline import (
    _build_argv, _step_hash, _substitute, run_pipeline)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_substitute_longest_name_wins():
    outs = {"prev": "/p", "cur": "/c", "curated": "/cc"}
    assert _substitute("$curated/data", outs) == "/cc/data"
    assert _substitute("$cur/data", outs) == "/c/data"
    assert _substitute("x-$prev-y", outs) == "x-/p-y"


def test_build_argv_maps_fields_and_args():
    argv = _build_argv(
        {"op": "crossdedup", "input": "$prev/data", "reference": "/r",
         "output": "/o", "args": ["--mode", "text"]},
        {"prev": "/P"})
    assert argv == ["crossdedup", "-i", "/P/data", "-o", "/o",
                    "-r", "/r", "--mode", "text"]


def test_build_argv_rejects_recursion_and_missing_op():
    with pytest.raises(ValueError):
        _build_argv({"op": "pipeline"}, {})
    with pytest.raises(ValueError):
        _build_argv({"input": "x"}, {})


def test_step_hash_sensitive_to_args():
    a = {"op": "qscore", "input": "i", "output": "o"}
    b = {**a, "args": ["--threshold", "0.9"]}
    assert _step_hash(a) != _step_hash(b)


def test_pipeline_chain_resume_and_rerun_on_edit(tmp_path):
    w = str(tmp_path)
    spec = {
        "steps": [
            {"name": "scored", "op": "qscore", "input": DOCS,
             "output": f"{w}/s1"},
            {"op": "expect", "input": "$scored/scores",
             "args": ["--not_null", "q_score", "--unique", "doc_id"]},
        ]
    }
    sp = os.path.join(w, "spec.json")
    with open(sp, "w") as f:
        json.dump(spec, f)

    s = run_pipeline(sp)
    assert s["ok"] and s["completed"] == 2
    assert [r["status"] for r in s["steps"]] == ["ok", "ok"]
    assert os.path.exists(f"{w}/s1/scores")
    assert s["steps"][1]["summary"] is not None  # expect's JSON report

    # resume: completed steps skip (including no-output gates)
    s2 = run_pipeline(sp)
    assert s2["ok"]
    assert [r["status"] for r in s2["steps"]] == \
        ["skipped_complete", "skipped_complete"]

    # editing a step's spec invalidates its recorded hash
    spec["steps"][0]["args"] = ["--threshold", "0.25"]
    with open(sp, "w") as f:
        json.dump(spec, f)
    s3 = run_pipeline(sp)
    assert s3["ok"] and s3["steps"][0]["status"] == "ok"


def test_pipeline_failure_stops_chain(tmp_path):
    w = str(tmp_path)
    spec = {"steps": [
        {"op": "qscore", "input": f"{w}/does-not-exist.parquet",
         "output": f"{w}/x1"},
        {"op": "qscore", "input": DOCS, "output": f"{w}/x2"},
    ]}
    sp = os.path.join(w, "spec.json")
    with open(sp, "w") as f:
        json.dump(spec, f)
    s = run_pipeline(sp)
    assert not s["ok"]
    assert len(s["steps"]) == 1  # chain stopped at the failure
    assert s["steps"][0]["status"] == "failed"
    assert "does not exist" in s["steps"][0]["stderr_tail"]
    assert not os.path.exists(f"{w}/x2")

    # CLI exit code mirrors the summary
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "pipeline",
         "--spec", sp, "--no_resume"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 1
    assert not json.loads(proc.stdout.strip().splitlines()[-1])["ok"]


def test_pipeline_step_timeout_recorded_not_raised(tmp_path):
    # a hung step must land in the summary as status='timeout' with
    # the state file updated — not propagate TimeoutExpired out of
    # run_pipeline (ADVICE r4)
    w = str(tmp_path)
    spec = {"steps": [
        {"op": "qscore", "input": DOCS, "output": f"{w}/t1"},
        {"op": "qscore", "input": DOCS, "output": f"{w}/t2"},
    ]}
    sp = os.path.join(w, "spec.json")
    with open(sp, "w") as f:
        json.dump(spec, f)
    s = run_pipeline(sp, timeout_per_step=0.5)
    assert not s["ok"]
    assert len(s["steps"]) == 1  # chain stopped at the hung step
    assert s["steps"][0]["status"] == "timeout"
    assert "timeout_per_step" in s["steps"][0]["stderr_tail"]
    state = json.load(open(sp + ".state.json"))
    assert state["0"]["status"] == "timeout"
    # a resumed run does NOT skip the timed-out step
    s2 = run_pipeline(sp)
    assert s2["ok"]
    assert s2["steps"][0]["status"] == "ok"


def test_pipeline_cli_missing_spec():
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", "pipeline",
         "--spec", "/nope/spec.json"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 2
    assert "does not exist" in proc.stderr
