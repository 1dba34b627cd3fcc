"""Declarative multi-step pipeline runner.

The reference's only orchestration is the fixed refinement if-ladder
(``/root/reference/mehc_curation/refinement/core/pipeline.py:23-291``:
validation → cleaning → normalization with dedup gates). A real
curation deployment chains MORE than that one job: curate →
decontaminate against a reference corpus → quality-score → sample →
export training shards. This module runs such a chain from one JSON
spec, with each step executed as its OWN interpreter/SparkSession
subprocess (the same isolation a per-step ``spark-submit`` gives on a
cluster: a step's JVM death cannot corrupt its neighbors, and each
step's resource config is independent) and with pipeline-level resume
(a completed step whose spec hash is unchanged is skipped — on top of
the intra-step resume the curate ledger already provides).

Spec format::

    {
      "steps": [
        {"name": "curated", "op": "curate",
         "input": "pairs.parquet", "output": "out/curated",
         "args": ["--no_validate"]},
        {"op": "qscore", "input": "$curated/data", "output": "out/scored"},
        {"op": "export", "input": "$prev/data", "output": "out/shards",
         "args": ["--shards", "4"]}
      ]
    }

- ``op`` is any CLI subcommand (``python -m mehc_curation_spark op``).
- ``input``/``output``/``reference``/``target`` map to
  ``-i/-o/-r/-t``; ``args`` is a raw token list passed through.
- ``$prev`` in a path substitutes the PREVIOUS step's output;
  ``$<name>`` substitutes the output of the step with that ``name``.
- State lives in ``<spec>.state.json``: per-step spec hash + status.
  Re-running skips steps recorded complete with an unchanged hash
  (and an existing output); ``resume=False`` reruns everything.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time
from typing import Optional

_PATH_FIELDS = (("input", "-i"), ("output", "-o"),
                ("reference", "-r"), ("target", "-t"))


def _step_hash(step: dict) -> str:
    return hashlib.sha256(
        json.dumps(step, sort_keys=True).encode()).hexdigest()[:16]


def _substitute(value: str, outputs: dict[str, str]) -> str:
    """Replace ``$name`` tokens with recorded step outputs; longest
    names first so ``$curated_v2`` never half-matches ``$curated``."""
    for name in sorted(outputs, key=len, reverse=True):
        value = value.replace(f"${name}", outputs[name])
    return value


def _build_argv(step: dict, outputs: dict[str, str]) -> list[str]:
    op = step.get("op")
    if not op or not isinstance(op, str):
        raise ValueError(f"pipeline step missing 'op': {step}")
    if op in ("pipeline", "package"):
        raise ValueError(f"'{op}' cannot be a pipeline step")
    argv = [op]
    for field, flag in _PATH_FIELDS:
        v = step.get(field)
        if v is not None:
            argv += [flag, _substitute(str(v), outputs)]
    argv += [_substitute(str(a), outputs) for a in step.get("args", [])]
    return argv


def _load_state(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def run_pipeline(spec_path: str, resume: bool = True,
                 env: Optional[dict] = None,
                 timeout_per_step: float = 3600.0) -> dict:
    """Execute the spec; returns the summary dict (``ok`` overall,
    per-step status/seconds/parsed summary). Stops at the first
    failing step — downstream steps read upstream outputs, so running
    past a failure would only manufacture confusing errors."""
    with open(spec_path) as f:
        spec = json.load(f)
    steps = spec.get("steps")
    if not isinstance(steps, list) or not steps:
        raise ValueError(f"{spec_path}: spec needs a non-empty 'steps' list")

    state_path = spec_path + ".state.json"
    state = _load_state(state_path) if resume else {}
    run_env = dict(os.environ)
    # the package must be importable inside the step subprocess even
    # when the runner was started from elsewhere
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_env["PYTHONPATH"] = pkg_root + os.pathsep + \
        run_env.get("PYTHONPATH", "")
    if env:
        run_env.update(env)

    outputs: dict[str, str] = {}
    results = []
    ok = True
    for idx, step in enumerate(steps):
        name = step.get("name") or f"step{idx}"
        h = _step_hash(step)
        argv = _build_argv(step, outputs)
        out_path = (_substitute(str(step["output"]), outputs)
                    if step.get("output") is not None else None)
        rec = state.get(str(idx), {})
        if (resume and rec.get("hash") == h and rec.get("status") == "ok"
                and (out_path is None or os.path.exists(out_path))):
            results.append({"name": name, "op": step["op"],
                            "status": "skipped_complete",
                            "output": out_path})
            if out_path is not None:
                outputs[name] = out_path
                outputs["prev"] = out_path
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "mehc_curation_spark", *argv],
                capture_output=True, text=True, env=run_env,
                timeout=timeout_per_step)
        except subprocess.TimeoutExpired as te:
            # a hung step is a FAILED step, not a runner traceback:
            # record it in the state file and return the documented
            # per-step summary with ok=False (ADVICE r3)
            secs = round(time.time() - t0, 3)
            state[str(idx)] = {"hash": h, "status": "timeout",
                               "ts": time.time()}
            with open(state_path, "w") as f:
                json.dump(state, f, indent=1)
            tail = te.stderr or b""
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            results.append({
                "name": name, "op": step["op"], "status": "timeout",
                "returncode": None, "seconds": secs, "output": out_path,
                "summary": None,
                "stderr_tail": (f"step exceeded timeout_per_step="
                                f"{timeout_per_step}s; "
                                + tail[-1500:])})
            ok = False
            break
        secs = round(time.time() - t0, 3)
        summary = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                summary = json.loads(line)
                break
            except ValueError:
                continue
        status = "ok" if proc.returncode == 0 else "failed"
        state[str(idx)] = {"hash": h, "status": status, "ts": time.time()}
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
        results.append({
            "name": name, "op": step["op"], "status": status,
            "returncode": proc.returncode, "seconds": secs,
            "output": out_path, "summary": summary,
            **({} if proc.returncode == 0
               else {"stderr_tail": proc.stderr[-2000:]})})
        if proc.returncode != 0:
            ok = False
            break
        if out_path is not None:
            outputs[name] = out_path
            outputs["prev"] = out_path
    return {"ok": ok, "spec": spec_path,
            "completed": sum(1 for r in results
                             if r["status"] in ("ok", "skipped_complete")),
            "total": len(steps), "steps": results}
