"""Per-partition (phash-bucket) lineage + metrics ledger with atomic
commit — the durability layer behind checkpoint resume.

Emulates the part of Iceberg semantics the pipeline needs (no Iceberg
runtime jars in this environment): data files live under
``data/bucket=<k>/``, and a JSON manifest is committed atomically
(write-temp-then-rename) after the bucket's files are moved into
place. A bucket is only ever visible in the ledger if its data is
complete, so resume-by-skipping-committed-buckets is honest.

Graft of the reference's report/output sink layer
(``/root/reference/mehc_curation/utils/report_utils.py:42-65``) plus
the lineage the reference loses by resetting row identity per step
(SURVEY.md §4.2.6).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


class Ledger:
    def __init__(self, table_path: str):
        self.root = table_path
        self.data_dir = os.path.join(table_path, "data")
        self.ledger_dir = os.path.join(table_path, "_ledger")
        self.ledger_file = os.path.join(self.ledger_dir, "ledger.json")

    # -- read ---------------------------------------------------------------

    def read(self) -> dict:
        if not os.path.exists(self.ledger_file):
            return {"version": 0, "buckets": {}, "runs": []}
        with open(self.ledger_file) as f:
            return json.load(f)

    def completed_buckets(self) -> set[int]:
        return {int(k) for k in self.read()["buckets"]}

    # -- write --------------------------------------------------------------

    def staging_dir(self) -> str:
        d = os.path.join(self.root, "_staging", uuid.uuid4().hex[:12])
        os.makedirs(d, exist_ok=True)
        return d

    def read_aux(self, name: str):
        """Read a previously published auxiliary JSON artifact, or None."""
        path = os.path.join(self.ledger_dir, name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def write_aux(self, name: str, payload: dict) -> None:
        """Atomically publish an auxiliary JSON artifact (e.g. the
        salted per-language stats) next to the ledger."""
        os.makedirs(self.ledger_dir, exist_ok=True)
        path = os.path.join(self.ledger_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _acquire_lock(self, timeout_sec: float = 120.0) -> int:
        """Exclusive commit lock via ``flock(LOCK_EX)`` on a lockfile:
        kernel-owned, so it is released automatically when the holding
        process dies (no stale-lock breaking, and none of the
        check-then-remove races a breakable O_EXCL lockfile has — a
        round-2 review found exactly that TOCTOU in the previous
        implementation). Serializes the ledger's read-modify-write so
        two simultaneous `run_curate` committers cannot lose each
        other's bucket entries. Caveat: flock semantics on NFS depend
        on the server/mount (local and most cluster filesystems are
        fine); returns the held fd — close it to release."""
        import fcntl

        os.makedirs(self.ledger_dir, exist_ok=True)
        lock = os.path.join(self.ledger_dir, "COMMIT.lock")
        import errno

        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        deadline = time.time() + timeout_sec
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return fd
            except OSError as e:
                if e.errno not in (errno.EWOULDBLOCK, errno.EAGAIN,
                                   errno.EACCES):
                    # e.g. ENOLCK on an NFS mount without lockd: a real,
                    # immediately-diagnosable failure — do not spin on it
                    os.close(fd)
                    raise
                if time.time() > deadline:
                    os.close(fd)
                    raise TimeoutError(
                        f"ledger commit lock held too long: {lock}")
                time.sleep(0.05)

    def commit_buckets(self, staging: str, per_bucket: dict[int, dict],
                       elapsed_sec: float) -> None:
        """Move staged bucket dirs into the table, then atomically
        publish the updated ledger (tmp + os.replace), under the
        exclusive commit lock (see :meth:`_acquire_lock`).

        Buckets being REPLACED (already committed from a prior run)
        are durably retracted from the ledger FIRST: a crash between
        deleting the old data and moving the new data in must leave
        the bucket un-committed (so resume recomputes it), never
        committed-but-missing."""
        fd = self._acquire_lock()
        try:
            state = self.read()
            stale = [b for b in per_bucket
                     if str(b) in state.get("buckets", {})]
            if stale:
                self.retract_buckets(stale, state=state)
            self.move_buckets(staging, per_bucket)
            self.publish_buckets(per_bucket, elapsed_sec)
        finally:
            os.close(fd)  # releases the flock

    def retract_buckets(self, buckets, state: dict | None = None) -> None:
        """Durably remove bucket entries (call under the commit
        lock) — the un-commit step that precedes replacing a
        bucket's data."""
        state = state if state is not None else self.read()
        for b in buckets:
            state["buckets"].pop(str(b), None)
        state["version"] = state.get("version", 0) + 1
        self._write_state(state)

    def move_buckets(self, staging: str, per_bucket: dict[int, dict]) -> None:
        """Move staged bucket dirs into ``data/`` (replacing any prior
        version of those buckets). Call under the commit lock; the
        buckets only become resume-visible at :meth:`publish_buckets`,
        so a crash between the two steps simply recomputes them."""
        os.makedirs(self.data_dir, exist_ok=True)
        for b in sorted(per_bucket):
            src = os.path.join(staging, f"bucket={b}")
            dst = os.path.join(self.data_dir, f"bucket={b}")
            if os.path.exists(src):
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                shutil.move(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

    def publish_buckets(self, per_bucket: dict[int, dict],
                        elapsed_sec: float) -> None:
        """Atomically publish the bucket entries (tmp + os.replace).
        This is the LAST step of a durable commit — everything it
        makes resume-visible (data files, snapshot manifest, aux
        stats) must already be on disk."""
        os.makedirs(self.ledger_dir, exist_ok=True)
        state = self.read()
        for b in sorted(per_bucket):
            entry = dict(per_bucket[b])
            entry["committed_at"] = time.time()
            state["buckets"][str(b)] = entry
        state["version"] = state.get("version", 0) + 1
        state["runs"].append({
            "ts": time.time(),
            "buckets": sorted(per_bucket),
            "elapsed_sec": elapsed_sec,
        })
        self._write_state(state)

    def _write_state(self, state: dict) -> None:
        """fsync'd atomic JSON publish: flush + fsync the tmp file
        before the rename (a power loss can otherwise persist the
        rename with truncated contents, bricking resume), then fsync
        the directory so the rename itself is durable."""
        tmp = self.ledger_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.ledger_file)
        dfd = os.open(self.ledger_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
