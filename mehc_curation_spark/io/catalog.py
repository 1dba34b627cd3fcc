"""Snapshot-table layer — a thin Iceberg-semantics emulation over
Parquet (no Iceberg runtime jars in this environment; SURVEY.md §7).

Gives the pipeline the Iceberg behaviors it depends on, behind an
interface that switches to real Iceberg when a runtime is present:

1. **atomic snapshot commit** — data files are written to a staging
   dir, then a JSON snapshot manifest listing exactly those files is
   published via a hard-link CAS (create-exclusive) with optimistic
   retry, so concurrent committers cannot lose updates; readers only
   ever see a committed manifest;
2. **snapshot lineage / time travel** — every commit records a parent
   snapshot id; `read(version=...)` reads any historical snapshot, and
   `read_incremental(since_version)` reads only the files newer
   snapshots added (CDC-append);
3. **pinned schema + additive evolution** — the declared schema is
   stored in table metadata and asserted on append;
   `allow_schema_evolution=True` accepts add-column appends, old files
   reading NULL for new columns;
4. **manifest column stats / data skipping** — per-file min/max read
   from parquet footers at commit; `read(between=(col, lo, hi))`
   prunes non-overlapping files before Spark opens them; optional
   per-file bloom bitmaps (``write(bloom_cols=...)``) extend skipping
   to POINT lookups (``read(eq=(col, value))``) where ranges overlap
   everywhere — the Parquet-bloom-filter / Iceberg analog for
   takedown-by-id probes;
5. **snapshot expiry** — `expire_snapshots(keep_last)` drops old
   manifests and unreferenced data files.

Stage barriers in the curation job (`complete_refinement`'s
materialization points, ``refinement/core/pipeline.py:157-269``) map to
one snapshot per stage, which is what checkpoint-resume reads back.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """A concurrent commit invalidated this operation's base snapshot
    (e.g. an overwrite landed while a compaction was rewriting the
    files it read) — the operation must be retried against the new
    table state, mirroring Iceberg's validation-failure aborts."""


class SnapshotTable:
    """A Parquet-backed table with atomic JSON snapshot manifests."""

    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "_snapshots")
        self.data_dir = os.path.join(path, "data")
        self.seg_dir = os.path.join(self.meta_dir, "segments")
        # immutable once written — cache by name for the life of this
        # handle (hydrating N snapshots re-reads nothing)
        self._seg_cache: dict[str, dict] = {}

    # -- metadata ---------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:06d}.json")

    # -- manifest segments (Iceberg manifest-file analog) ------------------
    #
    # A naive manifest inlines every file entry, so EVERY commit
    # rewrites O(table files) of JSON — fine at thousands of files,
    # hostile at the 10^5-10^6 files a 100 TB table holds. Above
    # SEGMENT_MIN_FILES entries, the file list (with its per-file
    # stats + sequence numbers) moves into immutable SEGMENT files and
    # the manifest stores only the segment name list: an append-shaped
    # commit then writes one O(delta) segment plus a tiny manifest,
    # exactly the Iceberg manifest-file/manifest-list split. Rewrites
    # (compaction, CoW row ops) repack into a fresh segment; when the
    # per-manifest segment list exceeds SEGMENT_MAX_COUNT it is also
    # repacked (bounding hydration fan-in). Readers are unaffected:
    # manifest() hydrates segments back into the inline shape (cached —
    # segments are immutable). Orphan segments (CAS-losing commit
    # attempts, crashed writers) are swept by expire_snapshots with an
    # in-flight age guard.

    SEGMENT_MIN_FILES = 1024
    SEGMENT_MAX_COUNT = 64
    # aligned with the 86400s data-file orphan guard: a writer that
    # stalls between _write_segment and winning the manifest CAS must
    # not have its segment swept by a concurrent expire_snapshots
    # (that would leave a committed manifest referencing a missing
    # segment — an unreadable snapshot). Anything slower than a day
    # has lost its CAS race to a conflict abort long before.
    SEGMENT_ORPHAN_AGE_SEC = 86400.0

    def _segment_path(self, name: str) -> str:
        return os.path.join(self.seg_dir, name)

    def _load_segment(self, name: str) -> dict:
        seg = self._seg_cache.get(name)
        if seg is None:
            with open(self._segment_path(name)) as f:
                seg = json.load(f)
            self._seg_cache[name] = seg
        return seg

    def _hydrate(self, m: dict) -> dict:
        """Materialize a segmented manifest back into the inline shape
        every consumer reads (files / stats / file_seq); keeps the
        ``segments`` key so commit packers can diff against it."""
        segs = m.get("segments")
        if not segs:
            return m
        files: list[str] = []
        stats: dict = {}
        fseq: dict = {}
        for name in segs:
            seg = self._load_segment(name)
            files.extend(seg["files"])
            stats.update(seg.get("stats", {}))
            fseq.update(seg.get("file_seq", {}))
        out = dict(m)
        out["files"] = files
        out["stats"] = stats
        if fseq:
            out["file_seq"] = fseq
        return out

    def _write_segment(self, files: list[str], stats: dict,
                       fseq: dict) -> str:
        os.makedirs(self.seg_dir, exist_ok=True)
        name = f"seg-{uuid.uuid4().hex[:12]}.json"
        payload: dict = {
            "files": list(files),
            "stats": {f: stats[f] for f in files if f in stats}}
        fs = {f: fseq[f] for f in files if f in fseq}
        if fs:
            payload["file_seq"] = fs
        tmp = self._segment_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._segment_path(name))
        self._seg_cache[name] = payload
        return name

    def _pack_segments(self, manifest: dict, parent_m: dict) -> dict:
        """Convert a built (inline) manifest to segment form when the
        table is large: append-shaped commits reference the parent's
        segments plus ONE delta segment; anything else repacks fresh.
        Small tables stay inline (readable, debuggable)."""
        files = manifest.get("files") or []
        if len(files) < self.SEGMENT_MIN_FILES:
            return manifest
        stats = manifest.get("stats") or {}
        fseq = manifest.get("file_seq") or {}
        p_segs = (parent_m or {}).get("segments") or []
        segments = None
        if p_segs and len(p_segs) < self.SEGMENT_MAX_COUNT:
            pf = parent_m["files"]
            n = len(pf)
            p_stats = parent_m.get("stats", {})
            p_fseq = parent_m.get("file_seq", {})
            if (len(files) >= n and files[:n] == pf
                    and all(stats.get(f) == p_stats.get(f) for f in pf)
                    and all(fseq.get(f) == p_fseq.get(f) for f in pf)):
                segments = list(p_segs)
                delta = files[n:]
                if delta:
                    segments.append(
                        self._write_segment(delta, stats, fseq))
        if segments is None:
            segments = [self._write_segment(files, stats, fseq)]
        out = {k: v for k, v in manifest.items()
               if k not in ("files", "stats", "file_seq")}
        out["segments"] = segments
        out["n_files"] = len(files)
        return out

    def current_version(self) -> int:
        """Highest committed snapshot version (0 = empty table)."""
        if not os.path.isdir(self.meta_dir):
            return 0
        versions = [int(f[1:-5]) for f in os.listdir(self.meta_dir)
                    if f.startswith("v") and f.endswith(".json")
                    and f[1:-5].isdigit()]
        return max(versions, default=0)

    def manifest(self, version=None) -> dict:
        # `is None`, not falsy: version=0 means the EMPTY pre-creation
        # snapshot (so snapshot_diff(from_version=0) = "everything
        # since creation" → all inserts), never "current". A string
        # resolves as a tag name (Iceberg ref analog), so every
        # manifest-routed read (read / files_pruned / snapshot_diff /
        # read_incremental) accepts tags for free.
        if isinstance(version, str):
            version = self.resolve_ref(version)
        # default read head: branch 'main' when branch refs exist
        # (write-audit-publish — staged branch commits advance the log
        # tip but not what default readers see), else the log tip
        v = self._branch_head() if version is None else version
        if v == 0:
            return {"version": 0, "files": [], "schema": None, "parent": None}
        with open(self._manifest_path(v)) as f:
            return self._hydrate(json.load(f))

    def exists(self) -> bool:
        return self.current_version() > 0

    # -- write ------------------------------------------------------------

    def _commit_manifest(self, build, max_attempts: int = 64,
                         branch: Optional[str] = None) -> int:
        """Optimistic-concurrency manifest publish (Iceberg-style commit
        CAS): compose the manifest against the current parent, then
        claim the next version file with ``os.link`` — an atomic
        create-exclusive on POSIX, so exactly ONE of two racing writers
        wins a given version. The loser re-reads the new parent and
        rebuilds (its file list then INCLUDES the winner's files in
        append mode — no lost update) and retries.

        ``build(parent, parent_manifest)`` returns the manifest dict
        sans version/parent, re-evaluated per attempt.

        On a table WITH branch refs, every commit targets a branch
        (default ``main``): the parent is that branch's head — not the
        log tip — and the branch ref advances with the commit. These
        commits serialize under the refs lock (the parent-equals-
        claimed-version-minus-one invariant that makes the lock-free
        CAS safe does not hold once heads and the log tip diverge, so
        two same-branch writers could otherwise both build from the
        same head and silently drop one append). Tables that never
        branched keep the lock-free path bit-for-bit.
        """
        os.makedirs(self.meta_dir, exist_ok=True)
        if self.branches():
            return self._commit_manifest_branched(build, max_attempts,
                                                  branch or "main")
        if branch not in (None, "main"):
            raise KeyError(
                f"{self.path}: no branch {branch!r} — create_branch first")
        for _ in range(max_attempts):
            parent = self.current_version()
            parent_m = self.manifest(parent)
            manifest = self._pack_segments(build(parent, parent_m),
                                           parent_m)
            version = parent + 1
            manifest["version"] = version
            manifest["parent"] = parent or None
            tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            try:
                os.link(tmp, self._manifest_path(version))
                return version
            except FileExistsError:
                continue  # lost the race — rebuild against new parent
            finally:
                os.remove(tmp)
        raise RuntimeError(
            f"{self.path}: manifest commit contention exceeded "
            f"{max_attempts} attempts")

    def _commit_manifest_branched(self, build, max_attempts: int,
                                  name: str) -> int:
        """Branch-targeted commit: build from the branch head, claim
        the next LOG version (the snapshot log stays one linear,
        gapless sequence — branches are refs INTO it, the Iceberg
        model), advance the ref. Runs under the refs lock (see
        :meth:`_commit_manifest`)."""
        with self._refs_lock():
            br = self.branches()
            if name != "main" and name not in br:
                raise KeyError(
                    f"{self.path}: no branch {name!r} "
                    f"(branches: {sorted(br)})")
            parent = br.get(name, self.current_version())
            parent_m = self.manifest(parent)
            manifest = self._pack_segments(build(parent, parent_m),
                                           parent_m)
            manifest["parent"] = parent or None
            manifest["branch"] = name
            for _ in range(max_attempts):
                # the log tip can still advance under us: a process
                # holding a pre-branch view of the table commits
                # lock-free. Retry only the version claim — the parent
                # (the branch head) cannot move while we hold the lock.
                version = self.current_version() + 1
                manifest["version"] = version
                tmp = (self._manifest_path(version)
                       + f".tmp-{uuid.uuid4().hex[:8]}")
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=1)
                try:
                    os.link(tmp, self._manifest_path(version))
                except FileExistsError:
                    continue
                finally:
                    os.remove(tmp)
                refs = {"tags": self.tags(), "branches": self.branches()}
                refs["branches"][name] = version
                self._write_refs_locked(refs)
                return version
        raise RuntimeError(
            f"{self.path}: manifest commit contention exceeded "
            f"{max_attempts} attempts")

    @staticmethod
    def _schema_compatible(new_json: str, old_json: str) -> bool:
        """Additive evolution check: every OLD column must exist in the
        new schema with an identical type/nullability entry; brand-new
        trailing columns are allowed (Iceberg add-column analog — old
        files read as NULL for them via mergeSchema)."""
        new_fields = {json.dumps(f, sort_keys=True)
                      for f in json.loads(new_json)["fields"]}
        return all(json.dumps(f, sort_keys=True) in new_fields
                   for f in json.loads(old_json)["fields"])

    def _stage_data_files(self, df: DataFrame,
                          stats_cols: Optional[tuple[str, ...]] = None,
                          ) -> tuple[list[str], dict]:
        """The one staging protocol every physical write shares
        (write / compact / row-op rewrite): write ``df`` to a private
        staging dir, move the parquet files into ``data/`` under
        uuid-prefixed names (no two commits can collide on a name),
        and collect footer min/max stats. Returns
        ``(new_rel_files, new_stats)``; the caller owns the manifest
        commit."""
        staging = os.path.join(self.path, "_staging", uuid.uuid4().hex[:12])
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(self.data_dir, exist_ok=True)
        new_files = []
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                dst = f"{uuid.uuid4().hex[:8]}-{f}"
                shutil.move(os.path.join(staging, f),
                            os.path.join(self.data_dir, dst))
                new_files.append(dst)
        shutil.rmtree(staging, ignore_errors=True)
        return new_files, self._collect_file_stats(new_files, stats_cols)

    def write(self, df: DataFrame, mode: str = "append",
              properties: Optional[dict] = None,
              allow_schema_evolution: bool = False,
              stats_cols: Optional[tuple[str, ...]] = None,
              branch: Optional[str] = None,
              bloom_cols: Optional[tuple[str, ...]] = None) -> int:
        """Write a new snapshot; returns the committed version.

        mode='append' keeps prior files in the new manifest;
        mode='overwrite' starts the file list fresh (old files stay on
        disk for time travel until `expire_snapshots`).

        ``allow_schema_evolution=True`` accepts an ADDITIVE schema
        change on append (new columns appended; every existing column
        unchanged): the manifest schema advances to the superset and
        reads reconcile old files to NULL for the new columns. Any
        non-additive change still raises.

        ``stats_cols`` selects which columns get per-file min/max
        stats recorded for data skipping (default
        ``DEFAULT_STATS_COLS``) — a labels table can skip on e.g.
        ``lang`` or a bucket id, not just ``phash``.

        ``bloom_cols`` additionally records a per-file bloom bitmap
        for each named column, enabling POINT-lookup file skipping
        (``read(eq=(col, value))``) where min/max ranges are useless —
        e.g. finding one ``image_id`` (a takedown probe) in a table
        whose id ranges all overlap.
        """
        assert mode in ("append", "overwrite")
        os.makedirs(self.meta_dir, exist_ok=True)
        # advisory precheck against the TARGET branch's head (the
        # build-time check inside the commit governs); staging the
        # data files before a doomed commit would only waste the write
        parent = self._branch_head(branch)
        parent_manifest = self.manifest(parent)

        if parent and parent_manifest["schema"] and mode == "append":
            same = (json.loads(df.schema.json())
                    == json.loads(parent_manifest["schema"]))
            if not same and not (
                    allow_schema_evolution
                    and self._schema_compatible(df.schema.json(),
                                                parent_manifest["schema"])):
                raise ValueError(
                    f"schema mismatch appending to {self.path}: table has "
                    f"{parent_manifest['schema']}")

        new_files, new_stats = self._stage_data_files(df, stats_cols)
        if bloom_cols:
            self._merge_blooms_into_stats(
                new_stats, self._collect_file_blooms(new_files, bloom_cols))

        def build(p, pm):
            if p and pm["schema"] and mode == "append":
                same = json.loads(df.schema.json()) == json.loads(pm["schema"])
                if not same and not (
                        allow_schema_evolution
                        and self._schema_compatible(df.schema.json(),
                                                    pm["schema"])):
                    raise ValueError(
                        f"schema mismatch appending to {self.path}: table "
                        f"has {pm['schema']}")
            stats = {} if mode == "overwrite" else dict(pm.get("stats", {}))
            stats.update(new_stats)
            out = {
                "ts": time.time(),
                "files": (new_files if mode == "overwrite"
                          else pm["files"] + new_files),
                "stats": stats,
                "schema": df.schema.json(),
                "properties": properties or {},
            }
            # pending MoR equality deletes survive an append (their
            # seq scoping keeps them off the files this append adds —
            # which a LEGACY seq-less entry cannot honor, so that
            # upgrade corner refuses); an overwrite replaces the whole
            # row set, so its delete debt is moot
            if mode == "append":
                self._require_no_legacy_deletes("write(append)", pm)
            if mode == "append" and pm.get("deletes"):
                out["deletes"] = list(pm["deletes"])
            return self._carry_seq(out, pm, new_files, bump=True,
                                   fresh=(mode == "overwrite"))

        return self._commit_manifest(build, branch=branch)

    def commit_files(self, rel_files: list[str], schema_json: str,
                     mode: str = "append",
                     properties: Optional[dict] = None,
                     replace_prefixes: Optional[list[str]] = None,
                     stats_cols: Optional[tuple[str, ...]] = None,
                     bloom_cols: Optional[tuple[str, ...]] = None,
                     equality_deletes: Optional[list[dict]] = None,
                     clear_deletes: bool = False) -> int:
        """Publish a snapshot manifest over data files ALREADY inside
        ``data/`` (e.g. bucket dirs moved in by the curation ledger's
        atomic commit) without rewriting them. Entries may be relative
        sub-paths like ``bucket=3/part-....parquet``; hive partition
        columns survive reads via basePath. This is how `run_curate`
        gets snapshot lineage: one snapshot per (resumable) commit.

        ``replace_prefixes``: parent entries under any of these
        relative prefixes are DROPPED before the new files append —
        the physical-replacement commit a bucket recompute needs
        (the old bucket dirs were just overwritten on disk, so keeping
        their stale entries would make the snapshot reference deleted
        files).

        ``equality_deletes``: ``[{"file": rel, "cols": [...]}, ...]``
        entries over key files ALREADY inside ``data/``; each is
        stamped with THIS commit's sequence number, so (Iceberg v2
        data-sequence semantics) the delete masks only files from
        OLDER commits — never the files this same commit appends.
        This is the merge-on-read upsert shape for ledger-managed
        tables (``run_curate_increment`` flip commits), which cannot
        go through :meth:`merge_upsert` because row ops refuse on
        ledgered tables. Append mode only, and mutually exclusive
        with ``replace_prefixes`` (a physical replacement commit would
        need rewrite-style seq inheritance — see the NOTE below).

        ``clear_deletes``: drop ALL pending delete entries from the
        new snapshot — the settle commit a bucket-aware debt
        materialization publishes after physically rewriting the
        masked rows' buckets via ``replace_prefixes``.
        """
        assert mode in ("append", "overwrite")
        eq_entries = list(equality_deletes or ())
        if eq_entries:
            assert mode == "append", \
                "equality_deletes: append-mode commits only"
            assert not replace_prefixes, \
                "equality_deletes cannot combine with replace_prefixes"
            for e in eq_entries:
                assert e.get("file") and e.get("cols"), \
                    f"malformed equality-delete entry: {e}"
        new_stats = self._collect_file_stats(list(rel_files), stats_cols)
        if bloom_cols:
            self._merge_blooms_into_stats(
                new_stats,
                self._collect_file_blooms(list(rel_files), bloom_cols))
        prefixes = tuple(replace_prefixes or ())

        def build(p, pm):
            if mode == "overwrite":
                kept = []
            else:
                kept = [f for f in pm["files"]
                        if not f.startswith(prefixes)] if prefixes                     else list(pm["files"])
            stats = {} if mode == "overwrite" else {
                f: v for f, v in pm.get("stats", {}).items()
                if not (prefixes and f.startswith(prefixes))}
            stats.update(new_stats)
            out = {
                "ts": time.time(),
                "files": kept + [f for f in rel_files if f not in kept],
                "stats": stats,
                "schema": schema_json,
                "properties": properties or {},
            }
            # see write(): MoR delete debt rides along on appends.
            # NOTE: files landed under replace_prefixes get a FRESH
            # sequence (not the replaced buckets' max) — the settle
            # path that mixes replace_prefixes with pending debt must
            # pass clear_deletes=True (it rewrites from a MoR-resolved
            # read, so no entry may survive to re-mask the fresh-seq
            # files); other replace_prefixes callers (ledger bucket
            # recomputes) hold no debt. A future caller needing
            # partial settle would need rewrite-style seq inheritance
            # like _commit_rewrite's.
            if mode == "append" and not clear_deletes:
                self._require_no_legacy_deletes("commit_files", pm)
            if mode == "append" and pm.get("deletes") and not clear_deletes:
                out["deletes"] = list(pm["deletes"])
            if prefixes and pm.get("deletes") and not clear_deletes:
                raise CommitConflictError(
                    f"{self.path}: commit_files(replace_prefixes=...) "
                    f"while {len(pm['deletes'])} merge-on-read delete "
                    "entr(ies) are pending — replaced files take a "
                    "fresh sequence and would escape the pending "
                    "masks; settle the debt first (clear_deletes=True "
                    "from a MoR-resolved rewrite, or apply_deletes())")
            if eq_entries:
                seq = self._next_seq(pm)
                out["deletes"] = (out.get("deletes") or []) + [
                    {**e, "seq": seq} for e in eq_entries]
            return self._carry_seq(out, pm,
                                   [f for f in rel_files if f not in kept],
                                   bump=True, fresh=(mode == "overwrite"))

        return self._commit_manifest(build)

    DEFAULT_STATS_COLS: tuple[str, ...] = ("phash",)

    def _collect_file_stats(self, rel_files: list[str],
                            cols: Optional[tuple[str, ...]] = None) -> dict:
        """Per-file min/max for `cols` (default ``DEFAULT_STATS_COLS``)
        from the parquet FOOTERS only (no data read) — the
        Iceberg-manifest-stats analog enabling file-level data skipping
        at read time."""
        cols = cols if cols is not None else self.DEFAULT_STATS_COLS
        import pyarrow.parquet as pq

        stats: dict = {}
        for rel in rel_files:
            p = os.path.join(self.data_dir, rel)
            try:
                meta = pq.ParquetFile(p).metadata
            except Exception:
                continue
            names = {meta.schema.column(i).name: i
                     for i in range(meta.num_columns)}
            entry = {}
            for col in cols:
                ci = names.get(col)
                if ci is None:
                    continue
                mins, maxs = [], []
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    entry[col] = [min(mins), max(maxs)]
            if entry:
                stats[rel] = entry
        return stats

    # -- per-file bloom filters (point-lookup skipping) ---------------------

    # reserved key inside a file's stats entry; min/max column names
    # live beside it (a data column literally named "__bloom__" would
    # collide — not a schema this engine produces)
    BLOOM_KEY = "__bloom__"
    DEFAULT_BLOOM_BITS = 1 << 13   # 1 KiB bitmap per (file, column)
    DEFAULT_BLOOM_HASHES = 5

    @staticmethod
    def _bloom_key_bytes(v) -> bytes:
        """Canonical byte encoding of a bloom key. int/str/binary only:
        float equality is not a sane skip key, and NULL membership is
        a stats question, not a bloom one."""
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, str):
            return v.encode("utf-8")
        if isinstance(v, bool) or v is None:
            raise TypeError("bloom keys must be int, string or binary")
        if isinstance(v, int):
            return str(v).encode("ascii")
        raise TypeError("bloom keys must be int, string or binary")

    @staticmethod
    def _bloom_positions(key: bytes, n_bits: int, n_hashes: int):
        for i in range(n_hashes):
            h = hashlib.blake2b(key, digest_size=8,
                                salt=i.to_bytes(8, "little")).digest()
            yield int.from_bytes(h, "little") % n_bits

    def _collect_file_blooms(self, rel_files: list[str],
                             cols: tuple[str, ...],
                             n_bits: int = DEFAULT_BLOOM_BITS,
                             n_hashes: int = DEFAULT_BLOOM_HASHES) -> dict:
        """Per-file bloom bitmaps for ``cols`` — the Parquet
        bloom-filter / Iceberg point-lookup-skipping analog. Unlike the
        footer min/max stats this READS the key columns (columnar, one
        column at a time), which is exactly the cost real engines pay
        to build blooms at write time. A column whose values are not
        int/str/binary is silently skipped (no bloom ⇒ never pruned ⇒
        sound)."""
        import pyarrow.parquet as pq

        out: dict = {}
        for rel in rel_files:
            p = os.path.join(self.data_dir, rel)
            try:
                pf = pq.ParquetFile(p)
            except Exception:
                continue
            entry = {}
            names = set(pf.schema_arrow.names)
            for col in cols:
                if col not in names:
                    continue
                bits = bytearray(n_bits // 8)
                ok = True
                for v in pf.read(columns=[col]).column(col).to_pylist():
                    if v is None:
                        continue
                    try:
                        key = self._bloom_key_bytes(v)
                    except TypeError:
                        ok = False
                        break
                    for pos in self._bloom_positions(key, n_bits,
                                                     n_hashes):
                        bits[pos >> 3] |= 1 << (pos & 7)
                if ok:
                    entry[col] = {
                        "b": base64.b64encode(bytes(bits)).decode("ascii"),
                        "m": n_bits, "k": n_hashes}
            if entry:
                out[rel] = entry
        return out

    @staticmethod
    def _merge_blooms_into_stats(stats: dict, blooms: dict) -> dict:
        for rel, entry in blooms.items():
            stats.setdefault(rel, {})[SnapshotTable.BLOOM_KEY] = entry
        return stats

    @classmethod
    def _stats_layout_of(cls, manifest: dict) -> tuple[tuple, tuple]:
        """(stats_cols, bloom_cols) recorded across a manifest's file
        entries — what a rewrite (compact / row-op) must re-record so
        the table keeps its skipping behavior after the rewrite."""
        stats = manifest.get("stats", {})
        sc = tuple(sorted({c for e in stats.values() for c in e
                           if c != cls.BLOOM_KEY}))
        bc = tuple(sorted({c for e in stats.values()
                           for c in e.get(cls.BLOOM_KEY, {})}))
        return sc, bc

    @classmethod
    def _bloom_may_contain(cls, entry: dict, col: str, value) -> bool:
        """Sound point-skip predicate: False ONLY when the file's
        bloom for ``col`` proves ``value`` absent; missing bloom or an
        un-encodable probe value means 'must scan'."""
        b = (entry or {}).get(cls.BLOOM_KEY, {}).get(col)
        if not b:
            return True
        try:
            key = cls._bloom_key_bytes(value)
        except TypeError:
            return True
        bits = base64.b64decode(b["b"])
        return all(bits[p >> 3] & (1 << (p & 7))
                   for p in cls._bloom_positions(key, b["m"], b["k"]))

    @staticmethod
    def _eq_list(eq) -> list[tuple]:
        """Normalize ``eq``: one (col, value) pair or a list of them."""
        if not eq:
            return []
        if isinstance(eq[0], str):
            return [tuple(eq)]
        return [tuple(e) for e in eq]

    # -- merge-on-read equality deletes --------------------------------------

    @staticmethod
    def _manifest_all_files(m: dict) -> set[str]:
        """Every data-dir file a manifest references: data files plus
        equality-delete key files (retention/orphan logic must treat
        both as live)."""
        files = set(m.get("files", ()))
        files.update(d["file"] for d in m.get("deletes", ()))
        return files

    # helper columns carrying parquet row identity through a masked
    # scan (dropped before rows leave the catalog layer)
    _META_FILE = "_mor_file_path"
    _META_POS = "_mor_row_pos"

    @staticmethod
    def _split_deletes(deletes: list[dict]) -> tuple[list[dict],
                                                     list[dict]]:
        """(equality entries, position entries) of a manifest's
        ``deletes`` list. Equality entries carry ``cols``; position
        entries carry ``kind == 'pos'`` and their files hold
        (file_path, pos) row coordinates."""
        eq = [d for d in deletes if d.get("kind") != "pos"]
        pos = [d for d in deletes if d.get("kind") == "pos"]
        return eq, pos

    # -- sequence-number scoping (Iceberg v2 data-sequence semantics) --------
    #
    # Every commit that adds data files stamps them with the manifest's
    # next sequence number (``last_seq`` + 1, recorded per file in
    # ``file_seq``); an equality-delete commit stamps its entries with
    # ITS sequence number. A delete with seq s masks only files whose
    # seq is < s — so a row re-ingested AFTER a takedown (same key,
    # newer file) is visible, exactly like Iceberg scopes equality
    # deletes to older data files (ADVICE r3 medium: previously a
    # pending delete masked table-wide, silently swallowing later
    # appends that reused a key). Rewrites (compaction, CoW row ops)
    # preserve the MAX sequence of the files they replace, so pending
    # deletes committed after the replaced files still mask the
    # rewritten rows. Legacy manifests (no ``file_seq``) and legacy
    # delete entries (no ``seq``) keep the old table-wide behavior.

    @staticmethod
    def _next_seq(pm: dict) -> int:
        return pm.get("last_seq", 0) + 1

    @staticmethod
    def _carry_seq(out: dict, pm: dict,
                   new_files: Optional[list[str]] = None,
                   bump: bool = False,
                   fresh: bool = False) -> dict:
        """Thread ``file_seq``/``last_seq`` through a manifest build:
        carry the parent's entries (restricted to files the new
        manifest still references), stamp ``new_files`` with the next
        sequence number when ``bump``, start empty when ``fresh``
        (overwrite)."""
        last = pm.get("last_seq", 0)
        # hoist the membership set: inline it and Python rebuilds it
        # per iteration — O(files^2), ~1.3s per commit at 5k files
        live = set(out["files"])
        fseq = {} if fresh else {
            f: s for f, s in pm.get("file_seq", {}).items()
            if f in live}
        if bump:
            last += 1
            for f in new_files or ():
                fseq[f] = last
        if fseq:
            out["file_seq"] = fseq
        if last:
            out["last_seq"] = last
        return out

    def _eq_delete_classes(self, m: dict, files: list[str],
                           eq_dels: list[dict]) -> list[tuple[list[str],
                                                              list[dict]]]:
        """Partition ``files`` by WHICH equality-delete entries apply
        under sequence scoping (entry seq s masks files with seq < s;
        entries without a seq mask everything). Returns
        ``[(files_subset, applicable_entries), ...]`` — one scan per
        class lets every class keep the plain broadcast anti-join plan
        with no per-row file-identity bookkeeping. With no post-delete
        appends this is a single class (the pre-scoping fast path)."""
        fseq = m.get("file_seq", {})
        classes: dict[tuple, list[str]] = {}
        for f in files:
            q = fseq.get(f, 0)
            key = tuple(i for i, d in enumerate(eq_dels)
                        if d.get("seq") is None or q < d["seq"])
            classes.setdefault(key, []).append(f)
        return [(fs, [eq_dels[i] for i in key])
                for key, fs in classes.items()]

    def _attach_row_identity(self, df: DataFrame) -> DataFrame:
        """Expose the parquet source's hidden row identity
        (``_metadata.file_path`` / ``row_index``) as ordinary columns
        so position-delete masks can anti-join on them."""
        from pyspark.sql import functions as F

        return df.select(
            "*",
            F.col("_metadata.file_path").alias(self._META_FILE),
            F.col("_metadata.row_index").alias(self._META_POS))

    def _delete_key_groups(self, spark: SparkSession, deletes: list[dict]):
        """Yield (key_cols, distinct-keys DataFrame) per key-column
        group of a manifest's EQUALITY-delete entries (position
        entries are the other mask — see
        :meth:`_apply_position_deletes`)."""
        from collections import defaultdict

        groups: dict = defaultdict(list)
        for d in deletes:
            if d.get("kind") == "pos":
                continue
            groups[tuple(d["cols"])].append(d["file"])
        for cols, files_ in groups.items():
            keys = (spark.read.parquet(
                *[os.path.join(self.data_dir, f) for f in files_])
                .select(*cols).distinct())
            yield list(cols), keys

    def _position_delete_keys(self, spark: SparkSession,
                              pos_deletes: list[dict]) -> DataFrame:
        """One (file_path, pos) frame over all position-delete files,
        aliased to the helper column names the masked scan carries.
        file_path is stored EXACTLY as ``_metadata.file_path`` yields
        it (absolute URI — same contract as Iceberg position-delete
        files), so the anti-join needs no path surgery."""
        from pyspark.sql import functions as F

        return (spark.read.parquet(
            *[os.path.join(self.data_dir, d["file"]) for d in pos_deletes])
            .select(F.col("file_path").alias(self._META_FILE),
                    F.col("pos").alias(self._META_POS)))

    def _apply_position_deletes(self, spark: SparkSession, df: DataFrame,
                                pos_deletes: list[dict]) -> DataFrame:
        """Anti-join ``df`` (which must carry the row-identity helper
        columns) against the accumulated position-delete coordinates.
        Masks SPECIFIC rows — the flavor that addresses NULL or
        duplicate keys an equality delete cannot."""
        if not pos_deletes:
            return df
        from pyspark.sql import functions as F

        keys = self._position_delete_keys(spark, pos_deletes)
        return df.join(F.broadcast(keys),
                       on=[self._META_FILE, self._META_POS],
                       how="left_anti")

    def _apply_equality_deletes(self, spark: SparkSession, df: DataFrame,
                                deletes: list[dict]) -> DataFrame:
        """Anti-join ``df`` against each key-column group's accumulated
        delete keys. Callers pass only the entries that APPLY to the
        files ``df`` was scanned from (sequence scoping is decided at
        the file level by :meth:`_eq_delete_classes`; within a class
        every entry masks every matching row)."""
        if not deletes:
            return df
        from pyspark.sql import functions as F

        for cols, keys in self._delete_key_groups(spark, deletes):
            df = df.join(F.broadcast(keys), on=cols, how="left_anti")
        return df

    def _equality_delete_matches(self, spark: SparkSession, df: DataFrame,
                                 deletes: list[dict]) -> DataFrame:
        """Rows of ``df`` a delete key masks (union of per-group
        semi-joins) — the detection complement of
        :meth:`_apply_equality_deletes`."""
        from functools import reduce

        from pyspark.sql import functions as F

        parts = [df.join(F.broadcast(keys), on=cols, how="left_semi")
                 for cols, keys in self._delete_key_groups(spark, deletes)]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _require_no_pending_deletes(self, op: str, m: dict) -> None:
        if m.get("deletes"):
            raise CommitConflictError(
                f"{self.path}: {op} is a copy-on-write rewrite but the "
                f"current snapshot carries {len(m['deletes'])} pending "
                f"merge-on-read delete file(s); run apply_deletes() "
                f"(or compact()) to materialize them first")

    def _require_no_legacy_deletes(self, op: str, pm: dict) -> None:
        """Append-shaped commits (write append, commit_files,
        MoR merge/update) rely on sequence scoping to keep pending
        equality deletes off the rows they add — but a LEGACY
        (seq-less, pre-upgrade) entry masks TABLE-WIDE, so the new
        rows would commit and then be silently invisible on every
        read (the exact corner compact's legacy guard aborts on).
        Refuse: settle the debt once, then the table is upgraded."""
        legacy = [d for d in (pm.get("deletes") or [])
                  if d.get("kind") != "pos" and d.get("seq") is None]
        if legacy:
            raise CommitConflictError(
                f"{self.path}: {op} appends rows, but {len(legacy)} "
                "pending LEGACY (seq-less) equality-delete entr(ies) "
                "mask table-wide — the appended rows would be "
                "silently invisible; run apply_deletes() (or "
                "compact()) once to settle the pre-upgrade debt")

    def _require_no_pending_pos_deletes(self, op: str, m: dict) -> None:
        pos = self._split_deletes(m.get("deletes") or [])[1]
        if pos:
            raise CommitConflictError(
                f"{self.path}: {op} rewrites (renames) data files but "
                f"the current snapshot carries {len(pos)} pending "
                f"POSITION delete file(s) pinning (file, ordinal) "
                f"coordinates; run apply_deletes() (or compact()) to "
                f"materialize them first")

    # -- read ---------------------------------------------------------------

    @staticmethod
    def _between_list(between) -> list[tuple]:
        """Normalize ``between``: one (col, lo, hi) triple or a list of
        them (multi-column skipping over a z-ordered layout ANDs the
        per-column prunes)."""
        if not between:
            return []
        if isinstance(between[0], str):
            return [tuple(between)]
        return [tuple(b) for b in between]

    @staticmethod
    def _stats_may_overlap(entry: dict, col: str, lo, hi) -> bool:
        """Sound file-skip predicate: False ONLY when the file's
        recorded [min, max] for ``col`` provably cannot intersect
        [lo, hi]; missing or incomparable stats mean 'must scan'.
        The ONE copy of this rule (read / files_pruned / delete_ids /
        merge detection all route here — a soundness fix must not
        have to chase four duplicates)."""
        rng = entry.get(col)
        if rng is None:
            return True
        try:
            return not (rng[1] < lo or rng[0] > hi)
        except TypeError:
            return True

    def _select_files(self, m: dict, between, eq) -> list[str]:
        """File-level pruning shared by read/files_pruned: min/max
        range skipping for ``between`` triples, min/max (lo=hi) AND
        bloom skipping for ``eq`` pairs. Files without the relevant
        stats are always kept (skipping is sound, never lossy)."""
        stats = m.get("stats", {})
        files = list(m["files"])
        for col, lo, hi in self._between_list(between):
            files = [f for f in files
                     if self._stats_may_overlap(stats.get(f, {}),
                                                col, lo, hi)]
        for col, v in self._eq_list(eq):
            files = [f for f in files
                     if self._stats_may_overlap(stats.get(f, {}), col, v, v)
                     and self._bloom_may_contain(stats.get(f, {}), col, v)]
        return files

    def read(self, spark: SparkSession,
             version=None,
             between=None, eq=None) -> DataFrame:
        """Read a snapshot; `between=(col, lo, hi)` — or a LIST of such
        triples (ANDed; the multi-column read a z-ordered layout
        serves) — additionally prunes at the FILE level using the
        manifest's per-file min/max stats (files whose range cannot
        overlap are never opened — the Iceberg data-skipping analog)
        and applies the row-level filter on what remains. Files
        without recorded stats are always read (skipping must be
        sound, never lossy).

        ``eq=(col, value)`` — or a list of pairs (ANDed) — is the
        POINT-lookup form: files are skipped via min/max AND via the
        per-file bloom bitmaps recorded by ``write(bloom_cols=...)``
        (a bloom miss proves the value absent from the file), then the
        equality filter applies row-level."""
        m = self.manifest(version)
        if not m["files"]:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        files = self._select_files(m, between, eq)
        from pyspark.sql import functions as F

        if not files:
            # empty selection: preserve schema via a no-row filter
            full = (spark.read.option("basePath", self.data_dir)
                    .option("mergeSchema", "true").parquet(
                        *[os.path.join(self.data_dir, f)
                          for f in m["files"]]))
            return full.filter(F.lit(False))
        eq_dels, pos_dels = self._split_deletes(m.get("deletes") or [])
        # merge-on-read: pending deletes of THIS manifest version mask
        # their rows on every read (delete keys/coordinates are tiny —
        # broadcast anti-joins, no shuffle of the data side). Sequence
        # scoping partitions the selected files into classes by which
        # equality entries apply (one class — one scan, the plain plan
        # — unless data was appended after a delete commit).
        parts = []
        for fs, dels_c in self._eq_delete_classes(m, files, eq_dels):
            # basePath keeps hive-style partition columns (bucket=k)
            # when manifests reference files inside partition dirs;
            # mergeSchema reconciles pre-evolution files (missing
            # columns read as NULL)
            part = (spark.read.option("basePath", self.data_dir)
                    .option("mergeSchema", "true")
                    .parquet(*[os.path.join(self.data_dir, f)
                               for f in fs]))
            if pos_dels:
                # row identity must come off the scan itself
                # (projections sever the hidden _metadata column)
                part = self._attach_row_identity(part)
            parts.append(
                self._apply_equality_deletes(spark, part, dels_c))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part, allowMissingColumns=True)
        for col, lo, hi in self._between_list(between):
            df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        for col, v in self._eq_list(eq):
            df = df.filter(F.col(col) == v)
        if pos_dels:
            df = (self._apply_position_deletes(spark, df, pos_dels)
                  .drop(self._META_FILE, self._META_POS))
        return df

    def files_pruned(self, between,
                     version=None, eq=None) -> tuple[int, int]:
        """(selected, total) file counts for a range/point read — the
        observable data-skipping ratio (used by tests/monitoring).
        ``between`` is one (col, lo, hi) triple or a list (ANDed);
        ``eq`` one (col, value) pair or a list (bloom + min/max)."""
        m = self.manifest(version)
        sel = self._select_files(m, between, eq)
        return len(sel), len(m["files"])

    def read_incremental(self, spark: SparkSession, since_version: int,
                         to_version: Optional[int] = None) -> DataFrame:
        """Rows appended AFTER `since_version` up to `to_version`
        (default current) — the incremental/CDC-append read: exactly
        the files newer manifests added, never a rescan of the old
        snapshot."""
        to_m = self.manifest(to_version)
        base = set(self.manifest(since_version)["files"]) if since_version else set()
        new_files = [f for f in to_m["files"] if f not in base]
        if not new_files:
            raise FileNotFoundError(
                f"{self.path}: no files added between v{since_version} "
                f"and v{to_m['version']}")
        # rows appended then MoR-deleted before to_version must not
        # surface in the incremental read (sequence-scoped, same as
        # read(): a delete only masks files older than itself)
        eq_dels, pos_dels = self._split_deletes(to_m.get("deletes") or [])
        parts = []
        for fs, dels_c in self._eq_delete_classes(to_m, new_files,
                                                  eq_dels):
            part = (spark.read.option("basePath", self.data_dir)
                    .parquet(*[os.path.join(self.data_dir, f)
                               for f in fs]))
            if pos_dels:
                part = self._attach_row_identity(part)
            parts.append(
                self._apply_equality_deletes(spark, part, dels_c))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part, allowMissingColumns=True)
        if pos_dels:
            df = (self._apply_position_deletes(spark, df, pos_dels)
                  .drop(self._META_FILE, self._META_POS))
        return df

    def snapshot_diff(self, spark: SparkSession, from_version: int,
                      to_version: Optional[int] = None,
                      id_col: str = "image_id") -> DataFrame:
        """Row-level changelog between two snapshots — the Iceberg
        ``create_changelog_view`` analog: one frame of changed rows
        tagged ``_change_type`` in {insert, delete, update_before,
        update_after} ("what did the takedown/re-scrub actually touch
        between v3 and v9?").

        File-level pruning makes this cheap at scale: data files are
        immutable and every row op / compaction writes NEW names, so a
        file present in BOTH manifests holds identical rows — only
        files unique to either side are read (a diff after a 1%-file
        rewrite scans ~2% of the table, never all of it). Rows that
        merely MOVED files unchanged (compaction, rewrite collateral
        of an update to a neighboring row in the same file) null-safe
        compare equal across sides and are suppressed.

        Requires ``id_col`` values unique per snapshot — the same
        contract :meth:`merge_upsert` enforces on its source. Columns
        added/dropped by schema evolution align as NULLs on the side
        missing them (so adding a column does NOT by itself mark every
        row updated unless values differ from NULL).
        """
        from pyspark.sql import functions as F

        mf, mt = self.manifest(from_version), self.manifest(to_version)
        f_del = mf.get("deletes") or []
        t_del = mt.get("deletes") or []
        if f_del == t_del:
            # identical pending MoR deletes mask the same rows on both
            # sides — shared files still compare equal, pruning stays
            # sound
            common = set(mf["files"]) & set(mt["files"])
        else:
            # a MoR delete changes row content WITHOUT changing any
            # data file, so file-level pruning would miss it: fall back
            # to comparing the full (masked) row sets of both sides
            common = set()
        f_only = [f for f in mf["files"] if f not in common]
        t_only = [f for f in mt["files"] if f not in common]

        def side(files, other, dels, m_side):
            eq_d, pos_d = self._split_deletes(dels)
            if files:
                parts = []
                for fs, dels_c in self._eq_delete_classes(m_side, files,
                                                          eq_d):
                    part = self._read_rel_files(spark, fs,
                                                with_pos=bool(pos_d))
                    parts.append(self._apply_equality_deletes(
                        spark, part, dels_c))
                df = parts[0]
                for part in parts[1:]:
                    df = df.unionByName(part, allowMissingColumns=True)
            else:
                src = other if other else mt["files"]
                df = (self._read_rel_files(spark, src)
                      .filter(F.lit(False)))
                pos_d = []  # no rows to mask
            if pos_d:
                df = (self._apply_position_deletes(spark, df, pos_d)
                      .drop(self._META_FILE, self._META_POS))
            return df

        a = side(f_only, t_only, f_del, mf)
        b = side(t_only, f_only, t_del, mt)
        all_cols = list(dict.fromkeys([*a.columns, *b.columns]))
        for c in all_cols:
            if c not in a.columns:
                a = a.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
            if c not in b.columns:
                b = b.withColumn(c, F.lit(None).cast(a.schema[c].dataType))
        if id_col not in all_cols:
            raise ValueError(f"id_col {id_col!r} not in table columns "
                             f"{all_cols}")
        val_cols = [c for c in all_cols if c != id_col]
        a = a.select(*all_cols).withColumn("_a", F.lit(True)).alias("a")
        b = b.select(*all_cols).withColumn("_b", F.lit(True)).alias("b")
        j = a.join(b, F.col(f"a.{id_col}").eqNullSafe(F.col(f"b.{id_col}")),
                   "full_outer")
        in_a = F.col("a._a").isNotNull()
        in_b = F.col("b._b").isNotNull()
        same = F.struct(*[F.col(f"a.{c}") for c in val_cols]).eqNullSafe(
            F.struct(*[F.col(f"b.{c}") for c in val_cols]))

        def tagged(side_, tag):
            return F.struct(*([F.col(f"{side_}.{c}").alias(c)
                               for c in all_cols]
                              + [F.lit(tag).alias("_change_type")]))

        # ONE pass over the join (a 4-way union of filtered branches
        # would re-execute the join — and the changed-file reads under
        # it — once per change type): unchanged rows drop, matched-
        # and-different rows explode into their before/after pair.
        return (j.filter(~(in_a & in_b & same))
                .select(F.explode(
                    F.when(in_a & ~in_b, F.array(tagged("a", "delete")))
                    .when(in_b & ~in_a, F.array(tagged("b", "insert")))
                    .otherwise(F.array(tagged("a", "update_before"),
                                       tagged("b", "update_after"))))
                    .alias("_chg"))
                .select("_chg.*"))

    def compact(self, spark: SparkSession, target_files: int = 8,
                properties: Optional[dict] = None,
                cluster_by: Optional[tuple[str, ...]] = None) -> int:
        """Rewrite-data-files analog (the small-files cure): read the
        current snapshot, coalesce into ``target_files`` right-sized
        files, and commit them as a NEW overwrite snapshot with the
        same rows. Streaming ingestion commits one file set per
        micro-batch, so a long-lived table accumulates many small
        files — at corpus scale each tiny file costs a scheduler task
        and a footer read; periodic compaction keeps scan parallelism
        matched to data volume. Time travel still sees the
        pre-compaction snapshots until ``expire_snapshots``.

        ``cluster_by=(colA, colB, ...)`` additionally Z-ORDERS the
        rewrite (OPTIMIZE ZORDER BY analog): rows are range-partitioned
        on the interleaved-bit Morton value of the named numeric
        columns, so every output file covers a tight hyper-rectangle
        in ALL of them and range reads on ANY clustered column prune
        files (see :mod:`..operators.zorder`). Stats for the clustered
        columns are recorded so :meth:`read`'s ``between`` pruning
        sees them.

        Refused on LEDGER-managed tables (a run_curate output): their
        layout is already one right-sized file per phash bucket, the
        ledger's resume bookkeeping assumes that hive layout, and
        writing flat compacted files beside ``bucket=k/`` dirs would
        leave mixed-depth leaves that break raw directory reads.
        """
        if os.path.exists(os.path.join(self.path, "_ledger", "ledger.json")):
            raise ValueError(
                f"{self.path} is a ledger-managed curate table: its "
                "bucket=k layout is already compacted (one file per "
                "bucket) and is owned by the resume ledger; compaction "
                "applies to snapshot-native (e.g. streaming-ingested) "
                "tables")
        base = self.manifest()
        base_files = set(base["files"])
        # stats columns follow the base snapshot's recorded stats (a
        # table skipping on e.g. ivf_cell keeps skipping after
        # compaction — defaulting to DEFAULT_STATS_COLS here silently
        # destroyed data skipping for non-default tables)
        base_stat_cols, base_bloom_cols = self._stats_layout_of(base)
        if cluster_by:
            from mehc_curation_spark.operators.zorder import zorder_layout

            # z-value normalization needs per-column [lo, hi]; the
            # manifest footer stats already hold them per file — fold
            # min-of-mins/max-of-maxs and skip zorder_layout's
            # full-table aggregate whenever EVERY file has an entry
            # for EVERY clustered column (else one agg pass, sound)
            stats = base.get("stats", {})
            ranges = None
            folded = []
            for c in cluster_by:
                per_file = [stats.get(f, {}).get(c) for f in base["files"]]
                if any(r is None for r in per_file) or not per_file:
                    folded = None
                    break
                folded.append((min(r[0] for r in per_file),
                               max(r[1] for r in per_file)))
            ranges = folded
            df = zorder_layout(self.read(spark), cluster_by,
                               max(1, target_files), ranges=ranges)
            stat_cols = tuple(sorted(set(base_stat_cols) | set(cluster_by)))
        else:
            df = self.read(spark).coalesce(max(1, target_files))
            stat_cols = base_stat_cols
        new_files, new_stats = self._stage_data_files(
            df, stat_cols or None)
        if base_bloom_cols:
            self._merge_blooms_into_stats(
                new_stats,
                self._collect_file_blooms(new_files, base_bloom_cols))

        def build(p, pm):
            # Concurrency-safe rewrite: the compacted files REPLACE the
            # base snapshot's files, but anything a concurrent append
            # committed since the base is carried forward untouched —
            # a plain overwrite would silently drop those rows (real
            # Iceberg rewrite_data_files validates the same conflict).
            #
            # Conflict ABORT (ADVICE r2): if a concurrent overwrite /
            # replace commit removed base files from the current
            # manifest, committing the compacted rewrite would
            # RESURRECT rows the overwrite logically deleted — real
            # Iceberg rewrite_data_files fails validation here, and so
            # do we. (Carrying forward only appends is sound ONLY while
            # every base file is still referenced.)
            if base_files - set(pm["files"]):
                missing = sorted(base_files - set(pm["files"]))[:3]
                raise CommitConflictError(
                    f"{self.path}: compaction base snapshot "
                    f"v{base['version']} was invalidated by a concurrent "
                    f"overwrite/replace commit (base files no longer "
                    f"referenced, e.g. {missing}); re-run compact() "
                    f"against the current snapshot")
            extra = [f for f in pm["files"] if f not in base_files]
            stats = {f: v for f, v in pm.get("stats", {}).items()
                     if f in extra}
            stats.update(new_stats)
            # the compaction read() already applied the BASE snapshot's
            # pending MoR deletes, so those entries are settled here;
            # delete commits that landed since base carry forward (the
            # read-time anti-join still masks their rows — sound).
            # Sequence scoping makes settling safe under concurrent
            # appends: a base delete's seq is <= base last_seq, every
            # 'extra' file appended since has a larger seq, so the
            # settled entries never masked the carried-forward rows
            # and settling cannot unmask anything. Only LEGACY
            # (seq-less, table-wide) entries could — abort in that
            # upgrade corner rather than silently change row content
            # (ADVICE r3 low).
            settled_entries = base.get("deletes", [])
            settled = {d["file"] for d in settled_entries}
            carried = [d for d in pm.get("deletes", [])
                       if d["file"] not in settled]
            extra_since_base = [f for f in pm["files"]
                                if f not in base_files]
            if extra_since_base and any(
                    d.get("seq") is None and d.get("kind") != "pos"
                    for d in settled_entries):
                raise CommitConflictError(
                    f"{self.path}: compaction would settle a legacy "
                    f"(sequence-less, table-wide) equality delete while "
                    f"{len(extra_since_base)} file(s) were appended "
                    f"concurrently — settling would unmask their "
                    f"matching rows; run apply_deletes() first, then "
                    f"re-run compact()")
            if any(d.get("kind") == "pos" for d in carried):
                raise CommitConflictError(
                    f"{self.path}: compaction raced a concurrent "
                    f"POSITION delete whose coordinates pin files the "
                    f"rewrite replaced; re-run compact() against the "
                    f"current snapshot")
            out = {
                "ts": time.time(),
                "files": new_files + extra,
                "stats": stats,
                "schema": base["schema"],
                # CURRENT manifest's properties carry forward (merged
                # under caller overrides): compacting a table whose
                # properties hold application state — e.g. a persisted
                # IVF index's centroid matrix — must not brick it
                "properties": {**pm.get("properties", {}),
                               **(properties or {}), "compaction": True,
                               **({"cluster_by": list(cluster_by)}
                                  if cluster_by else {})},
            }
            if carried:
                out["deletes"] = carried
            # rewritten files inherit the MAX sequence of the files
            # they replace (Iceberg rewrite semantics): deletes
            # committed concurrently (seq > every base file) keep
            # masking the compacted rows
            out = self._carry_seq(out, pm)
            base_seq = max((pm.get("file_seq", {}).get(f, 0)
                            for f in base_files), default=0)
            if base_seq:
                fseq = out.setdefault("file_seq", {})
                for f in new_files:
                    fseq[f] = base_seq
            return out

        return self._commit_manifest(build)

    # -- health & maintenance -----------------------------------------------

    def health(self, small_file_bytes: int = 32 << 20) -> dict:
        """Table-health report — the numbers a maintenance scheduler
        (or an operator) decides from: data-file count and size
        distribution (small-file pressure, size skew), pending
        merge-on-read delete debt, retained snapshot count, and
        unreferenced (orphan-candidate) files on disk. Manifest +
        filesystem metadata only — no SparkSession, no data read, so
        it is safe to poll from monitoring at any frequency."""
        m = self.manifest()
        cur = self.current_version()
        sizes, missing = [], 0
        for f in m["files"]:
            try:
                sizes.append(os.path.getsize(
                    os.path.join(self.data_dir, f)))
            except OSError:
                missing += 1
        sizes.sort()
        n = len(sizes)
        median = sizes[n // 2] if n else 0
        known: set[str] = set()
        n_manifests = 0
        for v in range(1, cur + 1):
            if os.path.exists(self._manifest_path(v)):
                n_manifests += 1
                known.update(self._manifest_all_files(self.manifest(v)))
        unreferenced = 0
        if os.path.isdir(self.data_dir):
            for root, _d, fnames in os.walk(self.data_dir):
                for f in fnames:
                    if f.startswith(".") or f.startswith("_"):
                        continue  # sidecars follow their targets
                    rel = os.path.relpath(os.path.join(root, f),
                                          self.data_dir)
                    if rel not in known:
                        unreferenced += 1
        dels = m.get("deletes") or []
        return {
            "version": m["version"],
            "read_head": self._branch_head(),
            "data_files": len(m["files"]),
            "files_missing_on_disk": missing,
            "bytes_total": sum(sizes),
            "file_bytes_median": median,
            "file_bytes_max": sizes[-1] if sizes else 0,
            "small_files": sum(1 for s in sizes if s < small_file_bytes),
            "small_file_bytes": small_file_bytes,
            "size_skew": (round(sizes[-1] / median, 2) if median
                          else None),
            "pending_delete_files": len(dels),
            "pending_position_delete_files": len(
                self._split_deletes(dels)[1]),
            "snapshots_retained": n_manifests,
            "unreferenced_files": unreferenced,
            # manifest-metadata shape: segment count of the head
            # manifest (0 = inline small-table form) and the head
            # manifest's on-disk byte size — the number that stays
            # O(delta) per append once the table is segment-packed
            "manifest_segments": len(m.get("segments") or []),
            "manifest_bytes": (os.path.getsize(
                self._manifest_path(m["version"]))
                if m.get("version") else 0),
            "ledger_managed": os.path.exists(
                os.path.join(self.path, "_ledger", "ledger.json")),
        }

    def maintain(self, spark: SparkSession, target_files: int = 8,
                 keep_last: int = 2,
                 small_file_bytes: int = 32 << 20,
                 compact_over: Optional[int] = None,
                 orphan_older_than_sec: float = 86400.0) -> dict:
        """Run exactly the maintenance this table's health warrants, in
        the safe order: settle merge-on-read delete debt, cure
        small-file pressure, expire old snapshots, sweep orphans.
        Returns ``{"before": health, "actions": [...], "after":
        health}`` so a scheduler's log is self-describing.

        Compaction triggers when the file count exceeds
        ``compact_over`` (default ``4 * target_files``) or the median
        file is under ``small_file_bytes`` with more files than
        ``target_files``. When compaction runs it settles delete debt
        itself (one rewrite); ``apply_deletes`` runs only when debt is
        pending WITHOUT a compaction. Ledger-managed curate tables
        skip compaction (their bucket layout is owned by the resume
        ledger — compact via ``compact_increments``) but still expire
        and sweep."""
        before = self.health(small_file_bytes)
        actions: list[dict] = []
        threshold = compact_over if compact_over is not None \
            else 4 * target_files
        want_compact = not before["ledger_managed"] and (
            before["data_files"] > threshold
            or (before["data_files"] > target_files
                and before["file_bytes_median"] < small_file_bytes))
        if want_compact:
            v = self.compact(spark, target_files=target_files)
            actions.append({"action": "compact", "version": v})
        elif before["pending_delete_files"]:
            v = self.apply_deletes(spark)
            actions.append({"action": "apply_deletes", "version": v})
        if before["snapshots_retained"] > keep_last:
            removed = self.expire_snapshots(keep_last=keep_last)
            actions.append({"action": "expire", "files_removed": removed})
        orph = self.remove_orphan_files(
            older_than_sec=orphan_older_than_sec)
        if orph:
            actions.append({"action": "orphans", "files_removed": orph})
        return {"before": before, "actions": actions,
                "after": self.health(small_file_bytes)}

    # -- row-level changes (copy-on-write) ----------------------------------
    #
    # Iceberg v2 exposes row-level DELETE / UPDATE / MERGE; in
    # copy-on-write mode the engine rewrites ONLY the data files that
    # contain affected rows and swaps them in one atomic commit
    # (untouched files are never opened for write). These are the
    # operations a 10^12-image corpus cannot live without: takedown /
    # right-to-be-forgotten deletes by image id, in-place caption
    # re-scrubs when a new PII pattern ships, and MERGE-style upserts
    # of corrected labels. The emulation mirrors that contract:
    # affected-file detection is a pruned scan, the rewrite touches
    # only affected files, and the commit aborts (CommitConflictError)
    # if a concurrent overwrite/compaction invalidated them —
    # concurrent APPENDS are carried forward untouched
    # (snapshot-isolation, same level as `compact`).

    _FILE_COL = "_cow_file"

    def _refuse_on_ledger(self, op: str) -> None:
        if os.path.exists(os.path.join(self.path, "_ledger", "ledger.json")):
            raise ValueError(
                f"{self.path} is a ledger-managed curate table: its "
                f"bucket=k file layout is owned by the resume ledger; "
                f"{op} would write flat rewritten files beside the "
                "bucket dirs and break the ledger's resume bookkeeping. "
                "Re-run the curation increment instead.")

    def _read_rel_files(self, spark: SparkSession,
                        rel_files: list[str],
                        with_file_col: bool = False,
                        align_to: Optional[str] = None,
                        with_pos: bool = False) -> DataFrame:
        """Read exactly ``rel_files`` (manifest-relative); optionally
        tag each row with its source file (relative path) so affected
        files can be identified distributively.

        ``align_to`` (a schema JSON string, normally the pinned
        manifest schema) reconciles schema evolution: columns the
        selected files predate are added as typed NULLs and the
        column order follows the pinned schema — without it, a row op
        whose affected files all predate an added column would fail
        to resolve that column (mergeSchema only merges what the
        READ files contain)."""
        from pyspark.sql import functions as F

        df = (spark.read.option("basePath", self.data_dir)
              .option("mergeSchema", "true")
              .parquet(*[os.path.join(self.data_dir, f)
                         for f in rel_files]))
        if with_pos:
            # off the raw scan, BEFORE any projection severs _metadata
            df = self._attach_row_identity(df)
        if align_to:
            from pyspark.sql.types import StructType

            target = StructType.fromJson(json.loads(align_to))
            for field in target.fields:
                if field.name not in df.columns:
                    df = df.withColumn(field.name,
                                       F.lit(None).cast(field.dataType))
            df = df.select(*([f.name for f in target.fields]
                             + ([self._META_FILE, self._META_POS]
                                if with_pos else [])))
        if with_file_col:
            df = df.withColumn(self._FILE_COL, F.input_file_name())
        return df

    def _rel_from_uri(self, uri: str) -> str:
        """Map an ``input_file_name()`` URI (percent-encoded ``file:``
        URI with a scheme-dependent slash count) back to the
        manifest-relative path."""
        from urllib.parse import unquote, urlparse

        path = unquote(urlparse(uri).path) if "://" in uri or \
            uri.startswith("file:") else uri
        return os.path.relpath(path, self.data_dir)

    def _collect_affected(self, matched: DataFrame) -> list[str]:
        """Distinct source files of ``matched`` rows, manifest-relative
        (one short string per file crosses the driver — the same
        manifest-level bookkeeping real Iceberg does driver-side)."""
        return sorted({self._rel_from_uri(r[0])
                       for r in matched.select(self._FILE_COL)
                       .distinct().collect()})

    def _commit_rewrite(self, spark: SparkSession, affected: list[str],
                        rewritten: DataFrame, op: str,
                        properties: Optional[dict] = None,
                        clear_deletes: Optional[list[str]] = None) -> int:
        """Shared copy-on-write tail: stage-write ``rewritten`` (the
        full replacement content for ``affected``), move the files in,
        and commit a manifest where the affected files are swapped for
        the new ones. Aborts if a concurrent commit removed any
        affected file from the current manifest (overwrite/compaction
        conflict); files appended concurrently are carried forward.

        Pending MoR equality-delete entries also carry forward (they
        mask table-wide regardless of which file holds a row), minus
        any named in ``clear_deletes`` — the entries the caller just
        materialized into ``rewritten`` (see :meth:`apply_deletes`)."""
        base = self.manifest()
        base_stat_cols, base_bloom_cols = self._stats_layout_of(base)
        # keep file granularity ~the rewritten file count (coalesce =
        # no extra shuffle; a join upstream already repartitioned)
        new_files, new_stats = self._stage_data_files(
            rewritten.coalesce(max(1, len(affected))),
            base_stat_cols or None)
        if base_bloom_cols:
            self._merge_blooms_into_stats(
                new_stats,
                self._collect_file_blooms(new_files, base_bloom_cols))
        affected_set = set(affected)

        def build(p, pm):
            missing = affected_set - set(pm["files"])
            if missing:
                raise CommitConflictError(
                    f"{self.path}: {op} base snapshot v{base['version']} "
                    f"was invalidated by a concurrent overwrite/rewrite "
                    f"commit (affected files no longer referenced, e.g. "
                    f"{sorted(missing)[:3]}); re-run {op} against the "
                    f"current snapshot")
            kept = [f for f in pm["files"] if f not in affected_set]
            stats = {f: v for f, v in pm.get("stats", {}).items()
                     if f not in affected_set}
            stats.update(new_stats)
            out = {
                "ts": time.time(),
                "files": kept + new_files,
                "stats": stats,
                "schema": pm["schema"] or base["schema"],
                "properties": {**pm.get("properties", {}),
                               **(properties or {}), "row_op": op},
            }
            cleared = set(clear_deletes or ())
            carried = [d for d in pm.get("deletes", [])
                       if d["file"] not in cleared]
            # equality entries mask by VALUE and survive any rewrite;
            # a carried POSITION entry pins (file, ordinal) and may
            # reference a file this rewrite just replaced — its masked
            # rows would resurrect. Abort; the caller re-runs against
            # the snapshot that includes the concurrent delete.
            dangling = [d for d in carried if d.get("kind") == "pos"]
            if dangling:
                raise CommitConflictError(
                    f"{self.path}: {op} raced a concurrent POSITION "
                    f"delete ({len(dangling)} pending file(s)) whose "
                    f"coordinates may pin files this rewrite replaced; "
                    f"re-run {op} against the current snapshot")
            if carried:
                out["deletes"] = carried
            if affected_set:
                # rewrite: new files inherit the MAX sequence of the
                # files they replace so concurrent deletes (larger
                # seq) keep masking the rewritten rows
                out = self._carry_seq(out, pm)
                aff_seq = max((pm.get("file_seq", {}).get(f, 0)
                               for f in affected_set), default=0)
                if aff_seq:
                    fseq = out.setdefault("file_seq", {})
                    for f in new_files:
                        fseq[f] = aff_seq
            else:
                # pure insert (merge with no matches): NEW data gets
                # the next sequence number like any append
                out = self._carry_seq(out, pm, new_files, bump=True)
            return out

        return self._commit_manifest(build)

    def delete_where(self, spark: SparkSession, condition,
                     candidate_files: Optional[list[str]] = None,
                     mode: str = "cow",
                     key_cols: tuple[str, ...] = ("image_id",)) -> int:
        """Row-level DELETE: remove every row where ``condition``
        evaluates TRUE (NULL keeps the row — SQL DELETE semantics).

        ``mode='cow'`` (default) rewrites only the files that contain
        matching rows; a no-match delete commits nothing.

        ``mode='mor'`` is the merge-on-read path (Iceberg v2
        equality-delete analog): instead of rewriting data files, the
        matched rows' ``key_cols`` values are written to a small
        delete-key file and recorded in the manifest; every subsequent
        ``read()`` anti-joins the accumulated delete keys. The write
        costs O(matched keys) regardless of table size — the shape a
        latency-sensitive takedown wants — and the debt is settled
        later by ``apply_deletes()`` or ``compact()``. Matched rows
        with a NULL key are refused (an equality delete cannot address
        them).

        ``mode='mor_pos'`` is the POSITION-delete flavor (Iceberg v2
        position-delete analog): the matched rows' (file, row-ordinal)
        coordinates are recorded instead of key values, masking
        exactly those rows — the form that addresses rows with NULL or
        duplicate keys, where an equality delete would be refused or
        over-delete. Coordinates pin specific physical files, so
        copy-on-write rewrites are refused while position debt is
        pending (settle with ``apply_deletes()`` / ``compact()``
        first); equality debt has no such restriction.

        ``condition`` is a SQL string or an UNRESOLVED Column
        (``F.col(...)`` expressions — not a column plucked from some
        other DataFrame). ``candidate_files`` optionally narrows the
        detection scan (callers with manifest-stats knowledge, e.g.
        `delete_ids`, pass the pruned list)."""
        from pyspark.sql import functions as F

        self._refuse_on_ledger("delete_where")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        m = self.manifest()
        if not m["files"]:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        if mode == "mor":
            return self._delete_mor(spark, cond, key_cols,
                                    str(condition))
        if mode == "mor_pos":
            return self._delete_mor_pos(spark, cond, str(condition))
        assert mode == "cow", f"unknown delete mode: {mode}"
        # a CoW rewrite renames files; pending POSITION deletes pin
        # (file, ordinal) coordinates and would dangle — their masked
        # rows would resurrect inside the rewritten file
        self._require_no_pending_pos_deletes("delete_where(mode='cow')",
                                             m)
        cand = list(candidate_files) if candidate_files is not None \
            else list(m["files"])
        if not cand:
            return m["version"]
        scan = self._read_rel_files(spark, cand, with_file_col=True,
                                    align_to=m["schema"])
        affected = self._collect_affected(scan.filter(cond))
        if not affected:
            return m["version"]
        keep = (self._read_rel_files(spark, affected, align_to=m["schema"])
                .filter(~F.coalesce(cond.cast("boolean"), F.lit(False))))
        return self._commit_rewrite(
            spark, affected, keep, "delete",
            properties={"deleted_where": str(condition)})

    def _delete_mor(self, spark: SparkSession, cond, key_cols,
                    cond_str: str) -> int:
        """Merge-on-read delete tail: stage the matched keys as a
        delete file and append it to the manifest's ``deletes`` list
        (data files untouched)."""
        from pyspark.sql import functions as F

        # read() (not a raw file scan) so keys already masked by prior
        # MoR deletes are not re-recorded
        matched = (self.read(spark).filter(cond)
                   .select(*key_cols).distinct())
        null_key = matched.filter(
            " or ".join(f"{c} is null" for c in key_cols))
        if null_key.limit(1).count():
            raise ValueError(
                f"{self.path}: merge-on-read delete matched rows with "
                f"NULL in key columns {key_cols} — an equality delete "
                f"cannot address them; use mode='cow'")
        if not matched.limit(1).count():
            return self.current_version()
        new_files, _ = self._stage_data_files(matched.coalesce(1),
                                              stats_cols=())
        entries = [{"file": f, "cols": list(key_cols)} for f in new_files]

        def build(p, pm):
            # the delete's sequence number scopes it to files already
            # present: rows appended AFTER this commit that reuse a
            # deleted key are NOT masked (Iceberg v2 semantics)
            seq = self._next_seq(pm)
            out = {
                "ts": time.time(),
                "files": list(pm["files"]),
                "stats": dict(pm.get("stats", {})),
                "deletes": (list(pm.get("deletes", []))
                            + [{**e, "seq": seq} for e in entries]),
                "schema": pm["schema"],
                "properties": {**pm.get("properties", {}),
                               "row_op": "delete_mor",
                               "deleted_where": cond_str},
            }
            return self._carry_seq(out, pm, bump=True)

        return self._commit_manifest(build)

    def _delete_mor_pos(self, spark: SparkSession, cond,
                        cond_str: str) -> int:
        """Position-delete tail: record the matched rows' (file_path,
        row-ordinal) coordinates as a delete file (data untouched).
        The masked read below keeps already-deleted coordinates from
        being re-recorded; NULL/duplicate keys are fine — coordinates
        address rows, not values."""
        from pyspark.sql import functions as F

        m = self.manifest()
        eq_d, pos_d = self._split_deletes(m.get("deletes") or [])
        # sequence-scoped masking: one scan per file class so each
        # class anti-joins only the delete entries that apply to it
        parts = []
        for fs, dels_c in self._eq_delete_classes(m, list(m["files"]),
                                                  eq_d):
            part = self._attach_row_identity(
                spark.read.option("basePath", self.data_dir)
                .option("mergeSchema", "true")
                .parquet(*[os.path.join(self.data_dir, f) for f in fs]))
            parts.append(
                self._apply_equality_deletes(spark, part, dels_c))
        scan = parts[0]
        for part in parts[1:]:
            scan = scan.unionByName(part, allowMissingColumns=True)
        scan = self._apply_position_deletes(spark, scan, pos_d)
        matched = (scan.filter(cond)
                   .select(F.col(self._META_FILE).alias("file_path"),
                           F.col(self._META_POS).alias("pos")))
        if not matched.limit(1).count():
            return self.current_version()
        new_files, _ = self._stage_data_files(matched.coalesce(1),
                                              stats_cols=())
        entries = [{"file": f, "kind": "pos"} for f in new_files]
        base_files = set(m["files"])

        def build(p, pm):
            # coordinates pin the files scanned above: a concurrent
            # rewrite that replaced any of them would leave the
            # coordinates dangling (masked rows resurrect in the
            # renamed file) — abort, caller re-runs on the new snapshot
            missing = base_files - set(pm["files"])
            if missing:
                raise CommitConflictError(
                    f"{self.path}: position delete based on snapshot "
                    f"v{m['version']} was invalidated by a concurrent "
                    f"rewrite (e.g. {sorted(missing)[:3]}); re-run "
                    f"against the current snapshot")
            out = {
                "ts": time.time(),
                "files": list(pm["files"]),
                "stats": dict(pm.get("stats", {})),
                "deletes": list(pm.get("deletes", [])) + entries,
                "schema": pm["schema"],
                "properties": {**pm.get("properties", {}),
                               "row_op": "delete_mor_pos",
                               "deleted_where": cond_str},
            }
            return self._carry_seq(out, pm)

        return self._commit_manifest(build)

    def apply_deletes(self, spark: SparkSession) -> int:
        """Materialize pending merge-on-read deletes (the
        rewrite_position_delete_files-style maintenance pass): rewrite
        ONLY the data files that contain masked rows, drop the
        equality-delete entries, and commit. No-op when nothing is
        pending. Concurrent MoR deletes committed while this ran are
        carried forward (they still apply table-wide)."""
        from pyspark.sql import functions as F

        from functools import reduce

        m = self.manifest()
        dels = m.get("deletes") or []
        if not dels:
            return m["version"]
        eq_d, pos_d = self._split_deletes(dels)
        classes = self._eq_delete_classes(m, list(m["files"]), eq_d)
        scan = self._read_rel_files(spark, list(m["files"]),
                                    with_file_col=True,
                                    align_to=m["schema"],
                                    with_pos=bool(pos_d))
        masks = []
        # sequence-scoped detection: a file appended after a delete
        # commit is exempt from that delete's keys, so its rows must
        # not count as masked (they'd be silently dropped from the
        # rewrite otherwise — the exact ADVICE r3 failure mode)
        for fs, dels_c in classes:
            if not dels_c:
                continue
            part = self._read_rel_files(spark, fs, with_file_col=True,
                                        align_to=m["schema"],
                                        with_pos=bool(pos_d))
            masks.append(
                self._equality_delete_matches(spark, part, dels_c))
        if pos_d:
            keys = self._position_delete_keys(spark, pos_d)
            masks.append(scan.join(
                F.broadcast(keys),
                on=[self._META_FILE, self._META_POS], how="left_semi"))
        masked = reduce(lambda a, b: a.unionByName(b), masks)
        affected = self._collect_affected(masked)
        if not affected:
            # pure bookkeeping: keys matched no current rows
            def build(p, pm):
                done = {d["file"] for d in dels}
                carried = [d for d in pm.get("deletes", [])
                           if d["file"] not in done]
                out = {
                    "ts": time.time(),
                    "files": list(pm["files"]),
                    "stats": dict(pm.get("stats", {})),
                    "schema": pm["schema"],
                    "properties": {**pm.get("properties", {}),
                                   "row_op": "apply_deletes"},
                }
                if carried:
                    out["deletes"] = carried
                return self._carry_seq(out, pm)
            return self._commit_manifest(build)
        # the replacement content applies each class's own entries
        # only (an exempt file's rows survive even when they match a
        # newer-append-exempt delete key)
        keeps = []
        for fs, dels_c in classes:
            aff_c = [f for f in fs if f in set(affected)]
            if not aff_c:
                continue
            part = self._read_rel_files(spark, aff_c,
                                        align_to=m["schema"],
                                        with_pos=bool(pos_d))
            keeps.append(
                self._apply_equality_deletes(spark, part, dels_c))
        keep = reduce(lambda a, b: a.unionByName(b), keeps)
        if pos_d:
            keep = (self._apply_position_deletes(spark, keep, pos_d)
                    .drop(self._META_FILE, self._META_POS))
        return self._commit_rewrite(
            spark, affected, keep, "apply_deletes",
            properties={"applied_delete_files": len(dels)},
            clear_deletes=[d["file"] for d in dels])

    def delete_ids(self, spark: SparkSession, id_col: str, ids) -> int:
        """Takedown-shaped DELETE: remove every row whose ``id_col``
        is in ``ids`` (an iterable of values, or a 1-column DataFrame).
        Files whose manifest min/max stats for ``id_col`` cannot
        contain ANY requested id are pruned before the detection scan
        even opens them — deleting 1k images from a corpus of millions
        of files touches only the overlapping files (record stats on
        the id column at write time via ``stats_cols``)."""
        from bisect import bisect_left

        from pyspark.sql import functions as F

        if isinstance(ids, DataFrame):
            vals = [r[0] for r in ids.select(ids.columns[0])
                    .distinct().collect()]
        else:
            vals = list(dict.fromkeys(ids))
        if any(v is None for v in vals):
            raise ValueError("delete_ids: NULL id in the takedown list")
        if not vals:
            return self.current_version()
        m = self.manifest()
        # same CoW-rename hazard as delete_where(mode='cow')
        self._require_no_pending_pos_deletes("delete_ids", m)
        svals = sorted(vals)

        # bloom probing is per-id driver work: worth it for the
        # takedown shape (short lists), skipped for bulk deletes
        probe_bloom = len(svals) <= 1000

        def overlaps(entry) -> bool:
            rng = entry.get(id_col)
            if rng is None:
                return True  # no stats: must scan (skipping stays sound)
            lo, hi = rng
            i = bisect_left(svals, lo)
            if not (i < len(svals) and svals[i] <= hi):
                return False
            if not probe_bloom:
                return True
            # range says maybe: let the file's bloom (if recorded)
            # veto ids individually — only in-range ids can match
            return any(self._bloom_may_contain(entry, id_col, v)
                       for v in svals[i:] if v <= hi)
        stats = m.get("stats", {})
        cand = [f for f in m["files"] if overlaps(stats.get(f, {}))]
        if not cand:
            return m["version"]
        if len(svals) <= 1000:
            # small list: an IN literal Catalyst can push to the scan
            return self.delete_where(spark, F.col(id_col).isin(svals),
                                     candidate_files=cand)
        # large list: broadcast one-column join, not a giant isin()
        ids_df = spark.createDataFrame([(v,) for v in svals], [id_col])
        # large list: detection + rewrite via broadcast semi/anti joins
        scan = self._read_rel_files(spark, cand, with_file_col=True,
                                    align_to=m["schema"])
        affected = self._collect_affected(
            scan.join(F.broadcast(ids_df), id_col, "left_semi"))
        if not affected:
            return m["version"]
        keep = (self._read_rel_files(spark, affected, align_to=m["schema"])
                .join(F.broadcast(ids_df), id_col, "left_anti"))
        return self._commit_rewrite(
            spark, affected, keep, "delete",
            properties={"deleted_ids": len(svals)})

    def update_where(self, spark: SparkSession, condition,
                     assignments: dict, mode: str = "cow",
                     key_cols: tuple[str, ...] = ("image_id",)) -> int:
        """Row-level UPDATE: for rows where ``condition`` is TRUE, set
        each column in ``assignments`` to its new expression (SQL
        string or unresolved Column); other rows — and rows where the
        condition is NULL — are carried unchanged. Assignments must
        target EXISTING columns and keep their types (the table schema
        is pinned). This is the "re-scrub captions in place when a new
        PII pattern ships" operation.

        ``mode='cow'`` (default) rewrites only the files containing
        matched rows (byte-carries their unmatched neighbors).

        ``mode='mor'`` (merge-on-read update, completing the MoR
        delete/update/merge triple): ONE append-shaped commit writes
        the post-update rows plus a sequence-scoped equality delete of
        their ``key_cols`` values — cost O(rows sharing a matched key)
        with no file rewrite, legal even while other delete debt
        (equality or position) is pending, because the appended rows
        outrank every older delete. Rows that share a key with a
        matched row but do not match the condition are re-appended
        unchanged (the key-level delete would otherwise lose them);
        matched rows with a NULL key are refused (an equality delete
        cannot address them — use CoW)."""
        from pyspark.sql import functions as F

        assert mode in ("cow", "mor"), f"unknown update mode: {mode}"
        self._refuse_on_ledger("update_where")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        m = self.manifest()
        if not m["files"]:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        if mode == "mor":
            return self._update_mor(spark, cond, assignments, key_cols,
                                    m, str(condition))
        # a CoW UPDATE over rows a pending equality delete masks is
        # ambiguous (it could even rewrite the key column and unmask a
        # logically-deleted row) — settle the debt first
        self._require_no_pending_deletes("update_where", m)
        table_cols = [f["name"] for f in json.loads(m["schema"])["fields"]]
        bad = set(assignments) - set(table_cols)
        if bad:
            raise ValueError(
                f"update_where: assignment to non-existent column(s) "
                f"{sorted(bad)}; the snapshot schema is pinned")
        scan = self._read_rel_files(spark, list(m["files"]),
                                    with_file_col=True,
                                    align_to=m["schema"])
        affected = self._collect_affected(scan.filter(cond))
        if not affected:
            return m["version"]
        df = self._read_rel_files(spark, affected, align_to=m["schema"])
        old_schema = df.schema.json()
        # ONE select: the condition and every assignment RHS resolve
        # against the PRE-update row (SQL UPDATE semantics) — a
        # sequential withColumn chain would feed each assignment the
        # previous one's output ({"a": col("b"), "b": col("a")} must
        # swap, and a condition on an assigned column must not
        # re-evaluate against the new value).
        new_exprs = {name: (F.expr(e) if isinstance(e, str) else e)
                     for name, e in assignments.items()}
        df = df.select(*[
            F.when(cond, new_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in new_exprs else F.col(c)
            for c in df.columns])
        if json.loads(df.schema.json()) != json.loads(old_schema):
            raise ValueError(
                "update_where: assignments changed column types "
                f"(schema is pinned): {old_schema} -> {df.schema.json()}")
        return self._commit_rewrite(
            spark, affected, df, "update",
            properties={"updated_where": str(condition),
                        "updated_cols": sorted(assignments)})

    def _update_mor(self, spark: SparkSession, cond, assignments: dict,
                    key_cols: tuple[str, ...], m: dict,
                    cond_str: str) -> int:
        """Merge-on-read UPDATE tail (see :meth:`update_where`).

        Detection reads the MASKED table (so already-deleted rows are
        neither updated nor resurrected), pulls every row sharing a
        ``key_cols`` value with a matched row, applies the assignments
        to the matching subset, and commits the whole key-group row
        set as an append plus one equality-delete entry at the same
        sequence number."""
        from pyspark.sql import functions as F

        table_cols = [f["name"] for f in json.loads(m["schema"])["fields"]]
        bad = set(assignments) - set(table_cols)
        if bad:
            raise ValueError(
                f"update_where: assignment to non-existent column(s) "
                f"{sorted(bad)}; the snapshot schema is pinned")
        if set(assignments) & set(key_cols):
            raise ValueError(
                f"update_where(mode='mor'): assignments touch key "
                f"column(s) {sorted(set(assignments) & set(key_cols))} "
                f"— a key rewrite cannot be expressed as an equality "
                f"delete on the old key; use mode='cow'")
        df = self.read(spark)
        matched = df.filter(cond)
        null_key = matched.filter(
            " or ".join(f"{c} is null" for c in key_cols))
        if null_key.limit(1).count():
            raise ValueError(
                f"{self.path}: update_where(mode='mor') matched rows "
                f"with NULL in key columns {key_cols}; use mode='cow'")
        keys = matched.select(*key_cols).distinct()
        rows = df.join(F.broadcast(keys), list(key_cols), "left_semi")
        new_exprs = {name: (F.expr(e) if isinstance(e, str) else e)
                     for name, e in assignments.items()}
        updated = rows.select(*[
            F.when(cond, new_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in new_exprs else F.col(c)
            for c in table_cols])
        if [_f["type"] for _f in json.loads(updated.schema.json())["fields"]] \
                != [_f["type"] for _f in json.loads(m["schema"])["fields"]]:
            raise ValueError(
                "update_where: assignments changed column types "
                f"(schema is pinned): {m['schema']} -> "
                f"{updated.schema.json()}")
        if updated.isEmpty():
            return m["version"]
        stat_cols, bloom_cols = self._stats_layout_of(m)
        new_files, new_stats = self._stage_data_files(
            updated, stat_cols or None)
        if bloom_cols:
            self._merge_blooms_into_stats(
                new_stats, self._collect_file_blooms(new_files, bloom_cols))
        key_files, _ = self._stage_data_files(
            keys.coalesce(1), stats_cols=())
        entries = [{"file": f, "cols": list(key_cols)} for f in key_files]

        def build(p, pm):
            self._require_no_legacy_deletes("update_where(mode='mor')",
                                            pm)
            seq = self._next_seq(pm)
            stats = dict(pm.get("stats", {}))
            stats.update(new_stats)
            out = {
                "ts": time.time(),
                "files": pm["files"] + new_files,
                "stats": stats,
                "schema": pm["schema"],
                "deletes": (list(pm.get("deletes", []))
                            + [{**e, "seq": seq} for e in entries]),
                "properties": {**pm.get("properties", {}),
                               "row_op": "update_mor",
                               "updated_where": cond_str,
                               "updated_cols": sorted(assignments)},
            }
            return self._carry_seq(out, pm, new_files, bump=True)

        return self._commit_manifest(build)

    def merge_upsert(self, spark: SparkSession, source: DataFrame,
                     key_col: str, mode: str = "cow") -> int:
        """MERGE INTO analog: rows of ``source`` whose ``key_col``
        matches an existing row REPLACE that row; the rest are
        inserted. Source keys must be non-NULL and unique (the SQL
        MERGE cardinality rule — one source row per target row).

        ``mode='cow'`` (default): only files containing matched keys
        are rewritten; a pure-insert merge rewrites nothing and
        appends the source files.

        ``mode='mor'`` (Iceberg v2 merge-on-read upsert): ONE commit
        appends the source rows as new data files AND records their
        keys as an equality-delete entry stamped with the same
        sequence number. Sequence scoping makes this correct with no
        table scan at all: the delete masks only OLDER files (the
        previous versions of matched keys), never the files this
        commit appends, and keys that matched nothing mask nothing.
        Cost is O(source) regardless of table size — the
        label-correction shape a trillion-row table wants; debt is
        settled later by ``apply_deletes()``/``compact()``. Unlike
        CoW merge it is also legal while other equality debt is
        pending (scoping keeps the new rows out of older deletes'
        reach).

        Concurrency: snapshot isolation — CoW aborts if a concurrent
        commit rewrote an affected file (MoR commits are append-shaped
        and cannot conflict on files); a concurrent APPEND that
        introduced the same key is carried forward and wins no
        arbitration (real Iceberg's SERIALIZABLE level would abort;
        document your writers or serialize merges externally)."""
        from pyspark.sql import functions as F

        assert mode in ("cow", "mor"), f"unknown merge mode: {mode}"
        self._refuse_on_ledger("merge_upsert")
        m = self.manifest()
        if not m["files"]:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        if mode == "cow":
            # a CoW MERGE whose key matches a row a pending equality
            # delete masks would "insert" a row the read side keeps
            # masking — settle the debt first (the MoR path is immune:
            # its rows carry a newer sequence than any pending delete)
            self._require_no_pending_deletes("merge_upsert", m)
        table_fields = json.loads(m["schema"])["fields"]
        table_cols = [f["name"] for f in table_fields]
        if sorted(source.columns) != sorted(table_cols):
            raise ValueError(
                f"merge_upsert: source columns {sorted(source.columns)} "
                f"!= table columns {sorted(table_cols)}")
        src = source.select(*table_cols)

        def _types(schema_json: str) -> list[tuple]:
            # name+type only: nullability differs freely between a
            # createDataFrame source and a parquet-derived table schema
            return [(f["name"], f["type"])
                    for f in json.loads(schema_json)["fields"]]
        if _types(src.schema.json()) != _types(m["schema"]):
            raise ValueError(
                f"merge_upsert: source schema {src.schema.json()} != "
                f"pinned table schema {m['schema']}")
        src = src.persist()
        try:
            agg = src.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(key_col).alias("nk"),
                F.countDistinct(key_col).alias("nd"),
                F.min(key_col).alias("kmin"),
                F.max(key_col).alias("kmax")).first()
            if agg["nk"] != agg["n"]:
                raise ValueError("merge_upsert: NULL source key(s)")
            if agg["nd"] != agg["nk"]:
                raise ValueError(
                    "merge_upsert: duplicate source keys (MERGE "
                    "cardinality: at most one source row per key)")
            if mode == "mor":
                return self._merge_upsert_mor(spark, src, key_col, m)
            # manifest-stats pruning of the DETECTION scan (same move
            # as delete_ids): a file whose key-column min/max range
            # cannot overlap [min(src), max(src)] cannot contain any
            # matched key — a 3-row label correction against a
            # million-file table opens only the overlapping files.
            stats = m.get("stats", {})
            cand = [f for f in m["files"]
                    if self._stats_may_overlap(stats.get(f, {}), key_col,
                                               agg["kmin"], agg["kmax"])]
            keys = src.select(key_col)
            affected = []
            if cand:
                scan = self._read_rel_files(spark, cand,
                                            with_file_col=True,
                                            align_to=m["schema"])
                affected = self._collect_affected(
                    scan.join(F.broadcast(keys), key_col, "left_semi"))
            if affected:
                untouched_rows = (self._read_rel_files(
                                      spark, affected,
                                      align_to=m["schema"])
                                  .join(F.broadcast(keys), key_col,
                                        "left_anti")
                                  .select(*table_cols))
                merged = untouched_rows.unionByName(src)
                return self._commit_rewrite(
                    spark, affected, merged, "merge",
                    properties={"merge_key": key_col})
            # pure insert: append the source files, rewrite nothing
            # (the empty affected set keeps every existing file; the
            # pinned manifest schema carries forward)
            return self._commit_rewrite(spark, [], src, "merge",
                                        properties={"merge_key": key_col})
        finally:
            src.unpersist()

    def _merge_upsert_mor(self, spark: SparkSession, src: DataFrame,
                          key_col: str, m: dict) -> int:
        """Merge-on-read upsert tail (see :meth:`merge_upsert`): stage
        the source rows as data files and their keys as ONE
        equality-delete file, commit both with the same sequence
        number. No table read, no rewrite — O(source) at any size."""
        stat_cols, bloom_cols = self._stats_layout_of(m)
        new_files, new_stats = self._stage_data_files(
            src, stat_cols or None)
        if bloom_cols:
            self._merge_blooms_into_stats(
                new_stats, self._collect_file_blooms(new_files, bloom_cols))
        key_files, _ = self._stage_data_files(
            src.select(key_col).coalesce(1), stats_cols=())
        entries = [{"file": f, "cols": [key_col]} for f in key_files]

        def build(p, pm):
            # a legacy seq-less entry would mask the rows this commit
            # appends (ADVICE r4: the scoping claim below only holds
            # for seq-stamped entries)
            self._require_no_legacy_deletes("merge_upsert(mode='mor')",
                                            pm)
            seq = self._next_seq(pm)
            stats = dict(pm.get("stats", {}))
            stats.update(new_stats)
            out = {
                "ts": time.time(),
                "files": pm["files"] + new_files,
                "stats": stats,
                "schema": pm["schema"],
                "deletes": (list(pm.get("deletes", []))
                            + [{**e, "seq": seq} for e in entries]),
                "properties": {**pm.get("properties", {}),
                               "row_op": "merge_mor",
                               "merge_key": key_col},
            }
            return self._carry_seq(out, pm, new_files, bump=True)

        return self._commit_manifest(build)

    def remove_orphan_files(self, older_than_sec: float = 86400.0) -> int:
        """Delete data files referenced by NO manifest — leftovers of
        writers that crashed after moving files but before winning the
        manifest CAS. Returns files removed.

        ``older_than_sec`` closes the in-flight window: a LIVE writer
        has the same no-manifest-yet signature between its file move
        and its CAS win, so only files older than the cutoff are
        swept (Iceberg's remove_orphan_files ships the same guard,
        default 3 days; ours defaults to 1 day)."""
        live: set[str] = set()
        for v in range(1, self.current_version() + 1):
            p = self._manifest_path(v)
            if os.path.exists(p):
                # data files AND equality-delete key files are live
                live.update(self._manifest_all_files(self.manifest(v)))
        return self._sweep_unreferenced(live, known_committed=live,
                                        older_than_sec=older_than_sec)

    def _sweep_unreferenced(self, live: set[str],
                            known_committed: Optional[set[str]] = None,
                            older_than_sec: float = 0.0) -> int:
        """Delete data files not referenced by `live`.

        In-flight-writer guard: a file absent from `known_committed`
        (the union of ALL manifests — expired ones included) may belong
        to a writer that moved it but has not yet won the manifest CAS;
        such files are only swept when older than ``older_than_sec``.
        Files that WERE committed somewhere (e.g. listed by an expired
        manifest) are deleted regardless of age — they are deliberate
        expiry targets, never in-flight.

        Hadoop sidecar files (`.crc` checksums, `_SUCCESS` markers) are
        not data: a sidecar is removed only when its TARGET parquet is
        itself gone/unreferenced, so live files keep their checksums.
        Sidecars whose target was never committed anywhere get the
        SAME in-flight age guard as plain data files (ADVICE r2: a
        live writer that has moved files but not yet won the manifest
        CAS must not lose its checksums/markers), while sidecars of
        deliberately expired files are removed regardless of age.
        Walks relative paths — manifests may reference files inside
        hive partition dirs (bucket=k/part-...parquet)."""
        known = known_committed if known_committed is not None else live

        def _too_young(full: str) -> bool:
            try:
                return time.time() - os.path.getmtime(full) < older_than_sec
            except OSError:
                return True  # vanished/unreadable: do not sweep
        removed = 0
        if not os.path.isdir(self.data_dir):
            return 0
        for root, _dirs, fnames in os.walk(self.data_dir):
            for f in fnames:
                full = os.path.join(root, f)
                rel = os.path.relpath(full, self.data_dir)
                if f.startswith(".") or f.startswith("_"):
                    target = f.lstrip(".")
                    if target.endswith(".crc"):
                        target = target[:-4]
                    target_rel = os.path.join(os.path.dirname(rel), target) \
                        if os.path.dirname(rel) else target
                    if f == "_SUCCESS":
                        # no single target: may belong to an in-flight
                        # writer — sweep only past the age guard
                        if _too_young(full):
                            continue
                    elif target_rel in live:
                        continue  # live file keeps its checksum
                    elif target_rel not in known and _too_young(full):
                        continue  # possible in-flight writer's sidecar
                    os.remove(full)
                    removed += 1
                elif rel not in live:
                    if rel not in known and _too_young(full):
                        continue  # possible in-flight writer — age guard
                    os.remove(full)
                    removed += 1
        return removed

    # -- refs: tags + rollback ------------------------------------------
    #
    # Iceberg refs analog: a TAG pins a snapshot version under a name
    # ("prod", "pre-migration-audit") — tagged snapshots are retained
    # by expire_snapshots regardless of keep_last, and every
    # manifest-routed read accepts a tag wherever it accepts a version.
    # ROLLBACK re-commits an old snapshot's content as a NEW version
    # (history is preserved; nothing is deleted), the
    # rollback_to_snapshot analog for "the re-scrub was wrong, serve
    # yesterday's labels while we fix it".

    def _refs_path(self) -> str:
        return os.path.join(self.meta_dir, "refs.json")

    def tags(self) -> dict:
        """Current tag map ``{name: version}``. A refs.json that
        EXISTS but does not parse raises — mapping corruption to {}
        would let expire_snapshots delete the very snapshots the tags
        were holding, and the next mutation would overwrite the
        evidence."""
        try:
            with open(self._refs_path()) as f:
                return dict(json.load(f).get("tags", {}))
        except FileNotFoundError:
            return {}
        except json.JSONDecodeError as e:
            raise ValueError(
                f"{self.path}: refs.json is corrupt ({e}); refusing to "
                "treat it as empty — restore it (or delete it after "
                "confirming no tag was a legal hold)") from e

    def branches(self) -> dict:
        """Current branch map ``{name: head_version}`` (Iceberg branch
        refs analog). Empty for tables that never branched — those
        behave exactly as before branches existed (default reads at
        the log tip, lock-free commit CAS). Same corruption stance as
        :meth:`tags`."""
        try:
            with open(self._refs_path()) as f:
                return dict(json.load(f).get("branches", {}))
        except FileNotFoundError:
            return {}
        except json.JSONDecodeError as e:
            raise ValueError(
                f"{self.path}: refs.json is corrupt ({e}); refusing to "
                "treat it as empty — restore it (or delete it after "
                "confirming no ref was a legal hold)") from e

    def resolve_ref(self, ref) -> int:
        """A version int passes through; a string resolves as a tag,
        then as a branch head (refs share one namespace — creation
        enforces uniqueness)."""
        if not isinstance(ref, str):
            return ref
        tags = self.tags()
        if ref in tags:
            return tags[ref]
        branches = self.branches()
        if ref in branches:
            return branches[ref]
        raise KeyError(
            f"{self.path}: no tag or branch {ref!r} "
            f"(tags: {sorted(tags)}, branches: {sorted(branches)})")

    def _branch_head(self, branch=None) -> int:
        """Head version of ``branch`` (default the read head: branch
        'main' when branch refs exist, else the log tip)."""
        br = self.branches()
        if branch in (None, "main"):
            return br.get("main", self.current_version()) if br \
                else self.current_version()
        if branch not in br:
            raise KeyError(
                f"{self.path}: no branch {branch!r} "
                f"(branches: {sorted(br)})")
        return br[branch]

    @contextmanager
    def _refs_lock(self):
        """Exclusive refs lock (O_EXCL lock file). Serializes every
        tag/rollback mutation AND expire_snapshots' retention decision
        — without it a tag committed between expire's tags() read and
        its manifest removal would dangle at an expired snapshot."""
        os.makedirs(self.meta_dir, exist_ok=True)
        lock = self._refs_path() + ".lock"
        deadline = time.time() + 30.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"{self.path}: refs lock held too long ({lock}); "
                        "remove it if its owner crashed")
                time.sleep(0.05)
        try:
            yield
        finally:
            os.remove(lock)

    def _mutate_refs(self, fn) -> dict:
        """Read-modify-write refs.json under the refs lock.
        Durable: tmp + fsync + rename. ``fn`` runs INSIDE the lock, so
        validation done there (e.g. 'target manifest exists') cannot
        race a concurrent expire."""
        with self._refs_lock():
            refs = {"tags": self.tags(), "branches": self.branches()}
            refs = fn(refs)
            self._write_refs_locked(refs)
            return refs

    def _write_refs_locked(self, refs: dict) -> None:
        """Durable refs.json write (tmp + fsync + rename). Caller MUST
        hold the refs lock."""
        if not refs.get("branches"):
            refs = {k: v for k, v in refs.items() if k != "branches"}
        tmp = self._refs_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(refs, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._refs_path())

    def tag(self, name: str, version=None) -> int:
        """Pin ``version`` (default current) under ``name``. Re-tagging
        an existing name moves it. Returns the pinned version. The
        existence check runs INSIDE the refs lock, so a tag cannot be
        committed against a snapshot a concurrent expire is removing
        (expire takes the same lock for its retention decision)."""
        v = self.resolve_ref(version) if version is not None \
            else self.current_version()

        def mut(refs):
            if v < 1 or not os.path.exists(self._manifest_path(v)):
                raise FileNotFoundError(
                    f"{self.path}: cannot tag v{v} — no such snapshot")
            refs["tags"][name] = v
            return refs
        self._mutate_refs(mut)
        return v

    def drop_tag(self, name: str) -> None:
        def mut(refs):
            if name not in refs["tags"]:
                raise KeyError(f"{self.path}: no tag {name!r}")
            del refs["tags"][name]
            return refs
        self._mutate_refs(mut)

    # -- branches: write-audit-publish ----------------------------------
    #
    # Iceberg branch refs analog, serving the WAP (write-audit-publish)
    # workflow that production curation runs on every risky re-process:
    # stage the new snapshot on a branch, audit it with real queries
    # (drift, rule_ablation, audit_sample), then fast-forward main.
    # Branches are refs INTO the one linear snapshot log (the Iceberg
    # model: all snapshots share the metadata list; refs select heads),
    # so time travel, expire retention and snapshot_diff keep working
    # unchanged. Creating the first branch pins 'main' explicitly; from
    # then on default reads follow main's head, not the log tip.

    def create_branch(self, name: str, at=None) -> int:
        """Create branch ``name`` at ``at`` (version/ref; default the
        current read head). Returns the branch's starting head."""
        self._refuse_on_ledger("create_branch")
        if name == "main":
            raise ValueError(f"{self.path}: 'main' is implicit — it is "
                             "pinned automatically on first branch")
        v = self.resolve_ref(at) if at is not None else self._branch_head()

        def mut(refs):
            if name in refs["branches"] or name in refs["tags"]:
                raise ValueError(
                    f"{self.path}: ref {name!r} already exists "
                    "(tags and branches share one namespace)")
            if v < 1 or not os.path.exists(self._manifest_path(v)):
                raise FileNotFoundError(
                    f"{self.path}: cannot branch at v{v} — no such "
                    "snapshot")
            # first branch pins main at the pre-branch read head
            refs["branches"].setdefault("main", self.current_version())
            refs["branches"][name] = v
            return refs
        self._mutate_refs(mut)
        return v

    def drop_branch(self, name: str) -> None:
        if name == "main":
            raise ValueError(f"{self.path}: cannot drop 'main'")

        def mut(refs):
            if name not in refs["branches"]:
                raise KeyError(f"{self.path}: no branch {name!r}")
            del refs["branches"][name]
            return refs
        self._mutate_refs(mut)

    def fast_forward(self, branch: str, to: str) -> int:
        """Advance ``branch`` to branch ``to``'s head — the PUBLISH
        step of WAP (Iceberg ``fast_forward``). Refused unless
        ``branch``'s head is an ancestor of the target (walking the
        manifests' parent chain): a diverged branch needs an explicit
        decision (rollback one side, or re-stage), never a silent
        overwrite. Returns the new head."""

        def mut(refs):
            if to not in refs["branches"]:
                raise KeyError(f"{self.path}: no branch {to!r}")
            target = refs["branches"][to]
            cur = refs["branches"].get(
                branch, self.current_version() if branch == "main" else None)
            if cur is None:
                raise KeyError(f"{self.path}: no branch {branch!r}")
            v = target
            while v and v != cur:
                if not os.path.exists(self._manifest_path(v)):
                    raise ValueError(
                        f"{self.path}: cannot verify ancestry — "
                        f"manifest v{v} expired; rollback/re-stage "
                        "instead")
                v = self.manifest(v).get("parent") or 0
            if v != cur and cur != 0:
                raise ValueError(
                    f"{self.path}: {branch!r} (v{cur}) is not an "
                    f"ancestor of {to!r} (v{target}) — branches "
                    "diverged; rollback or re-stage instead of "
                    "fast-forward")
            refs["branches"][branch] = target
            return refs
        refs = self._mutate_refs(mut)
        return refs["branches"][branch]

    def rebase_publish(self, branch: str, onto: str = "main") -> int:
        """Publish ``branch`` onto ``onto`` when :meth:`fast_forward`
        refuses because the target advanced concurrently (the WAP
        divergence case: audit work staged on a branch while ingestion
        kept appending to main).

        Resolution contract (MIGRATION.md "WAP conflict contract"):

        - the branch's work since the merge base must be APPEND-ONLY
          (no file removed or rewritten, no MoR delete-debt change) —
          then its added files are re-applied as ONE new commit on
          ``onto``'s current head, and the branch ref is re-pointed at
          the published commit;
        - anything else (the branch compacted, overwrote, deleted) is
          REFUSED: replaying a rewrite over a moved base can silently
          resurrect or drop rows, so it needs a human decision
          (rollback one side, or re-stage the audit work).

        Schema: the published commit keeps ``onto``'s schema unless
        the branch evolved it additively (then the superset wins);
        divergent evolution on both sides is refused.
        Returns the new head of ``onto``."""
        br = self.branches()
        if branch not in br:
            raise KeyError(f"{self.path}: no branch {branch!r}")
        head = br[branch]
        onto_head = br.get(
            onto, self.current_version() if onto == "main" else None)
        if onto_head is None:
            raise KeyError(f"{self.path}: no branch {onto!r}")

        def ancestors(v: int) -> list[int]:
            out = []
            while v:
                if not os.path.exists(self._manifest_path(v)):
                    raise ValueError(
                        f"{self.path}: cannot verify ancestry — manifest "
                        f"v{v} expired; rollback/re-stage instead")
                out.append(v)
                v = self.manifest(v).get("parent") or 0
            return out

        o_anc = set(ancestors(onto_head))
        base = next((v for v in ancestors(head) if v in o_anc), None)
        if base is None:
            raise ValueError(
                f"{self.path}: {branch!r} and {onto!r} share no common "
                f"ancestor")
        if base == head:
            return onto_head  # nothing staged
        if base == onto_head:
            return self.fast_forward(onto, branch)  # plain publish
        bm, basem = self.manifest(head), self.manifest(base)
        removed = sorted(set(basem["files"]) - set(bm["files"]))
        if removed:
            raise CommitConflictError(
                f"{self.path}: branch {branch!r} removed/rewrote files "
                f"present at its base v{base} (e.g. {removed[:3]}) — "
                f"only append-only audit work can be rebase-published; "
                f"rollback or re-stage instead")
        if (bm.get("deletes") or []) != (basem.get("deletes") or []):
            raise CommitConflictError(
                f"{self.path}: branch {branch!r} changed merge-on-read "
                f"delete debt since its base — settle or re-stage "
                f"before publishing")
        base_files = set(basem["files"])
        delta = [f for f in bm["files"] if f not in base_files]

        def build(p, pm):
            # Takedown race (ADVICE r4): an equality delete committed
            # on `onto` while the branch was staged masks only files
            # OLDER than its sequence — but this publish replays the
            # branch delta with a FRESH sequence, so the branch's
            # copies of those keys would escape the takedown and the
            # removed content could resurface. Entry-level refusal
            # (no spark session here to test key intersection): any
            # equality entry on `onto` that was not already pending at
            # the merge base forces a human decision — settle the
            # debt, or re-stage the audit work on the current head.
            # (Entries already pending AT the base predate the staged
            # work — same semantics as appending to a debt-carrying
            # table — and legacy seq-less entries mask table-wide,
            # replayed files included, so neither can resurface
            # anything.)
            base_eq = {json.dumps(d, sort_keys=True)
                       for d in self._split_deletes(
                           basem.get("deletes") or [])[0]}
            gained = [d for d in self._split_deletes(
                          pm.get("deletes") or [])[0]
                      if d.get("seq") is not None
                      and json.dumps(d, sort_keys=True) not in base_eq]
            if gained:
                cols = sorted({c for d in gained for c in d["cols"]})
                raise CommitConflictError(
                    f"{self.path}: {onto!r} gained {len(gained)} "
                    f"equality-delete entr(ies) on {cols} since the "
                    f"merge base v{base} — publishing would replay "
                    f"branch {branch!r}'s files with a fresh sequence, "
                    "letting its copies of taken-down keys escape the "
                    "delete; run apply_deletes() on the target (or "
                    "re-stage the audit work) first")
            if json.loads(bm["schema"]) == json.loads(pm["schema"]):
                schema = pm["schema"]
            elif self._schema_compatible(bm["schema"], pm["schema"]):
                schema = bm["schema"]  # branch evolved additively
            else:
                raise CommitConflictError(
                    f"{self.path}: branch {branch!r} and {onto!r} "
                    f"evolved the schema divergently — re-stage the "
                    f"audit work on the current {onto!r}")
            new = [f for f in delta if f not in set(pm["files"])]
            stats = dict(pm.get("stats", {}))
            stats.update({f: v for f, v in bm.get("stats", {}).items()
                          if f in set(new)})
            out = {
                "ts": time.time(),
                "files": pm["files"] + new,
                "stats": stats,
                "schema": schema,
                "properties": {**pm.get("properties", {}),
                               "rebase_publish_of": branch,
                               "rebase_base": base},
            }
            if pm.get("deletes"):
                out["deletes"] = list(pm["deletes"])
            return self._carry_seq(out, pm, new, bump=True)

        v = self._commit_manifest(build, branch=onto)

        def mut(refs):
            refs["branches"][branch] = v
            return refs
        self._mutate_refs(mut)
        return v

    def rollback(self, version) -> int:
        """Re-commit snapshot ``version`` (int or tag) as a NEW current
        version — content identical (files/stats/schema), history
        preserved. Aborts if the target's data files were already
        expired off disk."""
        self._refuse_on_ledger("rollback")
        v = self.resolve_ref(version)
        if v < 1 or not os.path.exists(self._manifest_path(v)):
            raise FileNotFoundError(
                f"{self.path}: cannot rollback to v{v} — no such "
                "snapshot (expired?)")
        m = self.manifest(v)
        missing = [f for f in sorted(self._manifest_all_files(m))
                   if not os.path.exists(os.path.join(self.data_dir, f))]
        if missing:
            raise FileNotFoundError(
                f"{self.path}: rollback target v{v} references data "
                f"files no longer on disk (expired/orphan-swept), e.g. "
                f"{missing[:3]}")

        def build(p, pm):
            out = {
                "ts": time.time(),
                "files": list(m["files"]),
                "stats": dict(m.get("stats", {})),
                "schema": m["schema"],
                "properties": {**(m.get("properties") or {}),
                               "rollback_of": v},
            }
            if m.get("deletes"):
                out["deletes"] = list(m["deletes"])
            # restore the TARGET's file sequences; last_seq stays
            # monotone across the whole history (a rollback must not
            # let a future delete reuse a sequence number)
            if m.get("file_seq"):
                out["file_seq"] = dict(m["file_seq"])
            last = max(m.get("last_seq", 0), pm.get("last_seq", 0))
            if last:
                out["last_seq"] = last
            return out
        return self._commit_manifest(build)

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop manifests older than the newest `keep_last` and delete
        data files no newer manifest references. Returns files removed.
        Tagged snapshots are ALWAYS retained (manifest + data files) —
        dropping the tag releases them. The tags() read, retention
        decision, and manifest removal all run under the refs lock so
        a concurrent tag() cannot land between them and dangle."""
        with self._refs_lock():
            live_files, known = self._expire_manifests_locked(keep_last)
        # the (slow) data sweep needs no lock: removed manifests can no
        # longer be tagged (tag() validates existence under the lock)
        return self._sweep_unreferenced(live_files, known_committed=known,
                                        older_than_sec=86400.0)

    def _expire_manifests_locked(self, keep_last: int) -> tuple[set, set]:
        cur = self.current_version()
        keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
        keep_versions.update(v for v in self.tags().values() if v <= cur)
        # branch heads are retained like tags (dropping the branch
        # releases them); intermediate branch ancestors may expire —
        # fast_forward detects the broken chain and refuses
        keep_versions.update(v for v in self.branches().values()
                             if v <= cur)
        live_files: set[str] = set()
        known: set[str] = set()
        live_segs: set[str] = set()
        for v in range(1, cur + 1):
            if os.path.exists(self._manifest_path(v)):
                m = self.manifest(v)
                known.update(self._manifest_all_files(m))
                if v in keep_versions:
                    live_files.update(self._manifest_all_files(m))
                    live_segs.update(m.get("segments") or [])
        # Manifests are removed BEFORE the data sweep: a crash between
        # the two steps then leaves only unreferenced files (cleaned on
        # the next expire), never a readable manifest that references
        # deleted data.
        for v in range(1, max(1, cur - keep_last + 1)):
            if v in keep_versions:
                continue  # tagged: retained until the tag drops
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.remove(p)
        # segment GC: a segment is live iff a RETAINED manifest
        # references it. Young unreferenced segments are kept — a
        # lock-free committer writes its segments BEFORE winning the
        # manifest CAS, so an in-flight commit's segments look
        # orphaned until it lands (same age guard as the data sweep).
        if os.path.isdir(self.seg_dir):
            now = time.time()
            for name in os.listdir(self.seg_dir):
                if name in live_segs or not name.startswith("seg-"):
                    continue
                full = self._segment_path(name)
                try:
                    if now - os.path.getmtime(full) \
                            > self.SEGMENT_ORPHAN_AGE_SEC:
                        os.remove(full)
                except OSError:
                    pass
        return live_files, known


def load_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read a table by identifier: real Iceberg when a catalog is
    configured (identifier contains no path separator), else the
    SnapshotTable emulation, else plain Parquet."""
    if "/" not in identifier:
        return spark.read.format("iceberg").load(identifier)
    st = SnapshotTable(identifier)
    if st.exists():
        return st.read(spark)
    return spark.read.parquet(identifier)
