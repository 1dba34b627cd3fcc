"""Training-export shard writer: deterministic global shuffle +
size-balanced shard files — the "last mile" that turns a curated
corpus into the sharded artifact a training loader streams.

Training jobs want (a) the corpus pre-shuffled so sequential shard
reads are i.i.d.-ish, (b) shards of roughly equal size so data-
parallel readers finish together, and (c) the whole layout
reproducible bit-for-bit from (corpus, seed) so a re-export after a
fix produces the same shard membership (WebDataset / T5 / Megatron
loaders all assume this shape).

Spark-first design:

- **Shuffle order is a row property, not an engine artifact**: every
  row gets ``u48 = md5-derived 48-bit hash of (seed ":" id)`` (same
  portable construction as :mod:`..operators.sampling` — restated
  literally in the DuckDB oracle) and the export order is
  ``(u48, id)``. No ``orderBy(rand())``, no dependence on
  partitioning, engine or day.
- **Shard = fixed-point range of the hash axis**:
  ``shard = (u48 * n_shards) >> 48`` — exact integer math (u48 < 2^48
  and n_shards <= 2^15 keep the product inside a signed 64-bit long),
  uniform across arbitrary (non-power-of-two) shard counts. With
  thousands of rows per shard the per-shard byte totals concentrate
  tightly around the mean (sizing is hash-balanced, not
  planned-balanced — there is no global sort anywhere).
- **One shuffle total**: the intra-shard position window partitions by
  ``shard``, which leaves every shard wholly inside one task — the
  subsequent ``partitionBy("shard")`` write therefore emits exactly
  one file per shard with rows already in (u48, id) order, and no
  second exchange.

At 100 TB: pick ``target_bytes`` (e.g. 1 GiB) and the shard count is
derived from one map-combinable ``sum(length(bytes))`` aggregate; the
single shuffle moves each row once, and shard files stream out in
parallel across all executors.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mehc_curation_spark.operators.sampling import u48_col

#: (u48 * n_shards) must stay inside a signed 64-bit long.
MAX_SHARDS = 32768


def shuffle_key_col(id_c: Column, seed: int = 0) -> Column:
    """Portable 48-bit shuffle key: u48(md5(seed ":" id)). Different
    seeds give independent orders; the same seed reproduces the
    export anywhere."""
    return u48_col(F.concat(F.lit(f"{int(seed)}:"), id_c.cast("string")))


def _resolve_n_shards(df: DataFrame, n_shards: int | None,
                      target_bytes: int | None, bytes_col: str) -> int:
    """Resolve the shard count from exactly one of n_shards /
    target_bytes (the latter via one payload-size aggregate)."""
    if (n_shards is None) == (target_bytes is None):
        raise ValueError("pass exactly one of n_shards / target_bytes")
    if n_shards is None:
        total = df.select(
            F.sum(F.coalesce(F.length(F.col(bytes_col)), F.lit(0)))
        ).first()[0] or 0
        n_shards = max(1, math.ceil(total / target_bytes))
    if not 1 <= n_shards <= MAX_SHARDS:
        raise ValueError(f"n_shards must be in [1, {MAX_SHARDS}]")
    return int(n_shards)


def assign_shards(df: DataFrame, id_col: str = "image_id",
                  n_shards: int | None = None,
                  target_bytes: int | None = None,
                  bytes_col: str = "bytes", seed: int = 0) -> DataFrame:
    """Append deterministic (shard, pos) export coordinates.

    Exactly one of ``n_shards`` / ``target_bytes`` must be given; with
    ``target_bytes`` the count is ``ceil(sum(length(bytes)) /
    target_bytes)`` from one aggregate over the payload column.
    ``pos`` is the 1-based position of the row inside its shard in the
    global shuffle order (u48, id) — the reproducible iteration order.
    """
    n_shards = _resolve_n_shards(df, n_shards, target_bytes, bytes_col)
    u = shuffle_key_col(F.col(id_col), seed)
    out = df.withColumn("_u48", u) \
            .withColumn("shard",
                        F.shiftright(F.col("_u48") * F.lit(int(n_shards)),
                                     48).cast("int"))
    w = Window.partitionBy("shard").orderBy("_u48", F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_u48")


def export_shards(df: DataFrame, path: str, id_col: str = "image_id",
                  n_shards: int | None = None,
                  target_bytes: int | None = None,
                  bytes_col: str = "bytes", seed: int = 0,
                  compression: str = "zstd") -> dict:
    """Write the corpus as one parquet file per shard under
    ``path/shard=K/`` plus a ``_manifest.json`` recording the layout
    (underscore-prefixed so Spark's directory reader skips it).

    The position window already hash-partitions the data by shard, so
    the partitioned write reuses that exchange (one shuffle total) and
    each shard lands as a single file with rows in (u48, id) order.
    Manifest stats are recounted from the WRITTEN files (a narrow
    parquet re-read), not from the lineage — recomputing the frame
    would pay the corpus shuffle twice. ``n_shards`` records the
    REQUESTED layout parameter (what resume/re-derivation must use);
    the ``shards`` list holds only non-empty shards (an empty shard
    writes no directory). Returns the manifest dict.
    """
    n = _resolve_n_shards(df, n_shards, target_bytes, bytes_col)
    s = assign_shards(df, id_col, n_shards=n, seed=seed)
    s.write.mode("overwrite").partitionBy("shard") \
        .option("compression", compression).parquet(path)
    per = (df.sparkSession.read.parquet(path).groupBy("shard")
           .agg(F.count("*").alias("rows"),
                F.sum(F.coalesce(F.length(F.col(bytes_col)), F.lit(0)))
                 .alias("payload_bytes"))
           .orderBy("shard").collect())
    manifest = {
        "format": "parquet-shards-v1",
        "seed": int(seed),
        "id_col": id_col,
        "bytes_col": bytes_col,
        "n_shards": n,
        "rows": int(sum(r["rows"] for r in per)),
        "payload_bytes": int(sum(r["payload_bytes"] for r in per)),
        "min_shard_rows": int(min(r["rows"] for r in per)) if per else 0,
        "max_shard_rows": int(max(r["rows"] for r in per)) if per else 0,
        "shards": [{"shard": int(r["shard"]), "rows": int(r["rows"]),
                    "payload_bytes": int(r["payload_bytes"])} for r in per],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


# ---------------------------------------------------------------------------
# WebDataset-style tar shards (image-training loaders)
# ---------------------------------------------------------------------------

#: Per-shard summary emitted by the tar writer tasks.
_WDS_SUMMARY_SCHEMA = ("shard int, rows long, payload_bytes long, "
                       "tar_bytes long, tar_md5 string")


def _tar_shard_bytes(rows: list) -> bytes:
    """Deterministic tar rendering of one shard: USTAR format, member
    metadata pinned (mtime 0, uid/gid 0, blank names, mode 0644) and
    members emitted in shard position order as ``<id>.img`` +
    ``<id>.json`` — the WebDataset sample-grouping convention. Given
    the same rows this function is byte-reproducible anywhere, which
    is what makes the export verifiable (the driver check recomputes
    shard digests from the raw table)."""
    import io as _io
    import json as _json
    import tarfile

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tar:
        def add(name: str, data: bytes) -> None:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            ti.mode = 0o644
            tar.addfile(ti, _io.BytesIO(data))

        for rid, payload, meta in rows:
            add(f"{rid}.img", payload if payload is not None else b"")
            add(f"{rid}.json",
                _json.dumps(meta, sort_keys=True,
                            ensure_ascii=False).encode("utf-8"))
    return buf.getvalue()


def export_webdataset(df: DataFrame, path: str, id_col: str = "image_id",
                      bytes_col: str = "bytes",
                      meta_cols: tuple = ("caption", "w", "h", "fmt",
                                          "phash"),
                      n_shards: int | None = None,
                      target_bytes: int | None = None,
                      seed: int = 0, resume: bool = False) -> dict:
    """Write the corpus as WebDataset-style tar shards
    (``shard-00000.tar`` …), each holding ``<id>.img`` payload +
    ``<id>.json`` metadata members in deterministic shard order — the
    artifact image-training loaders stream directly.

    Distribution: shard membership/order come from
    :func:`assign_shards` (one exchange); each tar is then rendered
    and written BY ITS OWN TASK via ``applyInPandas`` (the executor
    writes ``.tmp`` and renames), so shard files stream out in
    parallel and only the per-shard summary rows (count/bytes/md5)
    return to the driver for the manifest. The output path must be a
    shared filesystem in cluster mode (object-store targets would
    swap the two ``os``/``open`` calls for their client).

    ``resume=True``: if a prior run's manifest exists (same seed +
    id_col), only shards whose tar is missing or size-mismatched on
    disk are rewritten — the shard plan is deterministic, so a
    restart after a mid-export failure completes exactly the missing
    work. Resume assumes the INPUT is unchanged (the deterministic
    layout makes any drift detectable afterwards via
    :func:`verify_export`).
    """
    import glob as _glob
    import hashlib as _hashlib

    os.makedirs(path, exist_ok=True)
    prior = None
    man_path = os.path.join(path, "_manifest.json")
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            prior = json.load(f)
        if (prior.get("format") != "webdataset-tar-v1"
                or prior.get("seed") != int(seed)
                or prior.get("id_col") != id_col
                or prior.get("bytes_col") != bytes_col):
            raise ValueError("existing manifest does not match this "
                             "export's parameters; refusing to resume")
        n = prior["n_shards"]
    else:
        if resume and (n_shards is None and target_bytes is None):
            raise ValueError(
                "no _manifest.json to resume from (the prior run died "
                "before completing) — rerun with --n_shards or "
                "--target_bytes; the deterministic layout makes a full "
                "rerun produce identical shards")
        n = _resolve_n_shards(df, n_shards, target_bytes, bytes_col)
        # fresh export into a reused directory: stale tars from an
        # older (e.g. wider) layout would otherwise survive and be
        # picked up by shard-*.tar globbing loaders
        for stale in _glob.glob(os.path.join(path, "shard-*.tar")):
            os.remove(stale)
        if os.path.exists(man_path):
            os.remove(man_path)
    s = assign_shards(df, id_col, n_shards=n, seed=seed)
    done = {}
    if prior is not None:
        for sh in prior["shards"]:
            dest = os.path.join(path, f"shard-{sh['shard']:05d}.tar")
            if (os.path.exists(dest)
                    and os.path.getsize(dest) == sh["tar_bytes"]):
                done[sh["shard"]] = sh
        if done:
            s = s.filter(~F.col("shard").isin(*sorted(done)))
    keep = [id_col, bytes_col, *meta_cols, "shard", "pos"]
    mcols = list(meta_cols)

    def write_shard(pdf):
        pdf = pdf.sort_values("pos")
        k = int(pdf["shard"].iloc[0])
        rows, payload = [], 0
        for r in pdf.itertuples(index=False):
            b = getattr(r, bytes_col)
            b = bytes(b) if b is not None else None
            payload += len(b) if b else 0
            meta = {}
            for c in mcols:
                v = getattr(r, c)
                if v is None or (isinstance(v, float) and v != v):
                    meta[c] = None
                elif hasattr(v, "item"):  # numpy scalar -> native
                    meta[c] = v.item()
                else:
                    meta[c] = v
            rows.append((getattr(r, id_col), b, meta))
        data = _tar_shard_bytes(rows)
        dest = os.path.join(path, f"shard-{k:05d}.tar")
        with open(dest + ".tmp", "wb") as f:
            f.write(data)
        os.replace(dest + ".tmp", dest)
        import pandas as _pd
        return _pd.DataFrame([{
            "shard": k, "rows": len(rows), "payload_bytes": payload,
            "tar_bytes": len(data),
            "tar_md5": _hashlib.md5(data).hexdigest(),
        }])

    per = sorted(
        (list(done.values()) if prior is not None else [])
        + [r.asDict() for r in
           s.select(*keep).groupBy("shard")
            .applyInPandas(write_shard, _WDS_SUMMARY_SCHEMA).collect()],
        key=lambda d: d["shard"])
    manifest = {
        "format": "webdataset-tar-v1",
        "seed": int(seed),
        "id_col": id_col,
        "bytes_col": bytes_col,
        "n_shards": n,
        "rows": int(sum(d["rows"] for d in per)),
        "payload_bytes": int(sum(d["payload_bytes"] for d in per)),
        "shards": per,
    }
    manifest["resumed_shards"] = sorted(done) if prior is not None else []
    with open(man_path + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(man_path + ".tmp", man_path)
    return manifest


def read_webdataset(spark, path: str, id_col: str = "image_id",
                    bytes_col: str = "bytes") -> DataFrame:
    """Distributed WebDataset tar reader — the ingestion twin of
    :func:`export_webdataset`, and the shape LAION-style corpora
    actually arrive in (directories of ``shard-*.tar`` holding
    ``<id>.img`` + ``<id>.json`` sample pairs).

    Spark-first: ONE ``binaryFile`` scan lists and reads the tars
    (each large tar lands in its own input partition, so shards parse
    in parallel across executors with no shuffle anywhere), and a
    ``mapInPandas`` stage unpacks members — samples grouped by member
    stem in archive order, per the WebDataset adjacency convention.
    The parser yields one batch PER TAR so task memory is bounded by
    one shard (~``target_bytes``) regardless of Arrow batch sizing.

    Output: ``(shard int, pos int, <id> string, <bytes> binary,
    meta string)`` — ``pos`` is the 1-based in-shard sample position
    (the deterministic iteration order the writer pinned), ``meta``
    the raw JSON sidecar text; parse it with ``F.from_json`` /
    ``F.get_json_object`` against your metadata schema. Member ids
    come back as STRINGS (tar member names); cast as needed. A sample
    written from a NULL payload comes back as the empty binary —
    tar members carry no null/empty distinction.
    """
    bf = (spark.read.format("binaryFile")
          .load(os.path.join(path, "shard-*.tar"))
          .select("path", "content"))
    out_schema = (f"shard int, pos int, `{id_col}` string, "
                  f"`{bytes_col}` binary, meta string")

    def parse(batches):
        import io as _io
        import tarfile

        import pandas as _pd

        for pdf in batches:
            for tar_path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(str(tar_path))
                shard = int(fname[len("shard-"):-len(".tar")])
                rows = []
                cur = None  # [stem, payload, meta_json]

                def flush():
                    if cur is not None:
                        rows.append((shard, len(rows) + 1,
                                     cur[0], cur[1], cur[2]))

                with tarfile.open(
                        fileobj=_io.BytesIO(bytes(content))) as tar:
                    for m in tar:
                        if not m.isfile() or "." not in m.name:
                            continue
                        stem, ext = m.name.rsplit(".", 1)
                        if cur is None or cur[0] != stem:
                            flush()
                            cur = [stem, None, None]
                        data = tar.extractfile(m).read()
                        if ext == "img":
                            cur[1] = data
                        elif ext == "json":
                            cur[2] = data.decode("utf-8")
                    flush()
                yield _pd.DataFrame(
                    rows, columns=["shard", "pos", id_col,
                                   bytes_col, "meta"])

    return bf.mapInPandas(parse, out_schema)


# ---------------------------------------------------------------------------
# export durability: verify + resume
# ---------------------------------------------------------------------------

def verify_export(spark, path: str) -> dict:
    """Distributed integrity check of an export directory against its
    ``_manifest.json`` — the restart-safety primitive (was the last
    run complete? did a shard get truncated?).

    WebDataset layout: one ``binaryFile`` scan re-hashes every tar on
    the executors (``F.md5(content)`` — no bytes reach the driver).
    Parquet layout: one aggregation recounts rows/payload per shard.
    Returns {ok, missing, mismatched, extra} by shard id.
    """
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format"] == "webdataset-tar-v1":
        got = {}
        try:
            rows = (spark.read.format("binaryFile")
                    .load(os.path.join(path, "shard-*.tar"))
                    .select(F.element_at(F.split("path", "/"), -1)
                             .alias("f"),
                            F.md5("content").alias("md5"),
                            F.length("content").alias("nbytes"))
                    .collect())
        except Exception:
            # an unmatched glob raises PATH_NOT_FOUND: every shard is
            # gone, which is a damage REPORT, not a crash
            rows = []
        for r in rows:
            k = int(r["f"][len("shard-"):-len(".tar")])
            got[k] = (r["md5"], r["nbytes"])
        exp = {s["shard"]: (s["tar_md5"], s["tar_bytes"])
               for s in manifest["shards"]}
    else:
        per = (spark.read.parquet(path).groupBy("shard")
               .agg(F.count("*").alias("rows"),
                    F.sum(F.coalesce(F.length(F.col(manifest.get(
                        "bytes_col", "bytes"))), F.lit(0)))
                    .alias("payload_bytes"))
               .collect())
        got = {int(r["shard"]): (int(r["rows"]), int(r["payload_bytes"]))
               for r in per}
        exp = {s["shard"]: (s["rows"], s["payload_bytes"])
               for s in manifest["shards"]}
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    mismatched = sorted(k for k in set(exp) & set(got)
                        if exp[k] != got[k])
    return {"ok": not (missing or extra or mismatched),
            "n_shards": manifest["n_shards"],
            "missing": missing, "mismatched": mismatched, "extra": extra}
