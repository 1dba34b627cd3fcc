"""Product-quantization ANN: compressed codes + asymmetric-distance scan.

The missing third leg of the ANN fleet (hyperplane-LSH and IVF are in
:mod:`.similarity` / :mod:`.ann_index`): Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search" (TPAMI 2011).
Vectors are split into ``m`` subspaces, each subvector replaced by the
id of its nearest per-subspace centroid — one byte per subspace, so a
64-float embedding stored as an 8-byte code is a 32x reduction (256x
for 512-d vectors at m=16). Queries never decompress: the asymmetric
distance computation (ADC) precomputes a (m, n_codes) lookup table of
query-subvector x centroid dot products driver-side, and the scan is
one table-gather + row-sum per stored code.

Why this matters at 100 TB: the ADC scan touches ONLY the code column
(bytes, not array<float>), so the candidate-generation pass reads ~1/32
of the bytes a brute-force cosine scan reads, stays a narrow map stage
(zero shuffle), and the exact re-rank fetches full vectors for just
``refine`` candidate ids. :func:`save_pq_index` persists the code table
WITHOUT the vectors (codebooks ride in the manifest properties, a few
KB) — the production shape where the compressed index is the thing you
scan and the raw vectors live in the source table.

Determinism contract (same as :func:`~.similarity.ivf_index`):
training samples rows by a per-row hash condition ordered by id and
clusters driver-side with fixed-seed NumPy Lloyd's, so codebooks —
and therefore codes, ADC scores and results — are bit-identical
across partition layouts and engines.

Cosine semantics: vectors are L2-normalized before encoding and the
query before LUT construction, so ADC score = q-hat . reconstruct(x)
approximates cos(q, x); the final top-k re-ranks candidates with the
EXACT cosine (:func:`~.similarity.cosine_topk`), making results exact
whenever the true top-k survives the ``refine`` cut.

No analog in the reference repo (its dedup has no index structures).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, LongType

from mehc_curation_spark.operators.similarity import (
    _stack_embeddings,
    _train_kmeans_np,
    cosine_topk,
    sample_training_vectors,
)

CODE_COL = "pq_code"


def _validate_pq(dim: int, m: int, n_codes: int) -> None:
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m} subspaces")
    if not 2 <= n_codes <= 256:
        raise ValueError(f"pq: n_codes must be in [2, 256] (one byte per "
                         f"subspace), got {n_codes}")


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
    return X / np.where(norms > 0, norms, 1.0)


def train_pq(df: DataFrame, vec_col: str, id_col: str, m: int = 8,
             n_codes: int = 16, seed: int = 42, max_train: int = 16384,
             n_rows: Optional[int] = None) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, n_codes, dim//m).
    Fixed-seed Lloyd's per subspace (seed varies by subspace so
    codebooks are independent); see
    :func:`~.similarity.sample_training_vectors` for the determinism
    contract of the sample itself (shared with the IVF family)."""
    X = _normalize_rows(sample_training_vectors(
        df, vec_col, id_col, min(max_train, n_codes * 1024), n_rows,
        what="train_pq"))
    dim = X.shape[1]
    _validate_pq(dim, m, n_codes)
    dsub = dim // m
    books = np.stack([
        _train_kmeans_np(X[:, j * dsub:(j + 1) * dsub], n_codes, seed + j)
        for j in range(m)])
    return books


def make_pq_encode_udf(codebooks: np.ndarray):
    """``pq_code`` = per-subspace nearest-centroid ids packed into
    ``m`` bytes (BinaryType). Vectorized per Arrow batch: one
    (n, dsub) @ (dsub, n_codes) GEMM + argmin per subspace. NULL /
    ragged / wrong-dim vectors get a NULL code and drop out of every
    ADC scan (same totality contract as the LSH/IVF assign UDFs)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    dim = m * dsub
    b2 = (books ** 2).sum(axis=2)  # (m, n_codes)

    @pandas_udf(BinaryType())
    def pq_encode(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        X, valid = _stack_embeddings(vec, dim)
        X = _normalize_rows(X)
        codes = np.zeros((len(X), m), dtype=np.uint8)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c)
            d2 = b2[j][None, :] - 2.0 * (sub @ books[j].T)
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        out = [codes[i].tobytes() if valid[i] else None
               for i in range(len(X))]
        return pd.Series(out, dtype=object)

    return pq_encode


def _adc_lut(codebooks: np.ndarray, query: Sequence[float]) -> np.ndarray:
    """(m, n_codes) lookup table: LUT[j, c] = q-hat_sub_j . center_jc,
    so sum_j LUT[j, code_j] = q-hat . reconstruct(x) ~ cos(q, x)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    q = np.asarray(list(query), dtype=np.float64)
    if q.shape != (m * dsub,):
        raise ValueError(f"pq: query dim {q.shape} != index dim {m * dsub}")
    qn = np.sqrt((q * q).sum())
    q = q / (qn if qn > 0 else 1.0)
    return np.einsum("jkd,jd->jk", books, q.reshape(m, dsub))


def make_adc_score_udf(codebooks: np.ndarray, query: Sequence[float]):
    """Approximate-cosine score over the code column: a table gather
    + row sum per Arrow batch — never touches the vectors."""
    lut = _adc_lut(codebooks, query)
    m = lut.shape[0]
    cols = np.arange(m)

    @pandas_udf(DoubleType())
    def adc_score(code: pd.Series) -> pd.Series:
        if len(code) == 0:
            return pd.Series([], dtype="float64")
        valid = np.array([c is not None and len(c) == m for c in code])
        codes = np.zeros((len(code), m), dtype=np.uint8)
        for i, c in enumerate(code):
            if valid[i]:
                codes[i] = np.frombuffer(c, dtype=np.uint8)
        out = pd.array(lut[cols[None, :], codes].sum(axis=1),
                       dtype="Float64")
        out[~valid] = pd.NA
        return pd.Series(out)

    return adc_score


def pq_topk(df: DataFrame, vec_col: str, id_col: str,
            query: Sequence[float], k: int = 10, m: int = 8,
            n_codes: int = 16, refine: Optional[int] = None,
            seed: int = 42, round_to: int = 4,
            codebooks: Optional[np.ndarray] = None) -> DataFrame:
    """ANN top-k via PQ: ADC scan -> top ``refine`` candidates ->
    exact-cosine re-rank to k.

    The candidate cut compiles to TakeOrderedAndProject (per-partition
    heaps of size ``refine``, no global sort); ties on the ADC score
    break by id, so the candidate set — and the result — is
    deterministic. Pass ``codebooks`` to skip retraining (the
    persisted-index path)."""
    refine = refine or max(4 * k, 50)
    if codebooks is None:
        codebooks = train_pq(df, vec_col, id_col, m, n_codes, seed)
    encoded = df.withColumn(CODE_COL,
                            make_pq_encode_udf(codebooks)(F.col(vec_col)))
    scored = (encoded
              .withColumn("_adc",
                          make_adc_score_udf(codebooks, query)(
                              F.col(CODE_COL)))
              .filter(F.col("_adc").isNotNull()))
    cand = (scored.orderBy(F.col("_adc").desc(), F.col(id_col))
            .limit(refine).drop(CODE_COL, "_adc"))
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


# ---------------------------------------------------------------------------
# persisted PQ code table (vectors stay in the source table)
# ---------------------------------------------------------------------------

def save_pq_index(df: DataFrame, vec_col: str, id_col: str,
                  table_path: str, m: int = 8, n_codes: int = 16,
                  seed: int = 42):
    """Encode once, persist ONLY (id, pq_code) — the compressed scan
    target. Codebooks travel in the manifest properties (a few KB);
    the raw vectors are NOT copied, which is the point: at 10^12 rows
    the code table is ~1/32 the bytes of the embedding column, and
    every future query scans it instead. Returns (table, codebooks)."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    codebooks = train_pq(df, vec_col, id_col, m, n_codes, seed)
    codes = df.select(
        F.col(id_col),
        make_pq_encode_udf(codebooks)(F.col(vec_col)).alias(CODE_COL))
    table = SnapshotTable(table_path)
    table.write(codes, mode="overwrite",
                properties={"pq_codebooks": json.dumps(codebooks.tolist()),
                            "pq_m": int(m), "pq_n_codes": int(n_codes),
                            "pq_vec_col": vec_col, "pq_id_col": id_col,
                            "pq_seed": int(seed)})
    return table, codebooks


def load_pq_codebooks(table) -> np.ndarray:
    props = table.manifest().get("properties", {})
    if "pq_codebooks" not in props:
        raise ValueError(f"{table.path}: not a PQ index table "
                         "(no pq_codebooks in manifest properties)")
    return np.asarray(json.loads(props["pq_codebooks"]), dtype=np.float64)


def pq_topk_from_table(spark, table_path: str, vectors_df: DataFrame,
                       query: Sequence[float], k: int = 10,
                       refine: Optional[int] = None,
                       round_to: int = 4) -> DataFrame:
    """Query the persisted code table: ADC scan over codes only ->
    top ``refine`` ids -> fetch those ids' vectors from the source
    table (broadcast semi-join: ``refine`` rows against the corpus)
    -> exact-cosine top-k. The full embedding column is read for just
    the candidate ids — Catalyst pushes the broadcast join below the
    vector deserialization."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    refine = refine or max(4 * k, 50)
    table = SnapshotTable(table_path)
    codebooks = load_pq_codebooks(table)
    props = table.manifest().get("properties", {})
    id_col, vec_col = props["pq_id_col"], props["pq_vec_col"]
    codes = table.read(spark)
    cand_ids = (codes
                .withColumn("_adc",
                            make_adc_score_udf(codebooks, query)(
                                F.col(CODE_COL)))
                .filter(F.col("_adc").isNotNull())
                .orderBy(F.col("_adc").desc(), F.col(id_col))
                .limit(refine).select(id_col))
    cand = vectors_df.join(F.broadcast(cand_ids), id_col, "left_semi")
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


# ---------------------------------------------------------------------------
# IVF+PQ composite index — the full Jégou et al. 2011 recipe: a coarse
# quantizer prunes WHICH FILES are read (cell stats in the manifest),
# PQ codes over the RESIDUALS shrink the bytes per row scanned. At
# 10^12 vectors a probe reads ~n_probe/n_cells of the files and ~1/32
# of the bytes within them — two multiplicative reductions.
# ---------------------------------------------------------------------------

IVFPQ_CELL_COL = "ivfpq_cell"


def save_ivfpq_index(df: DataFrame, vec_col: str, id_col: str,
                     table_path: str, n_cells="auto", m: int = 8,
                     n_codes: int = 16, seed: int = 42,
                     max_train: int = 16384,
                     max_cell_rows="auto",
                     n_rows: Optional[int] = None):
    """Train coarse centroids + residual PQ codebooks on one
    deterministic sample, encode every vector to (cell, m-byte code),
    and persist ONLY (id, cell, code) — range-partitioned by cell with
    per-file cell stats so probes skip files. Centroids and codebooks
    ride in the manifest properties. Vectors are L2-normalized before
    everything (cosine semantics); the residual r = x-hat - c_cell is
    what PQ encodes, per the paper — residuals are far more
    homogeneous than raw vectors, so the same code budget reconstructs
    them better. Returns (table, centers, codebooks).

    ``n_cells="auto"`` (default) applies the same corpus-sized rule as
    :func:`similarity.ivf_index`: rows/1024 clamped to [8, 65536] —
    ~1k vectors per cell, so the probed fraction keeps shrinking as
    the corpus grows instead of a fixed toy constant stopping the
    coarse quantizer from pruning at scale (pass ``n_rows`` to skip
    the sizing count if the caller already knows it).

    ``max_cell_rows="auto"`` guards against a COLLAPSED quantizer
    (embedding space degenerate → most rows land in one cell → the
    file-level pruning the index exists for is gone): after encoding,
    refuse loudly if any cell exceeds 32x the balanced share (floor
    65536 so small corpora never trip it). Pass an int for an absolute
    bound, or None to skip the check."""
    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.operators.similarity import _normalized_vec

    ndf = df.withColumn("_nvec", _normalized_vec(F.col(vec_col)))
    if n_cells == "auto":
        if n_rows is None:
            n_rows = df.count()
        n_cells = max(8, min(65536, n_rows // 1024))
    n_cells = int(n_cells)
    X = _normalize_rows(sample_training_vectors(
        ndf, "_nvec", id_col, min(max_train, max(n_cells, n_codes) * 1024),
        what="save_ivfpq_index"))
    dim = X.shape[1]
    _validate_pq(dim, m, n_codes)
    dsub = dim // m
    centers = _train_kmeans_np(X, n_cells, seed)
    d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    resid = X - centers[d2.argmin(axis=1)]
    books = np.stack([
        _train_kmeans_np(resid[:, j * dsub:(j + 1) * dsub], n_codes,
                         seed + 1000 + j)
        for j in range(m)])
    enc = make_ivfpq_encode_udf(centers, books)
    codes = (ndf.withColumn("_enc", enc(F.col("_nvec")))
             .select(F.col(id_col), F.col("_enc.cell").alias(IVFPQ_CELL_COL),
                     F.col("_enc.code").alias(CODE_COL))
             .repartitionByRange(n_cells, IVFPQ_CELL_COL)
             .sortWithinPartitions(IVFPQ_CELL_COL))
    if max_cell_rows is not None:
        # one cheap agg over the (9+m)-byte code rows, cached so the
        # write below reuses the encoded frame instead of paying the
        # encode UDF twice
        codes = codes.persist()
        agg = (codes.groupBy(IVFPQ_CELL_COL).count()
               .agg(F.max("count").alias("mx"),
                    F.sum("count").alias("n")).first())
        mx, total = int(agg["mx"] or 0), int(agg["n"] or 0)
        limit = (max(65536, 32 * -(-total // n_cells))
                 if max_cell_rows == "auto" else int(max_cell_rows))
        if mx > limit:
            codes.unpersist()
            raise ValueError(
                f"save_ivfpq_index: largest cell holds {mx} of {total} "
                f"rows > max_cell_rows={limit} (n_cells={n_cells}) — "
                "the coarse quantizer collapsed, so file-level pruning "
                "is gone; raise n_cells (or pass n_cells='auto'), or "
                "pass max_cell_rows=None to persist anyway")
    table = SnapshotTable(table_path)
    table.write(codes, mode="overwrite",
                properties={
                    "ivfpq_centers": json.dumps(centers.tolist()),
                    "ivfpq_codebooks": json.dumps(books.tolist()),
                    "ivfpq_n_cells": int(n_cells), "ivfpq_m": int(m),
                    "ivfpq_n_codes": int(n_codes),
                    "ivfpq_vec_col": vec_col, "ivfpq_id_col": id_col,
                    "ivfpq_seed": int(seed)},
                stats_cols=(IVFPQ_CELL_COL,))
    if max_cell_rows is not None:
        codes.unpersist()
    return table, centers, books


def make_ivfpq_encode_udf(centers: np.ndarray, codebooks: np.ndarray):
    """struct<cell long, code binary> per vector: cell = nearest
    centroid (GEMM argmin), code = per-subspace nearest residual
    centroid. Input must already be L2-normalized (the save path
    normalizes in-plan). NULL/ragged vectors -> NULL struct fields."""
    from pyspark.sql.types import StructField, StructType

    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    dim = m * dsub
    c2 = (centers ** 2).sum(axis=1)
    b2 = (books ** 2).sum(axis=2)
    out_t = StructType([StructField("cell", LongType()),
                        StructField("code", BinaryType())])

    @pandas_udf(out_t)
    def ivfpq_encode(vec: pd.Series) -> pd.DataFrame:
        n = len(vec)
        if n == 0:
            return pd.DataFrame({"cell": pd.array([], dtype="Int64"),
                                 "code": pd.Series([], dtype=object)})
        X, valid = _stack_embeddings(vec, dim)
        d2 = c2[None, :] - 2.0 * (X @ centers.T)
        cell = d2.argmin(axis=1)
        resid = X - centers[cell]
        codes = np.zeros((n, m), dtype=np.uint8)
        for j in range(m):
            sub = resid[:, j * dsub:(j + 1) * dsub]
            dj = b2[j][None, :] - 2.0 * (sub @ books[j].T)
            codes[:, j] = dj.argmin(axis=1).astype(np.uint8)
        cell_out = pd.array(cell.astype(np.int64), dtype="Int64")
        cell_out[~valid] = pd.NA
        code_out = [codes[i].tobytes() if valid[i] else None
                    for i in range(n)]
        return pd.DataFrame({"cell": cell_out,
                             "code": pd.Series(code_out, dtype=object)})

    return ivfpq_encode


def _ivfpq_luts(centers: np.ndarray, codebooks: np.ndarray,
                query: Sequence[float],
                cells: Sequence[int]) -> dict[int, np.ndarray]:
    """Per-probed-cell ADC tables: lut[c][j, t] = ||q_sub_j -
    c_c_sub_j - B_j[t]||^2, so sum_j lut[c][j, code_j] approximates
    the squared L2 distance to the reconstructed vector (monotone
    with cosine on unit vectors: d^2 = 2 - 2 cos)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    q = np.asarray(list(query), dtype=np.float64)
    if q.shape != (m * dsub,):
        raise ValueError(f"ivfpq: query dim {q.shape} != index dim "
                         f"{m * dsub}")
    qn = np.sqrt((q * q).sum())
    q = q / (qn if qn > 0 else 1.0)
    luts = {}
    for c in cells:
        qr = (q - centers[c]).reshape(m, dsub)
        diff = qr[:, None, :] - books  # (m, n_codes, dsub)
        luts[int(c)] = (diff ** 2).sum(axis=2)
    return luts


def make_ivfpq_adc_udf(centers: np.ndarray, codebooks: np.ndarray,
                       query: Sequence[float], cells: Sequence[int]):
    """Approximate squared-L2 over (cell, code) — gather + row-sum per
    Arrow batch, one LUT per probed cell. Rows outside the probed
    cells (or with NULL codes) score NULL."""
    luts = _ivfpq_luts(centers, codebooks, query, cells)
    m = np.asarray(codebooks).shape[0]
    cols = np.arange(m)

    @pandas_udf(DoubleType())
    def ivfpq_adc(cell: pd.Series, code: pd.Series) -> pd.Series:
        n = len(cell)
        out = np.full(n, np.nan)
        codes = np.zeros((n, m), dtype=np.uint8)
        valid = np.zeros(n, dtype=bool)
        cl = cell.to_numpy(dtype="float64", na_value=np.nan)
        for i, c in enumerate(code):
            if c is not None and len(c) == m and not np.isnan(cl[i]):
                codes[i] = np.frombuffer(c, dtype=np.uint8)
                valid[i] = True
        for c, lut in luts.items():
            mask = valid & (cl == c)
            if mask.any():
                out[mask] = lut[cols[None, :], codes[mask]].sum(axis=1)
        res = pd.array(out, dtype="Float64")
        res[np.isnan(out)] = pd.NA
        return pd.Series(res)

    return ivfpq_adc


def load_ivfpq(table) -> tuple[np.ndarray, np.ndarray, dict]:
    props = table.manifest().get("properties", {})
    if "ivfpq_centers" not in props:
        raise ValueError(f"{table.path}: not an IVFPQ index table "
                         "(no ivfpq_centers in manifest properties)")
    return (np.asarray(json.loads(props["ivfpq_centers"]), dtype=np.float64),
            np.asarray(json.loads(props["ivfpq_codebooks"]),
                       dtype=np.float64),
            props)


def ivfpq_topk_from_table(spark, table_path: str, vectors_df: DataFrame,
                          query: Sequence[float], k: int = 10,
                          n_probe: int = 4, refine: Optional[int] = None,
                          round_to: int = 4) -> DataFrame:
    """Query the persisted IVFPQ index: file-skipped reads of the
    probed cells (contiguous-run `between` reads on the cell stats),
    ADC over the m-byte codes, top-`refine` ascending approximate
    distance, exact-cosine re-rank against the source vectors
    (broadcast semi-join of `refine` ids). The double reduction in
    action: files outside the probed cells are never opened, and the
    opened ones contribute code bytes, not float vectors."""
    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.operators.ann_index import probe_cells
    from mehc_curation_spark.operators.similarity import cosine_topk

    refine = refine or max(4 * k, 50)
    table = SnapshotTable(table_path)
    centers, books, props = load_ivfpq(table)
    id_col, vec_col = props["ivfpq_id_col"], props["ivfpq_vec_col"]
    q = np.asarray(list(query), dtype=np.float64)
    qn = np.sqrt((q * q).sum())
    cells = probe_cells(centers, q / (qn if qn > 0 else 1.0), n_probe)
    runs, start, prev = [], None, None
    for c in sorted(cells):
        if start is None:
            start = prev = c
        elif c == prev + 1:
            prev = c
        else:
            runs.append((start, prev))
            start = prev = c
    runs.append((start, prev))
    from functools import reduce as _reduce

    parts = [table.read(spark, between=(IVFPQ_CELL_COL, lo, hi))
             for lo, hi in runs]
    codes = (_reduce(DataFrame.unionByName, parts)
             .filter(F.col(IVFPQ_CELL_COL).isin(*[int(c) for c in cells])))
    adc = make_ivfpq_adc_udf(centers, books, query, cells)
    cand_ids = (codes
                .withColumn("_adc", adc(F.col(IVFPQ_CELL_COL),
                                        F.col(CODE_COL)))
                .filter(F.col("_adc").isNotNull())
                .orderBy(F.col("_adc").asc(), F.col(id_col))
                .limit(refine).select(id_col))
    cand = vectors_df.join(F.broadcast(cand_ids), id_col, "left_semi")
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


def make_probe_cells_udf(centers: np.ndarray, n_probe: int):
    """array<long> of the ``n_probe`` nearest cells per query vector
    (normalized in-batch; stable argsort → deterministic ties). NULL/
    ragged vectors probe nothing (NULL array)."""
    from pyspark.sql.types import ArrayType

    dim = centers.shape[1]
    c2 = (centers ** 2).sum(axis=1)

    @pandas_udf(ArrayType(LongType()))
    def probe_cells_udf(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        X, valid = _stack_embeddings(vec, dim)
        X = _normalize_rows(X)
        d2 = c2[None, :] - 2.0 * (X @ centers.T)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.tolist() if ok else None
                          for row, ok in zip(idx, valid)], dtype=object)

    return probe_cells_udf


def make_ivfpq_pairwise_adc_udf(centers: np.ndarray, codebooks: np.ndarray):
    """Approximate squared-L2 between a (normalized-in-batch) query
    vector column and an IVFPQ (cell, code) pair: reconstruct =
    centroid + residual-codebook gather, one vectorized diff per Arrow
    batch. The pairwise form the kNN JOIN needs — per-query LUTs don't
    apply when every row carries a different query."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    dim = m * dsub

    @pandas_udf(DoubleType())
    def pairwise_adc(qvec: pd.Series, cell: pd.Series,
                     code: pd.Series) -> pd.Series:
        n = len(qvec)
        if n == 0:
            return pd.Series([], dtype="float64")
        Q, qvalid = _stack_embeddings(qvec, dim)
        Q = _normalize_rows(Q)
        cl = cell.to_numpy(dtype="float64", na_value=np.nan)
        codes = np.zeros((n, m), dtype=np.uint8)
        valid = qvalid & ~np.isnan(cl)
        for i, c in enumerate(code):
            if c is not None and len(c) == m:
                codes[i] = np.frombuffer(c, dtype=np.uint8)
            else:
                valid[i] = False
        recon = np.zeros((n, dim))
        ci = np.where(valid, cl, 0).astype(np.int64)
        recon[valid] = centers[ci[valid]]
        for j in range(m):
            recon[valid, j * dsub:(j + 1) * dsub] += books[j][
                codes[valid, j]]
        d2 = ((Q - recon) ** 2).sum(axis=1)
        out = pd.array(d2, dtype="Float64")
        out[~valid] = pd.NA
        return pd.Series(out)

    return pairwise_adc


def ivfpq_join(spark, table_path: str, queries_df: DataFrame,
               vectors_df: DataFrame, query_vec_col: str,
               query_id_col: str, k: int = 10, n_probe: int = 4,
               refine: Optional[int] = None, round_to: int = 4,
               broadcast_queries: bool = True) -> DataFrame:
    """Batched kNN JOIN against the persisted IVFPQ index — the
    production decontamination shape (a query CORPUS against a
    reference index, not a loop of driver-side probes), over the
    compressed codes:

    - every query explodes to its ``n_probe`` nearest cells; the
      candidate join is a cell-key equi-join against the (id, cell,
      code) table — the INDEX VECTORS never participate in candidate
      generation, only 8-byte codes do;
    - pairwise ADC scores the candidates (reconstruct-and-diff — one
      Arrow stage over the candidate minority);
    - per-query top-``refine`` by approximate distance (window over
      candidates), then the exact-cosine verify joins ONLY those ids
      back to the source vectors; per-query top-k is a second window.

    ``broadcast_queries=True`` broadcasts the slim query probe/vector
    frames (thousands of queries against a huge index — one scan of
    the code table); pass False to shuffle-join on the cell key when
    the query side is itself huge.

    Returns (query_id, index_id, cos, rank), rank 1..k per query
    (ties: rounded cos then index id — reproducible)."""
    from pyspark.sql import Window

    from mehc_curation_spark.io.catalog import SnapshotTable
    from mehc_curation_spark.operators.similarity import (
        _dot_col,
        _normalized_vec,
    )

    refine = refine or max(4 * k, 50)
    table = SnapshotTable(table_path)
    centers, books, props = load_ivfpq(table)
    id_col, vec_col = props["ivfpq_id_col"], props["ivfpq_vec_col"]
    codes = table.read(spark)

    probes = make_probe_cells_udf(centers, n_probe)
    q_probes = queries_df.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(probes(F.col(query_vec_col))).alias(IVFPQ_CELL_COL))
    q_vecs = queries_df.select(
        F.col(query_id_col).alias("_qid"),
        _normalized_vec(F.col(query_vec_col)).alias("_qv"))
    maybe_b = F.broadcast if broadcast_queries else (lambda d: d)
    cand = (codes.join(maybe_b(q_probes), IVFPQ_CELL_COL)
            .join(maybe_b(q_vecs), "_qid"))
    adc = make_ivfpq_pairwise_adc_udf(centers, books)
    scored = (cand.withColumn("_adc", adc(F.col("_qv"),
                                          F.col(IVFPQ_CELL_COL),
                                          F.col(CODE_COL)))
              .filter(F.col("_adc").isNotNull()))
    # keep the refine window's shuffle SLIM: only (_qid, id, _adc)
    # move — the dim-double query vector re-joins onto the <= refine
    # rows per query afterwards (the ann_join shuffle-path rule)
    w_ref = Window.partitionBy("_qid").orderBy(F.col("_adc").asc(),
                                               F.col("_iid"))
    refined = (scored.select("_qid", F.col(id_col).alias("_iid"), "_adc")
               .withColumn("_r", F.row_number().over(w_ref))
               .filter(F.col("_r") <= refine)
               .select("_qid", "_iid"))
    idx_vecs = vectors_df.select(
        F.col(id_col).alias("_iid"),
        _normalized_vec(F.col(vec_col)).alias("_iv"))
    exact = (refined.join(idx_vecs, "_iid")
             .join(maybe_b(q_vecs), "_qid")
             .select("_qid", "_iid",
                     F.round(_dot_col(F.col("_qv"), F.col("_iv")),
                             round_to).alias("cos")))
    w_k = Window.partitionBy("_qid").orderBy(F.desc("cos"), F.col("_iid"))
    return (exact.withColumn("rank", F.row_number().over(w_k))
            .filter(F.col("rank") <= k)
            .select(F.col("_qid").alias(query_id_col),
                    F.col("_iid").alias(id_col), "cos", "rank"))
