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
from pyspark.sql.types import BinaryType, DoubleType

from mehc_curation_spark.operators.similarity import (
    _stack_embeddings,
    _train_kmeans_np,
    cosine_topk,
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

    Sample selection mirrors :func:`~.similarity.ivf_index`: a per-row
    hash filter (`xxhash64(id) % denom == 0` — never ``df.sample``,
    whose output depends on partition layout), id-ordered, capped —
    then fixed-seed Lloyd's per subspace (seed varies by subspace so
    codebooks are independent)."""
    target = min(max_train, n_codes * 1024)
    n = df.count() if n_rows is None else n_rows
    denom = max(1, n // target)
    rows = (df.filter(F.xxhash64(F.col(id_col)) % denom == 0)
            .orderBy(id_col).limit(target).select(vec_col).collect())
    sample = [np.asarray(r[0], dtype=np.float64)
              for r in rows if r[0] is not None]
    if sample:
        from collections import Counter

        dim = Counter(len(v) for v in sample).most_common(1)[0][0]
        sample = [v for v in sample if len(v) == dim]
    if not sample:
        raise ValueError("train_pq: no trainable vectors (input empty or "
                         f"every sampled '{vec_col}' is NULL/empty)")
    X = _normalize_rows(np.asarray(sample))
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
