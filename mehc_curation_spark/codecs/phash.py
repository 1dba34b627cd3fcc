"""64-bit perceptual hash (classic pHash construction, public technique).

Pipeline: RGB → luma → area-average resample to 32x32 → 2D DCT-II →
top-left 8x8 low-frequency block (DC term excluded from the median) →
threshold at median → 64 bits packed into a signed int64 (matches the
table's ``phash bigint`` column).

Plays the role the canonical SMILES string plays for dedup identity in
the reference (`/root/reference/mehc_curation/utils/common.py:93-99`).
"""

from __future__ import annotations

import numpy as np

_M = 32
_j = np.arange(_M)
_DCT32 = np.cos(np.pi * (2 * _j[None, :] + 1) * _j[:, None] / (2 * _M)) * np.sqrt(2.0 / _M)
_DCT32[0, :] = 1.0 / np.sqrt(_M)

_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _resample_area(gray: np.ndarray, size: int = _M) -> np.ndarray:
    """Box/area-average resample to size x size (handles any h, w)."""
    h, w = gray.shape
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    # cumulative-sum integral image for exact box averages
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    # guard degenerate cells when h or w < size
    y1 = np.maximum(y1, y0 + 1)
    x1 = np.maximum(x1, x0 + 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = ii[y1][:, x1] - ii[y0][:, x1] - ii[y1][:, x0] + ii[y0][:, x0]
    return s / area


def _luma(px: np.ndarray) -> np.ndarray:
    return (
        0.299 * px[:, :, 0].astype(np.float64)
        + 0.587 * px[:, :, 1].astype(np.float64)
        + 0.114 * px[:, :, 2].astype(np.float64)
    )


def _phash64_gray(gray: np.ndarray) -> int:
    """phash64 over an already-extracted float64 luma plane."""
    small = _resample_area(gray, _M)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].ravel()
    med = np.median(block[1:])  # exclude DC
    bits = (block > med).astype(np.uint64)
    val = np.uint64(np.sum(bits * _BIT_WEIGHTS, dtype=np.uint64))
    return int(val.astype(np.int64))  # wrap into signed bigint range


def phash64(px: np.ndarray) -> int:
    """Perceptual hash of an (h, w, 3) uint8 RGB image → signed int64."""
    return _phash64_gray(_luma(px))


def tile_phashes_of(px: np.ndarray, grid: int = 4) -> list[tuple[int, int]]:
    """Per-tile perceptual hashes: split the image into a grid×grid
    of RELATIVE tiles (boundaries at ``i*h//grid``, so a resized
    variant yields geometrically corresponding tile contents; hash
    equality under rescale holds for textured tiles, not guaranteed
    for near-degenerate DCT blocks) and phash each tile independently.
    Robust to lossy re-encode (quantization noise leaves most tile
    hashes intact); an overlay/local edit changes ONLY the touched
    tiles' hashes — the property partial-image dedup exploits.

    Returns ``[(tile_idx, phash64(tile)), ...]`` for the INFORMATIVE
    tiles only: degenerate (zero-area, when h or w < grid) and
    perfectly flat tiles (luma-constant — letterbox bars, solid
    backgrounds) are omitted, because a flat tile's hash is the same
    for every flat tile in the corpus and would bucket-collide the
    whole dataset.

    The single source of truth for both the distributed operator
    (operators/multimodal.py:tile_near_dups) and its brute-force
    check.

    Vectorized: tiles of EQUAL shape (all 16 when grid divides the
    dims; at most 4 shape groups otherwise, since each dimension
    splits into sizes d and d+1) are stacked and hashed as one batch —
    stacked ``cumsum`` and per-slice GEMMs perform the identical
    per-tile arithmetic as the scalar path, so values are
    BIT-IDENTICAL to ``_phash64_gray`` of each tile (pinned by
    ``tests/test_tile_dedup.py::test_batched_kernel_matches_scalar``).
    Each tile hashes from its OWN pixels only (no shared integral
    image), so identical tile content always yields the identical
    hash — the invariant overlay detection rests on.
    """
    h, w = px.shape[0], px.shape[1]
    # one luma conversion for the whole image; tile slices of the luma
    # plane are pointwise identical to luma of the tile slice, so the
    # hashes match phash64(px[tile]) bit-for-bit. Flatness is tested
    # on LUMA (what the hash actually sees): an iso-luma colored
    # gradient hashes to the same degenerate value as a solid bar and
    # must be skipped too.
    gray = _luma(px)
    groups: dict[tuple[int, int], tuple[list[int], list[np.ndarray]]] = {}
    for i in range(grid):
        y0, y1 = (i * h) // grid, ((i + 1) * h) // grid
        if y1 <= y0:
            continue
        for j in range(grid):
            x0, x1 = (j * w) // grid, ((j + 1) * w) // grid
            if x1 <= x0:
                continue
            idxs, ts = groups.setdefault((y1 - y0, x1 - x0), ([], []))
            idxs.append(i * grid + j)
            ts.append(gray[y0:y1, x0:x1])
    out = []
    for (th, tw), (idxs, ts) in groups.items():
        batch = np.stack(ts)                       # (k, th, tw)
        mn = batch.min(axis=(1, 2))
        keep = batch.max(axis=(1, 2)) != mn        # luma-flat -> skip
        if not keep.any():
            continue
        batch, idxs = batch[keep], [x for x, k in zip(idxs, keep) if k]
        k = batch.shape[0]
        # batched area-resample: per-tile integral images (stacked
        # cumsum == per-tile cumsum additions, bit-exact)
        ii = np.zeros((k, th + 1, tw + 1), dtype=np.float64)
        ii[:, 1:, 1:] = np.cumsum(np.cumsum(batch, axis=1), axis=2)
        ys = (np.arange(_M + 1) * th) // _M
        xs = (np.arange(_M + 1) * tw) // _M
        y0s, y1s = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
        x0s, x1s = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
        area = (y1s - y0s)[:, None] * (x1s - x0s)[None, :]
        s = (ii[:, y1s[:, None], x1s[None, :]]
             - ii[:, y0s[:, None], x1s[None, :]]
             - ii[:, y1s[:, None], x0s[None, :]]
             + ii[:, y0s[:, None], x0s[None, :]])
        small = s / area
        # batched DCT: matmul loops per-slice GEMMs identical to the
        # scalar _DCT32 @ small @ _DCT32.T
        dct = np.matmul(np.matmul(_DCT32, small), _DCT32.T)
        block = dct[:, :8, :8].reshape(k, 64)
        med = np.median(block[:, 1:], axis=1)      # exclude DC
        bits = (block > med[:, None]).astype(np.uint64)
        vals = np.sum(bits * _BIT_WEIGHTS[None, :], axis=1,
                      dtype=np.uint64).astype(np.int64)
        out.extend(zip(idxs, (int(v) for v in vals)))
    out.sort()
    return out


def _tile_phashes_scalar(px: np.ndarray, grid: int = 4) -> list[tuple[int, int]]:
    """Straight-line scalar twin of :func:`tile_phashes_of` (one
    ``_phash64_gray`` call per tile) — the readable specification the
    batched kernel must match bit-for-bit; kept for the parity test
    and for auditing."""
    h, w = px.shape[0], px.shape[1]
    gray = _luma(px)
    out = []
    for i in range(grid):
        y0, y1 = (i * h) // grid, ((i + 1) * h) // grid
        if y1 <= y0:
            continue
        for j in range(grid):
            x0, x1 = (j * w) // grid, ((j + 1) * w) // grid
            if x1 <= x0:
                continue
            t = gray[y0:y1, x0:x1]
            if t.min() == t.max():
                continue
            out.append((i * grid + j, _phash64_gray(t)))
    return out


def phash64_flip(px: np.ndarray) -> int:
    """Mirror-invariant perceptual hash: the numerically smaller (as
    unsigned 64-bit) of phash64(image) and phash64(horizontally
    mirrored image). A mirrored repost hashes to the SAME value as the
    original, so exact-equality dedup on this column catches
    flip-variants that plain phash sees as distant (a horizontal flip
    negates the odd-column DCT coefficients — typically ~30 bits
    flip). Canonicalization by unsigned min is order-free: both
    orientations map to one canonical hash.
    """
    a = phash64(px) & 0xFFFFFFFFFFFFFFFF
    b = phash64(px[:, ::-1]) & 0xFFFFFFFFFFFFFFFF
    m = a if a <= b else b
    return int(np.uint64(m).astype(np.int64))


def phash64_dihedral(px: np.ndarray) -> int:
    """Dihedral-invariant perceptual hash: the unsigned-min of phash64
    over the full D4 orbit of the image — the 8 variants reachable by
    90°-rotations and mirrors. A rotated (90/180/270) or flipped
    re-upload hashes to the SAME canonical value as the original, so
    exact-equality dedup on this column collapses the whole orbit.

    Invariance is EXACT and needs no symmetry property of the resample
    or DCT: for any dihedral transform T, the orbit of T(px) is the
    same 8-element set as the orbit of px (group closure), so the min
    over the set is identical. Cost: one decode, one luma extraction
    (luma commutes with axis permutations), 8 resample+DCT passes on
    the 32x32 path — still O(pixels) dominated by the decode.
    """
    gray = _luma(px)
    mirrored = gray[:, ::-1]
    best = min(
        _phash64_gray(np.rot90(g, k)) & 0xFFFFFFFFFFFFFFFF
        for g in (gray, mirrored)
        for k in range(4)
    )
    return int(np.uint64(best).astype(np.int64))
