"""Deterministic bilinear image resize (pure NumPy, float64 math).

The image-domain analog of the reference's payload-transform shape —
a per-row ``(new_value, changed?)`` projection over the payload column
(`/root/reference/mehc_curation/cleaning/core/engine.py:36-85`), here
producing a new encoded payload at a target resolution. Training-data
pipelines resize as a normalization step (cap the longest side before
storage/training); determinism matters because the resized corpus is
re-hashed (phash) and exported, so the same input must produce the
same bytes on every executor and every rerun.

Sampling convention: half-pixel centers (``src = (dst + 0.5) * scale
- 0.5``), the align_corners=False convention used by OpenCV/PIL/torch.
All arithmetic is float64 with a final round-half-even + clip, so the
result is bit-identical across partitionings and hosts (no SIMD
reassociation: operations are NumPy ufuncs over contiguous arrays).
"""

from __future__ import annotations

import numpy as np

__all__ = ["fit_dims", "resize_bilinear"]


def fit_dims(w: int, h: int, target: int, mode: str = "longest",
             upscale: bool = False) -> tuple[int, int, bool]:
    """Output dims for resizing (w, h) so the longest/shortest side
    hits ``target``, aspect preserved.

    Returns ``(out_w, out_h, resized)``; ``resized`` is False when the
    image already satisfies the bound and ``upscale`` is off (the
    caller should pass the payload through untouched — byte-identical,
    like the reference's unchanged-row fast path).

    mode="exact" ignores aspect and forces target x target.
    """
    if mode not in ("longest", "shortest", "exact"):
        raise ValueError(f"unknown resize mode {mode!r}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dims {w}x{h}")
    if mode == "exact":
        if (w, h) == (target, target):
            return target, target, False
        return target, target, True
    side = max(w, h) if mode == "longest" else min(w, h)
    if side == target or (side < target and not upscale):
        return w, h, False
    s = target / side
    out_w = max(1, int(np.floor(w * s + 0.5)))
    out_h = max(1, int(np.floor(h * s + 0.5)))
    return out_w, out_h, (out_w, out_h) != (w, h)


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample an (h, w, 3) uint8 array to (out_h, out_w, 3).

    Half-pixel-center sampling with edge clamping; float64 throughout;
    round-half-even then clip to uint8. Deterministic.
    """
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = px.shape[:2]
    if (out_h, out_w) == (h, w):
        return np.ascontiguousarray(px, dtype=np.uint8)
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    # fractional weights, clamped so edge extrapolation stays inside
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    py0, py1 = p[y0], p[y1]  # gather rows once; each is a full copy
    top = py0[:, x0] * (1.0 - wx) + py0[:, x1] * wx
    bot = py1[:, x0] * (1.0 - wx) + py1[:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
