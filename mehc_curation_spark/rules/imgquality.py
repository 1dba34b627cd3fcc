"""No-reference image quality kernel + gate (opt-in curation rule).

Extends the decode gate (F1 analog — the reference's only image-side
rule, ``/root/reference/mehc_curation/validation/utils/validation_utils.py:26-32``)
with web-scale quality thresholds: tiny, extreme-aspect, blurred,
low-entropy and flat images waste training compute even when they
decode cleanly. No reference analog — graft-only, default OFF.

Shared scalar kernel contract: :func:`quality_metrics` is the single
source of truth imported by the distributed Arrow stage, the
standalone ``operators.multimodal`` surface, AND the pandas oracle, so
distributed/local parity is by construction (same policy as every
other rule in this package).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def quality_metrics(px: np.ndarray) -> tuple[int, float, float, float, float]:
    """Scalar quality kernel over one decoded image (h, w, 3 uint8).

    Returns (min_dim, aspect, blur_var, entropy, flat_frac):

    - ``blur_var``: variance of the 5-point Laplacian of luminance —
      the classic no-reference blur detector (Pech-Pacheco et al.,
      ICPR 2000); near-zero for defocused/smooth images.
    - ``entropy``: Shannon entropy (bits) of the 256-bin luminance
      histogram; near-zero for blank/placeholder images.
    - ``flat_frac``: modal-bin share of the luminance histogram; ~1.0
      for solid-color images (catches high-entropy-but-flat edge cases
      the entropy bound alone misses and vice versa).

    All floats rounded to 4 decimals so distributed/local runs compare
    exactly.
    """
    h, w = int(px.shape[0]), int(px.shape[1])
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    min_dim = min(h, w)
    aspect = round(max(h, w) / max(min_dim, 1), 4)
    if h >= 3 and w >= 3:
        lap = (4.0 * luma[1:-1, 1:-1] - luma[:-2, 1:-1] - luma[2:, 1:-1]
               - luma[1:-1, :-2] - luma[1:-1, 2:])
        blur_var = round(float(lap.var()), 4)
    else:
        blur_var = 0.0
    counts = np.bincount(
        np.clip(np.round(luma), 0, 255).astype(np.int64).ravel(),
        minlength=256)
    p = counts[counts > 0] / luma.size
    entropy = round(float(-(p * np.log2(p)).sum()), 4)
    flat_frac = round(float(counts.max()) / luma.size, 4)
    return min_dim, aspect, blur_var, entropy, flat_frac


def quality_reason(px: np.ndarray, min_dim: int, max_aspect: float,
                   min_blur_var: float, min_entropy: float,
                   max_flat_frac: float) -> Optional[str]:
    """First-failing quality reason for a decoded image, else None.

    Reason order (img_too_small -> img_extreme_aspect -> img_blurry ->
    img_low_entropy -> img_flat) matches the standalone
    ``operators.multimodal.image_quality_gate`` Catalyst expression.
    """
    md, asp, bv, ent, ff = quality_metrics(px)
    if md < min_dim:
        return "img_too_small"
    if asp > max_aspect:
        return "img_extreme_aspect"
    if bv < min_blur_var:
        return "img_blurry"
    if ent < min_entropy:
        return "img_low_entropy"
    if ff > max_flat_frac:
        return "img_flat"
    return None


def border_metrics(px: np.ndarray, tol: int = 8) -> tuple[int, int, int, int, float]:
    """Uniform-border (letterbox / pillarbox / frame) thickness per
    side over one decoded image (h, w, 3 uint8).

    A row counts as border when its luminance span (max-min) is within
    ``tol`` AND its mean stays within ``tol`` of the outermost row's
    mean — i.e. the side is one near-solid color, not merely
    low-contrast. Each side is measured independently against its own
    edge anchor (top/bottom bars may be black while a left bar is
    white). Returns (top, bottom, left, right, border_frac) where
    border_frac = 1 - inner_area/total_area with
    inner = max(0, h-top-bottom) * max(0, w-left-right); an all-flat
    image therefore reports border_frac = 1.0.

    Integer thicknesses and a 4-decimal fraction so distributed and
    local recomputes compare exactly.
    """
    h, w = int(px.shape[0]), int(px.shape[1])
    luma = np.round(0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                    + 0.114 * px[:, :, 2]).astype(np.int64)

    def _run(spans: np.ndarray, means: np.ndarray) -> int:
        flat = (spans <= tol) & (np.abs(means - means[0]) <= tol)
        bad = np.flatnonzero(~flat)
        return int(bad[0]) if bad.size else int(flat.size)

    row_span = luma.max(axis=1) - luma.min(axis=1)
    row_mean = luma.mean(axis=1)
    col_span = luma.max(axis=0) - luma.min(axis=0)
    col_mean = luma.mean(axis=0)
    top = _run(row_span, row_mean)
    bottom = _run(row_span[::-1], row_mean[::-1])
    left = _run(col_span, col_mean)
    right = _run(col_span[::-1], col_mean[::-1])
    inner = max(0, h - top - bottom) * max(0, w - left - right)
    frac = round(1.0 - inner / (h * w), 4) if h * w else 1.0
    return top, bottom, left, right, frac


def color_metrics(px: np.ndarray) -> tuple[float, float, int]:
    """Scalar color kernel over one decoded image (h, w, 3 uint8).

    Returns (colorfulness, sat_mean, max_chan_spread):

    - ``colorfulness``: the Hasler & Süsstrunk metric (SPIE 2003) —
      sqrt(σ_rg² + σ_yb²) + 0.3·sqrt(μ_rg² + μ_yb²) over the opponent
      axes rg = R−G, yb = (R+G)/2 − B. The signal LAION-style corpora
      use to drop washed-out scans and near-monochrome placeholders.
    - ``sat_mean``: mean HSV-style saturation, (max−min)/max per pixel
      (0 where max = 0).
    - ``max_chan_spread``: max over pixels of (max−min) channel spread
      — exactly 0 for true grayscale; a tolerance on it tolerates
      chroma-subsampled "grayscale" JPEGs.

    Floats rounded to 4 decimals so distributed/local runs compare
    exactly (same policy as :func:`quality_metrics`).
    """
    p = px.astype(np.float64)
    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    colorfulness = round(float(
        np.sqrt(rg.var() + yb.var())
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)), 4)
    mx = p.max(axis=2)
    mn = p.min(axis=2)
    sat = np.where(mx > 0, (mx - mn) / np.where(mx > 0, mx, 1.0), 0.0)
    sat_mean = round(float(sat.mean()), 4)
    max_chan_spread = int((mx - mn).max())
    return colorfulness, sat_mean, max_chan_spread


def exposure_metrics(px: np.ndarray, clip_lo: int = 2,
                     clip_hi: int = 253) -> tuple[float, float, float, float]:
    """Scalar exposure kernel over one decoded image (h, w, 3 uint8).

    Returns (clip_lo_frac, clip_hi_frac, mean_luma, luma_contrast):
    the fraction of pixels whose luminance is crushed to the black
    (<= clip_lo) or blown to the white (>= clip_hi) end, plus mean and
    std of luminance. The classic exposure gates — a crawl corpus is
    full of black placeholder frames, blown-out scans and gray
    thumbnails that decode fine but train badly.

    Floats rounded to 4 decimals for distributed/local parity.
    """
    luma = np.round(0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                    + 0.114 * px[:, :, 2])
    n = luma.size
    lo = round(float((luma <= clip_lo).sum()) / n, 4)
    hi = round(float((luma >= clip_hi).sum()) / n, 4)
    return (lo, hi, round(float(luma.mean()), 4),
            round(float(luma.std()), 4))


def watermark_strip_score(px: np.ndarray,
                          strip_frac: float = 0.125) -> tuple[float, float]:
    """Bottom-strip overlay heuristic over one decoded image.

    Watermarks / captions burned into crawled images overwhelmingly
    sit in a horizontal band at the bottom; the burned-in text is
    high-frequency against its local background. Signal: mean absolute
    horizontal gradient of luminance inside the bottom ``strip_frac``
    band vs the rest of the image. Returns
    (strip_edge_density, edge_ratio) where edge_ratio =
    strip / max(rest, 1e-6), rounded to 4 decimals — ratios well
    above 1 mean the bottom band is busier than the image, the
    overlay signature. A heuristic prior, not a classifier: use it to
    route images to (or gate training of) a real watermark model.
    """
    h = px.shape[0]
    cut = max(1, h - max(1, int(round(h * strip_frac))))
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] \
        + 0.114 * px[:, :, 2]
    grad = np.abs(np.diff(luma, axis=1))
    strip = float(grad[cut:].mean()) if grad[cut:].size else 0.0
    rest = float(grad[:cut].mean()) if grad[:cut].size else 0.0
    ratio = strip / max(rest, 1e-6)
    return round(strip, 4), round(min(ratio, 9999.0), 4)
