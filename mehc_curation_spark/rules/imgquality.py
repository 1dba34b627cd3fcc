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
