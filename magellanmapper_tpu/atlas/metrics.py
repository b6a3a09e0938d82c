"""Registration similarity metrics (JAX, differentiable).

Replaces Elastix's metric plugins (``magmap/settings/atlas_prof.py:13``
``metric_similarity`` defaults to ``AdvancedMattesMutualInformation``;
``ncc`` profile swaps in ``AdvancedNormalizedCorrelation``) and ITK's
``LabelOverlapMeasuresImageFilter`` DSC
(``magmap/atlas/atlas_refiner.py:1636`` ``measure_overlap``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ncc(fixed: jnp.ndarray, moving: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Normalized cross-correlation in [-1, 1]."""
    f = fixed.reshape(-1)
    m = moving.reshape(-1)
    if mask is not None:
        w = mask.reshape(-1).astype(f.dtype)
        n = jnp.maximum(w.sum(), 1.0)
        fm = (f * w).sum() / n
        mm = (m * w).sum() / n
        fc = (f - fm) * w
        mc = (m - mm) * w
    else:
        fc = f - f.mean()
        mc = m - m.mean()
    num = (fc * mc).sum()
    den = jnp.sqrt((fc * fc).sum() * (mc * mc).sum()) + 1e-8
    return num / den


def _parzen_weights(x: jnp.ndarray, nbins: int) -> jnp.ndarray:
    """Cubic B-spline Parzen window soft binning -> ``(N, nbins)``.

    ``x`` is intensity scaled into bin space ``[0, nbins-1]``.
    """
    bins = jnp.arange(nbins, dtype=jnp.float32)
    u = x[:, None] - bins[None, :]
    au = jnp.abs(u)
    w = jnp.where(
        au < 1.0, (4 - 6 * au ** 2 + 3 * au ** 3) / 6,
        jnp.where(au < 2.0, (2 - au) ** 3 / 6, 0.0))
    return w


def mattes_mi(
        fixed: jnp.ndarray, moving: jnp.ndarray, nbins: int = 32,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mattes mutual information via a soft joint histogram.

    Joint probabilities accumulate as one ``(nbins, N) @ (N, nbins)``
    matmul over cubic-Parzen weight matrices — the MXU does the histogram.
    """
    f = fixed.reshape(-1).astype(jnp.float32)
    m = moving.reshape(-1).astype(jnp.float32)

    def to_bins(x):
        lo = jnp.min(x)
        hi = jnp.max(x)
        return (x - lo) / jnp.maximum(hi - lo, 1e-8) * (nbins - 1)

    wf = _parzen_weights(to_bins(f), nbins)
    wm = _parzen_weights(to_bins(m), nbins)
    if mask is not None:
        wf = wf * mask.reshape(-1, 1)
    joint = jnp.matmul(
        wf.T, wm, precision=jax.lax.Precision.HIGHEST)
    joint = joint / jnp.maximum(joint.sum(), 1e-8)
    pf = joint.sum(axis=1, keepdims=True)
    pm = joint.sum(axis=0, keepdims=True)
    ratio = joint / jnp.maximum(pf * pm, 1e-12)
    return jnp.sum(joint * jnp.log(jnp.maximum(ratio, 1e-12)))


def metric_loss(
        name: str, fixed: jnp.ndarray, moving: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Minimizable loss for an Elastix metric name."""
    if name in ("AdvancedMattesMutualInformation", "mi"):
        return -mattes_mi(fixed, moving, mask=mask)
    if name in ("AdvancedNormalizedCorrelation", "ncc"):
        # elastix minimizes -NCC^2/...; plain -NCC behaves equivalently
        return -ncc(fixed, moving, mask=mask)
    if name in ("mse", "AdvancedMeanSquares"):
        if mask is not None:
            w = mask.astype(fixed.dtype)
            return jnp.sum(w * (fixed - moving) ** 2) / jnp.maximum(
                w.sum(), 1.0)
        return jnp.mean((fixed - moving) ** 2)
    raise ValueError(f"unknown metric: {name}")


def dice(mask_a: jnp.ndarray, mask_b: jnp.ndarray) -> jnp.ndarray:
    """Dice similarity coefficient of two boolean masks."""
    a = mask_a.astype(jnp.float32)
    b = mask_b.astype(jnp.float32)
    inter = (a * b).sum()
    return 2.0 * inter / jnp.maximum(a.sum() + b.sum(), 1e-8)


def measure_overlap(
        img_a, img_b, thresh_a: Optional[float] = None,
        thresh_b: Optional[float] = None) -> float:
    """DSC of foreground masks from two intensity images.

    Reference ``atlas_refiner.measure_overlap`` (``:1636``): threshold each
    image (given threshold or Otsu) and compute the Dice coefficient.
    """
    import numpy as np
    from magellanmapper_tpu.ops import preproc

    def to_mask(img, thresh):
        arr = jnp.asarray(np.asarray(img, np.float32))
        if thresh is None:
            thresh = preproc.otsu_threshold(arr)
        return arr > thresh

    return float(dice(to_mask(img_a, thresh_a), to_mask(img_b, thresh_b)))
