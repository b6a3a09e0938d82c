"""Resampling ops (JAX ``jax.image.resize``-based).

Equivalent of the reference's ``skimage.transform.resize/rescale`` wrappers
(``magmap/cv/cv_nd.py:1040-1167`` ``calc_isotropic_factor``,
``make_isotropic``, ``rescale_resize``): both use the half-pixel coordinate
convention, so trilinear results match ``transform.resize(order=1)`` up to
border handling.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def calc_isotropic_factor(
        scale: Union[float, Sequence[float]],
        res: Sequence[float]) -> np.ndarray:
    """Per-axis resize factor making ``res`` isotropic, times ``scale``."""
    res = np.asarray(res, dtype=float)
    return np.divide(res, res.min()) * np.asarray(scale, dtype=float)


def resize(
        vol: jax.Array, shape: Sequence[int], order: int = 1) -> jax.Array:
    """Resize to ``shape``; ``order`` 0 = nearest (labels), 1 = trilinear."""
    method = "nearest" if order == 0 else "linear"
    out_shape = tuple(int(s) for s in shape) + tuple(vol.shape[len(shape):])
    dtype = vol.dtype
    out = jax.image.resize(
        vol.astype(jnp.float32) if order else vol, out_shape, method=method)
    return out.astype(dtype) if order == 0 else out


def rescale(
        vol: jax.Array, factor: Union[float, Sequence[float]],
        order: int = 1) -> jax.Array:
    """Rescale spatial axes by ``factor`` (scalar or per-axis)."""
    factor = np.atleast_1d(np.asarray(factor, dtype=float))
    if factor.size == 1:
        factor = np.repeat(factor, min(vol.ndim, 3))
    shape = [int(s * f) for s, f in zip(vol.shape, factor)]
    return resize(vol, shape, order=order)


def make_isotropic(
        vol: jax.Array, scale: Union[float, Sequence[float]],
        res: Sequence[float], order: int = 1) -> jax.Array:
    """Resample so voxel spacing becomes isotropic (reference
    ``cv_nd.make_isotropic``)."""
    factor = calc_isotropic_factor(scale, res)
    shape = (np.asarray(vol.shape[:3]) * factor).astype(int)
    return resize(vol, shape, order=order)
