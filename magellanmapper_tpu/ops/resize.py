"""Resampling ops (JAX ``jax.image.resize``-based).

Equivalent of the reference's ``skimage.transform.resize/rescale`` wrappers
(``magmap/cv/cv_nd.py:1040-1167`` ``calc_isotropic_factor``,
``make_isotropic``, ``rescale_resize``): both use the half-pixel coordinate
convention, so trilinear results match ``transform.resize(order=1)`` up to
border handling.
"""

from __future__ import annotations

import functools as _functools
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


def resize_sharded(
        vol: jax.Array, shape: Sequence[int], mesh, order: int = 1,
        axis_name=None) -> jax.Array:
    """:func:`resize` with the volume sharded over a device mesh.

    Linear/nearest resize is separable, so the 3D resize runs as three
    1D passes with a transpose-style reshard in the middle (the
    distributed-FFT recipe): the z and y passes run with x sharded
    (both are local — they mix only unsharded axes), then one reshard
    to z-sharded makes the x pass local too. XLA inserts the
    all-to-all; the output comes back z-sharded, ready for z-slab
    streaming. Scales whole-brain resize (reference ``Downsampler``
    mp.Pool, ``magmap/atlas/transformer.py:21``) across chips'
    aggregate HBM bandwidth.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis_name is None:
        # largest mesh axis carries the shards
        axis_name = max(mesh.shape, key=lambda k: mesh.shape[k])
    out_shape = tuple(int(s) for s in shape)
    if len(out_shape) != 3 or vol.ndim < 3:
        return resize(vol, shape, order=order)  # sharding is 3D-only
    trailing = (None,) * (vol.ndim - 3)
    return _resize_sharded_fn(out_shape, mesh, axis_name,
                              vol.ndim - 3, order)(vol)


@_functools.cache
def _resize_sharded_fn(out_shape, mesh, axis_name, n_trailing, order):
    """Build (and cache — remote compiles cost minutes) the jitted
    transpose-style sharded resize for one output-shape/mesh/order."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    trailing = (None,) * n_trailing
    shard_x = NamedSharding(mesh, P(None, None, axis_name, *trailing))
    shard_z = NamedSharding(mesh, P(axis_name, None, None, *trailing))
    method = "nearest" if order == 0 else "linear"

    def f(v):
        dtype = v.dtype
        if order:
            v = v.astype(jnp.float32)
        v = jax.lax.with_sharding_constraint(v, shard_x)
        for ax, target in ((0, out_shape[0]), (1, out_shape[1])):
            s = list(v.shape)
            s[ax] = target
            v = jax.image.resize(v, tuple(s), method=method)
        v = jax.lax.with_sharding_constraint(v, shard_z)
        s = list(v.shape)
        s[2] = out_shape[2]
        v = jax.image.resize(v, tuple(s), method=method)
        v = jax.lax.with_sharding_constraint(v, shard_z)
        return v.astype(dtype) if order == 0 else v

    return jax.jit(f)


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
