"""Spatial transform models for registration (JAX).

TPU-native replacements for Elastix's transform stack
(``magmap/atlas/register.py:423`` ``register_duo`` builds
translation/affine/bspline parameter maps; Transformix applies the stored
transform at order 0 for labels, ``register.py:616-638``):

 - transforms map **fixed-image voxel coordinates -> moving-image voxel
   coordinates**; resampling takes the moving image at those coordinates.
 - the B-spline free-form deformation evaluates cubic B-spline basis
   matrices as dense per-axis matmuls (MXU-friendly separable tensor
   product), not gathers.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def identity_params(kind: str, grid_shape=None) -> Dict[str, jnp.ndarray]:
    """Initial (identity) parameters for a transform stage."""
    if kind == "translation":
        return {"t": jnp.zeros(3)}
    if kind == "affine":
        return {"W": jnp.zeros((3, 3)), "t": jnp.zeros(3)}
    if kind == "bspline":
        assert grid_shape is not None
        return {"grid": jnp.zeros((3,) + tuple(grid_shape))}
    raise ValueError(kind)


def _coords(shape: Sequence[int],
            stride: Sequence[int] = (1, 1, 1),
            offset: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Voxel-center coordinate grid, shape ``(3, Z, Y, X)``.

    ``offset`` (3 traced scalars in ``[0, stride)``) jitters the strided
    sample grid — Elastix redraws random spatial samples each iteration
    (``NumberOfSpatialSamples``); a fixed strided grid can alias with the
    B-spline grid and bias MI. Coordinates clamp to the volume.
    """
    ranges = [jnp.arange(0, s, st, dtype=jnp.float32)
              for s, st in zip(shape, stride)]
    if offset is not None:
        starts = _clamped_starts(shape, stride, offset)
        ranges = [r + starts[ax].astype(jnp.float32)
                  for ax, r in enumerate(ranges)]
    zz, yy, xx = jnp.meshgrid(*ranges, indexing="ij")
    return jnp.stack([zz, yy, xx])


def _clamped_starts(shape, stride, offset):
    """Per-axis jitter starts clamped so the whole strided window stays
    in bounds (lets :func:`strided_sample` use one ``dynamic_slice``
    instead of a 3-axis gather — the gather cost ~10% of a Mattes-MI
    optimizer step on v5e)."""
    out = []
    for ax, (s, st) in enumerate(zip(shape, stride)):
        n = -(-s // st)
        window = (n - 1) * st + 1
        out.append(jnp.minimum(
            offset[ax], jnp.int32(max(s - window, 0))).astype(jnp.int32))
    return out


def strided_sample(
        vol: jnp.ndarray, stride: Sequence[int] = (1, 1, 1),
        offset: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather ``vol`` on the (optionally jittered) strided sample grid —
    the fixed-image counterpart of ``resample(..., stride, offset)``."""
    if offset is None:
        return vol[::stride[0], ::stride[1], ::stride[2]]
    starts = _clamped_starts(vol.shape, stride, offset)
    sizes = tuple(
        (-(-s // st) - 1) * st + 1
        for s, st in zip(vol.shape, stride))
    window = jax.lax.dynamic_slice(vol, starts, sizes)
    return window[::stride[0], ::stride[1], ::stride[2]]


def cubic_bspline(u: np.ndarray) -> np.ndarray:
    """Cubic B-spline basis beta^3(u) (support |u| < 2)."""
    au = np.abs(u)
    out = np.zeros_like(au)
    m1 = au < 1
    m2 = (au >= 1) & (au < 2)
    out[m1] = (4 - 6 * au[m1] ** 2 + 3 * au[m1] ** 3) / 6
    out[m2] = (2 - au[m2]) ** 3 / 6
    return out


@functools.lru_cache(maxsize=128)
def _bspline_basis(n_vox: int, n_ctrl: int, spacing: float,
                   stride: int = 1) -> np.ndarray:
    """Dense basis matrix ``B (ceil(n_vox/stride), n_ctrl)``: control
    points sit at ``(j - 1) * spacing`` so the grid pads one point beyond
    each edge; ``stride`` evaluates the basis at every ``stride``-th
    voxel (metric subsampling)."""
    x = np.arange(0, n_vox, stride, dtype=np.float64)
    j = np.arange(n_ctrl, dtype=np.float64)
    u = x[:, None] / spacing - (j[None, :] - 1.0)
    return cubic_bspline(u).astype(np.float32)


def bspline_grid_shape(
        shape: Sequence[int], spacing: Sequence[float]) -> Tuple[int, ...]:
    """Control-grid shape covering ``shape`` with one pad point per side
    plus the two extra support points of the cubic kernel."""
    return tuple(
        int(np.ceil((s - 1) / sp)) + 3 for s, sp in zip(shape, spacing))


def bspline_displacement(
        grid: jnp.ndarray, shape: Sequence[int],
        spacing: Sequence[float],
        stride: Sequence[int] = (1, 1, 1)) -> jnp.ndarray:
    """Dense displacement field ``(3, Z, Y, X)`` from control grid
    ``(3, gz, gy, gx)`` via separable cubic B-spline tensor product;
    ``stride`` evaluates on a strided voxel grid."""
    out = grid
    for ax in range(3):
        basis = jnp.asarray(_bspline_basis(
            int(shape[ax]), int(grid.shape[ax + 1]), float(spacing[ax]),
            int(stride[ax])))
        # contract control axis ax+1 against basis -> voxel axis at end
        out = jnp.tensordot(
            out, basis, axes=((1,), (1,)),
            precision=jax.lax.Precision.HIGHEST)
        # tensordot appends the voxel axis; keep axis order (3, ..., vox)
    # out axes: (3, vz, vy, vx) after three contractions in order
    return out


def transform_coords(
        params: Dict[str, jnp.ndarray], kind: str,
        shape: Sequence[int],
        spacing: Optional[Sequence[float]] = None,
        pre_affine: Optional[Dict[str, jnp.ndarray]] = None,
        stride: Sequence[int] = (1, 1, 1),
        offset: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Map fixed voxel coords to moving voxel coords, ``(3, Z, Y, X)``.

    ``bspline`` composes with ``pre_affine`` (affine applied after the
    FFD warp of fixed-space coordinates, the ANTs-style composition).
    ``stride`` maps only every stride-th fixed voxel (metric sampling);
    ``offset`` jitters the strided grid per iteration.
    """
    coords = _coords(shape, stride, offset)
    if kind == "translation":
        return coords + params["t"][:, None, None, None]
    if kind == "affine":
        return _apply_affine(params, coords, shape)
    if kind == "bspline":
        if offset is None:
            disp = bspline_displacement(
                params["grid"], shape, spacing, stride)
        else:
            # jittered grid: evaluate the FFD at the exact jittered coords
            pts = coords.reshape(3, -1).T
            disp = bspline_displacement_at(
                params["grid"], pts, spacing).T.reshape(coords.shape)
        warped = coords + disp
        if pre_affine is not None:
            return _apply_affine(pre_affine, warped, shape)
        return warped
    raise ValueError(kind)


def _cubic_bspline_jnp(u: jnp.ndarray) -> jnp.ndarray:
    """Cubic B-spline basis beta^3(u) (traced-input version)."""
    au = jnp.abs(u)
    return jnp.where(
        au < 1.0, (4 - 6 * au ** 2 + 3 * au ** 3) / 6,
        jnp.where(au < 2.0, (2 - au) ** 3 / 6, 0.0))


def bspline_displacement_at(
        grid: jnp.ndarray, pts: jnp.ndarray,
        spacing: Sequence[float]) -> jnp.ndarray:
    """FFD displacement at arbitrary points ``pts (N, 3)`` -> ``(N, 3)``.

    Separable per-point basis (``N x g_ax`` weight matrices) contracted
    against the control grid — used by the point-based metric and the
    jittered metric sampling grid.
    """
    ws = []
    for ax in range(3):
        j = jnp.arange(grid.shape[ax + 1], dtype=jnp.float32)
        u = pts[:, ax:ax + 1] / jnp.float32(spacing[ax]) - (j[None, :] - 1.0)
        ws.append(_cubic_bspline_jnp(u))
    return jnp.einsum(
        "ni,nj,nk,cijk->nc", ws[0], ws[1], ws[2], grid,
        precision=jax.lax.Precision.HIGHEST)


def transform_points(
        pts: jnp.ndarray, params: Dict[str, jnp.ndarray], kind: str,
        shape: Sequence[int],
        spacing: Optional[Sequence[float]] = None,
        pre_affine: Optional[Dict[str, jnp.ndarray]] = None) -> jnp.ndarray:
    """Map fixed-space points ``(N, 3)`` to moving-space points.

    The point analog of :func:`transform_coords`, used by the
    CorrespondingPointsEuclideanDistanceMetric replacement (fixed
    landmarks mapped through the transform should land on the moving
    landmarks; reference ``register.py:583-602``).
    """
    pts = jnp.asarray(pts, jnp.float32)

    def apply_affine_pts(p, x):
        center = (jnp.asarray(shape, jnp.float32) - 1) / 2
        a = jnp.eye(3) + p["W"]
        return (x - center) @ a.T + center + p["t"]

    if kind == "translation":
        return pts + params["t"]
    if kind == "affine":
        return apply_affine_pts(params, pts)
    if kind == "bspline":
        warped = pts + bspline_displacement_at(params["grid"], pts, spacing)
        if pre_affine is not None:
            return apply_affine_pts(pre_affine, warped)
        return warped
    raise ValueError(kind)


def resample_grid(
        grid: jnp.ndarray, old_spacing: Sequence[float],
        new_grid_shape: Sequence[int],
        new_spacing: Sequence[float]) -> jnp.ndarray:
    """Re-parameterize an FFD control grid onto a new lattice.

    Evaluates the old grid's displacement field at the new control-point
    locations ``(j - 1) * new_spacing`` — the standard upsampling
    approximation for Elastix's ``GridSpacingSchedule`` level changes
    (the optimizer refines any interpolation residue at the new level).
    """
    axes = [jnp.arange(n, dtype=jnp.float32) - 1.0 for n in new_grid_shape]
    zz, yy, xx = jnp.meshgrid(
        axes[0] * jnp.float32(new_spacing[0]),
        axes[1] * jnp.float32(new_spacing[1]),
        axes[2] * jnp.float32(new_spacing[2]), indexing="ij")
    pts = jnp.stack([zz, yy, xx], axis=-1).reshape(-1, 3)
    disp = bspline_displacement_at(grid, pts, old_spacing)
    return disp.T.reshape((3,) + tuple(new_grid_shape))


def _apply_affine(params, coords: jnp.ndarray, shape) -> jnp.ndarray:
    center = (jnp.asarray(shape, jnp.float32) - 1) / 2
    a = jnp.eye(3) + params["W"]
    flat = coords.reshape(3, -1) - center[:, None]
    out = a @ flat + (center + params["t"])[:, None]
    return out.reshape(coords.shape)


def sample_volume(
        vol: jnp.ndarray, coords: jnp.ndarray, order: int = 1,
        cval: float = 0.0) -> jnp.ndarray:
    """Sample ``vol`` at ``coords (3, ...)``; order 0 = nearest (labels,
    the Transformix ``FinalBSplineInterpolationOrder=0`` path), 1 =
    trilinear."""
    from jax.scipy.ndimage import map_coordinates
    return map_coordinates(
        vol, [coords[0], coords[1], coords[2]], order=order, mode="constant",
        cval=cval)


def resample(
        moving: jnp.ndarray, params: Dict[str, jnp.ndarray], kind: str,
        out_shape: Sequence[int],
        spacing: Optional[Sequence[float]] = None,
        pre_affine: Optional[Dict[str, jnp.ndarray]] = None,
        order: int = 1,
        stride: Sequence[int] = (1, 1, 1),
        offset: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Resample the moving image into fixed space under the transform."""
    coords = transform_coords(
        params, kind, out_shape, spacing, pre_affine, stride, offset)
    return sample_volume(moving, coords, order=order)
