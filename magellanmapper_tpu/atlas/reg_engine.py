"""Multi-resolution registration engine (JAX + optax) — Elastix replacement.

Drives the transform models (``atlas.transform``) against the similarity
metrics (``atlas.metrics``) with Adam over an image pyramid, replacing the
Elastix C++ optimizer the reference calls through SimpleITK/ITK-Elastix
(``magmap/atlas/register.py:423-638`` ``register_duo`` +  Transformix).
Stage parameters come from the profile dicts whose keys mirror the
reference's ``RegParamMap`` (``magmap/settings/atlas_prof.py:13``):
``metric_similarity``, ``max_iter``, ``num_resolutions``,
``grid_space_voxels``, ``grid_spacing_schedule``.

Each pyramid level runs as ONE jitted ``lax.fori_loop`` of optimizer steps
— no per-iteration host round trips.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magellanmapper_tpu.atlas import metrics, transform
from magellanmapper_tpu.ops import filters

_logger = logging.getLogger(__name__)

#: default Adam learning rates per parameter kind (voxel-space units for
#: translations/displacements; unitless for the affine linear part)
_LEARNING_RATES = {"t": 1.0, "W": 0.01, "grid": 0.5}

#: within-level LR decay endpoint (fraction of the initial rate reached
#: on a level's final step; see the step-size note in _optimize_level)
_LR_DECAY_FLOOR = 0.05


def _pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Gaussian pyramid, coarsest first (Elastix recursive pyramid)."""
    out = [img]
    for _ in range(levels - 1):
        smoothed = filters.gaussian_filter(out[0], 1.0, mode="nearest")
        out.insert(0, smoothed[::2, ::2, ::2])
    return out


def _smoothing_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Constant-shape smoothing pyramid, coarsest first.

    Elastix ``FixedSmoothingImagePyramid`` semantics: level ``lvl`` is the
    full-resolution image smoothed with ``sigma = 2^(levels-1-lvl) / 2``
    (half the default ``ImagePyramidSchedule`` factor), NOT downsampled.
    Because every level shares the image shape, all levels of a stage
    reuse ONE compiled XLA program (iteration counts are traced) — the
    downsampling pyramid compiles one program per level, and over the
    remote-TPU link compile time dominated the reduced round-2 schedule
    (BENCH_r02 145 s for ~25 s of optimizer steps).
    """
    out = []
    for lvl in range(levels):
        sigma = (2.0 ** (levels - 1 - lvl)) / 2.0
        out.append(filters.gaussian_filter(img, sigma, mode="nearest"))
    return out


def _erode_mask_by(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary erosion by a cube of half-width ``radius`` (separable
    min via ``reduce_window``)."""
    m = (jnp.asarray(mask) > 0).astype(jnp.float32)
    if radius < 1:
        return m > 0.5
    w = 2 * radius + 1
    for ax in range(3):
        window = [1, 1, 1]
        strides = [1, 1, 1]
        window[ax] = w
        pads = [(0, 0)] * 3
        pads[ax] = (radius, radius)
        m = jax.lax.reduce_window(
            m, jnp.float32(1.0), jax.lax.min, tuple(window),
            tuple(strides), pads)
    return m > 0.5


def _scale_params(params: Dict, factor: float, kind: str) -> Dict:
    """Rescale voxel-space parameters between pyramid levels."""
    out = dict(params)
    if "t" in out:
        out["t"] = out["t"] * factor
    if "grid" in out and kind == "bspline":
        out["grid"] = out["grid"] * factor
    return out


#: cap on metric sample points per optimizer step. Elastix's
#: AdvancedMattesMutualInformation uses ~2048 random spatial samples per
#: iteration (``NumberOfSpatialSamples``); we keep 8x that on a strided
#: jittered grid. The warp gather is the TPU hot spot (it scales with
#: both sample count and the gather table's residency — atlas-scale
#: tables drop the step rate ~2x), so sample count sets iteration time;
#: 32k -> 16k measured no DSC change on the full-schedule gate.
_MAX_METRIC_SAMPLES = 1 << 14


def _metric_stride(
        shape, max_samples: int = _MAX_METRIC_SAMPLES
) -> Tuple[int, int, int]:
    stride = [1, 1, 1]
    while np.prod([-(-s // st) for s, st in zip(shape, stride)]) \
            > max_samples:
        ax = int(np.argmax([s / st for s, st in zip(shape, stride)]))
        stride[ax] *= 2
    return tuple(stride)


def _adam_level_loop(loss_fn, params, iters, lrs, stride, jitter):
    """Shared optimizer loop of the single-device and mesh-sharded
    levels: ``iters`` Adam steps with per-leaf learning rates (Elastix
    scales parameter groups too) and a within-level exponential decay
    to ``_LR_DECAY_FLOOR`` of the initial rate — Elastix's ASGD decays
    its step size ``a_k = a/(A+k)^alpha``, and a fixed-rate Adam was
    measured to stall the full-schedule affine stage at DSC 0.962 (the
    last steps jitter around the optimum at full step size). With
    ``jitter``, each step re-draws a random offset into the strided
    sample grid (Elastix redraws its spatial samples per iteration)."""
    lr_map = dict(lrs)
    opt = optax.adam(1.0)
    use_jitter = jitter and any(s > 1 for s in stride)

    def step(i, state):
        p, opt_state, key = state
        if use_jitter:
            key, sub = jax.random.split(key)
            offset = jax.random.randint(
                sub, (3,), 0, jnp.asarray(stride))
        else:
            offset = None
        loss, grads = jax.value_and_grad(loss_fn)(p, offset)
        updates, opt_state = opt.update(grads, opt_state, p)
        decay = jnp.power(
            jnp.float32(_LR_DECAY_FLOOR),
            i.astype(jnp.float32)
            / jnp.maximum(jnp.asarray(iters, jnp.float32), 1.0))
        updates = {k: v * (lr_map.get(k, 1.0) * decay)
                   for k, v in updates.items()}
        p = optax.apply_updates(p, updates)
        return p, opt_state, key

    state = (params, opt.init(params), jax.random.PRNGKey(0))
    params, _, _ = jax.lax.fori_loop(0, iters, step, state)
    return params, loss_fn(params, None)


@functools.partial(
    jax.jit, static_argnames=("kind", "metric", "spacing", "lrs",
                              "stride", "jitter", "pt_weight"))
def _optimize_level(
        fixed: jnp.ndarray, moving: jnp.ndarray, params: Dict,
        pre_affine: Optional[Dict], kind: str, metric: str, iters,
        spacing: Optional[Tuple[float, ...]], lrs: Tuple[Tuple[str, float],
                                                         ...],
        stride: Tuple[int, int, int] = (1, 1, 1),
        fixed_mask: Optional[jnp.ndarray] = None,
        fix_pts: Optional[jnp.ndarray] = None,
        mov_pts: Optional[jnp.ndarray] = None,
        pt_weight: float = 0.0,
        jitter: bool = True,
        moving_mask: Optional[jnp.ndarray] = None):
    """Run ``iters`` Adam steps at one pyramid level (single XLA program).

    ``fixed_mask`` restricts the metric to mask samples (Elastix fixed
    mask); ``fix_pts``/``mov_pts`` add the corresponding-points Euclidean
    distance term (``CorrespondingPointsEuclideanDistanceMetric``,
    reference ``register.py:583-602``); ``jitter`` re-draws a random
    offset into the strided sample grid every iteration (Elastix redraws
    ``NumberOfSpatialSamples`` random samples per iteration — a static
    grid can alias with the B-spline lattice and bias MI).
    """
    def loss_fn(p, offset):
        moved = transform.resample(
            moving, p, kind, fixed.shape, spacing, pre_affine, order=1,
            stride=stride, offset=offset)
        fixed_s = transform.strided_sample(fixed, stride, offset)
        mask_s = None
        if fixed_mask is not None:
            mask_s = transform.strided_sample(fixed_mask, stride, offset)
        if moving_mask is not None:
            # exclude samples that map outside the moving mask (Elastix
            # sample rejection — not differentiated through)
            mm = jax.lax.stop_gradient(transform.resample(
                moving_mask, p, kind, fixed.shape, spacing, pre_affine,
                order=1, stride=stride, offset=offset))
            mm = (mm > 0.5).astype(jnp.float32)
            mask_s = mm if mask_s is None else mask_s * mm
        loss = metrics.metric_loss(metric, fixed_s, moved, mask=mask_s)
        if fix_pts is not None and mov_pts is not None:
            mapped = transform.transform_points(
                fix_pts, p, kind, fixed.shape, spacing, pre_affine)
            dist = jnp.sqrt(jnp.sum((mapped - mov_pts) ** 2, axis=1) + 1e-12)
            loss = loss + jnp.float32(pt_weight) * jnp.mean(dist)
        return loss

    return _adam_level_loop(loss_fn, params, iters, lrs, stride, jitter)


# ---------------------------------------------------------------------------
# Multi-chip sharded metric + optimizer level (round-4 VERDICT item 2).
#
# Sample-space parallelism over a jax.sharding.Mesh: the metric's sample
# set (the warp gather is the measured hot spot, and at full-resolution
# metric evaluation the Parzen histogram matmul scales with it) shards
# over every mesh axis via shard_map. Pass 1 gathers each device's
# sample chunk from the (replicated) moving volume; the global intensity
# ranges are computed on the replicated sample vectors outside shard_map
# (keeps min/max on the ordinary AD path); pass 2 accumulates each
# device's partial (nbins, nbins) Parzen joint histogram and psums it
# over ICI — the segment-sum collective SURVEY §2.10 maps Mattes-MI to.
# Matches the single-device math exactly up to reduction order
# (pinned by tests/test_reg_sharded.py).


def _all_axes(mesh) -> Tuple[str, ...]:
    return tuple(mesh.axis_names)


def _pad_to(x: jnp.ndarray, n: int, axis: int = 0) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _sharded_gather(mesh, moving, coords, order: int = 1) -> jnp.ndarray:
    """Warp gather with the sample axis sharded over every mesh axis;
    ``moving`` is replicated (a general warp reads arbitrary source
    voxels, so source-sharding would need an all-gather anyway)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = _all_axes(mesh)

    def local(mov, c):
        return transform.sample_volume(mov, c, order=order)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(*(None,) * moving.ndim), P(None, axes)),
        out_specs=P(axes))(moving, coords)


def _sharded_mattes_mi(mesh, f, m, wf_weight, lo_f, hi_f, lo_m, hi_m,
                       nbins: int = 32) -> jnp.ndarray:
    """Mattes MI with the Parzen joint histogram accumulated per device
    and ``psum``'d across the mesh (identical to
    :func:`metrics.mattes_mi` up to summation order)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = _all_axes(mesh)

    def local(f_c, m_c, w_c, lf, hf, lm, hm):
        fb = (f_c - lf) / jnp.maximum(hf - lf, 1e-8) * (nbins - 1)
        mb = (m_c - lm) / jnp.maximum(hm - lm, 1e-8) * (nbins - 1)
        wf = metrics._parzen_weights(fb, nbins) * w_c[:, None]
        wm = metrics._parzen_weights(mb, nbins)
        joint = jnp.matmul(
            wf.T, wm, precision=jax.lax.Precision.HIGHEST)
        joint = jax.lax.psum(joint, axes)
        joint = joint / jnp.maximum(joint.sum(), 1e-8)
        pf = joint.sum(axis=1, keepdims=True)
        pm = joint.sum(axis=0, keepdims=True)
        ratio = joint / jnp.maximum(pf * pm, 1e-12)
        return jnp.sum(joint * jnp.log(jnp.maximum(ratio, 1e-12)))

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(), P(), P(), P()),
        out_specs=P())(
        f, m, wf_weight, lo_f, hi_f, lo_m, hi_m)


def _sharded_metric_loss(mesh, metric: str, f, m, valid, mask):
    """Minimizable sharded loss on flat sample vectors.

    ``valid`` masks padding rows (the sample count is padded up to a
    multiple of the device count); ``mask`` carries the metric mask
    (fixed-mask samples + moving-mask rejection), matching the
    single-device semantics: the MI intensity range ignores the metric
    mask (as :func:`metrics.mattes_mi` does) but never sees padding.
    """
    w_metric = valid if mask is None else valid * mask
    if metric in ("AdvancedMattesMutualInformation", "mi"):
        inf = jnp.float32(jnp.inf)
        lo_f = jnp.min(jnp.where(valid > 0, f, inf))
        hi_f = jnp.max(jnp.where(valid > 0, f, -inf))
        lo_m = jnp.min(jnp.where(valid > 0, m, inf))
        hi_m = jnp.max(jnp.where(valid > 0, m, -inf))
        return -_sharded_mattes_mi(
            mesh, f, m, w_metric, lo_f, hi_f, lo_m, hi_m)
    # NCC / MSE reduce to a handful of sample sums — the gather is the
    # sharded hot spot; the 16k-sample reductions run replicated
    if metric in ("AdvancedNormalizedCorrelation", "ncc"):
        return -metrics.ncc(f, m, mask=w_metric)
    if metric in ("mse", "AdvancedMeanSquares"):
        w = w_metric.astype(f.dtype)
        return jnp.sum(w * (f - m) ** 2) / jnp.maximum(w.sum(), 1.0)
    raise ValueError(f"unknown metric: {metric}")


@functools.partial(
    jax.jit, static_argnames=("mesh", "kind", "metric", "spacing", "lrs",
                              "stride", "jitter", "pt_weight"))
def _optimize_level_sharded(
        mesh, fixed: jnp.ndarray, moving: jnp.ndarray, params: Dict,
        pre_affine: Optional[Dict], kind: str, metric: str, iters,
        spacing: Optional[Tuple[float, ...]],
        lrs: Tuple[Tuple[str, float], ...],
        stride: Tuple[int, int, int] = (1, 1, 1),
        fixed_mask: Optional[jnp.ndarray] = None,
        fix_pts: Optional[jnp.ndarray] = None,
        mov_pts: Optional[jnp.ndarray] = None,
        pt_weight: float = 0.0,
        jitter: bool = True,
        moving_mask: Optional[jnp.ndarray] = None):
    """Mesh-sharded :func:`_optimize_level`: same Adam/LR-decay loop
    (:func:`_adam_level_loop`), with the metric samples sharded over
    every mesh axis (reference hot path ``register.py:423-638`` at
    whole-brain scale; SURVEY §2.10)."""
    n_dev = int(np.prod(mesh.devices.shape))

    def loss_fn(p, offset):
        coords = transform.transform_coords(
            p, kind, fixed.shape, spacing, pre_affine, stride, offset)
        fixed_s = transform.strided_sample(fixed, stride, offset)
        n = fixed_s.size
        n_pad = -(-n // n_dev) * n_dev
        f = _pad_to(fixed_s.reshape(-1), n_pad)
        c = _pad_to(coords.reshape(3, -1), n_pad, axis=1)
        valid = _pad_to(jnp.ones((n,), jnp.float32), n_pad)
        mask = None
        if fixed_mask is not None:
            mask = _pad_to(transform.strided_sample(
                fixed_mask, stride, offset).reshape(-1), n_pad)
        m = _sharded_gather(mesh, moving, c)
        if moving_mask is not None:
            mm = jax.lax.stop_gradient(
                _sharded_gather(mesh, moving_mask, c))
            mm = (mm > 0.5).astype(jnp.float32)
            mask = mm if mask is None else mask * mm
        loss = _sharded_metric_loss(mesh, metric, f, m, valid, mask)
        if fix_pts is not None and mov_pts is not None:
            mapped = transform.transform_points(
                fix_pts, p, kind, fixed.shape, spacing, pre_affine)
            dist = jnp.sqrt(
                jnp.sum((mapped - mov_pts) ** 2, axis=1) + 1e-12)
            loss = loss + jnp.float32(pt_weight) * jnp.mean(dist)
        return loss

    return _adam_level_loop(loss_fn, params, iters, lrs, stride, jitter)


def _parse_grid_schedule(sched, levels_cap: int):
    """Parse an Elastix ``GridSpacingSchedule`` into per-level per-axis
    multipliers of the final grid spacing, coarsest level first.

    Repeated values within the first ``ndim`` entries mean the schedule is
    per-dimension ``(z0, y0, x0, z1, ...)`` (reference
    ``register._config_reg_resolutions`` ``register.py:408``); otherwise
    one value per resolution applies to all axes.
    """
    vals = [float(v) for v in sched]
    ndim = 3
    if len(vals) % ndim == 0 and len(set(vals[:ndim])) != ndim:
        per_level = [tuple(vals[i:i + ndim])
                     for i in range(0, len(vals), ndim)]
    else:
        per_level = [(v,) * ndim for v in vals]
    # cap to what the volume supports by dropping the coarsest entries
    return per_level[-levels_cap:] if len(per_level) > levels_cap \
        else per_level


def _mask_pyramid(mask, levels: int, erode: bool):
    """Mask pyramid matching :func:`_pyramid` geometry, coarsest first.

    With ``erode`` (Elastix ``ErodeMask``), smoothed (non-finest) levels
    erode by the Gaussian pyramid kernel support so samples whose kernel
    footprint leaks past the mask border are excluded (Elastix manual
    section 5.4 — the reference sets this via ``erode_mask``,
    ``atlas_prof.py:29``).
    """
    m = jnp.asarray(mask) > 0
    out = [m]
    for _ in range(levels - 1):
        coarse = out[0][::2, ::2, ::2]
        out.insert(0, coarse)
    if erode:
        eroded = []
        for lvl, m_l in enumerate(out):
            if lvl == levels - 1:   # finest level is unsmoothed
                eroded.append(m_l)
                continue
            inv = jax.lax.reduce_window(
                (~m_l).astype(jnp.float32), jnp.float32(0.0), jax.lax.max,
                (9, 9, 9), (1, 1, 1), [(4, 4)] * 3)
            eroded.append(inv < 0.5)
        out = eroded
    return out


def register_stage(
        fixed: jnp.ndarray, moving: jnp.ndarray, stage: Dict,
        init_params: Optional[Dict] = None,
        pre_affine: Optional[Dict] = None,
        iters_scale: float = 1.0,
        kind: Optional[str] = None,
        fixed_mask=None, moving_mask=None,
        fix_pts=None, mov_pts=None,
        pt_weight: float = 1.0,
        mesh=None) -> Tuple[Dict, float]:
    """Run one registration stage (translation / affine / bspline).

    Args:
        fixed/moving: full-resolution volumes (moving sampled into fixed
            space; shapes may differ).
        stage: ``RegParamMap``-style dict (``map_name``, ``max_iter``,
            ``metric_similarity``, ``num_resolutions``,
            ``grid_space_voxels``, ``grid_spacing_schedule``,
            ``erode_mask``, ``point_based``).
        init_params: warm-start parameters (e.g. affine init from the
            translation stage).
        pre_affine: affine composed after a bspline warp.
        iters_scale: global multiplier on iteration counts.
        fixed_mask: restrict metric samples to this fixed-space mask;
            eroded per level when the stage sets ``erode_mask``.
        fix_pts/mov_pts: ``(N, 3)`` corresponding landmarks (fixed-space
            points must map onto moving-space points) — the
            CorrespondingPointsEuclideanDistanceMetric term, weighted by
            ``pt_weight`` and active when the stage sets ``point_based``.
        mesh: optional ``jax.sharding.Mesh``; when set, every level runs
            the mesh-sharded metric/optimizer (samples over all mesh
            axes, psum'd Parzen joint histogram).

    Returns:
        ``(params, final_loss)``.
    """
    kind = kind or stage.get("map_name")
    if kind is None:
        raise ValueError("stage needs map_name or an explicit kind")
    metric = stage.get("metric_similarity", "AdvancedMattesMutualInformation")
    levels = int(stage.get("num_resolutions", 4) or 4)
    max_iter = max(1, int(stage.get("max_iter", 512) * iters_scale))

    fixed = jnp.asarray(fixed, jnp.float32)
    moving = jnp.asarray(moving, jnp.float32)
    #: "smoothing" = constant-shape Elastix FixedSmoothingImagePyramid:
    #: every level shares one compiled program and runs the stage's FULL
    #: max_iter (Elastix runs MaximumNumberOfIterations per resolution);
    #: "downsample" (default) = recursive half-res pyramid with the
    #: legacy decayed iteration schedule.
    smoothing = str(stage.get("pyramid_mode") or "downsample") \
        == "smoothing"
    # limit pyramid so the coarsest level keeps >= 8 voxels per axis
    max_levels = int(np.floor(np.log2(max(min(fixed.shape) / 8, 1)))) + 1
    if not smoothing:
        levels = max(1, min(levels, max_levels))

    sched_levels = None
    gsv = None
    if kind == "bspline":
        gsv = float(stage.get("grid_space_voxels") or 50)
        sched = stage.get("grid_spacing_schedule")
        if sched:
            sched_levels = _parse_grid_schedule(sched, max_levels)
            levels = max(1, min(len(sched_levels), max_levels))
            sched_levels = sched_levels[-levels:]
        else:
            sched_levels = [(1.0, 1.0, 1.0)] * levels

    if smoothing:
        pyr_f = _smoothing_pyramid(fixed, levels)
        pyr_m = _smoothing_pyramid(moving, levels)
        erode = bool(stage.get("erode_mask"))

        def smooth_masks(mask):
            m = jnp.asarray(mask) > 0
            out = []
            for lvl in range(levels):
                if erode:
                    sigma = (2.0 ** (levels - 1 - lvl)) / 2.0
                    out.append(_erode_mask_by(m, int(4 * sigma + 0.5)))
                else:
                    out.append(m)
            return out

        mask_pyr = (smooth_masks(fixed_mask)
                    if fixed_mask is not None else None)
        mov_mask_pyr = (smooth_masks(moving_mask)
                        if moving_mask is not None else None)
    else:
        pyr_f = _pyramid(fixed, levels)
        pyr_m = _pyramid(moving, levels)
        mask_pyr = None
        if fixed_mask is not None:
            mask_pyr = _mask_pyramid(
                fixed_mask, levels, bool(stage.get("erode_mask")))
        mov_mask_pyr = None
        if moving_mask is not None:
            mov_mask_pyr = _mask_pyramid(
                moving_mask, levels, bool(stage.get("erode_mask")))

    # reference gates the point metric on the stage's point_based key
    # (register.py:583); explicit pts passed by an API caller default on
    use_pts = (fix_pts is not None and mov_pts is not None
               and bool(stage.get("point_based", True)))
    if use_pts:
        fix_pts = jnp.asarray(fix_pts, jnp.float32)
        mov_pts = jnp.asarray(mov_pts, jnp.float32)

    def level_spacing(lvl: int):
        """B-spline control spacing at level ``lvl``, in level voxels."""
        level_factor = 1.0 if smoothing else 2.0 ** (levels - 1 - lvl)
        return tuple(
            gsv * sched_levels[lvl][ax] / level_factor for ax in range(3))

    grid_shape = None
    if kind == "bspline":
        grid_shape = transform.bspline_grid_shape(
            pyr_f[0].shape, level_spacing(0))

    params = init_params
    if params is None:
        params = transform.identity_params(kind, grid_shape)
    else:
        params = {k: jnp.asarray(v) for k, v in params.items()}
        if kind == "bspline" and "grid" not in params:
            params = transform.identity_params(kind, grid_shape)

    # scale warm-start voxel params down to the coarsest level
    coarse_factor = 1.0 if smoothing else 2.0 ** (levels - 1)
    params = _scale_params(params, 1.0 / coarse_factor, kind)
    pre = pre_affine
    if pre is not None:
        pre = {k: jnp.asarray(v) for k, v in pre.items()}

    loss = np.inf
    prev_sp = level_spacing(0) if kind == "bspline" else None
    for lvl, (f_l, m_l) in enumerate(zip(pyr_f, pyr_m)):
        level_factor = 1.0 if smoothing else 2.0 ** (levels - 1 - lvl)
        sp = None
        if kind == "bspline":
            sp = level_spacing(lvl)
            gshape = transform.bspline_grid_shape(f_l.shape, sp)
            if tuple(params["grid"].shape[1:]) != gshape:
                # grid_spacing_schedule: re-lattice control points
                # (prev spacing in THIS level's voxels is 2x its own in
                # the downsampling pyramid; unchanged in smoothing mode)
                old_sp = prev_sp if smoothing or lvl == 0 \
                    else tuple(2.0 * s for s in prev_sp)
                params = {"grid": transform.resample_grid(
                    params["grid"], old_sp, gshape, sp)}
            prev_sp = sp
        pre_l = (_scale_params(pre, 1.0 / level_factor, "affine")
                 if pre is not None else None)
        lrs = tuple(sorted(
            (k, _LEARNING_RATES.get(k, 1.0)) for k in params))
        # Elastix runs the stage's full MaximumNumberOfIterations at
        # every resolution; the downsampling mode keeps the legacy
        # decayed schedule (coarse levels get the full budget)
        iters = max_iter if smoothing else max(1, max_iter // (2 ** lvl))
        max_samples = int(
            stage.get("num_spatial_samples") or _MAX_METRIC_SAMPLES)
        stride = _metric_stride(f_l.shape, max_samples)
        mask_l = mask_pyr[lvl].astype(jnp.float32) \
            if mask_pyr is not None else None
        mov_mask_l = mov_mask_pyr[lvl].astype(jnp.float32) \
            if mov_mask_pyr is not None else None
        pts_args = {}
        if use_pts:
            pts_args = dict(
                fix_pts=fix_pts / level_factor,
                mov_pts=mov_pts / level_factor,
                pt_weight=float(pt_weight))
        if mesh is not None:
            params, loss = _optimize_level_sharded(
                mesh, f_l, m_l, params, pre_l, kind, metric, iters, sp,
                lrs, stride, fixed_mask=mask_l, moving_mask=mov_mask_l,
                **pts_args)
        else:
            params, loss = _optimize_level(
                f_l, m_l, params, pre_l, kind, metric, iters, sp, lrs,
                stride, fixed_mask=mask_l, moving_mask=mov_mask_l,
                **pts_args)
        if not smoothing and lvl < levels - 1:
            params = _scale_params(params, 2.0, kind)
    return params, float(loss)


class RegResult:
    """A completed registration: transform chain + moved images."""

    def __init__(self, stages: List[Tuple[str, Dict]],
                 fixed_shape: Sequence[int],
                 bspline_spacing: Optional[Sequence[float]] = None):
        self.stages = stages
        self.fixed_shape = tuple(fixed_shape)
        self.bspline_spacing = bspline_spacing
        self.metrics: Dict[str, float] = {}

    def _final(self) -> Tuple[str, Dict, Optional[Dict]]:
        """Final transform kind, params, and pre-affine composition."""
        kinds = [k for k, _ in self.stages]
        if "bspline" in kinds:
            bs = dict(self.stages)[("bspline")]
            pre = dict(self.stages).get("affine") or dict(
                self.stages).get("translation")
            return "bspline", bs, pre
        if "affine" in kinds:
            return "affine", dict(self.stages)["affine"], None
        return "translation", dict(self.stages)["translation"], None

    def transform_img(self, img, order: int = 1) -> np.ndarray:
        """Apply the stored transform chain (Transformix equivalent;
        ``order=0`` for label images per ``register.py:616-638``)."""
        kind, params, pre = self._final()
        out = transform.resample(
            jnp.asarray(np.asarray(img, np.float32)), params, kind,
            self.fixed_shape, self.bspline_spacing, pre, order=order)
        out = np.asarray(out)
        return out.astype(img.dtype) if order == 0 else out


def register_duo(
        fixed: np.ndarray, moving: np.ndarray, profile,
        iters_scale: float = 1.0,
        fixed_mask: Optional[np.ndarray] = None,
        moving_mask: Optional[np.ndarray] = None,
        fix_pts: Optional[np.ndarray] = None,
        mov_pts: Optional[np.ndarray] = None,
        checkpoint_dir: Optional[str] = None,
        record_stage_dsc: bool = False,
        mesh=None) -> Tuple[np.ndarray, RegResult]:
    """Register ``moving`` onto ``fixed`` through the profile's stages.

    Reference surface ``register.register_duo`` (``register.py:423``):
    translation -> affine -> bspline, metric and iteration schedule from
    the atlas profile; returns the moved image and the transform for label
    transfer. ``fixed_mask``/``moving_mask`` restrict metric sampling
    (reference ``SetFixedMask``, ``register.py:515``; eroded per level
    when a stage sets ``erode_mask``). ``fix_pts``/``mov_pts`` feed the
    corresponding-points metric on stages with ``point_based`` set
    (reference reads ``fix_pts.txt``/``mov_pts.txt``,
    ``register.py:583-602``). With ``record_stage_dsc`` the result's
    metrics carry ``dsc_stage_<kind>`` — the foreground-overlap DSC
    after each completed stage (one extra full-res resample per stage),
    so per-stage improvement is observable (the reference logs the
    same DSC per registered image, ``register.py:1001-1016``).
    """
    stages_cfg = [
        ("translation", profile["reg_translation"]),
        ("affine", profile["reg_affine"]),
        ("bspline", profile["reg_bspline"]),
    ]
    stages_cfg = [(k, s) for k, s in stages_cfg if s]

    ckpt = None
    if checkpoint_dir:
        from magellanmapper_tpu.utils.checkpoint import (
            RegistrationCheckpoint)
        ckpt = RegistrationCheckpoint(checkpoint_dir)

    done: List[Tuple[str, Dict]] = []
    stage_dsc: Dict[str, float] = {}
    init_affine = None
    pre_affine = None
    bspline_spacing = None
    for kind, stage in stages_cfg:
        masks = dict(fixed_mask=fixed_mask, moving_mask=moving_mask)
        pts = {}
        if stage.get("point_based") and fix_pts is not None \
                and mov_pts is not None:
            pts = dict(fix_pts=fix_pts, mov_pts=mov_pts)
        restored = ckpt.load_stage(kind) if ckpt else None
        if restored is not None:
            params = {k: jnp.asarray(v) for k, v in restored.items()}
            loss = float("nan")   # stage skipped; no fresh metric value
            if kind == "translation":
                init_affine = {"W": jnp.zeros((3, 3)), "t": params["t"]}
            elif kind == "affine":
                pre_affine = params
            else:
                gsv = float(stage.get("grid_space_voxels") or 50)
                sched = stage.get("grid_spacing_schedule")
                mult = _parse_grid_schedule(sched, 99)[-1] if sched \
                    else (1.0, 1.0, 1.0)
                bspline_spacing = tuple(gsv * m for m in mult)
            done.append(
                (kind, {k: np.asarray(v) for k, v in params.items()}))
            _logger.info("stage %s restored from checkpoint", kind)
            continue
        if kind == "translation":
            params, loss = register_stage(
                fixed, moving, stage, iters_scale=iters_scale, kind=kind,
                mesh=mesh, **masks, **pts)
            init_affine = {"W": jnp.zeros((3, 3)), "t": params["t"]}
        elif kind == "affine":
            params, loss = register_stage(
                fixed, moving, stage, init_params=init_affine,
                iters_scale=iters_scale, kind=kind, mesh=mesh,
                **masks, **pts)
            pre_affine = params
        else:
            if pre_affine is None and init_affine is not None:
                pre_affine = init_affine
            params, loss = register_stage(
                fixed, moving, stage, pre_affine=pre_affine,
                iters_scale=iters_scale, kind=kind, mesh=mesh,
                **masks, **pts)
            gsv = float(stage.get("grid_space_voxels") or 50)
            sched = stage.get("grid_spacing_schedule")
            mult = _parse_grid_schedule(sched, 99)[-1] if sched \
                else (1.0, 1.0, 1.0)
            bspline_spacing = tuple(gsv * m for m in mult)
        _logger.info("stage %s done, loss %.5f", kind, loss)
        done.append((kind, {k: np.asarray(v) for k, v in params.items()}))
        if ckpt:
            ckpt.save_stage(kind, done[-1][1])
        if record_stage_dsc:
            partial = RegResult(list(done), fixed.shape, bspline_spacing)
            stage_dsc[kind] = metrics.measure_overlap(
                fixed, partial.transform_img(moving, order=1))

    result = RegResult(done, fixed.shape, bspline_spacing)
    moved = result.transform_img(moving, order=1)
    result.metrics["dsc_fixed_moved"] = metrics.measure_overlap(fixed, moved)
    for kind, dsc in stage_dsc.items():
        result.metrics[f"dsc_stage_{kind}"] = dsc
    return moved, result


@functools.partial(
    jax.jit, static_argnames=("lrs", "stride", "spacing"))
def _optimize_group_level(
        vols: jnp.ndarray, params_stack: Dict, iters,
        lrs: Tuple[Tuple[str, float], ...],
        stride: Tuple[int, int, int] = (1, 1, 1),
        spacing: Optional[Tuple[float, ...]] = None):
    """Joint groupwise level: minimize mean per-voxel variance across the
    group under per-image transforms (the Elastix 4D-groupwise metric
    family, ``register_group`` reference ``register.py:1189``). Affine
    per image; when the parameter stack carries per-image ``grid``
    control lattices, each image additionally warps through its B-spline
    FFD composed with its affine (the reference's groupwise bspline
    stage). The variance metric is evaluated on a ``stride``-subsampled
    grid — the K warp gathers per step are the TPU hot spot."""
    lr_map = dict(lrs)
    opt = optax.adam(1.0)
    shape = vols.shape[1:]
    with_grid = "grid" in params_stack

    def loss_fn(p):
        if with_grid:
            def move_one(vol, w, t, g):
                return transform.resample(
                    vol, {"grid": g}, "bspline", shape, spacing,
                    pre_affine={"W": w, "t": t}, stride=stride)
            moved = jax.vmap(move_one)(
                vols, p["W"], p["t"], p["grid"])
        else:
            def move_one(vol, w, t):
                return transform.resample(
                    vol, {"W": w, "t": t}, "affine", shape, stride=stride)
            moved = jax.vmap(move_one)(vols, p["W"], p["t"])
        var = jnp.var(moved, axis=0)
        # anchor: keep the mean transform near identity
        reg = jnp.mean(p["t"] ** 2) * 1e-4 + jnp.mean(p["W"] ** 2) * 1e-2
        if with_grid:
            reg = reg + jnp.mean(p["grid"] ** 2) * 1e-3
        return jnp.mean(var) + reg

    def step(_, state):
        p, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        updates = {k: v * lr_map.get(k, 1.0) for k, v in updates.items()}
        return optax.apply_updates(p, updates), opt_state

    state = (params_stack, opt.init(params_stack))
    params_stack, _ = jax.lax.fori_loop(0, iters, step, state)
    return params_stack, loss_fn(params_stack)


def register_groupwise(
        imgs: Sequence[np.ndarray], max_iter: int = 256,
        num_resolutions: int = 3,
        bspline_iter: int = 0,
        grid_space_voxels: float = 130.0,
        grid_spacing_schedule: Optional[Sequence[float]] = None,
        mesh=None) -> Tuple[np.ndarray, list]:
    """Joint groupwise registration (4D variance metric).

    All images' parameters optimize together against the group variance
    — the fixed-image-free formulation of the reference's Elastix
    groupwise stage. An affine pass runs first; with ``bspline_iter``,
    per-image B-spline FFD lattices (control spacing
    ``grid_space_voxels``, the reference groupwise profile's coarse 130
    vx default, ``atlas_prof.py:287``) then refine jointly, composed
    with each image's affine. ``grid_spacing_schedule`` (the groupwise
    profile's 12-element coarse-to-fine multipliers,
    ``atlas_prof.py:287``) runs the FFD refinement as a sequence of
    levels — spacing = base x multiplier per level, each level's lattice
    re-sampled onto the next (Elastix ``GridSpacingSchedule``
    semantics) — with the iterations split evenly across levels.
    Returns ``(mean_image, per_image_params)``.

    With ``mesh``, the subject stack (and per-subject parameter
    leaves) shard over the mesh's FIRST axis (dp over subjects — the
    reference joins a 4D stack, ``register.py:1189``): each device
    warps only its subjects, and XLA turns the cross-subject variance
    reduction into ICI collectives via sharding propagation.
    """
    shapes = np.asarray([im.shape for im in imgs])
    target = shapes.min(axis=0)
    vols = jnp.asarray(np.stack([
        np.asarray(im[:target[0], :target[1], :target[2]], np.float32)
        for im in imgs]))
    k = len(imgs)
    shard_k = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard_k = NamedSharding(mesh, P(mesh.axis_names[0]))
        vols = jax.device_put(vols, shard_k)

    levels = max(1, min(num_resolutions, int(np.floor(
        np.log2(max(min(target) / 8, 1)))) + 1))
    pyr = [vols]
    for _ in range(levels - 1):
        sm = jax.vmap(
            lambda v: filters.gaussian_filter(v, 1.0, mode="nearest"))(
            pyr[0])
        pyr.insert(0, sm[:, ::2, ::2, ::2])

    params = {"W": jnp.zeros((k, 3, 3)), "t": jnp.zeros((k, 3))}
    if shard_k is not None:
        params = {n: jax.device_put(v, shard_k)
                  for n, v in params.items()}
    lrs = (("W", 0.01), ("t", 1.0))
    for lvl, v_l in enumerate(pyr):
        iters = max(1, max_iter // (2 ** lvl))
        stride = _metric_stride(v_l.shape[1:])
        params, loss = _optimize_group_level(
            v_l, params, iters, lrs, stride)
        if lvl < levels - 1:
            params = {"W": params["W"], "t": params["t"] * 2.0}

    spacing = None
    if bspline_iter:
        # joint FFD refinement at the finest level, affine-composed;
        # a grid-spacing schedule walks spacing coarse->fine with
        # cross-level lattice re-sampling (per-dim triplets)
        sched = [(1.0, 1.0, 1.0)]
        if grid_spacing_schedule:
            s = [float(v) for v in grid_spacing_schedule]
            sched = ([tuple(s[i:i + 3]) for i in range(0, len(s), 3)]
                     if len(s) % 3 == 0 and len(s) > 3
                     else [(v,) * 3 for v in s])
        lrs_b = (("W", 0.003), ("grid", 0.5), ("t", 0.3))
        stride = _metric_stride(tuple(target))
        params = dict(params)
        level_iters = max(1, int(bspline_iter) // len(sched))
        prev_spacing = None
        for mult in sched:
            spacing = tuple(
                float(grid_space_voxels) * m for m in mult)
            gshape = transform.bspline_grid_shape(tuple(target), spacing)
            if "grid" not in params:
                params["grid"] = jnp.zeros((k, 3) + gshape)
            elif tuple(params["grid"].shape[2:]) != gshape:
                params["grid"] = jax.vmap(
                    lambda g: transform.resample_grid(
                        g, prev_spacing, gshape, spacing))(params["grid"])
            if shard_k is not None:
                params["grid"] = jax.device_put(params["grid"], shard_k)
            params, loss = _optimize_group_level(
                vols, params, level_iters, lrs_b, stride,
                spacing=spacing)
            prev_spacing = spacing
    _logger.info("groupwise registration done, loss %.6f", float(loss))

    if "grid" in params:
        def move_one(vol, w, t, g):
            return transform.resample(
                vol, {"grid": g}, "bspline", tuple(target), spacing,
                pre_affine={"W": w, "t": t})
        moved = np.asarray(jax.vmap(move_one)(
            vols, params["W"], params["t"], params["grid"]))
        per_img = [{"W": np.asarray(params["W"][i]),
                    "t": np.asarray(params["t"][i]),
                    "grid": np.asarray(params["grid"][i]),
                    "spacing": spacing} for i in range(k)]
    else:
        def move_one(vol, w, t):
            return transform.resample(vol, {"W": w, "t": t}, "affine",
                                      tuple(target))
        moved = np.asarray(jax.vmap(move_one)(
            vols, params["W"], params["t"]))
        per_img = [{"W": np.asarray(params["W"][i]),
                    "t": np.asarray(params["t"][i])} for i in range(k)]
    return moved.mean(axis=0), per_img
