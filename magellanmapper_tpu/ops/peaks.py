"""Fixed-capacity peak finding and blob pruning (JAX, static shapes).

TPU-first handling of the dynamic-count problem in blob detection
(SURVEY.md hard part (d)): peaks are extracted into fixed-capacity buffers
via ``top_k`` with a validity count, so the whole detection pipeline stays
jittable with static shapes; pruning operates on padded buffers with masks.

Semantics mirror ``skimage.feature.peak_local_max`` (footprint = full 3^nd
cube, ``exclude_border=False``) and ``skimage.feature.blob._prune_blobs``
(sphere-overlap fraction), the internals of the reference's detection hot
kernel (``magmap/cv/detector.py:931``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def max_filter_full(cube: jax.Array, clamp_zero: bool = True) -> jax.Array:
    """Max filter with a full 3^nd footprint, constant-0 border.

    Implemented as one ``lax.reduce_window`` (XLA's windowed-reduce has a
    dedicated TPU lowering; one fused pass over HBM instead of one
    materialized 3-tap pass per axis — measured 12.4 -> 8.4 ms on the
    (8,128,256,256) detection cube on v5e). With ``clamp_zero`` the
    window reduction starts from the 0 init value, so every output is
    additionally clamped to >= 0; with the constant-0 border that is
    indistinguishable wherever it matters: peak tests compare
    ``cube == max_filter`` only above a positive threshold, and the
    distance transforms fed to the watershed are nonnegative. Pass
    ``clamp_zero=False`` for exact skimage ``maximum_filter``
    (mode='constant', cval=0) semantics on inputs that go negative —
    one explicit 0-pad, then an unclamped (-inf init) window reduce.
    """
    ndim = cube.ndim
    if clamp_zero:
        return jax.lax.reduce_window(
            cube, jnp.asarray(0.0, cube.dtype), jax.lax.max,
            (3,) * ndim, (1,) * ndim, [(1, 1)] * ndim)
    padded = jnp.pad(cube, [(1, 1)] * ndim, constant_values=0)
    return jax.lax.reduce_window(
        padded, jnp.asarray(-jnp.inf, cube.dtype), jax.lax.max,
        (3,) * ndim, (1,) * ndim, [(0, 0)] * ndim)


def fused_peaks_fit(shape: Tuple[int, ...]) -> bool:
    """Whether the fused Pallas peak finder fits a ``(S, Z, Y, X)`` cube.

    Mosaic slices VMEM along the 128-lane axis (x must be aligned). The
    streaming kernel holds five ``(S, 2, Y, X)`` fp32 plane-PAIR slabs
    in VMEM scratch (two cube-pair slots + the 3-pair max ring) plus
    the in-kernel max3/harvest temporaries; it requests a 100 MB
    scoped-VMEM limit (v5e has 128 MB), so cap ~20 single-plane slabs
    at 90 MB.
    """
    s, _, y, x = shape
    return x % 128 == 0 and 20 * s * y * x * 4 <= (90 << 20)


def find_peaks(
        cube: jax.Array, threshold: float, capacity: int,
        fused: Optional[bool] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Local maxima of ``cube`` above ``threshold``, capped at ``capacity``.

    Args:
        fused: use the fused Pallas path (per-plane max + streaming
            harvest with parallel DMA starts; exact match, measured
            20.9 -> 16.6 ms on the (8,128,256,256) detection cube on
            v5e). Defaults to True for 4D cubes on TPU. Callers inside
            ``vmap`` must pass False — the Pallas manual-DMA kernel has
            no batching rule (the batched blocks there are small enough
            that the XLA formulation wins anyway).

    Returns:
        ``coords``: ``(capacity, cube.ndim)`` int32 indices, sorted by peak
        value descending (the ``peak_local_max`` return order); rows past
        the true count are zero-filled.
        ``values``: ``(capacity,)`` peak values (-inf past the count).
        ``count``: scalar int32 number of valid peaks (clipped to capacity).
    """
    # the fused kernel's plane max assumes a positive threshold (its 0
    # init clamps neighborhood maxima to >= 0); thresholds <= 0 take the
    # XLA path with unclamped maxima for exact skimage semantics.
    # A TRACED threshold (e.g. vmapped multi-threshold grid search)
    # must take the unclamped XLA path too — it is exact for any sign.
    concrete = isinstance(threshold, (int, float, np.floating, np.integer))
    positive_thresh = concrete and float(threshold) > 0
    if fused is None:
        fused = (cube.ndim == 4 and fused_peaks_fit(cube.shape)
                 and positive_thresh
                 and jax.default_backend() not in ("cpu",))
    if fused:
        if not positive_thresh:
            raise ValueError(
                "the fused peak finder requires threshold > 0 (its "
                "plane-max kernel clamps neighborhood maxima to >= 0)")
        from magellanmapper_tpu.ops import pallas_kernels
        return pallas_kernels.find_peaks_fused(cube, threshold, capacity)
    is_peak = (cube == max_filter_full(cube, clamp_zero=positive_thresh)) \
        & (cube > threshold)
    count = jnp.minimum(jnp.sum(is_peak), capacity).astype(jnp.int32)
    flat_vals = jnp.where(is_peak, cube, -jnp.inf).reshape(-1)
    top_vals, top_idx = _sparse_top_k(flat_vals, capacity)
    valid = (jnp.arange(capacity) < count) & jnp.isfinite(top_vals)
    coords = jnp.stack(
        jnp.unravel_index(top_idx, cube.shape), axis=-1).astype(jnp.int32)
    coords = jnp.where(valid[:, None], coords, 0)
    return coords, top_vals, count


#: lane-group width and extraction rounds for the sparse top-k
_GROUP = 128
_ROUNDS = 8


def select_top_sparse(vals: jax.Array, capacity: int):
    """Exact top-``capacity`` of a mostly ``-inf`` 1D array.

    ``lax.top_k`` over the multi-million-entry candidate arrays costs
    ~10 ms on v5e while holding only a few hundred finite values. When
    the finite count fits ``capacity`` (the overwhelmingly common case),
    selection = "take every finite entry": a cumsum + per-slot binary
    search compacts them in index order, and a tiny ``top_k`` restores
    the value-descending order — bitwise the same result (top_k breaks
    value ties by lower index; the compaction preserves index order).
    A dense ``lax.cond`` branch falls back to full ``top_k`` when the
    finite count exceeds capacity.

    Returns ``(top_vals, positions)`` like ``lax.top_k``.
    """
    n = vals.shape[0]
    if n <= 4 * capacity:
        return jax.lax.top_k(vals, capacity)
    finite = jnp.isfinite(vals)
    count = jnp.sum(finite.astype(jnp.int32))
    csum = jnp.cumsum(finite.astype(jnp.int32))

    def sparse(k_slots):
        """Compact the first ``k_slots`` finite entries; result padded
        to ``capacity``. The ``searchsorted`` binary search costs one
        ~22-step random-gather chain over the multi-MB cumsum PER
        TARGET (~5 ms at 8192 targets on the detection cube), so the
        target count tiers on the actual finite count."""

        def fn(_):
            targets = jnp.arange(1, k_slots + 1, dtype=jnp.int32)
            pos = jnp.searchsorted(csum, targets).astype(jnp.int32)
            pos = jnp.minimum(pos, n - 1)
            v = jnp.where(targets <= count, vals[pos], -jnp.inf)
            tv, order = jax.lax.top_k(v, k_slots)
            pos = pos[order]
            if k_slots < capacity:
                tv = jnp.concatenate([tv, jnp.full(
                    (capacity - k_slots,), -jnp.inf, tv.dtype)])
                pos = jnp.concatenate([pos, jnp.zeros(
                    (capacity - k_slots,), jnp.int32)])
            return tv, pos
        return fn

    def dense(_):
        tv, pos = jax.lax.top_k(vals, capacity)
        return tv, pos

    small = max(256, capacity // 8)
    if small >= capacity:
        return jax.lax.cond(
            count <= capacity, sparse(capacity), dense, operand=None)
    return jax.lax.cond(
        count <= small, sparse(small),
        lambda _: jax.lax.cond(
            count <= capacity, sparse(capacity), dense, operand=None),
        operand=None)


def _sparse_top_k(flat_vals: jax.Array, capacity: int):
    """Top-k tuned for sparse peak fields (most entries -inf).

    ``lax.top_k`` over the full cube costs ~25x the rest of the pipeline
    on TPU. Instead: ``_ROUNDS`` iterated max/argmax passes per
    ``_GROUP``-lane row harvest up to ``_ROUNDS`` peaks per contiguous
    group of ``_GROUP`` flat positions (local maxima are >=2 apart along
    x, so 8 rounds cover groups with up to 8 peaks — beyond-capacity
    groups only arise in degenerate plateau fields, and those rows
    surface as non-finite and are dropped from ``valid``), then one cheap
    ``top_k`` over the 1/16-sized candidate set restores global
    descending order.
    """
    n = flat_vals.shape[0]
    if n % _GROUP:
        flat_vals = jnp.pad(
            flat_vals, (0, _GROUP - n % _GROUP),
            constant_values=-jnp.inf)
    if flat_vals.shape[0] // _GROUP < capacity:
        vals, idx = jax.lax.top_k(flat_vals[:n], capacity)
        return vals, idx
    rows = flat_vals.reshape(-1, _GROUP)
    g = rows.shape[0]
    base = jnp.arange(g, dtype=jnp.int32) * _GROUP
    if jax.default_backend() != "cpu":
        # Pallas: all rounds in VMEM, one pass over the cube
        from magellanmapper_tpu.ops import pallas_kernels
        cand_v, cand_l = pallas_kernels.extract_candidates_pallas(rows)
        vals = cand_v.T.reshape(-1)
        idxs = (base[None, :] + cand_l.T).reshape(-1)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, _GROUP), 1)
        cand_vals = []
        cand_idx = []
        work = rows
        for _ in range(_ROUNDS):
            m = jnp.max(work, axis=1)
            a = jnp.argmax(work, axis=1).astype(jnp.int32)
            cand_vals.append(m)
            cand_idx.append(base + a)
            work = jnp.where(lane == a[:, None], -jnp.inf, work)
        vals = jnp.concatenate(cand_vals)
        idxs = jnp.concatenate(cand_idx)
    top_vals, pos = select_top_sparse(vals, capacity)
    return top_vals, idxs[pos]


def _sphere_overlap_fraction(
        d: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Volume of two-sphere intersection / volume of the smaller sphere.

    skimage ``_blob_overlap`` 3D semantics: 0 beyond contact, 1 when one
    sphere contains the other, else the lens-volume fraction.
    """
    rmin = jnp.minimum(r1, r2)
    # lens volume: pi (r1+r2-d)^2 (d^2 + 2d(r1+r2) - 3(r1-r2)^2) / (12 d)
    d_safe = jnp.maximum(d, 1e-12)
    lens = (math.pi * (r1 + r2 - d_safe) ** 2
            * (d_safe ** 2 + 2.0 * d_safe * (r1 + r2)
               - 3.0 * (r1 - r2) ** 2) / (12.0 * d_safe))
    vol_min = 4.0 / 3.0 * math.pi * rmin ** 3
    frac = lens / jnp.maximum(vol_min, 1e-12)
    frac = jnp.where(d <= jnp.abs(r1 - r2), 1.0, frac)
    frac = jnp.where(d >= r1 + r2, 0.0, frac)
    return frac


def prune_overlapping_blobs_auto(
        coords: jax.Array, sigmas: jax.Array, valid: jax.Array,
        overlap_thresh: float, ndim: int = 3) -> jax.Array:
    """Dispatch pruning to the Pallas kernel on TPU backends (tiled VMEM
    pass, no K x K HBM matrices) and the jnp path elsewhere.

    Count-tiered: peak buffers are normally top_k-compacted (every valid
    row sits in a leading window), so when NO valid row sits beyond the
    small window the kernel prunes only that window under ``lax.cond`` —
    at the production capacity (8192) the full grid pays ~3 ms of
    skipped-tile overhead for a few hundred real blobs. The tier gate
    checks row positions, not the count: callers such as the sharded
    detector (``parallel/halo.py``) mask pad-zone peaks out of ``valid``
    *before* pruning, which can leave few-but-deep valid rows that a
    count gate would mis-route past the small tier unpruned.
    """
    if jax.default_backend() == "cpu":
        return prune_overlapping_blobs(
            coords, sigmas, valid, overlap_thresh, ndim)
    from magellanmapper_tpu.ops import pallas_kernels

    return _prune_tiered(
        pallas_kernels.prune_overlap_pallas, coords, sigmas, valid,
        overlap_thresh, ndim)


def _prune_tiered(kernel_fn, coords, sigmas, valid, overlap_thresh,
                  ndim, small: int = 1024):
    """Count-tiered dispatch around ``kernel_fn`` (see
    :func:`prune_overlapping_blobs_auto`; split out so the tier gate is
    testable on CPU with the jnp kernel)."""
    k = coords.shape[0]
    if k <= 2 * small:
        return kernel_fn(coords, sigmas, valid, overlap_thresh, ndim)

    def prune_small(_):
        head = kernel_fn(
            coords[:small], sigmas[:small], valid[:small],
            overlap_thresh, ndim)
        return jnp.concatenate([head, valid[small:]])

    def prune_full(_):
        return kernel_fn(coords, sigmas, valid, overlap_thresh, ndim)

    all_in_window = ~jnp.any(valid[small:])
    return jax.lax.cond(all_in_window, prune_small, prune_full, None)


def prune_overlapping_blobs(
        coords: jax.Array, sigmas: jax.Array, valid: jax.Array,
        overlap_thresh: float, ndim: int = 3) -> jax.Array:
    """Drop the smaller of each overlapping blob pair (padded O(K^2) pass).

    A blob is removed when any other valid blob overlaps it beyond
    ``overlap_thresh`` and has a larger radius (ties: the earlier row —
    higher peak intensity — is removed, matching skimage's pair rule).

    Args:
        coords: ``(K, ndim)`` blob center coordinates (float or int).
        sigmas: ``(K,)`` blob sigma per row.
        valid: ``(K,)`` bool row-validity mask.
        overlap_thresh: overlap fraction above which to prune.
        ndim: spatial dimensionality (radius = sigma * sqrt(ndim)).

    Returns:
        Updated ``(K,)`` bool validity mask.
    """
    pos = coords.astype(jnp.float32)
    r = sigmas.astype(jnp.float32) * jnp.sqrt(jnp.float32(ndim))
    diff = pos[:, None, :] - pos[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    frac = _sphere_overlap_fraction(d, r[:, None], r[None, :])
    k = coords.shape[0]
    eye = jnp.eye(k, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & ~eye
    overlapping = pair_valid & (frac > overlap_thresh)
    i_idx = jnp.arange(k)
    loses = overlapping & (
        (r[None, :] > r[:, None])
        | ((r[None, :] == r[:, None]) & (i_idx[:, None] < i_idx[None, :])))
    removed = jnp.any(loses, axis=1)
    return valid & ~removed


def prune_close_blobs(
        coords: jax.Array, valid: jax.Array, tol: jax.Array) -> jax.Array:
    """Remove blobs within per-axis ``tol`` of an earlier kept blob.

    Device analog of the reference's tolerance pruning
    (``detector.py:1000-1085`` ``_find_close_blobs``/``remove_close_blobs``):
    row ``i`` is dropped when some earlier valid row ``j < i`` is within
    ``tol`` on every axis. Single-pass approximation of the sequential
    accept-loop; rows are assumed sorted in the acceptance order.
    """
    diff = jnp.abs(coords[:, None, :3].astype(jnp.float32)
                   - coords[None, :, :3].astype(jnp.float32))
    close = jnp.all(diff <= jnp.asarray(tol, jnp.float32), axis=-1)
    k = coords.shape[0]
    i_idx = jnp.arange(k)
    earlier = i_idx[None, :] < i_idx[:, None]
    dominated = close & earlier & valid[None, :]
    return valid & ~jnp.any(dominated, axis=1)
