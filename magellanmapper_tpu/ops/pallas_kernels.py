"""Pallas TPU kernels for the detection hot path.

``prune_overlap_pallas``: the O(K^2) sphere-overlap blob pruning
(``ops.peaks.prune_overlapping_blobs``) as a tiled Pallas kernel — each
(TI, TJ) tile holds both coordinate panels in VMEM, forms squared
distances via an MXU matmul (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b), applies
the lens-volume overlap formula on the VPU, and reduces the "loses to
any j" verdict per row. Avoids materializing the K x K fp32 matrices in
HBM that the XLA version writes (~270 MB at K=8192).

Falls back to the jnp implementation off-TPU (Pallas interpret mode is
used in CPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tile edge for the (i, j) blob-pair grid. Measured on v5e at
#: K=8192: 1024 did not help the sparse case and cost the dense
#: (near-full-buffer) case ~60% (bigger per-tile d2 temps); 512 stays
_TILE = 512


def _prune_kernel(coords_i_ref, r_i_ref, valid_i_ref,
                  coords_j_ref, r_j_ref, valid_j_ref,
                  idx_i_ref, idx_j_ref,
                  thresh_ref, removed_ref):
    """One (TI, TJ) tile: does row blob i lose to any column blob j?"""
    j_tile = pl.program_id(1)

    @pl.when(j_tile == 0)
    def _():
        removed_ref[:] = jnp.zeros_like(removed_ref)

    # buffers are top_k-padded: most tiles beyond the valid count are
    # all-invalid — skip their MXU/VPU work entirely
    has_pairs = (jnp.max(valid_i_ref[:]) > 0.0) & (
        jnp.max(valid_j_ref[:]) > 0.0)

    @pl.when(has_pairs)
    def _():
        ci = coords_i_ref[:]                    # (TI, 3)
        cj = coords_j_ref[:]                    # (TJ, 3)
        ri = r_i_ref[:]                         # (TI, 1)
        rj = r_j_ref[:]                         # (TJ, 1)
        # squared distances via MXU: |a|^2 + |b|^2 - 2 a.b
        d2 = (jnp.sum(ci * ci, axis=1, keepdims=True)
              + jnp.sum(cj * cj, axis=1, keepdims=True).T
              - 2.0 * jax.lax.dot_general(
                  ci, cj.T, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))
        d = jnp.sqrt(jnp.maximum(d2, 0.0))

        r1 = ri                                  # (TI, 1) broadcast rows
        r2 = rj.T                                # (1, TJ) broadcast cols
        d_safe = jnp.maximum(d, 1e-12)
        lens = (math.pi * (r1 + r2 - d_safe) ** 2
                * (d_safe * d_safe + 2.0 * d_safe * (r1 + r2)
                   - 3.0 * (r1 - r2) ** 2) / (12.0 * d_safe))
        rmin = jnp.minimum(r1 + 0.0 * r2, r2 + 0.0 * r1)
        vol_min = (4.0 / 3.0 * math.pi) * rmin * rmin * rmin
        frac = lens / jnp.maximum(vol_min, 1e-12)
        frac = jnp.where(d <= jnp.abs(r1 - r2), 1.0, frac)
        frac = jnp.where(d >= r1 + r2, 0.0, frac)

        ii = idx_i_ref[:]                        # (TI, 1) global row ids
        jj = idx_j_ref[:]                        # (TJ, 1)
        pair_ok = ((valid_i_ref[:] > 0) & (valid_j_ref[:].T > 0)
                   & (ii != jj.T))
        overlapping = pair_ok & (frac > thresh_ref[0, 0])
        loses = overlapping & ((r2 > r1) | ((r2 == r1) & (ii < jj.T)))
        tile_removed = jnp.any(loses, axis=1, keepdims=True)

        removed_ref[:] = jnp.maximum(
            removed_ref[:], tile_removed.astype(jnp.float32))


def prune_overlap_pallas(
        coords: jax.Array, sigmas: jax.Array, valid: jax.Array,
        overlap_thresh: float, ndim: int = 3,
        interpret: bool = False) -> jax.Array:
    """Pallas-tiled sphere-overlap pruning; same contract as
    ``peaks.prune_overlapping_blobs``."""
    k = coords.shape[0]
    tile = min(_TILE, k)
    if k % tile:
        pad = tile - k % tile
        coords = jnp.pad(coords, ((0, pad), (0, 0)))
        sigmas = jnp.pad(sigmas, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    kp = coords.shape[0]
    n_tiles = kp // tile

    pos = coords.astype(jnp.float32)
    r = (sigmas.astype(jnp.float32)
         * jnp.sqrt(jnp.float32(ndim)))[:, None]
    v = valid.astype(jnp.float32)[:, None]
    idx = jnp.arange(kp, dtype=jnp.float32)[:, None]
    thresh = jnp.full((1, 1), overlap_thresh, jnp.float32)

    grid = (n_tiles, n_tiles)
    row_spec = lambda w: pl.BlockSpec(
        (tile, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    col_spec = lambda w: pl.BlockSpec(
        (tile, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    removed = pl.pallas_call(
        _prune_kernel,
        grid=grid,
        in_specs=[
            row_spec(3), row_spec(1), row_spec(1),
            col_spec(3), col_spec(1), col_spec(1),
            row_spec(1), col_spec(1),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, 1), jnp.float32),
        interpret=interpret,
    )(pos, r, v, pos, r, v, idx, idx, thresh)

    removed_mask = removed[:k, 0] > 0.5
    return valid[:k].astype(bool) & ~removed_mask


# ---------------------------------------------------------------------------
# candidate extraction: in-VMEM iterated argmax over lane groups


#: rows per extraction tile and rounds (peaks per 128-lane group)
_XT_ROWS = 512
_XT_ROUNDS = 8


def _extract_kernel(vals_ref, out_vals_ref, out_idx_ref):
    """Per tile: top-_XT_ROUNDS values+lanes per row, found by iterated
    masked argmax entirely in VMEM (the XLA formulation re-reads the full
    array from HBM every round)."""
    work = vals_ref[:]                              # (ROWS, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
    for r in range(_XT_ROUNDS):
        m = jnp.max(work, axis=1)
        a = jnp.argmax(work, axis=1).astype(jnp.int32)
        out_vals_ref[:, r] = m
        out_idx_ref[:, r] = a
        work = jnp.where(lane == a[:, None], -jnp.inf, work)


def extract_candidates_pallas(
        masked_vals: jax.Array, interpret: bool = False):
    """Harvest up to ``_XT_ROUNDS`` peak candidates per 128-lane group.

    Args:
        masked_vals: ``(G, 128)`` float32 rows (-inf at non-peaks).

    Returns:
        ``(vals, lanes)``: each ``(G, _XT_ROUNDS)`` — per-group candidate
        values (descending per group) and lane offsets.
    """
    g = masked_vals.shape[0]
    rows = min(_XT_ROWS, g)
    if g % rows:
        pad = rows - g % rows
        masked_vals = jnp.pad(
            masked_vals, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    gp = masked_vals.shape[0]
    vals, lanes = pl.pallas_call(
        _extract_kernel,
        grid=(gp // rows,),
        in_specs=[pl.BlockSpec(
            (rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rows, _XT_ROUNDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _XT_ROUNDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gp, _XT_ROUNDS), jnp.float32),
            jax.ShapeDtypeStruct((gp, _XT_ROUNDS), jnp.int32),
        ),
        interpret=interpret,
    )(masked_vals)
    return vals[:g], lanes[:g]


# ---------------------------------------------------------------------------
# per-tile exact percentiles: integer bisection on float-bit keys


#: tiles per percentile-kernel grid step
_PCT_CHUNK = 64


def _tile_pct_kernel(keys_ref, ranks_ref, out_ref, *, n_iter: int):
    """Exact k-th order statistics per tile row via integer bisection.

    ``keys_ref``: (C, Vp) int32 — nonnegative-float bit patterns (bit
    order == value order for x >= 0) or raw integer values, padded with
    INT32_MAX. For each of the two 1-indexed ranks in ``ranks_ref`` the
    bisection finds the smallest key with ``count(<= key) >= k`` (the
    k-th smallest, exactly), then one extra pass finds its successor
    order statistic for linear interpolation. Out: (C, 6) int32
    ``[v_k0, succ0, cnt0, v_k1, succ1, cnt1]``.

    The loop runs a STATIC ``n_iter`` count (17 covers any uint16 value
    span, 31 any nonnegative float-bit span): a dynamic
    "all brackets closed" exit needs a cross-chunk max reduction + a
    scalar-unit decision EVERY iteration, which measured ~3 ms/iteration
    of stall while the fori body itself is bandwidth-free (a 1-vs-16
    iteration probe timed identically). Once a row's bracket reaches
    width <= 1 the remaining iterations are algebraic no-ops (mid == lo
    and the invariant cnt(lo) < k keeps the state fixed), so extra
    iterations cost only their vector ops, not correctness.
    """
    keys = keys_ref[:]
    k1 = ranks_ref[0, 0]
    k2 = ranks_ref[0, 1]
    # start the bisection from each tile's actual [min-1, max] key range
    # (padding keys are INT32_MAX and real keys are nonnegative, so the
    # masked max sees only data)
    lo0 = jnp.min(keys, axis=1) - 1
    hi0 = jnp.max(
        jnp.where(keys < 0x7FFFFFFF, keys, -1), axis=1)
    # both percentiles' bisections share each iteration's pass over the
    # keys (the count reductions dominate the kernel; one fused read)

    def body(_, state):
        lo1, hi1, lo2, hi2 = state
        mid1 = lo1 + (hi1 - lo1) // 2
        mid2 = lo2 + (hi2 - lo2) // 2
        cnt1 = jnp.sum((keys <= mid1[:, None]).astype(jnp.int32), axis=1)
        cnt2 = jnp.sum((keys <= mid2[:, None]).astype(jnp.int32), axis=1)
        t1 = cnt1 >= k1
        t2 = cnt2 >= k2
        return (jnp.where(t1, lo1, mid1), jnp.where(t1, mid1, hi1),
                jnp.where(t2, lo2, mid2), jnp.where(t2, mid2, hi2))

    _, hi1, _, hi2 = jax.lax.fori_loop(
        0, n_iter, body, (lo0, hi0, lo0, hi0))
    for j, (k, hi) in enumerate(((k1, hi1), (k2, hi2))):
        succ = jnp.min(
            jnp.where(keys > hi[:, None], keys, jnp.int32(0x7FFFFFFF)),
            axis=1)
        # (k+1)-th order stat = v_k itself when duplicates span rank k+1
        cnt_k = jnp.sum((keys <= hi[:, None]).astype(jnp.int32), axis=1)
        out_ref[:, 3 * j] = hi
        out_ref[:, 3 * j + 1] = jnp.where(cnt_k >= k + 1, hi, succ)
        out_ref[:, 3 * j + 2] = cnt_k


def tile_percentiles_pallas(
        tiles: jax.Array, q_lo: float, q_hi: float,
        interpret: bool = False):
    """``np.percentile(tile, (q_lo, q_hi))`` for every row of a
    ``(T, V)`` nonnegative-float tile matrix — exact (linear
    interpolation between exact order statistics), one VMEM-resident
    pass per tile chunk instead of a per-tile bitonic sort (the sort
    dominated tiled preprocessing: 311 -> 192 Mvox/s on the round-2
    block path).

    Values must be >= 0 (nonnegative IEEE bit patterns order like the
    floats; image intensities here come from unsigned importers and the
    >= 0-clamped spectral unmix). Returns ``(T, 2)`` float32.

    Unsigned-integer tiles (the uint16 microscopy production case) skip
    the float-bit mapping and bisect in VALUE domain: a STATIC 17
    iterations covers any 2^16 value span vs 31 for the float-bit key
    span (static counts matter more than fewer dynamic ones — see the
    kernel docstring). Results are identical (integer order statistics
    convert to f32 exactly).
    """
    t, v = tiles.shape
    interpret = interpret or jax.default_backend() == "cpu"
    pad_v = (-v) % 128
    integral = tiles.dtype in (jnp.uint8, jnp.uint16)
    if integral:
        keys = tiles.astype(jnp.int32)
    else:
        keys = jax.lax.bitcast_convert_type(
            tiles.astype(jnp.float32), jnp.int32)
    if pad_v:
        keys = jnp.pad(keys, ((0, 0), (0, pad_v)),
                       constant_values=0x7FFFFFFF)
    pad_t = (-t) % _PCT_CHUNK
    if pad_t:
        keys = jnp.pad(keys, ((0, pad_t), (0, 0)),
                       constant_values=0x7FFFFFFF)
    tp = keys.shape[0]

    out_keys = []
    ranks = []
    for q in (q_lo, q_hi):
        r = q / 100.0 * (v - 1)
        ranks.append((int(np.floor(r)) + 1, r - np.floor(r)))
    rank_arr = jnp.asarray(
        [[ranks[0][0], ranks[1][0]]], jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _tile_pct_kernel, n_iter=17 if integral else 31),
        grid=(tp // _PCT_CHUNK,),
        in_specs=[
            pl.BlockSpec((_PCT_CHUNK, v + pad_v), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_PCT_CHUNK, 6), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 6), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(keys, rank_arr)[:t]

    vals = (out.astype(jnp.float32) if integral
            else jax.lax.bitcast_convert_type(out, jnp.float32))
    res = []
    for j, (_, frac) in enumerate(ranks):
        v0 = vals[:, 3 * j]
        v1 = vals[:, 3 * j + 1]
        res.append(jnp.where(
            jnp.float32(frac) > 0,
            v0 + jnp.float32(frac) * (v1 - v0), v0))
    return jnp.stack(res, axis=1)


# ---------------------------------------------------------------------------
# fused peak finding: ONE kernel walks z once — per step it DMAs a single
# cube plane (double-buffered), computes that plane's (s, y, x)
# 3-neighborhood max on-chip into a rolling 3-ring, folds the z-window
# max, runs the peak test, and harvests candidates with a vectorized
# early-exit rounds loop. Round-2's two-kernel pipeline (XLA
# reduce_window plane-max + a 4-DMA/step harvest kernel with a per-tile
# fori) measured 16.5 ms on the (8,128,256,256) detection cube; the
# reduce_window was ~10x off VPU ideal and the 1024 dynamic-sliced tile
# iterations dominated the rest.


def _kernel_max3_planes(p):
    """(S, ZC, Y, X) -> per-plane 3^3 (s, y, x) neighborhood max,
    constant-0 borders (the skimage ``maximum_filter(mode='constant')``
    border inside ``peak_local_max``; outputs clamp to >= 0,
    indistinguishable above the positive detection threshold). The ZC
    plane axis is batch-like (no mixing).

    Each axis pass is two ``pltpu.roll`` rotations with iota-masked
    borders — the pad+slice formulation materialized lane-unaligned
    (n+2)-wide temporaries, which Mosaic pads ~1.5x and shuffles.
    """
    def ax3(t, ax):
        n = t.shape[ax]
        idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, ax)
        lo = jnp.where(idx == 0, 0.0, pltpu.roll(t, 1, ax))
        hi = jnp.where(idx == n - 1, 0.0, pltpu.roll(t, n - 1, ax))
        return jnp.maximum(jnp.maximum(lo, t), hi)
    return ax3(ax3(ax3(p, 0), 2), 3)


def _peak_harvest_kernel(
        cube_ref, thresh_ref, vals_ref, lanes_ref,
        stage, mring, dma_sems, rounds: int, pad_x: int):
    """Step t: stream cube plane pair t+1 in, roll the pair-max ring,
    peak-test pair t's two planes, and harvest candidates.

    DMA schedule (one two-plane copy per step, double-buffered): pair
    t+1's copy was started at step t-1; after the peak test reads pair
    t its slot is reused to prefetch pair t+2, so every copy overlaps a
    full step of compute.

    Harvest: whole-slab vectorized rounds under ``lax.while_loop`` — no
    per-tile dynamic slicing (round 2's 8-tile fori cost ~8 ms/cube) and
    no unrolled-round VMEM stack blowup (the carry is allocated once);
    the loop exits as soon as a round harvests nothing, so the common
    few-peaks-per-plane case pays for ~2 rounds, not ``rounds``.
    """
    t = pl.program_id(0)                 # plane-PAIR index
    nt = pl.num_programs(0)
    s_dim, y_dim, x_dim = stage.shape[1], stage.shape[3], stage.shape[4]

    def copy(slot, pair, sem):
        return pltpu.make_async_copy(
            cube_ref.at[:, pl.ds(2 * pair, 2)], stage.at[slot],
            dma_sems.at[sem])

    @pl.when(t == 0)
    def _():
        cp = copy(0, 0, 0)
        cp.start()
        cp.wait()
        m0 = _kernel_max3_planes(stage[0])
        mring[pl.ds(0, 1)] = m0[None]
        mring[pl.ds(2, 1)] = jnp.zeros_like(m0)[None]   # M(pair -1)

    @pl.when((t == 0) & (nt > 1))
    def _():
        copy(1, 1, 1).start()

    @pl.when(t < nt - 1)
    def _():
        slot = (t + 1) % 2
        copy(slot, t + 1, slot).wait()
        mnew = _kernel_max3_planes(stage[pl.ds(slot, 1)][0])
        mring[pl.ds((t + 1) % 3, 1)] = mnew[None]

    @pl.when(t == nt - 1)
    def _():
        mring[pl.ds((t + 1) % 3, 1)] = jnp.zeros(
            (1, s_dim, 2, y_dim, x_dim), jnp.float32)   # M(Z) border

    cur = stage[pl.ds(t % 2, 1)][0]                  # (S, 2, Y, X)
    # plane 2t sees M planes {2t-1, 2t, 2t+1}; plane 2t+1 sees
    # {2t, 2t+1, 2t+2} — the pair ring slots (t+2)%3 == (t-1)%3 hold
    # the previous pair, (t+1)%3 the next
    m_prev = mring[pl.ds((t + 2) % 3, 1)][0]
    m_cur = mring[pl.ds(t % 3, 1)][0]
    m_next = mring[pl.ds((t + 1) % 3, 1)][0]
    m_mid = jnp.maximum(m_cur[:, 0], m_cur[:, 1])
    m3 = jnp.stack(
        [jnp.maximum(m_prev[:, 1], m_mid),
         jnp.maximum(m_mid, m_next[:, 0])], axis=1)  # (S, 2, Y, X)
    is_peak = (cur == m3) & (cur > thresh_ref[0, 0])
    work = jnp.where(is_peak, cur, -jnp.inf)
    if pad_x:
        work = jnp.pad(
            work, ((0, 0), (0, 0), (0, 0), (0, pad_x)),
            constant_values=-jnp.inf)
    work = work.reshape(-1, 128)                      # (rows, lanes)

    # pair t is consumed; reuse its slot to prefetch pair t+2
    @pl.when(t + 2 < nt)
    def _():
        copy(t % 2, t + 2, t % 2).start()

    n_rows = work.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    round_iota = jax.lax.broadcasted_iota(
        jnp.int32, (rounds, n_rows), 0)
    vals0 = jnp.full((rounds, n_rows), -jnp.inf, jnp.float32)
    lanes0 = jnp.zeros((rounds, n_rows), jnp.int32)

    def cond(state):
        r, _, _, _, found = state
        return (r < rounds) & found

    def body(state):
        r, wk, va, la, _ = state
        mx = jnp.max(wk, axis=1)
        # first-max lane as min-lane-of-maxima (argmax semantics;
        # vector argmax does not legalize inside Mosaic loop bodies)
        a = jnp.min(
            jnp.where(wk == mx[:, None], lane, jnp.int32(1 << 30)),
            axis=1)
        sel = round_iota == r
        va = jnp.where(sel, mx[None, :], va)
        la = jnp.where(sel, a[None, :], la)
        wk = jnp.where(lane == a[:, None], -jnp.inf, wk)
        return r + 1, wk, va, la, jnp.any(mx > -jnp.inf)

    _, _, va, la, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), work, vals0, lanes0,
                     jnp.any(is_peak)))
    vals_ref[0] = va
    lanes_ref[0] = la


def peak_candidates_pallas(
        cube: jax.Array, threshold: float, rounds: int = 8,
        interpret: bool = False):
    """Fused local-maxima + candidate harvest over a (S, Z, Y, X) cube.

    ONE streaming pass over plane PAIRS: per step the kernel DMAs two
    response planes (double-buffered), computes their per-plane
    (s, y, x) neighborhood maxima into a rolling 3-pair ring
    (constant-0 z borders), folds the 3^4 peak test for both planes,
    and harvests up to ``rounds`` peak candidates per 128-lane group
    with a vectorized early-exit rounds loop. Two planes per grid step
    halve the per-step fixed costs (grid sequencing, ring reads,
    harvest setup); odd-Z cubes get one zero plane appended, which is
    exactly the z-border value.

    Returns ``(vals, lanes)``: per-pair candidate values
    ``(ceil(Z/2), rounds, rows)`` and their lane offsets, where row
    ``r`` covers flattened positions ``[r*128, (r+1)*128)`` of the
    x-padded ``(S, 2, Y, Xp)`` pair slab. Every peak appears exactly
    once among the candidates (up to ``rounds`` per lane group), so the
    peak count equals the number of finite candidate values.
    """
    s, z, y, x = cube.shape
    pad_x = (-x) % 128
    xp = x + pad_x
    thresh = jnp.full((1, 1), threshold, jnp.float32)
    cube = cube.astype(jnp.float32)
    if z % 2:
        cube = jnp.pad(cube, ((0, 0), (0, 1), (0, 0), (0, 0)))
    nt = cube.shape[1] // 2
    n_rows = s * 2 * y * xp // 128
    vals, lanes = pl.pallas_call(
        functools.partial(
            _peak_harvest_kernel, rounds=rounds, pad_x=pad_x),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # cube in HBM
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rounds, n_rows),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rounds, n_rows),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, rounds, n_rows), jnp.float32),
            jax.ShapeDtypeStruct((nt, rounds, n_rows), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s, 2, y, x), jnp.float32),  # cube pair slots
            pltpu.VMEM((3, s, 2, y, x), jnp.float32),  # pair-max ring
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(cube, thresh)
    return vals, lanes


def find_peaks_fused(
        cube: jax.Array, threshold: float, capacity: int,
        interpret: bool = False):
    """Drop-in for ``ops.peaks.find_peaks`` using the fused kernel."""
    s, z, y, x = cube.shape
    pad_x = (-x) % 128
    xp = x + pad_x
    vals, lanes = peak_candidates_pallas(
        cube, threshold, interpret=interpret)
    count = jnp.minimum(
        jnp.sum(jnp.isfinite(vals)), capacity).astype(jnp.int32)
    from magellanmapper_tpu.ops import peaks as _peaks
    # rounds > 1 only fire for 128-lane groups holding several peaks;
    # when rounds 2+ are empty (the overwhelmingly common case) the
    # selection's isfinite/cumsum/searchsorted passes run over a 4x
    # smaller lead slice, with positions remapped to the full index
    # space; a lax.cond falls back to the full array otherwise
    nt_, rounds_, n_rows_ = vals.shape
    lead_rounds = 2
    if rounds_ <= lead_rounds:
        top_vals, pos = _peaks.select_top_sparse(
            vals.reshape(-1), capacity)
    else:
        tail_empty = ~jnp.any(jnp.isfinite(vals[:, lead_rounds:]))

        def lead(_):
            tv, p = _peaks.select_top_sparse(
                vals[:, :lead_rounds].reshape(-1), capacity)
            pair_ = p // (lead_rounds * n_rows_)
            rem_ = p % (lead_rounds * n_rows_)
            return tv, pair_ * (rounds_ * n_rows_) + rem_

        def full(_):
            return _peaks.select_top_sparse(vals.reshape(-1), capacity)

        top_vals, pos = jax.lax.cond(tail_empty, lead, full, None)
    # decode (pair, round, row) -> (s, z, y, x); row covers the
    # flattened (S, 2, Y, Xp/128) pair slab
    _, rounds, n_rows = vals.shape
    per_pair = rounds * n_rows
    pair = (pos // per_pair).astype(jnp.int32)
    row = (pos % n_rows).astype(jnp.int32)
    lane = lanes.reshape(-1)[pos]
    xg = xp // 128
    per_s = 2 * y * xg
    ss = row // per_s
    rem = row % per_s
    plane = rem // (y * xg)
    rem2 = rem % (y * xg)
    yy = rem2 // xg
    xx = (rem2 % xg) * 128 + lane
    zz = 2 * pair + plane
    coords = jnp.stack([ss, zz, yy, xx], axis=-1)
    valid = (jnp.arange(capacity) < count) & jnp.isfinite(top_vals)
    coords = jnp.where(valid[:, None], coords, 0)
    return coords, top_vals, count
