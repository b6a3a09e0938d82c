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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tile edge for the (i, j) blob-pair grid
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
# fused peak finding: two cooperating kernels
#   K1: per z-plane neighborhood max (scale/y/x 3-max), plane-local
#   K2: rolling peak test across z + in-VMEM candidate harvest


def _slab_max3(slab):
    """Max over the 3^3 neighborhood within a (S, Y, X) slab, constant-0
    boundaries on every axis (scale included)."""
    out = slab
    for ax in range(3):
        n = out.shape[ax]
        pad = [(0, 0)] * 3
        pad[ax] = (1, 1)
        padded = jnp.pad(out, pad, constant_values=0.0)
        lo = jax.lax.slice_in_dim(padded, 0, n, axis=ax)
        mid = jax.lax.slice_in_dim(padded, 1, n + 1, axis=ax)
        hi = jax.lax.slice_in_dim(padded, 2, n + 2, axis=ax)
        out = jnp.maximum(jnp.maximum(lo, mid), hi)
    return out


#: VMEM stack budget per striped tile (bytes); keeps Mosaic's scoped
#: allocation well under the 16 MB limit even with several live temps
_STRIPE_BYTES = 1 << 20


def _plane_max(cube: jax.Array, interpret: bool = False) -> jax.Array:
    """Per-plane (S, Y, X) neighborhood max for every z (K1).

    One XLA ``reduce_window`` with a (3, 1, 3, 3) window — TPU's windowed
    reduce lowers to a fused streaming pass with no VMEM lane constraints
    (a whole-slab Pallas formulation stacked several (S, Y, X)
    temporaries and blew the 16 MB scoped-VMEM limit at 10 sigmas).
    The 0 init value clamps outputs to >= 0, indistinguishable where it
    matters: K2's peak test only compares above a positive threshold.
    """
    del interpret
    cube = cube.astype(jnp.float32)
    return jax.lax.reduce_window(
        cube, jnp.float32(0.0), jax.lax.max,
        (3, 1, 3, 3), (1, 1, 1, 1),
        [(1, 1), (0, 0), (1, 1), (1, 1)])


def _peak_harvest_kernel(
        cube_ref, m_ref, thresh_ref, vals_ref, lanes_ref,
        r_buf, m_buf, m_acc, dma_sems, rounds: int, pad_x: int,
        y_chunk: int):
    """K2 step z: peak test for plane z via DMA'd M planes + harvest.

    M(z-1), M(z), M(z+1) stream through one ping-pong buffer into a
    running max; the harvest runs per (scale, y-stripe) tile to bound
    VMEM stack temporaries at production slab sizes.
    """
    z = pl.program_id(0)
    nz = pl.num_programs(0)

    def cube_copy(dst, src_z, slot):
        return pltpu.make_async_copy(
            cube_ref.at[:, pl.ds(src_z, 1)], dst.at[:], dma_sems.at[slot])

    def m_copy(dst, src_z, slot):
        return pltpu.make_async_copy(
            m_ref.at[:, pl.ds(src_z, 1)], dst.at[:], dma_sems.at[slot])

    # issue every plane fetch up front so the copies overlap in the DMA
    # engines; the M(z-1)/M(z+1) planes share m_buf, so the max fold
    # happens between their waits
    cp_cube = cube_copy(r_buf, z, 0)
    cp_cube.start()
    cp_mz = m_copy(m_acc, z, 1)
    cp_mz.start()

    @pl.when(z > 0)
    def _():
        m_copy(m_buf, z - 1, 2).start()   # M(z-1)

    cp_cube.wait()
    cp_mz.wait()

    @pl.when(z > 0)
    def _():
        m_copy(m_buf, z - 1, 2).wait()
        m_acc[:] = jnp.maximum(m_acc[:], m_buf[:])

    @pl.when(z < nz - 1)
    def _():
        cp = m_copy(m_buf, z + 1, 3)      # M(z+1)
        cp.start()
        cp.wait()
        m_acc[:] = jnp.maximum(m_acc[:], m_buf[:])

    # harvest per (scale, y-stripe) tile inside a fori_loop — Mosaic's
    # stack allocator reserves each unrolled iteration's temporaries
    # separately, so a Python tile loop multiplies VMEM stack usage with
    # the tile count; a fori body is allocated once. Tiles address the
    # output's leading (unrestricted-dynamic) dim; the lane dim is the
    # wide rows_per_tile axis, so nothing pads 8 -> 128 lanes.
    s_dim, _, y_dim, x_dim = r_buf.shape
    xp = x_dim + pad_x
    n_tiles_y = y_dim // y_chunk

    # pre-fill the step's outputs so peak-free tiles can skip harvesting
    vals_ref[...] = jnp.full(vals_ref.shape, -jnp.inf, jnp.float32)
    lanes_ref[...] = jnp.zeros(lanes_ref.shape, jnp.int32)

    def tile_body(t, carry):
        si = t // n_tiles_y
        y0 = (t % n_tiles_y) * y_chunk
        cur = r_buf[pl.ds(si, 1), 0, pl.ds(y0, y_chunk), :][0]
        m = m_acc[pl.ds(si, 1), 0, pl.ds(y0, y_chunk), :][0]
        is_peak = (cur == m) & (cur > thresh_ref[0, 0])

        # peaks are sparse (hundreds over millions of voxels): only tiles
        # that contain one pay for the iterated-extraction rounds
        @pl.when(jnp.any(is_peak))
        def _():
            work = jnp.where(is_peak, cur, -jnp.inf)
            if pad_x:
                work = jnp.pad(
                    work, ((0, 0), (0, pad_x)), constant_values=-jnp.inf)
            work = work.reshape(-1, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
            for r in range(rounds):
                mx = jnp.max(work, axis=1)
                # first-max lane as min-lane-of-maxima (argmax semantics;
                # Mosaic cannot legalize vector argmax inside a fori body)
                a = jnp.min(
                    jnp.where(work == mx[:, None], lane,
                              jnp.int32(1 << 30)),
                    axis=1)
                vals_ref[0, pl.ds(t, 1), r, :] = mx[None]
                lanes_ref[0, pl.ds(t, 1), r, :] = a[None]
                work = jnp.where(lane == a[:, None], -jnp.inf, work)
        return carry

    jax.lax.fori_loop(0, s_dim * n_tiles_y, tile_body, 0)


def peak_candidates_pallas(
        cube: jax.Array, threshold: float, rounds: int = 8,
        interpret: bool = False):
    """Fused local-maxima + candidate harvest over a (S, Z, Y, X) cube.

    Two passes instead of XLA's ~12: K1 writes per-plane neighborhood
    maxima; K2 walks z once, DMA-ing the response plane plus three M
    planes into single-buffered VMEM, and harvests up to ``rounds``
    peak candidates per 128-lane group entirely on-chip.

    Returns ``(vals, lanes)``: per-z candidate values
    ``(Z, n_tiles, rounds, rows_per_tile)`` and their lane offsets, where
    tile ``t`` covers flattened slab rows
    ``[t * rows_per_tile, (t+1) * rows_per_tile)``. Every peak appears
    exactly once among the candidates (up to ``rounds`` per lane group),
    so the peak count equals the number of finite candidate values.
    """
    s, z, y, x = cube.shape
    pad_x = (-x) % 128
    xp = x + pad_x
    thresh = jnp.full((1, 1), threshold, jnp.float32)
    cube = cube.astype(jnp.float32)
    m_cube = _plane_max(cube, interpret=interpret)

    # largest divisor of y whose (y_chunk, xp) fp32 tile fits the stripe
    # budget (the fori harvest needs uniform tiles)
    budget = max(1, _STRIPE_BYTES // max(1, xp * 4))
    y_chunk = max(d for d in range(1, y + 1)
                  if y % d == 0 and d <= budget)
    n_tiles = s * (y // y_chunk)
    rows_per_tile = y_chunk * xp // 128
    vals, lanes = pl.pallas_call(
        functools.partial(_peak_harvest_kernel, rounds=rounds, pad_x=pad_x,
                          y_chunk=y_chunk),
        grid=(z,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # cube in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # M cube in HBM
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tiles, rounds, rows_per_tile),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, rounds, rows_per_tile),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (z, n_tiles, rounds, rows_per_tile), jnp.float32),
            jax.ShapeDtypeStruct(
                (z, n_tiles, rounds, rows_per_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((s, 1, y, x), jnp.float32),  # response plane
            pltpu.VMEM((s, 1, y, x), jnp.float32),  # M ping-pong
            pltpu.VMEM((s, 1, y, x), jnp.float32),  # M running max
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(cube, m_cube, thresh)
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
    flat_vals = vals.reshape(-1)
    from magellanmapper_tpu.ops import peaks as _peaks
    top_vals, pos = _peaks.select_top_sparse(flat_vals, capacity)
    # decode (z, tile, round, tile-row) -> (s, z, y, x)
    _, n_tiles, rounds, rpt = vals.shape
    per_z = n_tiles * rounds * rpt
    zz = (pos // per_z).astype(jnp.int32)
    rem_z = pos % per_z
    tile = rem_z // (rounds * rpt)
    row = (tile * rpt + rem_z % rpt).astype(jnp.int32)
    lane = lanes.reshape(-1)[pos]
    per_s = y * (xp // 128)
    ss = row // per_s
    rem = row % per_s
    yy = rem // (xp // 128)
    xx = (rem % (xp // 128)) * 128 + lane
    coords = jnp.stack([ss, zz, yy, xx], axis=-1)
    valid = (jnp.arange(capacity) < count) & jnp.isfinite(top_vals)
    coords = jnp.where(valid[:, None], coords, 0)
    return coords, top_vals, count
