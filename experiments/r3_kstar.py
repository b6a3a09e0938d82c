"""Round-3: fully-fused single-pass peak finder (K*) prototype + timing.

One Pallas kernel walks z once: per step it DMAs ONE cube plane (double-
buffered), computes that plane's (s,y,x) 3-neighborhood max on-chip into a
rolling 3-ring, folds the z-window max, runs the peak test, and harvests
candidates — replacing the K1 (5.5 ms XLA reduce_window) + K2 (4 DMAs/step)
pair that currently costs ~15 ms of the 25 ms detection program.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from magellanmapper_tpu.ops import filters, peaks, pallas_kernels  # noqa

SHAPE = (128, 256, 256)
SIGMAS = tuple(np.linspace(2.0, 4.0, 8))
THRESH, CAP = 0.1, 8192
ITERS = 10


def timeit(fn, x, iters=ITERS, reduce_out=True):
    @jax.jit
    def chain(x):
        def body(i, acc):
            r = fn(x + acc * jnp.float32(1e-30))
            if reduce_out:
                r = jnp.sum(r) * jnp.float32(1e-30)
            return acc + r
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(chain(x)))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(chain(x)))
    return (time.perf_counter() - t0) / iters * 1e3, cs


def _max3_plane(p):
    """(S, Y, X) -> 3^3-neighborhood max with constant-0 borders."""
    def ax3(t, ax):
        n = t.shape[ax]
        pad = [(0, 0)] * 3
        pad[ax] = (1, 1)
        padded = jnp.pad(t, pad, constant_values=0.0)
        lo = jax.lax.slice_in_dim(padded, 0, n, axis=ax)
        mid = jax.lax.slice_in_dim(padded, 1, n + 1, axis=ax)
        hi = jax.lax.slice_in_dim(padded, 2, n + 2, axis=ax)
        return jnp.maximum(jnp.maximum(lo, mid), hi)
    return ax3(ax3(ax3(p, 0), 1), 2)


def _kstar_kernel(cube_ref, thresh_ref, vals_ref, lanes_ref,
                  stage, mring, work, dma_sems,
                  rounds: int, pad_x: int, y_chunk: int):
    z = pl.program_id(0)
    nz = pl.num_programs(0)
    s_dim = stage.shape[1]
    y_dim = stage.shape[3]
    x_dim = stage.shape[4]

    def copy(slot, src_z, sem):
        return pltpu.make_async_copy(
            cube_ref.at[:, pl.ds(src_z, 1)],
            stage.at[slot],
            dma_sems.at[sem])

    @pl.when(z == 0)
    def _():
        cp = copy(0, 0, 0)
        cp.start()
        cp.wait()
        m0 = _max3_plane(stage[0, :, 0])
        mring[pl.ds(0, 1)] = m0[None]
        mring[pl.ds(2, 1)] = jnp.zeros_like(m0)[None]   # M(-1)

    @pl.when((z == 0) & (nz > 1))
    def _():
        copy(1, 1, 1).start()

    @pl.when(z < nz - 1)
    def _():
        slot = (z + 1) % 2
        copy(slot, z + 1, slot).wait()
        mnew = _max3_plane(stage[pl.ds(slot, 1)][0, :, 0])
        mring[pl.ds((z + 1) % 3, 1)] = mnew[None]

    @pl.when(z == nz - 1)
    def _():
        mring[pl.ds((z + 1) % 3, 1)] = jnp.zeros(
            (1, s_dim, y_dim, x_dim), jnp.float32)

    # prefetch plane z+2 into the slot cube(z) occupies (dead after the
    # peak test below reads it -- Mosaic orders the copy after the reads)
    cur = stage[pl.ds(z % 2, 1)][0, :, 0]                # (S, Y, X)
    m3 = jnp.maximum(jnp.maximum(mring[0], mring[1]), mring[2])
    is_peak = (cur == m3) & (cur > thresh_ref[0, 0])
    work[:] = jnp.where(is_peak, cur, -jnp.inf)

    @pl.when(z + 2 < nz)
    def _():
        copy(z % 2, z + 2, z % 2).start()

    xp = x_dim + pad_x
    n_tiles_y = y_dim // y_chunk
    vals_ref[...] = jnp.full(vals_ref.shape, -jnp.inf, jnp.float32)
    lanes_ref[...] = jnp.zeros(lanes_ref.shape, jnp.int32)

    def tile_body(t, carry):
        si = t // n_tiles_y
        y0 = (t % n_tiles_y) * y_chunk
        w = work[pl.ds(si, 1), pl.ds(y0, y_chunk), :][0]

        @pl.when(jnp.any(w > -jnp.inf))
        def _():
            wk = w
            if pad_x:
                wk = jnp.pad(
                    wk, ((0, 0), (0, pad_x)), constant_values=-jnp.inf)
            wk = wk.reshape(-1, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, wk.shape, 1)
            for r in range(rounds):
                mx = jnp.max(wk, axis=1)
                a = jnp.min(
                    jnp.where(wk == mx[:, None], lane, jnp.int32(1 << 30)),
                    axis=1)
                vals_ref[0, pl.ds(t, 1), r, :] = mx[None]
                lanes_ref[0, pl.ds(t, 1), r, :] = a[None]
                wk = jnp.where(lane == a[:, None], -jnp.inf, wk)
        return carry

    jax.lax.fori_loop(0, s_dim * n_tiles_y, tile_body, 0)


def kstar_candidates(cube, threshold, rounds=8, interpret=False):
    s, z, y, x = cube.shape
    pad_x = (-x) % 128
    xp = x + pad_x
    thresh = jnp.full((1, 1), threshold, jnp.float32)
    cube = cube.astype(jnp.float32)
    budget = max(1, (1 << 20) // max(1, xp * 4))
    y_chunk = max(d for d in range(1, y + 1) if y % d == 0 and d <= budget)
    n_tiles = s * (y // y_chunk)
    rpt = y_chunk * xp // 128
    vals, lanes = pl.pallas_call(
        functools.partial(_kstar_kernel, rounds=rounds, pad_x=pad_x,
                          y_chunk=y_chunk),
        grid=(z,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tiles, rounds, rpt),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, rounds, rpt),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((z, n_tiles, rounds, rpt), jnp.float32),
            jax.ShapeDtypeStruct((z, n_tiles, rounds, rpt), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s, 1, y, x), jnp.float32),   # cube plane slots
            pltpu.VMEM((3, s, y, x), jnp.float32),      # plane-max ring
            pltpu.VMEM((s, y, x), jnp.float32),         # masked work slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(cube, thresh)
    return vals, lanes


def kstar_find_peaks(cube, threshold, capacity):
    s, z, y, x = cube.shape
    pad_x = (-x) % 128
    xp = x + pad_x
    vals, lanes = kstar_candidates(cube, threshold)
    count = jnp.minimum(
        jnp.sum(jnp.isfinite(vals)), capacity).astype(jnp.int32)
    flat_vals = vals.reshape(-1)
    top_vals, pos = peaks.select_top_sparse(flat_vals, capacity)
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


def main():
    rng = np.random.default_rng(0)
    vol = rng.normal(scale=0.02, size=SHAPE).astype(np.float32)
    coords = np.column_stack([rng.integers(6, s - 6, 600) for s in SHAPE])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, 600)):
        sig = r / np.sqrt(3)
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(
            -(zz**2 + yy**2 + xx**2) / (2 * sig**2))
    vol = jnp.asarray(np.clip(vol, 0, None) / vol.max())
    cube = filters.log_pyramid(vol, SIGMAS)
    cube.block_until_ready()

    # correctness first (cheap shapes would hide layout bugs; use real)
    oc, ov, on = pallas_kernels.find_peaks_fused(cube, THRESH, CAP)
    kc, kv, kn = kstar_find_peaks(cube, THRESH, CAP)
    on_, kn_ = int(on), int(kn)
    print(f"counts: fused={on_} kstar={kn_}", flush=True)
    a = set(map(tuple, np.asarray(oc)[:on_].tolist()))
    b = set(map(tuple, np.asarray(kc)[:kn_].tolist()))
    print(f"coord set equal: {a == b} (sym diff {len(a ^ b)})", flush=True)

    def cur(c):
        co, v, n = pallas_kernels.find_peaks_fused(c, THRESH, CAP)
        return jnp.sum(co) + n
    ms, cs = timeit(cur, cube, reduce_out=False)
    print(f"find_peaks_fused (current): {ms:.3f} ms (compile {cs:.0f}s)",
          flush=True)

    def ks(c):
        co, v, n = kstar_find_peaks(c, THRESH, CAP)
        return jnp.sum(co) + n
    ms, cs = timeit(ks, cube, reduce_out=False)
    print(f"kstar_find_peaks: {ms:.3f} ms (compile {cs:.0f}s)", flush=True)

    def ks_cand(c):
        v, l = kstar_candidates(c, THRESH)
        return jnp.sum(jnp.where(jnp.isfinite(v), 1.0, 0.0)) + l[0, 0, 0, 0]
    ms, cs = timeit(ks_cand, cube, reduce_out=False)
    print(f"kstar candidates only: {ms:.3f} ms (compile {cs:.0f}s)",
          flush=True)

    def sel(c):
        v, l = kstar_candidates(c, THRESH)
        tv, pos = peaks.select_top_sparse(v.reshape(-1), CAP)
        return jnp.sum(tv)
    ms, cs = timeit(sel, cube, reduce_out=False)
    print(f"kstar + select: {ms:.3f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
