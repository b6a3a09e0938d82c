"""Round-3 microbench: decompose the detection program + LoG layout variants.

Times each stage of the headline detection (pyramid / plane-max / harvest /
prune) and alternate einsum layouts for the pyramid, on the real TPU.
Chained-iteration timing (fori_loop + one scalar pull) amortizes the ~33 ms
tunnel RTT. Prints one line per measurement, flushed immediately.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from magellanmapper_tpu.ops import filters, peaks, pallas_kernels  # noqa: E402
from magellanmapper_tpu.cv import detector  # noqa: E402

SHAPE = (128, 256, 256)
SIGMAS = tuple(np.linspace(2.0, 4.0, 8))
THRESH, OVERLAP, CAP = 0.1, 0.5, 8192
ITERS = 10


def report(name, ms):
    print(f"{name}: {ms:.3f} ms", flush=True)


def timeit(fn, x, iters=ITERS, reduce_out=True):
    """Wall time per iteration of fn chained in one jitted fori_loop."""

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
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(chain(x)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, compile_s


def make_vol():
    rng = np.random.default_rng(0)
    vol = rng.normal(scale=0.02, size=SHAPE).astype(np.float32)
    coords = np.column_stack([rng.integers(6, s - 6, 600) for s in SHAPE])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, 600)):
        sig = r / np.sqrt(3)
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(
            -(zz**2 + yy**2 + xx**2) / (2 * sig**2))
    return jnp.asarray(np.clip(vol, 0, None) / vol.max())


PREC = jax.lax.Precision.HIGH


def bands(order, axis, dtype=jnp.float32):
    n = SHAPE[axis]
    mats = [
        filters._band_matrix(
            np.asarray(filters.gaussian_kernel1d(s, order), np.float64)
            .tobytes(),
            len(filters.gaussian_kernel1d(s, order)), n, "reflect", 0.0)
        for s in SIGMAS]
    return jnp.asarray(np.stack(mats), dtype=dtype)


B0X, B2X = bands(0, 2), bands(2, 2)
B0Y, B2Y = bands(0, 1), bands(2, 1)
B0Z, B2Z = bands(0, 0), bands(2, 0)
SCALE = jnp.asarray(SIGMAS, jnp.float32) ** 2


def ein(eq, *args):
    return jnp.einsum(eq, *args, precision=PREC)


def pyramid_p0(vol):
    return filters.log_pyramid(vol, SIGMAS)


def pyramid_p1_cycle(vol):
    """Always contract the minor axis; outputs cycle the layout."""
    aY = ein("zyx,sxu->szuy", vol, B0X)      # (s, z, x', y)
    bY = ein("zyx,sxu->szuy", vol, B2X)
    u0 = ein("szxy,syu->sxuz", aY, B0Y)      # (s, x', y', z)
    u2 = ein("szxy,syu->sxuz", aY, B2Y)
    i3 = ein("szxy,syu->sxuz", bY, B0Y)
    t1 = ein("sxyz,szu->suyx", u0, B2Z)      # (s, z', y', x')
    t2 = ein("sxyz,szu->suyx", u2, B0Z)
    t3 = ein("sxyz,szu->suyx", i3, B0Z)
    return -(t1 + t2 + t3) * SCALE[:, None, None, None]


BXX = jnp.concatenate([B0X, B2X])            # (2S, x, u)
BYY = jnp.concatenate([B0Y, B2Y, B0Y])       # (3S, y, u)
BZZ = jnp.concatenate([B2Z, B0Z, B0Z])       # (3S, z, u)


def pyramid_p2_merged(vol):
    """Merged band stacks: 3 big einsums + gather/sum (P1 layout)."""
    s = len(SIGMAS)
    ab = ein("zyx,pxu->pzuy", vol, BXX)      # (2S, z, x', y)
    lhs2 = jnp.concatenate([ab[:s], ab[:s], ab[s:]])   # (3S, z, x', y)
    u = ein("pzxy,pyu->pxuz", lhs2, BYY)     # (3S, x', y', z)
    t = ein("pxyz,pzu->puyx", u, BZZ)        # (3S, z', y', x')
    out = t[:s] + t[s:2*s] + t[2*s:]
    return -out * SCALE[:, None, None, None]


def pyramid_p3_natural(vol):
    """Natural dot output orders (batch, lhs-rest, rhs-rest)."""
    a = ein("zyx,sxu->zysu", vol, B0X)       # (z, y, s, x')
    b = ein("zyx,sxu->zysu", vol, B2X)
    u0 = ein("zysx,syu->szxu", a, B0Y)       # batch s first
    u2 = ein("zysx,syu->szxu", a, B2Y)
    i3 = ein("zysx,syu->szxu", b, B0Y)
    t1 = ein("szxy,szu->suxy", u0, B2Z)
    t2 = ein("szxy,szu->suxy", u2, B0Z)
    t3 = ein("szxy,szu->suxy", i3, B0Z)
    out = -(t1 + t2 + t3) * SCALE[:, None, None, None]
    return jnp.swapaxes(out, 2, 3)           # (s, z', x, y) -> (s,z,y,x)


def main():
    vol = make_vol()
    vol.block_until_ready()

    # full detection reference
    def full(x):
        raw, valid = detector.blob_log(x, SIGMAS, THRESH, OVERLAP, CAP)
        return jnp.sum(raw) + jnp.sum(valid)
    ms, cs = timeit(full, vol, reduce_out=False)
    report(f"full blob_log (compile {cs:.0f}s)", ms)
    mvox = np.prod(SHAPE) / 1e6 / (ms / 1e3)
    print(f"  -> {mvox:.1f} Mvox/s", flush=True)

    # pyramid variants
    for name, fn in [("p0 current", pyramid_p0),
                     ("p1 cycle", pyramid_p1_cycle),
                     ("p2 merged", pyramid_p2_merged),
                     ("p3 natural", pyramid_p3_natural)]:
        try:
            ms, cs = timeit(fn, vol)
            report(f"pyramid {name} (compile {cs:.0f}s)", ms)
        except Exception as e:
            print(f"pyramid {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # numeric check of variants vs p0
    ref = np.asarray(pyramid_p0(vol))
    for name, fn in [("p1", pyramid_p1_cycle), ("p2", pyramid_p2_merged),
                     ("p3", pyramid_p3_natural)]:
        try:
            err = float(np.max(np.abs(np.asarray(fn(vol)) - ref)))
            print(f"  {name} max|diff| vs p0: {err:.2e}", flush=True)
        except Exception as e:
            print(f"  {name} check FAILED: {e}", flush=True)

    # stage decomposition on the p0 cube
    cube = pyramid_p0(vol)
    cube.block_until_ready()

    def k1_v0(c):
        return pallas_kernels._plane_max(c)

    def k1_v1(c):
        m = jax.lax.reduce_window(
            c, jnp.float32(0.0), jax.lax.max,
            (1, 1, 3, 3), (1, 1, 1, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1)])
        lo = jnp.pad(m[:-1], ((1, 0), (0, 0), (0, 0), (0, 0)))
        hi = jnp.pad(m[1:], ((0, 1), (0, 0), (0, 0), (0, 0)))
        return jnp.maximum(jnp.maximum(lo, m), hi)

    def k1_v2(c):
        m = jax.lax.reduce_window(
            c, jnp.float32(0.0), jax.lax.max,
            (1, 1, 1, 3), (1, 1, 1, 1),
            [(0, 0), (0, 0), (0, 0), (1, 1)])
        m = jax.lax.reduce_window(
            m, jnp.float32(0.0), jax.lax.max,
            (1, 1, 3, 1), (1, 1, 1, 1),
            [(0, 0), (0, 0), (1, 1), (0, 0)])
        lo = jnp.pad(m[:-1], ((1, 0), (0, 0), (0, 0), (0, 0)))
        hi = jnp.pad(m[1:], ((0, 1), (0, 0), (0, 0), (0, 0)))
        return jnp.maximum(jnp.maximum(lo, m), hi)

    for name, fn in [("k1 v0 rw(3,1,3,3)", k1_v0),
                     ("k1 v1 rw(1,1,3,3)+zshift... actually s-shift", k1_v1),
                     ("k1 v2 sep rw x,y + s-shift", k1_v2)]:
        try:
            ms, cs = timeit(fn, cube)
            report(f"{name} (compile {cs:.0f}s)", ms)
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)
    for name, fn in [("k1 v1", k1_v1), ("k1 v2", k1_v2)]:
        err = float(jnp.max(jnp.abs(fn(cube) - k1_v0(cube))))
        print(f"  {name} max|diff| vs v0: {err:.2e}", flush=True)

    # fused find_peaks and prune on the cube
    def fp(c):
        coords, vals, count = pallas_kernels.find_peaks_fused(
            c, THRESH, CAP)
        return jnp.sum(coords) + count

    ms, cs = timeit(fp, cube, reduce_out=False)
    report(f"find_peaks_fused total (compile {cs:.0f}s)", ms)

    coords, vals, count = pallas_kernels.find_peaks_fused(cube, THRESH, CAP)
    sig = jnp.asarray(SIGMAS, jnp.float32)[coords[:, 0]]
    cf = coords[:, 1:].astype(jnp.float32)
    valid = jnp.arange(CAP) < count

    def prune(c):
        v = peaks.prune_overlapping_blobs_auto(
            cf + jnp.sum(c) * jnp.float32(1e-30), sig, valid, OVERLAP)
        return jnp.sum(v)

    ms, cs = timeit(prune, cube, reduce_out=False)
    report(f"prune_overlap (compile {cs:.0f}s)", ms)


if __name__ == "__main__":
    main()
