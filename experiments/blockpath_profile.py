"""Round-4: decompose the production block-path device time.

Times, on the real chip with production shapes (the bench_block_path
batch): full fused detect @10 sigmas + preproc, preproc alone, its
percentile kernel alone, the unsharp matmuls alone, the LoG pyramid
alone, and detect without preproc. Timing pulls a result per iteration
(block_until_ready is unreliable over the axon tunnel).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timed(fn, reps=3):
    fn()  # warm/compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from magellanmapper_tpu.cv import detector, stack_detect
    from magellanmapper_tpu.ops import filters, pallas_kernels, peaks
    from magellanmapper_tpu.settings.roi_prof import ROIProfile

    shape = (128, 512, 512)
    rng = np.random.default_rng(1)
    prof = ROIProfile()
    res = (1.0, 1.0, 1.0)
    blocks = stack_detect.setup_blocks(prof, shape, res)
    bshape = tuple(np.minimum(blocks.max_pixels + blocks.overlap, shape))
    print("block shape:", bshape, "denoise:",
          tuple(blocks.denoise_max_shape))
    vol = (rng.random(bshape, np.float32) * 800)
    coords = np.column_stack(
        [rng.integers(7, s - 7, 400) for s in bshape])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, 400)):
        sig = r / np.sqrt(3)
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += (
            np.exp(-(zz**2 + yy**2 + xx**2) / (2 * sig**2)) * 40000)
    batch = jnp.asarray(np.stack([vol.astype(np.uint16)] * 6))
    np.asarray(batch[0, 0, 0, :2])

    sf = detector.calc_scaling_factor(res)[2]
    sigmas = tuple(detector.sigma_list(
        prof["min_sigma_factor"] * sf, prof["max_sigma_factor"] * sf,
        prof["num_sigma"]))
    near_max = 790.0
    prep = (
        ("clip_vmin", float(prof["clip_vmin"])),
        ("clip_vmax", float(prof["clip_vmax"])),
        ("max_thresh", float(near_max * prof["max_thresh_factor"])),
        ("clip_min", float(prof["clip_min"])),
        ("clip_max", float(prof["clip_max"])),
        ("tot_var_denoise", float(prof["tot_var_denoise"] or 0.0)),
        ("unsharp_strength", float(prof["unsharp_strength"] or 0.0)),
        ("erosion_threshold", float(prof["erosion_threshold"] or 0.0)),
    )
    dshape = tuple(int(v) for v in blocks.denoise_max_shape)
    args = (sigmas, float(prof["detection_threshold"]),
            float(prof["overlap"]), 8192, dshape, prep)
    nvox = batch.size
    out = {}

    def rate(name, dt):
        out[name] = {"ms": round(dt * 1e3, 2),
                     "mvox_s": round(nvox / dt / 1e6, 1)}

    # 1. full fused path
    f_full = lambda: stack_detect._detect_batch_fused(batch, *args)[1]
    rate("full", timed(f_full))
    # 2. no-preproc path
    f_np = lambda: stack_detect._detect_batch_fused(
        batch, *(args[:5] + (None,)))[1]
    rate("no_preproc", timed(f_np))

    # 3. preproc alone (scan over blocks like the fused path)
    @jax.jit
    def preproc_only(b):
        def body(_, v):
            return None, stack_detect._preproc_one(
                v, dshape, prep, fused_tiles=True)
        _, o = jax.lax.scan(body, None, b)
        return o[:, 0, 0, :2]
    rate("preproc", timed(lambda: preproc_only(batch)))

    # 4. percentile kernel alone
    dz, dy, dx = dshape
    bz, by, bx = bshape
    nz, ny, nx = (-(-bz // dz), -(-by // dy), -(-bx // dx))

    @jax.jit
    def pct_only(b):
        def body(_, v):
            pad = (nz * dz - bz, ny * dy - by, nx * dx - bx)
            padded = stack_detect._pad_symmetric(v.astype(jnp.float32), pad)
            t2 = padded.reshape(nz, dz, ny, dy, nx, dx).transpose(
                0, 2, 4, 1, 3, 5).reshape(nz * ny * nx, dz * dy * dx)
            return None, pallas_kernels.tile_percentiles_pallas(
                t2, 5.0, 99.5)
        _, o = jax.lax.scan(body, None, b)
        return o[:, 0]
    rate("percentile_kernel", timed(lambda: pct_only(batch)))

    # 5. LoG pyramid alone
    @jax.jit
    def log_only(b):
        def body(_, v):
            cube = filters.log_pyramid(v.astype(jnp.float32), sigmas)
            return None, cube[:, 0, 0, :2]
        _, o = jax.lax.scan(body, None, b)
        return o
    rate("log_pyramid", timed(lambda: log_only(batch)))

    # 6. unsharp matmuls alone
    @jax.jit
    def unsharp_only(b):
        def body(_, v):
            o = v.astype(jnp.float32)
            dims = ((dz, nz), (dy, ny), (dx, nx))
            pad = (nz * dz - bz, ny * dy - by, nx * dx - bx)
            o = stack_detect._pad_symmetric(o, pad)
            for ax, (d, n_t) in enumerate(dims):
                band = jnp.asarray(
                    stack_detect._blockdiag_band(d, n_t, 8.0, "nearest"))
                o = jnp.tensordot(
                    o, band, axes=((ax,), (0,)),
                    precision=jax.lax.Precision.HIGH,
                ).transpose(filters._restore_axis_perm(3, ax))
            return None, o[0, 0, :2]
        _, o = jax.lax.scan(body, None, b)
        return o
    rate("unsharp_matmuls", timed(lambda: unsharp_only(batch)))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
