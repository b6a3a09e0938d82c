"""Round-4: gather ray-cast vs MXU shear-warp frame times on the TPU.

Measured (axon v5e, tunnel RTT ~33 ms included, 512^2 frame over a
(128,256,256) f32 volume):
  gather render_volume:      ~9.9 s warm (scan of per-step gathers)
  one fused map_coordinates: ~7.7 s (67M pts ~= 115 ns/pt)
  6 chained shear einsums:   ~32 ms TOTAL incl. RTT
  render_volume_sw:          ~0.33-0.53 s warm
  render_isosurface_sw:      ~0.8 s warm
Conclusion: TPU gathers are serial; band-matmul resampling is ~100x
faster per sample. See ops/render3d.py module docstring.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    from magellanmapper_tpu.ops import render3d

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((128, 256, 256)).astype(np.float32))
    np.asarray(vol[0, 0, :2])

    def timed(label, fn, reps=3):
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0] if isinstance(out, tuple) else out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best * 1e3:.1f} ms")

    timed("sw volume 512^2", lambda: render3d.render_volume_sw(
        vol, 30.0, 20.0, vmin=0.6, vmax=1.0, out_hw=(512, 512)))
    timed("sw mip 512^2", lambda: render3d.render_volume_sw(
        vol, 30.0, 20.0, vmin=0.6, vmax=1.0, out_hw=(512, 512),
        mode="mip"))
    timed("sw isosurface 512^2", lambda: render3d.render_isosurface_sw(
        vol, 0.95, 30.0, 20.0, out_hw=(512, 512)))
    # the gather reference is ~8-10 s/frame; keep reps=1 and comment in
    # by hand when re-validating — it dominates any timing session
    # timed("gather volume 512^2", lambda: render3d.render_volume(
    #     vol, 30.0, 20.0, vmin=0.6, vmax=1.0, out_hw=(512, 512),
    #     n_steps=256), reps=1)


if __name__ == "__main__":
    main()
