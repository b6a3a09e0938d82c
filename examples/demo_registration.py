"""Demo: atlas registration end to end on synthetic volumes.

Runs the full Elastix-default schedule (translation -> affine ->
B-spline, Mattes-MI, multi-resolution) on a synthetic atlas-scale pair
and reports DSC before/after plus the label-transfer path, mirroring
the reference's ``--register single`` flow.

Usage: PYTHONPATH=. python examples/demo_registration.py [--small]
"""

import os
import sys

# allow running directly: repo root on sys.path without
# clobbering PYTHONPATH (the axon site dir must stay on it)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import sys
import time

import numpy as np


def make_pair(shape):
    import jax.numpy as jnp
    from magellanmapper_tpu.atlas import transform
    zz, yy, xx = np.indices(shape).astype(np.float32)
    c = [s / 2 for s in shape]
    w = [s / 3.2 for s in shape]
    fixed = np.exp(-(((zz - c[0]) / w[0]) ** 2 + ((yy - c[1]) / w[1]) ** 2
                     + ((xx - c[2]) / w[2]) ** 2) * 2)
    fixed += 0.15 * np.sin(zz / 7) * np.sin(yy / 9) + 0.1 * np.sin(xx / 8)
    fixed = np.clip(fixed, 0, None).astype(np.float32)
    moving = np.asarray(transform.resample(
        jnp.asarray(fixed),
        {"t": jnp.asarray([3.0, -5.0, 4.0]),
         "W": jnp.asarray([[1.05, 0.02, 0.0], [0.0, 0.96, 0.03],
                           [0.01, 0.0, 1.04]])},
        "affine", shape))
    # synthetic labels riding on the moving image (for label transfer)
    labels = (moving > 0.5 * moving.max()).astype(np.int32) * 3
    return fixed, moving, labels


def main():
    small = "--small" in sys.argv
    shape = (48, 64, 56) if small else (160, 240, 200)

    from magellanmapper_tpu.atlas import metrics, reg_engine
    from magellanmapper_tpu.settings.atlas_prof import AtlasProfile

    fixed, moving, labels = make_pair(shape)
    prof = AtlasProfile()
    if small:
        prof.add_profiles("smalliter")

    thr = 0.5 * fixed.max()
    dsc_before = metrics.dice(fixed > thr, moving > thr)
    t0 = time.perf_counter()
    moved, result = reg_engine.register_duo(fixed, moving, prof)
    wall = time.perf_counter() - t0
    dsc_after = metrics.dice(fixed > thr, moved > thr)

    # label transfer with nearest-neighbor (Transformix equivalent)
    labels_moved = result.transform_img(labels, order=0)

    print(f"shape {shape}, wall {wall:.1f}s")
    print(f"DSC before {float(dsc_before):.4f} -> after "
          f"{float(dsc_after):.4f}")
    print(f"labels transferred: {int((labels_moved > 0).sum())} fg voxels, "
          f"dtype {labels_moved.dtype}")


if __name__ == "__main__":
    main()
