#!/usr/bin/env python
"""End-to-end demo: synthesize a volume, detect nuclei, quantify, plot.

Run: python examples/demo_detection.py [out_dir]
"""

import os
import sys

# allow running directly: repo root on sys.path without
# clobbering PYTHONPATH (the axon site dir must stay on it)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import os
import sys

import numpy as np


def main(out_dir="demo_out"):
    os.makedirs(out_dir, exist_ok=True)
    from magellanmapper_tpu.cv import stack_detect, verifier
    from magellanmapper_tpu.gui import roi_review, vis_3d
    from magellanmapper_tpu.io import np_io
    from magellanmapper_tpu.settings.roi_prof import ROIProfile

    # 1. synthetic two-channel nuclei volume
    rng = np.random.default_rng(0)
    shape = (48, 160, 160)
    vol = rng.normal(scale=0.02, size=shape).astype(np.float32)
    centers = np.column_stack(
        [rng.integers(8, s - 8, 300) for s in shape])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(centers, rng.uniform(3, 5.5, 300)):
        sig = r / np.sqrt(3)
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(
            -(zz**2 + yy**2 + xx**2) / (2 * sig**2))
    vol = np.clip(vol, 0, None) / vol.max()
    base = os.path.join(out_dir, "demo.npy")
    np_io.write_npy(base, vol[None], resolutions=[[1.0, 1.0, 1.0]])
    print(f"wrote {base}")

    # 2. whole-image detection
    prof = ROIProfile()
    prof["min_sigma_factor"] = 2.0
    prof["max_sigma_factor"] = 4.0
    prof["num_sigma"] = 8
    prof["denoise_size"] = None
    blobs, timing = stack_detect.detect_blobs_stack(
        vol, prof, (1.0, 1.0, 1.0), preprocess=False)
    print(f"detected {len(blobs)} blobs in "
          f"{timing['Total_stack']:.2f}s")

    # 3. verify against the planted truth
    truth = np.column_stack([centers, np.full(len(centers), 3.0)])
    sens, ppv, msg = verifier.verify_stack(
        blobs.blobs, truth, (3, 3, 3))
    print(f"sensitivity {sens:.3f}, PPV {ppv:.3f}")

    # 4. visual outputs
    roi_review.plot_roi_planes(
        vol[:12], blobs.blobs[blobs.blobs[:, 0] < 12],
        os.path.join(out_dir, "roi_planes.png"), n_cols=4)
    vis_3d.plot_max_intensity_projections(
        vol, os.path.join(out_dir, "mips.png"), blobs.blobs)
    print(f"figures in {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:2])
