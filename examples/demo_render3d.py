#!/usr/bin/env python
"""Demo: TPU shear-warp 3D rendering of a detected nuclei volume.

Synthesizes a nuclei stack, detects blobs, then renders the scene four
ways on the device — emission-absorption volume, arbitrary-angle MIP,
shaded isosurface with depth-occluded blob markers, and an orbiting
rotation GIF (the Mayavi volume/contour3d/points3d workflow,
reference ``magmap/gui/vis_3d.py``, rebuilt on MXU band matmuls).

Run: python examples/demo_render3d.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(out_dir="demo_out"):
    os.makedirs(out_dir, exist_ok=True)
    import jax.numpy as jnp
    from magellanmapper_tpu.cv import detector
    from magellanmapper_tpu.gui import vis_3d
    from magellanmapper_tpu.io import export_stack
    from magellanmapper_tpu.ops import render3d
    from magellanmapper_tpu.settings.roi_prof import ROIProfile

    rng = np.random.default_rng(2)
    shape = (64, 160, 160)
    vol = rng.normal(scale=0.02, size=shape).astype(np.float32)
    centers = np.column_stack(
        [rng.integers(8, s - 8, 120) for s in shape])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(centers, rng.uniform(3, 5.5, 120)):
        sig = r / np.sqrt(3)
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(
            -(zz**2 + yy**2 + xx**2) / (2 * sig**2))
    vol = np.clip(vol, 0, None) / vol.max()

    prof = ROIProfile()
    prof["min_sigma_factor"] = 2.0
    prof["max_sigma_factor"] = 4.0
    prof["num_sigma"] = 6
    blobs = detector.detect_blobs(vol, prof, resolutions=(1.0, 1.0, 1.0))
    print(f"detected {0 if blobs is None else len(blobs)} blobs")

    # interactive-canvas renders (saved frames); each mode re-renders on
    # drag-orbit/scroll-zoom events through the same cached programs
    vis = vis_3d.Vis3D(vol)
    if blobs is not None:
        vis.show_blobs(blobs)
    for mode in ("volume", "mip", "isosurface"):
        canvas = vis_3d.Vis3DCanvas(vis, render_mode=mode,
                                    render_hw=(384, 384))
        canvas.orbit(25.0, -5.0)   # nudge the camera like a user would
        out = canvas.save(os.path.join(out_dir, f"render_{mode}.png"))
        print("wrote", out)

    # colormapped direct call (piecewise-linear transfer function)
    anchors = np.asarray(
        [[0.0, 0.0, 0.2], [0.8, 0.2, 0.1], [1.0, 0.9, 0.4]], np.float32)
    img = np.asarray(render3d.render_volume_sw(
        jnp.asarray(vol), 40.0, 25.0, vmin=0.15, vmax=1.0,
        out_hw=(512, 512), opacity=0.35, color=anchors))
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(os.path.join(out_dir, "render_colormap.png"), img)
    print("wrote", os.path.join(out_dir, "render_colormap.png"))

    out = export_stack.animate_rotation_3d(
        vol, os.path.join(out_dir, "rotation_mip.gif"), n_frames=18,
        mode="mip", out_hw=(256, 256))
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:2])
