"""Round-4 experiment: registration gauntlet tuning runs.

Usage: python experiments/reg_gauntlet_run.py [--shape Z Y X]
       [--iters-scale F] [--ctrl-sigma F] [--seed N]

Prints pair statistics (GT displacement magnitudes, Otsu overlap before
registration), runs the TRUE Elastix-default schedule with per-stage DSC
recording, and reports the three gauntlet gates:
  overlap DSC >= 0.95, median label-transfer DSC >= 0.90,
  bspline-stage DSC gain >= 0.05 over the affine stage.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[160, 240, 200])
    ap.add_argument("--iters-scale", type=float, default=1.0)
    ap.add_argument("--ctrl-sigma", type=float, default=26.0)
    ap.add_argument("--ffd-spacing", type=float, default=100.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from magellanmapper_tpu.atlas import gauntlet, reg_engine, metrics
    from magellanmapper_tpu.settings.atlas_prof import (
        AtlasProfile, make_reg_param_map)

    t0 = time.perf_counter()
    pair = gauntlet.build_pair(
        tuple(args.shape), seed=args.seed,
        ffd_ctrl_sigma=args.ctrl_sigma, ffd_spacing=args.ffd_spacing)
    print(f"pair built in {time.perf_counter()-t0:.1f}s; "
          f"disp stats {pair['gt']['disp_stats']}")
    pre_dsc = metrics.measure_overlap(pair["fixed"], pair["moving"])
    print(f"pre-registration overlap DSC {pre_dsc:.4f}")

    prof = AtlasProfile()
    prof["reg_translation"] = make_reg_param_map(
        "translation", 2048, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_affine"] = make_reg_param_map(
        "affine", 1024, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_bspline"] = make_reg_param_map(
        "bspline", 512, grid_space_voxels=50, num_resolutions=4,
        pyramid_mode="smoothing")

    t0 = time.perf_counter()
    moved, result = reg_engine.register_duo(
        pair["fixed"], pair["moving"], prof,
        iters_scale=args.iters_scale, record_stage_dsc=True)
    wall = time.perf_counter() - t0

    labels_pred = result.transform_img(
        pair["labels"].astype(np.float32), order=0).astype(np.int32)
    lt = gauntlet.label_transfer_dsc(labels_pred, pair["labels_fixed_gt"])

    out = {
        "shape": args.shape, "wall_s": round(wall, 1),
        "pre_dsc": round(pre_dsc, 4),
        "dsc": round(result.metrics["dsc_fixed_moved"], 4),
        "stage_dsc": {k.replace("dsc_stage_", ""): round(v, 4)
                      for k, v in result.metrics.items()
                      if k.startswith("dsc_stage_")},
        "label_transfer_median": round(lt["median"], 4),
        "label_transfer_min": round(lt["min"], 4),
        "disp": pair["gt"]["disp_stats"],
    }
    st = out["stage_dsc"]
    out["bspline_gain"] = round(
        st.get("bspline", 0) - st.get("affine", 0), 4)
    out["gates"] = {
        "dsc_ge_0.95": out["dsc"] >= 0.95,
        "label_median_ge_0.90": out["label_transfer_median"] >= 0.90,
        "bspline_gain_ge_0.05": out["bspline_gain"] >= 0.05}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
