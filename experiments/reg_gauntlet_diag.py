"""Gauntlet diagnostics: representation bound + recovered-warp error.

Caches the built pair to /tmp so iteration skips the ~5-min build.

1. Representation bound: evaluate the GT FFD on the recovery lattice
   (grid 50) and measure the label transfer that IDEAL fit achieves —
   separates "the optimizer failed" from "grid 50 cannot express it".
2. After registration, measure |T_rec(x) - T_gt(x)| over the foreground.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def get_pair(shape, seed, ctrl_sigma, ffd_spacing, contrast=0.6, tag=""):
    import pickle
    from magellanmapper_tpu.atlas import gauntlet
    cache = f"/tmp/gauntlet_pair_{shape[0]}x{shape[1]}x{shape[2]}_" \
            f"s{seed}_c{ctrl_sigma}_f{ffd_spacing}_rc{contrast}{tag}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    t0 = time.perf_counter()
    pair = gauntlet.build_pair(
        tuple(shape), seed=seed, ffd_ctrl_sigma=ctrl_sigma,
        ffd_spacing=ffd_spacing, region_contrast=contrast)
    print(f"pair built in {time.perf_counter()-t0:.1f}s")
    with open(cache, "wb") as f:
        pickle.dump(pair, f)
    return pair


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[160, 240, 200])
    ap.add_argument("--iters-scale", type=float, default=1.0)
    ap.add_argument("--ctrl-sigma", type=float, default=14.0)
    ap.add_argument("--ffd-spacing", type=float, default=64.0)
    ap.add_argument("--grid-vox", type=float, default=50.0)
    ap.add_argument("--samples", type=int, default=0,
                    help="override num_spatial_samples (0 = default)")
    ap.add_argument("--grid-schedule", type=float, nargs="*", default=None,
                    help="bspline grid spacing schedule, coarse->fine "
                         "multipliers of --grid-vox (Elastix default "
                         "powers-of-2: 8 4 2 1)")
    ap.add_argument("--region-contrast", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-reg", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from magellanmapper_tpu.atlas import (
        gauntlet, metrics, reg_engine, transform)
    from magellanmapper_tpu.settings.atlas_prof import (
        AtlasProfile, make_reg_param_map)

    shape = tuple(args.shape)
    pair = get_pair(shape, args.seed, args.ctrl_sigma, args.ffd_spacing,
                    args.region_contrast)
    gt = pair["gt"]

    # ---- representation bound: GT field interpolated onto grid-50 ----
    rec_spacing = (args.grid_vox,) * 3
    rec_gshape = transform.bspline_grid_shape(shape, rec_spacing)
    ideal_grid = transform.resample_grid(
        gt["grid"], gt["spacing"], rec_gshape, rec_spacing)
    labels_ideal = np.asarray(transform.resample(
        jnp.asarray(pair["labels"].astype(np.float32)),
        {"grid": ideal_grid}, "bspline", shape, rec_spacing,
        pre_affine=gt["affine"], order=0)).astype(np.int32)
    lt_bound = gauntlet.label_transfer_dsc(
        labels_ideal, pair["labels_fixed_gt"])
    print(json.dumps({"repr_bound_median": round(lt_bound["median"], 4),
                      "repr_bound_min": round(lt_bound["min"], 4)}))
    if args.skip_reg:
        return

    # ---- registration + warp error ----
    prof = AtlasProfile()
    extra = {}
    if args.samples:
        extra["num_spatial_samples"] = args.samples
    prof["reg_translation"] = make_reg_param_map(
        "translation", 2048, num_resolutions=4, pyramid_mode="smoothing",
        **extra)
    prof["reg_affine"] = make_reg_param_map(
        "affine", 1024, num_resolutions=4, pyramid_mode="smoothing",
        **extra)
    prof["reg_bspline"] = make_reg_param_map(
        "bspline", 512, grid_space_voxels=args.grid_vox,
        num_resolutions=4, pyramid_mode="smoothing",
        grid_spacing_schedule=args.grid_schedule, **extra)
    t0 = time.perf_counter()
    moved, result = reg_engine.register_duo(
        pair["fixed"], pair["moving"], prof,
        iters_scale=args.iters_scale, record_stage_dsc=True)
    wall = time.perf_counter() - t0

    labels_pred = result.transform_img(
        pair["labels"].astype(np.float32), order=0).astype(np.int32)
    lt = gauntlet.label_transfer_dsc(labels_pred, pair["labels_fixed_gt"])

    # warp error: |T_rec - T_gt| over foreground sample grid
    kind, params, pre = result._final()
    stride = (4, 4, 4)
    c_rec = transform.transform_coords(
        {k: jnp.asarray(v) for k, v in params.items()}, kind, shape,
        result.bspline_spacing,
        {k: jnp.asarray(v) for k, v in pre.items()} if pre else None,
        stride)
    c_gt = transform.transform_coords(
        {"grid": gt["grid"]}, "bspline", shape, gt["spacing"],
        gt["affine"], stride)
    err = np.asarray(jnp.sqrt(jnp.sum((c_rec - c_gt) ** 2, axis=0)))
    # error only matters where the FIXED image has content (the
    # transform is unconstrained in background/extrapolation zones)
    fg = pair["labels_fixed_gt"][::4, ::4, ::4][
        :err.shape[0], :err.shape[1], :err.shape[2]] > 0
    err_fg = err[fg]

    st = {k.replace("dsc_stage_", ""): round(v, 4)
          for k, v in result.metrics.items() if k.startswith("dsc_stage_")}
    print(json.dumps({
        "wall_s": round(wall, 1),
        "dsc": round(result.metrics["dsc_fixed_moved"], 4),
        "stage_dsc": st,
        "bspline_gain": round(
            st.get("bspline", 0) - st.get("affine", 0), 4),
        "label_median": round(lt["median"], 4),
        "label_min": round(lt["min"], 4),
        "warp_err_fg_mean": round(float(err_fg.mean()), 2),
        "warp_err_fg_p95": round(float(np.percentile(err_fg, 95)), 2),
        "gt_disp": gt["disp_stats"]}))


if __name__ == "__main__":
    main()
