"""Realistic registration validation gauntlet (synthetic, ground-truthed).

The reference's real workload registers an averaged atlas onto a *different
specimen*: a deformably-different brain with a different intensity profile
(``/root/reference/magmap/atlas/register.py:647,884-893`` — atlas and
annotation images moved onto a sample image, Mattes-MI across the modality
gap, labels carried with order-0 interpolation). A mono-modal affine
self-resample exercises none of that, so this module builds a pair with a
KNOWN ground truth covering each hard part:

 - a smooth free-form (cubic B-spline FFD) deformation composed ON TOP of
   an affine — the component an affine stage cannot recover;
 - a nonlinear monotone intensity remap, a multiplicative low-frequency
   bias field, and additive Gaussian noise on the fixed ("specimen")
   image — the atlas-to-specimen modality gap MI exists for;
 - a multi-label annotation volume partitioning the anatomy, so
   label-transfer quality (per-region Dice vs the ground-truth warp of
   the labels) is measured the way atlas users consume registration
   (reference label transfer: ``register.py:616-638`` Transformix
   order-0).

Everything is generated from seeds; the ground-truth transform uses the
same FFD/affine machinery as the engine (``atlas.transform``), so the
recovered fixed-to-moving mapping is directly comparable.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from magellanmapper_tpu.atlas import transform


def make_anatomy(
        shape: Sequence[int], n_labels: int = 24, n_blobs: int = 240,
        seed: int = 0, region_contrast: float = 0.6
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic "atlas": ellipsoid brain w/ blobby texture + label map.

    Returns ``(intensity, labels)``; labels are ``0`` outside the
    anatomy and ``1..n_labels`` inside (a nearest-seed partition, so
    regions are contiguous, irregular, and tile the whole foreground the
    way an ontology annotation does).

    Each region carries its own base intensity (``region_contrast``
    scales the per-region spread) the way real autofluorescence atlases
    do — cortex/white-matter/ventricle brightness differ, and those
    internal edges are exactly what intensity registration locks onto.
    Without them the interior is homogeneous and ANY diffeomorphism of
    the interior matches intensities equally well, so the recovered
    field is unconstrained where label transfer is judged (measured:
    warp error ~= GT displacement with flat interiors, even at dyadic
    grid spacings where representation is exact).
    """
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in shape)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    center = [(s - 1) / 2 for s in shape]
    # ellipsoid with a lumpy radius so the boundary is not analytic
    nz = (zz - center[0]) / (shape[0] * 0.38)
    ny = (yy - center[1]) / (shape[1] * 0.40)
    nx = (xx - center[2]) / (shape[2] * 0.36)
    r2 = nz ** 2 + ny ** 2 + nx ** 2
    lump = (0.12 * np.sin(zz / 17.0) * np.cos(yy / 23.0)
            + 0.10 * np.sin(xx / 19.0 + 1.1))
    mask = r2 < (1.0 + lump)

    # nearest-seed partition of the foreground -> contiguous regions
    seeds = np.column_stack([
        rng.uniform(0.15 * s, 0.85 * s, n_labels) for s in shape])
    fg = np.argwhere(mask)
    from scipy.spatial import cKDTree
    _, idx = cKDTree(seeds).query(fg, k=1)
    labels = np.zeros(shape, np.int32)
    labels[tuple(fg.T)] = idx.astype(np.int32) + 1

    # per-region base level (region_contrast=0 reproduces the flat 0.35)
    levels = 0.35 + region_contrast * (
        rng.uniform(0.0, 1.0, n_labels + 1) - 0.35)
    levels[0] = 0.0
    intensity = levels[labels].astype(np.float32)
    # internal blobby texture (cell-dense nuclei the detector would see)
    coords = np.column_stack(
        [rng.integers(8, s - 8, n_blobs) for s in shape])
    bz, by, bx = np.indices((15, 15, 15)).astype(np.float32) - 7
    for (cz, cy, cx), r in zip(coords, rng.uniform(2.5, 5.0, n_blobs)):
        sig = r / np.sqrt(2)
        stamp = np.exp(-(bz**2 + by**2 + bx**2) / (2 * sig**2))
        intensity[cz-7:cz+8, cy-7:cy+8, cx-7:cx+8] += 0.6 * stamp
    # smooth regional gradient so large-scale structure exists too
    intensity += mask * (0.15 * np.sin(zz / 40.0) * np.cos(xx / 55.0))
    intensity *= mask
    intensity = np.clip(intensity, 0, None)
    intensity /= max(intensity.max(), 1e-6)
    return intensity, labels


def make_ground_truth(
        shape: Sequence[int], seed: int = 1,
        ffd_spacing: float = 100.0, ffd_ctrl_sigma: float = 26.0,
        rot_deg: float = 4.0, scale_jitter: float = 0.06,
        shift: Sequence[float] = (4.0, -6.0, 5.0),
        remove_affine_component: bool = True) -> Dict:
    """Known smooth transform: FFD (cubic B-spline lattice) then affine.

    Composition order matches the engine's (``transform.transform_coords``
    bspline branch: coords + FFD displacement, then the pre-affine), so
    ``resample(base, {"grid": grid}, "bspline", shape, spacing,
    pre_affine=affine)`` both *generates* the fixed image and defines the
    mapping registration must recover. ``ffd_ctrl_sigma`` is the
    per-control-point displacement draw in voxels; the realized field is
    a basis-weighted average, so measure ``disp_stats`` for the actual
    magnitude. The defaults (sigma 26 at spacing 100) realize a ~16-vox
    mean foreground displacement on a (160,240,200) volume — the
    specimen-vs-atlas scale of deformation the reference's workload
    carries, and large enough that the affine stage cannot absorb it
    (at the old sigma-14/spacing-64 defaults the affine residual left
    the B-spline stage <0.05 DSC of work, under the gauntlet gate).

    With ``remove_affine_component`` (default) the best-fit global affine
    of the random FFD field is subtracted AT THE CONTROL POINTS — cubic
    B-splines reproduce linear fields exactly, so what remains is purely
    non-affine deformation. Without this a coarse-lattice random field is
    largely absorbable by the affine registration stage (a spacing-64
    lattice over a ~200-voxel extent has only ~3 control periods/axis),
    which silently converts a "deformable" gauntlet into an affine one.
    """
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in shape)
    spacing = (float(ffd_spacing),) * 3
    gshape = transform.bspline_grid_shape(shape, spacing)
    grid = rng.normal(0.0, ffd_ctrl_sigma, (3,) + gshape).astype(np.float32)

    if remove_affine_component:
        # control j of the engine's basis anchors at (j - 1) * spacing
        # (transform.bspline_displacement_at); fit disp ~ A @ x + b over
        # the in-volume controls and subtract that affine field's exact
        # control values (linear reproduction) from the lattice
        axes = [np.arange(g, dtype=np.float64) - 1.0 for g in gshape]
        zz_c, yy_c, xx_c = np.meshgrid(
            axes[0] * spacing[0], axes[1] * spacing[1],
            axes[2] * spacing[2], indexing="ij")
        pts = np.stack([zz_c, yy_c, xx_c], axis=-1).reshape(-1, 3)
        inside = np.all((pts >= 0) & (pts <= np.asarray(shape) - 1), axis=1)
        X = np.column_stack([pts, np.ones(len(pts))])
        disp_c = grid.reshape(3, -1).T.astype(np.float64)
        coef, *_ = np.linalg.lstsq(X[inside], disp_c[inside], rcond=None)
        grid = (disp_c - X @ coef).T.reshape(grid.shape).astype(np.float32)

    th = np.deg2rad(rot_deg)
    rot = np.array([[1, 0, 0],
                    [0, np.cos(th), -np.sin(th)],
                    [0, np.sin(th), np.cos(th)]], np.float32)
    scale = np.diag(1.0 + rng.uniform(
        -scale_jitter, scale_jitter, 3)).astype(np.float32)
    a = rot @ scale
    affine = {"W": jnp.asarray(a - np.eye(3, dtype=np.float32)),
              "t": jnp.asarray(np.asarray(shift, np.float32))}

    disp = np.asarray(transform.bspline_displacement(
        jnp.asarray(grid), shape, spacing, stride=(4, 4, 4)))
    mag = np.sqrt((disp ** 2).sum(axis=0))
    return {
        "grid": jnp.asarray(grid), "spacing": spacing, "affine": affine,
        "disp_stats": {"mean_vox": float(mag.mean()),
                       "p95_vox": float(np.percentile(mag, 95)),
                       "max_vox": float(mag.max())}}


def apply_modality_gap(
        img: np.ndarray, seed: int = 2, gamma: float = 2.0,
        bias_strength: float = 0.3, noise_sigma: float = 0.03
) -> np.ndarray:
    """Make the fixed image look like a different modality/specimen.

    Nonlinear monotone remap (gamma + soft knee), multiplicative smooth
    bias field (coarse random field upsampled, the MRI/light-sheet
    illumination artifact Mattes-MI tolerates and SSD does not), and
    additive Gaussian noise.
    """
    from scipy.ndimage import zoom
    rng = np.random.default_rng(seed)
    x = np.clip(np.asarray(img, np.float32), 0, 1)
    remapped = x ** gamma / (x ** gamma + 0.25 ** gamma)
    coarse = rng.normal(0.0, 1.0, (4, 4, 4))
    bias = zoom(coarse, [s / 4 for s in img.shape], order=3)
    bias = 1.0 + bias_strength * bias / max(np.abs(bias).max(), 1e-6)
    noisy = remapped * bias + rng.normal(0, noise_sigma, img.shape)
    return np.clip(noisy, 0, None).astype(np.float32)


def build_pair(shape: Sequence[int] = (160, 240, 200), seed: int = 0,
               region_contrast: float = 0.6,
               cache_dir: Optional[str] = None, **gt_kwargs) -> Dict:
    """Full gauntlet pair: moving atlas + deformed multi-modal fixed.

    Returns a dict with ``moving`` (clean atlas intensity), ``labels``
    (atlas annotation), ``fixed`` (GT-warped + modality-gapped specimen),
    ``labels_fixed_gt`` (annotation carried through the GT warp with
    order-0, the label-transfer oracle), and ``gt`` (the transform).

    ``cache_dir`` caches the built arrays on disk keyed by every
    parameter (the fixture is pure host work, ~2 min at atlas scale on
    the single shared core; bench reruns skip it).
    """
    import jax

    cache_path = None
    if cache_dir is not None:
        key = "_".join(
            [str(int(s)) for s in shape]
            + [f"s{seed}", f"rc{region_contrast}"]
            + [f"{k}={v}" for k, v in sorted(gt_kwargs.items())])
        cache_path = os.path.join(cache_dir, f"gauntlet_{key}.npz")
        if os.path.exists(cache_path):
            z = np.load(cache_path)
            gt = {"grid": jnp.asarray(z["grid"]),
                  "spacing": tuple(float(v) for v in z["spacing"]),
                  "affine": {"W": jnp.asarray(z["aff_W"]),
                             "t": jnp.asarray(z["aff_t"])},
                  "disp_stats": {
                      k: float(v) for k, v in zip(
                          ("mean_vox", "p95_vox", "max_vox"),
                          z["disp_stats"])}}
            return {"moving": z["moving"],
                    "labels": z["labels"].astype(np.int32),
                    "fixed": z["fixed"],
                    "labels_fixed_gt":
                        z["labels_fixed_gt"].astype(np.int32), "gt": gt}

    moving, labels = make_anatomy(
        shape, seed=seed, region_contrast=region_contrast)
    gt = make_ground_truth(shape, seed=seed + 1, **gt_kwargs)
    params = {"grid": gt["grid"]}
    # fixture generation is host work: over a remote-TPU link the two
    # full-res warps cost minutes of dispatch/compile; the CPU backend
    # does them in seconds
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        warped = np.asarray(transform.resample(
            jnp.asarray(moving), params, "bspline", shape, gt["spacing"],
            pre_affine=gt["affine"], order=1))
        labels_fixed_gt = np.asarray(transform.resample(
            jnp.asarray(labels.astype(np.float32)), params, "bspline",
            shape, gt["spacing"], pre_affine=gt["affine"],
            order=0)).astype(np.int32)
    fixed = apply_modality_gap(warped, seed=seed + 2)
    if cache_path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        # uncompressed: zlib over ~500 MB costs minutes on the single
        # shared core, more than the build it is meant to save
        np.savez(
            cache_path, moving=moving,
            labels=labels.astype(np.int16), fixed=fixed,
            labels_fixed_gt=labels_fixed_gt.astype(np.int16),
            grid=np.asarray(gt["grid"]),
            spacing=np.asarray(gt["spacing"], np.float64),
            aff_W=np.asarray(gt["affine"]["W"]),
            aff_t=np.asarray(gt["affine"]["t"]),
            disp_stats=np.asarray(
                [gt["disp_stats"]["mean_vox"], gt["disp_stats"]["p95_vox"],
                 gt["disp_stats"]["max_vox"]], np.float64))
    return {"moving": moving, "labels": labels, "fixed": fixed,
            "labels_fixed_gt": labels_fixed_gt, "gt": gt}


def build_truncated_pair(
        shape: Sequence[int] = (160, 240, 200), seed: int = 0,
        keep_frac: float = 0.7,
        cache_dir: Optional[str] = None, **gt_kwargs) -> Dict:
    """Partial-overlap case: truncated specimen vs the FULL atlas.

    The reference's real pipelines register a full averaged atlas onto
    specimens whose imaging cut off part of the brain — handled by the
    ``truncate_labels`` / crop workflow
    (``/root/reference/magmap/atlas/register.py:791-804``,
    ``atlas_refiner.py:53``). Model it by zeroing the posterior
    ``1 - keep_frac`` of the specimen's z extent (and its GT-warped
    annotation) and carrying a ``fixed_mask`` over the kept region so
    the metric ignores the missing anatomy — the crop workflow's
    sampling semantics. Label gates then consider only regions
    substantially present in the truncated specimen.
    """
    pair = build_pair(shape, seed=seed, cache_dir=cache_dir, **gt_kwargs)
    shape = pair["fixed"].shape
    z_cut = int(shape[0] * keep_frac)
    fixed = np.array(pair["fixed"])
    fixed[z_cut:] = 0.0
    labels_gt = np.array(pair["labels_fixed_gt"])
    labels_gt[z_cut:] = 0
    mask = np.zeros(shape, bool)
    mask[:z_cut] = True
    # a region counts toward the gates only if the truncation kept most
    # of it — slivers bisected by the cut plane measure the cut, not
    # the registration
    full_counts = np.bincount(pair["labels_fixed_gt"].reshape(-1))
    kept_counts = np.bincount(
        labels_gt.reshape(-1), minlength=len(full_counts))
    gated = [int(lid) for lid in range(1, len(full_counts))
             if full_counts[lid] > 0
             and kept_counts[lid] >= 0.5 * full_counts[lid]]
    out = dict(pair)
    out.update(fixed=fixed, labels_fixed_gt=labels_gt, fixed_mask=mask,
               gated_labels=gated, keep_frac=float(keep_frac))
    return out


def run_gauntlet(pair: Dict, iters_scale: float = 1.0) -> Dict:
    """Register the gauntlet pair and score it against the ground truth.

    Runs the TRUE Elastix-default schedule (translation 2048 / affine
    1024 / bspline 512 iterations x 4 smoothing-pyramid resolutions,
    grid 50 voxels — ``/root/reference/magmap/settings/atlas_prof.py:
    53-69``) with per-stage DSC recording, then measures what atlas
    users actually consume:

     - ``dsc``: fixed/moved Otsu-overlap DSC (gate >= 0.95);
     - ``label_dsc_median``/``label_dsc_min``/``label_dsc_p10``:
       per-region Dice of the order-0 transferred annotation vs the
       GT-warped one (gates: median >= 0.90 AND (min >= 0.80 OR
       p10 >= 0.85) — one bad region at 0.77 is exactly what an atlas
       user notices, so the worst region is gated, not just reported);
     - ``bspline_dsc_gain``: DSC the B-spline stage adds over the
       affine stage, and ``bspline_gap_closure``: that gain as a
       fraction of the post-affine residual ``1 - dsc_affine`` (gate:
       gain >= 0.05 OR closure >= 0.5 — proves the deformable stage
       does real work, not +0.011 on an affine-only pair. The absolute
       gain alone is miscalibrated when the GT warp has a strong affine
       component: a pair whose affine stage already reaches DSC 0.944
       caps the possible gain at ~0.056, so demanding 0.05 absolute is
       demanding ~90% of the residual — the closure alternative gates
       the same "deformable stage works" property scale-free);
     - ``warp_err_vox``: mean ``|T_rec(x) - T_gt(x)|`` over foreground
       voxels vs the GT mean displacement ``gt_disp_vox``.

    Pairs from :func:`build_truncated_pair` carry a ``fixed_mask``
    (metric sampling restricted to the kept anatomy, overlap DSC
    measured inside it) and ``gated_labels`` (regions substantially
    present in the truncated specimen).
    """
    import time as _time

    from magellanmapper_tpu.atlas import reg_engine
    from magellanmapper_tpu.settings.atlas_prof import (
        AtlasProfile, make_reg_param_map)

    shape = pair["moving"].shape
    gt = pair["gt"]
    fixed_mask = pair.get("fixed_mask")
    prof = AtlasProfile()
    prof["reg_translation"] = make_reg_param_map(
        "translation", 2048, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_affine"] = make_reg_param_map(
        "affine", 1024, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_bspline"] = make_reg_param_map(
        "bspline", 512, grid_space_voxels=50, num_resolutions=4,
        pyramid_mode="smoothing")
    t0 = _time.perf_counter()
    moved, result = reg_engine.register_duo(
        pair["fixed"], pair["moving"], prof,
        iters_scale=iters_scale, record_stage_dsc=True,
        fixed_mask=(fixed_mask.astype(np.float32)
                    if fixed_mask is not None else None))
    wall = _time.perf_counter() - t0

    labels_pred = result.transform_img(
        pair["labels"].astype(np.float32), order=0).astype(np.int32)
    if fixed_mask is not None:
        # judge label transfer only where the specimen exists — the
        # atlas legitimately extends past the truncation
        labels_pred = np.where(fixed_mask, labels_pred, 0)
    lt = label_transfer_dsc(
        labels_pred, pair["labels_fixed_gt"],
        only_labels=pair.get("gated_labels"))

    # warp error: |T_rec - T_gt| sampled on a stride-4 grid, restricted
    # to foreground (the transform is unconstrained in background)
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
    fg = pair["labels_fixed_gt"][::4, ::4, ::4][
        :err.shape[0], :err.shape[1], :err.shape[2]] > 0
    err_fg = err[fg] if fg.any() else err.reshape(-1)

    st = {k.replace("dsc_stage_", ""): float(v)
          for k, v in result.metrics.items()
          if k.startswith("dsc_stage_")}
    dsc = float(result.metrics["dsc_fixed_moved"])
    if fixed_mask is not None:
        # overlap judged inside the kept anatomy only
        from magellanmapper_tpu.atlas import metrics as _metrics
        dsc = float(_metrics.measure_overlap(
            pair["fixed"], np.where(fixed_mask, moved, 0.0)))
    gain = st.get("bspline", 0.0) - st.get("affine", 0.0)
    closure = bspline_gap_closure(st.get("affine"), gain)
    out = {
        "wall_s": wall, "dsc": dsc, "stage_dsc": st,
        "bspline_dsc_gain": gain,
        "bspline_gap_closure": closure,
        "label_dsc_median": lt["median"], "label_dsc_min": lt["min"],
        "label_dsc_p10": lt["p10"],
        "warp_err_vox": float(err_fg.mean()),
        "warp_err_p95_vox": float(np.percentile(err_fg, 95)),
        "gt_disp_vox": float(gt["disp_stats"]["mean_vox"]),
        "passes": gates_pass(
            dsc=dsc, label_median=lt["median"], label_min=lt["min"],
            label_p10=lt["p10"], gain=gain, closure=closure),
    }
    return out


def bspline_gap_closure(dsc_affine: Optional[float],
                        gain: float) -> float:
    """Fraction of the post-affine DSC residual the B-spline stage
    closed: ``gain / (1 - dsc_affine)``. Scale-free complement to the
    absolute gain — 0.76 closure on a 0.944-affine pair is stronger
    deformable-stage evidence than 0.051 absolute on a 0.938 one."""
    if dsc_affine is None:
        return 0.0
    return float(gain / max(1.0 - float(dsc_affine), 1e-9))


def gates_pass(dsc: float, label_median: float, label_min: float,
               label_p10: float, gain: float, closure: float) -> bool:
    """The per-pair gauntlet gate (round-4 VERDICT item 4, hardened):

    ``dsc >= 0.95`` AND ``label_median >= 0.90`` AND the worst region
    holds up (``label_min >= 0.80`` OR ``label_p10 >= 0.85``) AND the
    deformable stage does real work (``gain >= 0.05`` absolute OR
    ``closure >= 0.5`` of the post-affine residual — see
    :func:`bspline_gap_closure` for why absolute gain alone
    mis-gates pairs whose GT warp has a strong affine component).
    """
    return bool(
        dsc >= 0.95 and label_median >= 0.90
        and (label_min >= 0.80 or label_p10 >= 0.85)
        and (gain >= 0.05 or closure >= 0.5))


def run_gauntlet_suite(
        shape: Sequence[int] = (160, 240, 200),
        seeds: Sequence[int] = (0, 10),
        truncated_seed: Optional[int] = 0,
        cache_dir: Optional[str] = None,
        iters_scale: float = 1.0, **gt_kwargs) -> Dict:
    """Multi-pair gauntlet: >= 2 seeded anatomy/deformation pairs plus a
    truncated-specimen partial-overlap case, so the gates are not tuned
    to one fixture (round-4 VERDICT item 4). Every pair must pass every
    gate for the suite to pass.
    """
    pairs = []
    for s in seeds:
        pairs.append((f"seed{s}", build_pair(
            shape, seed=s, cache_dir=cache_dir, **gt_kwargs)))
    if truncated_seed is not None:
        pairs.append((f"trunc{truncated_seed}", build_truncated_pair(
            shape, seed=truncated_seed, cache_dir=cache_dir,
            **gt_kwargs)))
    results = {}
    for name, pair in pairs:
        results[name] = run_gauntlet(pair, iters_scale=iters_scale)
    return {
        "pairs": results,
        "passes": bool(all(r["passes"] for r in results.values())),
        "wall_s": float(sum(r["wall_s"] for r in results.values()))}


def label_transfer_dsc(
        labels_pred: np.ndarray, labels_gt: np.ndarray,
        ignore_background: bool = True,
        only_labels: Optional[Sequence[int]] = None) -> Dict:
    """Per-label Dice of a transferred annotation vs the GT-warped one.

    The per-region quality metric atlas users actually consume
    (regional volumes/stats are per-label sums); reports the median,
    min, 10th percentile, and the per-label vector. Labels absent from
    both volumes are skipped; ``only_labels`` restricts scoring (the
    truncated-specimen case gates only regions the truncation kept).
    """
    ids = np.union1d(np.unique(labels_gt), np.unique(labels_pred))
    if ignore_background:
        ids = ids[ids != 0]
    if only_labels is not None:
        ids = np.intersect1d(ids, np.asarray(only_labels))
    dscs = {}
    for lid in ids:
        a = labels_pred == lid
        b = labels_gt == lid
        denom = a.sum() + b.sum()
        if denom == 0:
            continue
        dscs[int(lid)] = float(2.0 * np.logical_and(a, b).sum() / denom)
    vals = np.asarray(list(dscs.values()))
    return {"median": float(np.median(vals)) if len(vals) else 0.0,
            "mean": float(vals.mean()) if len(vals) else 0.0,
            "min": float(vals.min()) if len(vals) else 0.0,
            "p10": float(np.percentile(vals, 10)) if len(vals) else 0.0,
            "per_label": dscs}
