"""Registration task surface — the reference's ``--register`` driver.

Equivalent of ``magmap/atlas/register.py``: the single-sample
``register`` task (``register.py:647``) — load fixed sample + moving
atlas/labels, pre-transform, run the JAX registration engine
(``reg_engine.register_duo``), measure DSC with similarity-metric
fallback (``:884-893``), transfer labels at order 0 with carve/in-paint
curation (``curate_img :227``), write the registered image set
(``RegNames`` vocabulary, ``config.py:578``) and a metrics CSV
(``:1001-1016``) — plus groupwise registration (``register_group
:1189``) via iterative registration to an evolving mean.
"""

from __future__ import annotations

import logging
import os
import time
from enum import Enum
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from magellanmapper_tpu.atlas import atlas_refiner, metrics as reg_metrics
from magellanmapper_tpu.atlas import reg_engine
from magellanmapper_tpu.cv import cv_nd
from magellanmapper_tpu.io import np_io, sitk_io

_logger = logging.getLogger(__name__)

register_duo = reg_engine.register_duo


class RegNames(Enum):
    """Registered-image suffix vocabulary (reference ``config.RegNames``)."""
    IMG_ATLAS = "atlasVolume.mhd"
    IMG_ATLAS_PRECUR = "atlasVolumePrecur.mhd"
    IMG_LABELS = "annotation.mhd"
    IMG_EXP = "exp.mhd"
    IMG_EXP_MASK = "expMask.mhd"
    IMG_GROUPED = "grouped.mhd"
    IMG_BORDERS = "borders.mhd"
    IMG_HEAT_MAP = "heat.mhd"
    IMG_HEAT_COLOC = "heatColoc.mhd"
    IMG_ATLAS_EDGE = "atlasEdge.mhd"
    IMG_ATLAS_LOG = "atlasLoG.mhd"
    IMG_ATLAS_MASK = "atlasMask.mhd"
    IMG_LABELS_PRECUR = "annotationPrecur.mhd"
    IMG_LABELS_TRUNC = "annotationTrunc.mhd"
    IMG_LABELS_EDGE = "annotationEdge.mhd"
    IMG_LABELS_DIST = "annotationDist.mhd"
    IMG_LABELS_MARKERS = "annotationMarkers.mhd"
    IMG_LABELS_INTERIOR = "annotationInterior.mhd"
    IMG_LABELS_SUBSEG = "annotationSubseg.mhd"
    IMG_LABELS_DIFF = "annotationDiff.mhd"
    IMG_LABELS_LEVEL = "annotationLevel{}.mhd"
    IMG_LABELS_TRANS = "annotationTrans.mhd"
    COMBINED = "combined.mhd"


def curate_img(
        fixed_img: np.ndarray, labels_img: np.ndarray,
        imgs: Optional[Sequence[np.ndarray]] = None,
        inpaint: bool = True, carve: bool = True,
        thresh: Optional[float] = None, holes_area: int = 5000):
    """Carve transferred images to the fixed foreground and in-paint
    unlabeled foreground (reference ``register.curate_img :227``)."""
    out_imgs = [labels_img] if imgs is None else [labels_img, *imgs]
    result = []
    mask = None
    if carve:
        _, mask = cv_nd.carve(
            np.asarray(fixed_img, np.float32), thresh=thresh,
            holes_area=holes_area)
    for img in out_imgs:
        img = np.array(img)
        if mask is not None:
            if inpaint:
                to_fill = mask & (labels_img == 0)
                if np.any(to_fill) and np.any(labels_img != 0):
                    img = cv_nd.in_paint(img, to_fill)
            img[~mask] = 0
        result.append(img)
    return result if imgs is not None else result[0]


def load_elastix_points(path: str) -> np.ndarray:
    """Load an Elastix point-set file into an ``(N, 3)`` z,y,x array.

    Format (reference ``fix_pts.txt``/``mov_pts.txt``, consumed by
    Elastix via ``SetFixedPointSetFileName``, ``register.py:583-602``):
    first line ``point`` or ``index``, second line the point count, then
    one ``x y z`` coordinate triple per line (converted here to z,y,x
    voxel order).
    """
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # skip the "point"/"index" header and the count line when present
    start = 0
    if lines and lines[0].lower() in ("point", "index"):
        start = 2 if len(lines) > 1 and lines[1].isdigit() else 1
    pts = np.asarray(
        [[float(v) for v in ln.split()] for ln in lines[start:]],
        np.float32)
    return pts[:, ::-1]  # x,y,z -> z,y,x


def register(
        fixed_path_or_img, moving_dir_or_imgs,
        profile,
        resolutions: Optional[Sequence[float]] = None,
        write_imgs: bool = True,
        prefix: Optional[str] = None,
        iters_scale: float = 1.0,
        channel: int = 0,
        reg_suffixes: Optional[Dict[str, str]] = None,
        fixed_mask: Optional[np.ndarray] = None,
        moving_mask: Optional[np.ndarray] = None,
        checkpoint_dir: Optional[str] = None,
        mesh=None) -> Dict:
    """Register a moving atlas onto a fixed sample image
    (reference ``register.register :647``). With ``mesh`` every
    pyramid level runs the mesh-sharded metric
    (``reg_engine._optimize_level_sharded``).

    Args:
        fixed_path_or_img: path to a ``.npy``/medical image, or ndarray.
        moving_dir_or_imgs: atlas directory containing
            ``atlasVolume``/``annotation``, or dict with ``atlas`` and
            ``labels`` arrays.
        profile: AtlasProfile with ``reg_*`` stages and
            ``metric_sim_fallback``.
        resolutions: fixed image z,y,x spacing (read from metadata when a
            path is given).
        write_imgs: write the registered image set + metrics CSV.
        prefix: output path prefix (defaults to the fixed path).
        iters_scale: iteration multiplier for quick runs.
        channel: channel of the fixed image to register against.

    Returns:
        dict with ``moved_atlas``, ``moved_labels``, ``transform``
        (RegResult), ``metrics`` and (if written) ``paths``.
    """
    start = time.time()
    # load fixed image
    if isinstance(fixed_path_or_img, np.ndarray):
        fixed = fixed_path_or_img
        fixed_path = prefix or "sample"
    else:
        fixed_path = fixed_path_or_img
        if fixed_path.lower().endswith(sitk_io.EXTS_3D):
            med = sitk_io.read_med_img(fixed_path)
            fixed = med.img
            resolutions = resolutions or med.spacing
        else:
            img5d = np_io.read_file(fixed_path)
            vol = img5d.img[0]
            fixed = np.asarray(vol[..., channel] if vol.ndim > 3 else vol)
            if resolutions is None and img5d.resolutions is not None:
                resolutions = img5d.resolutions[0]
    fixed = np.asarray(fixed, np.float32)

    # load moving atlas + labels (names configurable via reg_suffixes,
    # reference --reg_suffixes atlas=... annotation=...)
    if isinstance(moving_dir_or_imgs, dict):
        moving_atlas = np.asarray(moving_dir_or_imgs["atlas"], np.float32)
        moving_labels = np.asarray(moving_dir_or_imgs["labels"])
    else:
        atlas_name = (reg_suffixes or {}).get("atlas", "atlasVolume")
        labels_name = (reg_suffixes or {}).get("annotation", "annotation")
        atlas_name = os.path.splitext(atlas_name)[0]
        labels_name = os.path.splitext(labels_name)[0]
        moving_atlas = sitk_io.read_med_img(sitk_io.find_sitk_file(
            os.path.join(moving_dir_or_imgs, atlas_name))).img.astype(
            np.float32)
        moving_labels = sitk_io.read_med_img(sitk_io.find_sitk_file(
            os.path.join(moving_dir_or_imgs, labels_name))).img

    # image masks via reg_suffixes relative to the fixed path (reference
    # register.py:768-780 fixed_mask/moving_mask suffixes)
    if isinstance(fixed_path_or_img, str):
        sfx = reg_suffixes or {}
        if fixed_mask is None and sfx.get("fixed_mask"):
            fixed_mask = sitk_io.load_registered_img(
                prefix or fixed_path, sfx["fixed_mask"])
        if moving_mask is None and sfx.get("moving_mask"):
            moving_mask = sitk_io.load_registered_img(
                prefix or fixed_path, sfx["moving_mask"])

    # corresponding landmarks next to the fixed image when any stage is
    # point-based (reference fix_pts.txt/mov_pts.txt, register.py:583-602)
    fix_pts = mov_pts = None
    point_based = any(
        (profile[k] or {}).get("point_based")
        for k in ("reg_translation", "reg_affine", "reg_bspline"))
    if point_based and isinstance(fixed_path_or_img, str):
        pts_dir = os.path.dirname(os.path.abspath(fixed_path))
        fp = os.path.join(pts_dir, "fix_pts.txt")
        mp = os.path.join(pts_dir, "mov_pts.txt")
        if os.path.isfile(fp) and os.path.isfile(mp):
            fix_pts = load_elastix_points(fp)
            mov_pts = load_elastix_points(mp)
            _logger.info(
                "loaded %d corresponding points from %s / %s",
                len(fix_pts), fp, mp)

    # register: translation -> affine -> bspline per profile; stages
    # checkpoint/resume through Orbax when a directory is given
    moved, result = reg_engine.register_duo(
        fixed, moving_atlas, profile, iters_scale=iters_scale,
        fixed_mask=fixed_mask, moving_mask=moving_mask,
        fix_pts=fix_pts, mov_pts=mov_pts,
        checkpoint_dir=checkpoint_dir, mesh=mesh)
    dsc = reg_metrics.measure_overlap(fixed, moved)

    fallback = profile["metric_sim_fallback"]
    if fallback and dsc < fallback[0]:
        # re-register with the fallback similarity metric (reference
        # register.py:884-893)
        _logger.info(
            "DSC %.3f below threshold %.3f; retrying with metric %s",
            dsc, fallback[0], fallback[1])
        import copy
        prof2 = copy.deepcopy(dict(profile))
        for stage_key in ("reg_translation", "reg_affine", "reg_bspline"):
            if prof2.get(stage_key):
                prof2[stage_key] = dict(prof2[stage_key])
                prof2[stage_key]["metric_similarity"] = fallback[1]
        moved2, result2 = reg_engine.register_duo(
            fixed, moving_atlas, prof2, iters_scale=iters_scale,
            fixed_mask=fixed_mask, moving_mask=moving_mask,
            fix_pts=fix_pts, mov_pts=mov_pts,
            checkpoint_dir=(os.path.join(checkpoint_dir, "fallback")
                            if checkpoint_dir else None), mesh=mesh)
        dsc2 = reg_metrics.measure_overlap(fixed, moved2)
        if dsc2 > dsc:
            moved, result, dsc = moved2, result2, dsc2

    # label transfer at order 0 (Transformix equivalent) + curation
    moved_labels = result.transform_img(moving_labels, order=0)
    if profile["curate"]:
        moved_labels = curate_img(fixed, moved_labels)
    dsc_sample_labels = atlas_refiner.measure_overlap_combined_labels(
        fixed, moved_labels)

    elapsed = time.time() - start
    metrics = {
        "DSC_atlas_sample": dsc,
        "DSC_sample_labels": dsc_sample_labels,
        "Time_s": elapsed,
    }
    out = {
        "moved_atlas": moved,
        "moved_labels": moved_labels,
        "transform": result,
        "metrics": metrics,
    }
    if write_imgs:
        base = prefix or fixed_path
        spacing = tuple(resolutions) if resolutions is not None else (
            1.0, 1.0, 1.0)
        paths = sitk_io.write_reg_images({
            RegNames.IMG_EXP.value: sitk_io.MedImage(fixed, spacing),
            RegNames.IMG_ATLAS.value: sitk_io.MedImage(
                moved.astype(np.float32), spacing),
            RegNames.IMG_LABELS.value: sitk_io.MedImage(
                moved_labels.astype(np.int32), spacing),
        }, base)
        df = pd.DataFrame([metrics])
        csv_path = sitk_io.reg_out_path(base, "stats") + ".csv"
        df.to_csv(csv_path, index=False)
        paths["stats"] = csv_path
        out["paths"] = paths
    _logger.info("Single registration done in %.1fs, DSC %.3f", elapsed, dsc)
    return out


def register_rev(
        fixed_path_or_img, moving_dir_or_imgs, profile, **kwargs) -> Dict:
    """Reverse registration: sample onto atlas
    (reference ``register_rev :1045``) — same engine with roles swapped."""
    if isinstance(moving_dir_or_imgs, dict):
        atlas = moving_dir_or_imgs["atlas"]
    else:
        atlas = sitk_io.read_med_img(sitk_io.find_sitk_file(
            os.path.join(moving_dir_or_imgs, "atlasVolume"))).img
    return register(
        np.asarray(atlas, np.float32),
        {"atlas": np.asarray(fixed_path_or_img, np.float32)
         if isinstance(fixed_path_or_img, np.ndarray)
         else np_io.read_file(fixed_path_or_img).img[0],
         "labels": np.zeros_like(np.asarray(atlas))},
        profile, **kwargs)


def register_group(
        imgs: Sequence[np.ndarray], profile,
        n_iters: int = 2, iters_scale: float = 1.0,
        joint: bool = True, mesh=None
) -> Tuple[np.ndarray, list]:
    """Groupwise registration (reference ``register_group :1189``).

    ``joint=True`` (default) optimizes all images' affine parameters
    together against the 4D group-variance metric
    (``reg_engine.register_groupwise``), matching the reference's
    Elastix groupwise formulation; ``joint=False`` falls back to
    iterative registration to an evolving mean.

    Returns the final mean image and per-image transform results.
    """
    if joint:
        max_iter = int(profile["groupwise_iter_max"] * iters_scale)
        # groupwise bspline stage per the reference's groupwise profile
        # (coarse 130-voxel grid, atlas_prof.py:287)
        bs = profile["reg_bspline"] or {}
        bspline_iter = int((bs.get("max_iter") or 0) * iters_scale) \
            if bs else 0
        gsv = float(bs.get("grid_space_voxels") or 130) if bs else 130.0
        return reg_engine.register_groupwise(
            imgs, max_iter=max_iter, bspline_iter=bspline_iter,
            grid_space_voxels=gsv,
            grid_spacing_schedule=bs.get("grid_spacing_schedule")
            if bs else None, mesh=mesh)
    shapes = np.asarray([im.shape for im in imgs])
    target_shape = shapes.min(axis=0)
    vols = [np.asarray(im[:target_shape[0], :target_shape[1],
                          :target_shape[2]], np.float32) for im in imgs]
    mean_img = np.mean(vols, axis=0)
    results = []
    for it in range(n_iters):
        moved_all = []
        results = []
        for vol in vols:
            moved, res = reg_engine.register_duo(
                mean_img, vol, profile, iters_scale=iters_scale)
            moved_all.append(moved)
            results.append(res)
        mean_img = np.mean(moved_all, axis=0)
    return mean_img, results


def volumes_by_id(
        img_paths: Sequence[str],
        labels_ref_path: Optional[str] = None,
        suffix: Optional[str] = None,
        unit_factor: Optional[float] = None,
        groups: Optional[Dict] = None,
        max_level: Optional[int] = None,
        combine_sides: bool = True,
        out_path: Optional[str] = None,
        mesh=None) -> "pd.DataFrame":
    """Regional metrics for each sample's registered image set
    (reference ``register.volumes_by_id :1613``).

    For every sample path, loads the registered atlas/annotation (plus
    heat map when present), measures per-label metrics, optionally remaps
    to an ontology level, and concatenates across samples with a Sample
    column. With ``mesh`` the voxel pass shards over the device mesh
    (per-device segment sums + one psum).
    """
    from magellanmapper_tpu.atlas import ontology
    from magellanmapper_tpu.stats import vols

    ref = None
    if labels_ref_path:
        ref = ontology.LabelsRef(labels_ref_path).load()
    dfs = []
    for i, path in enumerate(img_paths):
        base = path if suffix is None else path + suffix
        atlas = None
        try:
            atlas = sitk_io.load_registered_img(
                base, RegNames.IMG_ATLAS.value)
        except (FileNotFoundError, ValueError):
            pass
        labels = sitk_io.load_registered_img(
            base, RegNames.IMG_LABELS.value)
        heat = None
        try:
            heat = sitk_io.load_registered_img(
                base, RegNames.IMG_HEAT_MAP.value)
        except (FileNotFoundError, ValueError):
            pass
        df = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, combine_sides=combine_sides,
            labels_ref=ref, level=max_level, mesh=mesh)
        if unit_factor:
            df["Volume"] = df["Volume"] / unit_factor
        df.insert(0, "Sample", os.path.basename(path))
        if groups:
            for key, vals in groups.items():
                df[key] = vals[i]
        dfs.append(df)
    out = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
    if out_path:
        out.to_csv(out_path, index=False)
    return out


def volumes_by_id_compare(
        img_paths: Sequence[str],
        labels_ref_path: Optional[str] = None,
        **kwargs) -> "pd.DataFrame":
    """Per-label DSC comparison between two samples' label images
    (reference ``volumes_by_id_compare :1859``)."""
    from magellanmapper_tpu.stats import vols
    labels = [sitk_io.load_registered_img(
        p, RegNames.IMG_LABELS.value) for p in img_paths[:2]]
    return vols.measure_label_overlap(labels[0], labels[1], **kwargs)


def make_label_ids_set(
        labels_img: np.ndarray, max_level: Optional[int] = None,
        labels_ref=None, combine_sides: bool = True) -> np.ndarray:
    """Label IDs to measure (reference ``make_label_ids_set :1534``)."""
    ids = np.unique(labels_img)
    ids = ids[ids != 0]
    if combine_sides:
        ids = np.unique(np.abs(ids))
    return ids


class RegImgs:
    """Registered-image bundle (reference ``register.RegImgs :87``)."""

    def __init__(self, exp_orig=None, exp=None, atlas=None, labels=None,
                 labels_markers=None, borders=None, exp_mask=None,
                 atlas_mask=None):
        self.exp_orig = exp_orig
        self.exp = exp
        self.atlas = atlas
        self.labels = labels
        self.labels_markers = labels_markers
        self.borders = borders
        self.exp_mask = exp_mask
        self.atlas_mask = atlas_mask


def register_repeat(reg_result, img: np.ndarray,
                    preserve_idents: bool = False) -> np.ndarray:
    """Re-apply a completed registration's transform chain to another
    image — the Transformix flow (reference ``register.register_repeat
    :298``). ``preserve_idents`` uses nearest-neighbor so label IDs
    survive."""
    return reg_result.transform_img(
        img, order=0 if preserve_idents else 1)


def overlay_registered_imgs(
        fixed_file: str, moving_file_dir: Optional[str] = None,
        plane: Optional[str] = None, rotate=None,
        name_prefix: Optional[str] = None,
        out_plane: Optional[str] = None, out_path: Optional[str] = None):
    """Overlay previously saved registered images and report DSC
    (reference ``register.overlay_registered_imgs :1442``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from magellanmapper_tpu.atlas import metrics as reg_metrics
    from magellanmapper_tpu.io import np_io, sitk_io
    prefix = name_prefix or fixed_file
    fixed = np_io.read_file(fixed_file).img[0]
    moved = sitk_io.load_registered_img(
        prefix, RegNames.IMG_ATLAS.value)
    dsc = reg_metrics.measure_overlap(
        np.asarray(fixed, np.float32), np.asarray(moved, np.float32))
    z = fixed.shape[0] // 2
    fig, ax = plt.subplots()
    ax.imshow(fixed[z], cmap="gray")
    zm = min(z, moved.shape[0] - 1)
    ax.imshow(moved[zm], cmap="viridis", alpha=0.5)
    ax.set_title(f"DSC {dsc:.3f}")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return dsc


def get_scaled_regionprops(img_region: np.ndarray, scaling):
    """Region properties with bbox/centroid scaled back to experiment
    space (reference ``register.get_scaled_regionprops :1494``)."""
    from magellanmapper_tpu.cv import cv_nd
    props = cv_nd.get_label_props(img_region.astype(np.int8), 1)
    if not props:
        return None, None, None
    prop = props[0]
    ndim = img_region.ndim
    scaling = np.asarray(scaling, float)
    lo = np.divide(prop.bbox[:ndim], scaling)
    hi = np.divide(prop.bbox[ndim:], scaling)
    bbox = tuple(int(round(v)) for v in np.concatenate([lo, hi]))
    centroid = tuple(float(c) for c in
                     np.divide(prop.centroid, scaling))
    return props, bbox, centroid
