"""Atlas curation: mirroring, smoothing, edge extension, import.

Equivalent of ``magmap/atlas/atlas_refiner.py``: ``truncate_labels :53``,
``mirror_planes :88``, ``check_mirrorred :172``, ``find_symmetric_axis
:203``, ``smooth_labels :759`` (+ ``label_smoothing_metric :937``),
``extend_edge :440`` (per-region recursive edge extension, see
``_extend_region``), ``transpose_img :1090``,
``match_atlas_labels :1244``, ``import_atlas :1457``,
``measure_overlap(_labels) :1636/:1728``.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import ndimage as scipy_ndi

from magellanmapper_tpu.atlas import metrics as reg_metrics
from magellanmapper_tpu.cv import cv_nd
from magellanmapper_tpu.io import sitk_io
from magellanmapper_tpu.ops import filters, preproc, resize as resize_ops

_logger = logging.getLogger(__name__)

measure_overlap = reg_metrics.measure_overlap


def truncate_labels(img_np, x_frac=None, y_frac=None, z_frac=None):
    """Zero out voxels outside fractional bounds per axis
    (reference ``:53``)."""
    shape = img_np.shape
    for axis, bound in enumerate((z_frac, y_frac, x_frac)):
        if bound is None:
            continue
        bound_abs = np.multiply(bound, shape[axis]).astype(int)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, bound_abs[0])
        img_np[tuple(sl)] = 0
        sl[axis] = slice(bound_abs[1], None)
        img_np[tuple(sl)] = 0
    return img_np


def mirror_planes(
        img_np: np.ndarray, start: int, mirror_mult: int = 1,
        resize: bool = True, start_dup: Optional[float] = None,
        rand_dup: Optional[int] = None,
        check_equality: bool = False) -> np.ndarray:
    """Mirror across the sagittal midline from plane ``start``
    (reference ``:88``)."""
    if resize:
        shape = img_np.shape
        new_z = start * 2
        if new_z > shape[0]:
            resized = np.zeros((new_z,) + shape[1:], dtype=img_np.dtype)
            resized[:shape[0]] = img_np
            img_np = resized
        else:
            img_np = img_np[:new_z]
    tot_planes = len(img_np)
    if start_dup is not None:
        n = int(start_dup * tot_planes)
        num_planes = start - n
        if rand_dup is not None:
            rng = np.random.RandomState(num_planes)
            dup = (n - np.ceil(rng.rand(num_planes) * rand_dup)).astype(int)
            dup[dup < 0] = 0
        else:
            dup = np.repeat(n - 1, num_planes)
        for i in range(num_planes):
            plane_i = n + i
            if 0 < plane_i < tot_planes:
                img_np[plane_i] = img_np[dup[i]]
    if 0 <= start <= tot_planes:
        remaining = tot_planes - start
        end = start - remaining - 1
        if end < 0:
            end = None
            remaining = start
        img_np[start:start + remaining] = np.multiply(
            img_np[start - 1:end:-1], mirror_mult)
    if check_equality:
        check_mirrorred(img_np, mirror_mult=mirror_mult)
    return img_np


def check_mirrorred(
        img_np: np.ndarray, mirror_mult: int = 1, axis: int = 0
) -> Tuple[bool, bool]:
    """Check symmetry of two halves along ``axis`` (reference ``:172``)."""
    half_len = img_np.shape[axis] // 2
    sl = [slice(None)] * img_np.ndim
    sl[axis] = slice(0, half_len)
    before = img_np[tuple(sl)]
    sl[axis] = slice(img_np.shape[axis], half_len - 1, -1)
    after = img_np[tuple(sl)] / mirror_mult
    eq_vals = np.array_equal(before, after)
    eq_lbls = np.array_equal(np.unique(before), np.unique(after))
    return eq_vals, eq_lbls


def find_symmetric_axis(img_np: np.ndarray, mirror_mult: int = 1) -> int:
    """First axis along which the image is symmetric, or -1
    (reference ``:203``)."""
    for i in range(img_np.ndim):
        if check_mirrorred(img_np, mirror_mult, i)[0]:
            return i
    return -1


def _resize_nearest2d(arr: np.ndarray, shape) -> np.ndarray:
    """Nearest-neighbor 2D resize (skimage ``resize(order=0)`` centers)."""
    i0 = np.minimum(
        ((np.arange(shape[0]) + 0.5) * arr.shape[0] / shape[0]).astype(int),
        arr.shape[0] - 1)
    i1 = np.minimum(
        ((np.arange(shape[1]) + 0.5) * arr.shape[1] / shape[1]).astype(int),
        arr.shape[1] - 1)
    return arr[i0[:, None], i1[None, :]]


def _extend_region(vol_lab, vol_ref, threshold, template, planei, slices,
                   in_paint):
    """Walk one sub-region laterally (decreasing planes), resizing the
    prior plane's label template onto each plane's largest thresholded
    object (reference ``extend_edge`` recursion, ``:440``)."""
    from scipy import ndimage

    while planei >= 0:
        sub_ref = vol_ref[planei][slices] > threshold
        if not np.any(sub_ref):
            break
        comps, n = ndimage.label(sub_ref)
        sizes = ndimage.sum_labels(
            np.ones_like(comps), comps, index=np.arange(1, n + 1))
        largest = int(np.argmax(sizes)) + 1
        objs = ndimage.find_objects(comps == largest)
        rel = objs[0]
        # absolute bbox of this plane's object
        slices = tuple(
            slice(s.start + r.start, s.start + r.stop)
            for s, r in zip(slices, rel))
        shape = tuple(s.stop - s.start for s in slices)
        resized = _resize_nearest2d(template, shape)
        plane_add = resized
        if in_paint and np.any(resized != 0):
            # fill thresholded foreground the template missed (closed
            # ventricles, imperfect edges) — add-only, template unchanged
            fg_thresh = vol_ref[planei][slices] > threshold
            to_fill = fg_thresh & (plane_add == 0)
            if np.any(to_fill):
                plane_add = cv_nd.in_paint(plane_add, to_fill)
                plane_add[~(fg_thresh | (resized != 0))] = 0
        vol_lab[planei][slices] = plane_add
        template = resized
        planei -= 1


def extend_edge(
        labels_img: np.ndarray, atlas_img: np.ndarray,
        threshold: float, plane_start: int, axis: int = 0,
        surr_size: int = 2, in_paint: bool = True) -> np.ndarray:
    """Extend incomplete lateral labels using the atlas histology
    (reference ``extend_edge :440``).

    Per the reference's recursion: at the last labeled lateral plane,
    distinct thresholded sub-regions of the atlas (restricted to a
    ``surr_size``-dilated labeled area) each crop a 2D label template;
    every successive more-lateral plane resizes the prior plane's
    template (order 0) onto its largest thresholded object, optionally
    in-painting uncovered foreground — so labels track the tapering
    specimen edge. Smallest regions extend first so the largest have
    the final say. Interior unlabeled planes (a gap between labeled
    planes, not a lateral tail) refill from the nearest labeled plane
    masked by atlas foreground.
    """
    from scipy import ndimage

    out = np.array(labels_img)
    vol_lab = np.moveaxis(out, axis, 0)
    vol_ref = np.moveaxis(np.asarray(atlas_img), axis, 0)
    n = vol_lab.shape[0]

    labeled = [i for i in range(n) if np.any(vol_lab[i])]
    if not labeled:
        return out

    # lateral tail: planes below the lowest labeled plane (or below the
    # caller's start plane when it is labeled)
    tail_top = labeled[0]
    if 0 < plane_start < n and np.any(vol_lab[plane_start]):
        tail_top = max(tail_top, int(plane_start))
    if tail_top > 0:
        ref_plane = vol_ref[tail_top] > threshold
        if surr_size > 0:
            # only labeled areas (slightly dilated) can seed extension
            lab_fg = ndimage.binary_dilation(
                vol_lab[tail_top] != 0, iterations=int(surr_size))
            ref_plane &= lab_fg
        comps, n_comp = ndimage.label(ref_plane)
        if n_comp:
            sizes = ndimage.sum_labels(
                np.ones_like(comps), comps,
                index=np.arange(1, n_comp + 1))
            order = np.argsort(sizes) + 1        # smallest first
            for ci in order:
                objs = ndimage.find_objects(comps == ci)
                slices = objs[0]
                template = np.array(vol_lab[tail_top][slices])
                if not np.any(template):
                    continue
                _extend_region(
                    vol_lab, vol_ref, threshold, template,
                    tail_top - 1, slices, in_paint)

    # interior gaps: nearest labeled plane masked by atlas foreground
    labeled = [i for i in range(n) if np.any(vol_lab[i])]
    for i in range(n):
        if np.any(vol_lab[i]):
            continue
        fg = vol_ref[i] > threshold
        if not np.any(fg) or not labeled:
            continue
        nearest = min(labeled, key=lambda j: abs(j - i))
        dst = vol_lab[i]
        dst[fg] = vol_lab[nearest][fg]
        missing = fg & (dst == 0)
        if np.any(missing) and np.any(dst != 0):
            filled = cv_nd.in_paint(dst, dst == 0)
            dst[missing] = filled[missing]
    return out


def smooth_labels(
        labels_img_np: np.ndarray, filter_size: int = 3,
        mode: str = "opening", metrics: bool = False,
        spacing: Optional[Sequence[float]] = None
) -> Tuple[Optional[pd.DataFrame], Optional[pd.DataFrame]]:
    """Smooth each label (largest first) with morphological filters
    (reference ``smooth_labels :759``). Modifies in place."""
    if not filter_size:
        return None, None
    orig = np.copy(labels_img_np)
    fn_selem = cv_nd.get_selem(labels_img_np.ndim)
    label_ids = np.unique(labels_img_np)
    label_ids = label_ids[label_ids != 0]
    sizes = {lid: int(np.sum(labels_img_np == lid)) for lid in label_ids}
    ordered = sorted(sizes, key=sizes.get, reverse=True)

    for lid in ordered:
        bbox = cv_nd.get_label_bbox(labels_img_np, lid)
        if bbox is None:
            continue
        slices = tuple(cv_nd.get_bbox_region(
            bbox, int(np.ceil(2 * filter_size)), labels_img_np.shape))
        region = labels_img_np[slices]
        mask = region == lid
        size = mask.sum()
        if size == 0:
            continue
        if mode in ("opening", "adaptive_opening"):
            selem_size = filter_size
            if size < 5000:
                selem_size = max(1, filter_size // 2)
            selem = fn_selem(selem_size)
            smoothed = scipy_ndi.binary_opening(mask, structure=selem)
            if smoothed.sum() / size < 0.01:
                smoothed = scipy_ndi.binary_closing(mask, structure=selem)
            region = cv_nd.in_paint(region, mask)
        elif mode == "gaussian":
            smoothed = np.asarray(filters.gaussian_filter(
                jnp.asarray(mask.astype(np.float32)), filter_size,
                mode="nearest")) > 0.5
            region = cv_nd.in_paint(region, mask)
        elif mode == "closing":
            smoothed = scipy_ndi.binary_closing(
                mask, structure=fn_selem(filter_size))
            region = cv_nd.in_paint(region, mask)
        else:
            raise ValueError(f"unknown smoothing mode: {mode}")
        region[smoothed] = lid
        labels_img_np[slices] = region

    df_aggr = df_raw = None
    if metrics:
        df_aggr, df_raw = label_smoothing_metric(
            orig, labels_img_np, filter_size, spacing)
    return df_aggr, df_raw


def label_smoothing_metric(
        orig_img_np: np.ndarray, smoothed_img_np: np.ndarray,
        filter_size=None, spacing=None
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Smoothing quality: compaction, displacement, SA:vol
    (reference ``label_smoothing_metric :937``)."""
    if spacing is None:
        spacing = (1.0,) * orig_img_np.ndim
    label_ids = np.unique(orig_img_np)
    label_ids = label_ids[label_ids != 0]
    rows = []
    for lid in label_ids:
        m_orig = orig_img_np == lid
        m_smooth = smoothed_img_np == lid
        vol_orig = m_orig.sum()
        vol_smooth = m_smooth.sum()
        if vol_orig == 0:
            continue
        comp_orig, sa_orig, _ = cv_nd.compactness_3d(m_orig, spacing)
        if vol_smooth > 0:
            comp_sm, sa_sm, _ = cv_nd.compactness_3d(m_smooth, spacing)
            compaction = (comp_orig - comp_sm) / comp_orig
            displ = np.sum(m_smooth & ~m_orig) / vol_smooth
            sa_vol = sa_sm / vol_smooth
        else:
            compaction = displ = sa_vol = np.nan
        rows.append({
            "Region": lid, "Volume": int(vol_orig),
            "VolumeSmoothed": int(vol_smooth),
            "Compaction": compaction, "Displacement": displ,
            "SmoothingQuality": compaction - displ,
            "SA_to_vol": sa_vol, "Filter": filter_size})
    df_raw = pd.DataFrame(rows)
    if len(df_raw):
        wts = df_raw["Volume"].to_numpy(dtype=float)
        aggr = {
            c: float(np.nansum(df_raw[c] * wts) / wts.sum())
            for c in ("Compaction", "Displacement", "SmoothingQuality")}
        aggr["Filter"] = filter_size
        df_aggr = pd.DataFrame([aggr])
    else:
        df_aggr = pd.DataFrame()
    return df_aggr, df_raw


def measure_overlap_labels(labels_a: np.ndarray, labels_b: np.ndarray
                           ) -> float:
    """DSC of two labels images' foreground (reference ``:1728``)."""
    return float(reg_metrics.dice(
        jnp.asarray(np.asarray(labels_a) != 0),
        jnp.asarray(np.asarray(labels_b) != 0)))


def measure_overlap_combined_labels(
        atlas_img: np.ndarray, labels_img: np.ndarray,
        thresh: Optional[float] = None) -> float:
    """DSC between atlas foreground and combined labels foreground
    (reference ``:1787``)."""
    import jax.numpy as jnp_
    if thresh is None:
        thresh = float(np.asarray(preproc.otsu_threshold(
            jnp_.asarray(np.asarray(atlas_img, np.float32)))))
    return float(reg_metrics.dice(
        jnp_.asarray(atlas_img > thresh),
        jnp_.asarray(np.asarray(labels_img) != 0)))


def transpose_img(
        med: sitk_io.MedImage, plane: Optional[str] = None,
        rotate_deg: Optional[float] = None,
        rescale: Optional[float] = None,
        target_size: Optional[Sequence[int]] = None,
        order: int = 1) -> sitk_io.MedImage:
    """Transpose/rescale/rotate a medical image
    (reference ``atlas_refiner.transpose_img :1090``)."""
    img = np.asarray(med.img)
    spacing = list(med.spacing)
    if plane in ("xz", "yz"):
        # zyx -> swap axes for plane reorientation
        if plane == "xz":
            img = np.swapaxes(img, 0, 1)
            spacing = [spacing[1], spacing[0], spacing[2]]
        else:
            img = np.swapaxes(img, 0, 2)
            spacing = [spacing[2], spacing[1], spacing[0]]
    if rotate_deg:
        img = scipy_ndi.rotate(
            img, rotate_deg, axes=(1, 2), reshape=False, order=order)
    if rescale:
        img = np.asarray(resize_ops.rescale(
            jnp.asarray(img.astype(np.float32)), rescale, order=order))
        spacing = [s / rescale for s in spacing]
    elif target_size is not None:
        factors = np.divide(target_size, img.shape[:3])
        img = np.asarray(resize_ops.resize(
            jnp.asarray(img.astype(np.float32)), target_size, order=order))
        spacing = list(np.divide(spacing, factors))
    return sitk_io.MedImage(
        img.astype(med.img.dtype) if order == 0 else img,
        tuple(spacing), med.origin, dict(med.meta))


def match_atlas_labels(
        atlas: sitk_io.MedImage, labels: sitk_io.MedImage,
        profile) -> Tuple[sitk_io.MedImage, sitk_io.MedImage, Dict]:
    """Apply profile curation to an atlas/labels pair and measure quality
    (reference ``match_atlas_labels :1244``)."""
    atlas_np = np.asarray(atlas.img)
    labels_np = np.array(labels.img)
    mirror = profile["labels_mirror"] or {}
    edge = profile["labels_edge"] or {}
    metrics_out: Dict[str, float] = {}

    thresh = profile["atlas_threshold"]
    if edge.get("active"):
        start = edge.get("start")
        start_i = int(start * labels_np.shape[0]) if start else 0
        labels_np = extend_edge(labels_np, atlas_np, thresh, start_i)
    if mirror.get("active"):
        start = mirror.get("start")
        start_i = (int(start * labels_np.shape[0]) if start is not None
                   else labels_np.shape[0] // 2)
        mult = -1 if mirror.get("neg_labels", True) else 1
        labels_np = mirror_planes(labels_np, start_i, mirror_mult=mult)
        if mirror.get("atlas_mirror", True):
            atlas_np = mirror_planes(
                np.array(atlas_np), start_i, mirror_mult=1)
    smooth = profile["smooth"]
    if smooth:
        smooth_labels(labels_np, smooth, profile["smoothing_mode"])

    # quality metrics
    metrics_out["DSC_atlas_labels"] = measure_overlap_combined_labels(
        atlas_np, labels_np)
    fg = atlas_np > (thresh if thresh else 0)
    lbl = labels_np != 0
    metrics_out["Vol_atlas"] = int(fg.sum())
    metrics_out["Vol_labels"] = int(lbl.sum())
    metrics_out["Frac_unlabeled_fg"] = (
        float(np.sum(fg & ~lbl) / fg.sum()) if fg.sum() else np.nan)

    atlas_out = sitk_io.MedImage(
        atlas_np, atlas.spacing, atlas.origin, dict(atlas.meta))
    labels_out = sitk_io.MedImage(
        labels_np, labels.spacing, labels.origin, dict(labels.meta))
    return atlas_out, labels_out, metrics_out


def import_atlas(
        atlas_dir: str, profile, show: bool = False,
        prefix: Optional[str] = None) -> Dict[str, str]:
    """Import and curate an atlas directory
    (reference ``import_atlas :1457``): loads ``atlasVolume`` +
    ``annotation``, applies curation, writes the registered set +
    metrics CSV."""
    atlas = sitk_io.read_med_img(sitk_io.find_sitk_file(
        os.path.join(atlas_dir, "atlasVolume")))
    labels = sitk_io.read_med_img(sitk_io.find_sitk_file(
        os.path.join(atlas_dir, "annotation")))
    atlas_out, labels_out, metr = match_atlas_labels(
        atlas, labels, profile)
    name = prefix or (os.path.basename(
        atlas_dir.rstrip(os.sep)) + "_imported")
    out_dir = prefix and os.path.dirname(prefix) or atlas_dir
    base = os.path.join(out_dir, os.path.basename(name))
    paths = sitk_io.write_reg_images(
        {"atlasVolume.mhd": atlas_out, "annotation.mhd": labels_out},
        base + ".mhd")
    df = pd.DataFrame([metr])
    csv_path = base + "_metrics.csv"
    df.to_csv(csv_path, index=False)
    paths["metrics"] = csv_path
    return paths


def crop_to_orig(labels_img_np_orig: np.ndarray,
                 labels_img_np: np.ndarray, crop) -> None:
    """Zero new labels outside the original labels' extent, in place;
    ``crop > 0`` opens the background mask by a ball of that radius
    first (reference ``atlas_refiner.crop_to_orig :650``)."""
    if crop is False:
        return
    mask = labels_img_np_orig == 0
    if crop and crop > 0:
        import jax.numpy as _jnp
        from magellanmapper_tpu.ops import filters as _filters
        fp = _filters.ball_footprint(int(crop))
        er = np.asarray(_filters.erosion(
            _jnp.asarray(mask.astype(np.float32)), fp)) > 0.5
        mask = np.asarray(_filters.dilation(
            _jnp.asarray(er.astype(np.float32)), fp)) > 0.5
    labels_img_np[mask] = 0


def find_labels_lost(label_ids_orig: np.ndarray, label_ids: np.ndarray,
                     label_img_np_orig: Optional[np.ndarray] = None
                     ) -> np.ndarray:
    """IDs present originally but missing after refinement; logs lost
    region sizes when the original image is given
    (reference ``atlas_refiner.find_labels_lost :734``)."""
    label_ids_orig = np.asarray(label_ids_orig)
    lost = label_ids_orig[np.isin(
        label_ids_orig, np.asarray(label_ids), invert=True)]
    if label_img_np_orig is not None:
        for lid in lost:
            _logger.info(
                "lost label %s covered %d voxels", lid,
                int(np.sum(label_img_np_orig == lid)))
    return lost


def make_labels_fg(labels_img: np.ndarray) -> np.ndarray:
    """Binary foreground of a labels image (nonzero -> 1)
    (reference ``atlas_refiner.make_labels_fg :1768``)."""
    fg = np.asarray(labels_img).copy()
    fg[fg != 0] = 1
    return fg


def aggr_smoothing_metrics(df_pxs: pd.DataFrame) -> pd.DataFrame:
    """Aggregate per-label smoothing stats, volume-weighted
    (reference ``atlas_refiner.aggr_smoothing_metrics :1037``)."""
    from magellanmapper_tpu.io import df_io
    from magellanmapper_tpu.settings.config import SmoothingMetrics as SM
    wt_col = "Vol_orig" if "Vol_orig" in df_pxs.columns else None
    row = {}
    for key in (SM.FILTER_SIZE, SM.COMPACTION, SM.DISPLACEMENT,
                SM.SM_QUALITY, SM.COMPACTNESS):
        col = key.value
        if col not in df_pxs.columns:
            continue
        vals = df_pxs[col].to_numpy(dtype=float)
        if wt_col:
            row[col] = [df_io.weight_mean(
                vals, df_pxs[wt_col].to_numpy(dtype=float))]
        else:
            row[col] = [np.nanmean(vals)]
    return pd.DataFrame(row)


def measure_atlas_refinement(
        metrics_dict, img_atlas: np.ndarray, img_labels: np.ndarray,
        atlas_profile=None, path: Optional[str] = None) -> pd.DataFrame:
    """Overall refinement metrics: atlas/labels DSC and total volumes,
    merged with accumulated per-step metrics
    (reference ``atlas_refiner.measure_atlas_refinement :1595``)."""
    from magellanmapper_tpu.atlas import metrics as reg_metrics
    from magellanmapper_tpu.io import df_io
    thresh = None
    if atlas_profile is not None:
        thresh = atlas_profile["atlas_threshold_all"]
    fg_atlas = img_atlas > (
        thresh if thresh is not None else np.mean(img_atlas))
    fg_labels = img_labels != 0
    metrics_dict = dict(metrics_dict or {})
    metrics_dict.setdefault(
        "DSC_atlas_labels",
        [float(reg_metrics.dice(fg_atlas, fg_labels))])
    metrics_dict.setdefault("Vol_atlas", [int(fg_atlas.sum())])
    metrics_dict.setdefault("Vol_labels", [int(fg_labels.sum())])
    df = df_io.dict_to_data_frame(metrics_dict)
    if path:
        df.to_csv(path, index=False)
    return df
