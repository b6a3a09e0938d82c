"""Segmentation: watershed, random walker, label markers (JAX kernels).

Equivalent of ``magmap/cv/segmenter.py``. The two native solvers the
reference borrows (skimage ``watershed`` C priority-flood and
``random_walker`` with pyamg CG) become device-iterative programs:

 - **watershed**: minimax-path flooding — each sweep relaxes every voxel
   against its 6 neighbors (``cost' = min(cost, max(neigh_cost,
   elevation))``), run under ``lax.while_loop`` until no change. With
   compactness, a seed-distance penalty approximates scikit-image's
   compact watershed.
 - **random walker**: matrix-free conjugate gradient on the grid-graph
   Laplacian with intensity-based edge weights; seeds enter as Dirichlet
   boundary conditions via masking.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as scipy_ndi

from magellanmapper_tpu.cv import cv_nd
from magellanmapper_tpu.ops import filters, peaks as peaks_ops, preproc


def _neighbor_shift(arr, ax, direction, fill):
    """Shift with edge fill, static axis/direction."""
    n = arr.shape[ax]
    pad = [(0, 0)] * arr.ndim
    pad[ax] = (1, 0) if direction > 0 else (0, 1)
    sl = [slice(None)] * arr.ndim
    sl[ax] = slice(0, n) if direction > 0 else slice(1, n + 1)
    padded = jnp.pad(arr, pad, mode="constant", constant_values=fill)
    return padded[tuple(sl)]


@functools.partial(jax.jit, static_argnames=("compactness", "max_iters"))
def _watershed_flood(
        elevation: jnp.ndarray, markers: jnp.ndarray,
        mask: jnp.ndarray, compactness: float = 0.0,
        max_iters: int = 4096):
    """Minimax-path label flooding (device watershed)."""
    inf = jnp.float32(jnp.inf)
    elev = elevation.astype(jnp.float32)
    have_seed = markers > 0
    cost = jnp.where(have_seed, elev, inf)
    labels = markers.astype(jnp.int32)
    ndim = elev.ndim
    coords = jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in elev.shape],
        indexing="ij"))
    seed_pos = jnp.where(have_seed[None], coords, 0.0)

    def body(state):
        cost, labels, seed_pos, changed, it = state
        best_cost = cost
        best_labels = labels
        best_seed = seed_pos
        for ax in range(ndim):
            for d in (1, -1):
                n_cost = _neighbor_shift(cost, ax, d, jnp.inf)
                n_lab = _neighbor_shift(labels, ax, d, 0)
                n_seed = jnp.stack([
                    _neighbor_shift(seed_pos[i], ax, d, 0.0)
                    for i in range(ndim)])
                cand = jnp.maximum(n_cost, elev)
                if compactness:
                    d2 = jnp.sum((coords - n_seed) ** 2, axis=0)
                    cand = cand + jnp.float32(compactness) * d2
                take = (cand < best_cost) & mask & (n_lab > 0)
                best_cost = jnp.where(take, cand, best_cost)
                best_labels = jnp.where(take, n_lab, best_labels)
                best_seed = jnp.where(take[None], n_seed, best_seed)
        changed = jnp.any(best_labels != labels) | jnp.any(
            best_cost != cost)
        return best_cost, best_labels, best_seed, changed, it + 1

    def cond(state):
        _, _, _, changed, it = state
        return changed & (it < max_iters)

    state = (cost, labels, seed_pos, jnp.bool_(True), jnp.int32(0))
    _, labels, _, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.where(mask, labels, 0)


def watershed(
        elevation: np.ndarray, markers: np.ndarray,
        mask: Optional[np.ndarray] = None,
        compactness: float = 0.0) -> np.ndarray:
    """Watershed of ``elevation`` from integer ``markers``
    (skimage ``segmentation.watershed`` surface)."""
    if mask is None:
        mask = np.ones(elevation.shape, bool)
    return np.asarray(_watershed_flood(
        jnp.asarray(elevation, jnp.float32), jnp.asarray(markers, np.int32),
        jnp.asarray(mask), float(compactness)))


def watershed_distance(
        foreground: np.ndarray, markers: Optional[np.ndarray] = None,
        num_peaks: float = np.inf, compactness: float = 0.0,
        mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Watershed on distance-from-background
    (reference ``segmenter.watershed_distance :597``)."""
    distance = cv_nd.distance_transform_edt(foreground)
    if markers is None:
        is_peak = np.asarray(
            peaks_ops.max_filter_full(jnp.asarray(distance))) == distance
        is_peak &= foreground.astype(bool)
        if np.isfinite(num_peaks):
            vals = np.where(is_peak, distance, -np.inf).ravel()
            order = np.argsort(vals)[::-1][:int(num_peaks)]
            keep = np.zeros(is_peak.size, bool)
            keep[order[vals[order] > -np.inf]] = True
            is_peak &= keep.reshape(is_peak.shape)
        markers, _ = scipy_ndi.label(is_peak)
    return watershed(-distance, markers, mask=mask, compactness=compactness)


# ---------------------------------------------------------------------------
# random walker


@functools.partial(jax.jit, static_argnames=("beta", "iters"))
def _random_walker_cg(
        img: jnp.ndarray, seeds_fg: jnp.ndarray, seeds_bg: jnp.ndarray,
        beta: float = 50.0, iters: int = 200):
    """Probability of foreground via CG on the grid Laplacian."""
    img = img.astype(jnp.float32)
    rng = jnp.maximum(jnp.max(img) - jnp.min(img), 1e-6)
    norm = (img - jnp.min(img)) / rng
    ndim = img.ndim

    ws = []
    for ax in range(ndim):
        diff = jnp.diff(norm, axis=ax)
        ws.append(jnp.exp(-beta * diff * diff))

    fixed = seeds_fg | seeds_bg
    x0 = jnp.where(seeds_fg, 1.0, 0.0)

    def lap(x):
        """(L x)_v = sum_n w_vn (x_v - x_n) over the 6-neighborhood."""
        out = jnp.zeros_like(x)
        for ax in range(ndim):
            w = ws[ax]
            d = jnp.diff(x, axis=ax) * w
            pad_lo = [(0, 0)] * ndim
            pad_lo[ax] = (1, 0)
            pad_hi = [(0, 0)] * ndim
            pad_hi[ax] = (0, 1)
            out = out + jnp.pad(d, pad_hi) - jnp.pad(d, pad_lo)
        return -out  # L = D - W convention: positive semidefinite

    free = ~fixed

    def a_op(x):
        # operator restricted to free nodes (fixed nodes contribute via b)
        return jnp.where(free, lap(jnp.where(free, x, 0.0)), 0.0)

    b = jnp.where(free, -lap(jnp.where(fixed, x0, 0.0)), 0.0)

    def cg_step(state, _):
        x, r, p, rs = state
        ap = a_op(p)
        denom = jnp.sum(p * ap)
        alpha = rs / jnp.maximum(denom, 1e-12)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, 1e-12)) * p
        return (x, r, p, rs_new), None

    x = jnp.zeros_like(x0)
    r = b - a_op(x)
    (x, _, _, _), _ = jax.lax.scan(
        cg_step, (x, r, r, jnp.sum(r * r)), None, length=iters)
    return jnp.where(fixed, x0, x)


def segment_rw(
        roi: np.ndarray, channel: Optional[Sequence[int]] = None,
        beta: float = 50.0, vmin: float = 0.6, vmax: float = 0.65,
        remove_small: Optional[int] = None,
        erosion: Optional[int] = None,
        blobs: Optional[np.ndarray] = None,
        get_labels: bool = False) -> List[np.ndarray]:
    """Random-walker segmentation (reference ``segmenter.segment_rw :55``).

    Marker convention matches the reference: label 1 = foreground
    (``>= vmax``), 2 = background (``< vmin``); returns per-channel masks
    where 1 = foreground, 2 = background.
    """
    multichannel = roi.ndim > 3
    channels = (range(roi.shape[3]) if multichannel else [0]) \
        if channel is None else np.atleast_1d(channel)
    out = []
    for chl in channels:
        seg = roi[..., chl] if multichannel else roi
        seg = np.asarray(seg, np.float32)
        if blobs is None:
            seeds_fg = seg >= vmax
            seeds_bg = seg < vmin
        else:
            seeds_fg = np.zeros(seg.shape, bool)
            coords = np.clip(blobs[:, :3].astype(int), 0,
                             np.asarray(seg.shape) - 1)
            seeds_fg[tuple(coords.T)] = True
            seeds_bg = seg < np.percentile(seg, 25)
            seeds_bg &= ~seeds_fg
        prob = np.asarray(_random_walker_cg(
            jnp.asarray(seg), jnp.asarray(seeds_fg), jnp.asarray(seeds_bg),
            float(beta)))
        walker = np.where(prob >= 0.5, 1, 2).astype(np.uint8)
        if remove_small:
            labeled, _ = scipy_ndi.label(walker == 1)
            counts = np.bincount(labeled.ravel())
            small = np.flatnonzero(counts < remove_small)
            walker[np.isin(labeled, small[small != 0])] = 2
        if erosion:
            fp = filters.octahedron_footprint(erosion)
            walker = np.asarray(filters.erosion(
                jnp.asarray(walker.astype(np.float32)), fp)).astype(np.uint8)
        if get_labels:
            labeled, _ = scipy_ndi.label(walker == 1)
            out.append(labeled)
        else:
            out.append(walker)
    return out


def segment_ws(
        roi: np.ndarray, channel: Optional[Sequence[int]] = None,
        thresholded: Optional[np.ndarray] = None,
        blobs: Optional[np.ndarray] = None) -> np.ndarray:
    """Compact watershed from Otsu/distance peaks or blob markers
    (reference ``segmenter.segment_ws :130``)."""
    multichannel = roi.ndim > 3
    channels = (range(roi.shape[3]) if multichannel else [0]) \
        if channel is None else np.atleast_1d(channel)
    labels_ws = None
    for chl in channels:
        seg = roi[..., chl] if multichannel else roi
        if thresholded is None:
            thresh = float(np.asarray(preproc.otsu_threshold(
                jnp.asarray(np.asarray(seg, np.float32)))))
            fg = np.asarray(seg) > thresh
        else:
            fg = np.asarray(thresholded).astype(bool)
        if blobs is None:
            markers = None
        else:
            markers = _markers_from_blobs(fg, blobs)
        labels_ws = watershed_distance(fg, markers, compactness=0.1)
    return labels_ws


def _markers_from_blobs(shape_src: np.ndarray, blobs: np.ndarray
                        ) -> np.ndarray:
    """Label markers at blob centers (reference ``_markers_from_blobs``)."""
    markers = np.zeros(np.asarray(shape_src).shape, dtype=np.int32)
    coords = np.clip(
        blobs[:, :3].astype(int), 0, np.asarray(markers.shape) - 1)
    markers[tuple(coords.T)] = np.arange(1, len(blobs) + 1)
    return markers


def labels_to_markers_blob(labels_img: np.ndarray) -> np.ndarray:
    """Shrink each label to an ellipsoid marker at its centroid
    (reference ``segmenter.labels_to_markers_blob :190``)."""
    markers = np.zeros_like(labels_img)
    label_ids = np.unique(labels_img)
    label_ids = label_ids[label_ids != 0]
    for lid in label_ids:
        mask = labels_img == lid
        coords = np.argwhere(mask)
        centroid = coords.mean(axis=0)
        # ellipsoid radii ~ 1/5 of the label extent per axis, min 1
        radii = np.maximum(
            (coords.max(axis=0) - coords.min(axis=0) + 1) / 5.0, 1.0)
        zz, yy, xx = np.indices(labels_img.shape)
        ell = (((zz - centroid[0]) / radii[0]) ** 2
               + ((yy - centroid[1]) / radii[1]) ** 2
               + ((xx - centroid[2]) / radii[2]) ** 2) <= 1
        markers[ell & mask] = lid
    return markers


def labels_to_markers_erosion(
        labels_img: np.ndarray, filter_size: int = 8,
        min_filter_size: Optional[int] = None,
        use_min_filter: bool = False,
        skel_eros_filt_size: Optional[int] = None,
        ) -> Tuple[np.ndarray, list]:
    """Erode each label into an interior marker with adaptive sizing
    (reference ``segmenter.LabelToMarkerErosion``/``labels_to_markers_erosion``
    ``:228-487``, host per-label loop on bounding boxes).

    Shrinks the filter when erosion would remove too much of a label
    (< 20% retained) and records per-label stats.
    """
    if min_filter_size is None:
        min_filter_size = max(1, filter_size - 2)
    markers = np.zeros_like(labels_img)
    stats = []
    label_ids = np.unique(labels_img)
    label_ids = label_ids[label_ids != 0]
    for lid in label_ids:
        bbox = cv_nd.get_label_bbox(labels_img, lid)
        if bbox is None:
            continue
        slices = tuple(cv_nd.get_bbox_region(
            bbox, padding=1, img_shape=labels_img.shape))
        region = labels_img[slices] == lid
        size_orig = region.sum()
        fsize = filter_size
        eroded = region
        while fsize >= 1:
            selem = cv_nd.get_selem(labels_img.ndim)(fsize)
            cand = scipy_ndi.binary_erosion(region, structure=selem)
            if cand.sum() >= max(0.2 * size_orig, 1):
                eroded = cand
                break
            fsize -= 1
            if fsize < min_filter_size and not use_min_filter:
                # keep original region when erosion is too destructive
                eroded = region
                break
        markers[slices][eroded] = lid
        stats.append((int(lid), int(size_orig), int(eroded.sum()), fsize))
    return markers, stats


def mask_atlas(atlas_img: np.ndarray, labels_img: np.ndarray) -> np.ndarray:
    """Foreground mask combining atlas threshold and label extent
    (reference ``segmenter.mask_atlas :489``)."""
    thresh = float(np.asarray(preproc.otsu_threshold(
        jnp.asarray(np.asarray(atlas_img, np.float32)))))
    return (atlas_img > thresh) | (labels_img != 0)


def segment_from_labels(
        edges: np.ndarray, markers: np.ndarray, labels_img: np.ndarray,
        atlas_img: Optional[np.ndarray] = None,
        exclude_labels: Optional[Sequence[int]] = None,
        mask_filt: str = "opening", mask_filt_size: int = 2) -> np.ndarray:
    """Watershed the labels onto an edge image
    (reference ``segmenter.segment_from_labels :513``)."""
    if atlas_img is not None and labels_img is not None:
        mask = mask_atlas(atlas_img, labels_img)
    elif atlas_img is not None:
        _, mask = cv_nd.carve(atlas_img, holes_area=5000)
    else:
        mask = labels_img != 0
        if mask_filt_size and mask_filt in ("opening", "closing"):
            selem = cv_nd.get_selem(labels_img.ndim)(mask_filt_size)
            op = (scipy_ndi.binary_opening if mask_filt == "opening"
                  else scipy_ndi.binary_closing)
            mask = op(mask, structure=selem)
    exclude = None
    markers = np.array(markers)
    if exclude_labels is not None:
        exclude = np.isin(labels_img, exclude_labels)
        mask = mask & ~exclude
        markers[np.isin(markers, exclude_labels)] = 0
    ws = watershed(edges == 0, markers, mask=mask, compactness=0.005)
    if exclude is not None:
        ws[exclude] = labels_img[exclude]
    return ws


class LabelToMarkerErosion:
    """Facade over per-label erosion markers (reference
    ``segmenter.LabelToMarkerErosion :228``). The reference erodes
    labels in forked workers sharing class-attribute state; here the
    batched host loop in :func:`labels_to_markers_erosion` covers all
    labels, so this class only mirrors the configuration surface."""

    def __init__(self, labels_img: np.ndarray, wt_dists=None):
        self.labels_img = labels_img
        self.wt_dists = wt_dists

    def erode_labels(self, filter_size: int = 8, **kwargs):
        """Erode all labels to markers; returns (markers, stats)."""
        return labels_to_markers_erosion(
            self.labels_img, filter_size, **kwargs)


class SubSegmenter:
    """Facade over edge-based label sub-segmentation (reference
    ``segmenter.SubSegmenter :633``); delegates to
    :func:`magellanmapper_tpu.atlas.edge_seg.make_sub_segmented_labels`.
    """

    def __init__(self, labels_img_np: np.ndarray, atlas_edge: np.ndarray):
        self.labels_img_np = labels_img_np
        self.atlas_edge = atlas_edge

    def sub_segment(self, sub_seg_mult: int = 100) -> np.ndarray:
        from magellanmapper_tpu.atlas import edge_seg
        return edge_seg.make_sub_segmented_labels(
            self.labels_img_np, self.atlas_edge, sub_seg_mult)


def sub_segment_labels(labels_img_np: np.ndarray,
                       atlas_edge: np.ndarray) -> np.ndarray:
    """Sub-segment labels along anatomical edge boundaries; sub-labels
    are ``label * 100 + k`` (reference
    ``segmenter.sub_segment_labels :755``)."""
    return SubSegmenter(labels_img_np, atlas_edge).sub_segment()
