"""Edge-aware atlas reannotation.

Equivalent of ``magmap/atlas/edge_seg.py``: ``make_edge_images :53``
(atlas -> LoG -> zero-crossing edges -> distance maps),
``erode_labels :196`` (markers/interiors), ``edge_aware_segmentation
:245`` (watershed of labels onto atlas edges with symmetric-axis
half-image processing + mirroring), ``edge_distances :516``.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.atlas import atlas_refiner
from magellanmapper_tpu.cv import cv_nd, segmenter

_logger = logging.getLogger(__name__)


def make_edge_images(
        atlas_img: np.ndarray, labels_img: Optional[np.ndarray] = None,
        log_sigma: float = 5.0,
        atlas_threshold: Optional[float] = None
) -> Dict[str, np.ndarray]:
    """Build edge/distance images from an atlas
    (reference ``make_edge_images :53``).

    Returns dict with ``atlas_log`` (LoG image), ``atlas_edge``
    (zero-crossing edges), ``dist_to_edge`` (EDT from edges), and, when
    labels are given, ``labels_edge`` (label perimeters).
    """
    log_img = cv_nd.laplacian_of_gaussian_img(
        atlas_img, sigma=log_sigma, labels_img=labels_img,
        thresh=atlas_threshold)
    # zero crossings of the raw (uninverted) LoG are the edges
    import jax.numpy as jnp
    from magellanmapper_tpu.ops import filters as ops_filters
    raw_log = np.asarray(ops_filters.gaussian_laplace(
        jnp.asarray(np.asarray(atlas_img, np.float32)), log_sigma))
    edges = cv_nd.zero_crossing(raw_log, 1).astype(np.uint8)
    if labels_img is not None:
        # limit edges to the labeled region
        edges[labels_img == 0] = 0
    dist_to_edge = cv_nd.distance_transform_edt(edges == 0)
    out = {
        "atlas_log": log_img,
        "atlas_edge": edges,
        "dist_to_edge": dist_to_edge,
    }
    if labels_img is not None:
        out["labels_edge"] = cv_nd.perimeter_nd(
            labels_img != 0).astype(np.uint8)
    return out


def erode_labels(
        labels_img: np.ndarray, filter_size: int = 8,
        min_filter_size: Optional[int] = None,
        use_min_filter: bool = False
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Erode labels into watershed markers + interiors
    (reference ``erode_labels :196``)."""
    markers, stats = segmenter.labels_to_markers_erosion(
        labels_img, filter_size, min_filter_size, use_min_filter)
    interior = np.where(markers != 0, labels_img, 0)
    return markers, interior, stats


def edge_aware_segmentation(
        atlas_img: np.ndarray, labels_img: np.ndarray,
        markers: Optional[np.ndarray] = None,
        erosion_size: int = 8,
        mirror_axis: Optional[int] = None,
        mirror_mult: int = -1,
        log_sigma: float = 5.0) -> Tuple[np.ndarray, Dict[str, float]]:
    """Reannotate labels by watershedding onto atlas edges
    (reference ``edge_aware_segmentation :245``).

    When ``mirror_axis`` is given (or detected), segments the first half
    and mirrors the result — matching the reference's symmetric-atlas
    handling (``:319-358``).

    Returns the reannotated labels and quality metrics (DSC orig vs new).
    """
    if mirror_axis is None:
        mirror_axis = atlas_refiner.find_symmetric_axis(
            labels_img, mirror_mult)
    edge_imgs = make_edge_images(atlas_img, labels_img, log_sigma)
    edges = edge_imgs["atlas_edge"]

    def segment_block(atl, lbl):
        mk = markers
        if mk is None:
            mk, _, _ = erode_labels(lbl, erosion_size)
        else:
            mk = np.where(lbl != 0, mk, 0)
        edge_block = edges[
            tuple(slice(0, s) for s in lbl.shape)] if lbl.shape != \
            edges.shape else edges
        return segmenter.segment_from_labels(edge_block, mk, lbl)

    if mirror_axis == 0 and labels_img.shape[0] % 2 == 0:
        half = labels_img.shape[0] // 2
        seg_half = segment_block(
            atlas_img[:half], labels_img[:half])
        seg = np.concatenate(
            [seg_half, (seg_half[::-1] * mirror_mult)], axis=0)
    else:
        seg = segment_block(atlas_img, labels_img)

    dsc = atlas_refiner.measure_overlap_labels(labels_img, seg)
    # per-voxel agreement between orig and reannotated labels
    nonzero = labels_img != 0
    agree = float(np.mean(seg[nonzero] == labels_img[nonzero])) \
        if nonzero.any() else np.nan
    return seg, {"DSC_orig_new": dsc, "VoxAgreement": agree}


def edge_distances(
        labels_edge: np.ndarray, atlas_edge: np.ndarray,
        spacing: Optional[Sequence[float]] = None
) -> Tuple[np.ndarray, float]:
    """Distance from each label-edge voxel to the nearest atlas edge
    (reference ``edge_distances :516``)."""
    dist = cv_nd.distance_transform_edt(
        np.asarray(atlas_edge) == 0, sampling=spacing)
    dist_at_edges = np.where(labels_edge != 0, dist, 0)
    n = np.count_nonzero(labels_edge)
    mean_dist = float(dist_at_edges.sum() / n) if n else np.nan
    return dist_at_edges, mean_dist


def make_sub_segmented_labels(
        labels_img: np.ndarray, atlas_edge: np.ndarray,
        sub_seg_mult: int = 100) -> np.ndarray:
    """Sub-parcellate each label along anatomic edges
    (reference ``make_sub_segmented_labels :544``; sub-labels are
    ``label_id * sub_seg_mult + k``)."""
    from scipy import ndimage as scipy_ndi
    out = np.zeros_like(labels_img)
    for lid in np.unique(labels_img):
        if lid == 0:
            continue
        mask = labels_img == lid
        # split the label by edges, component-wise
        interior = mask & (atlas_edge == 0)
        comp, n = scipy_ndi.label(interior)
        sub = np.where(mask, np.abs(lid) * sub_seg_mult, 0)
        sub = sub + np.where(mask, comp, 0)
        out[mask] = np.sign(lid) * sub[mask]
    return out


def merge_atlas_segmentations(
        samples: "Sequence[Tuple[np.ndarray, np.ndarray]]",
        erosion_size: int = 8, log_sigma: float = 5.0
) -> "Tuple[list, list]":
    """Edge-aware reannotation across multiple samples
    (reference ``merge_atlas_segmentations :403``, the mp.Pool driver):
    runs ``edge_aware_segmentation`` per (atlas, labels) pair.

    Returns lists of reannotated labels and metric dicts.
    """
    segs = []
    metrics = []
    for atlas_img, labels_img in samples:
        seg, metr = edge_aware_segmentation(
            atlas_img, labels_img, erosion_size=erosion_size,
            log_sigma=log_sigma)
        segs.append(seg)
        metrics.append(metr)
    return segs, metrics
