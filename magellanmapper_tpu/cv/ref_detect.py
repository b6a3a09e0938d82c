"""CPU reference LoG blob detector (NumPy/scipy) for parity testing.

Independent implementation of the ``skimage.feature.blob_log`` algorithm
(the reference's detection kernel, ``magmap/cv/detector.py:931``) built on
``scipy.ndimage``: scale-normalized LoG pyramid, ``peak_local_max``-style
4D local maxima (full 3^nd footprint, constant-0 border, descending
intensity order), and sequential sphere-overlap pruning. Used as:

 1. the parity oracle for the TPU detector (Hungarian-matched agreement);
 2. the single-CPU throughput baseline for ``bench.py`` (the reference's
    own hot kernel is this algorithm in Cython/C).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from scipy import ndimage as ndi
from scipy import spatial


def blob_log_reference(
        image: np.ndarray, min_sigma: float, max_sigma: float,
        num_sigma: int, threshold: float, overlap: float) -> np.ndarray:
    """LoG blob detection; returns ``(N, ndim+1)`` rows ``coords..., sigma``."""
    image = np.asarray(image, dtype=np.float32)
    sigmas = (np.linspace(min_sigma, max_sigma, num_sigma)
              if num_sigma > 1 else np.asarray([float(min_sigma)]))
    cube = np.stack([
        -ndi.gaussian_laplace(image, s) * s ** 2 for s in sigmas])

    # local maxima over the full 3^(nd+1) footprint, constant-0 border
    maxed = ndi.maximum_filter(
        cube, size=(3,) * cube.ndim, mode="constant", cval=0.0)
    mask = (cube == maxed) & (cube > threshold)
    coords = np.argwhere(mask)
    if coords.shape[0] == 0:
        return np.empty((0, image.ndim + 1))
    # order by peak intensity descending (peak_local_max return order)
    order = np.argsort(cube[tuple(coords.T)])[::-1]
    coords = coords[order]

    blobs = np.column_stack(
        [coords[:, 1:].astype(float), sigmas[coords[:, 0]]])
    return prune_blobs_reference(blobs, overlap, ndim=image.ndim)


def _blob_overlap(blob1: np.ndarray, blob2: np.ndarray, ndim: int) -> float:
    """Sphere-overlap fraction relative to the smaller blob (3D)."""
    root = math.sqrt(ndim)
    r1 = blob1[-1] * root
    r2 = blob2[-1] * root
    if r1 == 0 or r2 == 0:
        return 0.0
    d = float(np.linalg.norm(blob1[:-1] - blob2[:-1]))
    if d > r1 + r2:
        return 0.0
    if d <= abs(r1 - r2):
        return 1.0
    vol = (math.pi * (r1 + r2 - d) ** 2
           * (d ** 2 + 2 * d * (r1 + r2) - 3 * (r1 - r2) ** 2) / (12 * d))
    return vol / (4.0 / 3.0 * math.pi * min(r1, r2) ** 3)


def prune_blobs_reference(
        blobs: np.ndarray, overlap: float, ndim: int = 3) -> np.ndarray:
    """Sequential pairwise pruning: smaller blob of an overlapping pair is
    dropped (its sigma zeroed immediately, affecting later pairs)."""
    if blobs.shape[0] == 0:
        return blobs
    blobs = blobs.copy()
    root = math.sqrt(ndim)
    tree = spatial.cKDTree(blobs[:, :-1])
    max_r = blobs[:, -1].max() * root
    pairs = np.array(list(tree.query_pairs(2.0 * max_r)))
    for i, j in pairs:
        b1, b2 = blobs[i], blobs[j]
        if b1[-1] == 0 or b2[-1] == 0:
            continue
        if _blob_overlap(b1, b2, ndim) > overlap:
            if b1[-1] > b2[-1]:
                b2[-1] = 0
            else:
                b1[-1] = 0
    return blobs[blobs[:, -1] > 0]


def match_blob_sets(
        coords_a: np.ndarray, coords_b: np.ndarray,
        tol: Sequence[float]) -> int:
    """Count 1:1 matches within per-axis ``tol`` via Hungarian assignment.

    The parity metric of the reference's own verifier
    (``magmap/cv/verifier.py:47`` ``find_closest_blobs_cdist``).
    """
    from scipy.optimize import linear_sum_assignment
    if len(coords_a) == 0 or len(coords_b) == 0:
        return 0
    tol = np.asarray(tol, dtype=float)
    # scale axes so the threshold is isotropic (verifier.py:122 semantics)
    scale = tol.max() / tol
    ca = coords_a * scale
    cb = coords_b * scale
    dists = spatial.distance.cdist(ca, cb)
    rows, cols = linear_sum_assignment(dists)
    return int(np.sum(dists[rows, cols] <= tol.max()))
