"""Blob clustering: DBSCAN per label + k-nearest-neighbor distances.

Equivalent of ``magmap/stats/clustering.py``: ``knn_dist :27``,
``ClusterByLabel.cluster_by_label :189``, ``cluster_blobs :255``.
Cluster IDs append as an extra blob column; noise = -1.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.atlas import ontology

_logger = logging.getLogger(__name__)


def knn_dist(
        blobs: np.ndarray, n: int = 5,
        return_sorted: bool = True) -> np.ndarray:
    """Distance to the n-th nearest neighbor for each blob
    (reference ``knn_dist :27``; used to pick DBSCAN eps at the elbow)."""
    from sklearn.neighbors import NearestNeighbors
    coords = blobs[:, :3]
    nbrs = NearestNeighbors(n_neighbors=n).fit(coords)
    dists, _ = nbrs.kneighbors(coords)
    out = dists[:, -1]
    return np.sort(out) if return_sorted else out


def cluster_dbscan(
        coords: np.ndarray, eps: float, minpts: int) -> np.ndarray:
    """DBSCAN cluster labels (-1 = noise)."""
    from sklearn.cluster import DBSCAN
    if len(coords) == 0:
        return np.zeros(0, dtype=int)
    return DBSCAN(eps=eps, min_samples=minpts).fit_predict(coords)


def cluster_by_label(
        blobs: np.ndarray, labels_img: np.ndarray,
        scaling: Sequence[float], eps: float = 20.0,
        minpts: int = 5) -> np.ndarray:
    """Cluster blobs separately within each label region
    (reference ``ClusterByLabel.cluster_by_label :189``).

    Returns blobs with a cluster-ID column appended (noise -1; IDs are
    offset per label so they stay globally unique).
    """
    coords_scaled = ontology.scale_coords(
        blobs[:, :3], scaling, labels_img.shape)
    label_per_blob = ontology.get_label_ids_from_position(
        coords_scaled, labels_img)
    cluster_ids = np.full(len(blobs), -1, dtype=float)
    next_offset = 0
    for lid in np.unique(label_per_blob):
        mask = label_per_blob == lid
        ids = cluster_dbscan(blobs[mask, :3], eps, minpts)
        pos = ids >= 0
        ids = ids.astype(float)
        ids[pos] += next_offset
        if pos.any():
            next_offset = int(ids[pos].max()) + 1
        cluster_ids[mask] = ids
    return np.column_stack([blobs, cluster_ids])


def cluster_blobs(
        blobs: np.ndarray, eps: Optional[float] = None,
        minpts: int = 5, knn_n: int = 5) -> Tuple[np.ndarray, dict]:
    """Cluster all blobs (reference ``cluster_blobs :255``); eps defaults
    to the 90th percentile of knn distances."""
    if eps is None:
        dists = knn_dist(blobs, knn_n, return_sorted=False)
        eps = float(np.percentile(dists, 90))
    ids = cluster_dbscan(blobs[:, :3], eps, minpts)
    n_clusters = len(set(ids[ids >= 0]))
    stats = {
        "NucCluster": n_clusters,
        "NucClusNoise": int(np.sum(ids < 0)),
        "NucClusLarg": int(np.bincount(ids[ids >= 0]).max())
        if n_clusters else 0,
        "eps": eps,
    }
    return np.column_stack([blobs, ids]), stats


def cluster_dbscan_metrics(labels: np.ndarray):
    """(num_clusters, num_noise, num_largest) for DBSCAN labels
    (reference ``clustering.cluster_dbscan_metrics :164``)."""
    lbl_unique, lbl_counts = np.unique(
        labels[labels != -1], return_counts=True)
    num_clusters = len(lbl_unique)
    num_largest = np.nan if not len(lbl_counts) else int(
        np.amax(lbl_counts))
    num_noise = int(np.sum(labels == -1))
    return num_clusters, num_noise, num_largest


class ClusterByLabel:
    """Per-atlas-region DBSCAN clustering facade
    (reference ``clustering.ClusterByLabel :185``); delegates to
    :func:`cluster_by_label`."""

    def __init__(self, blobs: np.ndarray, labels_img_np: np.ndarray,
                 blobs_lbl_scaling=None, blobs_iso_scaling=None):
        self.blobs = blobs
        self.labels_img_np = labels_img_np
        self.blobs_lbl_scaling = blobs_lbl_scaling or (1.0, 1.0, 1.0)
        self.blobs_iso_scaling = blobs_iso_scaling or (1.0, 1.0, 1.0)

    def cluster(self, eps: float = 20.0, minpts: int = 5) -> np.ndarray:
        coords = np.multiply(
            self.blobs[:, :3], self.blobs_iso_scaling)
        return cluster_by_label(
            coords, self.labels_img_np, self.blobs_lbl_scaling,
            eps=eps, minpts=minpts)


def plot_knns(blob_sets, knn_n: int = 4, names=None,
              out_path: Optional[str] = None):
    """Overlayed sorted k-nearest-neighbor distance curves for several
    blob sets (reference ``clustering.plot_knns :99``); the elbow of
    each curve guides the DBSCAN ``eps`` choice."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for i, blobs in enumerate(blob_sets):
        dists = knn_dist(np.asarray(blobs)[:, :3], knn_n)
        ax.plot(np.sort(dists),
                label=None if names is None else names[i])
    ax.set_xlabel("Points")
    ax.set_ylabel(f"{knn_n}-NN distance")
    if names is not None:
        ax.legend()
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return fig
