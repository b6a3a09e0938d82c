"""Segmenter tests: watershed flooding, random walker, markers."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import segmenter


def two_basin_volume(shape=(20, 20, 20)):
    """Elevation with two basins separated by a ridge at y=10."""
    zz, yy, xx = np.indices(shape).astype(np.float32)
    d1 = np.sqrt((zz - 10) ** 2 + (yy - 5) ** 2 + (xx - 10) ** 2)
    d2 = np.sqrt((zz - 10) ** 2 + (yy - 15) ** 2 + (xx - 10) ** 2)
    return np.minimum(d1, d2), d1, d2


class TestWatershed:
    def test_two_basins_split_on_ridge(self):
        elev, d1, d2 = two_basin_volume()
        markers = np.zeros(elev.shape, np.int32)
        markers[10, 5, 10] = 1
        markers[10, 15, 10] = 2
        labels = segmenter.watershed(elev, markers)
        assert labels[10, 2, 10] == 1
        assert labels[10, 18, 10] == 2
        # every voxel labeled
        assert np.all(labels > 0)
        # boundary near the ridge plane y=10
        boundary_y = np.where(np.diff(labels[10, :, 10]) != 0)[0]
        assert len(boundary_y) == 1
        assert abs(boundary_y[0] - 9.5) <= 1.5

    def test_mask_restricts_fill(self):
        elev, _, _ = two_basin_volume()
        markers = np.zeros(elev.shape, np.int32)
        markers[10, 5, 10] = 1
        mask = np.zeros(elev.shape, bool)
        mask[:, :10] = True
        labels = segmenter.watershed(elev, markers, mask=mask)
        assert np.all(labels[:, 10:] == 0)
        assert labels[10, 5, 10] == 1

    def test_watershed_distance_auto_markers(self):
        fg = np.zeros((16, 24, 16), bool)
        fg[4:12, 2:10, 4:12] = True
        fg[4:12, 14:22, 4:12] = True
        labels = segmenter.watershed_distance(fg)
        ids = np.unique(labels[fg])
        assert len(ids[ids > 0]) >= 2

    def test_segment_from_labels(self):
        # labels roughly matching two intensity regions split by an edge
        edges = np.zeros((12, 20, 12), np.float32)
        edges[:, 10] = 1.0  # edge plane
        labels_img = np.zeros((12, 20, 12), np.int32)
        labels_img[:, :8] = 3
        labels_img[:, 12:] = 5
        markers = np.array(labels_img)
        out = segmenter.segment_from_labels(edges, markers, labels_img)
        assert set(np.unique(out)) <= {0, 3, 5}
        assert out[6, 2, 6] == 3
        assert out[6, 18, 6] == 5


class TestRandomWalker:
    def test_two_region_split(self):
        img = np.zeros((10, 20, 10), np.float32)
        img[:, :10] = 0.9
        img[:, 10:] = 0.1
        img += np.random.default_rng(0).normal(
            scale=0.02, size=img.shape).astype(np.float32)
        out = segmenter.segment_rw(img, beta=50, vmin=0.3, vmax=0.7)
        walker = out[0]
        assert walker[5, 2, 5] == 1   # bright = foreground
        assert walker[5, 18, 5] == 2  # dark = background


class TestMarkers:
    def test_labels_to_markers_erosion(self):
        labels = np.zeros((16, 16, 16), np.int32)
        labels[2:14, 2:14, 2:14] = 4
        markers, stats = segmenter.labels_to_markers_erosion(
            labels, filter_size=3)
        assert np.all((markers == 0) | (markers == 4))
        n_marker = (markers == 4).sum()
        assert 0 < n_marker < (labels == 4).sum()
        assert stats[0][0] == 4

    def test_labels_to_markers_blob(self):
        labels = np.zeros((12, 12, 12), np.int32)
        labels[2:10, 2:10, 2:10] = 7
        markers = segmenter.labels_to_markers_blob(labels)
        assert markers[6, 6, 6] == 7
        assert (markers == 7).sum() < (labels == 7).sum()
