"""Tests for the extended cv_nd surface + plot_3d API."""

import numpy as np
import pytest
from scipy import ndimage as scipy_ndi

from magellanmapper_tpu.cv import cv_nd
from magellanmapper_tpu.plot import plot_3d


class TestCvNdExtra:
    def test_rotate_nd(self):
        img = np.zeros((4, 10, 10), np.float32)
        img[:, 2:4, 4:6] = 1.0
        out = cv_nd.rotate_nd(img, 90, axis=0)
        assert out.shape == img.shape
        assert out.sum() == pytest.approx(img.sum(), rel=0.2)

    def test_interpolate_label_between_planes(self):
        labels = np.zeros((6, 20, 20), np.int32)
        # annotated planes at z=1 and z=4 with different circle sizes
        yy, xx = np.indices((20, 20))
        labels[1][(yy - 10) ** 2 + (xx - 10) ** 2 <= 16] = 7
        labels[4][(yy - 10) ** 2 + (xx - 10) ** 2 <= 49] = 7
        out = cv_nd.interpolate_label_between_planes(labels, 7, 0, (1, 4))
        mid = (out[2] == 7).sum()
        assert (labels[1] == 7).sum() < mid < (labels[4] == 7).sum()
        # original annotated planes unchanged
        np.testing.assert_array_equal(out[1], labels[1])
        np.testing.assert_array_equal(out[4], labels[4])

    def test_filter_adaptive_size_shrinks(self):
        mask = np.zeros((12, 12, 12), bool)
        mask[4:8, 4:8, 4:8] = True  # small region: full filter kills it
        out, used = cv_nd.filter_adaptive_size(
            mask, scipy_ndi.binary_erosion, 4)
        assert out.sum() >= 0.2 * mask.sum() or used == 0

    def test_angle_indices(self):
        ys, xs = cv_nd.angle_indices((20, 20), (0, 0), 45)
        assert len(ys) > 10
        np.testing.assert_array_equal(ys, xs)  # 45 degrees


class TestPlot3D:
    def test_saturate_denoise_names(self, rng):
        roi = rng.random((6, 16, 16, 2)).astype(np.float32)
        sat = plot_3d.saturate_roi(roi)
        assert sat.shape == roi.shape
        den = plot_3d.denoise_roi(sat[..., 0])
        assert den.shape == roi.shape[:3]

    def test_prepare_roi_xyz_convention(self, rng):
        image5d = rng.random((1, 10, 20, 30)).astype(np.float32)
        roi = plot_3d.prepare_roi(image5d, (5, 2, 1), (10, 8, 4))
        assert roi.shape == (4, 8, 10)

    def test_build_ground_truth(self):
        img = np.zeros((16, 16, 16))
        blobs = np.array([[8.0, 8, 8, 3]])
        mask = plot_3d.build_ground_truth(img, blobs)
        assert mask[8, 8, 8] == 1
        assert mask[0, 0, 0] == 0
        assert 50 < mask.sum() < 200  # ~4/3 pi 27 = 113


class TestSurfaceNetMesh:
    def test_sphere_mesh_geometry(self):
        from magellanmapper_tpu.cv import cv_nd
        zz, yy, xx = np.indices((32, 32, 32)).astype(float)
        vol = (((zz-16)**2 + (yy-16)**2 + (xx-16)**2) <= 100).astype(
            np.float32)
        verts, faces = cv_nd.surface_net_mesh(vol, 0.5)
        assert len(verts) > 500 and len(faces) > 1000
        d = np.linalg.norm(verts - 16, axis=1)
        assert abs(d.mean() - 10.0) < 0.3 and d.std() < 0.5
        # closed surface: every face edge appears exactly twice
        edges = np.sort(np.concatenate([
            faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert set(counts.tolist()) == {2}

    def test_empty_volume(self):
        from magellanmapper_tpu.cv import cv_nd
        verts, faces = cv_nd.surface_net_mesh(
            np.zeros((8, 8, 8), np.float32), 0.5)
        assert len(verts) == 0 and len(faces) == 0

    def test_surface_render(self, tmp_path):
        from magellanmapper_tpu.gui import vis_3d
        zz, yy, xx = np.indices((24, 24, 24)).astype(float)
        vol = (((zz-12)**2 + (yy-12)**2 + (xx-12)**2) <= 49).astype(
            np.float32)
        out = str(tmp_path / "surface.png")
        fig, (verts, faces) = vis_3d.plot_surface_3d(
            vol, 0.5, out_path=out)
        import os
        assert os.path.exists(out) and len(faces) > 100
