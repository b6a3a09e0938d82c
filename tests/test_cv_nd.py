"""cv_nd tests: EDT parity vs scipy, in-paint, perimeters, heat maps."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from magellanmapper_tpu.cv import cv_nd


class TestEDT:
    def test_matches_scipy_dense(self, rng):
        mask = rng.random((24, 24, 24)) > 0.3
        ours = cv_nd.distance_transform_edt(mask)
        ref = ndi.distance_transform_edt(mask)
        # JFA is near-exact; allow rare small deviations
        frac_exact = np.mean(np.isclose(ours, ref, rtol=1e-5))
        assert frac_exact > 0.995
        np.testing.assert_allclose(ours, ref, atol=1.5)

    def test_anisotropic_sampling(self, rng):
        mask = rng.random((16, 16, 16)) > 0.4
        ours = cv_nd.distance_transform_edt(mask, sampling=(2.0, 1.0, 1.0))
        ref = ndi.distance_transform_edt(mask, sampling=(2.0, 1.0, 1.0))
        assert np.mean(np.isclose(ours, ref, rtol=1e-5)) > 0.99

    def test_indices_nearest_seed(self):
        mask = np.ones((8, 8, 8), bool)
        mask[4, 4, 4] = False  # single seed
        dist, idx = cv_nd.distance_transform_edt(mask, return_indices=True)
        assert dist[4, 4, 4] == 0
        np.testing.assert_array_equal(idx[:, 0, 0, 0], [4, 4, 4])
        assert dist[0, 0, 0] == pytest.approx(np.sqrt(48))


class TestInPaint:
    def test_fills_from_nearest(self):
        roi = np.zeros((10, 10, 10), np.float32)
        roi[:5] = 1.0
        roi[5:] = 2.0
        to_fill = np.zeros_like(roi, bool)
        to_fill[4:6, 4:6, 4:6] = True
        out = cv_nd.in_paint(roi, to_fill)
        assert out[4, 4, 4] in (1.0, 2.0)
        # untouched voxels preserved
        assert out[0, 0, 0] == 1.0
        assert out[9, 9, 9] == 2.0


class TestCarve:
    def test_carve_threshold_and_holes(self):
        roi = np.zeros((12, 12, 12), np.float32)
        roi[2:10, 2:10, 2:10] = 1.0
        roi[5:7, 5:7, 5:7] = 0.0  # small hole
        carved, mask = cv_nd.carve(roi, thresh=0.5, holes_area=30)
        assert mask[6, 6, 6]  # hole filled in mask
        assert not mask[0, 0, 0]


class TestPerimeter:
    def test_perimeter_is_shell(self):
        mask = np.zeros((10, 10, 10), bool)
        mask[2:8, 2:8, 2:8] = True
        per = cv_nd.perimeter_nd(mask)
        assert per[2, 5, 5] and not per[5, 5, 5]
        assert per.sum() == mask.sum() - 4 ** 3

    def test_exterior(self):
        mask = np.zeros((8, 8, 8), bool)
        mask[3:5, 3:5, 3:5] = True
        ext = cv_nd.exterior_nd(mask)
        assert not np.any(ext & mask)
        assert ext[2, 3, 3]


class TestMisc:
    def test_heat_map_counts(self):
        coords = np.array([[1, 1, 1], [1, 1, 1], [2, 3, 4], [-1, 0, 0],
                           [50, 0, 0]])
        heat = cv_nd.build_heat_map((5, 5, 5), coords)
        assert heat[1, 1, 1] == 2
        assert heat[2, 3, 4] == 1
        assert heat.sum() == 3  # out-of-bounds dropped

    def test_zero_crossing(self):
        img = np.ones((8, 8, 8), np.float32)
        img[:, :4] = -1.0
        zc = cv_nd.zero_crossing(img)
        assert zc[0, 3, 0] and zc[0, 4, 0]
        assert not zc[0, 0, 0] and not zc[0, 7, 0]

    def test_surface_area_sphere_accuracy(self):
        r = 8
        zz, yy, xx = np.indices((24, 24, 24)) - 12
        ball = zz**2 + yy**2 + xx**2 <= r * r
        sa = cv_nd.surface_area_3d(ball)
        assert sa == pytest.approx(4 * np.pi * r * r, rel=0.08)

    def test_compactness_sphere_vs_plate(self):
        zz, yy, xx = np.indices((24, 24, 24)) - 12
        ball = zz**2 + yy**2 + xx**2 <= 36
        plate = np.zeros((24, 24, 24), bool)
        plate[11:13, 2:22, 2:22]= True
        comp_ball = cv_nd.compactness_3d(ball)[0]
        comp_plate = cv_nd.compactness_3d(plate)[0]
        assert comp_ball < comp_plate  # sphere is more compact

    def test_crop_to_labels(self):
        img = np.ones((16, 16, 16), np.float32)
        labels = np.zeros((16, 16, 16), np.int32)
        labels[4:8, 4:8, 4:8] = 3
        img_crop, labels_crop, slices = cv_nd.crop_to_labels(img, labels)
        assert labels_crop.max() == 3
        assert img_crop.shape == labels_crop.shape
        assert img_crop.shape[0] <= 16

    def test_signed_distance(self):
        mask = np.zeros((10, 10, 10), bool)
        mask[3:7, 3:7, 3:7] = True
        dist = cv_nd.signed_distance_transform(None, mask)
        assert dist[5, 5, 5] < 0
        assert dist[0, 0, 0] > 0
