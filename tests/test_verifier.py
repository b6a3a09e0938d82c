"""Verifier + colocalizer tests."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import colocalizer, verifier


def make_blobs(coords, channel=0):
    arr = np.column_stack([
        np.asarray(coords, float),
        np.full(len(coords), 3.0)])
    return blobs_mod.Blobs(arr).format_blobs(channel)


class TestMatching:
    def test_closest_blobs_exact(self):
        a = make_blobs([[5, 5, 5], [20, 20, 20]])
        b = make_blobs([[5, 6, 5], [20, 20, 21], [40, 40, 40]])
        rows, cols, dists = verifier.find_closest_blobs_cdist(
            a, b, thresh=3.0)
        assert len(rows) == 2
        assert set(zip(rows.tolist(), cols.tolist())) == {(0, 0), (1, 1)}

    def test_scaling_anisotropy(self):
        # tol z=3 larger than xy=1 -> scaling shrinks z distances
        thresh, scaling, inner_pad, _, _ = verifier.setup_match_blobs_roi(
            (3, 1, 1))
        assert thresh == 3
        np.testing.assert_allclose(scaling, [1, 3, 3])
        a = make_blobs([[2.9, 5, 5]])
        b = make_blobs([[0, 5, 5]])
        rows, _, _ = verifier.find_closest_blobs_cdist(
            a, b, thresh, scaling)
        assert len(rows) == 1  # dz=2.9 within z tolerance 3

    def test_hungarian_optimality(self):
        # greedy would match blob0 to truth0 (dist 2), stranding blob1
        a = make_blobs([[0, 0, 2], [0, 0, 3]])
        b = make_blobs([[0, 0, 0], [0, 0, 4]])
        rows, cols, dists = verifier.find_closest_blobs_cdist(
            a, b, thresh=5.0)
        assert len(rows) == 2
        assert dists.sum() < 5.0

    def test_match_blobs_roi_inner_priority(self):
        detected = make_blobs([[10, 10, 10], [3, 3, 3]])
        truth = make_blobs([[10, 11, 10], [3, 3, 4]])
        thresh, scaling, inner_pad, _, _ = verifier.setup_match_blobs_roi(
            (2, 2, 2))
        inner_plus, truth_plus, off_in, size_in, matches = \
            verifier.match_blobs_roi(
                detected, truth, (0, 0, 0), (20, 20, 20), thresh, scaling,
                inner_pad)
        assert len(matches) == 2
        assert np.all(inner_plus[:, 4] >= 0)


class TestAccuracy:
    def test_sens_ppv(self):
        sens, ppv, msg = verifier.calc_sens_ppv(10, 8, 2, 2)
        assert sens == pytest.approx(0.8)
        assert ppv == pytest.approx(0.8)

    def test_verify_stack(self):
        detected = make_blobs(
            [[5, 5, 5], [10, 10, 10], [30, 30, 30]])
        truth = make_blobs([[5, 5, 6], [10, 10, 10], [50, 50, 50]])
        sens, ppv, msg = verifier.verify_stack(detected, truth, (2, 2, 2))
        assert sens == pytest.approx(2 / 3)
        assert ppv == pytest.approx(2 / 3)

    def test_meas_detection_accuracy(self):
        blobs = make_blobs([[1, 1, 1], [2, 2, 2], [3, 3, 3]])
        blobs[:, 4] = [1, 1, 0]  # two correct, one incorrect
        sens, ppv, msg = verifier.meas_detection_accuracy(blobs)
        assert sens == 1.0
        assert ppv == pytest.approx(2 / 3)


class TestColocalizer:
    def test_intensity_coloc(self):
        rng = np.random.default_rng(0)
        roi = rng.uniform(0, 0.05, (20, 20, 20, 2)).astype(np.float32)
        # bright spot in both channels at (5,5,5); chl-0 only at (14,14,14)
        for c in (0, 1):
            roi[4:7, 4:7, 4:7, c] = 1.0
        roi[13:16, 13:16, 13:16, 0] = 1.0
        blobs = np.vstack([
            make_blobs([[5, 5, 5]], channel=0),
            make_blobs([[14, 14, 14]], channel=0),
            make_blobs([[5, 5, 5]], channel=1)])
        colocs = colocalizer.colocalize_blobs(roi, blobs)
        assert colocs.shape == (3, 2)
        assert colocs[0, 1] == 1      # chl0 blob at 5,5,5 has chl1 signal
        assert colocs[2, 0] == 1      # chl1 blob sees chl0 signal
        assert colocs[1, 1] == 0      # lone chl0 blob has no chl1 signal

    def test_match_coloc(self):
        blobs = np.vstack([
            make_blobs([[5, 5, 5], [10, 10, 10]], channel=0),
            make_blobs([[5, 5, 6], [40, 40, 40]], channel=1)])
        matches = colocalizer.colocalize_blobs_match(
            blobs, (0, 0, 0), (50, 50, 50), (3, 3, 3))
        bm = matches[(0, 1)]
        assert len(bm) == 1
        b1 = bm.get_blobs(1)
        assert b1 is not None

    def test_blob_match_wrapper(self):
        m = colocalizer.BlobMatch(
            [(np.arange(10.0), np.arange(10.0) + 1, 2.5)])
        assert len(m) == 1
        assert m.df[colocalizer.BlobMatch.Cols.DIST.value][0] == 2.5
