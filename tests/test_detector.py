"""Detection pipeline tests: TPU LoG detector parity vs CPU reference."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import detector, ref_detect
from magellanmapper_tpu.settings.roi_prof import ROIProfile


def make_synthetic_nuclei(seed=42, shape=(48, 64, 64), n=40, rad_range=(3, 6)):
    """Random Gaussian 'nuclei' volume plus ground-truth centers."""
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    centers = np.column_stack([
        rng.uniform(8, s - 8, size=n) for s in shape])
    radii = rng.uniform(*rad_range, size=n)
    for (cz, cy, cx), r in zip(centers, radii):
        sig = r / np.sqrt(3)
        vol += np.exp(-((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
                      / (2 * sig ** 2))
    vol += rng.normal(scale=0.02, size=shape).astype(np.float32)
    vol = np.clip(vol, 0, None)
    return vol / vol.max(), centers


class TestBlobLogParity:
    def test_matches_reference_detector(self):
        vol, _ = make_synthetic_nuclei()
        kwargs = dict(min_sigma=2.0, max_sigma=4.0, num_sigma=5,
                      threshold=0.1, overlap=0.5)
        ref = ref_detect.blob_log_reference(vol, **kwargs)
        raw, valid = detector.blob_log(
            vol, tuple(detector.sigma_list(2.0, 4.0, 5)), 0.1, 0.5, 2048)
        ours = np.asarray(raw)[np.asarray(valid)]
        assert len(ours) > 10
        # >=99% parity by Hungarian matching at tolerance (SURVEY.md gate)
        tol = (3, 3, 3)
        n_match = ref_detect.match_blob_sets(ours[:, :3], ref[:, :3], tol)
        assert n_match >= 0.99 * max(len(ours), len(ref))

    def test_finds_planted_blobs(self):
        vol, centers = make_synthetic_nuclei(n=25)
        raw, valid = detector.blob_log(
            vol, tuple(detector.sigma_list(2.0, 4.0, 5)), 0.1, 0.5, 2048)
        ours = np.asarray(raw)[np.asarray(valid)]
        n_match = ref_detect.match_blob_sets(ours[:, :3], centers, (3, 3, 3))
        assert n_match >= 0.9 * len(centers)

    def test_empty_image(self):
        vol = np.zeros((16, 16, 16), np.float32)
        raw, valid = detector.blob_log(
            vol, (2.0, 3.0), 0.1, 0.5, 64)
        assert int(np.asarray(valid).sum()) == 0


class TestDetectBlobs:
    def test_full_surface(self):
        vol, centers = make_synthetic_nuclei(n=20)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        out = detector.detect_blobs(vol, prof, resolutions=(1.0, 1.0, 1.0))
        assert out is not None and out.shape[1] == 10
        # radius column scaled by sqrt(3), channel stamped, confirmed -1
        assert np.all(out[:, 3] > 1.0)
        assert np.all(out[:, 4] == -1)
        assert np.all(out[:, 6] == 0)
        # abs coords initialized from rel
        np.testing.assert_array_equal(out[:, :3], out[:, 7:10])

    def test_exclude_border(self):
        vol, _ = make_synthetic_nuclei(n=30)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        out = detector.detect_blobs(
            vol, prof, resolutions=(1, 1, 1), exclude_border=(10, 10, 10))
        if out is not None:
            assert np.all(out[:, :3] >= 10)
            assert np.all(out[:, :3] < np.asarray(vol.shape) - 10)

    def test_isotropic_repositioning(self):
        vol, centers = make_synthetic_nuclei(shape=(24, 64, 64), n=10)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["isotropic"] = (1.0, 1.0, 1.0)
        # z resolution 2x coarser -> isotropic upsamples z 2x internally,
        # and coordinates must come back in original voxel space
        out = detector.detect_blobs(vol, prof, resolutions=(2.0, 1.0, 1.0))
        assert out is not None
        assert np.all(out[:, 0] < vol.shape[0] + 1)


class TestClosePruning:
    def test_remove_close_blobs(self):
        master = blobs_mod.Blobs(
            np.array([[5.0, 5, 5, 3], [20, 20, 20, 3]])).format_blobs()
        check = blobs_mod.Blobs(
            np.array([[6.0, 5, 5, 3], [40, 40, 40, 3]])).format_blobs()
        pruned, master_out = detector.remove_close_blobs(
            check, master, (2, 2, 2))
        assert len(pruned) == 1
        assert pruned[0, 0] == 40
        # kept master abs z becomes mean of 5 and 6 rounded
        assert master_out[0, 7] in (5.0, 6.0)

    def test_sorted_array_pruning(self):
        arr = blobs_mod.Blobs(np.array([
            [1.0, 3, 4, 2.2], [1, 8, 5, 3.1], [1, 3, 5, 2.2],
            [3, 8, 5, 3.1]])).format_blobs()
        out = detector.remove_close_blobs_within_sorted_array(arr, (1, 2, 2))
        assert len(out) == 3

    def test_overlap_helpers(self):
        res = (1.0, 1.0, 1.0)
        np.testing.assert_array_equal(detector.calc_overlap(res), [5, 5, 5])
        res = (3.0, 0.5, 0.5)
        np.testing.assert_array_equal(detector.calc_overlap(res), [2, 10, 10])
