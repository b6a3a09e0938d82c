"""End-to-end integration test.

Mirrors the reference ``test_image_stack_integration.py``: TIFF write ->
import to memmapped npy -> read_file -> chunked detection on an ROI with
``lightsheet,4xnuc`` profiles -> nonzero blob count, plus archive
save/reload and verification against planted truth.
"""

import os

import numpy as np
import pytest

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import detector, ref_detect, stack_detect, verifier
from magellanmapper_tpu.io import importer, np_io, tiff
from magellanmapper_tpu.settings.roi_prof import ROIProfile
from magellanmapper_tpu.utils import libmag


@pytest.fixture(scope="module")
def sample_stack(tmp_path_factory):
    """Synthetic two-channel nuclei stack written as TIFF."""
    tmp = tmp_path_factory.mktemp("integration")
    rng = np.random.default_rng(5)
    shape = (24, 96, 96)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    centers = np.column_stack(
        [rng.uniform(6, s - 6, 50) for s in shape])
    for cz, cy, cx in centers:
        vol += np.exp(
            -((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / 7.0)
    vol = vol / vol.max()
    vol16 = (vol * 4000).astype(np.uint16)
    tif_path = str(tmp / "sample_region.tif")
    tiff.write_tiff(tif_path, vol16)
    return tif_path, centers, tmp


class TestImageStackIntegration:
    def test_import_detect_verify(self, sample_stack):
        tif_path, centers, tmp = sample_stack

        # 1. import TIFF -> memmapped npy with metadata
        img5d = importer.import_tiff(
            tif_path, resolutions=(1.0, 1.0, 1.0))
        assert img5d.img.shape == (1, 24, 96, 96)
        assert isinstance(img5d.img, np.memmap)

        # 2. reload via read_file
        img5d = np_io.read_file(tif_path)
        assert img5d.meta["ver"] == np_io.IMAGE5D_NP_VER

        # 3. chunked detection with reference profile chain
        prof = ROIProfile()
        prof.add_profiles("lightsheet,4xnuc")
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["isotropic"] = None       # already isotropic
        prof["exclude_border"] = None
        prof["segment_size"] = 64
        vol = np.asarray(img5d.img[0], np.float32) / 4000.0
        blobs, timing = stack_detect.detect_blobs_blocks(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        assert blobs is not None and len(blobs) > 0

        # 4. verify against planted truth: sens and ppv high
        sens, ppv, msg = verifier.verify_stack(
            blobs, np.column_stack(
                [centers, np.full(len(centers), 3.0)]), (3, 3, 3))
        assert sens > 0.85
        assert ppv > 0.7

        # 5. archive roundtrip
        b = blobs_mod.Blobs(blobs)
        b.path = str(tmp / "sample_blobs.npz")
        b.resolutions = np.array([[1.0, 1.0, 1.0]])
        b.save_archive()
        b2 = blobs_mod.Blobs().load_blobs(b.path)
        np.testing.assert_allclose(b2.blobs, blobs)

    def test_roi_detection_matches_reference_impl(self, sample_stack):
        tif_path, centers, tmp = sample_stack
        img5d = np_io.read_file(tif_path)
        roi = np.asarray(
            img5d.img[0, 4:20, 16:80, 16:80], np.float32) / 4000.0
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        ours = detector.detect_blobs(roi, prof, (1.0, 1.0, 1.0))
        ref = ref_detect.blob_log_reference(
            roi, 2.0, 4.0, 5, prof["detection_threshold"],
            prof["overlap"])
        n_match = ref_detect.match_blob_sets(
            ours[:, :3], ref[:, :3], (3, 3, 3))
        assert n_match >= 0.95 * max(len(ours), len(ref))
