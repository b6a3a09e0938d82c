"""I/O tests: npy+metadata roundtrip, medical format roundtrips."""

import numpy as np
import pytest

from magellanmapper_tpu.io import np_io, sitk_io


class TestNpIO:
    def test_write_read_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 4096, (1, 10, 32, 32)).astype(np.uint16)
        base = str(tmp_path / "brain.npy")
        img5d = np_io.write_npy(base, arr, resolutions=[[2.0, 1.0, 1.0]])
        assert img5d.img.shape == arr.shape
        np.testing.assert_array_equal(np.asarray(img5d.img), arr)
        assert img5d.meta["ver"] == np_io.IMAGE5D_NP_VER
        np.testing.assert_allclose(img5d.resolutions, [[2.0, 1.0, 1.0]])
        # memmap load
        assert isinstance(img5d.img, np.memmap)

    def test_roi_extraction(self, tmp_path, rng):
        arr = rng.random((1, 12, 20, 20)).astype(np.float32)
        base = str(tmp_path / "vol.npy")
        np_io.write_npy(base, arr)
        # offset/size given x,y,z (reference CLI convention)
        img5d = np_io.read_file(base, offset=(5, 2, 1), size=(10, 8, 4))
        assert img5d.img.shape == (1, 4, 8, 10)
        np.testing.assert_array_equal(
            np.asarray(img5d.img[0]), arr[0, 1:5, 2:10, 5:15])

    def test_intensity_bounds(self):
        arr = np.zeros((1, 4, 8, 8, 2), np.float32)
        arr[..., 0] = 1.0
        arr[..., 1] = 10.0
        mins, maxs = np_io.calc_intensity_bounds(arr)
        assert maxs[0] == pytest.approx(1.0)
        assert maxs[1] == pytest.approx(10.0)

    def test_find_scaling(self):
        s = np_io.find_scaling((100, 200, 200), (50, 100, 100))
        np.testing.assert_allclose(s, [0.5, 0.5, 0.5])


class TestMedFormats:
    @pytest.mark.parametrize("ext", [".mhd", ".mha", ".nrrd", ".nii",
                                     ".nii.gz"])
    def test_roundtrip(self, tmp_path, rng, ext):
        arr = rng.integers(0, 255, (6, 10, 12)).astype(np.uint8)
        med = sitk_io.MedImage(
            arr, spacing=(2.0, 0.5, 0.5), origin=(1.0, 2.0, 3.0))
        path = str(tmp_path / ("img" + ext))
        sitk_io.write_med_img(path, med)
        back = sitk_io.read_med_img(path)
        np.testing.assert_array_equal(back.img, arr)
        np.testing.assert_allclose(back.spacing, med.spacing, rtol=1e-5)

    def test_float_roundtrip(self, tmp_path, rng):
        arr = rng.normal(size=(4, 6, 8)).astype(np.float32)
        for ext in (".mhd", ".nrrd", ".nii"):
            path = str(tmp_path / ("f" + ext))
            sitk_io.write_med_img(path, sitk_io.MedImage(arr))
            np.testing.assert_allclose(
                sitk_io.read_med_img(path).img, arr, rtol=1e-6)

    def test_reg_out_path(self):
        assert sitk_io.reg_out_path("/d/brain.npy", "atlasVolume.mhd") == \
            "/d/brain_atlasVolume.mhd"

    def test_registered_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 100, (4, 5, 6)).astype(np.int32)
        base = str(tmp_path / "exp.npy")
        sitk_io.write_reg_images(
            {"annotation.mhd": sitk_io.MedImage(arr)}, base)
        back = sitk_io.load_registered_img(base, "annotation.mhd")
        np.testing.assert_array_equal(back, arr)

    def test_read_sitk_files_as_image5d(self, tmp_path, rng):
        arr = rng.integers(0, 255, (6, 8, 8)).astype(np.uint8)
        path = str(tmp_path / "atlas.mhd")
        sitk_io.write_med_img(
            path, sitk_io.MedImage(arr, spacing=(2.0, 1.0, 1.0)))
        img5d = sitk_io.read_sitk_files(path)
        assert img5d.img.shape == (1, 6, 8, 8)
        np.testing.assert_allclose(img5d.resolutions, [[2.0, 1.0, 1.0]])


class TestSetupImages:
    def test_master_loader_with_blobs_and_labels(self, tmp_path, rng):
        from magellanmapper_tpu.cv import blobs as blobs_mod
        from magellanmapper_tpu.io import sitk_io
        from magellanmapper_tpu.utils import libmag

        base = str(tmp_path / "brain.npy")
        vol = rng.random((1, 8, 16, 16)).astype(np.float32)
        np_io.write_npy(base, vol)

        # blobs archive
        arr = blobs_mod.Blobs(np.array(
            [[2.0, 4, 4, 3], [6, 12, 12, 3]])).format_blobs(0)
        b = blobs_mod.Blobs(arr)
        b.path = libmag.combine_paths(base, "blobs.npz")
        b.save_archive()

        # registered labels at half resolution
        labels = np.zeros((4, 8, 8), np.int32)
        labels[:2] = 5
        labels[2:] = 9
        sitk_io.write_reg_images(
            {"annotation.mhd": sitk_io.MedImage(labels)}, base)

        out = np_io.setup_images(
            base, reg_suffixes={"annotation": "annotation.mhd"})
        assert out["img5d"].img.shape == (1, 8, 16, 16)
        assert "labels_img" in out
        blobs_out = out["blobs"].blobs
        assert blobs_out.shape[1] == 11
        # blob at z=2 (scaled z=1) -> label 5; z=6 -> scaled 3 -> label 9
        assert blobs_out[0, 10] == 5
        assert blobs_out[1, 10] == 9


def test_subimg_archive_preferred(tmp_path, rng):
    """A saved sub-image archive loads instead of slicing the main image
    (reference subimg .npy flow)."""
    from magellanmapper_tpu.io import importer
    from magellanmapper_tpu.utils import libmag
    arr = rng.random((1, 12, 20, 20)).astype(np.float32)
    base = str(tmp_path / "m.npy")
    np_io.write_npy(base, arr)
    offset, size = (5, 2, 1), (10, 8, 4)  # x,y,z
    sub_name = importer.make_subimage_name(base, offset, size)
    sub_path = libmag.combine_paths(sub_name, "subimg.npy")
    marker = np.full((4, 8, 10), 7.0, np.float32)
    np.save(sub_path, marker)
    img5d = np_io.read_file(base, offset=offset, size=size)
    np.testing.assert_array_equal(np.asarray(img5d.img[0]), marker)
