"""Tests for path/seq/dtype utilities (reference test_libmag.py coverage)."""

import numpy as np

from magellanmapper_tpu.utils import libmag


def test_splitext_compound():
    assert libmag.splitext("a/b/img.nii.gz") == ("a/b/img", ".nii.gz")
    assert libmag.splitext("img.ome.tif") == ("img", ".ome.tif")
    assert libmag.splitext("img.npy") == ("img", ".npy")


def test_insert_before_ext():
    assert libmag.insert_before_ext("img.npy", "_roi") == "img_roi.npy"
    assert libmag.insert_before_ext("img.nii.gz", "x") == "imgx.nii.gz"


def test_combine_paths():
    assert libmag.combine_paths("base.npy", "blobs", ext="npz") \
        == "base_blobs.npz"
    assert libmag.combine_paths("base.npy", ".csv") == "base.csv"
    assert libmag.combine_paths(None, "only") == "only"


def test_backup_file(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("one")
    backup = libmag.backup_file(str(p))
    assert backup and backup.endswith("(1).txt")
    assert not p.exists()
    assert libmag.backup_file(str(tmp_path / "missing.txt")) is None


def test_normalize():
    arr = np.array([0.0, 5.0, 10.0])
    out = libmag.normalize(arr, 0, 1)
    np.testing.assert_allclose(out, [0, 0.5, 1])
    # background excluded from input range
    arr = np.array([0.0, 5.0, 10.0])
    out = libmag.normalize(arr, 0, 1, background=0)
    np.testing.assert_allclose(out, [0, 0, 1])


def test_dtype_within_range():
    assert libmag.dtype_within_range(0, 255) == np.uint8
    assert libmag.dtype_within_range(-1, 255) == np.int16
    assert libmag.dtype_within_range(0, 70000) == np.uint32
    assert libmag.dtype_within_range(0, 1.5, integer=False) == np.float32


def test_seq_helpers():
    assert libmag.to_seq(3, 2) == (3, 3)
    assert libmag.to_seq(None) is None
    assert libmag.pad_seq([1, 2], 4, 0) == [1, 2, 0, 0]


def test_npstr_to_array():
    out = libmag.npstr_to_array("[1.5 -2 3e2]")
    np.testing.assert_allclose(out, [1.5, -2, 300])
