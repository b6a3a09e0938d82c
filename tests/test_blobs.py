"""Tests for the Blobs model and archive (reference test_detector.py model)."""

import numpy as np
import pytest

from magellanmapper_tpu.cv.blobs import (
    BlobCols, Blobs, get_blobs_in_roi, get_blobs_interior,
    remove_duplicate_blobs, sort_blobs)


def make_random_blobs(n=20, seed=1):
    rng = np.random.default_rng(seed)
    zyx = rng.uniform(0, 50, (n, 3))
    rad = rng.uniform(1, 5, (n, 1))
    return np.concatenate([zyx, rad], axis=1)


def test_format_blobs_columns():
    raw = make_random_blobs()
    b = Blobs(raw.copy())
    blobs = b.format_blobs(channel=2)
    # standard column set is 10 (REGION is optional, ref detector.py:88)
    assert blobs.shape[1] == 10
    assert np.all(Blobs.get_blobs_channel(blobs) == 2)
    assert np.all(Blobs.get_blob_confirmed(blobs) == -1)
    np.testing.assert_allclose(
        Blobs.get_blob_abs_coords(blobs), raw[:, :3])


def test_shift_and_multiply_coords():
    b = Blobs(make_random_blobs())
    blobs = b.format_blobs(0)
    orig = blobs[:, :3].copy()
    Blobs.shift_blob_rel_coords(blobs, [1, 2, 3])
    np.testing.assert_allclose(blobs[:, :3], orig + [1, 2, 3])
    Blobs.multiply_blob_abs_coords(blobs, [2, 2, 2])
    np.testing.assert_allclose(
        Blobs.get_blob_abs_coords(blobs), orig * 2)


def test_archive_roundtrip(tmp_path):
    b = Blobs(make_random_blobs())
    b.format_blobs(1)
    b.resolutions = np.array([[2.0, 1.0, 1.0]])
    b.basename = "sample"
    b.roi_offset = (0, 0, 0)
    b.roi_size = (50, 50, 50)
    b.path = str(tmp_path / "sample_blobs.npz")
    b.save_archive()

    b2 = Blobs().load_blobs(b.path)
    assert b2.ver == Blobs.BLOBS_NP_VER
    np.testing.assert_allclose(b2.blobs, b.blobs)
    assert b2.basename == "sample"
    assert list(b2.cols) == [c.value for c in BlobCols][:10]
    # archive key names match the reference vocabulary
    with np.load(b.path, allow_pickle=True) as arc:
        assert "segments" in arc.files
        assert "ver" in arc.files


def test_archive_v4_upgrade(tmp_path):
    # v4 archives stored abs-coord column names without the data columns
    blobs = make_random_blobs(5)
    cols = [c.value for c in BlobCols][:4] + ["abs_z", "abs_y", "abs_x"]
    path = str(tmp_path / "old_blobs.npz")
    np.savez(path, ver=4, segments=blobs, columns=cols)
    b = Blobs().load_blobs(path)
    assert b.ver == Blobs.BLOBS_NP_VER
    assert len(b.cols) == 4


def test_blob_roi_filters():
    blobs = Blobs(make_random_blobs()).format_blobs(0)
    inside, mask = get_blobs_in_roi(
        blobs, offset=(0, 0, 0), size=(25, 25, 25), reverse=False)
    assert np.all(inside[:, :3] < 25)
    assert mask.sum() == len(inside)

    interior = get_blobs_interior(blobs, (50, 50, 50), (5, 5, 5), (5, 5, 5))
    assert np.all(interior[:, :3] >= 5)
    assert np.all(interior[:, :3] < 45)


def test_duplicate_removal_and_sort():
    blobs = np.array([
        [1, 3, 4, 2.2], [1, 8, 5, 3.1], [1, 3, 4, 5.1],
        [1, 3, 5, 2.2], [3, 8, 5, 3.1]])
    unique = remove_duplicate_blobs(blobs, slice(0, 3))
    assert len(unique) == 4

    sorted_blobs, order = sort_blobs(blobs)
    assert np.all(np.diff(sorted_blobs[:, 0]) >= 0)


def test_blobs_in_channel():
    blobs = Blobs(make_random_blobs(10)).format_blobs(0)
    blobs[5:, 6] = 1  # channel column
    chl0 = Blobs.blobs_in_channel(blobs, 0)
    assert len(chl0) == 5
    both = Blobs.blobs_in_channel(blobs, [0, 1])
    assert len(both) == 10
