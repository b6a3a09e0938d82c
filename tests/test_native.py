"""Native blockio tests."""

import numpy as np
import pytest

from magellanmapper_tpu import native


class TestBlockIO:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
    def test_matches_numpy_gather(self, rng, dtype):
        vol = (rng.random((30, 40, 40)) * 100).astype(dtype)
        starts = np.array([[0, 0, 0], [10, 15, 20], [14, 24, 24]])
        bs = (16, 16, 16)
        out = native.extract_blocks(vol, starts, bs)
        for i, (z, y, x) in enumerate(starts):
            np.testing.assert_array_equal(
                out[i], vol[z:z+16, y:y+16, x:x+16].astype(np.float32))

    def test_strided_view(self, rng):
        base = rng.random((20, 30, 30, 2)).astype(np.float32)
        vol = base[..., 1]  # non-contiguous channel view
        starts = np.array([[2, 3, 4]])
        out = native.extract_blocks(vol, starts, (8, 8, 8))
        np.testing.assert_array_equal(out[0], vol[2:10, 3:11, 4:12])

    def test_memmap_source(self, rng, tmp_path):
        vol = rng.integers(0, 1000, (16, 32, 32)).astype(np.uint16)
        path = str(tmp_path / "v.npy")
        np.save(path, vol)
        mm = np.load(path, mmap_mode="r")
        out = native.extract_blocks(mm, np.array([[0, 0, 0]]), (8, 8, 8))
        np.testing.assert_array_equal(
            out[0], vol[:8, :8, :8].astype(np.float32))
