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


class TestNativeTiffCodecs:
    def test_lzw_matches_python(self, rng):
        from magellanmapper_tpu import native
        from magellanmapper_tpu.io import tiff
        if native._load_tiff() is None:
            pytest.skip("libtiffcodec not built")
        for seed in range(3):
            r = np.random.default_rng(seed)
            payload = r.integers(0, 12, 40000).astype(np.uint8).tobytes()
            enc = tiff.lzw_encode(payload)
            assert native.lzw_decode(enc, len(payload) + 16) == payload
            assert tiff.lzw_decode(enc) == payload

    def test_lzw_known_stream(self):
        from magellanmapper_tpu import native
        if native._load_tiff() is None:
            pytest.skip("libtiffcodec not built")
        data = bytes([0x80, 0x10, 0x48, 0x50, 0x10])
        assert native.lzw_decode(data, 16) == b"AB"

    def test_packbits_matches_python(self, rng):
        from magellanmapper_tpu import native
        from magellanmapper_tpu.io import tiff
        if native._load_tiff() is None:
            pytest.skip("libtiffcodec not built")
        payload = b"A" * 500 + bytes(range(100)) + b"B" * 3
        enc = tiff.packbits_encode(payload)
        assert native.packbits_decode(enc, len(payload) + 16) == payload

    def test_decode_speed_vs_python(self):
        """The native LZW decoder must be at least 10x the Python loop
        (the reason it exists)."""
        import time
        from magellanmapper_tpu import native
        from magellanmapper_tpu.io import tiff
        if native._load_tiff() is None:
            pytest.skip("libtiffcodec not built")
        r = np.random.default_rng(0)
        payload = r.integers(0, 6, 150_000).astype(np.uint8).tobytes()
        enc = tiff.lzw_encode(payload)
        t0 = time.perf_counter()
        out_c = native.lzw_decode(enc, len(payload) + 16)
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_py = tiff.lzw_decode(enc)
        t_py = time.perf_counter() - t0
        assert out_c == out_py == payload
        assert t_py / max(t_c, 1e-9) > 10

    def test_tiff_roundtrip_uses_native(self, tmp_path, rng):
        from magellanmapper_tpu.io import tiff
        arr = (rng.random((3, 64, 80)) * 900).astype(np.uint16)
        path = str(tmp_path / "n.tif")
        tiff.write_tiff(path, arr, compression="lzw")
        np.testing.assert_array_equal(tiff.read_tiff(path), arr)
