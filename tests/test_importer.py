"""TIFF codec + importer tests."""

import numpy as np
import pytest

from magellanmapper_tpu.io import importer, tiff


class TestTiff:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32,
                                       np.int16])
    def test_roundtrip_3d(self, tmp_path, rng, dtype):
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(0, np.iinfo(dtype).max,
                               (5, 20, 24)).astype(dtype)
        else:
            arr = rng.normal(size=(5, 20, 24)).astype(dtype)
        path = str(tmp_path / "t.tif")
        tiff.write_tiff(path, arr)
        back = tiff.read_tiff(path)
        np.testing.assert_array_equal(back, arr)

    def test_roundtrip_2d(self, tmp_path, rng):
        arr = rng.integers(0, 255, (16, 18)).astype(np.uint8)
        path = str(tmp_path / "t2.tif")
        tiff.write_tiff(path, arr)
        np.testing.assert_array_equal(tiff.read_tiff(path), arr)


class TestImporter:
    def test_import_tiff(self, tmp_path, rng):
        arr = rng.integers(0, 4000, (6, 24, 24)).astype(np.uint16)
        src = str(tmp_path / "stack.tif")
        tiff.write_tiff(src, arr)
        img5d = importer.import_tiff(
            src, out_path=str(tmp_path / "stack.npy"),
            resolutions=(2.0, 1.0, 1.0))
        assert img5d.img.shape == (1, 6, 24, 24)
        np.testing.assert_array_equal(np.asarray(img5d.img[0]), arr)
        np.testing.assert_allclose(img5d.resolutions[0], [2.0, 1.0, 1.0])

    def test_import_planes(self, tmp_path, rng):
        planes = []
        for i in range(4):
            p = rng.integers(0, 255, (10, 12)).astype(np.uint8)
            tiff.write_tiff(str(tmp_path / f"plane_{i:03d}.tif"), p)
            planes.append(p)
        files = importer.setup_import_dir(str(tmp_path))
        img5d = importer.import_planes_to_stack(
            files, str(tmp_path / "vol.npy"))
        assert img5d.img.shape == (1, 4, 10, 12)
        np.testing.assert_array_equal(
            np.asarray(img5d.img[0]), np.stack(planes))

    def test_import_raw(self, tmp_path, rng):
        arr = rng.random((4, 8, 8)).astype(np.float32)
        raw = str(tmp_path / "vol.raw")
        arr.tofile(raw)
        img5d = importer.import_raw(
            raw, (4, 8, 8), np.float32, out_path=str(tmp_path / "v.npy"))
        np.testing.assert_allclose(np.asarray(img5d.img[0]), arr)

    def test_deconstruct_img_name(self):
        base, offset, size = importer.deconstruct_img_name(
            "/d/brain_(10,20,30)x(40,50,60).npy")
        assert base == "/d/brain.npy"
        assert offset == [10, 20, 30]
        assert size == [40, 50, 60]
        name = importer.make_subimage_name(
            "/d/brain.npy", (10, 20, 30), (40, 50, 60))
        assert name == "/d/brain_(10,20,30)x(40,50,60).npy"


class TestLazyTiff:
    def test_lazy_pages_match_eager(self, tmp_path, rng):
        from magellanmapper_tpu.io import np_io
        arr = rng.integers(0, 60000, (6, 20, 24)).astype(np.uint16)
        path = str(tmp_path / "lazy.tif")
        tiff.write_tiff(path, arr)
        stack = np_io.read_tif(path)
        assert stack.shape == (6, 20, 24)
        np.testing.assert_array_equal(stack[2], arr[2])
        np.testing.assert_array_equal(stack[1:4], arr[1:4])
        np.testing.assert_array_equal(
            stack[2:5, 5:10, 0:7], arr[2:5, 5:10, 0:7])
        assert isinstance(stack.page(0), np.memmap)


class TestCompressedTiff:
    """Round-2: deflate/LZW/PackBits strips + predictor (ref np_io.py:646
    reads compressed stacks via tifffile)."""

    @staticmethod
    def _vol(rng, dtype):
        arr = (rng.random((4, 24, 36)) * 500).astype(dtype)
        arr[:, 5:10, 5:20] = 7  # long runs for RLE paths
        return arr

    def test_roundtrip_codecs(self, tmp_path, rng):
        for codec in ("deflate", "lzw", "packbits"):
            for dtype in (np.uint8, np.uint16, np.float32):
                arr = self._vol(rng, dtype)
                path = str(tmp_path / f"c_{codec}_{np.dtype(dtype)}.tif")
                tiff.write_tiff(path, arr, compression=codec)
                np.testing.assert_array_equal(tiff.read_tiff(path), arr)

    def test_compressed_smaller_on_runs(self, tmp_path):
        arr = np.zeros((2, 64, 64), np.uint16)
        arr[:, :8] = 3
        raw = str(tmp_path / "raw.tif")
        comp = str(tmp_path / "z.tif")
        tiff.write_tiff(raw, arr)
        tiff.write_tiff(comp, arr, compression="deflate")
        import os
        assert os.path.getsize(comp) < os.path.getsize(raw) / 4

    def test_lzw_known_stream(self):
        # hand-built TIFF-LZW stream: [Clear, 'A', 'B', EOI] at 9 bits
        data = bytes([0x80, 0x10, 0x48, 0x50, 0x10])
        assert tiff.lzw_decode(data) == b"AB"

    def test_lzw_encode_decode_long(self, rng):
        # exceeds one code width (table grows past 511 entries)
        payload = rng.integers(0, 8, 5000).astype(np.uint8).tobytes()
        assert tiff.lzw_decode(tiff.lzw_encode(payload)) == payload

    def test_packbits_vectors(self):
        # TIFF 6.0 spec-style vectors
        assert tiff.packbits_decode(
            tiff.packbits_encode(b"AAAAAAAAAAAB")) == b"AAAAAAAAAAAB"
        assert tiff.packbits_decode(bytes([0xFE, 0xAA])) == b"\xaa" * 3
        assert tiff.packbits_decode(bytes([0x02, 0x41, 0x42, 0x43])) \
            == b"ABC"

    def test_unpredict_horizontal_differencing(self):
        row = np.array([[10, 2, 3, 251]], np.uint8)  # deltas w/ wraparound
        out = tiff._unpredict(row, 2)
        np.testing.assert_array_equal(out, [[10, 12, 15, 10]])

    def test_lazy_stack_compressed(self, tmp_path, rng):
        arr = self._vol(rng, np.uint16)
        path = str(tmp_path / "lazy_lzw.tif")
        tiff.write_tiff(path, arr, compression="lzw")
        lazy = tiff.LazyTiffStack(path)
        assert lazy.shape == arr.shape
        np.testing.assert_array_equal(lazy.page(2), arr[2])
        np.testing.assert_array_equal(lazy[1:3], arr[1:3])


class TestPredictor:
    def test_unpredict_multisample_columns(self):
        """Predictor-2 undo must accumulate across image columns per
        sample for (h, w, spp) pages, not across the sample axis."""
        from magellanmapper_tpu.io.tiff import _unpredict
        rng = np.random.default_rng(5)
        page = rng.integers(0, 200, (4, 6, 3)).astype(np.uint8)
        diffed = page.copy()
        diffed[:, 1:, :] = np.diff(page, axis=1)
        np.testing.assert_array_equal(_unpredict(diffed, 2), page)
        # single-sample pages accumulate across the trailing (column) axis
        page2 = rng.integers(0, 200, (4, 6)).astype(np.uint16)
        diffed2 = page2.copy()
        diffed2[:, 1:] = np.diff(page2, axis=1)
        np.testing.assert_array_equal(_unpredict(diffed2, 2), page2)

    def test_unpredict_rejects_bad_inputs(self):
        from magellanmapper_tpu.io.tiff import _unpredict
        import pytest
        with pytest.raises(ValueError):
            _unpredict(np.zeros((2, 2), np.uint8), 3)
        with pytest.raises(ValueError):
            _unpredict(np.zeros((2, 2), np.float32), 2)


class TestCziLif:
    """Pure-Python CZI/LIF readers (reference Bioformats surface,
    magmap/io/importer.py:97-156 — no JVM in this environment)."""

    def test_czi_roundtrip_with_scaling(self, tmp_path):
        from magellanmapper_tpu.io import czi_lif
        rng = np.random.default_rng(0)
        img = (rng.random((5, 12, 16)) * 60000).astype(np.uint16)
        path = str(tmp_path / "t.czi")
        czi_lif.write_czi(path, img, resolutions=(2.0, 0.5, 0.5))
        back, meta = czi_lif.read_czi(path)
        np.testing.assert_array_equal(back, img)
        assert meta["resolutions"] == [2.0, 0.5, 0.5]

    def test_czi_multichannel(self, tmp_path):
        from magellanmapper_tpu.io import czi_lif
        rng = np.random.default_rng(1)
        img = (rng.random((3, 8, 8, 2)) * 255).astype(np.uint8)
        path = str(tmp_path / "c.czi")
        czi_lif.write_czi(path, img)
        back, _ = czi_lif.read_czi(path)
        np.testing.assert_array_equal(back, img)

    def test_lif_roundtrip(self, tmp_path):
        from magellanmapper_tpu.io import czi_lif
        rng = np.random.default_rng(2)
        img = (rng.random((4, 10, 12)) * 60000).astype(np.uint16)
        path = str(tmp_path / "t.lif")
        czi_lif.write_lif(path, img, name="SeriesA")
        back, meta = czi_lif.read_lif(path)
        np.testing.assert_array_equal(back, img)
        assert meta["name"] == "SeriesA"

    def test_import_czi_to_image5d(self, tmp_path):
        from magellanmapper_tpu.io import czi_lif
        rng = np.random.default_rng(3)
        img = (rng.random((4, 8, 8)) * 1000).astype(np.uint16)
        path = str(tmp_path / "imp.czi")
        czi_lif.write_czi(path, img, resolutions=(1.0, 0.5, 0.5))
        img5d = importer.import_czi(path, out_path=str(tmp_path / "imp"))
        np.testing.assert_array_equal(img5d.img[0], img)
        assert img5d.meta["resolutions"][0] == [1.0, 0.5, 0.5]

    def test_import_lif_cli_dispatch(self, tmp_path):
        from magellanmapper_tpu.io import czi_lif, cli
        rng = np.random.default_rng(4)
        img = (rng.random((3, 8, 8)) * 200).astype(np.uint8)
        path = str(tmp_path / "d.lif")
        czi_lif.write_lif(path, img)
        rc = cli.process_cli_args(
            ["--img", path, "--proc", "import_only",
             "--prefix", str(tmp_path / "out")])
        img5d = cli.process_tasks(rc)
        np.testing.assert_array_equal(img5d.img[0], img)

    def test_czi_mosaic_assembly(self, tmp_path):
        """Multi-subblock (tiled) CZI files assemble by each subblock's
        per-dimension start offsets."""
        import struct
        from magellanmapper_tpu.io import czi_lif
        rng = np.random.default_rng(7)
        full = (rng.random((3, 8, 12)) * 60000).astype(np.uint16)
        tiles = [((0, 0), full[:, :, :6]), ((0, 6), full[:, :, 6:])]

        def segment(sid, payload):
            alloc = (len(payload) + 31) // 32 * 32
            return (sid.ljust(16, b"\x00")
                    + struct.pack("<qq", alloc, len(payload))
                    + payload.ljust(alloc, b"\x00"))

        def subblock(y0, x0, arr):
            nz, ny, nx = arr.shape
            dims = [(b"C", 0, 1), (b"Z", 0, nz), (b"Y", y0, ny),
                    (b"X", x0, nx)]
            entry = b"DV" + struct.pack("<i", 1) + b"\x00" * 12 \
                + struct.pack("<i", 0) + b"\x00" * 6 \
                + struct.pack("<i", len(dims))
            for name, s0, size in dims:
                entry += name.ljust(4, b"\x00") \
                    + struct.pack("<ii", s0, size) \
                    + struct.pack("<fi", float(s0), size)
            data = arr.tobytes()
            head = struct.pack("<ii", 0, 0) \
                + struct.pack("<q", len(data)) + entry
            pad = max(256, len(head)) - len(head)
            return segment(b"ZISRAWSUBBLOCK",
                           head + b"\x00" * pad + data)

        path = str(tmp_path / "mosaic.czi")
        with open(path, "wb") as f:
            f.write(segment(b"ZISRAWFILE", b"\x00" * 64))
            for (y0, x0), arr in tiles:
                f.write(subblock(y0, x0, arr))
        back, meta = czi_lif.read_czi(path)
        np.testing.assert_array_equal(back, full)


class TestOmeTiff:
    """OME-TIFF dimension/calibration metadata (the reference reads
    this through Bioformats' OME store, importer.py:129; here the
    OME-XML block in ImageDescription parses natively). The XML in
    these fixtures is hand-written from the OME schema — a spec pin,
    not a writer round-trip."""

    @staticmethod
    def _ome_xml(sx, sy, sz, sc, st, order="XYZCT", phys=None):
        phys_attrs = ""
        if phys:
            phys_attrs = (
                ' PhysicalSizeX="%g" PhysicalSizeY="%g"'
                ' PhysicalSizeZ="%g"' % phys)
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/'
            '2016-06"><Image ID="Image:0"><Pixels ID="Pixels:0" '
            'DimensionOrder="%s" Type="uint16" SizeX="%d" SizeY="%d" '
            'SizeZ="%d" SizeC="%d" SizeT="%d"%s>'
            '<TiffData/></Pixels></Image></OME>'
            % (order, sx, sy, sz, sc, st, phys_attrs))

    @staticmethod
    def _pages(sz, sc, st, order, h=6, w=8):
        """Pages whose constant value encodes (t, z, c); page order
        follows the OME DimensionOrder (fastest axis first after XY)."""
        fast = [ax for ax in order[2:]]
        dims = {"Z": sz, "C": sc, "T": st}
        pages = []
        idx = {}
        n = sz * sc * st
        for p in range(n):
            rem = p
            for ax in fast:
                idx[ax] = rem % dims[ax]
                rem //= dims[ax]
            val = idx["T"] * 100 + idx["Z"] * 10 + idx["C"]
            pages.append(np.full((h, w), val, np.uint16))
        return np.stack(pages)

    @pytest.mark.parametrize("order", ["XYZCT", "XYCZT", "XYZTC"])
    def test_reshape_orders(self, tmp_path, order):
        from magellanmapper_tpu.io import importer
        sz, sc, st = 3, 2, 2
        pages = self._pages(sz, sc, st, order)
        path = str(tmp_path / f"ome_{order}.tif")
        tiff.write_tiff(
            path, pages,
            description=self._ome_xml(8, 6, sz, sc, st, order))
        img5d = importer.import_tiff(
            path, out_path=str(tmp_path / f"out_{order}"))
        assert img5d.img.shape == (st, sz, 6, 8, sc)
        for t in range(st):
            for z in range(sz):
                for c in range(sc):
                    assert int(img5d.img[t, z, 0, 0, c]) == \
                        t * 100 + z * 10 + c, (order, t, z, c)

    def test_physical_sizes_to_resolutions(self, tmp_path):
        from magellanmapper_tpu.io import importer
        pages = self._pages(2, 1, 1, "XYZCT")
        path = str(tmp_path / "cal.tif")
        tiff.write_tiff(
            path, pages, description=self._ome_xml(
                8, 6, 2, 1, 1, phys=(0.5, 0.6, 2.0)))
        img5d = importer.import_tiff(
            path, out_path=str(tmp_path / "cal_out"))
        # single channel squeezes; (T, Z, Y, X)
        assert img5d.img.shape == (1, 2, 6, 8)
        assert list(img5d.resolutions[0]) == pytest.approx(
            [2.0, 0.6, 0.5])

    def test_non_ome_description_ignored(self, tmp_path, rng):
        from magellanmapper_tpu.io import importer
        arr = (rng.random((3, 6, 8)) * 100).astype(np.uint16)
        path = str(tmp_path / "plain.tif")
        tiff.write_tiff(path, arr, description="just a note")
        img5d = importer.import_tiff(
            path, out_path=str(tmp_path / "plain_out"))
        assert img5d.img.shape == (1, 3, 6, 8)

    def test_page_count_mismatch_raises(self, tmp_path):
        from magellanmapper_tpu.io import importer
        pages = self._pages(2, 1, 1, "XYZCT")   # 2 pages
        path = str(tmp_path / "bad.tif")
        tiff.write_tiff(
            path, pages, description=self._ome_xml(8, 6, 5, 1, 1))
        with pytest.raises(ValueError, match="page count"):
            importer.import_tiff(
                path, out_path=str(tmp_path / "bad_out"))

    def test_description_roundtrip(self, tmp_path, rng):
        arr = (rng.random((2, 5, 7)) * 50).astype(np.uint16)
        path = str(tmp_path / "desc.tif")
        tiff.write_tiff(path, arr, description="hello tiff")
        out, desc = tiff.read_tiff(path, return_description=True)
        np.testing.assert_array_equal(out, arr)
        assert desc == "hello tiff"
