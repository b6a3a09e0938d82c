"""System-libhdf5 engine (``io.hdf5_native``) and its interplay with
the pure-Python reader.

Fixture methodology: every file here is produced by the *reference C
library* (libhdf5 via ctypes), never by the pure reader's sibling
code — so the earliest-profile tests validate the pure-Python reader
against real libhdf5 output, and the latest-profile tests pin the
fallback path ``hdf5.read_ims`` takes for v2-object-header files
(reference imports IMS through Bioformats/libhdf5:
``/root/reference/magmap/io/importer.py:97-156``)."""

import numpy as np
import pytest

from magellanmapper_tpu.io import hdf5, hdf5_native

pytestmark = pytest.mark.skipif(
    not hdf5_native.available(),
    reason="no system libhdf5 in this image")


def _build_ims(path, libver, data_by_channel, sizes_zyx, ext=None):
    """Imaris-shaped tree: DataSet/ResolutionLevel 0/TimePoint 0/
    Channel N/Data + DataSetInfo/Image size attrs."""
    with hdf5_native.NativeHdf5Writer(str(path), libver=libver) as w:
        base = "DataSet/ResolutionLevel 0/TimePoint 0"
        for ci, vol in enumerate(data_by_channel):
            ch = f"{base}/Channel {ci}"
            w.write_dataset(f"{ch}/Data", vol,
                            chunks=(2,) + vol.shape[1:], gzip=4,
                            shuffle=True)
            for ax, size in zip("ZYX", sizes_zyx):
                w.write_attr(ch, f"ImageSize{ax}", str(size))
        w.create_group("DataSetInfo/Image")
        for ax, size in zip("ZYX", sizes_zyx):
            w.write_attr("DataSetInfo/Image", ax, str(size))
        if ext is not None:
            for key, val in ext.items():
                w.write_attr("DataSetInfo/Image", key, str(val))


class TestNativeEngine:

    def test_latest_gates_pure_reads_native(self, tmp_path):
        """'latest' bounds emit v2 object headers: the pure reader
        must refuse loudly and the native engine must read exactly."""
        path = tmp_path / "latest.h5"
        arr = np.arange(210, dtype=np.uint16).reshape(5, 6, 7)
        with hdf5_native.NativeHdf5Writer(
                str(path), libver="latest") as w:
            w.write_dataset("G/Data", arr, chunks=(2, 6, 7), gzip=4,
                            shuffle=True)
            w.write_attr("G", "Label", "hello")
            w.write_attr("G", "Level", np.float64(2.5))
        with pytest.raises(NotImplementedError):
            hdf5.Hdf5File(str(path)).list_group("/")
        with hdf5_native.NativeHdf5File(str(path)) as f:
            assert f.list_group("/") == ["G"]
            assert f.list_group("G") == ["Data"]
            out = f.read_dataset("G/Data")
            assert out.dtype == np.uint16
            np.testing.assert_array_equal(out, arr)
            attrs = f.attrs("G")
            assert hdf5._attr_str(attrs, "Label") == "hello"
            assert float(attrs["Level"]) == 2.5

    def test_earliest_profile_readable_by_pure_reader(self, tmp_path):
        """Cross-implementation pin: the pure-Python reader parses
        real libhdf5 default-profile output (chunked+gzip+shuffle,
        groups, S1-array attrs) byte-identically."""
        path = tmp_path / "default.h5"
        arr = (np.arange(720, dtype=np.float32).reshape(6, 10, 12)
               * 0.25)
        with hdf5_native.NativeHdf5Writer(str(path)) as w:
            w.write_dataset("A/B/Data", arr, chunks=(3, 10, 12),
                            gzip=6, shuffle=True)
            w.write_attr("A/B", "Note", "from-libhdf5")
        f = hdf5.Hdf5File(str(path))
        assert f.list_group("A") == ["B"]
        np.testing.assert_array_equal(f.read_dataset("A/B/Data"), arr)
        assert hdf5._attr_str(f.attrs("A/B"), "Note") == "from-libhdf5"
        # and the native engine agrees with itself
        with hdf5_native.NativeHdf5File(str(path)) as nf:
            np.testing.assert_array_equal(
                nf.read_dataset("A/B/Data"), arr)

    def test_dtype_round_trips(self, tmp_path):
        path = tmp_path / "types.h5"
        arrays = {
            "u8": np.arange(24, dtype=np.uint8).reshape(4, 6),
            "i32": (np.arange(24, dtype=np.int32) - 12).reshape(4, 6),
            "f64": np.linspace(-1, 1, 24).reshape(4, 6),
        }
        with hdf5_native.NativeHdf5Writer(
                str(path), libver="latest") as w:
            for name, a in arrays.items():
                w.write_dataset(name, a)
        with hdf5_native.NativeHdf5File(str(path)) as f:
            for name, a in arrays.items():
                out = f.read_dataset(name)
                assert out.dtype == a.dtype
                np.testing.assert_array_equal(out, a)

    def test_missing_paths_raise_keyerror(self, tmp_path):
        path = tmp_path / "miss.h5"
        with hdf5_native.NativeHdf5Writer(str(path)) as w:
            w.write_dataset("D", np.zeros(3, np.uint8))
        with hdf5_native.NativeHdf5File(str(path)) as f:
            with pytest.raises(KeyError):
                f.read_dataset("nope")
            with pytest.raises(KeyError):
                f.list_group("nope")
            with pytest.raises(KeyError):
                f.attrs("nope")


class TestReadImsFallback:

    def test_read_ims_latest_single_channel(self, tmp_path):
        """read_ims transparently falls back to the native engine on
        a 'latest'-format IMS, crops chunk padding, and derives
        resolutions from the ExtMin/ExtMax box."""
        path = tmp_path / "latest.ims"
        vol = np.arange(6 * 8 * 10, dtype=np.uint16).reshape(6, 8, 10)
        # stored padded to chunk multiples like Imaris (6->6, 8->8,
        # 10->10 kept; crop exercised via smaller declared sizes)
        _build_ims(path, "latest", [vol], sizes_zyx=(5, 8, 10),
                   ext={"ExtMin2": 0.0, "ExtMax2": 10.0,
                        "ExtMin1": 0.0, "ExtMax1": 8.0,
                        "ExtMin0": 0.0, "ExtMax0": 10.0})
        arr, meta = hdf5.read_ims(str(path))
        assert arr.shape == (5, 8, 10)
        np.testing.assert_array_equal(arr, vol[:5])
        assert meta["resolutions"] == (2.0, 1.0, 1.0)

    def test_read_ims_latest_multichannel(self, tmp_path):
        path = tmp_path / "latest_mc.ims"
        vols = [np.full((4, 5, 6), c, np.uint16) for c in (3, 9)]
        _build_ims(path, "latest", vols, sizes_zyx=(4, 5, 6))
        arr, meta = hdf5.read_ims(str(path))
        assert arr.shape == (2, 4, 5, 6)
        assert meta["components"] == 2
        np.testing.assert_array_equal(arr[1], vols[1])

    def test_read_ims_earliest_stays_pure(self, tmp_path, monkeypatch):
        """Default-profile IMS must NOT touch the native engine."""
        path = tmp_path / "plain.ims"
        vol = np.arange(60, dtype=np.uint16).reshape(3, 4, 5)
        _build_ims(path, "earliest", [vol], sizes_zyx=(3, 4, 5))

        def boom(*a, **k):
            raise AssertionError("native engine used for default file")

        monkeypatch.setattr(
            hdf5_native, "NativeHdf5File", boom)
        arr, _ = hdf5.read_ims(str(path))
        np.testing.assert_array_equal(arr, vol)

    def test_import_ims_latest_end_to_end(self, tmp_path):
        """importer.import_ims produces an Image5d from a latest-format
        file (reference flow: importer.py Bioformats IMS import)."""
        from magellanmapper_tpu.io import importer
        path = tmp_path / "vol.ims"
        vol = np.arange(120, dtype=np.uint16).reshape(4, 5, 6)
        _build_ims(path, "latest", [vol], sizes_zyx=(4, 5, 6),
                   ext={"ExtMin2": 0.0, "ExtMax2": 4.0,
                        "ExtMin1": 0.0, "ExtMax1": 5.0,
                        "ExtMin0": 0.0, "ExtMax0": 6.0})
        img5d = importer.import_ims(
            str(path), out_path=str(tmp_path / "out"))
        assert img5d.img[0].shape[:3] == (4, 5, 6)
        np.testing.assert_array_equal(
            np.asarray(img5d.img[0]).reshape(4, 5, 6), vol)
