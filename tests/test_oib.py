"""Olympus OIB/OIF readers (JVM-format long tail).

OIB fixtures are assembled BYTE-BY-BYTE from the CFBF/OLE2 spec
(header, DIFAT, FAT chains, mini-FAT + root mini stream, 128-byte
directory entries) so the compound-file parser is pinned against the
container format, not a writer of ours. Streams under the 4096-byte
mini cutoff exercise the mini-FAT path; plane TIFFs above it exercise
regular FAT chains.
"""

import os
import struct

import numpy as np
import pytest

from magellanmapper_tpu.io import oib, tiff


# -- byte-level CFBF builder (v3: 512-byte sectors, 64-byte minis) -------

SS = 512
MS = 64
END = 0xFFFFFFFE
FREE = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def _pad(b: bytes, n: int, fill=b"\x00") -> bytes:
    return b + fill * (n - len(b))


def _dir_entry(name: str, obj_type: int, start: int, size: int,
               child: int = FREE) -> bytes:
    wname = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[:len(wname)] = wname
    struct.pack_into("<H", e, 64, len(wname))
    e[66] = obj_type
    e[67] = 1                    # black
    struct.pack_into("<I", e, 68, FREE)   # left sibling
    struct.pack_into("<I", e, 72, FREE)   # right sibling
    struct.pack_into("<I", e, 76, child)  # child
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def build_cfbf(streams) -> bytes:
    """Assemble a v3 compound file from ``{name: bytes}``; streams
    under 4096 bytes go through the mini stream + mini FAT."""
    big = {n: d for n, d in streams.items() if len(d) >= 4096}
    small = {n: d for n, d in streams.items() if len(d) < 4096}

    # mini stream: small streams at 64-byte mini sector granularity
    mini_container = b""
    mini_start = {}
    mini_fat = []
    for name, data in small.items():
        n_minis = max(1, -(-len(data) // MS))
        mini_start[name] = len(mini_fat)
        for i in range(n_minis - 1):
            mini_fat.append(len(mini_fat) + 1)
        mini_fat.append(END)
        mini_container += _pad(data, n_minis * MS)

    # sector plan: data sectors for big streams, mini container, mini
    # FAT, directory — then the FAT sector(s) at the end
    sectors = []          # raw sector payloads
    fat = []              # next-pointers parallel to sectors

    def add_chain(data: bytes) -> int:
        n = max(1, -(-len(data) // SS))
        first = len(sectors)
        for i in range(n):
            sectors.append(_pad(data[i * SS:(i + 1) * SS], SS))
            fat.append(first + i + 1 if i < n - 1 else END)
        return first

    big_start = {n: add_chain(d) for n, d in big.items()}
    mini_cont_start = add_chain(mini_container) if mini_container \
        else END
    minifat_start = add_chain(
        struct.pack("<%dI" % len(mini_fat), *mini_fat)) \
        if mini_fat else END

    entries = [_dir_entry("Root Entry", 5, mini_cont_start,
                          len(mini_container), child=1)]
    for name, data in streams.items():
        start = (big_start[name] if name in big
                 else mini_start[name])
        entries.append(_dir_entry(name, 2, start, len(data)))
    dir_start = add_chain(b"".join(entries))

    n_fat_sectors = -(-(len(sectors) + 1) // (SS // 4))
    fat_start = len(sectors)
    for i in range(n_fat_sectors):
        sectors.append(b"")   # placeholder
        fat.append(FATSECT)
    fat_words = fat + [FREE] * (n_fat_sectors * (SS // 4) - len(fat))
    for i in range(n_fat_sectors):
        sectors[fat_start + i] = struct.pack(
            "<%dI" % (SS // 4),
            *fat_words[i * (SS // 4):(i + 1) * (SS // 4)])

    header = bytearray(512)
    header[:8] = oib.OLE_MAGIC
    struct.pack_into("<H", header, 26, 3)        # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte minis
    struct.pack_into("<I", header, 44, n_fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, 1 if mini_fat else 0)
    struct.pack_into("<I", header, 68, END)      # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_start + i for i in range(n_fat_sectors)]
    difat += [FREE] * (109 - len(difat))
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)


def _tiff_bytes(plane: np.ndarray, tmp_path, tag: str) -> bytes:
    p = str(tmp_path / f"_{tag}.tif")
    tiff.write_tiff(p, plane[None])
    data = open(p, "rb").read()
    os.unlink(p)
    return data


class TestCompoundFile:
    def test_big_and_mini_streams_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        big = rng.integers(0, 255, 9000, dtype=np.uint8).tobytes()
        small = b"hello compound world"
        path = tmp_path / "t.oib"
        path.write_bytes(build_cfbf(
            {"BigStream": big, "SmallStream": small}))
        cf = oib.CompoundFile(str(path))
        assert set(cf.list_streams()) == {"BigStream", "SmallStream"}
        assert cf.read_stream("BigStream") == big
        assert cf.read_stream("SmallStream") == small

    def test_multi_sector_fat_chain_order(self, tmp_path):
        data = bytes(range(256)) * 10   # 2560 B... under cutoff
        big = (bytes(range(256)) * 64)  # 16 KiB -> 32 sectors
        path = tmp_path / "c.oib"
        path.write_bytes(build_cfbf({"A": big, "B": data}))
        cf = oib.CompoundFile(str(path))
        assert cf.read_stream("A") == big
        assert cf.read_stream("B") == data

    def test_rejects_non_ole(self, tmp_path):
        p = tmp_path / "x.oib"
        p.write_bytes(b"not an ole file" * 40)
        with pytest.raises(ValueError, match="OLE"):
            oib.CompoundFile(str(p))


class TestReadOib:
    def test_multiplane_stack(self, tmp_path):
        rng = np.random.default_rng(1)
        planes = rng.integers(0, 4000, (3, 48, 52), dtype=np.uint16)
        streams = {"OibInfo.txt":
                   "[Storage]\nplanes=3\n".encode("utf-16-le")}
        for z in range(3):
            streams[f"s_C001Z{z + 1:03d}.tif"] = _tiff_bytes(
                planes[z], tmp_path, f"z{z}")
        path = tmp_path / "stack.oib"
        path.write_bytes(build_cfbf(streams))
        arr, meta = oib.read_oib(str(path))
        np.testing.assert_array_equal(arr, planes)
        assert "planes=3" in meta["info"]

    def test_multichannel_timepoints(self, tmp_path):
        rng = np.random.default_rng(2)
        # 2 channels x 2 timepoints x 2 z
        grid = rng.integers(0, 255, (2, 2, 2, 40, 44), dtype=np.uint8)
        streams = {}
        for c in range(2):
            for t in range(2):
                for z in range(2):
                    streams[
                        f"s_C{c+1:03d}Z{z+1:03d}T{t+1:03d}.tif"] = \
                        _tiff_bytes(grid[c, t, z], tmp_path,
                                    f"{c}{t}{z}")
        path = tmp_path / "ct.oib"
        path.write_bytes(build_cfbf(streams))
        arr, meta = oib.read_oib(str(path))
        assert arr.shape == (2, 4, 40, 44)
        # T folds into Z slowest: (c, t*2+z)
        np.testing.assert_array_equal(
            arr, grid.reshape(2, 4, 40, 44))
        assert meta["components"] == 2

    def test_manifest_mapped_stream_names(self, tmp_path):
        """FluoView layout: streams named Stream0000N, mapped to plane
        filenames by the OibInfo.txt [OibSaveInfo] manifest."""
        rng = np.random.default_rng(6)
        planes = rng.integers(0, 4000, (2, 20, 24), dtype=np.uint16)
        manifest = ("[OibSaveInfo]\n"
                    "Stream00001=s_C001Z001.tif\n"
                    "Stream00002=s_C001Z002.tif\n")
        streams = {
            "OibInfo.txt": manifest.encode("utf-16-le"),
            # reversed insertion order: manifest indices must win
            "Stream00002": _tiff_bytes(planes[1], tmp_path, "m1"),
            "Stream00001": _tiff_bytes(planes[0], tmp_path, "m0"),
        }
        path = tmp_path / "fv.oib"
        path.write_bytes(build_cfbf(streams))
        arr, _ = oib.read_oib(str(path))
        np.testing.assert_array_equal(arr, planes)

    def test_embedded_oif_settings_give_resolutions(self, tmp_path):
        """The archive's embedded .oif main-settings stream supplies
        voxel calibration, like the unpacked OIF form."""
        planes = np.arange(2 * 8 * 8, dtype=np.uint16).reshape(2, 8, 8)
        settings = ("[Reference Image Parameter]\n"
                    "WidthConvertValue=0.41\n"
                    "[Axis 3 Parameters Common]\n"
                    'AxisCode="Z"\nInterval=2.0\n')
        streams = {
            "MainFile.oif": b"\xff\xfe" + settings.encode("utf-16-le"),
            "s_C001Z001.tif": _tiff_bytes(planes[0], tmp_path, "r0"),
            "s_C001Z002.tif": _tiff_bytes(planes[1], tmp_path, "r1"),
        }
        path = tmp_path / "res.oib"
        path.write_bytes(build_cfbf(streams))
        arr, meta = oib.read_oib(str(path))
        np.testing.assert_array_equal(arr, planes)
        assert meta["resolutions"] == pytest.approx((2.0, 0.41, 0.41))

    def test_no_planes_raises(self, tmp_path):
        path = tmp_path / "e.oib"
        path.write_bytes(build_cfbf({"Readme.txt": b"nothing here"}))
        with pytest.raises(ValueError, match="plane"):
            oib.read_oib(str(path))


class TestReadOif:
    def _write_oif(self, tmp_path, planes, ini_extra=""):
        files = tmp_path / "img.oif.files"
        files.mkdir()
        for z in range(planes.shape[0]):
            tiff.write_tiff(
                str(files / f"s_C001Z{z + 1:03d}.tif"), planes[z][None])
        ini = ("[Reference Image Parameter]\n"
               'WidthConvertValue=0.62\n'
               "[Axis 3 Parameters Common]\n"
               'AxisCode="Z"\nInterval=1.5\n' + ini_extra)
        main = tmp_path / "img.oif"
        main.write_bytes(b"\xff\xfe" + ini.encode("utf-16-le"))
        return str(main)

    def test_oif_stack_with_resolutions(self, tmp_path):
        rng = np.random.default_rng(3)
        planes = rng.integers(0, 4000, (4, 24, 28), dtype=np.uint16)
        main = self._write_oif(tmp_path, planes)
        arr, meta = oib.read_oif(main)
        np.testing.assert_array_equal(arr, planes)
        assert meta["resolutions"] == pytest.approx((1.5, 0.62, 0.62))

    def test_oif_missing_dir_raises(self, tmp_path):
        main = tmp_path / "lone.oif"
        main.write_bytes(b"\xff\xfe" + "[x]\n".encode("utf-16-le"))
        with pytest.raises(FileNotFoundError):
            oib.read_oif(str(main))


class TestImporterIntegration:
    def test_import_oib_cli(self, tmp_path):
        from magellanmapper_tpu.io import cli, np_io
        rng = np.random.default_rng(4)
        planes = rng.integers(0, 4000, (2, 16, 16), dtype=np.uint16)
        streams = {
            f"s_C001Z{z + 1:03d}.tif": _tiff_bytes(
                planes[z], tmp_path, f"i{z}")
            for z in range(2)}
        src = tmp_path / "img.oib"
        src.write_bytes(build_cfbf(streams))
        out_prefix = str(tmp_path / "imported")
        cli.main(["--img", str(src), "--proc", "import_only",
                  "--prefix", out_prefix])
        img5d = np_io.read_file(out_prefix)
        np.testing.assert_array_equal(np.asarray(img5d.img[0]), planes)
