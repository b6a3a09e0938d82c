"""Minimal HDF5 reader + Imaris IMS (JVM-format long tail).

Fixtures are assembled BYTE-BY-BYTE from the HDF5 File Format
Specification (superblock v0, v1 object headers + messages, symbol-
table groups over TREE/SNOD/HEAP, contiguous and chunked-v1-B-tree
layouts, gzip/shuffle filter pipelines, v1 attributes) — the same
spec-stream methodology as the CZI/ND2/OIB tests, so the reader is
pinned against the format, not a writer of ours.
"""

import struct
import zlib

import numpy as np
import pytest

from magellanmapper_tpu.io import hdf5


# -- byte-level HDF5 builder --------------------------------------------

class H5Builder:
    def __init__(self):
        # superblock occupies [0, 96); objects start 8-aligned after
        self.buf = bytearray(96)

    def _align(self):
        while len(self.buf) % 8:
            self.buf.append(0)

    def add(self, data: bytes) -> int:
        self._align()
        addr = len(self.buf)
        self.buf += data
        return addr

    # -- messages -------------------------------------------------------

    @staticmethod
    def msg(mtype: int, body: bytes) -> bytes:
        pad = (-len(body)) % 8
        return (struct.pack("<HHB3x", mtype, len(body) + pad, 0)
                + body + b"\x00" * pad)

    @staticmethod
    def dataspace(shape) -> bytes:
        return (struct.pack("<BB6x", 1, len(shape))
                + b"".join(struct.pack("<Q", s) for s in shape))

    @staticmethod
    def datatype(dt: np.dtype) -> bytes:
        dt = np.dtype(dt)
        if dt.kind in "ui":
            cls = 0
            bits = 0x08 if dt.kind == "i" else 0
            props = struct.pack("<HH", 0, dt.itemsize * 8)
        elif dt.kind == "f":
            cls = 1
            bits = 0x20   # arbitrary mantissa norm bit
            props = struct.pack("<HHBBBBH", 0, dt.itemsize * 8,
                                0, 23, 23, 8, 127)
        elif dt.kind == "S":
            cls = 3
            bits = 0
            props = b""
        else:
            raise ValueError(dt)
        return (struct.pack("<BBBBI", (1 << 4) | cls, bits, 0, 0,
                            dt.itemsize) + props)

    def attribute(self, name: str, value: np.ndarray) -> bytes:
        value = np.asarray(value)
        nb = name.encode() + b"\x00"
        dt = self.datatype(value.dtype)
        ds = self.dataspace(value.shape)

        def p8(b):
            return b + b"\x00" * ((-len(b)) % 8)

        return (struct.pack("<BxHHH", 1, len(nb), len(dt), len(ds))
                + p8(nb) + p8(dt) + p8(ds) + value.tobytes())

    def object_header(self, messages) -> int:
        body = b"".join(messages)
        hdr = struct.pack("<BxHII4x", 1, len(messages), 1, len(body))
        return self.add(hdr + body)

    # -- datasets -------------------------------------------------------

    def dataset(self, arr: np.ndarray, attrs=None, chunk=None,
                gzip=False, shuffle=False) -> int:
        msgs = [self.msg(0x0001, self.dataspace(arr.shape)),
                self.msg(0x0003, self.datatype(arr.dtype))]
        if chunk is None:
            addr = self.add(arr.tobytes())
            msgs.append(self.msg(0x0008, struct.pack(
                "<BBQQ", 3, 1, addr, arr.nbytes)))
        else:
            filters = ([2] if shuffle else []) + ([1] if gzip else [])
            if filters:
                fb = struct.pack("<BB6x", 1, len(filters))
                for fid in filters:
                    vals = (1,) if fid == 1 else (arr.itemsize,)
                    fb += struct.pack("<HHHH", fid, 0, 1, len(vals))
                    fb += b"".join(struct.pack("<I", v) for v in vals)
                    if len(vals) % 2:
                        fb += b"\x00" * 4
                msgs.append(self.msg(0x000B, fb))
            entries = []
            rank = arr.ndim
            for offs in np.ndindex(*[-(-s // c) for s, c in
                                     zip(arr.shape, chunk)]):
                origin = [o * c for o, c in zip(offs, chunk)]
                block = np.zeros(chunk, arr.dtype)
                sl = tuple(slice(o, min(o + c, s))
                           for o, c, s in zip(origin, chunk, arr.shape))
                block[tuple(slice(0, s.stop - s.start) for s in sl)] = \
                    arr[sl]
                raw = block.tobytes()
                if shuffle:
                    a = np.frombuffer(raw, np.uint8)
                    raw = a.reshape(-1, arr.itemsize).T.tobytes()
                if gzip:
                    raw = zlib.compress(raw)
                caddr = self.add(raw)
                entries.append((len(raw), origin, caddr))
            # chunk B-tree: single level-0 node
            node = struct.pack("<4sBBH", b"TREE", 1, 0, len(entries))
            node += struct.pack("<QQ", hdf5.UNDEF, hdf5.UNDEF)
            for size, origin, caddr in entries:
                node += struct.pack("<II", size, 0)
                node += b"".join(
                    struct.pack("<Q", o) for o in origin)
                node += struct.pack("<Q", 0)    # element-size key dim
                node += struct.pack("<Q", caddr)
            # final key
            node += struct.pack("<II", 0, 0) + b"\x00" * 8 * (rank + 1)
            btree = self.add(node)
            layout = struct.pack("<BBB", 3, 2, rank + 1)
            layout += struct.pack("<Q", btree)
            layout += b"".join(struct.pack("<I", c) for c in chunk)
            layout += struct.pack("<I", arr.itemsize)
            msgs.append(self.msg(0x0008, layout))
        for name, val in (attrs or {}).items():
            msgs.append(self.msg(0x000C, self.attribute(name, val)))
        return self.object_header(msgs)

    # -- groups ---------------------------------------------------------

    def group(self, children, attrs=None) -> int:
        """``children``: {name: object header address}."""
        heap_data = bytearray(b"\x00" * 8)   # offset 0 = empty name
        offsets = {}
        for name in children:
            offsets[name] = len(heap_data)
            nb = name.encode() + b"\x00"
            heap_data += nb + b"\x00" * ((-len(nb)) % 8)
        heap_data_addr = self.add(bytes(heap_data))
        heap = self.add(struct.pack(
            "<4sB3xQQQ", b"HEAP", 0, len(heap_data),
            len(heap_data), heap_data_addr))
        snod = struct.pack("<4sBBH", b"SNOD", 1, 0, len(children))
        for name in sorted(children):
            snod += struct.pack("<QQ", offsets[name], children[name])
            snod += b"\x00" * 24
        snod_addr = self.add(snod)
        node = struct.pack("<4sBBH", b"TREE", 0, 0, 1)
        node += struct.pack("<QQ", hdf5.UNDEF, hdf5.UNDEF)
        node += struct.pack("<Q", 0)            # key 0
        node += struct.pack("<QQ", snod_addr, 0)  # child + key 1
        btree = self.add(node)
        msgs = [self.msg(0x0011, struct.pack("<QQ", btree, heap))]
        for name, val in (attrs or {}).items():
            msgs.append(self.msg(0x000C, self.attribute(name, val)))
        return self.object_header(msgs)

    def finish(self, root_addr: int) -> bytes:
        sb = bytearray(96)
        sb[:8] = hdf5.SIGNATURE
        sb[13] = 8   # offset size
        sb[14] = 8   # length size
        struct.pack_into("<HH", sb, 16, 4, 16)    # leaf/internal k
        struct.pack_into("<Q", sb, 24, 0)         # base address
        struct.pack_into("<Q", sb, 40, len(self.buf))   # EOF
        struct.pack_into("<Q", sb, 48, hdf5.UNDEF)      # driver info
        struct.pack_into("<Q", sb, 56, 0)         # link name offset
        struct.pack_into("<Q", sb, 64, root_addr)
        struct.pack_into("<I", sb, 72, 1)         # cached stab
        self.buf[:96] = sb
        return bytes(self.buf)


def _s1(text: str) -> np.ndarray:
    """Imaris-style one-char-per-element string attribute."""
    return np.frombuffer(text.encode(), "S1")


class TestHdf5Core:
    def test_contiguous_dataset_and_groups(self, tmp_path):
        b = H5Builder()
        arr = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
        ds = b.dataset(arr, attrs={"note": _s1("hi")})
        inner = b.group({"Data": ds})
        root = b.group({"grp": inner})
        path = tmp_path / "a.h5"
        path.write_bytes(b.finish(root))
        f = hdf5.Hdf5File(str(path))
        assert f.list_group("/") == ["grp"]
        assert f.list_group("/grp") == ["Data"]
        out = f.read_dataset("grp/Data")
        np.testing.assert_array_equal(out, arr)
        assert bytes(f.attrs("grp/Data")["note"].reshape(-1)[0]) == b"h"

    @pytest.mark.parametrize("gzip,shuffle", [
        (False, False), (True, False), (True, True)])
    def test_chunked_dataset(self, tmp_path, gzip, shuffle):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 60000, (5, 7, 6), dtype=np.uint16)
        b = H5Builder()
        ds = b.dataset(arr, chunk=(2, 3, 4), gzip=gzip,
                       shuffle=shuffle)
        root = b.group({"D": ds})
        path = tmp_path / "c.h5"
        path.write_bytes(b.finish(root))
        out = hdf5.Hdf5File(str(path)).read_dataset("D")
        np.testing.assert_array_equal(out, arr)

    def test_float_dataset(self, tmp_path):
        arr = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
        b = H5Builder()
        root = b.group({"F": b.dataset(arr)})
        path = tmp_path / "f.h5"
        path.write_bytes(b.finish(root))
        out = hdf5.Hdf5File(str(path)).read_dataset("F")
        np.testing.assert_allclose(out, arr)

    def test_unknown_filter_raises(self, tmp_path):
        arr = np.zeros((2, 2), np.uint16)
        b = H5Builder()
        ds = b.dataset(arr, chunk=(2, 2))
        # splice an unsupported filter id into the pipeline message
        root = b.group({"D": ds})
        raw = bytearray(b.finish(root))
        path = tmp_path / "u.h5"
        fb = H5Builder.msg(0x000B, struct.pack(
            "<BB6xHHHH", 1, 1, 32005, 0, 1, 0))
        # rebuild with the filter message present instead
        b2 = H5Builder()
        msgs = [b2.msg(0x0001, b2.dataspace(arr.shape)),
                b2.msg(0x0003, b2.datatype(arr.dtype))]
        caddr = b2.add(arr.tobytes())
        node = struct.pack("<4sBBH", b"TREE", 1, 0, 1)
        node += struct.pack("<QQ", hdf5.UNDEF, hdf5.UNDEF)
        node += struct.pack("<II", arr.nbytes, 0)
        node += struct.pack("<QQQ", 0, 0, 0)
        node += struct.pack("<Q", caddr)
        node += struct.pack("<II", 0, 0) + b"\x00" * 24
        btree = b2.add(node)
        layout = (struct.pack("<BBB", 3, 2, 3)
                  + struct.pack("<Q", btree)
                  + struct.pack("<III", 2, 2, arr.itemsize))
        msgs.append(b2.msg(0x0008, layout))
        msgs.append(fb)
        ds2 = b2.object_header(msgs)
        root2 = b2.group({"D": ds2})
        path.write_bytes(b2.finish(root2))
        with pytest.raises(NotImplementedError, match="filter"):
            hdf5.Hdf5File(str(path)).read_dataset("D")

    def test_not_hdf5_raises(self, tmp_path):
        p = tmp_path / "x.h5"
        p.write_bytes(b"junk" * 100)
        with pytest.raises(ValueError, match="HDF5"):
            hdf5.Hdf5File(str(p))


def build_ims(tmp_path, vols, sizes=None, ext=None, chunk=(2, 4, 4)):
    """Imaris-layout fixture: /DataSet/ResolutionLevel 0/TimePoint 0/
    Channel N/Data (chunk-padded, gzip) + /DataSetInfo/Image attrs."""
    b = H5Builder()
    channels = {}
    for ci, vol in enumerate(vols):
        padded_shape = [-(-s // c) * c for s, c in
                        zip(vol.shape, chunk)]
        padded = np.zeros(padded_shape, vol.dtype)
        padded[tuple(slice(0, s) for s in vol.shape)] = vol
        attrs = {f"ImageSize{ax}": _s1(str(s))
                 for ax, s in zip("ZYX", vol.shape)}
        ds = b.dataset(padded, chunk=chunk, gzip=True)
        # Channel group holds Data + the size attrs
        channels[f"Channel {ci}"] = b.group({"Data": ds}, attrs=attrs)
    tp = b.group(channels)
    rl = b.group({"TimePoint 0": tp})
    dataset = b.group({"ResolutionLevel 0": rl})
    img_attrs = {}
    if sizes:
        img_attrs.update({ax: _s1(str(s))
                          for ax, s in zip("XYZ", sizes)})
    if ext:
        for i, (lo, hi) in enumerate(ext):
            img_attrs[f"ExtMin{i}"] = _s1(str(lo))
            img_attrs[f"ExtMax{i}"] = _s1(str(hi))
    info = b.group({"Image": b.group({}, attrs=img_attrs)})
    root = b.group({"DataSet": dataset, "DataSetInfo": info})
    path = tmp_path / "img.ims"
    path.write_bytes(b.finish(root))
    return str(path)


class TestReadIms:
    def test_single_channel_chunkpad_cropped(self, tmp_path):
        rng = np.random.default_rng(2)
        vol = rng.integers(0, 60000, (3, 6, 5), dtype=np.uint16)
        path = build_ims(tmp_path, [vol])
        arr, meta = hdf5.read_ims(path)
        np.testing.assert_array_equal(arr, vol)   # pad cropped away
        assert meta["components"] == 1

    def test_multichannel_with_resolutions(self, tmp_path):
        rng = np.random.default_rng(3)
        vols = [rng.integers(0, 255, (2, 4, 4), dtype=np.uint8)
                for _ in range(2)]
        # ext: x [0,8], y [0,12], z [0,5] -> res (2.5, 3.0, 2.0)
        path = build_ims(
            tmp_path, vols,
            ext=[(0.0, 8.0), (0.0, 12.0), (0.0, 5.0)])
        arr, meta = hdf5.read_ims(path)
        assert arr.shape == (2, 2, 4, 4)
        np.testing.assert_array_equal(arr[1], vols[1])
        assert meta["resolutions"] == pytest.approx((2.5, 3.0, 2.0))

    def test_resolution_level_selects_pyramid(self, tmp_path):
        rng = np.random.default_rng(7)
        full = rng.integers(0, 60000, (4, 8, 8), dtype=np.uint16)
        half = full[::2, ::2, ::2]
        b = H5Builder()

        def chan(vol):
            attrs = {f"ImageSize{ax}": _s1(str(s))
                     for ax, s in zip("ZYX", vol.shape)}
            pad = [-(-s // c) * c for s, c in zip(vol.shape, (2, 4, 4))]
            p = np.zeros(pad, vol.dtype)
            p[tuple(slice(0, s) for s in vol.shape)] = vol
            return b.group(
                {"Data": b.dataset(p, chunk=(2, 4, 4), gzip=True)},
                attrs=attrs)

        rl0 = b.group({"TimePoint 0": b.group(
            {"Channel 0": chan(full)})})
        rl1 = b.group({"TimePoint 0": b.group(
            {"Channel 0": chan(half)})})
        root = b.group({"DataSet": b.group(
            {"ResolutionLevel 0": rl0, "ResolutionLevel 1": rl1})})
        path = tmp_path / "pyr.ims"
        path.write_bytes(b.finish(root))
        arr0, _ = hdf5.read_ims(str(path), resolution_level=0)
        arr1, _ = hdf5.read_ims(str(path), resolution_level=1)
        np.testing.assert_array_equal(arr0, full)
        np.testing.assert_array_equal(arr1, half)

    def test_missing_channels_raise(self, tmp_path):
        b = H5Builder()
        tp = b.group({})
        rl = b.group({"TimePoint 0": tp})
        root = b.group({"DataSet": b.group({"ResolutionLevel 0": rl})})
        path = tmp_path / "empty.ims"
        path.write_bytes(b.finish(root))
        with pytest.raises(ValueError, match="channel"):
            hdf5.read_ims(str(path))


class TestImporterIntegration:
    def test_import_ims_cli(self, tmp_path):
        from magellanmapper_tpu.io import cli, np_io
        rng = np.random.default_rng(5)
        vol = rng.integers(0, 60000, (3, 8, 8), dtype=np.uint16)
        src = build_ims(tmp_path, [vol])
        out_prefix = str(tmp_path / "imported")
        cli.main(["--img", src, "--proc", "import_only",
                  "--prefix", out_prefix])
        img5d = np_io.read_file(out_prefix)
        np.testing.assert_array_equal(np.asarray(img5d.img[0]), vol)
