"""Nikon ND2 chunk-map reader (round-4 VERDICT item 5).

Fixtures are built BYTE-BY-BYTE from the container spec (chunk headers,
end-of-file chunk map, lite-variant metadata encoding) — the same
spec-stream methodology as the CZI zstd tests — so the reader is pinned
against the format, not against its own writer.

Reference path: ``/root/reference/magmap/io/importer.py:97-156,1127``
(ND2 through Bioformats/JVM).
"""

import struct

import numpy as np
import pytest

from magellanmapper_tpu.io import nd2


# -- spec-stream fixture builders (byte-level, independent of io.nd2) ----

MAGIC = 0x0ABECEDA
SIG = b"ND2 CHUNK MAP SIGNATURE 0000001!"


def _chunk(name: bytes, data: bytes) -> bytes:
    return struct.pack("<IIQ", MAGIC, len(name), len(data)) + name + data


def _lv_item(name: str, value, dtype: int) -> bytes:
    wname = (name + "\x00").encode("utf-16-le")
    head = struct.pack("<BB", dtype, len(name) + 1) + wname
    if dtype == 1:
        return head + struct.pack("<B", int(value))
    if dtype == 2:
        return head + struct.pack("<i", value)
    if dtype == 3:
        return head + struct.pack("<I", value)
    if dtype == 5:
        return head + struct.pack("<Q", value)
    if dtype == 6:
        return head + struct.pack("<d", value)
    if dtype == 8:
        return head + (value + "\x00").encode("utf-16-le")
    raise ValueError(dtype)


def _lv_level(name: str, items: list) -> bytes:
    body = b"".join(items)
    wname = (name + "\x00").encode("utf-16-le")
    head = struct.pack("<BB", 11, len(name) + 1) + wname
    # <count:u32> <byte_len:u64>, items, trailing u64 offset index
    index = struct.pack("<%dQ" % len(items), *range(len(items)))
    return (head + struct.pack("<IQ", len(items), len(body) + len(index))
            + body + index)


def _attributes(width, height, comp=1, bpc=16, n_seq=1,
                stride=None, compression=None) -> bytes:
    stride = stride if stride is not None else width * comp * (bpc // 8)
    items = [
        _lv_item("uiWidth", width, 3),
        _lv_item("uiWidthBytes", stride, 3),
        _lv_item("uiHeight", height, 3),
        _lv_item("uiComp", comp, 3),
        _lv_item("uiBpcInMemory", bpc, 3),
        _lv_item("uiBpcSignificant", bpc, 3),
        _lv_item("uiSequenceCount", n_seq, 3),
    ]
    if compression is not None:
        items.append(_lv_item("eCompression", compression, 2))
    return _lv_level("SLxImageAttributes", items)


def _build_nd2(planes, attrs: bytes, extra_chunks=(),
               stride=None) -> bytes:
    """Assemble a chunk-map ND2: signature chunk, attribute + plane
    chunks, the chunk map, and the 40-byte tail."""
    chunks = [(b"ND2 FILE SIGNATURE CHUNK NAME01!",
               b"Ver3.0\x00")]
    chunks.append((b"ImageAttributesLV!", attrs))
    for i, plane in enumerate(planes):
        if stride is None:
            pix = plane.tobytes()
        else:
            rows = []
            for r in plane.reshape(plane.shape[0], -1):
                raw = r.tobytes()
                rows.append(raw + b"\x00" * (stride - len(raw)))
            pix = b"".join(rows)
        chunks.append((
            b"ImageDataSeq|%d!" % i,
            struct.pack("<d", 1000.0 * i) + pix))
    chunks.extend(extra_chunks)

    blob = b""
    offsets = {}
    for name, data in chunks:
        offsets[name] = len(blob)
        blob += _chunk(name, data)
    map_data = b"".join(
        name + struct.pack("<QQ", off, 16 + len(name))
        for name, off in offsets.items())
    map_data += SIG + struct.pack("<QQ", 0, 0)
    map_offset = len(blob)
    blob += _chunk(SIG, map_data)
    blob += SIG + struct.pack("<Q", map_offset)
    return blob


class TestLiteVariant:
    def test_scalar_types_roundtrip(self):
        data = b"".join([
            _lv_item("flag", True, 1),
            _lv_item("i", -7, 2),
            _lv_item("u", 42, 3),
            _lv_item("q", 1 << 40, 5),
            _lv_item("d", 2.5, 6),
            _lv_item("s", "hello", 8),
        ])
        out = nd2.parse_lite_variant(data)
        assert out == {"flag": True, "i": -7, "u": 42, "q": 1 << 40,
                       "d": 2.5, "s": "hello"}

    def test_nested_level(self):
        data = _lv_level("outer", [
            _lv_item("a", 1, 3),
            _lv_level("inner", [_lv_item("b", 2, 3)]),
            _lv_item("c", 3, 3)])
        out = nd2.parse_lite_variant(data)
        assert out == {"outer": {"a": 1, "inner": {"b": 2}, "c": 3}}


class TestReadNd2:
    def test_uint16_stack_spec_stream(self, tmp_path):
        rng = np.random.default_rng(0)
        planes = rng.integers(0, 65535, (3, 4, 6), dtype=np.uint16)
        path = tmp_path / "a.nd2"
        path.write_bytes(_build_nd2(
            list(planes), _attributes(6, 4, n_seq=3)))
        arr, meta = nd2.read_nd2(str(path))
        np.testing.assert_array_equal(arr, planes)
        assert meta["sequence_count"] == 3

    def test_multichannel_interleaved(self, tmp_path):
        rng = np.random.default_rng(1)
        # (Z, Y, X, C) interleaved in-file; reader returns (C, Z, Y, X)
        zyxc = rng.integers(0, 255, (2, 3, 5, 2), dtype=np.uint8)
        path = tmp_path / "c.nd2"
        path.write_bytes(_build_nd2(
            list(zyxc), _attributes(5, 3, comp=2, bpc=8, n_seq=2)))
        arr, meta = nd2.read_nd2(str(path))
        assert arr.shape == (2, 2, 3, 5)
        np.testing.assert_array_equal(arr, np.moveaxis(zyxc, -1, 0))
        assert meta["components"] == 2

    def test_padded_row_stride(self, tmp_path):
        data = np.arange(2 * 3 * 5, dtype=np.uint16).reshape(2, 3, 5)
        stride = 5 * 2 + 6   # rows padded past width*itemsize
        path = tmp_path / "p.nd2"
        path.write_bytes(_build_nd2(
            list(data), _attributes(5, 3, n_seq=2, stride=stride),
            stride=stride))
        arr, _ = nd2.read_nd2(str(path))
        np.testing.assert_array_equal(arr, data)

    def test_float32_components(self, tmp_path):
        data = np.linspace(0, 1, 24, dtype=np.float32).reshape(1, 4, 6)
        path = tmp_path / "f.nd2"
        path.write_bytes(_build_nd2(
            list(data), _attributes(6, 4, bpc=32, n_seq=1)))
        arr, _ = nd2.read_nd2(str(path))
        assert arr.dtype == np.float32
        np.testing.assert_array_equal(arr, data)

    def test_calibration_resolutions(self, tmp_path):
        data = np.zeros((1, 2, 2), np.uint16)
        cal_chunk = (b"ImageCalibrationLV|0!", _lv_level(
            "SLxCalibration", [_lv_item("dCalibration", 0.65, 6)]))
        path = tmp_path / "r.nd2"
        path.write_bytes(_build_nd2(
            list(data), _attributes(2, 2, n_seq=1),
            extra_chunks=[cal_chunk]))
        _, meta = nd2.read_nd2(str(path))
        assert meta["resolutions"] == pytest.approx((0.65,) * 3)

    def test_compressed_gated(self, tmp_path):
        data = np.zeros((1, 2, 2), np.uint16)
        path = tmp_path / "z.nd2"
        path.write_bytes(_build_nd2(
            list(data), _attributes(2, 2, n_seq=1, compression=0)))
        with pytest.raises(NotImplementedError, match="Bioformats"):
            nd2.read_nd2(str(path))

    def test_legacy_file_gated(self, tmp_path):
        path = tmp_path / "old.nd2"
        path.write_bytes(b"\x00" * 4096)
        with pytest.raises(NotImplementedError, match="legacy"):
            nd2.read_nd2(str(path))

    def test_chunkmap_trusted_over_attributes(self, tmp_path):
        """Sequence count from the chunk map wins when attributes lag
        (aborted acquisitions write fewer planes than announced)."""
        data = np.arange(2 * 2 * 3, dtype=np.uint16).reshape(2, 2, 3)
        path = tmp_path / "t.nd2"
        path.write_bytes(_build_nd2(
            list(data), _attributes(3, 2, n_seq=5)))
        arr, meta = nd2.read_nd2(str(path))
        assert arr.shape == (2, 2, 3)
        assert meta["sequence_count"] == 2


class TestImporterIntegration:
    def test_import_nd2_to_image5d(self, tmp_path):
        from magellanmapper_tpu.io import importer
        rng = np.random.default_rng(4)
        planes = rng.integers(0, 4000, (3, 8, 10), dtype=np.uint16)
        src = tmp_path / "img.nd2"
        src.write_bytes(_build_nd2(
            list(planes), _attributes(10, 8, n_seq=3)))
        img5d = importer.import_nd2(
            str(src), out_path=str(tmp_path / "out"))
        assert img5d.img.shape == (1, 3, 8, 10)
        np.testing.assert_array_equal(np.asarray(img5d.img[0]), planes)

    def test_cli_import_dispatch(self, tmp_path):
        from magellanmapper_tpu.io import cli
        planes = np.arange(2 * 4 * 4, dtype=np.uint16).reshape(2, 4, 4)
        src = tmp_path / "img.nd2"
        src.write_bytes(_build_nd2(
            list(planes), _attributes(4, 4, n_seq=2)))
        out_prefix = str(tmp_path / "imported")
        cli.main([
            "--img", str(src), "--proc", "import_only",
            "--prefix", out_prefix])
        from magellanmapper_tpu.io import np_io
        img5d = np_io.read_file(out_prefix)
        np.testing.assert_array_equal(np.asarray(img5d.img[0]), planes)
