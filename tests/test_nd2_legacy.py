"""Legacy (pre-chunk-map) ND2: a JP2 container whose frames are
``jp2c`` codestream boxes.

Fixture methodology: the container is assembled box-by-box from the
ISO 15444-1 layout (signature, ftyp, jp2h/ihdr/colr/res, XLBox) and
the codestream payloads are produced by the system libopenjp2 — an
implementation independent of the reader under test. Reference path:
Bioformats LegacyND2Reader on a JVM
(``/root/reference/magmap/io/importer.py:97-156``)."""

import struct

import numpy as np
import pytest

from magellanmapper_tpu.io import jp2k, nd2

pytestmark = pytest.mark.skipif(
    not jp2k.available(), reason="no system libopenjp2 in this image")


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _xlbox(btype: bytes, payload: bytes) -> bytes:
    """Extended-length box: length field 1 + u64 XLBox length."""
    return (struct.pack(">I", 1) + btype
            + struct.pack(">Q", 16 + len(payload)) + payload)


def _jp2_header(h: int, w: int, nc: int = 1, bpc: int = 16,
                res_box: bytes = b"") -> bytes:
    ihdr = _box(b"ihdr", struct.pack(
        ">IIHBBBB", h, w, nc, bpc - 1, 7, 0, 0))
    colr = _box(b"colr", struct.pack(">BbBI", 1, 0, 0, 17))
    return _box(b"jp2h", ihdr + colr + res_box)


def _resc(ppm_num: int, ppm_den: int, exp: int) -> bytes:
    """Capture-resolution superbox: same grid density both axes."""
    resc = _box(b"resc", struct.pack(
        ">HHHHbb", ppm_num, ppm_den, ppm_num, ppm_den, exp, exp))
    return _box(b"res ", resc)


_SIG = nd2.JP2_SIGNATURE
_FTYP = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")


def _frames(n, h=24, w=32, dtype=np.uint16, seed=0):
    rng = np.random.default_rng(seed)
    hi = 255 if dtype == np.uint8 else 60000
    return [rng.integers(0, hi, (h, w), dtype=dtype) for _ in range(n)]


class TestLegacyNd2:

    def test_stack_with_calibration_and_junk_boxes(self, tmp_path):
        """Frames in jp2c boxes assemble as Z; the undocumented Nikon
        metadata boxes between them are skipped; 0.5 um/px comes from
        the resc grid density (2e6 points/meter)."""
        frames = _frames(3)
        payload = _SIG + _FTYP + _jp2_header(
            24, 32, res_box=_resc(2, 1, 6))
        for i, fr in enumerate(frames):
            # interleave proprietary binary boxes like Nikon does
            payload += _box(b"uuid", bytes(16) + b"\x01\x02" * 8)
            payload += _box(b"jp2c", jp2k.encode(fr, num_resolutions=4))
        payload += _box(b"nikx", b"\x00" * 37)
        path = tmp_path / "legacy.nd2"
        path.write_bytes(payload)
        arr, meta = nd2.read_nd2(str(path))
        assert arr.shape == (3, 24, 32)
        assert arr.dtype == np.uint16
        for z, fr in enumerate(frames):
            np.testing.assert_array_equal(arr[z], fr)
        assert meta["legacy"] and meta["sequence_count"] == 3
        assert meta["resolutions"] == pytest.approx((0.5, 0.5, 0.5))

    def test_xlbox_codestream(self, tmp_path):
        """A frame wrapped in an extended-length (XLBox) header still
        parses — writers emit these when a box passes 4 GiB."""
        fr = _frames(1)[0]
        payload = (_SIG + _FTYP + _jp2_header(24, 32)
                   + _xlbox(b"jp2c", jp2k.encode(fr, num_resolutions=4)))
        path = tmp_path / "xl.nd2"
        path.write_bytes(payload)
        arr, meta = nd2.read_nd2(str(path))
        assert arr.shape == (1, 24, 32)
        np.testing.assert_array_equal(arr[0], fr)
        assert "resolutions" not in meta   # no res box present

    def test_uint8_frames(self, tmp_path):
        fr = _frames(2, dtype=np.uint8, seed=3)
        payload = _SIG + _FTYP + _jp2_header(24, 32, bpc=8)
        for f in fr:
            payload += _box(b"jp2c", jp2k.encode(f, num_resolutions=4))
        path = tmp_path / "u8.nd2"
        path.write_bytes(payload)
        arr, _ = nd2.read_nd2(str(path))
        assert arr.dtype == np.uint8
        np.testing.assert_array_equal(arr[1], fr[1])

    def test_no_codestreams_raises(self, tmp_path):
        path = tmp_path / "empty.nd2"
        path.write_bytes(_SIG + _FTYP + _jp2_header(8, 8))
        with pytest.raises(ValueError, match="no jp2c"):
            nd2.read_nd2(str(path))

    def test_corrupt_box_length_raises(self, tmp_path):
        path = tmp_path / "bad.nd2"
        # a box claiming to extend past EOF
        path.write_bytes(_SIG + struct.pack(">I", 1 << 20) + b"jp2c")
        with pytest.raises(ValueError, match="corrupt JP2 box"):
            nd2.read_nd2(str(path))

    def test_inconsistent_frame_shapes_raise(self, tmp_path):
        a = _frames(1, h=24, w=32)[0]
        b = _frames(1, h=16, w=32, seed=5)[0]
        payload = (_SIG + _FTYP + _jp2_header(24, 32)
                   + _box(b"jp2c", jp2k.encode(a, num_resolutions=4))
                   + _box(b"jp2c", jp2k.encode(b, num_resolutions=4)))
        path = tmp_path / "mixed.nd2"
        path.write_bytes(payload)
        with pytest.raises(ValueError, match="inconsistent"):
            nd2.read_nd2(str(path))

    def test_unavailable_codec_gates(self, tmp_path, monkeypatch):
        fr = _frames(1)[0]
        payload = (_SIG + _FTYP + _jp2_header(24, 32)
                   + _box(b"jp2c", jp2k.encode(fr, num_resolutions=4)))
        path = tmp_path / "gated.nd2"
        path.write_bytes(payload)
        monkeypatch.setattr(jp2k, "available", lambda: False)
        with pytest.raises(NotImplementedError, match="libopenjp2"):
            nd2.read_nd2(str(path))

    def test_import_nd2_legacy_end_to_end(self, tmp_path):
        from magellanmapper_tpu.io import importer
        frames = _frames(2, seed=9)
        payload = _SIG + _FTYP + _jp2_header(
            24, 32, res_box=_resc(1, 1, 6))   # 1 um/px
        for fr in frames:
            payload += _box(b"jp2c", jp2k.encode(fr, num_resolutions=4))
        path = tmp_path / "vol.nd2"
        path.write_bytes(payload)
        img5d = importer.import_nd2(
            str(path), out_path=str(tmp_path / "out"))
        arr = np.asarray(img5d.img[0]).reshape(2, 24, 32)
        np.testing.assert_array_equal(arr, np.stack(frames))


class TestJp2kCodec:
    """The codec binding itself (beyond what the reader exercises)."""

    def test_multicomponent_round_trip(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (16, 20, 2), dtype=np.uint8)
        out = jp2k.decode(jp2k.encode(img, num_resolutions=3))
        np.testing.assert_array_equal(out, img)

    def test_jp2_container_format(self):
        """OPJ_CODEC_JP2 wraps the codestream in a signature-led
        container that decode() auto-detects."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 60000, (32, 40), dtype=np.uint16)
        data = jp2k.encode(img, codec_format=jp2k.OPJ_CODEC_JP2)
        assert data[:12] == jp2k.JP2_SIGNATURE
        np.testing.assert_array_equal(jp2k.decode(data), img)

    def test_non_j2k_bytes_raise(self):
        with pytest.raises(ValueError, match="not a JPEG 2000"):
            jp2k.decode(b"definitely not jpeg2000 bytes")
