"""CZI/LIF reader pins against the ZISRAW spec (not just the writer).

The round-3 review flagged that ``read_czi`` coverage was self-referential
(fixtures produced by ``write_czi``). The fixture builder here assembles
the segment stream byte-by-byte straight from the ZISRAW layout
(segment headers, the 256-byte metadata fixed part, DV directory entries
with StoredSize), so the reader is pinned against the format, not the
module's own writer. Reference import path for these containers:
``/root/reference/magmap/io/importer.py:97-156,1127`` (Bioformats/JVM).
"""

import struct
import zlib

import numpy as np
import pytest

from magellanmapper_tpu.io import czi_lif


def _segment(sid: bytes, payload: bytes) -> bytes:
    alloc = (len(payload) + 31) // 32 * 32
    return (sid.ljust(16, b"\x00") + struct.pack("<qq", alloc, len(payload))
            + payload.ljust(alloc, b"\x00"))


def _subblock_payload(data: bytes, dims, pixel_type=1, compression=0,
                      pyramid_type=0, stored_override=None) -> bytes:
    """DV subblock payload per spec: SubBlock fixed part (MetadataSize,
    AttachmentSize, DataSize), directory entry (schema 'DV', PixelType,
    FilePosition/FilePart, Compression, PyramidType+spare, DimensionCount,
    DimensionEntryDV1 list), padding to >=256, then data."""
    entry = (b"DV" + struct.pack("<i", pixel_type)
             + b"\x00" * 12                       # file position / part
             + struct.pack("<i", compression)
             + bytes([pyramid_type]) + b"\x00" * 5
             + struct.pack("<i", len(dims)))
    for name, start, size in dims:
        stored = size if stored_override is None else stored_override.get(
            name.decode(), size)
        entry += (name.ljust(4, b"\x00") + struct.pack("<ii", start, size)
                  + struct.pack("<fi", float(start), stored))
    head = struct.pack("<ii", 0, 0) + struct.pack("<q", len(data)) + entry
    pad = max(256, len(head)) - len(head)
    return head + b"\x00" * pad + data


def _metadata_payload(xml: bytes) -> bytes:
    # ZISRAWMETADATA fixed part: XmlSize, AttachmentSize, 248 spare bytes
    return struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml


_SCALING_XML = (
    b"<ImageDocument><Metadata><Scaling><Items>"
    b'<Distance Id="Z"><Value>2e-06</Value></Distance>'
    b'<Distance Id="Y"><Value>5e-07</Value></Distance>'
    b'<Distance Id="X"><Value>5e-07</Value></Distance>'
    b"</Items></Scaling></Metadata></ImageDocument>")


class TestCziSpecFixtures:
    """Hand-built segment streams (never touch write_czi)."""

    def test_mosaic_two_tiles_with_spec_metadata(self, tmp_path):
        rng = np.random.default_rng(0)
        left = rng.integers(0, 60000, (2, 4, 3), dtype=np.uint16)
        right = rng.integers(0, 60000, (2, 4, 5), dtype=np.uint16)
        sb_left = _subblock_payload(
            left[None].tobytes(),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 0, 3)])
        sb_right = _subblock_payload(
            right[None].tobytes(),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 3, 5)])
        path = tmp_path / "mosaic.czi"
        path.write_bytes(
            _segment(b"ZISRAWFILE", b"\x00" * 512)
            + _segment(b"ZISRAWMETADATA", _metadata_payload(_SCALING_XML))
            + _segment(b"ZISRAWSUBBLOCK", sb_left)
            + _segment(b"ZISRAWSUBBLOCK", sb_right))
        img, meta = czi_lif.read_czi(str(path))
        assert img.shape == (2, 4, 8)
        np.testing.assert_array_equal(img[:, :, :3], left)
        np.testing.assert_array_equal(img[:, :, 3:], right)
        # resolutions come from the XML behind the 256-byte fixed part
        assert meta["resolutions"] == pytest.approx([2.0, 0.5, 0.5])

    def test_pyramid_subblocks_skipped(self, tmp_path):
        """Nonzero pyramid type OR stored<size must be excluded from
        level-0 assembly (round-3 advisor: frombuffer over-read)."""
        base = np.arange(2 * 4 * 4, dtype=np.uint16).reshape(2, 4, 4)
        sb0 = _subblock_payload(
            base[None].tobytes(),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 0, 4)])
        # a 2x-downsampled level: logical extent 4x4, stored 2x2 — the
        # buffer is genuinely smaller than the logical voxel count
        lvl = np.zeros((2, 2, 2), np.uint16)
        sb_pyr = _subblock_payload(
            lvl[None].tobytes(),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 0, 4)],
            pyramid_type=1,
            stored_override={"Y": 2, "X": 2})
        # and one marked only via StoredSize (pyramid byte left 0)
        sb_pyr2 = _subblock_payload(
            lvl[None].tobytes(),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 0, 4)],
            stored_override={"Y": 2, "X": 2})
        path = tmp_path / "pyr.czi"
        path.write_bytes(
            _segment(b"ZISRAWFILE", b"\x00" * 512)
            + _segment(b"ZISRAWSUBBLOCK", sb0)
            + _segment(b"ZISRAWSUBBLOCK", sb_pyr)
            + _segment(b"ZISRAWSUBBLOCK", sb_pyr2))
        img, _ = czi_lif.read_czi(str(path))
        np.testing.assert_array_equal(img, base)

    def test_zlib_subblock_spec_stream(self, tmp_path):
        data = np.arange(3 * 5, dtype=np.uint16).reshape(1, 3, 5)
        sb = _subblock_payload(
            zlib.compress(data[None].tobytes()),
            [(b"C", 0, 1), (b"Z", 0, 1), (b"Y", 0, 3), (b"X", 0, 5)],
            compression=2)
        path = tmp_path / "z.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        img, _ = czi_lif.read_czi(str(path))
        np.testing.assert_array_equal(img, data)

    def test_zstd0_subblock_spec_stream(self, tmp_path):
        data = np.arange(2 * 3 * 4, dtype=np.uint16).reshape(2, 3, 4)
        sb = _subblock_payload(
            czi_lif._compress_zstd(data[None].tobytes()),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 3), (b"X", 0, 4)],
            compression=5)
        path = tmp_path / "zs.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        img, _ = czi_lif.read_czi(str(path))
        np.testing.assert_array_equal(img, data)

    def test_zstd1_hilo_subblock_spec_stream(self, tmp_path):
        """Zstd1 with the hi-lo byte-plane preprocessing flag: payload is
        3-byte header + zstd frame of [all low bytes | all high bytes]."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 65535, (2, 4, 4), dtype=np.uint16)
        raw = data[None].tobytes()
        words = np.frombuffer(raw, np.uint8)
        packed = np.concatenate([words[0::2], words[1::2]]).tobytes()
        sb = _subblock_payload(
            b"\x03\x01\x01" + czi_lif._compress_zstd(packed),
            [(b"C", 0, 1), (b"Z", 0, 2), (b"Y", 0, 4), (b"X", 0, 4)],
            compression=6)
        path = tmp_path / "zs1.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        img, _ = czi_lif.read_czi(str(path))
        np.testing.assert_array_equal(img, data)

    def test_jpegxr_still_gated(self, tmp_path):
        sb = _subblock_payload(
            b"\x00" * 8,
            [(b"C", 0, 1), (b"Z", 0, 1), (b"Y", 0, 2), (b"X", 0, 2)],
            compression=4)
        path = tmp_path / "jxr.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        with pytest.raises(ValueError, match="JPEG-XR"):
            czi_lif.read_czi(str(path))


class TestCziZstdRoundtrip:
    """write_czi's compressed modes through the reader."""

    @pytest.mark.parametrize(
        "mode", ["zlib", "zstd0", "zstd1", "zstd1hilo"])
    def test_roundtrip(self, tmp_path, mode):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 60000, (3, 8, 9), dtype=np.uint16)
        path = str(tmp_path / f"{mode}.czi")
        czi_lif.write_czi(path, img, resolutions=(1.5, 0.4, 0.4),
                          compression=mode)
        back, meta = czi_lif.read_czi(path)
        np.testing.assert_array_equal(back, img)
        assert meta["resolutions"] == pytest.approx([1.5, 0.4, 0.4])

    def test_zstd_actually_compresses(self, tmp_path):
        img = np.zeros((4, 32, 32), np.uint16)   # highly compressible
        p0 = str(tmp_path / "raw.czi")
        p1 = str(tmp_path / "z.czi")
        czi_lif.write_czi(p0, img)
        czi_lif.write_czi(p1, img, compression="zstd1")
        import os
        assert os.path.getsize(p1) < os.path.getsize(p0) / 4


class TestPruneTierGate:
    """Round-3 advisor (high): the count-tiered prune dispatch must not
    take the small tier when any valid row sits beyond the window —
    pad-zone masking in the sharded detector leaves few-but-deep rows."""

    def test_deep_valid_rows_force_full_prune(self):
        from magellanmapper_tpu.ops import peaks
        import jax.numpy as jnp
        k = 4096
        coords = np.zeros((k, 3), np.float32)
        coords[10] = (5.0, 5.0, 5.0)
        coords[2000] = (5.0, 5.0, 5.5)     # overlaps row 10
        sigmas = np.full((k,), 2.0, np.float32)
        valid = np.zeros((k,), bool)
        valid[10] = valid[2000] = True
        out = np.asarray(peaks._prune_tiered(
            peaks.prune_overlapping_blobs, jnp.asarray(coords),
            jnp.asarray(sigmas), jnp.asarray(valid), 0.5, 3))
        ref = np.asarray(peaks.prune_overlapping_blobs(
            jnp.asarray(coords), jnp.asarray(sigmas),
            jnp.asarray(valid), 0.5, 3))
        np.testing.assert_array_equal(out, ref)
        assert out.sum() == 1        # one of the overlapping pair pruned

    def test_shallow_rows_still_take_small_tier(self):
        from magellanmapper_tpu.ops import peaks
        import jax.numpy as jnp
        k = 4096
        coords = np.zeros((k, 3), np.float32)
        coords[3] = (9.0, 9.0, 9.0)
        sigmas = np.full((k,), 1.5, np.float32)
        valid = np.zeros((k,), bool)
        valid[3] = valid[0] = True
        out = np.asarray(peaks._prune_tiered(
            peaks.prune_overlapping_blobs, jnp.asarray(coords),
            jnp.asarray(sigmas), jnp.asarray(valid), 0.5, 3))
        assert out[3] and out.sum() == 2   # far apart: both kept


class TestLifResolutions:
    def test_length_attrs_give_resolutions(self, tmp_path):
        """Hand-written LIF XML with per-dimension Length (meters) —
        a spec pin of the calibration path, not a writer round trip."""
        import numpy as np
        data = np.arange(2 * 3 * 4, dtype=np.uint16).reshape(2, 3, 4)
        xml = (
            '<LMSDataContainerHeader><Element Name="S0">'
            "<Data><Image>"
            '<DimensionDescription DimID="1" NumberOfElements="4"'
            ' Length="1.2e-6"/>'           # 3 px spans -> 0.4 um/px
            '<DimensionDescription DimID="2" NumberOfElements="3"'
            ' Length="1.0e-6"/>'           # 2 px spans -> 0.5 um/px
            '<DimensionDescription DimID="3" NumberOfElements="2"'
            ' Length="2.0e-6"/>'           # 1 px span  -> 2.0 um/px
            '<ChannelDescription Resolution="16"/>'
            "</Image></Data>"
            '<Memory MemoryBlockID="MemBlock_1"/>'
            "</Element></LMSDataContainerHeader>")

        def chunk(payload):
            return struct.pack("<ii", 0x70, len(payload)) + payload

        xml_b = xml.encode("utf-16-le")
        head = b"\x2a" + struct.pack("<I", len(xml)) + xml_b
        desc = "MemBlock_1".encode("utf-16-le")
        mem = (b"\x2a" + struct.pack("<Q", data.nbytes) + b"\x2a"
               + struct.pack("<I", len("MemBlock_1")) + desc
               + data.tobytes())
        path = tmp_path / "cal.lif"
        path.write_bytes(chunk(head) + chunk(mem))
        arr, meta = czi_lif.read_lif(str(path))
        np.testing.assert_array_equal(arr, data)
        assert meta["resolutions"] == pytest.approx((2.0, 0.5, 0.4))

    def test_write_lif_resolutions_roundtrip(self, tmp_path):
        import numpy as np
        data = (np.arange(3 * 4 * 5) % 250).astype(
            np.uint8).reshape(3, 4, 5)
        path = str(tmp_path / "rt.lif")
        czi_lif.write_lif(path, data, resolutions=(1.5, 0.3, 0.25))
        arr, meta = czi_lif.read_lif(path)
        np.testing.assert_array_equal(arr, data)
        assert meta["resolutions"] == pytest.approx((1.5, 0.3, 0.25))


class TestCziJpeg:
    """CZI compression id 1 (baseline JFIF per 2D subblock), decoded
    through the native jpegcodec shim over the system libjpeg."""

    @pytest.fixture(autouse=True)
    def _need_codec(self):
        from magellanmapper_tpu import native
        if not native.jpeg_available():
            pytest.skip("native jpegcodec not built")

    def test_jpeg_subblocks_spec_stream(self, tmp_path):
        """Two per-plane JPEG subblocks assemble into a Z stack; the
        JFIF payloads come from libjpeg itself, the surrounding
        segment stream is built byte-by-byte from the ZISRAW spec."""
        from magellanmapper_tpu import native
        # piecewise-constant planes: q100 baseline JPEG keeps these
        # within +-2 of the source
        planes = [np.full((8, 16), v, np.uint8) for v in (40, 200)]
        planes[0][:4, :8] = 90
        planes[1][4:, 8:] = 120
        segs = _segment(b"ZISRAWFILE", b"\x00" * 512)
        for z, plane in enumerate(planes):
            sb = _subblock_payload(
                native.jpeg_encode(plane, quality=100),
                [(b"C", 0, 1), (b"Z", z, 1), (b"Y", 0, 8),
                 (b"X", 0, 16)],
                pixel_type=0, compression=1)
            segs += _segment(b"ZISRAWSUBBLOCK", sb)
        path = tmp_path / "jpeg.czi"
        path.write_bytes(segs)
        img, _ = czi_lif.read_czi(str(path))
        assert img.shape == (2, 8, 16)
        assert img.dtype == np.uint8
        for z, plane in enumerate(planes):
            assert np.abs(img[z].astype(int) - plane.astype(int)
                          ).max() <= 2

    def test_jpeg_write_read_round_trip(self, tmp_path):
        data = np.full((1, 12, 20), 7, np.uint8)
        data[0, 3:9, 5:15] = 180
        path = tmp_path / "rt.czi"
        czi_lif.write_czi(str(path), data, compression="jpeg")
        img, _ = czi_lif.read_czi(str(path))
        assert img.shape == (1, 12, 20)
        assert np.abs(img.astype(int) - data.astype(int)).max() <= 2

    def test_jpeg_writer_rejects_nonplane(self, tmp_path):
        with pytest.raises(ValueError, match="per-plane 8-bit"):
            czi_lif.write_czi(
                str(tmp_path / "bad.czi"),
                np.zeros((2, 4, 4), np.uint8), compression="jpeg")
        with pytest.raises(ValueError, match="per-plane 8-bit"):
            czi_lif.write_czi(
                str(tmp_path / "bad16.czi"),
                np.zeros((1, 4, 4), np.uint16), compression="jpeg")

    def test_jpeg_size_mismatch_raises(self, tmp_path):
        """A JFIF stream whose decoded extent disagrees with the DV
        dims must fail loudly, not assemble garbage."""
        from magellanmapper_tpu import native
        enc = native.jpeg_encode(np.zeros((4, 4), np.uint8))
        sb = _subblock_payload(
            enc, [(b"C", 0, 1), (b"Z", 0, 1), (b"Y", 0, 8),
                  (b"X", 0, 8)],
            pixel_type=0, compression=1)
        path = tmp_path / "mismatch.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        with pytest.raises(ValueError, match="decoded to"):
            czi_lif.read_czi(str(path))

    def test_jpeg_corrupt_stream_raises(self, tmp_path):
        sb = _subblock_payload(
            b"\xff\xd8 not really a jpeg",
            [(b"C", 0, 1), (b"Z", 0, 1), (b"Y", 0, 4), (b"X", 0, 4)],
            pixel_type=0, compression=1)
        path = tmp_path / "corrupt.czi"
        path.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 512)
                         + _segment(b"ZISRAWSUBBLOCK", sb))
        with pytest.raises(ValueError):
            czi_lif.read_czi(str(path))
