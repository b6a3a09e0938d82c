"""Pure-Python readers for Zeiss CZI and Leica LIF microscopy files.

The reference imports proprietary formats through Bioformats on a JVM
(``magmap/io/importer.py:97-156,1127``); no JVM exists in this
environment, so the two most common proprietary light-sheet/confocal
containers are read natively instead:

 - **CZI** (ZISRAW): segment stream of 32-byte-headed blocks;
   ``ZISRAWSUBBLOCK`` segments carry a ``DV`` directory entry with
   per-dimension start/size/stored-size, followed by XML metadata and
   pixel data. Uncompressed, zlib, zstd (Zstd0/Zstd1 incl. hi-lo
   byte unpacking, via ctypes ``libzstd``) and JPEG (baseline JFIF
   via the native ``jpegcodec`` shim over the system libjpeg)
   subblocks are supported; JPEG-XR blocks raise a clear error
   (no decoder exists in this image). Pyramid subblocks (nonzero
   pyramid type or stored size < logical size) are skipped so only the
   level-0 mosaic is assembled.
 - **LIF**: 0x70-tagged binary chunks — one UTF-16 XML header
   describing images/dimensions/channels, then one memory block per
   image with raw pixel data.

Both readers return ``(image, meta)`` with a ``(Z, Y, X[, C])`` array,
matching the importer's plane conventions.
"""

from __future__ import annotations

import logging
import os
import struct
import xml.etree.ElementTree as ET
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

_logger = logging.getLogger(__name__)

# -- CZI (ZISRAW) -----------------------------------------------------------

#: CZI PixelType id -> numpy dtype (single-sample types)
_CZI_PIXEL_TYPES = {
    0: np.dtype(np.uint8),      # Gray8
    1: np.dtype(np.uint16),     # Gray16
    2: np.dtype(np.float32),    # Gray32Float
    12: np.dtype(np.int32),     # Gray32
    13: np.dtype(np.float64),   # Gray64Float
}

_CZI_COMP_UNCOMPRESSED = 0
_CZI_COMP_JPEG = 1          # baseline JFIF stream per subblock
_CZI_COMP_ZLIB = 2          # "LZW" slot unused; 2 = zlib in practice
_CZI_COMP_JPEGXR = 4
_CZI_COMP_ZSTD0 = 5         # raw zstd frame
_CZI_COMP_ZSTD1 = 6         # 1/3-byte header + optional hi-lo packing

_zstd_lib = None


def _zstd():
    """Lazily bind ctypes ``libzstd`` (no python-zstd module or zstd
    binary exists in this image; the shared library does)."""
    global _zstd_lib
    if _zstd_lib is None:
        import ctypes
        import ctypes.util
        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        lib = ctypes.CDLL(name)
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_int]
        _zstd_lib = lib
    return _zstd_lib


def _decompress_zstd(raw: bytes, expected_size: int) -> bytes:
    import ctypes
    lib = _zstd()
    dst = ctypes.create_string_buffer(max(expected_size, 1))
    n = lib.ZSTD_decompress(dst, expected_size, raw, len(raw))
    if lib.ZSTD_isError(n):
        raise ValueError("corrupt zstd subblock in CZI")
    return dst.raw[:n]


def _decode_zstd1(raw: bytes, expected_size: int) -> bytes:
    """Zstd1 subblocks: a 1- or 3-byte header (size byte; if 3, a
    chunk-type byte that must be 1 and a flags byte whose bit0 enables
    hi-lo byte unpack preprocessing), then a zstd frame. With hi-lo
    packing the decompressed buffer holds all low bytes then all high
    bytes of the 16-bit samples; re-interleave to native order.
    """
    if not raw:
        raise ValueError("empty Zstd1 subblock")
    hdr = raw[0]
    hi_lo = False
    if hdr == 1:
        off = 1
    elif hdr == 3:
        if raw[1] != 1:
            raise ValueError(f"unknown Zstd1 chunk type {raw[1]}")
        hi_lo = bool(raw[2] & 1)
        off = 3
    else:
        raise ValueError(f"bad Zstd1 header size {hdr}")
    out = _decompress_zstd(raw[off:], expected_size)
    if hi_lo:
        half = len(out) // 2
        planes = np.frombuffer(out, np.uint8)
        inter = np.empty(half * 2, np.uint8)
        inter[0::2] = planes[:half]
        inter[1::2] = planes[half:half * 2]
        out = inter.tobytes()
    return out


def _read_segment_header(f):
    head = f.read(32)
    if len(head) < 32:
        return None, 0, 0
    sid = head[:16].rstrip(b"\x00").decode("ascii", "replace")
    alloc, used = struct.unpack("<qq", head[16:32])
    return sid, alloc, used


def _parse_subblock(f) -> Optional[Dict]:
    """Parse one ZISRAWSUBBLOCK at the current offset (past the segment
    header): returns dims, pixel type, compression, and the data."""
    start = f.tell()
    meta_size, attach_size = struct.unpack("<ii", f.read(8))
    data_size, = struct.unpack("<q", f.read(8))
    schema = f.read(2)
    if schema != b"DV":
        return None
    pixel_type, = struct.unpack("<i", f.read(4))
    f.read(12)                       # file position / file part
    compression, = struct.unpack("<i", f.read(4))
    pyramid_type = f.read(1)[0]
    f.read(5)                        # spare
    dim_count, = struct.unpack("<i", f.read(4))
    dims = {}
    downsampled = pyramid_type != 0
    for _ in range(dim_count):
        name = f.read(4).rstrip(b"\x00").decode("ascii")
        s0, size = struct.unpack("<ii", f.read(8))
        _start_coord, stored = struct.unpack("<fi", f.read(8))
        dims[name] = (s0, size)
        # pyramid levels > 0 store fewer samples than their logical
        # extent covers; only level 0 (stored == logical) is assembled
        if stored and stored < size:
            downsampled = True
    if downsampled:
        return None
    # data starts at max(256, header+direntry+metadata) from subblock
    # segment payload start (ZISRAW spec)
    header_len = f.tell() - start
    data_off = start + max(256, header_len + meta_size)
    f.seek(data_off + attach_size * 0)
    raw = f.read(data_size)
    dtype = _CZI_PIXEL_TYPES.get(pixel_type)
    n_bytes = int(np.prod([s for _, s in dims.values()])) * (
        dtype.itemsize if dtype is not None else 1)
    if compression == _CZI_COMP_ZLIB:
        raw = zlib.decompress(raw)
    elif compression == _CZI_COMP_ZSTD0:
        raw = _decompress_zstd(raw, n_bytes)
    elif compression == _CZI_COMP_ZSTD1:
        raw = _decode_zstd1(raw, n_bytes)
    elif compression == _CZI_COMP_JPEG:
        from magellanmapper_tpu import native
        plane = native.jpeg_decode(raw)
        if plane is None:
            raise ValueError(
                "JPEG CZI subblocks need the native jpegcodec "
                "(make -C magellanmapper_tpu/native, links the "
                "system libjpeg)")
        raw = plane.tobytes()
        if len(raw) != n_bytes:
            raise ValueError(
                f"JPEG subblock decoded to {len(raw)} bytes, "
                f"expected {n_bytes}")
    elif compression != _CZI_COMP_UNCOMPRESSED:
        raise ValueError(
            f"unsupported CZI compression id {compression} (JPEG-XR "
            "subblocks need a host-side conversion to OME-TIFF)")
    return {"dims": dims, "pixel_type": pixel_type, "data": raw}


def read_czi(path: str) -> Tuple[np.ndarray, Dict]:
    """Read a CZI file into ``(Z, Y, X[, C])`` plus metadata.

    Mosaic (multi-scene M/S-tiled) files assemble by the X/Y start
    offsets of each subblock; pyramid levels other than 0 are skipped
    (stored size < logical size).
    """
    subblocks: List[Dict] = []
    meta_xml = None
    with open(path, "rb") as f:
        sid, alloc, used = _read_segment_header(f)
        if sid != "ZISRAWFILE":
            raise ValueError(f"not a CZI file: {path}")
        f.seek(f.tell() + alloc)
        while True:
            pos = f.tell()
            sid, alloc, used = _read_segment_header(f)
            if sid is None:
                break
            if sid == "ZISRAWSUBBLOCK":
                sb = _parse_subblock(f)
                if sb is not None:
                    subblocks.append(sb)
            elif sid == "ZISRAWMETADATA":
                # payload: XmlSize(i4) + AttachmentSize(i4) + 248 spare,
                # then XmlSize bytes of XML (ZISRAW spec fixed part)
                hdr = f.read(256)
                xml_size, = struct.unpack("<i", hdr[:4])
                xml_size = min(max(xml_size, 0), max(used - 256, 0))
                meta_xml = f.read(xml_size).decode("utf-8", "replace")
            f.seek(pos + 32 + alloc)

    if not subblocks:
        raise ValueError(f"no image subblocks in {path}")

    dtype = _CZI_PIXEL_TYPES.get(subblocks[0]["pixel_type"])
    if dtype is None:
        raise ValueError(
            f"unsupported CZI pixel type {subblocks[0]['pixel_type']}")

    def rng(axis):
        starts = [sb["dims"].get(axis, (0, 1))[0] for sb in subblocks]
        stops = [s + sb["dims"].get(axis, (0, 1))[1]
                 for s, sb in zip(starts, subblocks)]
        lo = min(starts)
        return lo, max(stops) - lo

    z0, nz = rng("Z")
    y0, ny = rng("Y")
    x0, nx = rng("X")
    c0, nc = rng("C")
    out = np.zeros((nz, ny, nx, nc), dtype)
    for sb in subblocks:
        d = sb["dims"]
        sz = d.get("Z", (0, 1))
        sy = d.get("Y", (0, 1))
        sx = d.get("X", (0, 1))
        sc = d.get("C", (0, 1))
        arr = np.frombuffer(
            sb["data"], dtype,
            count=sz[1] * sy[1] * sx[1] * sc[1]).reshape(
            sc[1], sz[1], sy[1], sx[1])     # C-major per subblock
        out[sz[0]-z0:sz[0]-z0+sz[1], sy[0]-y0:sy[0]-y0+sy[1],
            sx[0]-x0:sx[0]-x0+sx[1], sc[0]-c0:sc[0]-c0+sc[1]] = \
            np.moveaxis(arr, 0, -1)
    meta: Dict = {"format": "czi"}
    if meta_xml:
        meta["xml"] = meta_xml
        meta.update(_czi_scaling(meta_xml))
    return (out[..., 0] if nc == 1 else out), meta


def _czi_scaling(meta_xml: str) -> Dict:
    """Pull z,y,x scaling (meters -> um) from the CZI metadata XML."""
    try:
        root = ET.fromstring(meta_xml)
    except ET.ParseError:
        return {}
    res = {}
    for item in root.iter("Distance"):
        ax = item.get("Id")
        val = item.findtext("Value")
        if ax and val:
            res[ax.lower()] = float(val) * 1e6
    if {"x", "y"} <= set(res):
        return {"resolutions": [
            res.get("z", res["y"]), res["y"], res["x"]]}
    return {}


def _compress_zstd(data: bytes, level: int = 3) -> bytes:
    """Compress via ctypes ``libzstd`` (writer/test support)."""
    import ctypes
    lib = _zstd()
    cap = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(dst, cap, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise ValueError("zstd compression failed")
    return dst.raw[:n]


def write_czi(path: str, image: np.ndarray,
              resolutions=None, compression: str = "none") -> str:
    """Write a minimal single-scene CZI (one subblock).

    Not a full Zeiss writer — just enough structure (file segment,
    metadata XML, one DV subblock) for interchange tests and for
    :func:`read_czi` round trips. ``compression`` may be ``none``,
    ``zlib``, ``zstd0``, ``zstd1``, ``zstd1hilo`` (Zstd1 with hi-lo
    byte-plane packing, 16-bit data only) or ``jpeg`` (single-plane
    uint8 only — Zeiss emits one JFIF stream per 2D subblock; lossy,
    quality 100).
    """
    img = np.asarray(image)
    if img.ndim == 3:
        img = img[..., None]
    nz, ny, nx, nc = img.shape
    pixel_type = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1,
                  np.dtype(np.float32): 2}[img.dtype]

    def segment(sid: bytes, payload: bytes) -> bytes:
        alloc = (len(payload) + 31) // 32 * 32
        head = sid.ljust(16, b"\x00") + struct.pack(
            "<qq", alloc, len(payload))
        return head + payload.ljust(alloc, b"\x00")

    res = resolutions or (1.0, 1.0, 1.0)
    xml = (
        "<ImageDocument><Metadata><Scaling><Items>"
        + "".join(
            f'<Distance Id="{ax}"><Value>{float(v) * 1e-6}</Value>'
            "</Distance>"
            for ax, v in zip("ZYX", res))
        + "</Items></Scaling></Metadata></ImageDocument>"
    ).encode()

    raw = np.moveaxis(img, -1, 0).tobytes()    # C-major
    if compression == "none":
        comp_id, data = _CZI_COMP_UNCOMPRESSED, raw
    elif compression == "zlib":
        comp_id, data = _CZI_COMP_ZLIB, zlib.compress(raw)
    elif compression == "zstd0":
        comp_id, data = _CZI_COMP_ZSTD0, _compress_zstd(raw)
    elif compression == "zstd1":
        comp_id, data = _CZI_COMP_ZSTD1, b"\x01" + _compress_zstd(raw)
    elif compression == "zstd1hilo":
        if img.dtype.itemsize != 2:
            raise ValueError("hi-lo packing needs 16-bit samples")
        words = np.frombuffer(raw, np.uint8)
        packed = np.concatenate([words[0::2], words[1::2]]).tobytes()
        comp_id, data = (
            _CZI_COMP_ZSTD1, b"\x03\x01\x01" + _compress_zstd(packed))
    elif compression == "jpeg":
        if img.dtype != np.uint8 or nz != 1 or nc != 1:
            raise ValueError(
                "jpeg CZI subblocks are per-plane 8-bit: need a "
                "(1, Y, X) uint8 volume")
        from magellanmapper_tpu import native
        enc = native.jpeg_encode(img[0, :, :, 0], quality=100)
        if enc is None:
            raise ValueError("native jpegcodec unavailable")
        comp_id, data = _CZI_COMP_JPEG, enc
    else:
        raise ValueError(f"unknown compression {compression!r}")

    dims = [(b"C", 0, nc), (b"Z", 0, nz), (b"Y", 0, ny), (b"X", 0, nx)]
    entry = b"DV" + struct.pack("<i", pixel_type) + b"\x00" * 12 \
        + struct.pack("<i", comp_id) + b"\x00" * 6 \
        + struct.pack("<i", len(dims))
    for name, s0, size in dims:
        entry += name.ljust(4, b"\x00") + struct.pack("<ii", s0, size) \
            + struct.pack("<fi", float(s0), size)
    sb_head = struct.pack("<ii", 0, 0) + struct.pack("<q", len(data)) \
        + entry
    pad = max(256, len(sb_head)) - len(sb_head)
    payload = sb_head + b"\x00" * pad + data

    with open(path, "wb") as f:
        f.write(segment(b"ZISRAWFILE", b"\x00" * 64))
        f.write(segment(
            b"ZISRAWMETADATA",
            struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml))
        f.write(segment(b"ZISRAWSUBBLOCK", payload))
    return path


# -- LIF (Leica Image Format) ----------------------------------------------


def _lif_read_chunk(f):
    """One 0x70-tagged LIF chunk: returns (size, payload offset)."""
    head = f.read(8)
    if len(head) < 8:
        return None, None
    magic, size = struct.unpack("<ii", head)
    if magic != 0x70:
        raise ValueError("corrupt LIF chunk")
    return size, f.tell()


def read_lif(path: str, series: int = 0) -> Tuple[np.ndarray, Dict]:
    """Read one series of a LIF file into ``(Z, Y, X[, C])`` + metadata.

    Parses the UTF-16 XML header for image dimension descriptions
    (DimID 1=X, 2=Y, 3=Z) and channel resolutions, then maps the
    series' memory block onto the described shape.
    """
    images: List[Dict] = []
    blocks: Dict[str, bytes] = {}
    with open(path, "rb") as f:
        size, off = _lif_read_chunk(f)
        tag = f.read(1)
        if tag != b"\x2a":
            raise ValueError(f"not a LIF file: {path}")
        nchars, = struct.unpack("<I", f.read(4))
        xml = f.read(nchars * 2).decode("utf-16-le")
        while True:
            size, off = _lif_read_chunk(f)
            if size is None:
                break
            assert f.read(1) == b"\x2a"
            mem_size, = struct.unpack("<Q", f.read(8))
            assert f.read(1) == b"\x2a"
            desc_len, = struct.unpack("<I", f.read(4))
            name = f.read(desc_len * 2).decode("utf-16-le")
            blocks[name] = f.read(mem_size)

    root = ET.fromstring(xml)
    for elem in root.iter("Element"):
        img = elem.find("Data/Image")
        if img is None:
            continue
        mem = elem.find("Memory")
        dims = {}
        lengths = {}
        for dd in img.iter("DimensionDescription"):
            dims[int(dd.get("DimID"))] = int(dd.get("NumberOfElements"))
            if dd.get("Length"):
                try:
                    # physical extent in meters (LIF convention)
                    lengths[int(dd.get("DimID"))] = abs(
                        float(dd.get("Length")))
                except ValueError:
                    pass
        channels = list(img.iter("ChannelDescription"))
        images.append({
            "name": elem.get("Name"),
            "dims": dims,
            "lengths": lengths,
            "n_chl": max(1, len(channels)),
            "bits": int(channels[0].get("Resolution", "8"))
            if channels else 8,
            "block": mem.get("MemoryBlockID") if mem is not None else None,
        })

    if not images:
        raise ValueError(f"no images in {path}")
    info = images[series]
    nx = info["dims"].get(1, 1)
    ny = info["dims"].get(2, 1)
    nz = info["dims"].get(3, 1)
    nc = info["n_chl"]
    dtype = np.uint16 if info["bits"] > 8 else np.uint8
    raw = blocks.get(info["block"])
    if raw is None:
        # single unnamed block files: take blocks in document order
        raw = list(blocks.values())[series]
    arr = np.frombuffer(raw, dtype, count=nz * ny * nx * nc)
    # LIF interleaves channels within a plane row-major (X fastest)
    out = arr.reshape(nz, nc, ny, nx) if nc > 1 else arr.reshape(
        nz, ny, nx)
    if nc > 1:
        out = np.moveaxis(out, 1, -1)
    meta = {"format": "lif", "name": info["name"],
            "n_series": len(images)}
    lengths = info["lengths"]
    if 1 in lengths and 2 in lengths:
        # Length (m) spans NumberOfElements pixels -> um/px
        def um_per_px(dim_id, n):
            return lengths[dim_id] / max(n - 1, 1) * 1e6
        rx, ry = um_per_px(1, nx), um_per_px(2, ny)
        rz = um_per_px(3, nz) if 3 in lengths else rx
        meta["resolutions"] = (rz, ry, rx)
    return out, meta


def write_lif(path: str, image: np.ndarray, name: str = "Series0",
              resolutions=None) -> str:
    """Write a minimal single-series LIF (uncompressed); interchange
    tests + :func:`read_lif` round trips. ``resolutions`` (z,y,x um/px)
    emit per-dimension Length attributes (meters)."""
    img = np.asarray(image)
    multi = img.ndim > 3
    nz, ny, nx = img.shape[:3]
    nc = img.shape[3] if multi else 1
    bits = img.dtype.itemsize * 8
    block_id = "MemBlock_42"
    chans = "".join(
        f'<ChannelDescription Resolution="{bits}"/>' for _ in range(nc))

    def dim(dim_id, n, res_um):
        length = ('' if res_um is None else
                  ' Length="%.9g"' % (res_um * max(n - 1, 1) * 1e-6))
        return (f'<DimensionDescription DimID="{dim_id}" '
                f'NumberOfElements="{n}"{length}/>')

    rz, ry, rx = (resolutions if resolutions is not None
                  else (None, None, None))
    xml = (
        f'<LMSDataContainerHeader><Element Name="{name}">'
        f"<Data><Image>"
        + dim(1, nx, rx) + dim(2, ny, ry) + dim(3, nz, rz)
        + f"{chans}</Image></Data>"
        f'<Memory MemoryBlockID="{block_id}"/>'
        "</Element></LMSDataContainerHeader>")

    def chunk(payload: bytes) -> bytes:
        return struct.pack("<ii", 0x70, len(payload)) + payload

    xml_b = xml.encode("utf-16-le")
    head = b"\x2a" + struct.pack("<I", len(xml)) + xml_b
    data = (np.moveaxis(img, -1, 1).tobytes() if multi
            else img.tobytes())
    desc = block_id.encode("utf-16-le")
    mem = (b"\x2a" + struct.pack("<Q", len(data)) + b"\x2a"
           + struct.pack("<I", len(block_id)) + desc + data)
    with open(path, "wb") as f:
        f.write(chunk(head))
        f.write(chunk(mem))
    return path
