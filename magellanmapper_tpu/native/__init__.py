"""Native (C++) runtime: multithreaded block extraction via ctypes.

``blockio_extract`` gathers overlapping z,y,x blocks from a (memmapped)
volume into one contiguous float32 batch buffer using worker threads —
the native-runtime replacement for the reference's mp.Pool block farm
(``magmap/cv/chunking.py:143``). Falls back to a NumPy loop when the
shared library has not been built (``make -C magellanmapper_tpu/native``).
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional, Sequence

import numpy as np

_logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libblockio.so")
_DTYPES = {
    np.dtype(np.uint8): 0, np.dtype(np.uint16): 1,
    np.dtype(np.int16): 2, np.dtype(np.uint32): 3,
    np.dtype(np.int32): 4, np.dtype(np.float32): 5,
    np.dtype(np.float64): 6,
}

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # lazy one-shot build attempt (toolchain is in the image)
        import subprocess
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(__file__)],
                capture_output=True, timeout=120, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.blockio_extract.restype = ctypes.c_int
        lib.blockio_extract.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    except OSError as exc:  # pragma: no cover
        _logger.warning("could not load libblockio: %s", exc)
        _lib = None
    return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def extract_blocks(
        volume: np.ndarray, starts: np.ndarray,
        block_shape: Sequence[int],
        out: Optional[np.ndarray] = None,
        n_threads: Optional[int] = None) -> np.ndarray:
    """Gather ``(n, bz, by, bx)`` float32 blocks at clamped ``starts``.

    Uses the native threaded path when built; NumPy otherwise. ``starts``
    must already be clamped so every window fits in ``volume``.
    """
    starts = np.ascontiguousarray(starts, dtype=np.int64).reshape(-1, 3)
    bz, by, bx = (int(v) for v in block_shape)
    n = len(starts)
    if out is None:
        out = np.empty((n, bz, by, bx), np.float32)

    lib = _load()
    dtype_code = _DTYPES.get(volume.dtype)
    if lib is not None and dtype_code is not None and volume.ndim == 3:
        # arbitrary strides supported natively, so views/memmaps pass as-is
        ptr = volume.ctypes.data_as(ctypes.c_void_p)
        rc = lib.blockio_extract(
            ptr, dtype_code,
            *[ctypes.c_int64(int(s)) for s in volume.shape],
            *[ctypes.c_int64(int(s)) for s in volume.strides],
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n),
            ctypes.c_int64(bz), ctypes.c_int64(by), ctypes.c_int64(bx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(n_threads or os.cpu_count() or 4))
        if rc == 0:
            return out
        _logger.warning("blockio_extract failed (%d); numpy fallback", rc)

    for i, (z0, y0, x0) in enumerate(starts):
        out[i] = volume[z0:z0 + bz, y0:y0 + by, x0:x0 + bx]
    return out


# -- TIFF strip codecs (libtiffcodec.so) -----------------------------------

_TIFF_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "libtiffcodec.so")
_tiff_lib = None


def _load_tiff():
    global _tiff_lib
    if _tiff_lib is not None:
        return _tiff_lib
    if not os.path.exists(_TIFF_LIB_PATH):
        import subprocess
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(__file__)],
                capture_output=True, timeout=120, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass
    if not os.path.exists(_TIFF_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_TIFF_LIB_PATH)
        for name in ("tiff_lzw_decode", "tiff_packbits_decode"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
        _tiff_lib = lib
    except OSError as exc:  # pragma: no cover - build/platform issue
        _logger.warning("libtiffcodec load failed: %s", exc)
        _tiff_lib = None
    return _tiff_lib


def _tiff_decode(fn_name: str, data: bytes,
                 max_out: int) -> Optional[bytes]:
    lib = _load_tiff()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(max_out, np.uint8)
    out_len = ctypes.c_int64(0)
    rc = getattr(lib, fn_name)(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(max_out), ctypes.byref(out_len))
    if rc != 0:
        return None
    return dst[:out_len.value].tobytes()


def lzw_decode(data: bytes, max_out: int) -> Optional[bytes]:
    """TIFF-variant LZW decode in C (None -> caller's Python fallback)."""
    return _tiff_decode("tiff_lzw_decode", data, max_out)


def packbits_decode(data: bytes, max_out: int) -> Optional[bytes]:
    """PackBits decode in C (None -> caller's Python fallback)."""
    return _tiff_decode("tiff_packbits_decode", data, max_out)


# -- JPEG codec (libjpegcodec.so over the system libjpeg) -------------------
#
# CZI compression id 1 stores baseline JFIF streams (ZISRAW spec);
# the reference reaches them through Bioformats' JPEGCodec on a JVM
# (magmap/io/importer.py:97-156). Returns None when the shim (or the
# system libjpeg it links) is unavailable so callers gate honestly.

_JPEG_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "libjpegcodec.so")
_jpeg_lib = None


def _load_jpeg():
    global _jpeg_lib
    if _jpeg_lib is not None:
        return _jpeg_lib
    if not os.path.exists(_JPEG_LIB_PATH):
        import subprocess
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(__file__)],
                capture_output=True, timeout=120, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass
    if not os.path.exists(_JPEG_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_JPEG_LIB_PATH)
        lib.jpegcodec_info.restype = ctypes.c_int
        lib.jpegcodec_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.jpegcodec_decode.restype = ctypes.c_long
        lib.jpegcodec_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_ulong]
        lib.jpegcodec_encode.restype = ctypes.c_long
        lib.jpegcodec_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_ulong]
        _jpeg_lib = lib
    except OSError as exc:  # pragma: no cover - build/platform issue
        _logger.warning("libjpegcodec load failed: %s", exc)
        _jpeg_lib = None
    return _jpeg_lib


def jpeg_available() -> bool:
    """True when the JPEG shim is built and loadable."""
    return _load_jpeg() is not None


def jpeg_decode(data: bytes) -> Optional[np.ndarray]:
    """Decode a JFIF stream to ``(h, w)`` or ``(h, w, ncomp)`` uint8;
    None when the shim is unavailable; ValueError on a bad stream."""
    lib = _load_jpeg()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    sp = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    nc = ctypes.c_int(0)
    if lib.jpegcodec_info(sp, len(data), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(nc)) != 0:
        raise ValueError("corrupt JPEG stream")
    dst = np.empty(h.value * w.value * nc.value, np.uint8)
    n = lib.jpegcodec_decode(
        sp, len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst.size)
    if n != dst.size:
        raise ValueError("JPEG decode failed")
    return (dst.reshape(h.value, w.value) if nc.value == 1
            else dst.reshape(h.value, w.value, nc.value))


def jpeg_encode(img: np.ndarray, quality: int = 95) -> Optional[bytes]:
    """Encode ``(h, w)`` or ``(h, w, 3)`` uint8 to a JFIF stream;
    None when the shim is unavailable."""
    lib = _load_jpeg()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    cap = img.size + (1 << 16)
    dst = np.empty(cap, np.uint8)
    n = lib.jpegcodec_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[1], img.shape[0], ncomp, quality,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError("JPEG encode failed")
    return dst[:n].tobytes()
