"""Minimal TIFF reader/writer (pure Python, baseline + BigTIFF read).

The environment has no ``tifffile``; the reference uses it for lazy TIF
loading (``magmap/io/np_io.py:646`` ``read_tif``). This module covers the
microscopy-relevant subset: grayscale multi-page stacks, 8/16/32-bit
integer and float32 sample formats, uncompressed, strip- or tile-less
organization, little/big endian, plus ImageJ-style multi-page writing.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q"}


def _read_ifd_entries(f, bo, big):
    """Read one IFD; returns (tags dict, next IFD offset)."""
    if big:
        n = struct.unpack(bo + "Q", f.read(8))[0]
        entry_size, count_fmt, off_fmt = 20, "Q", "Q"
    else:
        n = struct.unpack(bo + "H", f.read(2))[0]
        entry_size, count_fmt, off_fmt = 12, "I", "I"
    tags: Dict[int, list] = {}
    for _ in range(int(n)):
        data = f.read(entry_size)
        tag, typ = struct.unpack(bo + "HH", data[:4])
        count = struct.unpack(
            bo + count_fmt, data[4:4 + (8 if big else 4)])[0]
        val_bytes = data[4 + (8 if big else 4):]
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= len(val_bytes):
            raw = val_bytes[:size]
        else:
            off = struct.unpack(bo + off_fmt, val_bytes)[0]
            pos = f.tell()
            f.seek(off)
            raw = f.read(size)
            f.seek(pos)
        fmt = _TYPE_FMT.get(typ)
        if fmt:
            tags[tag] = list(struct.unpack(bo + fmt * count, raw))
        elif typ == 5:  # rational
            vals = struct.unpack(bo + "II" * count, raw)
            tags[tag] = [vals[i] / max(vals[i + 1], 1)
                         for i in range(0, len(vals), 2)]
    nxt = struct.unpack(bo + off_fmt, f.read(8 if big else 4))[0]
    return tags, nxt


def read_tiff(path: str) -> np.ndarray:
    """Read a grayscale multi-page TIFF into a ``(pages, H, W)`` array
    (single page -> ``(H, W)``)."""
    with open(path, "rb") as f:
        hdr = f.read(8)
        bo = {"II": "<", "MM": ">"}[hdr[:2].decode("ascii")]
        magic = struct.unpack(bo + "H", hdr[2:4])[0]
        if magic == 43:  # BigTIFF
            f.read(8 - len(hdr) + 8)  # already read 8; need offsetsize+pad
            f.seek(8)
            ifd_off = struct.unpack(bo + "Q", f.read(8))[0]
            big = True
        elif magic == 42:
            ifd_off = struct.unpack(bo + "I", hdr[4:8])[0]
            big = False
        else:
            raise ValueError(f"not a TIFF file: {path}")
        pages = []
        while ifd_off:
            f.seek(ifd_off)
            tags, ifd_off = _read_ifd_entries(f, bo, big)
            if _TAG_WIDTH not in tags:
                continue
            w = tags[_TAG_WIDTH][0]
            h = tags[_TAG_HEIGHT][0]
            bits = tags.get(_TAG_BITS, [8])[0]
            comp = tags.get(_TAG_COMPRESSION, [1])[0]
            spp = tags.get(_TAG_SPP, [1])[0]
            sfmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
            if comp != 1:
                raise ValueError(
                    f"unsupported TIFF compression {comp} in {path}")
            dtype = {
                (1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
                (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
                (3, 32): np.float32, (3, 64): np.float64,
            }[(sfmt, bits)]
            dtype = np.dtype(dtype).newbyteorder(bo)
            offsets = tags[_TAG_STRIP_OFFSETS]
            counts = tags.get(_TAG_STRIP_COUNTS,
                              [h * w * spp * bits // 8])
            raw = b""
            for off, cnt in zip(offsets, counts):
                f.seek(off)
                raw += f.read(cnt)
            arr = np.frombuffer(raw, dtype=dtype, count=h * w * spp)
            if spp > 1:
                arr = arr.reshape(h, w, spp)
            else:
                arr = arr.reshape(h, w)
            pages.append(arr)
    if not pages:
        raise ValueError(f"no image pages in {path}")
    out = np.stack(pages) if len(pages) > 1 else pages[0]
    return out


def write_tiff(path: str, arr: np.ndarray) -> None:
    """Write a grayscale 2D/3D array as an uncompressed multi-page TIFF."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.dtype == np.float64:
        arr = arr.astype(np.float32)
    sfmt = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8
    n_pages, h, w = arr.shape[:3]
    with open(path, "wb") as f:
        f.write(b"II*\x00")
        ifd_pos_holder = f.tell()
        f.write(struct.pack("<I", 0))  # first IFD offset placeholder
        prev_ifd_link = ifd_pos_holder
        for p in range(n_pages):
            data = np.ascontiguousarray(arr[p]).tobytes()
            data_off = f.tell()
            f.write(data)
            ifd_off = f.tell()
            # link previous IFD (or header) to this one
            entries = [
                (_TAG_WIDTH, 4, 1, w),
                (_TAG_HEIGHT, 4, 1, h),
                (_TAG_BITS, 3, 1, bits),
                (_TAG_COMPRESSION, 3, 1, 1),
                (_TAG_PHOTOMETRIC, 3, 1, 1),
                (_TAG_STRIP_OFFSETS, 4, 1, data_off),
                (_TAG_SPP, 3, 1, 1),
                (_TAG_ROWS_PER_STRIP, 4, 1, h),
                (_TAG_STRIP_COUNTS, 4, 1, len(data)),
                (_TAG_SAMPLE_FORMAT, 3, 1, sfmt),
            ]
            f.write(struct.pack("<H", len(entries)))
            for tag, typ, cnt, val in entries:
                f.write(struct.pack("<HHI", tag, typ, cnt))
                f.write(struct.pack("<I", val))
            next_link_pos = f.tell()
            f.write(struct.pack("<I", 0))
            end = f.tell()
            f.seek(prev_ifd_link)
            f.write(struct.pack("<I", ifd_off))
            f.seek(end)
            prev_ifd_link = next_link_pos


class LazyTiffStack:
    """Lazy multi-page TIFF: pages map on demand via ``np.memmap``.

    Covers the reference's lazy TIF loading (``magmap/io/np_io.py:646``
    ``read_tif`` memmap/zarr path) for uncompressed stacks: no pixel
    data is read until a page is indexed.
    """

    def __init__(self, path: str):
        self.path = path
        self._offsets: List[int] = []
        self._shape_page: Optional[Tuple[int, int]] = None
        self.dtype: Optional[np.dtype] = None
        self._scan()

    def _scan(self):
        with open(self.path, "rb") as f:
            hdr = f.read(8)
            bo = {"II": "<", "MM": ">"}[hdr[:2].decode("ascii")]
            magic = struct.unpack(bo + "H", hdr[2:4])[0]
            if magic == 43:
                f.seek(8)
                ifd_off = struct.unpack(bo + "Q", f.read(8))[0]
                big = True
            else:
                ifd_off = struct.unpack(bo + "I", hdr[4:8])[0]
                big = False
            while ifd_off:
                f.seek(ifd_off)
                tags, ifd_off = _read_ifd_entries(f, bo, big)
                if _TAG_WIDTH not in tags:
                    continue
                comp = tags.get(_TAG_COMPRESSION, [1])[0]
                offsets = tags[_TAG_STRIP_OFFSETS]
                if comp != 1 or len(offsets) != 1:
                    raise ValueError(
                        "LazyTiffStack requires uncompressed single-strip "
                        f"pages: {self.path}")
                w = tags[_TAG_WIDTH][0]
                h = tags[_TAG_HEIGHT][0]
                bits = tags.get(_TAG_BITS, [8])[0]
                sfmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
                dtype = np.dtype({
                    (1, 8): np.uint8, (1, 16): np.uint16,
                    (1, 32): np.uint32, (2, 8): np.int8,
                    (2, 16): np.int16, (2, 32): np.int32,
                    (3, 32): np.float32, (3, 64): np.float64,
                }[(sfmt, bits)]).newbyteorder(bo)
                if self._shape_page is None:
                    self._shape_page = (h, w)
                    self.dtype = dtype
                elif self._shape_page != (h, w) or self.dtype != dtype:
                    raise ValueError("inconsistent TIFF pages")
                self._offsets.append(offsets[0])

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (len(self._offsets),) + self._shape_page

    def __len__(self):
        return len(self._offsets)

    def page(self, i: int) -> np.ndarray:
        """Memory-map one page (no copy)."""
        h, w = self._shape_page
        return np.memmap(
            self.path, dtype=self.dtype, mode="r",
            offset=self._offsets[i], shape=(h, w))

    def __getitem__(self, key):
        if isinstance(key, int):
            return self.page(key)
        if isinstance(key, slice):
            return np.stack(
                [self.page(i) for i in range(*key.indices(len(self)))])
        # (z, y, x)-style tuple: map z pages, slice the rest
        z = key[0]
        rest = key[1:]
        if isinstance(z, int):
            return self.page(z)[rest]
        return np.stack(
            [self.page(i)[rest]
             for i in range(*z.indices(len(self)))])

    def asarray(self) -> np.ndarray:
        return self[:]
