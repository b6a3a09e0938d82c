"""Image import: TIFF/RAW/plane-directory -> memmapped image5d.

Equivalent of ``magmap/io/importer.py``: ``import_multiplane_images
:1039`` (plane-wise streaming into an ``open_memmap`` output),
``setup_import_multipage :830``, ``setup_import_dir :1245``,
``deconstruct_img_name :328`` (offset/size parsing from filenames), and
intensity-bound measurement. Bioformats/Java is not available; TIFF goes
through the self-contained ``io.tiff`` codec and RAW through dtype/shape
metadata.
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.io import np_io, tiff

_logger = logging.getLogger(__name__)


def deconstruct_img_name(
        img_name: str) -> Tuple[str, Optional[List[int]],
                                Optional[List[int]]]:
    """Parse sub-image offset/size from a filename
    (reference ``deconstruct_img_name :328``): names like
    ``base_(x,y,z)x(x,y,z)`` carry offset x size."""
    base = os.path.basename(img_name)
    m = re.search(
        r"_\((\d+),(\d+),(\d+)\)x\((\d+),(\d+),(\d+)\)", base)
    if not m:
        return img_name, None, None
    vals = [int(v) for v in m.groups()]
    stripped = img_name.replace(m.group(0), "")
    return stripped, vals[:3], vals[3:]


def make_subimage_name(
        base: str, offset: Sequence[int], size: Sequence[int]) -> str:
    """Sub-image path naming with x,y,z-ordered tuples; thin wrapper over
    ``io.naming.make_subimage_name`` (which speaks z,y,x per the
    reference)."""
    from magellanmapper_tpu.io import naming
    return naming.make_subimage_name(
        base, tuple(offset)[::-1], tuple(size)[::-1])


def import_tiff(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None,
        channel_dim: Optional[int] = None) -> np_io.Image5d:
    """Import a (multi-page) TIFF stack into a memmapped image5d."""
    arr = tiff.read_tiff(path)
    if arr.ndim == 2:
        arr = arr[None]
    if channel_dim is not None and arr.ndim == 3:
        pass  # single-channel stack
    out_path = out_path or path
    return np_io.write_npy(
        out_path, arr[None], resolutions=(
            [list(resolutions)] if resolutions is not None else None))


def import_raw(
        path: str, shape: Sequence[int], dtype,
        out_path: Optional[str] = None,
        offset_bytes: int = 0,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import a headerless RAW volume given shape (z,y,x[,c]) + dtype."""
    count = int(np.prod(shape))
    arr = np.memmap(
        path, dtype=dtype, mode="r", offset=offset_bytes, shape=tuple(shape))
    out_path = out_path or path
    return np_io.write_npy(
        out_path, np.asarray(arr)[None], resolutions=(
            [list(resolutions)] if resolutions is not None else None))


def setup_import_dir(dir_path: str, pattern: str = "*.tif*") -> List[str]:
    """Sorted plane files in a directory
    (reference ``setup_import_dir :1245``)."""
    files = sorted(glob.glob(os.path.join(dir_path, pattern)))
    if not files:
        raise FileNotFoundError(
            f"no files matching {pattern} in {dir_path}")
    return files


def import_planes_to_stack(
        plane_files: Sequence[str], out_path: str,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Stream per-plane images into a memmapped image5d
    (reference ``import_planes_to_stack :1295`` /
    ``import_multiplane_images :1039``)."""
    first = tiff.read_tiff(plane_files[0])
    if first.ndim > 2:
        first = first[0]
    shape = (1, len(plane_files)) + first.shape
    path_img, path_meta = np_io.make_filenames(out_path)
    out = np.lib.format.open_memmap(
        path_img, mode="w+", dtype=first.dtype, shape=shape)
    out[0, 0] = first
    for i, fname in enumerate(plane_files[1:], start=1):
        plane = tiff.read_tiff(fname)
        if plane.ndim > 2:
            plane = plane[0]
        out[0, i] = plane
    out.flush()
    near_min, near_max = np_io.calc_intensity_bounds(out)
    np_io.save_image_info(
        path_meta, [os.path.basename(out_path)], [shape],
        [list(resolutions)] if resolutions is not None else [[1.0, 1.0, 1.0]],
        near_min=near_min, near_max=near_max)
    return np_io.read_file(out_path)


def read_file(filename: str, series: Optional[int] = None,
              **kwargs) -> np_io.Image5d:
    """Load an imported image (reference ``importer.read_file :747``)."""
    return np_io.read_file(filename, series, **kwargs)
