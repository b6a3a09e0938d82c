"""File naming conventions.

Equivalent of ``magmap/io/naming.py``: ``make_subimage_name :9`` and
``get_roi_path :40``. Sub-image offsets/shapes are handled in ``z,y,x``
order internally but serialized ``x,y,z`` (user-facing order), matching
the reference's file names so archives interchange.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from magellanmapper_tpu.utils import libmag


def make_subimage_name(
        base: str, offset: Optional[Sequence[int]] = None,
        shape: Optional[Sequence[int]] = None,
        suffix: Optional[str] = None) -> str:
    """Name a sub-image file for a z,y,x ``offset``/``shape``.

    The tuples are reversed to x,y,z in the file name (reference
    ``naming.make_subimage_name :9``).
    """
    name = base
    if offset is not None and shape is not None:
        roi_site = "{}x{}".format(
            tuple(offset[::-1]), tuple(shape[::-1])).replace(" ", "")
        name = libmag.insert_before_ext(base, roi_site, "_")
    if suffix:
        name = libmag.combine_paths(name, suffix)
    return name


def get_roi_path(
        path: str, offset: Sequence[int],
        roi_size: Optional[Sequence[int]] = None) -> str:
    """Describe an ROI at ``path`` by offset and optional size
    (reference ``naming.get_roi_path :40``)."""
    size = ""
    if roi_size is not None:
        size = "x{}".format(tuple(int(s) for s in roi_size))
    return "{}_offset{}{}".format(
        os.path.splitext(path)[0],
        tuple(int(o) for o in offset), size).replace(" ", "")
