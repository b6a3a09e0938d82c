"""Whole-image transpose/rescale/preprocess with out-of-core output.

Equivalent of ``magmap/atlas/transformer.py``: ``transpose_img :152``
(plane reorientation + chunked rescale merged directly into a memmapped
``.npy`` output), ``get_transposed_image_path :119``, ``preprocess_img
:353``. The reference's ``Downsampler`` mp.Pool becomes device-batched
resize over z-chunks streamed from the source memmap.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from magellanmapper_tpu.io import np_io
from magellanmapper_tpu.ops import preproc, resize as resize_ops
from magellanmapper_tpu.utils import libmag

_logger = logging.getLogger(__name__)


def get_transposed_image_path(
        img_path: str, scale: Optional[float] = None,
        target_size: Optional[Sequence[int]] = None,
        plane: Optional[str] = None) -> str:
    """Path for a transposed/rescaled image
    (reference ``transformer.get_transposed_image_path :119``)."""
    modifier = ""
    if plane and plane != "xy":
        modifier += f"_plane{plane}"
    if scale is not None:
        modifier += f"_scale{scale}"
    elif target_size is not None:
        modifier += "_resized({},{},{})".format(*target_size)
    if not modifier:
        return img_path
    return libmag.insert_before_ext(img_path, modifier)


def transpose_img(
        img_path: str,
        plane: Optional[str] = None,
        rescale: Optional[float] = None,
        target_size: Optional[Sequence[int]] = None,
        chunk_z: int = 64, mesh=None) -> str:
    """Transpose and/or rescale a whole image, streaming z-chunks from the
    source memmap through device resize into a memmapped output
    (reference ``transformer.transpose_img :152``). With ``mesh`` the
    resize runs sharded over the device mesh
    (:func:`magellanmapper_tpu.ops.resize.resize_sharded`).

    Returns the output image path base.
    """
    img5d = np_io.read_file(img_path)
    vol = img5d.img
    if vol.ndim < 4:
        vol = vol[None]
    t, z, y, x = vol.shape[:4]
    multichannel = vol.ndim > 4
    res = (img5d.resolutions[0] if img5d.resolutions is not None
           else np.ones(3))

    # plane reorientation via axis swap (zyx -> target plane)
    perm = {None: (0, 1, 2), "xy": (0, 1, 2), "xz": (1, 0, 2),
            "yz": (2, 1, 0)}[plane]

    shape_tp = tuple(int(v) for v in np.asarray((z, y, x))[list(perm)])
    res_tp = res[list(perm)]
    if rescale is not None:
        out_shape = tuple(int(s * rescale) for s in shape_tp)
        res_out = res_tp / rescale
    elif target_size is not None:
        out_shape = tuple(int(s) for s in target_size)
        res_out = res_tp * np.divide(shape_tp, out_shape)
    else:
        out_shape = shape_tp
        res_out = res_tp

    out_path = get_transposed_image_path(img_path, rescale, target_size,
                                         plane)
    if out_path == img_path:
        return img_path  # no-op transform
    path_img, path_meta = np_io.make_filenames(out_path)
    full_shape = tuple(int(v) for v in (t,) + out_shape + tuple(vol.shape[4:]))
    out = np.lib.format.open_memmap(
        path_img, mode="w+", dtype=np.float32, shape=full_shape)

    for ti in range(t):
        moved = np.transpose(
            vol[ti], perm + tuple(range(3, vol[ti].ndim)))
        if out_shape == shape_tp:
            out[ti] = moved
            continue
        if mesh is not None:
            out[ti] = np.asarray(resize_ops.resize_sharded(
                jnp.asarray(np.asarray(moved, np.float32)), out_shape,
                mesh))
            continue
        # two-pass separable resize (bilinear is separable, so yx-then-z
        # equals joint trilinear exactly): pass 1 resizes yx per z-chunk
        # streamed from the source memmap; pass 2 resizes z on the much
        # smaller intermediate.
        inter_shape = (shape_tp[0],) + tuple(out_shape[1:])
        inter = np.empty(
            inter_shape + tuple(vol.shape[4:]), np.float32)
        for z0 in range(0, shape_tp[0], chunk_z):
            z1 = min(z0 + chunk_z, shape_tp[0])
            src = np.asarray(moved[z0:z1], np.float32)
            sub_shape = (z1 - z0,) + tuple(out_shape[1:])
            inter[z0:z1] = np.asarray(resize_ops.resize(
                jnp.asarray(src), sub_shape))
        if inter_shape[0] == out_shape[0]:
            out[ti] = inter
        else:
            out[ti] = np.asarray(resize_ops.resize(
                jnp.asarray(inter), out_shape))
    out.flush()

    near_min, near_max = np_io.calc_intensity_bounds(out)
    np_io.save_image_info(
        path_meta, [os.path.basename(out_path)], [full_shape],
        [list(res_out)], near_min=near_min, near_max=near_max,
        scaling=np.divide(out_shape, shape_tp).tolist(), plane=plane)
    _logger.info("Transposed %s -> %s %s", img_path, out_path, full_shape)
    return out_path


def preprocess_img(
        image5d: np.ndarray, preprocs: Sequence[str],
        channel: Optional[int] = None, out_path: Optional[str] = None
) -> np.ndarray:
    """Whole-image preprocessing tasks (reference ``preprocess_img :353``;
    task vocabulary per ``config.PreProcessKeys``: saturate, denoise,
    remap, rotate90)."""
    vol = np.array(image5d[0] if image5d.ndim >= 4 else image5d,
                   np.float32)
    multichannel = vol.ndim > 3
    channels = (range(vol.shape[3]) if multichannel else [0]) \
        if channel is None else [channel]
    for task in preprocs:
        task = str(task).lower()
        for chl in channels:
            sub = vol[..., chl] if multichannel else vol
            if task == "saturate":
                sub = np.asarray(preproc.saturate(
                    jnp.asarray(sub), 5.0, 99.5))
            elif task == "denoise":
                sub = np.asarray(preproc.denoise(
                    jnp.asarray(sub), 0.2, 1.0, unsharp_strength=0.3,
                    erosion_threshold=0.2))
            elif task == "remap":
                from magellanmapper_tpu.cv import cv_nd
                sub = cv_nd.remap_intensity(sub)
            elif task == "rotate90":
                sub = np.rot90(sub, axes=(1, 2))
            else:
                raise ValueError(f"unknown preprocessing task: {task}")
            if multichannel:
                vol[..., chl] = sub
            else:
                vol = sub
    out = vol[None]
    if out_path:
        np_io.write_npy(out_path, out)
    return out


def make_modifier_plane(plane: str) -> str:
    """Filename modifier for a plane transposition
    (reference ``transformer.make_modifier_plane :76``)."""
    return f"plane{plane.upper()}"


def make_modifier_scale(scale: float) -> str:
    """Filename modifier for rescaling; decimal points become ``pt``
    (reference ``transformer.make_modifier_scale :88``)."""
    return f"scale{scale}".replace(".", "pt")


def make_modifier_resized(target_size) -> str:
    """Filename modifier for a resize target (x,y,z)
    (reference ``transformer.make_modifier_resized :104``)."""
    return "resized({},{},{})".format(*target_size)


def rotate_img(roi: np.ndarray, rotate: dict,
               order: Optional[int] = None) -> np.ndarray:
    """Apply an atlas profile's rotation schedule
    (reference ``transformer.rotate_img :326``); ``order=0`` for label
    images. ``rotate`` carries ``rotation`` as (angle, axis) pairs plus
    ``resize`` and default ``order``."""
    from magellanmapper_tpu.cv import cv_nd
    if order is None:
        order = rotate.get("order", 1)
    out = np.copy(roi)
    for angle, axis in rotate.get("rotation") or []:
        out = cv_nd.rotate_nd(
            out, angle, axis, order=order,
            resize=rotate.get("resize", False))
    return out


class Downsampler:
    """Chunked rescale of a large image (reference
    ``transformer.Downsampler :21``). The reference splits planes across
    worker processes; here the separable two-pass resize already runs as
    one batched device program, so this wrapper only carries state and
    delegates to :func:`transpose_img` machinery."""

    def __init__(self, img: np.ndarray):
        self.img = img

    def rescale(self, scale=None, target_size=None, order: int = 1):
        """Rescale by factor or to a target x,y,z size; returns the
        rescaled array."""
        from magellanmapper_tpu.cv import cv_nd
        if target_size is not None:
            out_shape = tuple(int(s) for s in target_size[::-1])
            return cv_nd.rescale_resize(self.img, out_shape, order=order,
                                        preserve_range=True)
        return cv_nd.rescale_resize(self.img, float(scale), order=order,
                                    preserve_range=True)
