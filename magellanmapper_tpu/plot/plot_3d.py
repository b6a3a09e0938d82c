"""ROI preparation + preprocessing (reference ``magmap/plot/plot_3d.py``).

The reference keeps the detection-preprocessing chain in its plot
package (``saturate_roi :55``, ``denoise_roi :114``, ``threshold :175``,
``remap_intensity :270``, ``prepare_subimg/prepare_roi :340/:378``,
``build_ground_truth :533``, ``setup_channels :24``). This module keeps
those names, delegating the compute to the fused JAX ops
(``magellanmapper_tpu.ops.preproc``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from magellanmapper_tpu.ops import preproc


def setup_channels(
        roi: np.ndarray, channel: Optional[Sequence[int]],
        dim_channel: int) -> Tuple[bool, Sequence[int]]:
    """(multichannel, channels) for an ROI (reference ``:24``)."""
    multichannel = roi.ndim > dim_channel
    if multichannel:
        channels = (range(roi.shape[dim_channel]) if channel is None
                    else np.atleast_1d(channel))
    else:
        channels = [0]
    return multichannel, channels


def saturate_roi(
        roi: np.ndarray, clip_vmin: float = 5, clip_vmax: float = 99.5,
        max_thresh_factor: float = 0.5,
        near_max: Optional[Sequence[float]] = None,
        channel: Optional[Sequence[int]] = None) -> np.ndarray:
    """Percentile saturation per channel (reference ``saturate_roi``)."""
    multichannel, channels = setup_channels(roi, channel, 3)
    out = None
    for chl in channels:
        sub = roi[..., chl] if multichannel else roi
        nm = 1.0 if near_max is None else float(near_max[chl])
        res = np.asarray(preproc.saturate(
            jnp.asarray(np.asarray(sub, np.float32)), clip_vmin,
            clip_vmax, nm * max_thresh_factor))
        if multichannel:
            if out is None:
                out = np.zeros(roi.shape, np.float32)
            out[..., chl] = res
        else:
            out = res
    return out


def denoise_roi(
        roi: np.ndarray, channel: Optional[Sequence[int]] = None,
        clip_min: float = 0.2, clip_max: float = 1.0,
        tot_var_denoise=None, unsharp_strength: float = 0.3,
        erosion_threshold: float = 0.2) -> np.ndarray:
    """Denoise chain per channel (reference ``denoise_roi``)."""
    multichannel, channels = setup_channels(roi, channel, 3)
    out = None
    for chl in channels:
        sub = roi[..., chl] if multichannel else roi
        res = np.asarray(preproc.denoise(
            jnp.asarray(np.asarray(sub, np.float32)), clip_min, clip_max,
            tot_var_denoise, unsharp_strength, erosion_threshold))
        if multichannel:
            if out is None:
                out = np.zeros(roi.shape, np.float32)
            out[..., chl] = res
        else:
            out = res
    return out


def threshold(roi: np.ndarray) -> np.ndarray:
    """Otsu threshold mask (reference ``threshold :175`` otsu branch)."""
    t = float(np.asarray(preproc.otsu_threshold(
        jnp.asarray(np.asarray(roi, np.float32)))))
    return roi > t


def remap_intensity(roi: np.ndarray, channel=None) -> np.ndarray:
    """Histogram-equalization remap (reference ``remap_intensity``)."""
    from magellanmapper_tpu.cv import cv_nd
    return cv_nd.remap_intensity(roi, channel)


def prepare_subimg(
        image5d: np.ndarray, offset: Sequence[int],
        size: Sequence[int]) -> np.ndarray:
    """Extract a z,y,x sub-image from a 4/5D image
    (reference ``prepare_subimg :340``)."""
    vol = image5d[0] if image5d.ndim >= 4 else image5d
    sl = tuple(slice(o, o + s) for o, s in zip(offset, size))
    return vol[sl]


def prepare_roi(
        image5d: np.ndarray, offset: Sequence[int],
        size: Sequence[int]) -> np.ndarray:
    """ROI extraction with x,y,z offset/size convention
    (reference ``prepare_roi :378``)."""
    return prepare_subimg(image5d, offset[::-1], size[::-1])


def build_ground_truth(
        img3d: np.ndarray, blobs: np.ndarray,
        ellipsoid: bool = False) -> np.ndarray:
    """Rasterize blobs as spheres/ellipsoids into a mask image
    (reference ``build_ground_truth :533``)."""
    out = np.zeros(img3d.shape[:3], np.uint8)
    zz, yy, xx = np.indices(out.shape).astype(np.float32)
    for b in blobs:
        r = float(b[3])
        rz = r / 3 if ellipsoid else r
        mask = (((zz - b[0]) / max(rz, 1e-3)) ** 2
                + ((yy - b[1]) / max(r, 1e-3)) ** 2
                + ((xx - b[2]) / max(r, 1e-3)) ** 2) <= 1
        out[mask] = 1
    return out


def deconvolve(roi: np.ndarray, iterations: int = 30,
               psf: Optional[np.ndarray] = None) -> np.ndarray:
    """Richardson-Lucy deconvolution with a generic box PSF
    (reference ``plot_3d.deconvolve :254``), as device FFT iterations."""
    import jax.numpy as jnp
    if psf is None:
        psf = np.ones((5, 5, 5), np.float32) / 125.0
    img = jnp.asarray(roi, jnp.float32)
    img = jnp.maximum(img, 1e-12)
    shape = img.shape
    # pad PSF to image shape, centered at origin for FFT convolution
    psf_pad = np.zeros(shape, np.float32)
    sl = tuple(slice(0, s) for s in psf.shape)
    psf_pad[sl] = psf
    psf_pad = np.roll(
        psf_pad, [-(s // 2) for s in psf.shape], axis=(0, 1, 2))
    otf = jnp.fft.rfftn(jnp.asarray(psf_pad))
    otf_conj = jnp.conj(otf)
    est = img

    def conv(x, k):
        return jnp.maximum(jnp.fft.irfftn(
            jnp.fft.rfftn(x) * k, shape), 1e-12)

    import jax
    def body(_, est):
        ratio = img / conv(est, otf)
        return est * conv(ratio, otf_conj)
    est = jax.lax.fori_loop(0, iterations, body, est)
    return np.asarray(est)


def get_isotropic_vis(settings) -> np.ndarray:
    """Isotropic rescale factor for visualization from a profile
    (reference ``plot_3d.get_isotropic_vis :320``)."""
    isotropic = settings["isotropic_vis"]
    if isotropic is None:
        return np.ones(3)
    return np.asarray(isotropic, float)


def roi_center_to_offset(offset, shape, reverse: bool = False):
    """Center <-> corner conversion of an ROI offset
    (reference ``plot_3d.roi_center_to_offset :405``)."""
    half = np.floor_divide(shape, 2)
    out = np.add(offset, half) if reverse else np.subtract(offset, half)
    return tuple(int(v) for v in out)


def replace_vol(img: np.ndarray, vol: np.ndarray, center=None,
                offset=None, vol_as_mask=None) -> np.ndarray:
    """Place ``vol`` into ``img`` (in place), cropped at borders;
    ``center`` takes precedence over ``offset``
    (reference ``plot_3d.replace_vol :451``)."""
    if center is not None:
        offset = roi_center_to_offset(center, vol.shape[:img.ndim])
    offset = np.asarray(offset, int)
    lo_img = np.maximum(offset, 0)
    hi_img = np.minimum(offset + vol.shape[:img.ndim], img.shape)
    lo_vol = lo_img - offset
    hi_vol = lo_vol + (hi_img - lo_img)
    sl_img = tuple(slice(a, b) for a, b in zip(lo_img, hi_img))
    sl_vol = tuple(slice(a, b) for a, b in zip(lo_vol, hi_vol))
    if vol_as_mask is not None:
        mask = vol_as_mask[sl_vol]
        img[sl_img][mask] = vol[sl_vol][mask] if np.ndim(vol) else vol
    else:
        img[sl_img] = vol[sl_vol]
    return img


def pad_img(img: np.ndarray, offset, shape) -> np.ndarray:
    """Zero-pad an image into a larger canvas at ``offset``
    (reference ``plot_3d.pad_img :510``)."""
    out_shape = list(img.shape)
    for i, s in enumerate(shape or ()):
        if s is not None:
            out_shape[i] = int(s)
    out = np.zeros(out_shape, img.dtype)
    sl = tuple(slice(int(o), int(o) + s)
               for o, s in zip(offset, img.shape))
    out[sl] = img
    return out


def _voxel_surface_mesh(mask: np.ndarray):
    """Triangulate the exposed faces of a voxel mask: each boundary face
    becomes two triangles (the marching-cubes role in the reference's
    surface view, without a C dependency)."""
    verts = []
    faces = []
    vert_index = {}

    def vid(p):
        if p not in vert_index:
            vert_index[p] = len(verts)
            verts.append(p)
        return vert_index[p]

    padded = np.pad(mask, 1)
    coords = np.argwhere(mask) + 1
    # unit-face corner offsets per axis and direction
    for z, y, x in coords:
        for ax, d in ((0, -1), (0, 1), (1, -1), (1, 1), (2, -1), (2, 1)):
            nb = [z, y, x]
            nb[ax] += d
            if padded[tuple(nb)]:
                continue
            base = np.array([z, y, x], float) - 1
            face = base.copy()
            if d > 0:
                face[ax] += 1
            others = [a for a in range(3) if a != ax]
            c00 = face.copy()
            c10 = face.copy(); c10[others[0]] += 1
            c01 = face.copy(); c01[others[1]] += 1
            c11 = face.copy(); c11[others[0]] += 1; c11[others[1]] += 1
            i00, i10, i01, i11 = (vid(tuple(c)) for c in
                                  (c00, c10, c01, c11))
            faces.append((i00, i10, i11))
            faces.append((i00, i11, i01))
    return np.asarray(verts, float), np.asarray(faces, int)


def show_surface_labels(segments: np.ndarray, vis=None) -> list:
    """Triangulated surfaces for segmented labels
    (reference ``plot_3d.show_surface_labels :428``); returns
    ``(label_id, verts, faces)`` per label."""
    meshes = []
    for lid in np.unique(segments):
        if lid <= 0:
            continue
        verts, faces = _voxel_surface_mesh(segments == lid)
        if len(faces):
            meshes.append((int(lid), verts, faces))
    if vis is not None and hasattr(vis, "surfaces"):
        vis.surfaces.extend(meshes)
    return meshes
