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
