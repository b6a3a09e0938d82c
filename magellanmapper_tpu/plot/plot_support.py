"""Figure support: multichannel overlays, plane handling, saving.

Equivalent of ``magmap/plot/plot_support.py`` core surface:
``ImageOverlayer :319`` (alpha-blended multichannel/label overlays),
plane transposition (``transpose_images :977``), display downsampling
(``get_downsample_max_sizes :1586``), ``save_fig :1470``.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.plot import colormaps

_logger = logging.getLogger(__name__)

#: max displayed pixels per plane edge before downsampling
DOWNSAMPLE_MAX_ELTS = 1000


def transpose_images(
        plane: Optional[str], arrs: Sequence[np.ndarray]) -> list:
    """Reorient z,y,x arrays for the given viewing plane
    (reference ``transpose_images :977``)."""
    if plane in (None, "xy"):
        return list(arrs)
    out = []
    for arr in arrs:
        if plane == "xz":
            out.append(np.swapaxes(arr, 0, 1))
        elif plane == "yz":
            out.append(np.swapaxes(arr, 0, 2))
        else:
            raise ValueError(f"unknown plane: {plane}")
    return out


def get_downsample_max_sizes(
        shape: Sequence[int],
        max_elts: int = DOWNSAMPLE_MAX_ELTS) -> Optional[int]:
    """Downsampling step so plane edges stay under ``max_elts``
    (reference ``get_downsample_max_sizes :1586``)."""
    largest = max(shape[1:3]) if len(shape) > 2 else max(shape)
    if largest <= max_elts:
        return None
    return int(np.ceil(largest / max_elts))


def overlay_images(
        plane_img: np.ndarray,
        channels: Optional[Sequence[int]] = None,
        alphas: Optional[Sequence[float]] = None,
        vmins: Optional[Sequence[float]] = None,
        vmaxs: Optional[Sequence[float]] = None,
        labels_plane: Optional[np.ndarray] = None,
        labels_cmap: Optional[colormaps.DiscreteColormap] = None,
        labels_alpha: float = 0.5) -> np.ndarray:
    """Blend a multichannel 2D plane (+ optional labels) into RGB
    (reference ``ImageOverlayer`` semantics)."""
    multichannel = plane_img.ndim > 2
    if channels is None:
        channels = range(plane_img.shape[2]) if multichannel else [0]
    out = np.zeros(plane_img.shape[:2] + (3,), dtype=float)
    for ci, chl in enumerate(channels):
        sub = plane_img[..., chl] if multichannel else plane_img
        vmin = vmins[ci] if vmins else float(np.nanmin(sub))
        vmax = vmaxs[ci] if vmaxs else float(np.nanmax(sub))
        span = max(vmax - vmin, 1e-12)
        norm = np.clip((sub - vmin) / span, 0, 1)
        color = np.asarray(
            colormaps.CHANNEL_COLORS[chl % len(colormaps.CHANNEL_COLORS)])
        alpha = alphas[ci] if alphas else 1.0
        out += alpha * norm[..., None] * color
    out = np.clip(out, 0, 1)
    if labels_plane is not None:
        if labels_cmap is None:
            labels_cmap = colormaps.DiscreteColormap(
                np.unique(labels_plane))
        rgba = labels_cmap(labels_plane)
        mask = rgba[..., 3] > 0
        out[mask] = ((1 - labels_alpha) * out[mask]
                     + labels_alpha * rgba[mask, :3])
    return out


def save_fig(
        fig, path: str, fmt: Optional[str] = None, dpi: int = 150) -> str:
    """Save a matplotlib figure, backing up existing output
    (reference ``save_fig :1470``)."""
    from magellanmapper_tpu.utils import libmag
    if fmt and not path.endswith(f".{fmt}"):
        path = f"{os.path.splitext(path)[0]}.{fmt}"
    libmag.backup_file(path)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    _logger.info("saved figure to %s", path)
    return path
