"""Plane export and animation.

Equivalent of ``magmap/io/export_stack.py``: ``export_planes :672``
(z-planes to image files, optionally per channel), ``stack_to_img :502``
and ``animate_imgs :277`` (GIF animation via matplotlib).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402

from magellanmapper_tpu.plot import plot_support  # noqa: E402

_logger = logging.getLogger(__name__)


def export_planes(
        image: np.ndarray, out_dir: str, ext: str = "png",
        channel: Optional[int] = None,
        separate_channels: bool = False) -> list:
    """Export each z-plane as an image file
    (reference ``export_planes :672``)."""
    os.makedirs(out_dir, exist_ok=True)
    vol = image[0] if image.ndim >= 4 and image.shape[0] == 1 else image
    paths = []
    multichannel = vol.ndim > 3
    for z in range(vol.shape[0]):
        plane = vol[z]
        if multichannel and channel is not None:
            plane = plane[..., channel]
        if separate_channels and multichannel:
            for c in range(plane.shape[2]):
                path = os.path.join(
                    out_dir, f"plane_{z:05d}_chl{c}.{ext}")
                _save_plane(plane[..., c], path)
                paths.append(path)
        else:
            path = os.path.join(out_dir, f"plane_{z:05d}.{ext}")
            rgb = plot_support.overlay_images(plane) if (
                multichannel and channel is None) else plane
            _save_plane(rgb, path)
            paths.append(path)
    _logger.info("exported %d planes to %s", len(paths), out_dir)
    return paths


def _save_plane(plane: np.ndarray, path: str) -> None:
    fig, ax = plt.subplots()
    ax.imshow(plane, cmap=None if plane.ndim > 2 else "gray")
    ax.axis("off")
    fig.savefig(path, dpi=150, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def animate_imgs(
        image: np.ndarray, out_path: str, fps: int = 10,
        channel: Optional[int] = None) -> str:
    """Animate z-planes into a GIF (reference ``animate_imgs :277``)."""
    vol = image[0] if image.ndim >= 4 and image.shape[0] == 1 else image
    multichannel = vol.ndim > 3
    fig, ax = plt.subplots()
    ax.axis("off")

    def frame(z):
        plane = vol[z]
        if multichannel:
            plane = (plane[..., channel] if channel is not None
                     else plot_support.overlay_images(plane))
        return plane

    im = ax.imshow(frame(0), cmap=None if multichannel else "gray",
                   animated=True)

    def update(z):
        im.set_array(frame(z))
        return [im]

    anim = animation.FuncAnimation(
        fig, update, frames=vol.shape[0], blit=True)
    if not out_path.endswith(".gif"):
        out_path += ".gif"
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    _logger.info("saved animation to %s", out_path)
    return out_path


def stack_to_img(
        image: np.ndarray, out_path: str,
        slice_range: Optional[Sequence[int]] = None,
        n_cols: int = 4) -> str:
    """Montage of z-planes into one figure
    (reference ``stack_to_img :502``)."""
    vol = image[0] if image.ndim >= 4 and image.shape[0] == 1 else image
    zs = range(vol.shape[0]) if slice_range is None else range(
        *slice_range)
    zs = list(zs)
    n_rows = -(-len(zs) // n_cols)
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(3 * n_cols, 3 * n_rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis("off")
    for ax, z in zip(axes, zs):
        plane = vol[z]
        if plane.ndim > 2:
            plane = plot_support.overlay_images(plane)
        ax.imshow(plane, cmap=None if plane.ndim > 2 else "gray")
        ax.set_title(f"z={z}", fontsize=8)
    return plot_support.save_fig(fig, out_path)
