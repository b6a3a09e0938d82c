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
    """Animate z-planes into a GIF or MP4 (reference
    ``animate_imgs :277`` writes both formats).

    ``.mp4`` paths use Matplotlib's FFMpegWriter when an ``ffmpeg``
    binary is available, falling back to a ``.gif`` (PillowWriter, no
    external dependency) with a warning otherwise; any other extension
    writes a GIF.
    """
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
    if out_path.endswith(".mp4"):
        if animation.FFMpegWriter.isAvailable():
            anim.save(out_path, writer=animation.FFMpegWriter(fps=fps))
            plt.close(fig)
            _logger.info("saved animation to %s", out_path)
            return out_path
        _logger.warning(
            "ffmpeg not available; writing GIF instead of %s", out_path)
        out_path = out_path[:-4] + ".gif"
    if not out_path.endswith(".gif"):
        out_path += ".gif"
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    _logger.info("saved animation to %s", out_path)
    return out_path


def animate_rotation_3d(
        vol: np.ndarray, out_path: str, n_frames: int = 36,
        mode: str = "mip", elev: float = 20.0, fps: int = 12,
        out_hw=(384, 384), level: Optional[float] = None,
        vmin_frac: float = 0.1) -> str:
    """Orbit animation of a TPU-rendered 3D scene (GIF/MP4).

    Renders ``n_frames`` azimuth steps through the shear-warp engines
    (``ops.render3d``) — the rotation videos the reference produces by
    scripting the Mayavi camera — and writes them via the same
    GIF/MP4 writer as :func:`animate_imgs`. ``mode``:
    ``"mip"``/``"volume"`` (:func:`render_volume_sw`) or
    ``"isosurface"`` (:func:`render_isosurface_sw`; ``level`` defaults
    to Otsu).
    """
    import jax.numpy as jnp
    from magellanmapper_tpu.ops import render3d

    v = jnp.asarray(np.asarray(vol, np.float32))
    vmax = float(np.max(vol))
    if mode == "isosurface" and level is None:
        from magellanmapper_tpu.ops import preproc
        level = float(preproc.otsu_threshold(v))
    frames = []
    for i in range(n_frames):
        az = 360.0 * i / n_frames
        if mode == "isosurface":
            rgb, _ = render3d.render_isosurface_sw(
                v, level, az, elev, out_hw=tuple(out_hw))
            frames.append(np.asarray(rgb))
        else:
            frames.append(np.asarray(render3d.render_volume_sw(
                v, az, elev, vmin=vmin_frac * vmax, vmax=vmax,
                out_hw=tuple(out_hw),
                mode="mip" if mode == "mip" else "composite")))

    # frames are already-composited RGB: animate them directly rather
    # than through animate_imgs' channel overlay
    fig, ax = plt.subplots()
    ax.axis("off")
    im = ax.imshow(frames[0], animated=True)

    def update(i):
        im.set_array(frames[i])
        return [im]

    anim = animation.FuncAnimation(
        fig, update, frames=len(frames), blit=True)
    if out_path.endswith(".mp4") and animation.FFMpegWriter.isAvailable():
        anim.save(out_path, writer=animation.FFMpegWriter(fps=fps))
    else:
        if not out_path.endswith(".gif"):
            out_path = out_path.rsplit(".", 1)[0] + ".gif"
        anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    _logger.info("saved 3D rotation animation to %s", out_path)
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


class StackPlaneIO:
    """Plane-stack export state (reference ``export_stack.StackPlaneIO
    :30``). The reference fans planes out to worker processes; here
    plane processing is vectorized, so this class carries the images,
    rescale factor, and colormaps, and builds the composite planes."""

    def __init__(self, images=None, rescale: float = 1.0,
                 cmaps_labels=None, origin=None, aspect=None):
        self.images = images
        self.rescale = rescale
        self.cmaps_labels = cmaps_labels
        self.origin = origin
        self.aspect = aspect
        self.fn_process = None

    @classmethod
    def set_data(cls, images, fn_process=None, rescale: float = 1.0):
        """Reference-compatible constructor-style initializer."""
        obj = cls(images, rescale)
        obj.fn_process = fn_process
        return obj

    def build_stack(self, slice_vals=None):
        """Composite plane list: intensity planes plus overlaid labels
        planes, rescaled."""
        if not self.images:
            return None
        from magellanmapper_tpu.cv import cv_nd
        imgs = self.images
        n = len(imgs[0])
        idx = range(n) if slice_vals is None else range(*slice_vals)
        out = []
        for i in idx:
            planes = []
            for j, img in enumerate(imgs):
                plane = np.asarray(img[i])
                if self.rescale and self.rescale != 1:
                    plane = cv_nd.rescale_resize(
                        plane, self.rescale,
                        order=1 if j == 0 else 0, preserve_range=True)
                if self.fn_process is not None:
                    _, plane = self.fn_process(i, plane)
                planes.append(plane)
            out.append(planes)
        return out


def setup_stack(image5d: Optional[np.ndarray] = None,
                path: Optional[str] = None, offset=None, roi_size=None,
                slice_vals=None, rescale: Optional[float] = None,
                labels_imgs=None) -> StackPlaneIO:
    """Prepare a plane stack from a volume (or directory of plane
    files) with optional ROI cropping
    (reference ``export_stack.setup_stack :362``)."""
    if image5d is None and path:
        from magellanmapper_tpu.io import np_io
        image5d = np_io.read_file(path).img
    vol = image5d[0] if image5d is not None and image5d.ndim >= 4 \
        else image5d
    if offset is not None and roi_size is not None:
        off = np.asarray(offset, int)
        size = np.asarray(roi_size, int)
        vol = vol[off[0]:off[0] + size[0], off[1]:off[1] + size[1],
                  off[2]:off[2] + size[2]]
    images = [vol]
    for labels_img in labels_imgs or ():
        if labels_img is not None:
            img = labels_img
            if offset is not None and roi_size is not None:
                img = img[off[0]:off[0] + size[0],
                          off[1]:off[1] + size[1],
                          off[2]:off[2] + size[2]]
            images.append(img)
    io = StackPlaneIO(images, rescale or 1.0)
    io.slice_vals = slice_vals
    return io


def reg_planes_to_img(imgs, path: Optional[str] = None, ax=None):
    """Overlay one plane from each registered image type (intensity,
    labels, borders...) in a single frame
    (reference ``export_stack.reg_planes_to_img :635``)."""
    from magellanmapper_tpu.plot import colormaps, plot_support
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.get_figure()
    ax.imshow(imgs[0], cmap="gray")
    for overlay in imgs[1:]:
        cmap = colormaps.get_labels_discrete_colormap(overlay, 0)
        ax.imshow(cmap(overlay), alpha=0.5)
    plot_support.hide_axes(ax, True)
    if path:
        fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return fig
