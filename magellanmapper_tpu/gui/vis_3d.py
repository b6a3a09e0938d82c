"""Headless 3D visualization exports (reference ``magmap/gui/vis_3d.py``).

The reference renders blobs and ROI surfaces interactively through
Mayavi/VTK (C++). Headless equivalents: matplotlib 3D blob point clouds
(``Vis3D`` points mode), maximum-intensity projections (the practical
surface view), and isotropic visual scaling (``isotropic_vis``).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from magellanmapper_tpu.plot import colormaps, plot_support  # noqa: E402

_logger = logging.getLogger(__name__)


def plot_blobs_3d(
        blobs: np.ndarray, roi_shape: Sequence[int],
        out_path: Optional[str] = None,
        isotropic_vis: Sequence[float] = (1, 1, 1),
        color_by_channel: bool = True):
    """3D scatter of blobs sized by radius (Vis3D points mode)."""
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    scale = np.asarray(isotropic_vis, float)
    coords = blobs[:, :3] * scale
    sizes = np.clip(blobs[:, 3] ** 2 * 4, 4, 200)
    chls = blobs[:, 6].astype(int) if blobs.shape[1] > 6 else \
        np.zeros(len(blobs), int)
    for chl in np.unique(chls):
        sel = chls == chl
        color = colormaps.CHANNEL_COLORS[
            chl % len(colormaps.CHANNEL_COLORS)]
        ax.scatter(coords[sel, 2], coords[sel, 1], coords[sel, 0],
                   s=sizes[sel], color=color, alpha=0.6,
                   label=f"chl {chl}")
    ax.set_xlim(0, roi_shape[2] * scale[2])
    ax.set_ylim(0, roi_shape[1] * scale[1])
    ax.set_zlim(0, roi_shape[0] * scale[0])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.invert_zaxis()
    ax.legend()
    if out_path:
        plot_support.save_fig(fig, out_path)
    plt.close(fig)
    return fig


def plot_max_intensity_projections(
        roi: np.ndarray, out_path: Optional[str] = None,
        blobs: Optional[np.ndarray] = None):
    """Orthogonal maximum-intensity projections (surface-view stand-in)."""
    vol = roi if roi.ndim == 3 else roi.max(axis=-1)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    titles = ("xy (max over z)", "xz (max over y)", "yz (max over x)")
    for ax, axis, title in zip(axes, (0, 1, 2), titles):
        mip = vol.max(axis=axis)
        ax.imshow(mip, cmap="magma")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
        if blobs is not None and len(blobs):
            plane_coords = {
                0: (blobs[:, 2], blobs[:, 1]),
                1: (blobs[:, 2], blobs[:, 0]),
                2: (blobs[:, 1], blobs[:, 0])}[axis]
            ax.scatter(*plane_coords, s=8, facecolors="none",
                       edgecolors="cyan", linewidths=0.6)
    if out_path:
        plot_support.save_fig(fig, out_path)
    plt.close(fig)
    return fig


class Vis3D:
    """3D viewer state (reference ``gui/vis_3d.Vis3D :33``): holds the
    scene volume/blobs and renders MIP panes or point clouds through the
    module's headless renderers."""

    def __init__(self, roi: Optional[np.ndarray] = None):
        self.roi = roi
        self.blobs: Optional[np.ndarray] = None
        self.surfaces = []

    def update_img_display(self, roi: np.ndarray) -> None:
        self.roi = roi

    def show_blobs(self, blobs: np.ndarray) -> None:
        self.blobs = blobs

    def clear_scene(self) -> None:
        self.blobs = None
        self.surfaces = []

    def render(self, out_path: str):
        """Render MIPs (plus blob scatter when set) to ``out_path``."""
        if self.blobs is not None and len(self.blobs):
            return plot_blobs_3d(self.roi, self.blobs, out_path)
        return plot_max_intensity_projections(self.roi, out_path)


def plot_surface_3d(
        roi: np.ndarray, level: Optional[float] = None,
        out_path: Optional[str] = None,
        isotropic_vis: Sequence[float] = (1, 1, 1),
        color: str = "tab:orange", alpha: float = 0.8):
    """Render the ROI's isosurface as a real 3D mesh (Vis3D surface mode).

    The reference draws Mayavi ``contour3d`` surfaces; here the mesh
    comes from the surface-nets extractor
    (:func:`cv.cv_nd.surface_net_mesh`) and renders through
    matplotlib's ``Poly3DCollection``.
    """
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection
    from magellanmapper_tpu.cv import cv_nd

    roi = np.asarray(roi, np.float32)
    if level is None:
        from magellanmapper_tpu.ops import preproc
        import jax.numpy as jnp
        level = float(preproc.otsu_threshold(jnp.asarray(roi)))
    verts, faces = cv_nd.surface_net_mesh(roi, level)
    scale = np.asarray(isotropic_vis, float)
    verts = verts * scale

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    if len(faces):
        # x,y,z order for mpl
        tris = verts[faces][:, :, ::-1]
        coll = Poly3DCollection(
            tris, alpha=alpha, facecolor=color, edgecolor="none")
        ax.add_collection3d(coll)
    shape = np.asarray(roi.shape) * scale
    ax.set_xlim(0, shape[2])
    ax.set_ylim(0, shape[1])
    ax.set_zlim(0, shape[0])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.invert_zaxis()
    if out_path:
        plot_support.save_fig(fig, out_path)
    plt.close(fig)
    return fig, (verts, faces)
