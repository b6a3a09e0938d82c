"""Headless 3D visualization exports (reference ``magmap/gui/vis_3d.py``).

The reference renders blobs and ROI surfaces interactively through
Mayavi/VTK (C++). Headless equivalents: matplotlib 3D blob point clouds
(``Vis3D`` points mode), maximum-intensity projections (the practical
surface view), and isotropic visual scaling (``isotropic_vis``).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

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


class Vis3DCanvas:
    """Interactive 3D camera over a :class:`Vis3D` scene.

    Mpl-event replacement for the reference's Mayavi scene interaction
    (``magmap/gui/vis_3d.py:21`` — orbit/zoom/pan camera over
    ``contour3d``/point clouds): left-drag orbits (azimuth/elevation),
    scroll zooms, arrow keys pan the focal point, ``r`` resets. Events
    arrive through the Matplotlib canvas so the camera works identically
    under a windowed backend and under synthetic-event tests (the same
    pattern as the ROI/atlas editor canvases).
    """

    #: degrees of orbit per dragged pixel
    ORBIT_RATE = 0.4
    #: zoom factor per scroll step
    ZOOM_STEP = 1.2

    def __init__(self, vis3d: "Vis3D", figsize=(7, 7),
                 max_points: int = 20000, render_mode: str = "mpl",
                 render_hw: Tuple[int, int] = (384, 384),
                 iso_level: Optional[float] = None):
        """``render_mode``: ``"mpl"`` (mesh/point-cloud scene on a 3D
        axes), ``"volume"`` (TPU shear-warp emission-absorption
        rendering — the Mayavi ``volume`` mode), ``"mip"``
        (arbitrary-angle maximum intensity projection), or
        ``"isosurface"`` (shaded first-crossing with a depth buffer
        that occlusion-tests the blob overlay — ``contour3d``). The
        TPU modes re-render on every orbit/zoom through cached jit
        programs (angles/zoom are traced scalars)."""
        from matplotlib.figure import Figure
        from matplotlib.backends.backend_agg import FigureCanvasAgg

        self.vis3d = vis3d
        self.max_points = max_points
        self.render_mode = render_mode
        self.render_hw = tuple(render_hw)
        self.iso_level = iso_level
        self._azim, self._elev, self._zoom = -60.0, 30.0, 1.0
        self._depth = None
        #: index into ``vis3d.blobs`` of the picked blob (None = none)
        self.selected_blob: Optional[int] = None
        #: optional ROIEditor sharing the scene's blob array — picking
        #: + the ``c`` key route confirmed-flag edits (and thence
        #: ``editor.save(db)``) through the same path as the ROI editor
        self.editor = None
        self.fig = Figure(figsize=figsize)
        self.canvas = FigureCanvasAgg(self.fig)
        self.ax = self.fig.add_subplot(
            **({} if render_mode != "mpl" else {"projection": "3d"}))
        self._drag_start = None
        self._home = None
        self.cids = [
            self.canvas.mpl_connect("button_press_event", self.on_press),
            self.canvas.mpl_connect(
                "button_release_event", self.on_release),
            self.canvas.mpl_connect(
                "motion_notify_event", self.on_motion),
            self.canvas.mpl_connect("scroll_event", self.on_scroll),
            self.canvas.mpl_connect("key_press_event", self.on_key),
        ]
        self.draw_scene()

    # -- scene --------------------------------------------------------------

    def draw_scene(self) -> None:
        """(Re)build the scene: surface meshes when present, else a
        thresholded voxel point cloud, plus the blob scatter."""
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        if self.render_mode != "mpl":
            self._draw_raycast()
            return
        az, el = self.ax.azim, self.ax.elev
        self.ax.clear()
        roi = self.vis3d.roi
        if self.vis3d.surfaces:
            for verts, faces in self.vis3d.surfaces:
                if len(faces):
                    self.ax.add_collection3d(Poly3DCollection(
                        np.asarray(verts)[np.asarray(faces)][:, :, ::-1],
                        alpha=0.6, facecolor="tab:orange",
                        edgecolor="none"))
        elif roi is not None:
            flat = np.asarray(roi).reshape(-1)
            n = min(self.max_points, max(1, flat.size // 50))
            thresh = np.partition(flat, flat.size - n)[flat.size - n]
            zz, yy, xx = np.nonzero(np.asarray(roi) >= thresh)
            vals = np.asarray(roi)[zz, yy, xx]
            self.ax.scatter(xx, yy, zz, c=vals, s=2, alpha=0.35,
                            cmap="magma")
        if self.vis3d.blobs is not None and len(self.vis3d.blobs):
            b = np.asarray(self.vis3d.blobs)
            self.ax.scatter(b[:, 2], b[:, 1], b[:, 0],
                            s=(np.maximum(b[:, 3], 1.0) * 8) ** 2 / 4,
                            facecolors="none", edgecolors="cyan")
        if roi is not None:
            shape = np.asarray(roi).shape
            self.ax.set_xlim(0, shape[2])
            self.ax.set_ylim(0, shape[1])
            self.ax.set_zlim(shape[0], 0)
        self.ax.view_init(elev=el, azim=az)
        if self._home is None:
            self._home = self.camera_state()
        self.canvas.draw_idle()

    def _draw_raycast(self) -> None:
        """Render the scene through the TPU ray-caster at the current
        orbit pose and blit it onto the 2D axes."""
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import render3d

        roi = self.vis3d.roi
        self.ax.clear()
        if roi is None:
            self.canvas.draw_idle()
            return
        vol = jnp.asarray(np.asarray(roi, np.float32))
        # shear-warp (MXU band-matmul) renderers: ~100x the gather
        # ray-casters' TPU frame rate, so orbiting stays interactive
        if self.render_mode == "isosurface":
            if self.iso_level is None:
                from magellanmapper_tpu.ops import preproc
                self.iso_level = float(preproc.otsu_threshold(vol))
            rgb, depth = render3d.render_isosurface_sw(
                vol, self.iso_level, self._azim, self._elev,
                out_hw=self.render_hw, zoom=self._zoom)
            self._depth = np.asarray(depth)
            img = np.asarray(rgb)
        else:
            vmax = float(np.max(roi))
            img = np.asarray(render3d.render_volume_sw(
                vol, self._azim, self._elev, vmin=0.1 * vmax,
                vmax=vmax, out_hw=self.render_hw, zoom=self._zoom,
                opacity=0.08,
                mode="mip" if self.render_mode == "mip"
                else "composite"))
            self._depth = None
        self.ax.imshow(img)
        self.ax.set_axis_off()
        if self.vis3d.surfaces:
            # arbitrary mesh actors in the TPU scene: depth-occluded
            # vertex splats through the same camera as the blob overlay
            # (Mayavi surface actors; the mpl mode renders full
            # Poly3DCollections)
            from magellanmapper_tpu.ops import render3d
            depth = (self._depth if self._depth is not None
                     else np.full(self.render_hw, np.inf, np.float32))
            for verts, _faces in self.vis3d.surfaces:
                verts = np.asarray(verts)
                if not len(verts):
                    continue
                step = max(1, len(verts) // 2000)
                pts = render3d.render_blobs_overlay(
                    depth, verts[::step], np.asarray(roi).shape,
                    self._azim, self._elev, out_hw=self.render_hw,
                    zoom=self._zoom)
                vis = pts[:, 2] > 0
                if vis.any():
                    self.ax.scatter(pts[vis, 1], pts[vis, 0], s=2,
                                    c="orange", alpha=0.6)
        if self.vis3d.blobs is not None and len(self.vis3d.blobs):
            pts = self.project_blobs()
            vis = pts[:, 2] > 0
            if vis.any():
                self.ax.scatter(pts[vis, 1], pts[vis, 0], s=30,
                                facecolors="none", edgecolors="cyan")
            sel = self.selected_blob
            if sel is not None and sel < len(pts) and pts[sel, 2] > 0:
                self.ax.scatter([pts[sel, 1]], [pts[sel, 0]], s=90,
                                facecolors="none", edgecolors="yellow",
                                linewidths=2)
        if self._home is None:
            self._home = self.camera_state()
        self.canvas.draw_idle()

    # -- picking ------------------------------------------------------------

    def attach_editor(self, editor) -> None:
        """Route blob selection/confirmation through an
        :class:`gui.roi_editor.ROIEditor` that shares the scene's blob
        array, so 3D picks feed the same confirmed-flag cycle and
        ``editor.save(db)`` persistence as the ROI editor (reference
        Mayavi pick -> verified flow, ``gui/vis_3d.py:21`` +
        ``roi_editor.py:39``)."""
        self.editor = editor
        self.vis3d.show_blobs(editor.blobs)

    def project_blobs(self) -> np.ndarray:
        """(N, 4) ``(row, col, visible, ray_depth)`` of the scene blobs
        under the current camera (occlusion via the last isosurface
        depth buffer when one exists)."""
        from magellanmapper_tpu.ops import render3d

        depth = (self._depth if self._depth is not None
                 else np.full(self.render_hw, np.inf, np.float32))
        return render3d.render_blobs_overlay(
            depth, np.asarray(self.vis3d.blobs),
            np.asarray(self.vis3d.roi).shape, self._azim, self._elev,
            out_hw=self.render_hw, zoom=self._zoom)

    def pick_blob(self, row: float, col: float,
                  pick_px: float = 8.0) -> Optional[int]:
        """Select the blob under image pixel ``(row, col)``: candidates
        within each blob's projected radius (floored at ``pick_px``),
        visible ones only, nearest-by-depth wins (the Mayavi glyph-pick
        semantics). Returns the blob index or None; updates
        ``selected_blob`` and redraws the highlight."""
        if (self.render_mode == "mpl" or self.vis3d.blobs is None
                or not len(self.vis3d.blobs)):
            return None
        pts = self.project_blobs()
        b = np.asarray(self.vis3d.blobs)
        h = self.render_hw[0]
        extent = np.asarray(np.asarray(self.vis3d.roi).shape, np.float32)
        span = 2.0 * float(np.linalg.norm(extent)) / 2.0 / self._zoom
        px_per_vox = (h - 1) / span
        pick_r = np.maximum(
            pick_px, np.maximum(b[:, 3], 1.0) * px_per_vox)
        d2 = (pts[:, 0] - row) ** 2 + (pts[:, 1] - col) ** 2
        cand = (d2 <= pick_r ** 2) & (pts[:, 2] > 0)
        if not cand.any():
            if self.selected_blob is not None:
                # deselect AND clear the stale highlight
                self.selected_blob = None
                self._draw_raycast()
            return None
        idx = int(np.argmin(np.where(cand, pts[:, 3], np.inf)))
        self.selected_blob = idx
        self._draw_raycast()
        return idx

    def confirm_selected(self, flag: Optional[int] = None) -> Optional[int]:
        """Confirm/flag the picked blob through the attached editor:
        ``flag=None`` advances the -1 -> 0 -> 1 cycle (the reference
        circle-click flow); an explicit flag sets it. Returns the new
        flag, or None when nothing is selected/attached."""
        if self.selected_blob is None or self.editor is None:
            return None
        if flag is None:
            new = self.editor.cycle_confirmed(self.selected_blob)
        else:
            self.editor.set_confirmed(self.selected_blob, int(flag))
            new = int(flag)
        return new

    # -- camera -------------------------------------------------------------

    def camera_state(self) -> dict:
        """Current camera as a dict (orbit angles + axis bounds)."""
        if self.render_mode != "mpl":
            return {"azim": self._azim, "elev": self._elev,
                    "zoom": self._zoom, "mode": self.render_mode}
        return {
            "azim": float(self.ax.azim), "elev": float(self.ax.elev),
            "xlim": tuple(self.ax.get_xlim()),
            "ylim": tuple(self.ax.get_ylim()),
            "zlim": tuple(self.ax.get_zlim()),
        }

    def orbit(self, d_azim: float, d_elev: float) -> None:
        if self.render_mode != "mpl":
            self._azim += d_azim
            self._elev = float(np.clip(self._elev + d_elev, -89.9, 89.9))
            self._draw_raycast()
            return
        self.ax.view_init(
            elev=float(np.clip(self.ax.elev + d_elev, -90.0, 90.0)),
            azim=self.ax.azim + d_azim)
        self.canvas.draw_idle()

    def zoom(self, factor: float) -> None:
        """Scale the view box about its center (Mayavi dolly)."""
        if self.render_mode != "mpl":
            # mpl factor < 1 shrinks the view box = zoom IN; the
            # ray-caster's zoom scales the film plane the other way
            self._zoom /= factor
            self._draw_raycast()
            return
        for get, set_ in ((self.ax.get_xlim, self.ax.set_xlim),
                          (self.ax.get_ylim, self.ax.set_ylim),
                          (self.ax.get_zlim, self.ax.set_zlim)):
            lo, hi = get()
            c = (lo + hi) / 2
            half = (hi - lo) / 2 * factor
            set_(c - half, c + half)
        self.canvas.draw_idle()

    def pan(self, dx: float = 0, dy: float = 0, dz: float = 0) -> None:
        """Shift the focal point in data units."""
        axes = ((dx, self.ax.get_xlim, self.ax.set_xlim),
                (dy, self.ax.get_ylim, self.ax.set_ylim))
        if self.render_mode == "mpl":
            axes = axes + ((dz, self.ax.get_zlim, self.ax.set_zlim),)
        for d, get, set_ in axes:
            if d:
                lo, hi = get()
                set_(lo + d, hi + d)
        self.canvas.draw_idle()

    def reset_camera(self) -> None:
        home = self._home or {}
        if self.render_mode != "mpl":
            if "azim" in home:
                self._azim, self._elev = home["azim"], home["elev"]
                self._zoom = home.get("zoom", 1.0)
            self._draw_raycast()
            return
        if "azim" in home:
            self.ax.view_init(elev=home["elev"], azim=home["azim"])
            self.ax.set_xlim(*home["xlim"])
            self.ax.set_ylim(*home["ylim"])
            self.ax.set_zlim(*home["zlim"])
        self.canvas.draw_idle()

    # -- event handlers -----------------------------------------------------

    def on_press(self, event) -> None:
        if event.button == 1:
            self._drag_start = (event.x, event.y)
            self._press_pos = (event.x, event.y)

    def on_release(self, event) -> None:
        start = getattr(self, "_press_pos", None)
        self._drag_start = None
        self._press_pos = None
        if (start is None or event.x is None
                or self.render_mode == "mpl"):
            return
        # a press-release with <3 px of motion is a click -> pick
        if (abs(event.x - start[0]) < 3 and abs(event.y - start[1]) < 3
                and event.inaxes is self.ax
                and event.xdata is not None):
            self.pick_blob(event.ydata, event.xdata)

    def on_motion(self, event) -> None:
        if self._drag_start is None or event.x is None:
            return
        x0, y0 = self._drag_start
        self.orbit((x0 - event.x) * self.ORBIT_RATE,
                   (event.y - y0) * self.ORBIT_RATE)
        self._drag_start = (event.x, event.y)

    def on_scroll(self, event) -> None:
        self.zoom(1.0 / self.ZOOM_STEP if event.step > 0
                  else self.ZOOM_STEP)

    def on_key(self, event) -> None:
        span = abs(self.ax.get_xlim()[1] - self.ax.get_xlim()[0]) * 0.05
        if event.key == "left":
            self.pan(dx=-span)
        elif event.key == "right":
            self.pan(dx=span)
        elif event.key == "up":
            self.pan(dy=span)
        elif event.key == "down":
            self.pan(dy=-span)
        elif event.key == "r":
            self.reset_camera()
        elif event.key == "c":
            # confirmed-flag cycle on the picked blob (ROI-editor flow)
            self.confirm_selected()

    def save(self, out_path: str) -> str:
        from magellanmapper_tpu.plot import plot_support
        plot_support.save_fig(self.fig, out_path)
        return out_path
