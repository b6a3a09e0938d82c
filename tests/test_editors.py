"""Headless editor controllers: ROI blob curation, atlas label editing,
per-plane canvas (reference gui/roi_editor, gui/atlas_editor,
gui/plot_editor flows)."""

import numpy as np
import pytest

from magellanmapper_tpu.gui.atlas_editor import AtlasEditor
from magellanmapper_tpu.gui.plot_editor import PlotEditor
from magellanmapper_tpu.gui.roi_editor import ROIEditor


@pytest.fixture
def roi_ed(rng):
    roi = rng.random((12, 20, 20)).astype(np.float32)
    blobs = np.array([[3.0, 5, 5, 2], [8, 10, 12, 3]])
    return ROIEditor(roi, blobs, offset=(10, 20, 30))


class TestROIEditor:
    def test_add_move_delete_undo(self, roi_ed):
        idx = roi_ed.add_blob(6, 7, 8, radius=2.5, channel=1)
        assert len(roi_ed.blobs) == 3
        assert roi_ed.blobs[idx, 4] == 1          # manual adds confirmed
        assert roi_ed.blobs[idx, 6] == 1
        roi_ed.move_blob(idx, dz=100)             # clipped to ROI
        assert roi_ed.blobs[idx, 0] == 11
        roi_ed.delete_blob(idx)
        assert len(roi_ed.blobs) == 2
        assert roi_ed.undo()                       # restore deleted
        assert len(roi_ed.blobs) == 3

    def test_confirmed_cycle(self, roi_ed):
        assert roi_ed.blobs[0, 4] == -1
        assert roi_ed.cycle_confirmed(0) == 0
        assert roi_ed.cycle_confirmed(0) == 1
        assert roi_ed.cycle_confirmed(0) == -1
        assert roi_ed.verified_counts() == (2, 0, 0)

    def test_blobs_in_plane_radius(self, roi_ed):
        # blob at z=3 r=2 spans planes 1..5; blob at z=8 r=3 spans 5..11
        assert set(roi_ed.blobs_in_plane(2)) == {0}
        assert set(roi_ed.blobs_in_plane(5)) == {0, 1}
        assert set(roi_ed.blobs_in_plane(7)) == {1}

    def test_absolute_coords_and_db_roundtrip(self, roi_ed, tmp_path):
        from magellanmapper_tpu.io import sqlite as sq
        absb = roi_ed.blobs_absolute()
        np.testing.assert_array_equal(absb[0, :3], [13, 25, 35])
        db = sq.load_db(str(tmp_path / "e.db"))
        n = roi_ed.save(db, "exp1", 0)
        assert n == 2
        rois = db.get_rois()
        got = db.select_blobs_by_roi(rois[0]["id"])
        assert len(got) == 2
        db.close()


@pytest.fixture
def atlas_ed(rng):
    img = rng.random((10, 16, 16)).astype(np.float32)
    labels = np.zeros((10, 16, 16), np.int32)
    labels[:, 4:8, 4:8] = 5
    return AtlasEditor(img, labels)


class TestAtlasEditor:
    def test_paint_erase_undo(self, atlas_ed):
        before = atlas_ed.labels_img.copy()
        changed = atlas_ed.paint_label(0, 2, (12, 12), 2.0, 7)
        assert changed > 0
        assert atlas_ed.edited
        assert (atlas_ed.labels_img[2] == 7).sum() == changed
        assert atlas_ed.undo()
        np.testing.assert_array_equal(atlas_ed.labels_img, before)

    def test_erase_sets_background(self, atlas_ed):
        atlas_ed.erase_label(0, 3, (5, 5), 1.0)
        assert atlas_ed.labels_img[3, 5, 5] == 0

    def test_positions_and_label_lookup(self, atlas_ed):
        atlas_ed.set_position(0, 99)          # clipped
        assert atlas_ed.position[0] == 9
        assert atlas_ed.get_label_at((0, 5, 5)) == 5
        assert atlas_ed.get_label_name() is None   # no ref attached

    def test_interpolate_from_bookmark(self, atlas_ed):
        # paint label 9 on planes 1 and 6, then interpolate between
        atlas_ed.paint_label(0, 1, (10, 10), 2.5, 9)
        atlas_ed.paint_label(0, 6, (10, 10), 2.5, 9)
        # bookmark is now (9, axis 0, plane 6); two-click back to plane 1
        assert atlas_ed.interpolate_from_bookmark(0, 1)
        for z in range(2, 6):
            assert (atlas_ed.labels_img[z] == 9).any(), z

    def test_save_atlas(self, atlas_ed, tmp_path):
        from magellanmapper_tpu.io import sitk_io
        out = atlas_ed.save_atlas(str(tmp_path / "annotationEdit.mhd"))
        med = sitk_io.read_med_img(out)
        np.testing.assert_array_equal(med.img, atlas_ed.labels_img)
        assert not atlas_ed.edited


class TestPlotEditor:
    def test_scroll_zoom_pan(self, atlas_ed):
        pe = atlas_ed.make_plot_editor("xy")
        assert isinstance(pe, PlotEditor)
        start = pe.index
        pe.scroll(2)
        assert pe.index == start + 2
        pe.zoom(2.0)
        assert pe.view[2] == 8 and pe.view[3] == 8
        pe.pan(100, 100)                       # clipped to plane
        assert pe.view[0] == 8 and pe.view[1] == 8
        pe.reset_view()
        assert pe.view == [0.0, 0.0, 16.0, 16.0]

    def test_render_shapes_and_window(self, atlas_ed):
        pe = atlas_ed.make_plot_editor("xy")
        rgb = pe.render()
        assert rgb.shape == (16, 16, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1
        pe.update_intensity(0.0, 10.0)         # dim window
        dim = pe.render()
        # outside the label overlay the gray must dim
        bg = ~np.isin(atlas_ed.get_plane(0, pe.index, labels=True), [0]) == 0
        assert dim[bg].mean() < rgb[bg].mean()

    def test_pick_then_paint(self, atlas_ed):
        pe = atlas_ed.make_plot_editor("xy")
        lid = pe.pick_label(5, 5)
        assert lid == 5
        pe.brush_radius = 1.5
        changed = pe.paint(12, 12)
        assert changed > 0
        assert atlas_ed.labels_img[pe.index, 12, 12] == 5

    def test_orthogonal_axes(self, atlas_ed):
        pe_xz = atlas_ed.make_plot_editor("xz")
        assert pe_xz.render().shape == (10, 16, 3)
        pe_yz = atlas_ed.make_plot_editor("yz")
        assert pe_yz._plane_shape() == (10, 16)


class TestNamingLoadEnv:
    def test_make_subimage_name_zyx(self):
        from magellanmapper_tpu.io import naming
        # z,y,x in -> x,y,z in the name (reference convention)
        name = naming.make_subimage_name(
            "/d/brain.npy", (30, 20, 10), (60, 50, 40))
        assert name == "/d/brain_(10,20,30)x(40,50,60).npy"

    def test_importer_wrapper_matches_xyz(self):
        from magellanmapper_tpu.io import importer
        name = importer.make_subimage_name(
            "/d/brain.npy", (10, 20, 30), (40, 50, 60))
        assert name == "/d/brain_(10,20,30)x(40,50,60).npy"

    def test_get_roi_path(self):
        from magellanmapper_tpu.io import naming
        assert naming.get_roi_path("/d/b.npy", (1, 2, 3), (4, 5, 6)) \
            == "/d/b_offset(1,2,3)x(4,5,6)"

    def test_load_env_checks(self):
        from magellanmapper_tpu.io import load_env
        assert isinstance(load_env.is_venv_activated(), bool)
        assert not load_env.is_conda_activated("no_such_env_prefix")
        accel = load_env.check_accelerator()
        assert accel["device_count"] >= 1       # CPU devices in tests
        args = load_env.build_launch_args(["--help"])
        assert args[-1] == "--help" and "magellanmapper_tpu.io.cli" in args


class TestVis3DCanvas:
    """Interactive 3D camera (reference Mayavi scene interaction,
    magmap/gui/vis_3d.py:21) driven through real mpl events."""

    @pytest.fixture
    def canvas(self, rng):
        from magellanmapper_tpu.gui.vis_3d import Vis3D, Vis3DCanvas
        vis = Vis3D(rng.random((8, 16, 16)).astype(np.float32))
        vis.show_blobs(np.array([[4.0, 8, 8, 2]]))
        return Vis3DCanvas(vis, figsize=(3, 3), max_points=200)

    @staticmethod
    def _event(canvas, name, **kw):
        from matplotlib.backend_bases import (
            KeyEvent, MouseButton, MouseEvent)
        if name.startswith("key"):
            ev = KeyEvent(name, canvas.canvas, kw["key"])
        else:
            ev = MouseEvent(
                name, canvas.canvas, kw.get("x", 0), kw.get("y", 0),
                button=kw.get("button", MouseButton.LEFT),
                step=kw.get("step", 0))
        canvas.canvas.callbacks.process(name, ev)

    def test_drag_orbits_camera(self, canvas):
        az0, el0 = canvas.ax.azim, canvas.ax.elev
        self._event(canvas, "button_press_event", x=100, y=100)
        self._event(canvas, "motion_notify_event", x=140, y=120)
        self._event(canvas, "button_release_event", x=140, y=120)
        assert canvas.ax.azim != az0
        assert canvas.ax.elev != el0
        # released: further motion must not orbit
        az1 = canvas.ax.azim
        self._event(canvas, "motion_notify_event", x=200, y=200)
        assert canvas.ax.azim == az1

    def test_scroll_zooms_box(self, canvas):
        x0 = canvas.ax.get_xlim()
        self._event(canvas, "scroll_event", step=1)
        x1 = canvas.ax.get_xlim()
        assert (x1[1] - x1[0]) < (x0[1] - x0[0])   # zoom in shrinks box
        self._event(canvas, "scroll_event", step=-1)
        x2 = canvas.ax.get_xlim()
        assert (x2[1] - x2[0]) > (x1[1] - x1[0])

    def test_pan_and_reset(self, canvas):
        home = canvas.camera_state()
        self._event(canvas, "key_press_event", key="right")
        assert canvas.ax.get_xlim() != home["xlim"]
        self._event(canvas, "key_press_event", key="up")
        self._event(canvas, "key_press_event", key="r")
        state = canvas.camera_state()
        assert state["xlim"] == pytest.approx(home["xlim"])
        assert state["azim"] == pytest.approx(home["azim"])

    def test_surface_scene_renders(self, rng, tmp_path):
        from magellanmapper_tpu.gui.vis_3d import Vis3D, Vis3DCanvas
        from magellanmapper_tpu.cv import cv_nd
        vol = np.zeros((10, 12, 12), np.float32)
        vol[3:7, 4:8, 4:8] = 1.0
        vis = Vis3D(vol)
        vis.surfaces.append(cv_nd.surface_net_mesh(vol, 0.5))
        cv3 = Vis3DCanvas(vis, figsize=(3, 3))
        out = cv3.save(str(tmp_path / "scene.png"))
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 0


class TestVis3DCanvasRaycast:
    """TPU ray-cast render modes on the interactive canvas (reference
    Mayavi volume/contour3d scenes, magmap/gui/vis_3d.py:21)."""

    @pytest.fixture
    def sphere_vis(self):
        from magellanmapper_tpu.gui.vis_3d import Vis3D
        zz, yy, xx = np.indices((24, 24, 24)).astype(np.float32)
        r = np.sqrt((zz - 11.5) ** 2 + (yy - 11.5) ** 2 + (xx - 11.5) ** 2)
        vol = np.clip(1.0 - (r - 7.0) / 2.0, 0, 1).astype(np.float32)
        return Vis3D(vol)

    def _canvas(self, vis, mode):
        from magellanmapper_tpu.gui.vis_3d import Vis3DCanvas
        return Vis3DCanvas(vis, figsize=(2, 2), render_mode=mode,
                           render_hw=(48, 48))

    def _image(self, canvas):
        imgs = canvas.ax.get_images()
        assert imgs, "raycast mode should blit an image"
        return np.asarray(imgs[0].get_array())

    def test_volume_mode_renders_nonempty(self, sphere_vis):
        cv3 = self._canvas(sphere_vis, "volume")
        img = self._image(cv3)
        assert img.shape[:2] == (48, 48) and img.max() > 0.05

    def test_isosurface_mode_has_depth_and_orbits(self, sphere_vis):
        cv3 = self._canvas(sphere_vis, "isosurface")
        assert cv3._depth is not None and np.isfinite(cv3._depth).any()
        img0 = self._image(cv3).copy()
        az0 = cv3.camera_state()["azim"]
        TestVis3DCanvas._event(cv3, "button_press_event", x=10, y=10)
        TestVis3DCanvas._event(cv3, "motion_notify_event", x=60, y=30)
        assert cv3.camera_state()["azim"] != az0
        # a sphere re-renders similarly; the scene is still an image
        assert self._image(cv3).shape == img0.shape

    def test_scroll_changes_zoom_state(self, sphere_vis):
        cv3 = self._canvas(sphere_vis, "volume")
        z0 = cv3.camera_state()["zoom"]
        TestVis3DCanvas._event(cv3, "scroll_event", step=1)
        assert cv3.camera_state()["zoom"] > z0
        TestVis3DCanvas._event(cv3, "key_press_event", key="r")
        assert cv3.camera_state()["zoom"] == pytest.approx(z0)

    @staticmethod
    def _click_at(cv3, row, col):
        """Synthesize a press+release click at image data coords
        ``(row, col)`` through the real mpl event pipeline."""
        from matplotlib.backend_bases import MouseButton, MouseEvent
        cv3.canvas.draw()   # transforms need a rendered figure
        x, y = cv3.ax.transData.transform((col, row))
        for name in ("button_press_event", "button_release_event"):
            ev = MouseEvent(name, cv3.canvas, x, y,
                            button=MouseButton.LEFT)
            cv3.canvas.callbacks.process(name, ev)

    def test_click_picks_correct_blob(self, sphere_vis):
        """3D picking (round-4 VERDICT item 6): a synthesized click on
        a rendered blob's projection selects THAT blob."""
        from magellanmapper_tpu.ops import render3d
        view = np.asarray(render3d.camera_basis(-60.0, 30.0)[0])
        c = np.asarray([11.5, 11.5, 11.5])
        # two visible blobs, separated well past the 8 px pick radius
        b0 = c - view * 10.0 + np.asarray([0.0, 8.0, 0.0])
        b1 = c - view * 10.0 - np.asarray([0.0, 8.0, 0.0])
        sphere_vis.show_blobs(np.array(
            [list(b0) + [1.5], list(b1) + [1.5]]))
        cv3 = self._canvas(sphere_vis, "isosurface")
        pts = cv3.project_blobs()
        assert (pts[:, 2] > 0).all()
        self._click_at(cv3, pts[1, 0], pts[1, 1])
        assert cv3.selected_blob == 1
        self._click_at(cv3, pts[0, 0], pts[0, 1])
        assert cv3.selected_blob == 0
        # clicking empty background clears the selection
        far = (0.0, 0.0)
        if np.min((pts[:, 0] - far[0]) ** 2
                  + (pts[:, 1] - far[1]) ** 2) > 400:
            self._click_at(cv3, *far)
            assert cv3.selected_blob is None

    def test_pick_prefers_nearest_depth_and_skips_occluded(
            self, sphere_vis):
        from magellanmapper_tpu.ops import render3d
        view = np.asarray(render3d.camera_basis(-60.0, 30.0)[0])
        c = np.asarray([11.5, 11.5, 11.5])
        # same view ray: nearer (outside the surface) vs farther; plus
        # the sphere's center blob, hidden behind the isosurface
        near = c - view * 11.0
        mid = c - view * 9.5
        sphere_vis.show_blobs(np.array(
            [list(mid) + [2.0], list(near) + [2.0],
             list(c) + [2.0]]))
        cv3 = self._canvas(sphere_vis, "isosurface")
        pts = cv3.project_blobs()
        assert pts[2, 2] == 0.0            # center blob occluded
        picked = cv3.pick_blob(pts[1, 0], pts[1, 1])
        assert picked == 1                 # nearest-by-depth wins
        # clicking the occluded blob's pixel cannot select it
        sphere_vis.show_blobs(np.array([list(c) + [2.0]]))
        cv3b = self._canvas(sphere_vis, "isosurface")
        p = cv3b.project_blobs()
        assert cv3b.pick_blob(p[0, 0], p[0, 1]) is None

    def test_surface_actor_splats_with_occlusion(self, sphere_vis):
        """Mesh actors in the raycast scene: front-facing vertices splat
        (scatter points beyond the blob overlay), and a mesh fully
        inside the isosurface stays hidden."""
        from magellanmapper_tpu.cv import cv_nd
        from magellanmapper_tpu.ops import render3d
        vol = np.asarray(sphere_vis.roi)
        # small cube mesh OUTSIDE the sphere along the view direction
        view = np.asarray(render3d.camera_basis(-60.0, 30.0)[0])
        c = np.asarray([11.5, 11.5, 11.5]) - view * 10.0
        cube = np.zeros_like(vol)
        z, y, x = (int(v) for v in np.clip(c, 2, 20))
        cube[z-1:z+2, y-1:y+2, x-1:x+2] = 1.0
        sphere_vis.surfaces.append(cv_nd.surface_net_mesh(cube, 0.5))
        cv3 = self._canvas(sphere_vis, "isosurface")
        n_front = sum(len(col.get_offsets())
                      for col in cv3.ax.collections)
        assert n_front > 0
        # a mesh buried at the sphere's center is fully occluded
        sphere_vis.surfaces.clear()
        buried = np.zeros_like(vol)
        buried[10:13, 10:13, 10:13] = 1.0
        sphere_vis.surfaces.append(cv_nd.surface_net_mesh(buried, 0.5))
        cv3b = self._canvas(sphere_vis, "isosurface")
        n_hidden = sum(len(col.get_offsets())
                       for col in cv3b.ax.collections)
        assert n_hidden == 0

    def test_confirm_flow_persists_through_editor_db(
            self, sphere_vis, tmp_path):
        """Pick -> 'c' confirm cycle -> editor.save(db): the same DB
        path as the ROI editor (reference blob confirm flow)."""
        from magellanmapper_tpu.gui.roi_editor import ROIEditor
        from magellanmapper_tpu.io.sqlite import ClrDB
        from magellanmapper_tpu.ops import render3d
        view = np.asarray(render3d.camera_basis(-60.0, 30.0)[0])
        c = np.asarray([11.5, 11.5, 11.5])
        b0 = c - view * 10.0
        cv3 = self._canvas(sphere_vis, "isosurface")
        editor = ROIEditor(
            sphere_vis.roi, np.array([list(b0) + [1.5]]))
        cv3.attach_editor(editor)
        pts = cv3.project_blobs()
        self._click_at(cv3, pts[0, 0], pts[0, 1])
        assert cv3.selected_blob == 0
        assert int(editor.blobs[0, 4]) == -1
        TestVis3DCanvas._event(cv3, "key_press_event", key="c")
        assert int(editor.blobs[0, 4]) == 0
        TestVis3DCanvas._event(cv3, "key_press_event", key="c")
        assert int(editor.blobs[0, 4]) == 1
        db = ClrDB(str(tmp_path / "pick.db")).load_db()
        n = editor.save(db, experiment="pick3d")
        assert n == 1
        saved = db.select_blobs_confirmed(1)
        assert len(saved) == 1

    def test_blob_overlay_occlusion(self, sphere_vis):
        # center blob is hidden behind the isosurface; a blob in front
        # of the surface along the view ray is visible
        sphere_vis.show_blobs(np.array([[11.5, 11.5, 11.5, 2.0]]))
        cv3 = self._canvas(sphere_vis, "isosurface")
        from magellanmapper_tpu.ops import render3d
        view = np.asarray(render3d.camera_basis(
            cv3._azim, cv3._elev)[0])
        front = np.asarray([11.5, 11.5, 11.5]) - view * 11.0
        sphere_vis.show_blobs(np.vstack([
            [[11.5, 11.5, 11.5, 2.0]], [list(front) + [2.0]]]))
        depth = cv3._depth
        pts = render3d.render_blobs_overlay(
            depth, sphere_vis.blobs, (24, 24, 24), cv3._azim,
            cv3._elev, out_hw=(48, 48), zoom=cv3._zoom)
        assert pts[0, 2] == 0.0 and pts[1, 2] == 1.0
