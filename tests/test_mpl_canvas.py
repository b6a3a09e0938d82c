"""Interactive editor canvas tests with synthesized Matplotlib events.

Drives the Agg-backed canvases the way a user would (reference
interactions: ``magmap/gui/roi_editor.py:39`` DraggableCircle,
``plot_editor.py:76`` paint/pan/zoom, ``atlas_editor.py:475`` plane
interpolation) — click-drag-confirm cycles asserted against controller
state and DB writes.
"""

import numpy as np
import pytest

from magellanmapper_tpu.gui.atlas_editor import AtlasEditor
from magellanmapper_tpu.gui.mpl_canvas import (
    DraggableCircle, PlotEditorCanvas, ROIEditorCanvas)
from magellanmapper_tpu.gui.roi_editor import ROIEditor


def mouse_event(name, canvas, ax, xdata, ydata, button=1, key=None,
                step=0):
    """Synthesize a MouseEvent at data coordinates."""
    from matplotlib.backend_bases import MouseEvent
    x, y = ax.transData.transform((xdata, ydata))
    ev = MouseEvent(name, canvas, x, y, button=button, key=key, step=step)
    return ev


def fire(canvas, ev):
    canvas.callbacks.process(ev.name, ev)


def fire_pick(canvas, artist, mouseevent):
    from matplotlib.backend_bases import PickEvent
    ev = PickEvent("pick_event", canvas, mouseevent, artist)
    canvas.callbacks.process("pick_event", ev)


@pytest.fixture
def roi_canvas():
    rng = np.random.default_rng(0)
    roi = rng.random((8, 40, 40)).astype(np.float32) * 0.2
    blobs = np.zeros((2, 10))
    blobs[0, :4] = (4, 10, 10, 3)
    blobs[1, :4] = (4, 25, 30, 3)
    blobs[:, 4] = -1
    ed = ROIEditor(roi, blobs)
    cv = ROIEditorCanvas(ed, z=4)
    return ed, cv


class TestROIEditorCanvas:
    def test_circles_built_for_plane(self, roi_canvas):
        ed, cv = roi_canvas
        assert len(cv.circles) == 2

    def test_ctrl_click_adds_blob(self, roi_canvas):
        ed, cv = roi_canvas
        ev = mouse_event("button_press_event", cv.canvas, cv.ax,
                         20.0, 15.0, key="control")
        fire(cv.canvas, ev)
        assert len(ed.blobs) == 3
        np.testing.assert_allclose(ed.blobs[-1, :3], (4, 15, 20))
        assert ed.blobs[-1, 4] == 1  # manual adds are confirmed
        assert len(cv.circles) == 3

    def test_shift_drag_moves_blob(self, roi_canvas):
        ed, cv = roi_canvas
        dc = cv.circles[0]
        press = mouse_event("button_press_event", cv.canvas, cv.ax,
                            10.0, 10.0, key="shift")
        fire(cv.canvas, press)
        assert dc._press is not None
        move = mouse_event("motion_notify_event", cv.canvas, cv.ax,
                           14.0, 12.0, key="shift")
        fire(cv.canvas, move)
        rel = mouse_event("button_release_event", cv.canvas, cv.ax,
                          14.0, 12.0, key="shift")
        fire(cv.canvas, rel)
        # blob (z,y,x) moved by (0, +2, +4)
        np.testing.assert_allclose(ed.blobs[0, :3], (4, 12, 14), atol=0.2)

    def test_alt_drag_resizes(self, roi_canvas):
        ed, cv = roi_canvas
        press = mouse_event("button_press_event", cv.canvas, cv.ax,
                            10.0, 10.0, key="alt")
        fire(cv.canvas, press)
        move = mouse_event("motion_notify_event", cv.canvas, cv.ax,
                           16.0, 10.0, key="alt")
        fire(cv.canvas, move)
        rel = mouse_event("button_release_event", cv.canvas, cv.ax,
                          16.0, 10.0, key="alt")
        fire(cv.canvas, rel)
        assert ed.blobs[0, 3] == pytest.approx(6.0, abs=0.3)

    def test_pick_cycles_confirmed_flag(self, roi_canvas):
        ed, cv = roi_canvas
        dc = cv.circles[0]
        ev = mouse_event("button_press_event", cv.canvas, cv.ax,
                         10.0, 10.0)
        fire_pick(cv.canvas, dc.circle, ev)
        assert ed.blobs[0, 4] == 0     # -1 -> 0 (incorrect, red)
        fire_pick(cv.canvas, dc.circle, ev)
        assert ed.blobs[0, 4] == 1     # 0 -> 1 (correct, green)
        rev = mouse_event("button_press_event", cv.canvas, cv.ax,
                          10.0, 10.0, key="r")
        fire_pick(cv.canvas, dc.circle, rev)
        assert ed.blobs[0, 4] == 0     # reverse cycle

    def test_d_pick_deletes(self, roi_canvas):
        ed, cv = roi_canvas
        dc = cv.circles[0]
        ev = mouse_event("button_press_event", cv.canvas, cv.ax,
                         10.0, 10.0, key="d")
        fire_pick(cv.canvas, dc.circle, ev)
        assert len(ed.blobs) == 1
        assert cv.picked and cv.picked[0][1] == DraggableCircle.CUT

    def test_scroll_changes_plane(self, roi_canvas):
        ed, cv = roi_canvas
        ev = mouse_event("scroll_event", cv.canvas, cv.ax, 20, 20, step=1)
        fire(cv.canvas, ev)
        assert cv.z == 5

    def test_click_confirm_save_writes_db(self, roi_canvas, tmp_path):
        from magellanmapper_tpu.io.sqlite import ClrDB
        ed, cv = roi_canvas
        # confirm both blobs via pick clicks (cycle -1 -> 0 -> 1)
        for dc in list(cv.circles.values()):
            ev = mouse_event("button_press_event", cv.canvas, cv.ax,
                             *dc.circle.center)
            fire_pick(cv.canvas, dc.circle, ev)
            fire_pick(cv.canvas, dc.circle, ev)
        db = ClrDB(str(tmp_path / "test.db")).load_db()
        n = cv.save_to_db(db, "exp1")
        assert n == 2
        blobs = db.select_blobs_confirmed(1)
        assert len(blobs) == 2


@pytest.fixture
def plot_canvas():
    rng = np.random.default_rng(1)
    img = rng.random((12, 32, 32)).astype(np.float32)
    labels = np.zeros((12, 32, 32), np.int32)
    labels[:, 8:20, 8:20] = 5
    ae = AtlasEditor(img, labels)
    pe = ae.make_plot_editor("xy")
    pe.brush_radius = 2.0
    return ae, pe, PlotEditorCanvas(pe)


class TestPlotEditorCanvas:
    def test_ctrl_click_picks_label(self, plot_canvas):
        ae, pe, cv = plot_canvas
        ev = mouse_event("button_press_event", cv.canvas, cv.ax,
                         10.0, 10.0, key="control")
        fire(cv.canvas, ev)
        assert pe.paint_label_id == 5

    def test_drag_paints_label(self, plot_canvas):
        ae, pe, cv = plot_canvas
        pe.paint_label_id = 5
        z = ae.position[0]
        press = mouse_event("button_press_event", cv.canvas, cv.ax,
                            26.0, 26.0)
        fire(cv.canvas, press)
        for x in (27.0, 28.0):
            fire(cv.canvas, mouse_event(
                "motion_notify_event", cv.canvas, cv.ax, x, 26.0))
        fire(cv.canvas, mouse_event(
            "button_release_event", cv.canvas, cv.ax, 28.0, 26.0))
        painted = ae.labels_img[z, 25:28, 25:30]
        assert (painted == 5).any()
        assert ae.edited

    def test_alt_drag_erases(self, plot_canvas):
        ae, pe, cv = plot_canvas
        z = ae.position[0]
        assert ae.labels_img[z, 10, 10] == 5
        fire(cv.canvas, mouse_event(
            "button_press_event", cv.canvas, cv.ax, 10.0, 10.0, key="alt"))
        fire(cv.canvas, mouse_event(
            "button_release_event", cv.canvas, cv.ax, 10.0, 10.0,
            key="alt"))
        assert ae.labels_img[z, 10, 10] == 0

    def test_scroll_steps_plane_and_ctrl_zooms(self, plot_canvas):
        ae, pe, cv = plot_canvas
        z0 = pe.index
        fire(cv.canvas, mouse_event(
            "scroll_event", cv.canvas, cv.ax, 16, 16, step=1))
        assert pe.index == z0 + 1
        view0 = list(pe.view)
        fire(cv.canvas, mouse_event(
            "scroll_event", cv.canvas, cv.ax, 16, 16, step=1,
            key="control"))
        assert pe.view[2] < view0[2]  # zoomed in

    def test_arrow_pan_and_window_keys(self, plot_canvas):
        from matplotlib.backend_bases import KeyEvent
        ae, pe, cv = plot_canvas
        pe.zoom(2.0)
        y0 = pe.view[0]
        cv.canvas.callbacks.process(
            "key_press_event", KeyEvent("key_press_event", cv.canvas,
                                        "down"))
        assert pe.view[0] == y0 + 5
        cv.canvas.callbacks.process(
            "key_press_event", KeyEvent("key_press_event", cv.canvas, "]"))
        assert pe.vmin is not None and pe.vmax is not None

    def test_paint_two_planes_interpolates_between(self, plot_canvas):
        """The reference's two-click plane interpolation: edit a label on
        two planes, press 'i' to fill the gap (atlas_editor.py:475)."""
        from matplotlib.backend_bases import KeyEvent
        ae, pe, cv = plot_canvas
        pe.paint_label_id = 5
        pe.brush_radius = 3.0
        # paint on plane 2 then plane 6, then interpolate
        ae.set_position(0, 2)
        fire(cv.canvas, mouse_event(
            "button_press_event", cv.canvas, cv.ax, 26.0, 26.0))
        fire(cv.canvas, mouse_event(
            "button_release_event", cv.canvas, cv.ax, 26.0, 26.0))
        ae.set_position(0, 6)
        fire(cv.canvas, mouse_event(
            "button_press_event", cv.canvas, cv.ax, 26.0, 26.0))
        fire(cv.canvas, mouse_event(
            "button_release_event", cv.canvas, cv.ax, 26.0, 26.0))
        # two-click: navigate back to the first edited plane, press 'i'
        ae.set_position(0, 2)
        cv.canvas.callbacks.process(
            "key_press_event", KeyEvent("key_press_event", cv.canvas, "i"))
        # a plane strictly between the two edits now carries the label
        assert (ae.labels_img[4, 23:30, 23:30] == 5).any()


class TestAtlasEditorCanvases:
    def test_synced_views(self):
        from magellanmapper_tpu.gui.mpl_canvas import AtlasEditorCanvases
        rng = np.random.default_rng(2)
        img = rng.random((10, 20, 20)).astype(np.float32)
        labels = np.zeros((10, 20, 20), np.int32)
        labels[:, 5:15, 5:15] = 3
        ae = AtlasEditor(img, labels)
        views = AtlasEditorCanvases(ae)
        assert set(views.canvases) == {"xy", "xz", "yz"}
        # crosshair sync: one call moves every axis position
        views.update_coords((3, 7, 9))
        assert ae.position == [3, 7, 9]
        # alpha + window sync fan out to all plot editors
        views.update_alpha(0.8)
        assert all(pe.alpha == 0.8 for pe in views.sync.plot_eds.values())
        views.update_intensity(0.1, 0.9)
        assert all(pe.vmax == 0.9 for pe in views.sync.plot_eds.values())
        # a scroll in one view moves the shared plane state
        cv = views.canvases["xy"]
        z0 = ae.position[0]
        fire(cv.canvas, mouse_event(
            "scroll_event", cv.canvas, cv.ax, 10, 10, step=1))
        assert ae.position[0] == z0 + 1


class TestImageOverlayer:
    def test_overlayer_draws_blend(self):
        import matplotlib.figure
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from magellanmapper_tpu.plot.plot_support import ImageOverlayer
        fig = matplotlib.figure.Figure()
        FigureCanvasAgg(fig)
        ax = fig.add_subplot(111)
        rng = np.random.default_rng(3)
        plane = rng.random((16, 16, 2)).astype(np.float32)
        labels = np.zeros((16, 16), np.int32)
        labels[4:8, 4:8] = 2
        ov = ImageOverlayer(ax)
        rgb = ov.overlay_images([plane, labels])
        assert rgb.shape == (16, 16, 3)
        assert len(ax.images) == 1


class TestTkApp:
    def test_headless_gate_message(self, monkeypatch):
        from magellanmapper_tpu.gui import app as app_mod
        monkeypatch.delenv("DISPLAY", raising=False)
        app = app_mod.MagellanTkApp(vis=None)
        with pytest.raises(RuntimeError, match="DISPLAY"):
            app.run()

    def test_actions_without_window(self):
        """The app's actions work against the controllers with no Tk
        root (the window only hosts them)."""
        from magellanmapper_tpu.gui import app as app_mod
        from magellanmapper_tpu.gui.mpl_canvas import ROIEditorCanvas

        class VisStub:
            blobs = None
            db = None
            roi_offset = (0, 0, 0)

            def get_roi(self):
                return np.zeros((6, 20, 20), np.float32)

            def detect_blobs(self):
                out = np.zeros((1, 10))
                out[0, :4] = (3, 10, 10, 2)
                return out

        app = app_mod.MagellanTkApp(VisStub())
        app.roi_canvas = ROIEditorCanvas(
            ROIEditor(VisStub().get_roi()), z=3)
        blobs = app.detect()
        assert blobs is not None and len(app.roi_canvas.circles) == 1
        app.set_plane(99)
        assert app.roi_canvas.z == 5


class TestVerifierCanvas:
    def _editor(self):
        from magellanmapper_tpu.gui.verifier_editor import VerifierEditor
        rng = np.random.default_rng(4)
        vol = rng.random((6, 48, 48)).astype(np.float32)
        blobs = np.zeros((12, 10))
        blobs[:, 0] = rng.integers(0, 6, 12)
        blobs[:, 1] = rng.integers(8, 40, 12)
        blobs[:, 2] = rng.integers(8, 40, 12)
        blobs[:, 3] = 3
        blobs[:, 4] = -1
        return VerifierEditor(vol, blobs, nrows=2, ncols=2)

    def test_click_cell_cycles_flag(self):
        from matplotlib.backend_bases import MouseEvent
        from magellanmapper_tpu.gui.mpl_canvas import VerifierCanvas
        ed = self._editor()
        cv = VerifierCanvas(ed)
        assert len(cv.axes_views) == 4
        ax, view = next(iter(cv.axes_views.items()))
        x, y = ax.transData.transform((5, 5))
        cv.canvas.callbacks.process(
            "button_press_event",
            MouseEvent("button_press_event", cv.canvas, x, y, button=1))
        assert ed._blob_arr[view.index][4] == 0  # -1 -> 0

    def test_arrow_keys_page(self):
        from matplotlib.backend_bases import KeyEvent
        from magellanmapper_tpu.gui.mpl_canvas import VerifierCanvas
        ed = self._editor()
        cv = VerifierCanvas(ed)
        cv.canvas.callbacks.process(
            "key_press_event",
            KeyEvent("key_press_event", cv.canvas, "right"))
        assert ed.page == 1
        assert next(iter(cv.axes_views.values())).index == 4
        cv.canvas.callbacks.process(
            "key_press_event",
            KeyEvent("key_press_event", cv.canvas, "left"))
        assert ed.page == 0
