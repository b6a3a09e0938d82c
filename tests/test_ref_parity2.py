"""Reference-parity surfaces, second wave: transformer/atlas_refiner/
segmenter/classifier/colocalizer, plot modules, stats, exports,
settings, cli helpers, sitk_io aliases, GUI widget logic."""

import numpy as np
import pandas as pd
import pytest


class TestTransformerRefiner:
    def test_modifiers_and_rotate(self):
        from magellanmapper_tpu.atlas import transformer as t
        assert t.make_modifier_plane("xz") == "planeXZ"
        assert t.make_modifier_scale(0.5) == "scale0pt5"
        assert t.make_modifier_resized((4, 5, 6)) == "resized(4,5,6)"
        img = np.zeros((6, 8, 8), np.float32)
        img[2, 3, 4] = 1
        r = t.rotate_img(
            img, {"rotation": [(90, 0)], "resize": False, "order": 1})
        assert r.shape == img.shape and r.sum() > 0.5
        d = t.Downsampler(np.random.rand(8, 10, 10).astype(np.float32))
        assert d.rescale(0.5).shape == (4, 5, 5)
        assert d.rescale(target_size=(5, 5, 4)).shape == (4, 5, 5)

    def test_refiner_helpers(self):
        from magellanmapper_tpu.atlas import atlas_refiner as ar
        orig = np.zeros((8, 8, 8), np.int32)
        orig[2:6, 2:6, 2:6] = 3
        new = np.ones((8, 8, 8), np.int32)
        ar.crop_to_orig(orig, new, 0)
        assert new[0, 0, 0] == 0 and new[3, 3, 3] == 1
        lost = ar.find_labels_lost(
            np.array([1, 2, 3]), np.array([3]), orig)
        np.testing.assert_array_equal(lost, [1, 2])
        assert set(np.unique(ar.make_labels_fg(orig))) == {0, 1}
        df = pd.DataFrame({
            "Filter_size": [1, 1], "Compaction": [0.2, 0.4],
            "Vol_orig": [10.0, 30.0]})
        agg = ar.aggr_smoothing_metrics(df)
        assert agg["Compaction"][0] == pytest.approx(0.35)
        out = ar.measure_atlas_refinement(
            {}, np.random.rand(8, 8, 8), orig)
        assert "DSC_atlas_labels" in out.columns


class TestSegmenterClassifier:
    def test_sub_segment_labels(self):
        from magellanmapper_tpu.cv import segmenter
        labels = np.zeros((8, 10, 10), np.int32)
        labels[2:7, 2:8, 2:8] = 4
        edge = np.zeros_like(labels)
        edge[:, :, 5] = 1
        out = segmenter.sub_segment_labels(labels, edge)
        ids = set(np.unique(out)) - {0}
        assert all(i // 100 == 4 for i in ids) and len(ids) >= 2
        markers, _ = segmenter.LabelToMarkerErosion(
            labels).erode_labels(2)
        assert (markers == 4).sum() > 0

    def test_classification_roi_and_patches(self):
        from magellanmapper_tpu.cv import blobs as bm
        from magellanmapper_tpu.cv import classifier as cl
        rng = np.random.default_rng(0)
        img5 = rng.random((1, 12, 40, 40)).astype(np.float32)
        blobs = bm.Blobs(np.array(
            [[2.0, 5, 5, 2], [6, 20, 20, 2], [11, 38, 38, 2]]
        )).format_blobs()
        roi, rel, border = cl.setup_classification_roi(
            img5, (2, 10, 10), (8, 20, 20), blobs, 8)
        assert len(rel) == 1
        np.testing.assert_allclose(rel[0, :3], [4, 14, 14])
        clf = cl.BlobClassifier(seed=0)
        pred, score = cl.classify_patches(
            clf, cl.extract_patches(img5[0], blobs))
        assert pred.shape == (3,)
        out = cl.ClassifyImage(clf, img5, blobs).classify_whole_image()
        assert set(np.unique(out[:, 4])) <= {0.0, 1.0}

    def test_coloc_match_db_roundtrip(self, tmp_path):
        from magellanmapper_tpu.cv import colocalizer as co
        from magellanmapper_tpu.io import sqlite as sq
        db = sq.load_db(str(tmp_path / "c.db"))
        b1 = np.array([[3.0, 4, 5, 2, -1, -1, 0], [8, 9, 10, 2, -1, -1, 0]])
        b2 = np.array([[3.0, 4, 6, 2, -1, -1, 1], [8, 9, 11, 2, -1, -1, 1]])
        matches = {(0, 1): co.BlobMatch(
            [(b1[0], b2[0], 1.0), (b1[1], b2[1], 1.0)])}
        co.insert_matches(db, matches)
        sel = co.select_matches(db, [0, 1])
        assert (0, 1) in sel and len(sel[(0, 1)]) == 2
        bb = sel[(0, 1)].get_blobs_all()
        np.testing.assert_allclose(sorted(bb[0][:, 2]), [5, 10])
        db.close()


class TestPlotSurfaces:
    def test_colormaps(self):
        from magellanmapper_tpu.plot import colormaps as cm
        assert cm.discrete_colormap(10, seed=3).shape == (10, 4)
        g = cm.discrete_colormap(
            9, mode=cm.DiscreteModes.GRID, prioritize_default=False)
        assert g.shape == (9, 4)
        cm.setup_cmaps()
        assert cm.get_cmap("green_black") is cm.CMAPS["green_black"]
        labels = np.array([[0, 1], [2, -2]])
        lc = cm.get_labels_discrete_colormap(labels)
        assert lc.colors[0][3] == 1.0
        assert cm.make_binary_cmap(
            ["black", "white"]).colors[1][:3] == (1.0, 1.0, 1.0)
        assert len(cm.get_borders_colormap(labels, labels, lc)) == 1

    def test_plot_support_geometry(self):
        from magellanmapper_tpu.plot import plot_support as ps
        img1 = np.array([[1.0, 0], [1, 1]])
        img2 = np.array([[1.0, 1], [0, 1]])
        a1, a2 = ps.alpha_blend_intersection(img1, img2, 0.3)
        assert a1[0, 0] == 0.3 and a2[0, 0] == 0.7 and a1[0, 1] == 0.0
        vol = np.random.rand(1, 4, 6, 8)
        assert ps.extract_planes(vol, 2)[0].shape == (6, 8)
        assert ps.extract_planes(vol, 3, "xz")[0].shape == (4, 8)
        assert ps.max_plane(vol[0], "yz") == 8
        aspect, origin = ps.get_aspect_ratio("xz", (2.0, 1, 1))
        assert aspect == 2.0 and origin == "lower"

        class Ev:
            step = 3
            key = None
        assert ps.scroll_plane(Ev(), 1, 10) == 4
        assert ps.scroll_plane(Ev(), 8, 10, max_scroll=1) == 9

    def test_plot_3d_volume_ops(self):
        from magellanmapper_tpu.plot import plot_3d as p3
        assert p3.roi_center_to_offset((10, 10, 10), (4, 4, 4)) \
            == (8, 8, 8)
        canvas = np.zeros((10, 10, 10))
        p3.replace_vol(canvas, np.ones((4, 4, 4)), center=(1, 5, 5))
        assert canvas[:3, 3:7, 3:7].sum() == 3 * 4 * 4
        padded = p3.pad_img(np.ones((2, 3, 3)), (1, 1, 0), (5, 6, None))
        assert padded.shape == (5, 6, 3) and padded.sum() == 18

    def test_deconvolve_sharpens(self):
        from scipy import ndimage
        from magellanmapper_tpu.plot import plot_3d as p3
        img = np.zeros((16, 16, 16), np.float32)
        img[8, 8, 8] = 1.0
        blurred = ndimage.uniform_filter(img, 5)
        dec = p3.deconvolve(blurred, iterations=20)
        assert dec[8, 8, 8] > blurred[8, 8, 8]


class TestStatsSurfaces:
    def test_vols_enums_and_overlap(self):
        from magellanmapper_tpu.io import df_io
        from magellanmapper_tpu.stats import vols
        assert vols.get_single_label([5, 6]) == 5
        assert vols.get_metric_weight_col("VarIntensity") == "Volume"
        a = np.zeros((6, 8, 8), np.int32)
        a[1:4, 1:4, 1:4] = 2
        b = np.array(a)
        b[1:4, 1:5, 1:5] = 2
        df = vols.measure_labels_overlap([a, b], grouping={"S": "x"})
        assert "VolDSC" in df.columns and (df["S"] == "x").all()
        m = pd.DataFrame({
            "VarIntensity": [0.5], "MeanIntensity": [2.0],
            "EdgeDistSum": [1.0], "VarNuclei": [0.2]})
        out = df_io.combine_cols(m, [vols.MetricCombos.COEFVAR_INTENS])
        assert out["CoefVarIntensity"][0] == pytest.approx(0.25)

    def test_clustering_and_improvement(self):
        from magellanmapper_tpu.stats import atlas_stats as ast
        from magellanmapper_tpu.stats import clustering as cl
        assert cl.cluster_dbscan_metrics(
            np.array([0, 0, 1, 1, 1, -1, -1])) == (2, 2, 3)
        df = pd.DataFrame({
            "Effect": [1.0, -2.0, 3.0, -0.5],
            "P": [0.01, 0.2, 0.04, 0.01],
            "Volume": [10.0, 20, 30, 40]})
        out = ast.meas_improvement(
            None, "Effect", "P", col_wt="Volume", df=df)
        assert out["n_impr_ss"][0] == 2 and out["Volume_impr"][0] == 40.0


class TestExportsAndSettings:
    def test_stack_plane_io(self):
        from magellanmapper_tpu.io import export_stack as es
        vol = np.random.rand(1, 6, 16, 16).astype(np.float32)
        labels = np.zeros((6, 16, 16), np.int32)
        labels[:, 4:8, 4:8] = 3
        io = es.setup_stack(
            vol, offset=(1, 2, 2), roi_size=(4, 10, 10), rescale=2.0,
            labels_imgs=[labels])
        stack = io.build_stack()
        assert len(stack) == 4
        assert stack[0][0].shape == (20, 20)
        assert set(np.unique(stack[0][1])) <= {0, 3}

    def test_roi_paths_roundtrip(self, tmp_path):
        from magellanmapper_tpu.io import export_rois as er
        base, img_p, blobs_p = er.make_roi_paths(
            str(tmp_path / "x"), 3, 0, make_dirs=True)
        np.save(img_p, np.zeros((2, 3, 3)))
        np.save(blobs_p, np.zeros((2, 4)))
        _, imgs, blobs = er.load_roi_files(None, str(tmp_path / "x"))
        assert len(imgs) == 1 and blobs[0].shape == (2, 5)

    def test_config_enums_and_helpers(self):
        import logging
        from magellanmapper_tpu.settings import (
            config, grid_search_prof as gs, logs, profiles)
        assert config.HemSides.BOTH.value == "both"
        assert "pip install x" in config.format_import_err("x")
        lg = logging.getLogger("parity2")
        logs.update_log_level(lg, "debug")
        assert lg.level == logging.DEBUG
        arr = gs.make_hyperparm_arr(0, 1, 3, 4, 2, base=5)
        assert arr.shape == (3, 4) and arr[1, 2] == 0.5
        assert issubclass(profiles.SettingsDict, profiles.Profile)

    def test_merge_split_stack_v1(self, rng):
        from magellanmapper_tpu.cv import chunking
        vol = rng.random((40, 50, 43)).astype(np.float32)
        slices, _ = chunking.stack_splitter(
            vol.shape, (20, 20, 20), np.array([3, 3, 3]))
        sub = np.zeros(slices.shape, dtype=object)
        for c in np.ndindex(*slices.shape):
            sub[c] = vol[slices[c]]
        merged = chunking.merge_split_stack(
            sub, (20, 20, 20), np.array([3, 3, 3]))
        np.testing.assert_array_equal(merged, vol)

    def test_aws_and_packaging(self):
        from magellanmapper_tpu.cloud import aws
        from magellanmapper_tpu.io import packaging
        assert aws.split_s3_path("s3://b/a/k.npy") == ("b", "a/k.npy")
        p, out = packaging.get_pkg_path("numpy", "/tmp/bundle")
        assert p.endswith("numpy") and out == "/tmp/bundle/numpy"


class TestCliRegisterSitk:
    def test_args_with_dict(self):
        from magellanmapper_tpu.io import cli
        out = cli.args_with_dict(["roi", "5", "size=3,4,5", "mode=f"])
        assert out[:2] == ["roi", 5]
        assert out[2] == {"size": [3, 4, 5], "mode": "f"}
        assert len(cli.setup_roi_profiles(["default", "lightsheet"])) == 2

    def test_register_surfaces(self):
        from magellanmapper_tpu.atlas import register as reg
        mask = np.zeros((10, 10, 10), bool)
        mask[2:6, 2:6, 2:6] = True
        props, bbox, cent = reg.get_scaled_regionprops(mask, (2.0,) * 3)
        assert bbox == (1, 1, 1, 3, 3, 3)
        assert np.allclose(cent, (1.75,) * 3)

    def test_sitk_io_aliases(self, tmp_path):
        from magellanmapper_tpu.io import sitk_io as si
        arr = np.random.rand(4, 6, 6).astype(np.float32)
        si.write_img(str(tmp_path / "a.mhd"), arr, (2, 1, 1))
        med = si.read_img(str(tmp_path / "a.mhd"))
        np.testing.assert_allclose(med.img, arr, rtol=1e-6)
        base = str(tmp_path / "brain.npy")
        si.write_registered_image(arr, base, "atlasVolume.mhd")
        loaded = si.load_registered_imgs(
            base, ["atlasVolume.mhd", "none.mhd"])
        assert list(loaded) == ["atlasVolume.mhd"]
        merged = si.merge_images([base], "atlasVolume.mhd")
        np.testing.assert_allclose(merged.img, arr, rtol=1e-6)
        pts = si.write_pts(str(tmp_path / "p.pts"), [(1, 2, 3)])
        assert open(pts).read().startswith("point\n1\n")


class TestGuiWidgets:
    def test_draggable_circle(self):
        from magellanmapper_tpu.gui import widgets
        updates = []
        seg = np.array([3.0, 10, 10, 3, -1, -1, 0])
        dc = widgets.DraggableCircle(
            seg, lambda n, o: updates.append((n.copy(), o.copy())))
        assert not dc.on_press(10, 20)
        assert dc.on_press(11, 11)
        dc.on_motion(13, 12)
        dc.on_release()
        assert dc.segment[1] == 12 and dc.segment[2] == 11
        assert dc.cycle_confirmed() == 0 and dc.color == "r"
        assert dc.resize(1.0) == 4.0

    def test_interpolate_planes(self):
        from magellanmapper_tpu.gui import widgets
        ip = widgets.InterpolatePlanes()
        labels = np.zeros((8, 10, 10), np.int32)
        labels[1, 4:7, 4:7] = 5
        labels[5, 4:7, 4:7] = 5
        ip.update_plane("xy", 1, 5)
        assert not ip.ready
        ip.update_plane("xy", 5, 5)
        assert ip.ready
        out = ip.interpolate(labels)
        assert (out[3] == 5).any()
        # switching labels resets the bookmark
        ip.update_plane("xy", 2, 9)
        assert not ip.ready

    def test_pixel_display_and_verifier(self):
        from magellanmapper_tpu.gui import verifier_editor, widgets
        pd_fmt = widgets.PixelDisplay([np.arange(100.0).reshape(10, 10)])
        s = pd_fmt(3, 4)
        assert "x=3" in s and "43" in s
        vol = np.random.rand(1, 6, 30, 30).astype(np.float32)
        blobs = np.zeros((10, 10))
        blobs[:, :4] = np.random.rand(10, 4) * 5 + 5
        blobs[:, 4] = -1
        ve = verifier_editor.VerifierEditor(vol, blobs, nrows=2, ncols=2)
        views = ve.build_page(0)
        assert len(views) == 4 and views[0].patch.shape == (24, 24)
        assert ve.n_pages == 3
        assert ve.flag_blob(0) == 0 and ve.blob_color(0) == "r"

    def test_threads_and_handler(self):
        from magellanmapper_tpu.atlas import ontology as o
        from magellanmapper_tpu.gui import threads, visualizer
        root = {o.ABA_ID: 1, o.ABA_NAME: "root", o.ABA_LEVEL: 0,
                o.ABA_CHILDREN: [{o.ABA_ID: 2, o.ABA_NAME: "ctx",
                                  o.ABA_LEVEL: 1, o.ABA_CHILDREN: []}]}
        ref = o.LabelsRef()
        ref.loaded_ref = root
        ref.create_ref_lookup()
        labels = np.zeros((4, 4, 4), int)
        labels[1:] = 2
        out = threads.RemapLevelThread(labels, ref, 0).start().result()
        assert (out[1:] == 1).all()
        ann = threads.AnnotateLabels(labels, ref, [2]).start().result()
        assert ann[2] == "ctx (R)"
        vis = visualizer.Visualization()
        h = visualizer.VisHandler(vis)
        h.mark_stale(visualizer.StaleFlags.IMAGE)
        assert h.is_stale(
            visualizer.ViewerTabs.ROI_ED, visualizer.StaleFlags.IMAGE)
        h.refresh(visualizer.ViewerTabs.ROI_ED)
        assert not h.is_stale(
            visualizer.ViewerTabs.ROI_ED, visualizer.StaleFlags.IMAGE)
