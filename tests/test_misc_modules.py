"""Tests: pipelines, clrstats, subproc_io, reg_tasks, brain_globe,
roi_review."""

import os

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.atlas import reg_tasks
from magellanmapper_tpu.io import np_io, pipelines, sqlite, subproc_io
from magellanmapper_tpu.gui import roi_review
from magellanmapper_tpu.stats import clrstats
from magellanmapper_tpu import brain_globe


class TestPipelines:
    def test_detection_pipeline_with_resume(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = np.zeros((16, 32, 32), np.float32)
        zz, yy, xx = np.indices(vol.shape).astype(np.float32)
        for c in rng.uniform(6, 26, (6, 3)):
            vol += np.exp(-(((zz-c[0])**2 + (yy-c[1])**2 + (xx-c[2])**2)
                            / 8.0))
        base = str(tmp_path / "vol.npy")
        np_io.write_npy(base, vol[None] / vol.max())
        from magellanmapper_tpu.settings.roi_prof import ROIProfile
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["denoise_size"] = None
        out = pipelines.run_pipeline("detection", base, prof)
        assert "detection" in out
        assert os.path.exists(out["detection"])
        # resume: stage skipped when artifact exists
        out2 = pipelines.run_pipeline("detection", base, prof)
        assert "detection" not in out2

    def test_unknown_pipeline(self):
        with pytest.raises(ValueError):
            pipelines.run_pipeline("bogus", "x.npy")


class TestClrStats:
    def test_group_stats_and_fdr(self):
        rng = np.random.default_rng(0)
        rows = []
        for region in (1, 2, 3):
            for cond in ("wt", "ko"):
                for s in range(6):
                    base = 10.0 if region != 2 else (
                        10.0 if cond == "wt" else 20.0)
                    rows.append({
                        "Region": region, "Condition": cond,
                        "Volume": base + rng.normal(0, 0.5)})
        df = pd.DataFrame(rows)
        stats = clrstats.meas_group_stats(
            df, "Volume", conds=("wt", "ko"))
        assert len(stats) == 3
        sig = stats[stats.Region == 2].iloc[0]
        insig = stats[stats.Region == 1].iloc[0]
        assert sig["Padj"] < 0.01
        assert insig["Padj"] > 0.05
        assert sig["Effect"] == pytest.approx(1.0, abs=0.2)

    def test_volcano_plot(self, tmp_path):
        df = pd.DataFrame({
            "Region": [1, 2], "Effect": [0.1, 1.5],
            "P": [0.5, 0.001], "Padj": [0.6, 0.004]})
        path = str(tmp_path / "volcano.png")
        clrstats.plot_volcano(df, path)
        assert os.path.exists(path)


class TestSubprocIO:
    def test_zip_roundtrip(self, tmp_path):
        p = tmp_path / "data.bin"
        p.write_bytes(os.urandom(1000))
        arc = subproc_io.compress_file(str(p), fmt="zip")
        out_dir = tmp_path / "out"
        out_dir.mkdir()
        subproc_io.decompress_file(arc, str(out_dir))
        assert (out_dir / "data.bin").read_bytes() == p.read_bytes()

    def test_gz_roundtrip(self, tmp_path):
        p = tmp_path / "d.txt"
        p.write_text("hello" * 100)
        arc = subproc_io.compress_file(str(p), fmt="gz")
        out = subproc_io.decompress_file(arc, str(tmp_path / "o"))
        os.path.exists(out)


class TestRegTasks:
    def test_labels_diff_image(self):
        labels = np.zeros((4, 4, 4), np.int32)
        labels[:2] = 1
        labels[2:] = 2
        df = pd.DataFrame({
            "Region": [1, 2, 1, 2],
            "Condition": ["a", "a", "b", "b"],
            "Volume": [10.0, 20.0, 15.0, 18.0]})
        diff = reg_tasks.build_labels_diff_images(
            labels, df, "Volume", conds=("a", "b"))
        assert diff[0, 0, 0] == pytest.approx(5.0)
        assert diff[3, 0, 0] == pytest.approx(-2.0)


class TestBrainGlobe:
    def test_cached_atlas_loading(self, tmp_path):
        from magellanmapper_tpu.io import tiff
        import json
        atlas_dir = tmp_path / "allen_mouse_25um_v1.2"
        atlas_dir.mkdir()
        ref = np.random.default_rng(0).integers(
            0, 255, (4, 8, 8)).astype(np.uint16)
        ann = np.ones((4, 8, 8), np.uint16)
        tiff.write_tiff(str(atlas_dir / "reference.tiff"), ref)
        tiff.write_tiff(str(atlas_dir / "annotation.tiff"), ann)
        (atlas_dir / "metadata.json").write_text(
            json.dumps({"resolution": [25, 25, 25]}))
        bg = brain_globe.BrainGlobeMM(str(tmp_path))
        assert "allen_mouse_25um_v1.2" in bg.get_avail_atlases()
        img5d, labels, meta = bg.get_atlas("allen_mouse")
        assert img5d.img.shape == (1, 4, 8, 8)
        np.testing.assert_allclose(img5d.resolutions[0], [25, 25, 25])

    def test_missing_atlas(self, tmp_path):
        bg = brain_globe.BrainGlobeMM(str(tmp_path))
        with pytest.raises(FileNotFoundError):
            bg.get_atlas("nonexistent")


class TestRoiReview:
    def test_plane_grid_with_blobs(self, tmp_path, rng):
        roi = rng.random((6, 24, 24)).astype(np.float32)
        blobs = np.array([
            [2.0, 12, 12, 3, 1, -1, 0, 2, 12, 12],
            [4.0, 6, 18, 2, 0, -1, 0, 4, 6, 18]])
        path = str(tmp_path / "roi.png")
        roi_review.plot_roi_planes(roi, blobs, path)
        assert os.path.exists(path)

    def test_confirm_blobs_roundtrip(self, tmp_path):
        db = sqlite.load_db(str(tmp_path / "r.db"))
        exp = db.select_or_insert_experiment("e")
        roi_id, _ = db.select_or_insert_roi(exp, 0, (0, 0, 0), (9, 9, 9))
        db.insert_blobs(roi_id, np.array([
            [1.0, 2, 3, 2, -1, -1, 0], [4.0, 5, 6, 2, -1, -1, 0]]))
        blobs = roi_review.confirm_blobs(db, roi_id, [0], flag=1)
        back = db.select_blobs_by_roi(roi_id)
        assert (back[:, 4] == 1).sum() == 1
        db.close()


class TestVisualizationController:
    def test_full_session_workflow(self, tmp_path, rng):
        import os as _os
        _os.chdir(tmp_path)
        from magellanmapper_tpu.gui.visualizer import Visualization
        from magellanmapper_tpu.io import np_io as np_io_mod

        # volume with one obvious nucleus inside the ROI
        vol = rng.normal(0.05, 0.01, (16, 64, 64)).astype(np.float32)
        zz, yy, xx = np.indices((16, 64, 64)).astype(np.float32)
        vol += np.exp(-((zz-8)**2 + (yy-32)**2 + (xx-32)**2) / 8.0)
        base = str(tmp_path / "sess.npy")
        np_io_mod.write_npy(base, vol[None])

        vis = Visualization()
        vis.load_image(base)
        vis.roi_offset = (16, 16, 2)   # x,y,z
        vis.roi_size = (32, 32, 12)
        vis.roi_profile["min_sigma_factor"] = 2.0
        vis.roi_profile["max_sigma_factor"] = 4.0
        vis.roi_profile["num_sigma"] = 5
        blobs = vis.detect_blobs()
        assert blobs is not None and len(blobs) >= 1
        vis.confirm_blob(0, 1)
        vis.open_db(str(tmp_path / "sess.db"))
        n = vis.save_blobs("sess")
        assert n == len(blobs)
        vis.show_roi(str(tmp_path / "roi.png"))
        vis.show_3d(str(tmp_path / "b3d.png"))
        assert _os.path.exists(str(tmp_path / "roi.png"))
        # TPU render styles through the session controller (reference
        # Vis3D style picker)
        for style in ("volume", "mip", "isosurface"):
            out = vis.show_3d(str(tmp_path / f"r3d_{style}.png"),
                              style=style)
            assert _os.path.exists(out) and _os.path.getsize(out) > 0
        vis.db.close()


def test_all_modules_import():
    """Every Python module in the package imports cleanly (the compiled
    ctypes library is loaded via ctypes, not as an extension module)."""
    import importlib
    import pkgutil

    import magellanmapper_tpu

    failures = []
    for mod in pkgutil.walk_packages(
            magellanmapper_tpu.__path__, "magellanmapper_tpu."):
        if ".native.lib" in mod.name or mod.name.endswith("libblockio"):
            continue
        try:
            importlib.import_module(mod.name)
        except Exception as exc:   # pragma: no cover - report below
            failures.append((mod.name, repr(exc)))
    assert not failures, failures


def test_pipeline_mesospim_stitching(tmp_path):
    """The stitching pipeline ingests mesoSPIM RAW tiles when asked
    (mesospim flag converts tiles before stitching)."""
    from magellanmapper_tpu.settings.roi_prof import ROIProfile
    rng = np.random.default_rng(0)
    from scipy import ndimage
    scene = (ndimage.gaussian_filter(
        rng.random((4, 60, 60)).astype(np.float32), 2) * 1000).astype(
        np.uint16)
    tiles_dir = tmp_path / "tiles"
    tiles_dir.mkdir()
    parts = {"X0Y0": scene[:, :36, :36], "X1Y0": scene[:, :36, 24:],
             "X0Y1": scene[:, 24:, :36], "X1Y1": scene[:, 24:, 24:]}
    for key, arr in parts.items():
        p = tiles_dir / f"488_{key}.raw"
        np.ascontiguousarray(arr).tofile(p)
        (tiles_dir / f"488_{key}.raw_meta.txt").write_text(
            f"[z_planes] {arr.shape[0]}\n[y_pixels] {arr.shape[1]}\n"
            f"[x_pixels] {arr.shape[2]}\n[z_stepsize] 5.0\n"
            "[Pixelsize in um] 2.6\n[Zoom] 1x\n")
    out = pipelines.run_pipeline(
        "stitching", str(tmp_path / "scene.npy"), ROIProfile(),
        tile_grid={"dir": str(tiles_dir), "rows": 2, "cols": 2,
                   "overlap": 0.33, "mesospim": True})
    assert "stitching" in out
    fused = np_io.read_file(out["stitching"])
    assert fused.img[0].shape[0] >= 4


class TestVisualizerTabWorkflows:
    """Round-2: the session controller covers the app's remaining tabs."""

    def test_profile_picker_and_adjustment(self):
        from magellanmapper_tpu.gui.visualizer import Visualization
        vis = Visualization()
        prof = vis.set_roi_profile("lightsheet,4xnuc")
        assert "lightsheet" in prof["settings_name"]
        adj = vis.adjust_image(vmin=0.1, vmax=0.9, alpha=0.5)
        assert adj == {"vmin": 0.1, "vmax": 0.9, "alpha": 0.5}

    def test_import_tab_flow(self, tmp_path):
        from magellanmapper_tpu.gui.visualizer import Visualization
        from magellanmapper_tpu.io import tiff
        arr = (np.random.default_rng(0).random((3, 16, 16)) * 100
               ).astype(np.uint16)
        p = str(tmp_path / "imp.tif")
        tiff.write_tiff(p, arr)
        vis = Visualization()
        img5d = vis.import_file(p, prefix=str(tmp_path / "out"))
        assert img5d.img.shape == (1, 3, 16, 16)
        assert vis.img5d is img5d

    def test_atlas_editor_tab(self):
        from magellanmapper_tpu.gui.visualizer import Visualization
        from magellanmapper_tpu.io.np_io import Image5d
        vis = Visualization()
        rng = np.random.default_rng(1)
        vol = rng.random((1, 8, 16, 16)).astype(np.float32)
        vis.img5d = Image5d(img=vol)
        vis.labels_img = np.zeros((8, 16, 16), np.int32)
        views = vis.open_atlas_editor()
        assert set(views.canvases) == {"xy", "xz", "yz"}

    def test_brain_globe_tab(self, tmp_path):
        from magellanmapper_tpu.gui.visualizer import Visualization
        vis = Visualization()
        with pytest.raises(FileNotFoundError):
            vis.open_brain_globe("nope_atlas", cache_dir=str(tmp_path))


class TestClrstatsModels:
    """Regression models of the reference kModel family
    (clrstats/R/clrstats.R:92 fitModel: logit / gee / linregr)."""

    @staticmethod
    def _frame(seed=0, n_samples=16, sep=3.0):
        rng = np.random.default_rng(seed)
        rows = []
        for s in range(n_samples):
            cond = "wt" if s < n_samples // 2 else "ko"
            for side in ("L", "R"):
                # region 1 separates the conditions; region 2 is null
                rows.append({"Sample": s, "Condition": cond,
                             "Side": side, "Region": 1,
                             "Volume": rng.normal(
                                 sep if cond == "ko" else 0.0, 1.0)})
                rows.append({"Sample": s, "Condition": cond,
                             "Side": side, "Region": 2,
                             "Volume": rng.normal(0.0, 1.0)})
        import pandas as pd
        return pd.DataFrame(rows)

    @pytest.mark.parametrize("model", ["logit", "gee", "linregr"])
    def test_separating_region_significant_null_region_not(self, model):
        # moderate separation: near-perfect separation degenerates the
        # logit Wald test (Hauck-Donner), as it would in R glm
        df = self._frame(n_samples=24, sep=1.2)
        out = clrstats.meas_group_stats(
            df, "Volume", conds=("wt", "ko"), model=model)
        out = out.set_index("Region")
        assert out.loc[1, "P"] < 0.05
        assert out.loc[2, "P"] > 0.05
        # effect direction: higher volume -> ko (positive coefficient)
        assert out.loc[1, "Effect"] > 0

    def test_gee_clusters_widen_errors(self):
        """Duplicating each sample's rows must NOT shrink GEE p-values
        the way it shrinks independence-logit p-values (the clustered
        sandwich sees the duplicates as correlated)."""
        df = self._frame(seed=1, n_samples=12, sep=0.8)
        import pandas as pd
        df_dup = pd.concat([df, df], ignore_index=True)
        p_logit = clrstats.meas_group_stats(
            df_dup, "Volume", conds=("wt", "ko"),
            model="logit").set_index("Region").loc[1, "P"]
        p_gee = clrstats.meas_group_stats(
            df_dup, "Volume", conds=("wt", "ko"),
            model="gee").set_index("Region").loc[1, "P"]
        assert p_gee > p_logit

    def test_logit_matches_closed_form_balance(self):
        """With a symmetric predictor the logit slope must match the
        sign/magnitude expected from the group separation; cross-check
        the IRLS fit against scipy's logistic fit on the same design."""
        rng = np.random.default_rng(4)
        x = np.concatenate([rng.normal(0, 1, 200), rng.normal(2, 1, 200)])
        y = np.concatenate([np.zeros(200), np.ones(200)])
        X = np.column_stack([np.ones_like(x), x])
        beta, cov = clrstats._fit_logit_irls(X, y)
        # gradient at the optimum must vanish (IRLS converged)
        mu = 1 / (1 + np.exp(-(X @ beta)))
        grad = X.T @ (y - mu)
        assert np.max(np.abs(grad)) < 1e-5
        assert 1.0 < beta[1] < 3.5


class TestClrstatsKModelFamily:
    """The remaining reference kModel entries (clrstats/R/clrstats.R:21):
    logit.ord, paired ttest/wilcoxon, fligner, shapiro, basic, diff.mean,
    plus the gaussian-family GEE for continuous measures — each on
    synthetic data with a known effect."""

    @staticmethod
    def _paired_frame(seed=0, n_samples=10, shift=1.0, sample_sd=5.0):
        """Large between-sample variance + consistent within-sample
        shift: only a PAIRED test can see the effect."""
        rng = np.random.default_rng(seed)
        rows = []
        for s in range(n_samples):
            base = rng.normal(0.0, sample_sd)
            for region, sh in ((1, shift), (2, 0.0)):
                rows.append({"Sample": s, "Condition": "pre",
                             "Region": region,
                             "Volume": base + rng.normal(0, 0.2)})
                rows.append({"Sample": s, "Condition": "post",
                             "Region": region,
                             "Volume": base + sh + rng.normal(0, 0.2)})
        return pd.DataFrame(rows)

    def test_all_kmodel_names_dispatch(self):
        """Every reference kModel name must run end-to-end."""
        assert len(clrstats.KMODEL) == 12
        df = self._paired_frame(n_samples=12)
        # logit.ord wants >=2 ordered levels; paired frame has 2
        for model in clrstats.KMODEL:
            out = clrstats.meas_group_stats(
                df, "Volume", conds=("post", "pre"), model=model)
            assert len(out) >= 1, model
            assert "P" in out.columns and "Effect" in out.columns, model

    @pytest.mark.parametrize(
        "model", ["ttest.paired", "wilcoxon.paired"])
    def test_paired_tests_see_within_sample_shift(self, model):
        df = self._paired_frame(shift=1.0, sample_sd=5.0)
        out = clrstats.meas_group_stats(
            df, "Volume", conds=("pre", "post"), model=model
        ).set_index("Region")
        assert out.loc[1, "P"] < 0.01
        assert out.loc[2, "P"] > 0.05
        assert out.loc[1, "EffectRaw"] == pytest.approx(1.0, abs=0.3)
        # the unpaired test must MISS the effect (sample variance 5x)
        unpaired = "ttest" if model == "ttest.paired" else "wilcoxon"
        p_unpaired = clrstats.meas_group_stats(
            df, "Volume", conds=("pre", "post"), model=unpaired
        ).set_index("Region").loc[1, "P"]
        assert p_unpaired > out.loc[1, "P"]

    def test_fligner_variance_difference(self):
        rng = np.random.default_rng(3)
        rows = []
        for region, sd_ko in ((1, 4.0), (2, 1.0)):
            for cond, sd in (("wt", 1.0), ("ko", sd_ko)):
                for _ in range(30):
                    rows.append({"Region": region, "Condition": cond,
                                 "Volume": rng.normal(10.0, sd)})
        out = clrstats.meas_group_stats(
            pd.DataFrame(rows), "Volume", conds=("wt", "ko"),
            model="fligner").set_index("Region")
        assert out.loc[1, "P"] < 0.01      # 4x SD difference
        assert out.loc[2, "P"] > 0.05      # equal variances

    def test_shapiro_normality(self):
        rng = np.random.default_rng(4)
        rows = ([{"Region": 1, "Condition": "wt",
                  "Volume": v} for v in rng.normal(0, 1, 40)]
                + [{"Region": 2, "Condition": "wt",
                    "Volume": v} for v in rng.exponential(1.0, 40)])
        out = clrstats.meas_group_stats(
            pd.DataFrame(rows), "Volume", conds=("wt", "wt"),
            model="shapiro").set_index("Region")
        assert out.loc[1, "P"] > 0.05          # normal draws
        assert out.loc[2, "P"] < 0.01          # exponential draws
        assert 0.0 < out.loc[2, "EffectStd"] < out.loc[1, "EffectStd"]

    def test_basic_and_diff_mean(self):
        rng = np.random.default_rng(5)
        rows = []
        for cond, mean in (("wt", 10.0), ("ko", 13.0)):
            for _ in range(20):
                rows.append({"Region": 1, "Condition": cond,
                             "Volume": rng.normal(mean, 1.0)})
        df = pd.DataFrame(rows)
        basic = clrstats.meas_group_stats(
            df, "Volume", conds=("wt", "ko"), model="basic")
        row = basic.iloc[0]
        assert row["CILow"] < row["MeanBase"] < row["CIHigh"]
        assert row["N"] == 40
        dm = clrstats.meas_group_stats(
            df, "Volume", conds=("wt", "ko"), model="diff.mean").iloc[0]
        assert dm["Effect"] == pytest.approx(3.0, abs=0.7)
        assert np.isnan(dm["P"])

    def test_logit_ord_monotone_trend(self):
        """Three ordered genotype levels with a monotone volume trend:
        the proportional-odds slope must be significantly positive in
        the trending region and null in the flat one."""
        rng = np.random.default_rng(6)
        rows = []
        for geno, mean in (("0", 0.0), ("0.5", 1.0), ("1", 2.0)):
            for _ in range(20):
                rows.append({"Region": 1, "Condition": geno,
                             "Volume": rng.normal(mean, 1.0)})
                rows.append({"Region": 2, "Condition": geno,
                             "Volume": rng.normal(0.0, 1.0)})
        out = clrstats.meas_group_stats(
            pd.DataFrame(rows), "Volume", conds=("0", "1"),
            model="logit.ord").set_index("Region")
        assert out.loc[1, "P"] < 1e-3
        assert out.loc[1, "Effect"] > 0
        assert out.loc[2, "P"] > 0.05

    def test_ordinal_logit_matches_binary_logit(self):
        """With exactly two levels the proportional-odds model IS
        logistic regression — slopes must agree."""
        rng = np.random.default_rng(7)
        x = np.concatenate([rng.normal(0, 1, 150), rng.normal(1.5, 1, 150)])
        y = np.concatenate([np.zeros(150, int), np.ones(150, int)])
        beta_ord, _, cov_ord = clrstats._fit_ordinal_logit(
            x[:, None], y, 2)
        X = np.column_stack([np.ones_like(x), x])
        beta_bin, cov_bin = clrstats._fit_logit_irls(X, y.astype(float))
        assert beta_ord[0] == pytest.approx(beta_bin[1], rel=1e-3)
        assert np.sqrt(cov_ord[0, 0]) == pytest.approx(
            np.sqrt(cov_bin[1, 1]), rel=0.02)

    def test_gee_gaussian_continuous_measure(self):
        """Gaussian-family GEE on a continuous measure: finds a real
        group effect, and duplicated clustered rows must not shrink its
        sandwich p the way they shrink an independence fit."""
        rng = np.random.default_rng(8)
        rows = []
        for s in range(16):
            cond = "wt" if s < 8 else "ko"
            sample_eff = rng.normal(0, 0.5)
            for _ in range(3):
                rows.append({
                    "Sample": s, "Condition": cond, "Region": 1,
                    "Volume": (2.0 if cond == "ko" else 0.0)
                    + sample_eff + rng.normal(0, 0.5)})
        df = pd.DataFrame(rows)
        out = clrstats.meas_group_stats(
            df, "Volume", conds=("wt", "ko"), model="gee",
            gee_family="gaussian").set_index("Region")
        assert out.loc[1, "P"] < 0.01
        assert out.loc[1, "Effect"] == pytest.approx(2.0, abs=0.8)
        df_dup = pd.concat([df, df], ignore_index=True)
        p_dup = clrstats.meas_group_stats(
            df_dup, "Volume", conds=("wt", "ko"), model="gee",
            gee_family="gaussian").set_index("Region").loc[1, "P"]
        p_lin_dup = clrstats.meas_group_stats(
            df_dup, "Volume", conds=("wt", "ko"),
            model="linregr").set_index("Region").loc[1, "P"]
        assert p_dup > p_lin_dup

    def test_ttest_cohens_d(self):
        rng = np.random.default_rng(9)
        rows = []
        for cond, mean in (("wt", 0.0), ("ko", 1.0)):
            for _ in range(40):
                rows.append({"Region": 1, "Condition": cond,
                             "Volume": rng.normal(mean, 1.0)})
        out = clrstats.meas_group_stats(
            pd.DataFrame(rows), "Volume", conds=("wt", "ko"),
            model="ttest").iloc[0]
        # unit separation at unit SD -> d ~ 1
        assert out["EffectStd"] == pytest.approx(1.0, abs=0.35)

    @pytest.mark.parametrize(
        "model", ["ttest.paired", "wilcoxon.paired"])
    def test_paired_skips_one_condition_region(self, model):
        """A region present in only ONE condition must be skipped, not
        abort the whole run with KeyError (round-4 ADVICE)."""
        df = self._paired_frame(n_samples=8)
        only_pre = pd.DataFrame([
            {"Sample": s, "Condition": "pre", "Region": 99,
             "Volume": float(s)} for s in range(8)])
        out = clrstats.meas_group_stats(
            pd.concat([df, only_pre], ignore_index=True), "Volume",
            conds=("pre", "post"), model=model).set_index("Region")
        assert 99 not in out.index
        assert {1, 2} <= set(out.index)

    @pytest.mark.parametrize(
        "model", ["wilcoxon", "wilcoxon.paired"])
    def test_wilcoxon_effect_std_is_signed(self, model):
        """EffectStd must carry the effect DIRECTION (reference
        rcompanion::wilcoxonZ is signed; round-4 ADVICE): a negative
        shift gives a negative standardized effect, a positive shift a
        positive one, with equal magnitudes for mirrored data."""
        df_up = self._paired_frame(shift=1.0, sample_sd=2.0)
        df_dn = df_up.copy()
        df_dn["Volume"] = -df_dn["Volume"]
        up = clrstats.meas_group_stats(
            df_up, "Volume", conds=("pre", "post"), model=model
        ).set_index("Region")
        dn = clrstats.meas_group_stats(
            df_dn, "Volume", conds=("pre", "post"), model=model
        ).set_index("Region")
        assert up.loc[1, "EffectStd"] > 0
        assert dn.loc[1, "EffectStd"] < 0
        assert up.loc[1, "EffectStd"] == pytest.approx(
            -dn.loc[1, "EffectStd"], rel=1e-6)
        # magnitude still matches the p-recovered |z|/sqrt(n)
        assert abs(up.loc[1, "EffectStd"]) > 0.3

    def test_logit_ord_thin_primary_pair_still_fits(self):
        """logit.ord uses ALL ordered levels, so a region with ample
        total data but a thin primary condition pair must still fit
        (round-4 ADVICE: gate on the model's own total-count check)."""
        rng = np.random.default_rng(11)
        rows = []
        # region 1: only 1 sample in each primary cond, 40 in the middle
        for geno, mean, n in (("0", 0.0, 1), ("0.5", 1.0, 40),
                              ("1", 2.0, 1)):
            for _ in range(n):
                rows.append({"Region": 1, "Condition": geno,
                             "Volume": rng.normal(mean, 1.0)})
        out = clrstats.meas_group_stats(
            pd.DataFrame(rows), "Volume", conds=("0", "1"),
            model="logit.ord")
        assert len(out) == 1 and out.iloc[0]["Region"] == 1
        assert np.isfinite(out.iloc[0]["P"])


class TestRemainingTabWorkflows:
    """Controller coverage of the reference Visualization tabs that the
    full-session test doesn't touch: image adjustment, profiles, the
    import tab (TIFF -> image5d), and the BrainGlobe tab from a local
    cache (reference visualizer.py:266 tab set; no X server exists in
    this environment, so the session controller is the tested surface)."""

    def test_import_adjust_profile_tabs(self, tmp_path, rng):
        from magellanmapper_tpu.gui.visualizer import Visualization
        from magellanmapper_tpu.io import tiff
        src = (rng.random((4, 24, 24)) * 1000).astype(np.uint16)
        tif_path = str(tmp_path / "import_me.tif")
        tiff.write_tiff(tif_path, src)

        vis = Visualization()
        img5d = vis.import_file(tif_path, prefix=str(tmp_path / "imp"))
        assert img5d.img.shape[1:4] == src.shape
        # image adjustment tab: windowing state applies and persists
        adj = vis.adjust_image(vmin=10, vmax=500, alpha=0.8)
        assert adj["vmin"] == 10 and adj["alpha"] == 0.8
        # profiles tab: named modifier chain swaps the ROI profile
        prof = vis.set_roi_profile("lightsheet")
        assert prof is vis.roi_profile

    def test_brain_globe_tab_local_cache(self, tmp_path, rng):
        import json
        from magellanmapper_tpu.gui.visualizer import Visualization
        from magellanmapper_tpu.io import tiff
        cache = tmp_path / "allen_test_10um_v1.0"
        cache.mkdir()
        ref = (rng.random((4, 8, 8)) * 900).astype(np.uint16)
        ann = rng.integers(0, 4, (4, 8, 8)).astype(np.uint16)
        tiff.write_tiff(str(cache / "reference.tiff"), ref)
        tiff.write_tiff(str(cache / "annotation.tiff"), ann)
        (cache / "metadata.json").write_text(
            json.dumps({"resolution": [10.0, 10.0, 10.0]}))

        vis = Visualization()
        img5d, labels, meta = vis.open_brain_globe(
            "allen_test", cache_dir=str(tmp_path))
        np.testing.assert_array_equal(img5d.img[0], ref)
        np.testing.assert_array_equal(labels, ann)
        assert meta["resolution"] == [10.0, 10.0, 10.0]
        # the fetched atlas feeds the annotation tab directly
        views = vis.open_atlas_editor()
        assert set(views.canvases) == {"xy", "xz", "yz"}
