"""CLI end-to-end + stats/export module tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.io import cli, df_io, export_regions, np_io
from magellanmapper_tpu.stats import atlas_stats, clustering, mlearn


def make_volume(tmp_path, shape=(24, 40, 40), n=12, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    centers = np.column_stack([rng.uniform(6, s - 6, n) for s in shape])
    for cz, cy, cx in centers:
        vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 8.0)
    vol /= vol.max()
    base = str(tmp_path / "samp.npy")
    np_io.write_npy(base, vol[None], resolutions=[[1.0, 1.0, 1.0]])
    return base, centers


class TestCLI:
    def test_parse_args(self):
        rc = cli.process_cli_args([
            "--img", "a.npy", "--proc", "detect",
            "--channel", "0", "--roi_profile", "lightsheet,4xnuc",
            "--reg_suffixes", "atlas=atlasVolume.mhd",
            "--set_meta", "resolutions=2,1,1"])
        assert rc.filenames == ["a.npy"]
        assert rc.proc is cli.ProcessTypes.DETECT
        assert rc.channel == [0]
        assert rc.roi_profile["min_sigma_factor"] == 3  # 4xnuc override
        assert rc.reg_suffixes["atlas"] == "atlasVolume.mhd"
        assert rc.resolutions == [2.0, 1.0, 1.0]

    def test_detect_end_to_end(self, tmp_path):
        base, centers = make_volume(tmp_path)
        out = cli.main([
            "--img", base, "--proc", "detect",
            "--roi_profile", "4xnuc"])
        assert len(out) > 0
        # blobs archive written
        assert os.path.exists(str(tmp_path / "samp_blobs.npz"))

    def test_transform_end_to_end(self, tmp_path):
        base, _ = make_volume(tmp_path)
        out_path = cli.main([
            "--img", base, "--proc", "transform",
            "--transform", "rescale=0.5"])
        img5d = np_io.read_file(out_path)
        assert img5d.img.shape == (1, 12, 20, 20)

    def test_export_tif(self, tmp_path):
        base, _ = make_volume(tmp_path)
        out = cli.main(["--img", base, "--proc", "export_tif"])
        assert os.path.exists(out)

    def test_unknown_proc_errors(self):
        with pytest.raises(SystemExit):
            cli.process_cli_args(["--proc", "bogus_task"])


class TestStats:
    def test_meas_dice(self):
        a = np.zeros((5, 5, 5), bool)
        b = np.zeros((5, 5, 5), bool)
        a[:3] = True
        b[:3] = True
        assert atlas_stats.meas_dice(a, b) == 1.0

    def test_clustering(self):
        rng = np.random.default_rng(0)
        c1 = rng.normal((10, 10, 10), 1, (30, 3))
        c2 = rng.normal((50, 50, 50), 1, (30, 3))
        blobs = np.vstack([c1, c2])
        out, stats = clustering.cluster_blobs(blobs, eps=5, minpts=4)
        assert stats["NucCluster"] == 2
        assert out.shape[1] == 4

    def test_knn_dist(self):
        blobs = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [10, 10, 10]],
                         float)
        d = clustering.knn_dist(blobs, 2, return_sorted=False)
        assert d[0] == 1.0

    def test_grid_search(self):
        truth = np.array([[5.0, 5, 5], [10, 10, 10]])

        def fn_detect(overrides):
            # pretend threshold sweeps recall
            if overrides["detection_threshold"] < 0.5:
                return np.array([[5.0, 5, 5, 3], [10, 10, 10, 3],
                                 [20, 20, 20, 3]])
            return np.array([[5.0, 5, 5, 3]])

        from collections import OrderedDict
        df = mlearn.grid_search(
            OrderedDict([("detection_threshold", [0.1, 0.9])]),
            fn_detect, truth, (2, 2, 2))
        assert len(df) == 2
        assert df.iloc[0]["SENS"] == 1.0
        assert df.iloc[1]["SENS"] == 0.5
        ranked = mlearn.parse_grid_stats(df)
        assert ranked.iloc[0]["detection_threshold"] == 0.1

    def test_grid_search_multi_path_matches_plain(self):
        """fn_detect_multi: the batched-threshold path must yield the
        same rows (values + stats, same order) as per-combo calls."""
        from collections import OrderedDict
        truth = np.array([[5.0, 5, 5], [10, 10, 10]])

        def detect_at(thr, extra):
            n = 3 if thr < 0.5 else 1
            base = np.array([[5.0, 5, 5, 3], [10, 10, 10, 3],
                             [20, 20, 20, 3]])[:n]
            return base if extra == "a" else base[:-1] if n > 1 else base

        calls = {"multi": 0, "plain": 0}

        def fn_detect(overrides):
            calls["plain"] += 1
            return detect_at(overrides["detection_threshold"],
                             overrides["x"])

        def fn_multi(other, thresholds):
            calls["multi"] += 1
            return [detect_at(t, other["x"]) for t in thresholds]

        grid = OrderedDict([
            ("detection_threshold", [0.1, 0.9]), ("x", ["a", "b"])])
        df_plain = mlearn.grid_search(grid, fn_detect, truth, (2, 2, 2))
        df_multi = mlearn.grid_search(
            grid, fn_detect, truth, (2, 2, 2), fn_detect_multi=fn_multi)
        assert calls["multi"] == 2      # one call per non-thr combo
        key = ["detection_threshold", "x"]
        pd.testing.assert_frame_equal(
            df_plain.sort_values(key).reset_index(drop=True),
            df_multi.sort_values(key).reset_index(drop=True))

    def test_blob_log_multi_matches_single(self):
        """blob_log_multi: each threshold row must equal a plain
        blob_log run at that threshold (shared-pyramid correctness)."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv import detector
        rng2 = np.random.default_rng(5)
        vol = np.zeros((24, 28, 28), np.float32)
        for z, y, x in rng2.integers(5, 22, (12, 3)):
            zz, yy, xx = np.ogrid[:24, :28, :28]
            vol += np.exp(-((zz - z) ** 2 + (yy - y) ** 2
                            + (xx - x) ** 2) / 6.0)
        vol += rng2.normal(0, 0.02, vol.shape).astype(np.float32)
        vol = np.clip(vol, 0, None) / vol.max()
        sigmas = tuple(np.linspace(1.5, 3.0, 4))
        thresholds = [0.05, 0.15, 0.4]
        raws, valids = detector.blob_log_multi(
            jnp.asarray(vol), sigmas, np.asarray(thresholds), 0.5, 256)
        counts = []
        for k, thr in enumerate(thresholds):
            raw_s, valid_s = detector.blob_log(
                jnp.asarray(vol), sigmas, float(thr), 0.5, 256)
            a = np.asarray(raws[k])[np.asarray(valids[k])]
            b = np.asarray(raw_s)[np.asarray(valid_s)]
            np.testing.assert_allclose(
                np.sort(a, axis=0), np.sort(b, axis=0), atol=1e-5)
            counts.append(len(a))
        # higher thresholds find fewer blobs (sanity on the sweep)
        assert counts[0] >= counts[-1] and counts[0] > 0

    def test_make_fn_detect_multi_formats_blobs(self):
        from magellanmapper_tpu.settings.roi_prof import ROIProfile
        rng2 = np.random.default_rng(6)
        vol = np.zeros((20, 24, 24), np.float32)
        for z, y, x in rng2.integers(5, 18, (8, 3)):
            zz, yy, xx = np.ogrid[:20, :24, :24]
            vol += np.exp(-((zz - z) ** 2 + (yy - y) ** 2
                            + (xx - x) ** 2) / 6.0)
        vol = np.clip(vol, 0, None) / vol.max()
        prof = ROIProfile()
        prof["min_sigma_factor"] = 1.5
        prof["max_sigma_factor"] = 3.0
        prof["num_sigma"] = 4
        fn = mlearn.make_fn_detect_multi(vol, (1.0, 1.0, 1.0), prof)
        out = fn({}, [0.05, 0.6])
        assert len(out) == 2
        assert out[0] is not None and out[0].shape[1] == 10
        n_low = len(out[0])
        n_high = 0 if out[1] is None else len(out[1])
        assert n_low >= n_high


class TestDfIO:
    def test_csv_roundtrip_with_backup(self, tmp_path):
        path = str(tmp_path / "out.csv")
        df1 = pd.DataFrame({"a": [1, 2]})
        df_io.data_frames_to_csv(df1, path)
        df2 = pd.DataFrame({"a": [3]})
        df_io.data_frames_to_csv(df2, path)
        assert os.path.exists(path)
        assert os.path.exists(str(tmp_path / "out(1).csv"))

    def test_melt_zscore(self):
        df = pd.DataFrame({
            "Region": [1, 2], "VolR": [10, 20], "VolL": [12, 18]})
        melted = df_io.melt_cols(df, ["Region"], ["VolR", "VolL"])
        assert len(melted) == 4
        z = df_io.zscore_df(
            melted, ["Region"], ["Value"])
        assert abs(z["Value"].mean()) < 1e-9


class TestExportRegions:
    def test_density_image(self, tmp_path):
        base, centers = make_volume(tmp_path)
        from magellanmapper_tpu.cv import blobs as blobs_mod
        arr = np.column_stack([
            centers, np.full(len(centers), 3.0)])
        blobs = blobs_mod.Blobs(arr)
        blobs.blobs = blobs_mod.Blobs(arr).format_blobs(0)
        heat, out_path = export_regions.make_density_image(
            base, scale=0.5, blobs=blobs)
        assert heat.shape == (12, 20, 20)
        assert heat.sum() == len(centers)
        assert os.path.exists(str(tmp_path / "samp_heat.mhd"))

    def test_region_ids_csv(self, tmp_path):
        from magellanmapper_tpu.atlas import ontology
        tree = {"msg": [{"id": 1, "name": "root", "st_level": 0,
                         "children": []}]}
        p = tmp_path / "ref.json"
        p.write_text(json.dumps(tree))
        ref = ontology.LabelsRef(str(p)).load()
        out = str(tmp_path / "ids.csv")
        df = export_regions.export_region_ids(ref, out)
        assert os.path.exists(out)
        assert 1 in set(df["Region"])


class TestCLIRegister:
    def test_register_single_cli(self, tmp_path):
        import jax.numpy as jnp
        from magellanmapper_tpu.io import sitk_io
        from magellanmapper_tpu.atlas import transform

        # fixed sample volume saved as npy
        zz, yy, xx = np.indices((20, 24, 24)).astype(np.float32)
        fixed = np.exp(-(((zz-10)/7)**2 + ((yy-12)/9)**2
                         + ((xx-12)/9)**2) * 2).astype(np.float32)
        base = str(tmp_path / "samp.npy")
        np_io.write_npy(base, fixed[None])

        # moving atlas dir: shifted copy + labels
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"t": jnp.asarray([-2.0, 0, 0])},
            "translation", fixed.shape))
        labels = (moving > 0.3).astype(np.int32) * 4
        atlas_dir = tmp_path / "atlas"
        atlas_dir.mkdir()
        sitk_io.write_med_img(
            str(atlas_dir / "atlasVolume.mhd"), sitk_io.MedImage(moving))
        sitk_io.write_med_img(
            str(atlas_dir / "annotation.mhd"), sitk_io.MedImage(labels))

        out = cli.main([
            "--img", base, str(atlas_dir),
            "--register", "single",
            "--atlas_profile", "ncc,noaffine,nobspline,smalliter",
            "--prefix", str(tmp_path / "reg")])
        assert out["metrics"]["DSC_atlas_sample"] > 0.7
        assert os.path.exists(str(tmp_path / "reg_annotation.mhd"))

        # --mesh routes the same task through the mesh-sharded metric
        # (virtual 8-device CPU mesh from conftest)
        out_m = cli.main([
            "--img", base, str(atlas_dir),
            "--register", "single",
            "--atlas_profile", "ncc,noaffine,nobspline,smalliter",
            "--mesh", "2,2,2",
            "--prefix", str(tmp_path / "regm")])
        assert out_m["metrics"]["DSC_atlas_sample"] == pytest.approx(
            out["metrics"]["DSC_atlas_sample"], abs=0.05)

    def test_subimg_detection(self, tmp_path):
        base, centers = make_volume(tmp_path, shape=(24, 48, 48))
        out = cli.main([
            "--img", base, "--proc", "detect",
            "--subimg_offset", "8,8,4", "--subimg_size", "32,32,16",
            "--roi_profile", "4xnuc"])
        arr = out.blobs
        assert arr is not None


class TestCLITruthDB:
    def test_detect_with_truth_verification(self, tmp_path):
        from magellanmapper_tpu.io import sqlite
        base, centers = make_volume(tmp_path, n=10, seed=3)
        # truth DB from planted centers
        db = sqlite.load_db(str(tmp_path / "truth.db"))
        exp = db.select_or_insert_experiment("samp")
        roi_id, _ = db.select_or_insert_roi(exp, 0, (0, 0, 0),
                                            (40, 40, 24))
        truth = np.column_stack([
            centers, np.full(len(centers), 3.0),
            np.ones(len(centers)), np.ones(len(centers)),
            np.zeros(len(centers))])
        db.insert_blobs(roi_id, truth)
        db.close()
        out = cli.main([
            "--img", base, "--proc", "detect",
            "--roi_profile", "4xnuc",
            "--truth_db", str(tmp_path / "truth.db")])
        assert os.path.exists(str(tmp_path / "samp_verify.csv"))
        df = pd.read_csv(str(tmp_path / "samp_verify.csv"))
        assert df["sens"][0] > 0.5

    def test_grid_search_cli_end_to_end(self, tmp_path):
        """--grid_search gridtest over a truth DB: the CSV carries one
        ROC row per threshold with monotone detections (this ROI-scale
        sweep routes through the batched multi-threshold program)."""
        from magellanmapper_tpu.io import sqlite
        base, centers = make_volume(tmp_path, n=10, seed=4)
        db = sqlite.load_db(str(tmp_path / "truth.db"))
        exp = db.select_or_insert_experiment("samp")
        roi_id, _ = db.select_or_insert_roi(exp, 0, (0, 0, 0),
                                            (40, 40, 24))
        truth = np.column_stack([
            centers, np.full(len(centers), 3.0),
            np.ones(len(centers)), np.ones(len(centers)),
            np.zeros(len(centers))])
        db.insert_blobs(roi_id, truth)
        db.close()
        df = cli.main([
            "--img", base, "--grid_search", "gridtest",
            "--roi_profile", "4xnuc",
            "--truth_db", str(tmp_path / "truth.db")])
        csv_path = base + "_gridsearch.csv"
        assert os.path.exists(csv_path)
        assert len(df) == 4      # gridtest sweeps 4 thresholds
        assert set(mlearn.GRID_SEARCH_STATS) <= set(df.columns)
        by_thr = df.sort_values("detection_threshold")
        n_det = (by_thr["TP"] + by_thr["FP"]).to_numpy()
        assert (np.diff(n_det) <= 0).all()   # higher thr, fewer blobs
        assert by_thr.iloc[0]["SENS"] > 0.5


class TestCLIEdgeImages:
    def test_make_edge_images_writes_set(self, tmp_path):
        from magellanmapper_tpu.io import sitk_io
        zz, yy, xx = np.indices((32, 40, 40)).astype(np.float32)
        atlas = np.exp(-(((zz-16)/12)**2 + ((yy-20)/16)**2
                         + ((xx-20)/16)**2) * 2).astype(np.float32)
        # internal structure so the LoG has zero crossings inside labels
        atlas = atlas * (1 + 0.3 * np.sin(zz / 3) * np.sin(yy / 4))
        atlas = atlas.astype(np.float32)
        labels = (atlas > 0.2).astype(np.int32) * 5
        base = str(tmp_path / "s.npy")
        sitk_io.write_reg_images({
            "atlasVolume.mhd": sitk_io.MedImage(atlas),
            "annotation.mhd": sitk_io.MedImage(labels)}, base)
        out = cli.main(["--img", base, "--register", "make_edge_images"])
        assert out["atlas_edge"].any()
        for suffix in ("atlasEdge.mhd", "atlasLoG.mhd",
                       "annotationEdge.mhd", "annotationDist.mhd"):
            assert os.path.exists(str(tmp_path / f"s_{suffix}"))


class TestCLIMoreRegisterTasks:
    def test_itksnap_conversion(self, tmp_path):
        snap = tmp_path / "labels.txt"
        snap.write_text(
            '# header\n1 255 0 0 255 1 1 "Cortex"\n'
            '2 0 255 0 255 1 1 "Thalamus"\n')
        df = cli.main([
            "--img", str(snap), "--register", "convert_itksnap_labels",
            "--prefix", str(tmp_path / "labels.csv")])
        assert list(df["id"]) == [1, 2]
        assert list(df["name"]) == ["Cortex", "Thalamus"]
        assert os.path.exists(str(tmp_path / "labels.csv"))

    def test_export_common_labels(self, tmp_path):
        from magellanmapper_tpu.io import sitk_io
        paths = []
        for i, ids in enumerate(([1, 2, 3], [2, 3, 4])):
            labels = np.zeros((4, 4, 4), np.int32)
            for j, lid in enumerate(ids):
                labels[j] = lid
            base = str(tmp_path / f"s{i}.npy")
            sitk_io.write_reg_images(
                {"annotation.mhd": sitk_io.MedImage(labels)}, base)
            paths.append(base)
        df = cli.main([
            "--img", *paths, "--register", "export_common_labels",
            "--prefix", str(tmp_path / "common.csv")])
        assert list(df["Region"]) == [2, 3]


class TestCLIMergeSegs:
    def test_merge_atlas_segs_reannotates(self, tmp_path):
        from magellanmapper_tpu.io import sitk_io
        zz, yy, xx = np.indices((20, 28, 28)).astype(np.float32)
        atlas = np.exp(-(((zz-10)/8)**2 + ((yy-14)/11)**2
                         + ((xx-14)/11)**2) * 2).astype(np.float32)
        labels = np.zeros(atlas.shape, np.int32)
        labels[atlas > 0.3] = 4
        labels[:, :, :14][atlas[:, :, :14] > 0.3] = 7
        base = str(tmp_path / "m.npy")
        sitk_io.write_reg_images({
            "atlasVolume.mhd": sitk_io.MedImage(atlas),
            "annotation.mhd": sitk_io.MedImage(labels)}, base)
        out = cli.main([
            "--img", base, "--register", "merge_atlas_segs"])
        assert out[0]["DSC_orig_new"] > 0.5
        seg = sitk_io.load_registered_img(base, "annotation.mhd")
        assert set(np.unique(seg)) <= set(np.unique(labels))


class TestCLIFullWorkflow:
    def test_register_density_volstats_chain(self, tmp_path):
        """The full --register single -> make_density_images ->
        vol_stats CLI chain on one sample."""
        import jax.numpy as jnp
        from magellanmapper_tpu.atlas import transform
        from magellanmapper_tpu.io import sitk_io

        # sample with nuclei + shifted atlas with labels
        rng = np.random.default_rng(2)
        shape = (24, 40, 40)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        body = np.exp(-(((zz-12)/9)**2 + ((yy-20)/15)**2
                        + ((xx-20)/15)**2) * 2).astype(np.float32)
        sample = body.copy()
        for c in rng.uniform(8, 32, (15, 3)):
            sample += 0.5 * np.exp(
                -((zz-c[0])**2 + (yy-c[1])**2 + (xx-c[2])**2) / 6.0)
        sample /= sample.max()
        base = str(tmp_path / "s.npy")
        np_io.write_npy(base, sample[None])

        moving = np.asarray(transform.resample(
            jnp.asarray(body), {"t": jnp.asarray([-2.0, 1.0, 0.0])},
            "translation", shape))
        labels = (moving > 0.3).astype(np.int32) * 3
        atlas_dir = tmp_path / "atlas"
        atlas_dir.mkdir()
        sitk_io.write_med_img(str(atlas_dir / "atlasVolume.mhd"),
                              sitk_io.MedImage(moving))
        sitk_io.write_med_img(str(atlas_dir / "annotation.mhd"),
                              sitk_io.MedImage(labels))

        # 1. register
        out = cli.main([
            "--img", base, str(atlas_dir), "--register", "single",
            "--atlas_profile", "ncc,noaffine,nobspline,smalliter",
            "--prefix", base])
        # chain correctness is the target here; registration quality
        # gates live in test_registration/test_atlas
        assert out["metrics"]["DSC_atlas_sample"] > 0.6
        # 2. detect + 3. density image + 4. vol stats
        cli.main(["--img", base, "--proc", "detect",
                  "--roi_profile", "4xnuc"])
        cli.main(["--img", base, "--register", "make_density_images"])
        df = cli.main(["--img", base, "--register", "vol_stats"])
        assert "Nuclei" in df.columns
        assert df["Nuclei"].sum() > 0
        assert os.path.exists(base[:-4] + "_vols.csv")

    def test_detect_coloc_and_match(self, tmp_path):
        rng = np.random.default_rng(4)
        shape = (16, 32, 32)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        vol = rng.normal(0.03, 0.01, shape).astype(np.float32)
        for c in rng.uniform(6, 26, (6, 3)):
            vol += np.exp(-((zz-c[0])**2 + (yy-c[1])**2
                            + (xx-c[2])**2) / 6.0)
        img = np.stack([vol, vol], axis=-1)
        base = str(tmp_path / "c.npy")
        np_io.write_npy(base, img[None])
        blobs = cli.main([
            "--img", base, "--proc", "detect_coloc",
            "--roi_profile", "4xnuc"])
        assert blobs.colocalizations is not None
        assert blobs.colocalizations.shape[1] == 2
        matches = cli.main([
            "--img", base, "--proc", "coloc_match"])
        assert (0, 1) in matches


class TestNewProcDispatches:
    @pytest.fixture
    def img_base(self, tmp_path, rng):
        from magellanmapper_tpu.io import np_io
        vol = np.zeros((10, 24, 24), np.float32)
        zz, yy, xx = np.indices(vol.shape).astype(np.float32)
        for c in ((4, 8, 8), (6, 16, 16)):
            vol += np.exp(-((zz-c[0])**2 + (yy-c[1])**2 + (xx-c[2])**2)
                          / 6.0)
        vol += rng.normal(scale=0.01, size=vol.shape).astype(np.float32)
        vol = np.clip(vol, 0, None) / vol.max()
        base = str(tmp_path / "vol")
        np_io.write_npy(base, vol[None])
        return base

    def _run(self, *argv):
        from magellanmapper_tpu.io import cli
        return cli.main(list(argv))

    def test_extract_plane(self, img_base, tmp_path):
        self._run("--img", img_base, "--proc", "extract",
                  "--offset", "0,0,5")
        outs = list(tmp_path.glob("*planexy5.npy"))
        assert len(outs) == 1
        assert np.load(outs[0]).shape == (24, 24)

    def test_export_planes(self, img_base, tmp_path):
        self._run("--img", img_base, "--proc", "export_planes")
        out_dir = tmp_path / "vol_planes"
        assert out_dir.is_dir()
        assert len(list(out_dir.glob("*.png"))) == 10

    def test_animated(self, img_base, tmp_path):
        self._run("--img", img_base, "--proc", "animated")
        assert (tmp_path / "vol.gif").exists()

    def test_classify_updates_blobs(self, img_base, tmp_path):
        from magellanmapper_tpu.cv import blobs as bm
        # detect first to produce the blobs archive
        self._run("--img", img_base, "--proc", "detect")
        blobs_path = str(tmp_path / "vol_blobs.npz")
        before = bm.Blobs().load_blobs(blobs_path)
        assert before.blobs is not None and len(before.blobs)
        self._run("--img", img_base, "--proc", "classify")
        after = bm.Blobs().load_blobs(blobs_path)
        assert set(np.unique(after.blobs[:, 4])) <= {0.0, 1.0}

    def test_export_rois(self, img_base, tmp_path):
        from magellanmapper_tpu.io import sqlite as sq
        db_path = str(tmp_path / "truth.db")
        db = sq.load_db(db_path)
        exp = db.select_or_insert_experiment("e")
        rid, _ = db.select_or_insert_roi(exp, 0, (2, 2, 2), (12, 12, 6))
        db.insert_blobs(rid, np.array([[3.0, 6, 6, 2, 1, 1, 0]]))
        db.close()
        self._run("--img", img_base, "--proc", "export_rois",
                  "--truth_db", db_path)
        out_dir = tmp_path / "vol_rois"
        assert out_dir.is_dir() and len(list(out_dir.iterdir())) > 0


class TestRegisterTaskDispatches:
    """The long tail of --register tasks dispatches to real
    implementations (reference register.main task vocabulary)."""

    def _run(self, *argv):
        from magellanmapper_tpu.io import cli
        return cli.main(list(argv))

    @pytest.fixture
    def reg_sample(self, tmp_path, rng):
        """A sample with registered atlas+annotation images on disk."""
        from magellanmapper_tpu.io import sitk_io
        base = str(tmp_path / "samp.npy")
        atlas = rng.random((8, 12, 12)).astype(np.float32)
        labels = np.zeros((8, 12, 12), np.int32)
        labels[2:6, 3:9, 3:9] = 4
        sitk_io.write_reg_images({
            "atlasVolume.mhd": sitk_io.MedImage(atlas),
            "annotation.mhd": sitk_io.MedImage(labels),
        }, base)
        return base, atlas, labels

    def test_labels_diff(self, reg_sample, tmp_path, rng):
        from magellanmapper_tpu.io import sitk_io
        base, atlas, labels = reg_sample
        base2 = str(tmp_path / "samp2.npy")
        labels2 = np.array(labels)
        labels2[2:6, 3:7, 3:7] = 4
        labels2[2:6, 7:9, 7:9] = 0
        sitk_io.write_reg_images({
            "atlasVolume.mhd": sitk_io.MedImage(atlas),
            "annotation.mhd": sitk_io.MedImage(labels2),
        }, base2)
        df = self._run("--img", base, base2, "--register", "labels_diff")
        assert "VolDSC" in df.columns
        assert (tmp_path / "samp_labels_diff.csv").exists()
        diff = sitk_io.load_registered_img(base, "annotationDiff.mhd")
        assert diff.sum() > 0

    def test_merge_images(self, reg_sample, tmp_path):
        from magellanmapper_tpu.io import sitk_io
        base, atlas, labels = reg_sample
        med = self._run("--img", base, base, "--register", "merge_images")
        np.testing.assert_allclose(med.img, atlas * 2, rtol=1e-5)
        merged = sitk_io.load_registered_img(base, "combined.mhd")
        assert merged.shape == atlas.shape

    def test_smoothing_metrics_aggr_and_peaks(self, tmp_path):
        df = pd.DataFrame({
            "Filter_size": [1, 2], "Compaction": [0.1, 0.3],
            "Displacement": [0.05, 0.1],
            "Smoothing_quality": [0.05, 0.2], "Vol_orig": [10.0, 10.0]})
        p = str(tmp_path / "sm.csv")
        df.to_csv(p, index=False)
        out = self._run("--img", p, "--register",
                        "smoothing_metrics_aggr")
        assert out["Compaction"][0] == pytest.approx(0.2)
        peak = self._run("--img", p, "--register", "smoothing_peaks")
        assert peak["Filter_size"] == 2

    def test_df_flavored_tasks(self, tmp_path):
        df = pd.DataFrame({
            "Sample": ["s1", "s1", "s2", "s2"],
            "Region": [1, 2, 1, 2],
            "Condition": ["ctl", "ctl", "exp", "exp"],
            "Volume": [10.0, 20, 12, 18],
            "VarIntensity": [0.1, 0.2, 0.15, 0.25],
            "MeanIntensity": [1.0, 2, 1.5, 2.5],
            "VarNuclei": [0.1, 0.1, 0.1, 0.1],
            "MeanNuclei": [1.0, 1, 1, 1],
            "EdgeDistSum": [0.2, 0.3, 0.2, 0.3]})
        p = str(tmp_path / "vols.csv")
        df.to_csv(p, index=False)
        piv = self._run("--img", p, "--register", "pivot_conds")
        assert (tmp_path / "vols.csv_pivoted.csv").exists()
        melted = self._run("--img", p, "--register", "melt_cols")
        assert "Group" in melted.columns
        combined = self._run("--img", p, "--register", "combine_cols")
        assert "CoefVarIntensity" in combined.columns
        z = self._run("--img", p, "--register", "zscores")
        assert "Homogeneity" in z.columns

    def test_cluster_and_knn_plots(self, tmp_path, rng):
        from magellanmapper_tpu.cv import blobs as bm
        base = str(tmp_path / "c.npy")
        blobs = np.zeros((60, 10))
        blobs[:, :3] = rng.random((60, 3)) * 40
        b = bm.Blobs(blobs)
        b.path = str(tmp_path / "c_blobs.npz")
        b.save_archive()
        clustered = self._run("--img", base, "--register",
                              "cluster_blobs")
        assert clustered is not None
        self._run("--img", base, "--register", "plot_knns")
        assert (tmp_path / "c.npy_knn.png").exists()


class TestDfPlotTaskDispatches:
    """--df and --plot_2d task vocabularies (reference df_io.main /
    plot_2d.main dispatch)."""

    def _run(self, *argv):
        from magellanmapper_tpu.io import cli
        return cli.main(list(argv))

    @pytest.fixture
    def vols_csv(self, tmp_path):
        df = pd.DataFrame({
            "Sample": ["s1", "s1", "s2", "s2"],
            "Region": [1, 2, 1, 2],
            "Condition": ["ctl", "ctl", "exp", "exp"],
            "Volume": [10.0, 20, 12, 18],
            "Nuclei": [100, 200, 130, 210]})
        p = str(tmp_path / "v.csv")
        df.to_csv(p, index=False)
        return p

    def test_df_tasks(self, vols_csv, tmp_path):
        out = self._run("--df", "exps_by_region", vols_csv)
        assert "Volume" in out
        out = self._run("--df", "divide_cols", vols_csv, "--labels",
                        "col1=Nuclei", "col2=Volume", "name=Density")
        assert out["Density"][0] == 10.0
        piv = self._run("--df", "pivot_table", vols_csv, "--labels",
                        "index=Region", "columns=Condition",
                        "values=Volume")
        assert "ctl" in piv.columns
        norm = self._run(
            "--df", "normalize", vols_csv, "--labels", "id_cols=Region",
            "cond_col=Condition", "cond_base=ctl", "metric_cols=Volume")
        val = norm.loc[(norm.Region == 1) & (norm.Condition == "exp"),
                       "Volume"].iloc[0]
        assert val == pytest.approx(1.2)
        rep = self._run("--df", "replace_vals", vols_csv, "--labels",
                        "vals_from=ctl", "vals_to=control",
                        "cols=Condition")
        assert "control" in set(rep["Condition"])
        merged = self._run("--df", "append_csvs_cols", vols_csv,
                           vols_csv, "--groups", "A", "B")
        assert any(c.startswith("A.") for c in merged.columns)

    def test_plot_2d_tasks(self, vols_csv, tmp_path):
        for task, labels in (
                ("cat_plot", ["x_col=Condition", "y_col=Volume"]),
                ("histogram", ["y_col=Volume"]),
                ("swarm_plot", ["x_col=Condition", "y_col=Volume"])):
            out = str(tmp_path / f"{task}.png")
            self._run("--img", vols_csv, "--plot_2d", task,
                      "--labels", *labels, "--prefix", out)
            assert os.path.exists(out), task


def test_cli_detect_with_mesh(tmp_path):
    """--mesh dp,sp[,spy] routes detection through the sharded
    whole-volume path (TPU-native multi-chip CLI surface)."""
    import sys
    import numpy as np
    from magellanmapper_tpu.io import cli, np_io

    rng = np.random.default_rng(0)
    vol = np.zeros((32, 40, 40), np.float32)
    zz, yy, xx = np.indices(vol.shape).astype(np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(6, s - 6, 10) for s in vol.shape]):
        vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 10.7)
    vol = np.clip(vol / vol.max(), 0, None)
    base = str(tmp_path / "meshvol.npy")
    np_io.write_npy(base, vol, resolutions=(1.0, 1.0, 1.0))

    argv = sys.argv
    try:
        sys.argv = ["mm-tpu", "--img", base, "--proc", "detect",
                    "--mesh", "1,4,2"]
        cli.main()
    finally:
        sys.argv = argv
    import os
    blobs_path = str(tmp_path / "meshvol_blobs.npz")
    assert os.path.exists(blobs_path)
    from magellanmapper_tpu.cv import blobs as blobs_mod
    blobs = blobs_mod.Blobs().load_blobs(blobs_path)
    assert blobs.blobs is not None and len(blobs.blobs) > 0


class TestCloudCLI:
    """--ec2_*/--notify flags dispatch to cloud/aws.py + notify.py
    (reference cli.py:253-434, process_tasks :874)."""

    def test_ec2_list_dispatch(self, monkeypatch):
        from magellanmapper_tpu.cloud import aws
        calls = {}
        def fake_show(state="running"):
            calls["state"] = state
            return [{"id": "i-123", "type": "t3.micro", "ip": None}]

        monkeypatch.setattr(aws, "show_instances", fake_show)
        rc = cli.process_cli_args(["--ec2_list", "stopped"])
        assert rc.ec2_list[0] == "stopped"
        out = cli.process_tasks(rc)
        assert calls["state"] == "stopped"
        assert out[0]["id"] == "i-123"

    def test_ec2_terminate_dispatch(self, monkeypatch):
        from magellanmapper_tpu.cloud import aws
        got = []
        monkeypatch.setattr(
            aws, "terminate_instances", lambda ids: got.extend(ids))
        rc = cli.process_cli_args(["--ec2_terminate", "i-1", "i-2"])
        cli.process_tasks(rc)
        assert got == ["i-1", "i-2"]

    def test_ec2_start_dispatch(self, monkeypatch):
        from magellanmapper_tpu.cloud import aws
        seen = {}

        def fake_start(image_id, instance_type, count=1, key_name=None):
            seen.update(image_id=image_id, instance_type=instance_type,
                        count=count, key_name=key_name)
            return ["i-new"]

        monkeypatch.setattr(aws, "start_instances", fake_start)
        rc = cli.process_cli_args([
            "--ec2_start", "tag", "ami-42", "m5.large", "subnet-1",
            "sg-1", "mykey", "2"])
        out = cli.process_tasks(rc)
        assert out == ["i-new"]
        assert seen == {"image_id": "ami-42",
                        "instance_type": "m5.large",
                        "count": 2, "key_name": "mykey"}

    def test_notify_dispatch(self, monkeypatch):
        from magellanmapper_tpu.cloud import notify
        seen = {}
        monkeypatch.setattr(
            notify, "post",
            lambda url, msg, attachment=None: seen.update(
                url=url, msg=msg, attachment=attachment) or True)
        rc = cli.process_cli_args(
            ["--notify", "http://hook.example/x", "done", "/tmp/log.txt"])
        assert cli.process_tasks(rc) is True
        assert seen == {"url": "http://hook.example/x", "msg": "done",
                        "attachment": "/tmp/log.txt"}


class TestAnimateMp4:
    def test_mp4_or_gif_fallback(self, tmp_path):
        """.mp4 target writes MP4 via FFMpegWriter when ffmpeg exists,
        else falls back to GIF (reference export_stack.py:277 writes
        both formats)."""
        from matplotlib import animation
        from magellanmapper_tpu.io import export_stack
        vol = np.random.default_rng(0).random((4, 16, 16)).astype(
            np.float32)
        out = export_stack.animate_imgs(
            vol, str(tmp_path / "anim.mp4"), fps=4)
        if animation.FFMpegWriter.isAvailable():
            assert out.endswith(".mp4")
        else:
            assert out.endswith(".gif")
        assert os.path.exists(out) and os.path.getsize(out) > 0


class TestRemainingFlagState:
    def test_display_and_load_flags_stored(self):
        rc = cli.process_cli_args([
            "--img", "a.npy", "--slice", "2,8", "--delay", "50",
            "--plot_labels", "x_col=Region", "--vmin", "0.1",
            "--vmax", "0.9", "--alphas", "0.5", "--rgb", "--show",
            "--cpus", "4", "--load", "blobs", "--meta", "m.yml",
            "--theme", "dark"])
        assert rc.slice_vals == [2, 8]
        assert rc.delay == 50
        assert rc.plot_labels == {"x_col": "Region"}
        assert rc.vmin == [0.1] and rc.vmax == [0.9]
        assert rc.alphas == [0.5] and rc.rgb and rc.show
        assert rc.cpus == 4
        assert rc.load_data == {"blobs": "1"}
        assert rc.meta_paths == ["m.yml"]
        assert rc.theme == ["dark"]

    def test_animated_honors_slice_and_delay(self, tmp_path, rng):
        base, _ = make_volume(tmp_path, shape=(16, 20, 20), n=2)
        rc = cli.process_cli_args([
            "--img", base, "--proc", "animated", "--slice", "1,4",
            "--delay", "100", "--prefix", str(tmp_path / "anim")])
        out = cli.process_tasks(rc)
        assert out.endswith(".gif") and os.path.getsize(out) > 0

    def test_version_flag_exits(self):
        import pytest
        with pytest.raises(SystemExit) as e:
            cli.process_cli_args(["--version"])
        assert e.value.code == 0

    def test_blob_log_multi_sharded_matches_unsharded(self):
        """Thresholds sharded over a dp mesh (GSPMD over the vmap
        axis) must reproduce the single-device sweep, including the
        pad-to-mesh-multiple path (5 thresholds on 4 devices)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from magellanmapper_tpu.cv import detector
        rng2 = np.random.default_rng(7)
        vol = np.zeros((20, 24, 24), np.float32)
        for z, y, x in rng2.integers(5, 18, (10, 3)):
            zz, yy, xx = np.ogrid[:20, :24, :24]
            vol += np.exp(-((zz - z) ** 2 + (yy - y) ** 2
                            + (xx - x) ** 2) / 6.0)
        vol = np.clip(vol, 0, None) / vol.max()
        sigmas = tuple(np.linspace(1.5, 3.0, 3))
        thresholds = [0.05, 0.1, 0.2, 0.35, 0.6]   # 5 on 4 devices
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        raws_s, valids_s = detector.blob_log_multi_sharded(
            jnp.asarray(vol), sigmas, thresholds, 0.5, 128, mesh)
        assert raws_s.shape == (5, 128, 4)
        raws, valids = detector.blob_log_multi(
            jnp.asarray(vol), sigmas, np.asarray(thresholds), 0.5,
            128)
        for k in range(len(thresholds)):
            a = raws_s[k][valids_s[k]]
            b = np.asarray(raws[k])[np.asarray(valids[k])]
            np.testing.assert_allclose(
                np.sort(a, axis=0), np.sort(b, axis=0), atol=1e-5)

    def test_grid_search_mesh_matches_plain(self):
        """make_fn_detect_multi(mesh=...) produces the same grid-search
        frame as the unsharded batched path."""
        import jax
        from jax.sharding import Mesh
        from magellanmapper_tpu.settings.roi_prof import ROIProfile
        rng2 = np.random.default_rng(8)
        vol = np.zeros((16, 20, 20), np.float32)
        for z, y, x in rng2.integers(4, 14, (6, 3)):
            zz, yy, xx = np.ogrid[:16, :20, :20]
            vol += np.exp(-((zz - z) ** 2 + (yy - y) ** 2
                            + (xx - x) ** 2) / 5.0)
        vol = np.clip(vol, 0, None) / vol.max()
        prof = ROIProfile()
        prof["min_sigma_factor"] = 1.5
        prof["max_sigma_factor"] = 3.0
        prof["num_sigma"] = 3
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        fn_plain = mlearn.make_fn_detect_multi(vol, (1.0,) * 3, prof)
        fn_mesh = mlearn.make_fn_detect_multi(
            vol, (1.0,) * 3, prof, mesh=mesh)
        a = fn_plain({}, [0.05, 0.2, 0.5])
        b = fn_mesh({}, [0.05, 0.2, 0.5])
        assert len(a) == len(b) == 3
        for pa, pb in zip(a, b):
            if pa is None or pb is None:
                assert pa is None and pb is None
                continue
            np.testing.assert_allclose(
                np.sort(pa, axis=0), np.sort(pb, axis=0), atol=1e-5)
