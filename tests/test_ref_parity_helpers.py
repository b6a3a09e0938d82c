"""Reference-parity utility helpers added across libmag/df_io/cv_nd/
ontology/detector/sqlite/np_io (function-level parity with
magmap equivalents)."""

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.utils import libmag


class TestLibmagHelpers:
    def test_swap_roll_transpose(self):
        assert libmag.swap_elements((1, 2, 3), 0, 2) == (3, 2, 1)
        assert libmag.swap_elements([1, 2, 3], 0, 1) == [2, 1, 3]
        assert libmag.roll_elements((1, 2, 3), 1) == (3, 1, 2)
        # z,y,x -> plane orders and back
        zyx = (10, 20, 30)
        for plane in ("xy", "xz", "yz"):
            out = libmag.transpose_1d(zyx, plane)
            assert libmag.transpose_1d_rev(out, plane) == zyx
        assert libmag.transpose_1d(zyx, "xz") == (20, 10, 30)

    def test_seq_utils(self):
        np.testing.assert_array_equal(
            libmag.replace_seq([1, 2, 3, 4], [9, 9]), [9, 9, 3, 4])
        out = libmag.combine_arrs(
            [np.array([1, 2]), None, np.array([3])])
        np.testing.assert_array_equal(out, [1, 2, 3])
        assert libmag.combine_arrs([None, None]) is None
        assert list(libmag.flatten([1, [2, [3, 4]], 5])) == [1, 2, 3, 4, 5]

    def test_path_utils(self):
        assert libmag.match_ext("a.mhd", "b.nii") == "b.mhd"
        assert libmag.match_ext("noext", "b.nii") == "b.nii"
        assert libmag.make_out_path("/d/a.csv", suffix="_x") \
            == "/d/a_x.csv"
        assert libmag.make_out_path("/d/a.csv", prefix="/e/b.csv") \
            == "/e/b.csv"

    def test_numeric_utils(self):
        assert libmag.get_int("5") == 5
        assert libmag.get_int("5.5") == 5.5
        assert libmag.get_int("x") == "x"
        assert libmag.is_int(4.0) and not libmag.is_int(4.5)
        assert libmag.is_number("3.2") and not libmag.is_number("z")


class TestDfIoHelpers:
    def test_weighted_stats(self):
        from magellanmapper_tpu.io import df_io
        vals = np.array([1.0, 3.0, np.nan])
        wts = np.array([1.0, 3.0, 10.0])
        assert df_io.weight_mean(vals, wts) == pytest.approx(2.5)
        std, mean = df_io.weight_std(vals, wts)
        assert mean == pytest.approx(2.5)
        assert std == pytest.approx(np.sqrt((1.5**2 + 3*0.5**2) / 4))

    def test_df_arith(self):
        from magellanmapper_tpu.io import df_io
        a = pd.DataFrame({"x": [2.0, 4.0]})
        b = pd.DataFrame({"x": [1.0, 2.0]})
        np.testing.assert_array_equal(
            df_io.df_div(a, b)["x"], [2.0, 2.0])
        np.testing.assert_array_equal(
            df_io.df_add(a, b)["x"], [3.0, 6.0])
        np.testing.assert_array_equal(
            df_io.df_subtract(a, b)["x"], [1.0, 2.0])
        df_io.func_to_paired_cols(a, "x", "x", np.multiply, "sq")
        np.testing.assert_array_equal(a["sq"], [4.0, 16.0])

    def test_cond_to_cols_and_coefvar(self):
        from magellanmapper_tpu.io import df_io
        df = pd.DataFrame({
            "Region": [1, 1, 2, 2],
            "Condition": ["ctl", "exp", "ctl", "exp"],
            "Vol": [10.0, 12.0, 20.0, 16.0]})
        out = df_io.cond_to_cols_df(
            df, ["Region"], "Condition", "ctl", ["Vol"])
        assert list(out.columns) == ["Region", "Vol_ctl", "Vol_exp"]
        assert out.loc[out.Region == 2, "Vol_exp"].iloc[0] == 16.0
        cv = df_io.coefvar_df(df, ["Region"], ["Vol"])
        assert cv.loc[cv.Region == 1, "Vol"].iloc[0] == pytest.approx(
            np.std([10, 12]) / 11.0)

    def test_append_and_add_cols(self):
        from magellanmapper_tpu.io import df_io
        a = pd.DataFrame({"s": ["x", "y"], "v": [1, 2]})
        b = pd.DataFrame({"v": [3, 4]})
        out = df_io.append_cols(
            [a, b], ["A", "B"], data_cols=["v"], extra_cols=["s"])
        assert list(out.columns) == ["s", "A.v", "B.v"]
        df_io.add_cols_df(a, {"k": 0})
        assert (a["k"] == 0).all()

    def test_exps_by_regions(self, tmp_path):
        from magellanmapper_tpu.io import df_io
        df = pd.DataFrame({
            "Sample": ["s1-a", "s1-a", "s2-b"],
            "Region": [1, 2, 1],
            "Volume": [5.0, 0.0, 7.0],
            "Nuclei": [50, 0, 70]})
        p = tmp_path / "vols.csv"
        df.to_csv(p, index=False)
        out = df_io.exps_by_regions(str(p))
        assert set(out) == {"Volume", "Nuclei"}
        piv = out["Volume"]
        assert list(piv.columns) == ["s1", "s2"]
        assert 2 not in piv.index          # zero row filtered


class TestCvNdHelpers:
    def test_rotate90_and_region_meas(self):
        from magellanmapper_tpu.cv import cv_nd
        img = np.arange(24).reshape(2, 3, 4)
        assert cv_nd.rotate90(img, 1).shape == (2, 4, 3)
        assert cv_nd.rotate90(img, 2).shape == (2, 3, 4)
        assert cv_nd.rotate90(None, 1) is None
        mc = np.zeros((2, 3, 4, 2))
        assert cv_nd.rotate90(mc, 1, multichannel=True).shape \
            == (2, 4, 3, 2)
        labels = np.zeros((6, 8, 8), np.int32)
        labels[1:4, 2:6, 2:5] = 3
        reg, sl = cv_nd.extract_region(labels, 3)
        assert reg.shape == (3, 4, 3)
        meas, vol, props = cv_nd.meas_region(labels == 3, (2, 1, 1))
        np.testing.assert_array_equal(meas, [6, 4, 3])
        assert vol == 3 * 4 * 3 * 2.0
        assert props[0].centroid[0] == pytest.approx(2.0)

    def test_compactness(self):
        from magellanmapper_tpu.cv import cv_nd
        # 2D square, boundary ring as the borders mask
        obj = np.ones((4, 4), bool)
        borders = np.zeros((4, 4), bool)
        borders[[0, -1], :] = True
        borders[:, [0, -1]] = True
        compact, nb, no = cv_nd.compactness_count(borders, obj)
        assert (nb, no) == (12, 16)
        assert compact == pytest.approx(12 ** 2 / 16)
        assert np.isnan(cv_nd.calc_compactness(3, 10, 0))

    def test_radial_dist_diff(self):
        from magellanmapper_tpu.cv import cv_nd
        borders = np.zeros((5, 5), bool)
        borders[0, 2] = True
        m = cv_nd.radial_dist_map(borders, (2, 2))
        assert m[0, 2] == pytest.approx(2.0)
        shifted = np.zeros((5, 5))
        shifted[0, 2] = 3.0
        idx = np.indices(borders.shape)
        diff = cv_nd.radial_dist_diff(m, shifted, idx)
        assert diff[0, 2] == pytest.approx(1.0)

    def test_remove_bg_from_dil_fg(self):
        from magellanmapper_tpu.cv import cv_nd
        from magellanmapper_tpu.ops import filters
        img = np.ones((5, 5, 5), np.float32)
        mask = np.zeros((5, 5, 5), bool)
        mask[2, 2, 2] = True
        cv_nd.remove_bg_from_dil_fg(
            img, mask, filters.octahedron_footprint(1))
        assert img[2, 2, 2] == 1 and img[2, 2, 3] == 1
        assert img[0, 0, 0] == 0


class TestOntologyHelpers:
    def _lookup(self):
        from magellanmapper_tpu.atlas import ontology as o
        root = {o.ABA_ID: 1, o.ABA_NAME: "root", o.ABA_LEVEL: 0,
                o.ABA_CHILDREN: [
                    {o.ABA_ID: 2, o.ABA_NAME: "ctx", o.ABA_LEVEL: 1,
                     o.ABA_CHILDREN: []}]}
        ref = o.LabelsRef()
        ref.loaded_ref = root
        return o, ref.create_ref_lookup()

    def test_get_label_levels(self):
        o, lookup = self._lookup()
        img = np.zeros((4, 4, 4), int)
        img[2:, 2:, 2:] = 2
        lab = o.get_label((3, 3, 3), img, lookup)
        assert o.get_label_item(lab, o.ABA_NAME) == "ctx"
        lab0 = o.get_label((3, 3, 3), img, lookup, level=0)
        assert o.get_label_item(lab0, o.ABA_NAME) == "root"
        # scaled coordinate lookup
        lab_s = o.get_label((6, 6, 6), img, lookup, scaling=(0.5,) * 3)
        assert o.get_label_item(lab_s, o.ABA_NAME) == "ctx"
        assert o.get_label_item(None, o.ABA_NAME) is None

    def test_region_middle_and_children_df(self):
        o, lookup = self._lookup()
        img = np.zeros((6, 6, 6), int)
        img[1:5, 1:5, 1:5] = 2
        mid, mask, scaled = o.get_region_middle(lookup, 2, img)
        assert mask[mid]
        assert img[mid] == 2
        df = pd.DataFrame(
            {"Region": [1, 2, 3], "Parent": [np.nan, 1, 2]})
        assert o.get_children_from_id_df(df, 1) == [1, 2, 3]

    def test_rel_to_abs_ages(self):
        o, _ = self._lookup()
        ages = o.rel_to_abs_ages(["E11.5", "P0"], gestation=19)
        assert ages["E11.5"] == 11.5
        assert ages["P0"] == 19.0


class TestDetectorHelpers:
    def test_remove_close_within_array(self):
        from magellanmapper_tpu.cv import detector
        blobs = np.array(
            [[5.0, 5, 5, 2], [5, 5, 6, 2], [20, 20, 20, 2]])
        kept = detector.remove_close_blobs_within_array(
            blobs, slice(0, 3), (2, 2, 2))
        assert len(kept) == 2
        assert detector.remove_close_blobs_within_array(
            None, slice(0, 3), (1, 1, 1)) is None

    def test_pruning_ratio_and_surroundings(self):
        from magellanmapper_tpu.cv import detector
        assert detector.meas_pruning_ratio(10, 6, 8) == (10, 0.6, 0.75)
        assert detector.meas_pruning_ratio(0, 0, 5) is None
        roi = np.arange(1000, dtype=float).reshape(10, 10, 10)
        sur = detector.blob_surroundings(
            np.array([5.0, 5, 5, 1]), roi, 1)
        assert sur.shape == (4, 4, 4)


class TestSqliteHelpers:
    def test_roi_queries_and_upgrade(self, tmp_path):
        import sqlite3
        from magellanmapper_tpu.io import sqlite as sq
        db = sq.load_db(str(tmp_path / "t.db"))
        assert db.db_version() == sq.DB_VERSION
        exp = db.select_or_insert_experiment("e")
        rid, _ = db.select_or_insert_roi(exp, 0, (5, 6, 7), (10, 11, 12))
        roi = db.select_roi(rid)
        assert db.get_roi_offset(roi) == (5, 6, 7)
        db.update_rois((1, 1, 1), (2, 2, 2))
        assert db.get_roi_size(db.select_roi(rid)) == (12, 13, 14)
        # v1-style legacy db upgrades to current schema
        old_path = str(tmp_path / "old.db")
        conn = sqlite3.connect(old_path)
        cur = conn.cursor()
        cur.execute(
            "CREATE TABLE blobs (id INTEGER PRIMARY KEY, roi_id INTEGER, "
            "x INTEGER, y INTEGER, z INTEGER, radius REAL, "
            "confirmed INTEGER, truth INTEGER)")
        conn.commit()
        conn.close()
        old = sq.ClrDB(old_path).load_db()
        assert old.upgrade_db() == sq.DB_VERSION
        cols = [r[1] for r in old.cur.execute("PRAGMA table_info(blobs)")]
        assert "channel" in cols

    def test_exp_name_and_match_elements(self):
        from magellanmapper_tpu.io import sqlite as sq
        assert sq.get_exp_name("/a/brain_(1,2,3)x(4,5,6).npy") == "brain"
        assert sq.match_elements("a,b", ",", "x") == "x,x"


class TestNpIoHelpers:
    def test_raw_tif_roundtrip(self, tmp_path):
        from magellanmapper_tpu.io import np_io, tiff
        a = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
        p = np_io.write_raw_file(a, str(tmp_path / "x.raw"))
        np.testing.assert_array_equal(
            np.fromfile(p, np.uint16).reshape(2, 3, 4), a)
        tp = np_io.write_tif(a.astype(np.float32), str(tmp_path / "y.tif"))
        np.testing.assert_array_equal(
            tiff.read_tiff(tp), a.astype(np.float32))

    def test_channel_and_shape_utils(self):
        from magellanmapper_tpu.io import np_io
        assert np_io.get_num_channels(np.zeros((1, 2, 3, 4, 5))) == 5
        assert np_io.get_num_channels(np.zeros((1, 2, 3, 4))) == 1
        assert np_io.get_num_channels(np.zeros((2, 3, 4, 2)), True) == 2
        shp = np_io.fix_memmap_shape(np.array([2, 3], np.int64))
        assert shp == (2, 3) and all(type(s) is int for s in shp)

    def test_np_archive(self, tmp_path):
        from magellanmapper_tpu.io import np_io
        p = tmp_path / "z.npz"
        np.savez(p, q=np.arange(3))
        arch = np.load(str(p))
        out = np_io.read_np_archive(arch)
        np.testing.assert_array_equal(out["q"], [0, 1, 2])


class TestStackFacades:
    def test_detector_and_pruner_classes(self):
        from magellanmapper_tpu.cv import stack_detect as sd
        from magellanmapper_tpu.settings.roi_prof import ROIProfile
        assert sd.StackTimes.TOTAL.value == "Total_stack"
        rng = np.random.default_rng(3)
        vol = np.zeros((30, 40, 40), np.float32)
        zz, yy, xx = np.indices(vol.shape).astype(np.float32)
        for c in ((10, 10, 10), (20, 30, 30)):
            vol += np.exp(-((zz-c[0])**2 + (yy-c[1])**2 + (xx-c[2])**2)
                          / 12.0)
        vol += rng.normal(scale=0.01, size=vol.shape).astype(np.float32)
        vol = np.clip(vol, 0, None) / vol.max()
        prof = ROIProfile()
        prof["segment_size"] = 25
        prof["denoise_size"] = None
        prof["max_blobs_per_block"] = 256
        det = sd.StackDetector(vol, prof, (1.0, 1.0, 1.0))
        blobs, timing = det.detect_stack(preprocess=False)
        assert blobs is not None and len(blobs) >= 2
        assert sd.StackTimes.DETECTION.value in timing
