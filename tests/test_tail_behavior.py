"""Semantic behavior pins for long-tail reference surfaces.

Round-2 VERDICT item 4: surfaces previously covered only by the name
sweep get golden small-array in/out assertions following the reference's
documented behavior — df_io frame ops (``magmap/io/df_io.py:594-800``),
ontology level remap / traversal (``magmap/atlas/ontology.py:432-625``),
plot_2d task variants, and the module-level sqlite helpers.
"""

import os

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.atlas import ontology
from magellanmapper_tpu.io import df_io


class TestDfIOBehavior:
    @staticmethod
    def _frame():
        return pd.DataFrame({
            "Sample": ["a", "a", "b", "b"],
            "Condition": ["wt", "ko", "wt", "ko"],
            "Region": [1, 1, 1, 1],
            "Volume": [10.0, 20.0, 30.0, 40.0],
            "Nuclei": [1.0, 2.0, 3.0, 4.0],
        })

    def test_melt_cols_long_form(self):
        long = df_io.melt_cols(
            self._frame(), ["Sample", "Condition"],
            ["Volume", "Nuclei"], var_name="Metric", value_name="Val")
        assert len(long) == 8
        assert set(long["Metric"]) == {"Volume", "Nuclei"}
        row = long[(long.Sample == "b") & (long.Condition == "ko")
                   & (long.Metric == "Nuclei")]
        assert row["Val"].iloc[0] == 4.0

    def test_pivot_table_golden(self):
        wide = df_io.pivot_table(
            self._frame(), index="Sample", columns="Condition",
            values="Volume")
        assert list(wide["Sample"]) == ["a", "b"]
        assert wide.set_index("Sample").loc["a", "ko"] == 20.0
        assert wide.set_index("Sample").loc["b", "wt"] == 30.0

    def test_zscore_df_group_stats(self):
        df = pd.DataFrame({
            "g": ["x"] * 4 + ["y"] * 4,
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0]})
        z = df_io.zscore_df(df, ["g"], ["v"])
        for g in ("x", "y"):
            vals = z[z.g == g]["v"]
            assert vals.mean() == pytest.approx(0.0, abs=1e-12)
            assert vals.std() == pytest.approx(1.0)

    def test_normalize_df_baseline_is_one(self):
        norm = df_io.normalize_df(
            self._frame(), ["Sample"], "Condition", "wt", ["Volume"])
        base = norm[norm.Condition == "wt"]["Volume"]
        assert (base == 1.0).all()
        ko_a = norm[(norm.Sample == "a")
                    & (norm.Condition == "ko")]["Volume"].iloc[0]
        assert ko_a == pytest.approx(2.0)    # 20 / 10

    def test_df_arithmetic(self):
        d0 = pd.DataFrame({"v": [4.0, 9.0]})
        d1 = pd.DataFrame({"v": [2.0, 3.0]})
        assert list(df_io.df_div(d0, d1)["v"]) == [2.0, 3.0]
        assert list(df_io.df_add(d0, d1)["v"]) == [6.0, 12.0]
        assert list(df_io.df_subtract(d0, d1)["v"]) == [2.0, 6.0]

    def test_weight_mean_std(self):
        vals = np.array([1.0, 3.0])
        weights = np.array([1.0, 3.0])
        assert df_io.weight_mean(vals, weights) == pytest.approx(2.5)
        # weighted variance around the weighted mean; returns (std, mean)
        var = (1 * (1 - 2.5) ** 2 + 3 * (3 - 2.5) ** 2) / 4
        std, mean = df_io.weight_std(vals, weights)
        assert std == pytest.approx(np.sqrt(var))
        assert mean == pytest.approx(2.5)

    def test_cond_to_cols(self):
        out = df_io.cond_to_cols_df(
            self._frame(), ["Sample"], "Condition", "wt", ["Volume"])
        assert any("ko" in str(c) for c in out.columns)

    def test_replace_vals(self):
        df = pd.DataFrame({"v": [1, 2, 3]})
        out = df_io.replace_vals(df, [2], [99], cols=["v"])
        assert list(out["v"]) == [1, 99, 3]

    def test_join_and_merge(self, tmp_path):
        d0 = pd.DataFrame({"Region": [1, 2], "Volume": [5.0, 6.0]})
        d1 = pd.DataFrame({"Region": [1, 2], "Nuclei": [7.0, 8.0]})
        joined = df_io.join_dfs((d0, d1), "Region")
        assert set(joined.columns) >= {"Volume", "Nuclei"}
        p0, p1 = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
        d0.to_csv(p0, index=False)
        d1.to_csv(p1, index=False)
        merged = df_io.merge_csvs([p0, p1])
        assert len(merged) == 4


def _toy_lookup():
    """Minimal ABA-style lookup: 1 (level 0) -> 2 (level 1) -> 3/4
    (level 2), with mirrored negatives."""
    n3 = {ontology.ABA_ID: 3, ontology.ABA_LEVEL: 2,
          ontology.ABA_CHILDREN: []}
    n4 = {ontology.ABA_ID: 4, ontology.ABA_LEVEL: 2,
          ontology.ABA_CHILDREN: []}
    n2 = {ontology.ABA_ID: 2, ontology.ABA_LEVEL: 1,
          ontology.ABA_CHILDREN: [n3, n4]}
    n1 = {ontology.ABA_ID: 1, ontology.ABA_LEVEL: 0,
          ontology.ABA_CHILDREN: [n2]}
    lookup = {
        1: {ontology.NODE: n1, ontology.PARENT_IDS: []},
        2: {ontology.NODE: n2, ontology.PARENT_IDS: [1]},
        3: {ontology.NODE: n3, ontology.PARENT_IDS: [1, 2]},
        4: {ontology.NODE: n4, ontology.PARENT_IDS: [1, 2]},
    }
    for lid in (1, 2, 3, 4):
        lookup[-lid] = lookup[lid]
    return lookup


class TestOntologyBehavior:
    def test_labels_to_parent_level(self):
        mapping = ontology.labels_to_parent(_toy_lookup(), 1)
        assert mapping[3] == 2 and mapping[4] == 2
        assert mapping[2] == 2        # already at level
        assert mapping[1] == 1        # above level untouched

    def test_make_labels_level_collapses(self):
        img = np.array([[0, 3, 4], [2, 1, 3]], np.int32)
        out = ontology.make_labels_level(img, _toy_lookup(), 1)
        np.testing.assert_array_equal(
            out, np.array([[0, 2, 2], [2, 1, 2]]))

    def test_make_labels_level_mirrored_negatives(self):
        img = np.array([-3, -4, 3], np.int32)
        out = ontology.make_labels_level(img, _toy_lookup(), 1)
        # negative (contralateral) labels collapse to negative parents
        assert out[2] == 2
        assert set(np.abs(out[:2])) == {2}

    def test_get_children_both_sides(self):
        kids = ontology.get_children_from_id(
            _toy_lookup(), 2, incl_parent=False, both_sides=True)
        assert set(kids) == {3, 4, -3, -4}

    def test_get_children_negative_parent(self):
        kids = ontology.get_children_from_id(_toy_lookup(), -2)
        assert set(kids) == {-2, -3, -4}

    def test_scale_coords_clips(self):
        coords = np.array([[9.0, 9.0, 9.0], [0.2, 0.2, 0.2]])
        out = ontology.scale_coords(coords, (2.0, 2.0, 2.0), (10, 10, 10))
        np.testing.assert_array_equal(out[0], (9, 9, 9))
        np.testing.assert_array_equal(out[1], (0, 0, 0))

    def test_label_ids_from_position(self):
        labels = np.zeros((4, 4, 4), np.int32)
        labels[1, 2, 3] = 7
        ids = ontology.get_label_ids_from_position(
            np.array([[1, 2, 3], [0, 0, 0]]), labels)
        np.testing.assert_array_equal(ids, (7, 0))

    def test_get_label_side(self):
        assert ontology.get_label_side(5) != ontology.get_label_side(-5)

    def test_replace_labels_frame(self):
        img = np.array([1, 2, 3], np.int32)
        df = pd.DataFrame({"Region": [2], "RegionTo": [9]})
        out = ontology.replace_labels(img, df)
        np.testing.assert_array_equal(out, (1, 9, 3))


class TestPlot2DVariants:
    @staticmethod
    def _df():
        return pd.DataFrame({
            "Sample": list("abcdef"),
            "Condition": ["wt", "wt", "wt", "ko", "ko", "ko"],
            "Volume": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})

    def test_histogram_writes_figure(self, tmp_path):
        from magellanmapper_tpu.plot import plot_2d
        path = str(tmp_path / "hist.png")
        plot_2d.plot_histogram(self._df(), col="Volume", path=path)
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_swarm_writes_figure(self, tmp_path):
        from magellanmapper_tpu.plot import plot_2d
        path = str(tmp_path / "swarm.png")
        plot_2d.plot_swarm(self._df(), "Condition", "Volume", path=path)
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_catplot_writes_figure(self, tmp_path):
        from magellanmapper_tpu.plot import plot_2d
        path = str(tmp_path / "cat.png")
        plot_2d.plot_catplot(
            self._df(), "Condition", "Volume", out_path=path)
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_probability_plot_series(self):
        from magellanmapper_tpu.plot import plot_2d
        df = pd.DataFrame({
            "Region": [1, 1, 2, 2],
            "Condition": ["wt", "ko", "wt", "ko"],
            "Volume": [1.0, 2.0, 3.0, 4.0],
            "Size": [5.0, 5.0, 9.0, 9.0]})
        fig = plot_2d.plot_probability(
            df, ("wt", "ko"), ["Volume"], "Size")
        labels = [t.get_text() for t in fig.axes[0].get_legend().texts]
        assert labels == ["Volume:wt", "Volume:ko"]


class TestSqliteModuleHelpers:
    """Module-level (conn, cur) helpers matching the reference's
    functional sqlite API (``magmap/io/sqlite.py:270-454``)."""

    @staticmethod
    def _db(tmp_path):
        from magellanmapper_tpu.io import sqlite as sq
        db = sq.ClrDB(str(tmp_path / "t.db")).load_db()
        exp_id = db.select_or_insert_experiment("exp")
        return sq, db, exp_id

    def test_roi_blob_roundtrip(self, tmp_path):
        sq, db, exp_id = self._db(tmp_path)
        roi_id, state = sq.select_or_insert_roi(
            db.conn, db.cur, exp_id, 0, (0, 0, 0), (10, 10, 10))
        assert state == "inserted"
        again, state2 = sq.select_or_insert_roi(
            db.conn, db.cur, exp_id, 0, (0, 0, 0), (10, 10, 10))
        assert again == roi_id and state2 == "exists"
        blobs = np.array([[1, 2, 3, 4.0, 1, -1, 0],
                          [4, 5, 6, 4.0, 0, -1, 0]])
        assert sq.insert_blobs(db.conn, db.cur, roi_id, blobs) == 2
        confirmed = sq.select_blobs_confirmed(db.cur, 1)
        assert confirmed.shape[0] == 1
        np.testing.assert_array_equal(confirmed[0, :3], (1, 2, 3))
        deleted = sq.delete_blobs(db.conn, db.cur, roi_id, blobs[:1])
        assert deleted == 1

    def test_verification_stats(self, tmp_path):
        sq, db, exp_id = self._db(tmp_path)
        roi_id, _ = sq.select_or_insert_roi(
            db.conn, db.cur, exp_id, 0, (0, 0, 0), (10, 10, 10))
        # truth >= 0 rows are positives; confirmed=1/truth=-1 detected
        blobs = np.array([
            [1, 1, 1, 3.0, 1, -1, 0],     # detected true pos
            [2, 2, 2, 3.0, 1, 1, 0],      # truth blob
            [3, 3, 3, 3.0, 0, -1, 0],     # false pos
        ])
        sq.insert_blobs(db.conn, db.cur, roi_id, blobs)
        sens, ppv, msg = sq.verification_stats(db, "exp")
        assert sens is not None and 0 <= sens <= 1
        assert ppv is not None and 0 <= ppv <= 1
