"""Ontology + regional metrics tests."""

import json

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.atlas import ontology
from magellanmapper_tpu.stats import vols


@pytest.fixture
def aba_ref(tmp_path):
    """Tiny ABA-style ontology: root(1) -> [cortex(2) -> [l1(4), l2(5)],
    thalamus(3)]."""
    tree = {"msg": [{
        "id": 1, "name": "root", "acronym": "rt", "st_level": 0,
        "parent_structure_id": None,
        "children": [
            {"id": 2, "name": "cortex", "acronym": "cx", "st_level": 1,
             "parent_structure_id": 1, "children": [
                 {"id": 4, "name": "layer1", "acronym": "l1",
                  "st_level": 2, "parent_structure_id": 2, "children": []},
                 {"id": 5, "name": "layer2", "acronym": "l2",
                  "st_level": 2, "parent_structure_id": 2, "children": []},
             ]},
            {"id": 3, "name": "thalamus", "acronym": "th", "st_level": 1,
             "parent_structure_id": 1, "children": []},
        ]}]}
    path = tmp_path / "ref.json"
    path.write_text(json.dumps(tree))
    return ontology.LabelsRef(str(path)).load()


class TestOntology:
    def test_lookup_and_names(self, aba_ref):
        lk = aba_ref.ref_lookup
        assert ontology.get_label_name(lk[2]) == "cortex"
        assert lk[4][ontology.PARENT_IDS] == [1, 2]
        # mirrored negative IDs present
        assert ontology.get_label_name(lk[-4], side=True).endswith("(L)")

    def test_children(self, aba_ref):
        kids = ontology.get_children_from_id(aba_ref.ref_lookup, 2)
        assert kids == [2, 4, 5]
        kids_neg = ontology.get_children_from_id(aba_ref.ref_lookup, -2)
        assert kids_neg == [-2, -4, -5]

    def test_make_labels_level(self, aba_ref):
        img = np.array([[[4, 5, 3, 0]]])
        out = ontology.make_labels_level(img, aba_ref.ref_lookup, 1)
        np.testing.assert_array_equal(out, [[[2, 2, 3, 0]]])

    def test_scale_and_position(self):
        coords = np.array([[2.0, 4.0, 6.0]])
        scaled = ontology.scale_coords(coords, (0.5, 0.5, 0.5), (10, 10, 10))
        np.testing.assert_array_equal(scaled, [[1, 2, 3]])
        labels = np.zeros((10, 10, 10), int)
        labels[1, 2, 3] = 42
        ids = ontology.get_label_ids_from_position(scaled, labels)
        assert ids[0] == 42

    def test_replace_labels(self):
        img = np.array([[[1, 2, 2, 3]]])
        df = pd.DataFrame({"Region": [2], "RegionTo": [9]})
        out = ontology.replace_labels(img, df)
        np.testing.assert_array_equal(out, [[[1, 9, 9, 3]]])


class TestVols:
    def _setup(self):
        labels = np.zeros((10, 10, 10), np.int32)
        labels[:, :5] = 2
        labels[:, 5:] = -2  # contralateral of region 2
        atlas = np.ones((10, 10, 10), np.float32)
        atlas[:, 5:] = 3.0
        heat = np.zeros((10, 10, 10), np.int32)
        heat[2, 2, 2] = 5
        heat[2, 7, 2] = 1
        return atlas, labels, heat

    def test_basic_metrics_combined(self):
        atlas, labels, heat = self._setup()
        df = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, spacing=(2.0, 1.0, 1.0),
            combine_sides=True)
        assert len(df) == 1
        row = df.iloc[0]
        assert row["Region"] == 2
        assert row["VolPx"] == 1000
        assert row["Volume"] == 2000.0
        assert row["Nuclei"] == 6
        assert row["Density"] == pytest.approx(6 / 2000)
        assert row["MeanIntensity"] == pytest.approx(2.0)

    def test_split_sides(self):
        atlas, labels, heat = self._setup()
        df = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, combine_sides=False)
        assert set(df["Region"]) == {-2, 2}
        right = df[df.Region == 2].iloc[0]
        left = df[df.Region == -2].iloc[0]
        assert right["Nuclei"] == 5
        assert left["Nuclei"] == 1
        assert right["MeanIntensity"] == pytest.approx(1.0)
        assert left["MeanIntensity"] == pytest.approx(3.0)

    def test_edge_metrics(self):
        atlas, labels, heat = self._setup()
        edge = np.zeros(labels.shape, bool)
        edge[:, 4:6] = True
        dist = np.full(labels.shape, 2.0)
        df = vols.measure_labels_metrics(
            atlas, labels, labels_edge=edge, dist_to_orig=dist,
            combine_sides=True)
        row = df.iloc[0]
        assert row["EdgeSize"] == edge.sum()
        assert row["EdgeDistMean"] == pytest.approx(2.0)

    def test_overlap_dsc(self):
        labels1 = np.zeros((8, 8, 8), np.int32)
        labels1[:, :4] = 3
        labels2 = np.zeros((8, 8, 8), np.int32)
        labels2[:, 1:5] = 3
        df = vols.measure_label_overlap(labels1, labels2)
        assert df.iloc[0]["VolDSC"] == pytest.approx(2 * 3 / (4 + 4) / 1.0)

    def test_labels_distance(self):
        l1 = np.zeros((8, 8, 8), np.int32)
        l2 = np.zeros((8, 8, 8), np.int32)
        l1[2, 2, 2] = 1
        l2[2, 2, 6] = 1
        df = vols.labels_distance(l1, l2)
        assert df.iloc[0]["Dist"] == pytest.approx(4.0)

    def test_map_meas_to_labels(self):
        labels = np.array([[[1, 2, 0]]])
        df = pd.DataFrame({"Region": [1, 2], "Volume": [10.0, 20.0]})
        out = vols.map_meas_to_labels(labels, df, "Volume")
        np.testing.assert_allclose(out, [[[10.0, 20.0, 0.0]]])

    def test_level_aggregation(self, aba_ref=None):
        # labels at leaf level aggregate onto their parent at level 1
        import json
        # reuse the fixture-style ref inline
        labels = np.zeros((4, 4, 4), np.int32)
        labels[:2] = 4
        labels[2:] = 5
        lookup = {
            4: {ontology.NODE: {"id": 4, "st_level": 2, "name": "l1"},
                ontology.PARENT_IDS: [1, 2], ontology.MIRRORED: False},
            5: {ontology.NODE: {"id": 5, "st_level": 2, "name": "l2"},
                ontology.PARENT_IDS: [1, 2], ontology.MIRRORED: False},
            2: {ontology.NODE: {"id": 2, "st_level": 1, "name": "cx"},
                ontology.PARENT_IDS: [1], ontology.MIRRORED: False},
            1: {ontology.NODE: {"id": 1, "st_level": 0, "name": "root"},
                ontology.PARENT_IDS: [], ontology.MIRRORED: False},
        }
        ref = ontology.LabelsRef()
        ref.ref_lookup = lookup
        df = vols.measure_labels_metrics(
            None, labels, labels_ref=ref, level=1)
        assert set(df["Region"]) == {2}
        assert df.iloc[0]["VolPx"] == 64


def test_levels_aggregation_concat(aba_ref):
    labels = np.zeros((6, 6, 6), np.int32)
    labels[:3] = 4
    labels[3:] = 5
    df = vols.measure_labels_metrics_levels(
        None, labels, aba_ref, max_level=2)
    assert set(df["Level"]) == {0, 1, 2}
    # level 2 keeps leaves; level 1 collapses to cortex (2);
    # level 0 collapses to root (1)
    lvl2 = df[df.Level == 2]
    assert set(lvl2["Region"]) == {4, 5}
    lvl1 = df[df.Level == 1]
    assert set(lvl1["Region"]) == {2}
    assert lvl1.iloc[0]["VolPx"] == 216


class TestClusterMetricsInRegionalEngine:
    """Per-region point-cloud cluster columns (reference
    MeasureLabel.measure_point_cloud, vols.py:688 -> NucCluster /
    NucClusNoise / NucClusLarg in measure_labels_metrics)."""

    def test_cluster_columns_from_precomputed_ids(self):
        labels = np.full((8, 8, 8), 2, np.int32)
        # blob rows: z, y, x, label_id, cluster_id
        blobs = np.array([
            [1, 1, 1, 2, 0], [1, 1, 2, 2, 0], [1, 2, 1, 2, 0],
            [5, 5, 5, 2, 1], [5, 5, 6, 2, 1],
            [7, 0, 0, 2, -1],                      # noise
        ], float)
        df = vols.measure_labels_metrics(
            None, labels, blobs=blobs).set_index("Region")
        assert df.loc[2, "NucCluster"] == 2
        assert df.loc[2, "NucClusNoise"] == 1
        assert df.loc[2, "NucClusLarg"] == 3

    def test_cluster_columns_via_dbscan(self):
        """Without a cluster column the engine DBSCANs each region."""
        labels = np.zeros((16, 16, 16), np.int32)
        labels[:8] = 1
        labels[8:] = 2
        rng = np.random.default_rng(0)
        tight = rng.normal((4, 8, 8), 0.5, (12, 3))     # one dense cluster
        spread = rng.uniform(8, 15, (6, 3))             # sparse -> noise
        blobs = np.vstack([
            np.column_stack([tight, np.full(12, 1)]),
            np.column_stack([spread, np.full(6, 2)]),
        ])
        df = vols.measure_labels_metrics(
            None, labels, blobs=blobs, cluster_eps=2.0,
            cluster_minpts=4).set_index("Region")
        assert df.loc[1, "NucCluster"] == 1
        assert df.loc[1, "NucClusLarg"] == 12
        assert df.loc[2, "NucCluster"] == 0
        assert df.loc[2, "NucClusNoise"] == 6

    def test_no_blobs_leaves_nan(self):
        labels = np.full((4, 4, 4), 3, np.int32)
        df = vols.measure_labels_metrics(None, labels)
        assert np.isnan(df.iloc[0]["NucCluster"])


class TestShardedVols:
    """Mesh-sharded regional stats must match the single-device path."""

    @staticmethod
    def _mesh_1d(n=8):
        import jax
        from jax.sharding import Mesh
        return Mesh(np.asarray(jax.devices()[:n]), ("dp",))

    @staticmethod
    def _vol(shape=(9, 10, 11)):
        rng = np.random.default_rng(7)
        labels = rng.integers(-3, 4, shape).astype(np.int32)
        atlas = rng.random(shape).astype(np.float32) * 10
        heat = rng.integers(0, 4, shape).astype(np.int32)
        return atlas, labels, heat

    def test_parity_1d_mesh_with_padding(self):
        # 9*10*11 = 990 voxels is not divisible by 8 devices, so the
        # pad-to-segment-0 path is exercised
        atlas, labels, heat = self._vol()
        ref = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, spacing=(2.0, 1.0, 1.0))
        df = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, spacing=(2.0, 1.0, 1.0),
            mesh=self._mesh_1d())
        pd.testing.assert_frame_equal(df, ref, rtol=1e-5, atol=1e-6)

    def test_parity_3d_mesh_split_sides(self):
        from magellanmapper_tpu.parallel import mesh as mesh_mod
        atlas, labels, heat = self._vol((8, 8, 8))
        ref = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, combine_sides=False)
        df = vols.measure_labels_metrics(
            atlas, labels, heat_map=heat, combine_sides=False,
            mesh=mesh_mod.make_mesh(8, dp=2, sp=2, spy=2))
        pd.testing.assert_frame_equal(df, ref, rtol=1e-5, atol=1e-6)

    def test_volumes_by_id_forwards_mesh(self, tmp_path):
        from magellanmapper_tpu.atlas import register as register_mod
        from magellanmapper_tpu.io import sitk_io
        atlas, labels, _ = self._vol((8, 8, 8))
        base = str(tmp_path / "samp")
        sitk_io.write_registered_image(
            atlas, base, "atlasVolume.mhd", spacing=(1, 1, 1))
        sitk_io.write_registered_image(
            labels, base, "annotation.mhd", spacing=(1, 1, 1))
        ref = register_mod.volumes_by_id([base])
        df = register_mod.volumes_by_id([base], mesh=self._mesh_1d())
        pd.testing.assert_frame_equal(df, ref, rtol=1e-5, atol=1e-6)
