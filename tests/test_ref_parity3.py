"""Reference-parity surfaces, third wave: libmag/df_io tails, sqlite
module-level API, importer multipage flow, plot_support/plot_3d tails,
chunking mp plumbing."""

import os
import sqlite3

import numpy as np
import pandas as pd
import pytest


class TestLibmagTail:
    def test_strings(self):
        from magellanmapper_tpu.utils import libmag as lm
        assert lm.series_as_str(3) == "00003"
        assert lm.splice_before("brain.npy", ".npy", "_x") \
            == "brain_x.npy"
        assert lm.str_to_disp(" my_label ") == "my label"
        assert lm.make_acronym("Central nucleus of the amygdala") == "Cna"
        assert lm.make_acronym("cortex") == "cor"
        cropped = lm.crop_mid_str(
            ["abcdefghijklmnop", "abcdefghijklmnXp"], 8)
        assert cropped[0] != cropped[1] and "..." in cropped[0]

    def test_numbers(self):
        from magellanmapper_tpu.utils import libmag as lm
        assert lm.format_num(3.14159, 2) == "3.1"
        assert lm.format_num("abc") == "abc"
        assert lm.format_num(4.0) == "4"
        assert lm.truncate_decimal_digit(3.0000000000000004) == 3.0
        assert lm.convert_bin_magnitude(1024 ** 3, 3) == 1.0
        assert lm.compact_float(2.0) == 2
        assert lm.compact_float(2.56, 1) == 2.6
        assert lm.is_nan(float("nan")) and not lm.is_nan("x")

    def test_indexing_and_enums(self):
        from enum import Enum
        from magellanmapper_tpu.utils import libmag as lm
        idx = lm.coords_for_indexing(np.array([[1, 2], [3, 4]]))
        arr = np.arange(25).reshape(5, 5)
        assert list(arr[tuple(idx)].ravel()) == [7, 19]
        assert lm.scale_slice(slice(2, 10, 2), 0.5) == slice(1, 5, 1)
        assert lm.get_if_within((1, 2, 3), 1) == 2

        class E(Enum):
            A = 1
            B = 2
        assert lm.get_enum("b", E) is E.B
        assert lm.enum_names_aslist(E) == ["A", "B"]
        d = {}
        lm.add_missing_keys({"a": 1}, d)
        assert d == {"a": 1}


class TestDfIoTail:
    def test_pivot_filter_replace(self):
        from magellanmapper_tpu.io import df_io
        df = pd.DataFrame({
            "Sample": ["a", "a", "b", "b"],
            "Cond": ["c1", "c2", "c1", "c2"],
            "Vol": [1.0, 2, 3, 4]})
        piv, cols = df_io.pivot_with_conditions(
            df, "Sample", "Cond", "Vol")
        assert cols == ["c1", "c2"] and piv.loc["b", "c2"] == 4
        cat, parts = df_io.filter_dfs_on_vals(
            [df, df], None, [("Cond", "c1"), ("Cond", "c2")])
        assert len(cat) == 4
        out = df_io.replace_vals(df, "c1", "z", "Cond")
        assert set(out["Cond"]) == {"z", "c2"}


class TestSqliteModuleApi:
    def test_conn_cur_wrappers(self, tmp_path):
        from magellanmapper_tpu.io import sqlite as sq
        db = sq.load_db(str(tmp_path / "t.db"))
        exp = sq.insert_experiment(db.conn, db.cur, "e2")
        rid, _ = sq.insert_roi(
            db.conn, db.cur, exp, 0, (1, 2, 3), (4, 5, 6))
        roi = sq.select_roi(db.cur, rid)
        assert sq.get_roi_offset(roi) == (1, 2, 3)
        assert sq.get_roi_size(roi) == (4, 5, 6)
        sq.update_rois(db.conn, db.cur, (1, 1, 1), (0, 0, 0))
        assert sq.get_roi_offset(sq.select_roi(db.cur, rid)) == (0, 1, 2)
        assert len(sq.select_rois(db.cur)) == 1
        assert sq.select_about(db.conn, db.cur)[0]["version"] \
            == sq.DB_VERSION
        db.insert_blobs(rid, np.array([[1.0, 2, 3, 2]]))
        db.cur.execute("DELETE FROM rois")
        db.conn.commit()
        assert sq.clean_up_blobs(db) == 1
        db.close()


class TestImporterMultipage:
    def test_channel_grouped_import(self, tmp_path):
        from magellanmapper_tpu.io import importer, tiff
        for c in (0, 1):
            tiff.write_tiff(
                str(tmp_path / f"img{importer.CHANNEL_SEPARATOR}{c}.tif"),
                np.full((3, 4, 4), c, np.float32))
        chl_paths, prefix = importer.setup_import_multipage(
            str(tmp_path / f"img{importer.CHANNEL_SEPARATOR}0.tif"))
        assert sorted(chl_paths) == [0, 1]
        md = importer.setup_import_metadata(chl_paths)
        assert md["shape"] == (1, 3, 4, 4, 2)
        img5d = importer.import_multiplane_images(
            chl_paths, str(tmp_path / "img"))
        assert img5d.img.shape == (1, 3, 4, 4, 2)
        assert (np.asarray(img5d.img[0, ..., 1]) == 1).all()
        sizes = importer.find_sizes(
            str(tmp_path / f"img{importer.CHANNEL_SEPARATOR}0.tif"))
        assert sizes[0] == (1, 3, 4, 4, 1)

    def test_jvm_gated_and_scaling(self):
        from magellanmapper_tpu.io import importer
        assert not importer.is_javabridge_loaded()
        with pytest.raises(ImportError, match="javabridge"):
            importer.start_jvm()
        np.testing.assert_allclose(importer.calc_scaling(
            None, None, (1, 10, 20, 20), (1, 5, 10, 10)), 0.5)
        mins, maxs = [], []
        importer.calc_near_intensity_bounds(
            mins, maxs, [[1, 2], [0, 3]], [[9, 8], [7, 10]])
        assert mins == [0, 2] and maxs == [9, 10]
        assert importer.roi_to_image5d(
            np.zeros((2, 3, 3))).shape == (1, 2, 3, 3)


class TestPlotTail:
    def test_plane_axis_titles_spans(self):
        import matplotlib
        matplotlib.use("Agg")
        from magellanmapper_tpu.plot import plot_support as ps
        assert ps.get_plane_axis("xz") == "y"
        assert ps.get_plane_axis("yz", True) == 2
        fig, gs = ps.setup_fig(2, 2)
        ax = fig.add_subplot(gs[0, 0])
        ps.set_overview_title(ax, "xy", 5)
        assert ax.get_title() == "z=5"
        df = pd.DataFrame({"g": ["a", "a", "b", "b", "c"]})
        spans, labels = ps.setup_vspans(df, "g")
        assert list(spans) == [0, 2, 4] and labels == ["a", "b", "c"]
        out = ps.setup_images_for_plane("xz", [np.zeros((2, 3, 4))])
        assert out[0].shape == (3, 2, 4)

    def test_voxel_surface_mesh(self):
        from magellanmapper_tpu.plot import plot_3d as p3
        seg = np.zeros((4, 4, 4), np.int32)
        seg[1:3, 1:3, 1:3] = 7
        meshes = p3.show_surface_labels(seg)
        assert len(meshes) == 1
        lid, verts, faces = meshes[0]
        # 2x2x2 voxel cube: 24 exposed unit faces -> 48 triangles
        assert lid == 7 and len(faces) == 48
        # all faces index valid vertices
        assert faces.max() < len(verts)


class TestChunkingMp:
    def test_shared_arrays_roundtrip(self):
        from magellanmapper_tpu.cv import chunking
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        chunking.SharedArrsContainer.to_shared("x", arr)
        back = chunking.SharedArrsContainer.from_shared("x")
        np.testing.assert_array_equal(back, arr)
        assert chunking.set_mp_start_method() in (
            "spawn", "fork", "forkserver")
        assert isinstance(chunking.is_fork(), bool)


class TestAuxSubsystems:
    def test_meta_version_migration(self, tmp_path, rng):
        from magellanmapper_tpu.io import np_io, yaml_io
        arr = rng.random((1, 4, 8, 8)).astype(np.float32)
        base = str(tmp_path / "old")
        np_io.write_npy(base, arr)
        # rewrite the metadata as an old version missing newer keys
        _, path_meta = np_io.make_filenames(base)
        meta, ver = np_io.load_metadata(path_meta)
        old = {"ver": 10, "names": meta.get("names"),
               "sizes": meta.get("sizes"),
               "resolutions": meta.get("resolutions")}
        yaml_io.save_yaml(path_meta, old)
        img5d = np_io.read_file(base)
        assert img5d.meta["ver"] == np_io.IMAGE5D_NP_VER
        assert "scaling" in img5d.meta and "plane" in img5d.meta

    def test_profiler_throughput(self):
        from magellanmapper_tpu.utils import profiler
        t = profiler.Throughput()
        t.start()
        rate = t.stop(2_000_000)
        assert rate > 0
        s = t.summary()
        assert s["blocks"] == 1 and s["voxels"] == 2_000_000
        import jax.numpy as jnp
        with profiler.annotate("unit"):
            float(jnp.ones(8).sum())
