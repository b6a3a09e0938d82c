"""Plot layer + export_stack + cloud/labels_meta tests."""

import os

import numpy as np
import pandas as pd
import pytest

from magellanmapper_tpu.atlas.labels_meta import LabelsMeta
from magellanmapper_tpu.cloud import aws
from magellanmapper_tpu.io import export_stack
from magellanmapper_tpu.plot import colormaps, plot_2d, plot_support


class TestColormaps:
    def test_discrete_symmetric(self):
        cmap = colormaps.DiscreteColormap([-3, -1, 0, 1, 3])
        assert cmap.colors[1] == cmap.colors[-1]
        assert cmap.colors[0][3] == 0.0  # background transparent
        img = cmap(np.array([[0, 1], [-1, 3]]))
        assert img.shape == (2, 2, 4)
        np.testing.assert_allclose(img[0, 1], img[1, 0])

    def test_deterministic(self):
        a = colormaps.DiscreteColormap([1, 2, 3]).colors
        b = colormaps.DiscreteColormap([1, 2, 3]).colors
        assert a == b

    def test_channel_cmap(self):
        cm = colormaps.channel_colormap(0)
        assert cm(0.0)[:3] == pytest.approx((0, 0, 0), abs=0.01)


class TestPlotSupport:
    def test_overlay_multichannel(self):
        plane = np.zeros((8, 8, 2), np.float32)
        plane[:4, :, 0] = 1.0
        plane[4:, :, 1] = 1.0
        rgb = plot_support.overlay_images(plane)
        assert rgb.shape == (8, 8, 3)
        assert not np.allclose(rgb[0, 0], rgb[7, 7])

    def test_overlay_labels(self):
        plane = np.ones((6, 6), np.float32)
        labels = np.zeros((6, 6), int)
        labels[:3] = 5
        cmap = colormaps.DiscreteColormap([0, 5])
        rgb = plot_support.overlay_images(
            plane, labels_plane=labels, labels_cmap=cmap)
        assert not np.allclose(rgb[0, 0], rgb[5, 5])

    def test_transpose_and_downsample(self):
        arr = np.zeros((4, 8, 16))
        out = plot_support.transpose_images("xz", [arr])[0]
        assert out.shape == (8, 4, 16)
        assert plot_support.get_downsample_max_sizes((4, 3000, 2000)) == 3
        assert plot_support.get_downsample_max_sizes((4, 500, 500)) is None


class TestPlot2D:
    def test_roc_plot(self, tmp_path):
        df = pd.DataFrame({
            "detection_threshold": [0.1, 0.2], "POS": [10, 10],
            "TP": [9, 7], "FP": [3, 1], "FN": [1, 3],
            "FDR": [0.25, 0.125], "SENS": [0.9, 0.7], "PPV": [0.75, 0.875]})
        path = str(tmp_path / "roc.png")
        plot_2d.plot_roc(df, path)
        assert os.path.exists(path)

    def test_bar_line_scatter(self, tmp_path):
        df = pd.DataFrame({"Region": ["a", "b"], "Volume": [1.0, 2.0],
                           "Nuclei": [5, 9]})
        plot_2d.plot_bars(df, "Region", "Volume",
                          str(tmp_path / "bars.png"))
        plot_2d.plot_lines(df, "Volume", ["Nuclei"],
                           str(tmp_path / "lines.png"))
        plot_2d.plot_scatter(df, "Volume", "Nuclei",
                             path=str(tmp_path / "sc.png"))
        assert len(list(tmp_path.iterdir())) == 3


class TestExportStack:
    def test_export_planes(self, tmp_path, rng):
        vol = rng.random((1, 3, 16, 16)).astype(np.float32)
        paths = export_stack.export_planes(vol, str(tmp_path / "planes"))
        assert len(paths) == 3
        assert all(os.path.exists(p) for p in paths)

    def test_montage(self, tmp_path, rng):
        vol = rng.random((1, 5, 12, 12)).astype(np.float32)
        out = export_stack.stack_to_img(vol, str(tmp_path / "montage.png"))
        assert os.path.exists(out)

    def test_animation(self, tmp_path, rng):
        vol = rng.random((1, 3, 12, 12)).astype(np.float32)
        out = export_stack.animate_imgs(vol, str(tmp_path / "anim"))
        assert os.path.exists(out)

    def test_rotation_3d_animation(self, tmp_path):
        zz, yy, xx = np.indices((16, 16, 16)).astype(np.float32)
        r = np.sqrt((zz - 7.5) ** 2 + (yy - 7.5) ** 2 + (xx - 7.5) ** 2)
        vol = np.clip(1.0 - (r - 5.0) / 2.0, 0, 1).astype(np.float32)
        for mode in ("mip", "volume", "isosurface"):
            out = export_stack.animate_rotation_3d(
                vol, str(tmp_path / f"rot_{mode}.gif"), n_frames=4,
                mode=mode, out_hw=(32, 32))
            assert os.path.exists(out) and os.path.getsize(out) > 0


class TestCloudMeta:
    def test_md5(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"hello")
        assert aws.md5sum(str(p)) == "5d41402abc4b2a76b9719d911017c592"

    def test_aws_gated(self):
        with pytest.raises(ImportError):
            aws.list_instances()

    def test_labels_meta_roundtrip(self, tmp_path):
        meta = LabelsMeta(str(tmp_path / "atlas.mhd"))
        meta.path_ref = "/refs/aba.json"
        meta.region_ids_orig = [1, 2, 3]
        meta.save()
        meta2 = LabelsMeta(str(tmp_path / "atlas.mhd")).load()
        assert meta2.path_ref == "/refs/aba.json"
        assert meta2.region_ids_orig == [1, 2, 3]


class TestVis3D:
    def test_blob_scatter_and_mips(self, tmp_path, rng):
        from magellanmapper_tpu.gui import vis_3d
        roi = rng.random((8, 24, 24)).astype(np.float32)
        blobs = np.array([[2.0, 5, 5, 3, -1, -1, 0],
                          [6.0, 18, 12, 2, -1, -1, 1]])
        p1 = str(tmp_path / "blobs3d.png")
        p2 = str(tmp_path / "mips.png")
        vis_3d.plot_blobs_3d(blobs, roi.shape, p1)
        vis_3d.plot_max_intensity_projections(roi, p2, blobs)
        assert os.path.exists(p1) and os.path.exists(p2)


class TestCliDfPlot:
    def test_df_merge_and_plot2d(self, tmp_path):
        from magellanmapper_tpu.io import cli
        p1 = tmp_path / "a.csv"
        p2 = tmp_path / "b.csv"
        pd.DataFrame({"Region": [1], "Volume": [2.0]}).to_csv(
            p1, index=False)
        pd.DataFrame({"Region": [2], "Volume": [3.0]}).to_csv(
            p2, index=False)
        out = cli.main([
            "--df", "merge_csvs", str(p1), str(p2),
            "--prefix", str(tmp_path / "merged.csv")])
        assert len(out) == 2
        fig = cli.main([
            "--img", str(p1), "--plot_2d", "bar_plot",
            "--labels", "x_col=Region", "y_col=Volume",
            "--prefix", str(tmp_path / "bars.png")])
        assert os.path.exists(str(tmp_path / "bars.png"))
