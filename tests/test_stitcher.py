"""Stitching tests: phase correlation, global optimization, fusion."""

import os

import numpy as np
import pytest

from magellanmapper_tpu.stitch import stitcher


def make_scene(shape=(16, 200, 200), seed=0):
    rng = np.random.default_rng(seed)
    scene = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(2, s - 2, 120) for s in shape]):
        scene += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 6.0)
    return scene / scene.max()


def cut_tiles(scene, grid, true_positions):
    tiles = []
    for pos in np.round(true_positions).astype(int):
        sl = tuple(slice(p, p + s) for p, s in zip(pos, grid.tile_shape))
        tiles.append(np.array(scene[sl]))
    return tiles


class TestPhaseCorrelation:
    def test_known_shift(self):
        scene = make_scene((8, 64, 64))
        a = scene[:, :48, :48]
        b = np.roll(scene, (-0, -5, -7), axis=(0, 1, 2))[:, :48, :48]
        shift, score = stitcher.phase_correlation(a, b)
        np.testing.assert_allclose(shift, [0, 5, 7], atol=0.5)
        assert score > 0.005


class TestStitch:
    def test_two_by_two_grid(self):
        scene = make_scene()
        grid = stitcher.TileGrid(2, 2, (16, 110, 110), overlap_frac=0.2)
        nominal = grid.nominal_positions()
        rng = np.random.default_rng(3)
        jitter = rng.uniform(-3, 3, nominal.shape)
        jitter[0] = 0
        true_pos = np.clip(nominal + jitter, 0, None)
        true_pos[:, 0] = 0
        tiles = cut_tiles(scene, grid, true_pos)
        fused, positions = stitcher.stitch(tiles, grid)
        # recovered relative positions match the jittered truth
        rel_est = positions - positions[0]
        rel_true = np.round(true_pos) - np.round(true_pos[0])
        np.testing.assert_allclose(rel_est, rel_true, atol=1.0)
        # fused content correlates strongly with the scene region
        region = scene[
            :fused.shape[0], :fused.shape[1], :fused.shape[2]]
        sub_f = fused[:16, :150, :150].ravel()
        sub_s = region[:16, :150, :150].ravel()
        cc = np.corrcoef(sub_f, sub_s)[0, 1]
        assert cc > 0.95

    def test_global_optimization_consistency(self):
        # three tiles in a row with consistent pairwise offsets
        pairs = [
            (0, 1, np.array([0.0, 0, 100]), 1.0),
            (1, 2, np.array([0.0, 0, 100]), 1.0),
            (0, 2, np.array([0.0, 0, 201]), 0.5),  # slightly conflicting
        ]
        pos = stitcher.globally_optimize(pairs, 3)
        assert pos[1][2] == pytest.approx(100, abs=1)
        assert pos[2][2] == pytest.approx(200.5, abs=1)

    def test_tile_config_roundtrip(self, tmp_path):
        names = ["t0.tif", "t1.tif"]
        pos = np.array([[0.0, 0, 0], [0, 10, 90]])
        path = str(tmp_path / "TileConfiguration.txt")
        stitcher.write_tile_config(path, names, pos)
        names2, pos2 = stitcher.read_tile_config(path)
        assert names2 == names
        np.testing.assert_allclose(pos2, pos, atol=0.1)

    def test_fuse_blending_no_seams(self):
        # two identical-content overlapping tiles fuse to the original
        scene = make_scene((4, 40, 80))
        t1 = scene[:, :, :48]
        t2 = scene[:, :, 32:]
        fused = stitcher.fuse_tiles(
            [t1, t2], np.array([[0.0, 0, 0], [0, 0, 32]]))
        np.testing.assert_allclose(
            fused[:, :, 2:78], scene[:, :, 2:78], atol=1e-4)


class TestAcquisition:
    def test_tile_config_bidirectional(self):
        from magellanmapper_tpu.stitch import acquisition
        lines = acquisition.build_tile_config(
            "img.tif", rows=2, cols=3, size=(100.0, 80.0), overlap=0.1,
            directionality="bi", start_direction="right")
        assert lines[0] == "dim = 2"
        assert len(lines) == 7
        # rightward start flips row 1 (reference row_alt logic:
        # row_alt = gy + 1, even row_alt rows reverse)
        xs = [float(ln.split("(")[1].split(",")[0]) for ln in lines[1:]]
        assert xs[:3] == [0.0, 90.0, 180.0]     # row 0 forward
        assert xs[3:] == [180.0, 90.0, 0.0]     # row 1 reversed

    def test_mesospim_conversion(self, tmp_path):
        from magellanmapper_tpu.stitch import acquisition
        from magellanmapper_tpu.io import tiff
        rng = np.random.default_rng(0)
        shape = (4, 8, 10)
        for chl in ("488", "561"):
            for tile in ("X0Y0", "X1Y0"):
                arr = (rng.random(shape) * 900).astype(np.uint16)
                p = tmp_path / f"{chl}_{tile}.raw"
                arr.tofile(p)
                (tmp_path / f"{chl}_{tile}.raw_meta.txt").write_text(
                    "[z_planes] 4\n[y_pixels] 8\n[x_pixels] 10\n"
                    "[z_stepsize] 5.0\n[Pixelsize in um] 2.6\n"
                    "[Zoom] 1x\n")
        out = acquisition.mesospim_to_tif(str(tmp_path))
        assert len(out) == 4
        names = sorted(os.path.basename(p) for p, _, _ in out)
        assert names == ["tile_0_ch_0.tif", "tile_0_ch_1.tif",
                         "tile_1_ch_0.tif", "tile_1_ch_1.tif"]
        back = tiff.read_tiff(out[0][0])
        assert back.shape == shape and back.dtype == np.uint16
