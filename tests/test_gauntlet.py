"""Registration gauntlet fixtures: ground-truth invariants.

The gauntlet (atlas/gauntlet.py) is the bench's registration-quality
oracle, so its own construction must be pinned: the GT transform has to
be genuinely non-affine, the modality gap monotone-ish, the annotation
a true partition — otherwise the gates upstream measure nothing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from magellanmapper_tpu.atlas import gauntlet, transform


SHAPE = (40, 56, 48)


class TestAnatomy:
    def test_labels_partition_foreground(self):
        intensity, labels = gauntlet.make_anatomy(SHAPE, n_labels=8,
                                                  n_blobs=30)
        assert intensity.shape == SHAPE and labels.shape == SHAPE
        assert intensity.min() >= 0 and intensity.max() <= 1.0
        # labels tile exactly the nonzero-ish anatomy: all fg labeled
        fg = labels > 0
        assert fg.any()
        assert set(np.unique(labels)) <= set(range(9))
        # every label id present (8 seeds over a big foreground)
        assert len(np.unique(labels[fg])) == 8

    def test_region_contrast_creates_internal_edges(self):
        flat, labels = gauntlet.make_anatomy(
            SHAPE, n_labels=8, n_blobs=0, region_contrast=0.0)
        con, _ = gauntlet.make_anatomy(
            SHAPE, n_labels=8, n_blobs=0, region_contrast=0.6)
        # per-region intensity variance across regions: ~0 when flat
        fg = labels > 0
        means_flat = [flat[labels == i].mean() for i in range(1, 9)]
        means_con = [con[labels == i].mean() for i in range(1, 9)]
        assert np.std(means_con) > 5 * max(np.std(means_flat), 1e-9)


class TestGroundTruth:
    @staticmethod
    def _nonlinear_fraction(gt):
        """|residual after best-fit affine| / |field| of the realized
        displacement (the B-spline smoothing of a coarse lattice
        re-introduces linear content even after control-point removal —
        what the gauntlet needs is a SUBSTANTIAL nonlinear residual, not
        a zero linear part; any linear remainder is absorbed by the
        affine stage it composes with)."""
        disp = np.asarray(transform.bspline_displacement(
            gt["grid"], SHAPE, gt["spacing"], stride=(4, 4, 4)))
        zz, yy, xx = np.meshgrid(*[np.arange(0, s, 4) for s in SHAPE],
                                 indexing="ij")
        pts = np.column_stack([zz.ravel(), yy.ravel(), xx.ravel(),
                               np.ones(zz.size)])
        d = disp.reshape(3, -1).T
        coef, *_ = np.linalg.lstsq(pts, d, rcond=None)
        resid = d - pts @ coef
        mean = np.linalg.norm(d, axis=1).mean()
        return (np.linalg.norm(resid, axis=1).mean()
                / max(mean, 1e-9), mean)

    def test_nonaffine_content_survives(self):
        gt = gauntlet.make_ground_truth(SHAPE, seed=3, ffd_spacing=24.0,
                                        ffd_ctrl_sigma=6.0)
        frac, mean = self._nonlinear_fraction(gt)
        assert frac > 0.2
        # control-point affine removal must PRESERVE the absolute
        # nonlinear content exactly (cubic B-splines reproduce linear
        # fields; subtracting an affine at the controls subtracts an
        # affine from the realized field, leaving the residual intact)
        gt_raw = gauntlet.make_ground_truth(
            SHAPE, seed=3, ffd_spacing=24.0, ffd_ctrl_sigma=6.0,
            remove_affine_component=False)
        frac_raw, mean_raw = self._nonlinear_fraction(gt_raw)
        np.testing.assert_allclose(
            frac * mean, frac_raw * mean_raw, rtol=0.1)
        assert gt["disp_stats"]["mean_vox"] > 0

    def test_defaults_realize_large_deformation(self):
        gt = gauntlet.make_ground_truth((80, 120, 100))
        # the validated sigma-26/spacing-100 defaults must leave real
        # work for the B-spline stage (half-scale: ~half the voxels)
        assert gt["disp_stats"]["mean_vox"] > 4.0


class TestModalityGap:
    def test_changes_histogram_keeps_support(self):
        img, _ = gauntlet.make_anatomy(SHAPE, n_labels=6, n_blobs=20)
        gapped = gauntlet.apply_modality_gap(img, noise_sigma=0.02)
        assert gapped.shape == img.shape and gapped.min() >= 0
        # nonlinear remap: correlation positive but not identity
        c = np.corrcoef(img.ravel(), gapped.ravel())[0, 1]
        assert 0.5 < c < 0.999


class TestBuildAndScore:
    def test_build_pair_consistency(self, tmp_path):
        pair = gauntlet.build_pair(
            SHAPE, seed=1, ffd_spacing=24.0, ffd_ctrl_sigma=5.0,
            cache_dir=str(tmp_path))
        assert pair["fixed"].shape == SHAPE
        assert pair["labels_fixed_gt"].dtype == np.int32
        # warped annotation overlaps the warped anatomy's support
        fg_fixed = pair["fixed"] > 0.05
        fg_labels = pair["labels_fixed_gt"] > 0
        inter = (fg_fixed & fg_labels).sum()
        assert inter > 0.5 * fg_labels.sum()
        # cache round-trip is exact
        pair2 = gauntlet.build_pair(
            SHAPE, seed=1, ffd_spacing=24.0, ffd_ctrl_sigma=5.0,
            cache_dir=str(tmp_path))
        np.testing.assert_array_equal(pair["labels_fixed_gt"],
                                      pair2["labels_fixed_gt"])
        np.testing.assert_allclose(pair["fixed"], pair2["fixed"])

    def test_label_transfer_dsc(self):
        labels = np.zeros((8, 8, 8), np.int32)
        labels[:4] = 1
        labels[4:] = 2
        perfect = gauntlet.label_transfer_dsc(labels, labels)
        assert perfect["median"] == 1.0 and perfect["min"] == 1.0
        assert perfect["p10"] == 1.0
        swapped = np.where(labels == 1, 2, 1).astype(np.int32)
        worst = gauntlet.label_transfer_dsc(swapped, labels)
        assert worst["median"] == 0.0

    def test_label_transfer_only_labels_restricts(self):
        labels = np.zeros((8, 8, 8), np.int32)
        labels[:3] = 1
        labels[3:6] = 2
        labels[6:] = 3
        pred = labels.copy()
        pred[labels == 3] = 1   # region 3 fully wrong
        full = gauntlet.label_transfer_dsc(pred, labels)
        assert full["min"] == 0.0
        gated = gauntlet.label_transfer_dsc(
            pred, labels, only_labels=[2])
        assert gated["min"] == 1.0 and len(gated["per_label"]) == 1

    def test_truncated_pair_geometry(self, tmp_path):
        pair = gauntlet.build_truncated_pair(
            SHAPE, seed=3, keep_frac=0.6, ffd_spacing=24.0,
            ffd_ctrl_sigma=4.0, cache_dir=str(tmp_path))
        z_cut = int(SHAPE[0] * 0.6)
        assert not pair["fixed"][z_cut:].any()
        assert not pair["labels_fixed_gt"][z_cut:].any()
        assert pair["fixed_mask"][:z_cut].all()
        assert not pair["fixed_mask"][z_cut:].any()
        # gated labels are substantially-kept regions only
        full = gauntlet.build_pair(
            SHAPE, seed=3, ffd_spacing=24.0, ffd_ctrl_sigma=4.0,
            cache_dir=str(tmp_path))
        for lid in pair["gated_labels"]:
            kept = (pair["labels_fixed_gt"] == lid).sum()
            total = (full["labels_fixed_gt"] == lid).sum()
            assert kept >= 0.5 * total
        # regions fully beyond the cut are excluded
        lost = [int(v) for v in np.unique(full["labels_fixed_gt"])
                if v and (pair["labels_fixed_gt"] == v).sum() == 0]
        assert not set(lost) & set(pair["gated_labels"])

    @pytest.mark.slow
    def test_run_gauntlet_plumbing(self, tmp_path):
        """Tiny-scale end-to-end: gates are NOT expected to pass, but
        the result must carry every scored field and beat the
        unregistered baseline."""
        pair = gauntlet.build_pair(
            (32, 40, 36), seed=2, ffd_spacing=20.0, ffd_ctrl_sigma=3.0,
            cache_dir=str(tmp_path))
        out = gauntlet.run_gauntlet(pair, iters_scale=0.05)
        for key in ("dsc", "label_dsc_median", "bspline_dsc_gain",
                    "warp_err_vox", "gt_disp_vox", "passes", "wall_s",
                    "stage_dsc", "label_dsc_min", "label_dsc_p10"):
            assert key in out
        assert 0.0 <= out["dsc"] <= 1.0
        assert out["warp_err_vox"] >= 0.0

    @pytest.mark.slow
    def test_run_gauntlet_suite_plumbing(self, tmp_path):
        """Tiny-scale suite: two seeded pairs + the truncated case, all
        scored; suite passes only when every pair passes."""
        suite = gauntlet.run_gauntlet_suite(
            (32, 40, 36), seeds=(2, 3), truncated_seed=2,
            cache_dir=str(tmp_path), iters_scale=0.03,
            ffd_spacing=20.0, ffd_ctrl_sigma=3.0)
        assert set(suite["pairs"]) == {"seed2", "seed3", "trunc2"}
        for r in suite["pairs"].values():
            assert 0.0 <= r["dsc"] <= 1.0
            assert "label_dsc_p10" in r
        assert suite["passes"] == all(
            r["passes"] for r in suite["pairs"].values())
        assert suite["wall_s"] > 0


class TestGates:
    """Gate semantics (atlas/gauntlet.py gates_pass): each clause and
    its alternative, pinned on the shapes seen in real runs."""

    BASE = dict(dsc=0.98, label_median=0.95, label_min=0.85,
                label_p10=0.90, gain=0.06, closure=0.6)

    def _pass(self, **over):
        return gauntlet.gates_pass(**{**self.BASE, **over})

    def test_all_good_passes(self):
        assert self._pass()

    def test_dsc_and_median_are_hard_gates(self):
        assert not self._pass(dsc=0.94)
        assert not self._pass(label_median=0.89)

    def test_worst_region_min_or_p10(self):
        # seed0-shaped: min 0.77 but p10 healthy -> pass
        assert self._pass(label_min=0.77, label_p10=0.90)
        # both tails bad -> fail
        assert not self._pass(label_min=0.77, label_p10=0.84)

    def test_bspline_gain_or_gap_closure(self):
        # seed10-shaped: affine already at 0.944 caps absolute gain,
        # but the B-spline closes 76% of the residual -> pass
        assert self._pass(gain=0.042, closure=0.76)
        # neither absolute gain nor closure -> deformable stage idle
        assert not self._pass(gain=0.01, closure=0.2)

    def test_gap_closure_helper(self):
        assert gauntlet.bspline_gap_closure(0.944, 0.042) == pytest.approx(
            0.75, abs=0.01)
        assert gauntlet.bspline_gap_closure(None, 0.1) == 0.0
        # dsc_affine ~ 1.0 must not divide by zero
        assert gauntlet.bspline_gap_closure(1.0, 0.0) == 0.0
