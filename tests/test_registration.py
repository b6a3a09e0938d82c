"""Registration engine tests: metric sanity + transform recovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from magellanmapper_tpu.atlas import metrics, reg_engine, transform
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)


def blobby_volume(seed=0, shape=(48, 48, 48), n=25):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(10, s - 10, n) for s in shape]):
        vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 18.0)
    return vol / vol.max()


class TestMetrics:
    def test_ncc_self_is_one(self):
        vol = blobby_volume()
        assert float(metrics.ncc(jnp.asarray(vol), jnp.asarray(vol))) == \
            pytest.approx(1.0, abs=1e-4)

    def test_mi_self_exceeds_shuffled(self):
        vol = blobby_volume()
        rng = np.random.default_rng(1)
        shuffled = rng.permutation(vol.reshape(-1)).reshape(vol.shape)
        mi_self = float(metrics.mattes_mi(
            jnp.asarray(vol), jnp.asarray(vol)))
        mi_rand = float(metrics.mattes_mi(
            jnp.asarray(vol), jnp.asarray(shuffled)))
        assert mi_self > mi_rand + 0.5

    def test_dice(self):
        a = np.zeros((10, 10, 10), bool)
        b = np.zeros((10, 10, 10), bool)
        a[:5] = True
        b[:5] = True
        assert float(metrics.dice(jnp.asarray(a), jnp.asarray(b))) == \
            pytest.approx(1.0)
        b[:] = False
        b[5:] = True
        assert float(metrics.dice(jnp.asarray(a), jnp.asarray(b))) == \
            pytest.approx(0.0)

    def test_measure_overlap_otsu(self):
        vol = blobby_volume()
        assert metrics.measure_overlap(vol, vol) == pytest.approx(1.0)


class TestTransforms:
    def test_translation_sampling(self):
        vol = blobby_volume()
        params = {"t": jnp.asarray([2.0, -3.0, 1.0])}
        out = np.asarray(transform.resample(
            jnp.asarray(vol), params, "translation", vol.shape))
        # out(x) = vol(x + t): voxel (z,y,x) reads from (z+2, y-3, x+1)
        np.testing.assert_allclose(
            out[10, 10, 10], vol[12, 7, 11], rtol=1e-5)

    def test_affine_identity(self):
        vol = blobby_volume()
        params = transform.identity_params("affine")
        out = np.asarray(transform.resample(
            jnp.asarray(vol), params, "affine", vol.shape))
        np.testing.assert_allclose(out, vol, atol=1e-5)

    def test_bspline_identity(self):
        vol = blobby_volume()
        spacing = (16.0, 16.0, 16.0)
        gs = transform.bspline_grid_shape(vol.shape, spacing)
        params = transform.identity_params("bspline", gs)
        out = np.asarray(transform.resample(
            jnp.asarray(vol), params, "bspline", vol.shape, spacing))
        np.testing.assert_allclose(out, vol, atol=1e-5)

    def test_bspline_displacement_partition_of_unity(self):
        spacing = (8.0, 8.0, 8.0)
        shape = (24, 24, 24)
        gs = transform.bspline_grid_shape(shape, spacing)
        grid = jnp.ones((3,) + gs)
        disp = np.asarray(
            transform.bspline_displacement(grid, shape, spacing))
        # constant control values -> constant displacement (B-spline
        # partition of unity)
        np.testing.assert_allclose(disp, 1.0, atol=1e-4)

    def test_label_resample_order0_preserves_values(self):
        labels = np.zeros((20, 20, 20), np.int32)
        labels[5:10, 5:10, 5:10] = 7
        labels[12:18, 12:18, 12:18] = 42
        params = {"t": jnp.asarray([0.4, -0.3, 0.2])}
        out = np.asarray(transform.resample(
            jnp.asarray(labels.astype(np.float32)), params, "translation",
            labels.shape, order=0))
        assert set(np.unique(out)).issubset({0.0, 7.0, 42.0})


class TestRegistration:
    def test_recover_translation(self):
        vol = blobby_volume()
        shift = np.array([3.0, -2.0, 4.0])
        moving = np.asarray(transform.resample(
            jnp.asarray(vol), {"t": jnp.asarray(-shift)}, "translation",
            vol.shape))
        stage = make_reg_param_map("translation", 64, metric="ncc",
                                   num_resolutions=2)
        params, loss = reg_engine.register_stage(vol, moving, stage)
        # registering moving back onto fixed must find t ~= shift
        np.testing.assert_allclose(np.asarray(params["t"]), shift, atol=0.7)

    def test_register_duo_improves_overlap(self):
        fixed = blobby_volume(seed=3)
        true_aff = {"W": jnp.asarray(np.diag([0.06, -0.04, 0.05])),
                    "t": jnp.asarray([2.0, -1.5, 1.0])}
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), true_aff, "affine", fixed.shape))
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 48, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = make_reg_param_map(
            "affine", 48, metric="ncc", num_resolutions=2)
        prof["reg_bspline"] = None  # affine-only for speed
        moved, result = reg_engine.register_duo(fixed, moving, prof)
        ncc_before = float(metrics.ncc(
            jnp.asarray(fixed), jnp.asarray(moving)))
        ncc_after = float(metrics.ncc(
            jnp.asarray(fixed), jnp.asarray(moved)))
        assert ncc_after > ncc_before + 0.05
        assert result.metrics["dsc_fixed_moved"] > 0.7

    def test_label_transfer_follows_transform(self):
        fixed = blobby_volume(seed=5)
        shift = np.array([4.0, 0.0, 0.0])
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"t": jnp.asarray(-shift)}, "translation",
            fixed.shape))
        labels = (moving > 0.3).astype(np.float32) * 9
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 64, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = None
        prof["reg_bspline"] = None
        moved, result = reg_engine.register_duo(fixed, moving, prof)
        labels_moved = result.transform_img(labels, order=0)
        assert set(np.unique(labels_moved)).issubset({0.0, 9.0})
        dsc = float(metrics.dice(
            jnp.asarray(labels_moved > 0), jnp.asarray(fixed > 0.3)))
        assert dsc > 0.75


class TestBsplineRecovery:
    def test_bspline_improves_alignment_after_warp(self):
        """Register a known FFD-warped volume back; NCC must recover."""
        fixed = blobby_volume(seed=7, shape=(40, 40, 40), n=20)
        spacing = (12.0, 12.0, 12.0)
        gs = transform.bspline_grid_shape(fixed.shape, spacing)
        rng = np.random.default_rng(2)
        true_grid = jnp.asarray(
            rng.uniform(-4.0, 4.0, (3,) + gs).astype(np.float32))
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"grid": true_grid}, "bspline",
            fixed.shape, spacing))
        stage = make_reg_param_map(
            "bspline", 80, metric="ncc", num_resolutions=2,
            grid_space_voxels=12)
        params, loss = reg_engine.register_stage(fixed, moving, stage)
        moved = np.asarray(transform.resample(
            jnp.asarray(moving), params, "bspline", fixed.shape,
            spacing))
        ncc_before = float(metrics.ncc(
            jnp.asarray(fixed), jnp.asarray(moving)))
        ncc_after = float(metrics.ncc(
            jnp.asarray(fixed), jnp.asarray(moved)))
        # recover at least 75% of the alignment deficit, to near-perfect
        assert 1 - ncc_after < 0.25 * (1 - ncc_before)
        assert ncc_after > 0.995

    def test_metric_stride_selection(self):
        assert reg_engine._metric_stride((24, 24, 24)) == (1, 1, 1)
        big = reg_engine._metric_stride((512, 512, 512))
        n = np.prod([-(-512 // s) for s in big])
        assert n <= reg_engine._MAX_METRIC_SAMPLES
        assert max(big) > 1


class TestGroupwise:
    def test_joint_groupwise_reduces_variance(self):
        fixed = blobby_volume(seed=9, shape=(32, 32, 32), n=12)
        shifts = [(-3, 0, 2), (0, 0, 0), (3, -2, 0), (-1, 2, -2)]
        imgs = [np.asarray(transform.resample(
            jnp.asarray(fixed), {"t": jnp.asarray([-float(v) for v in s])},
            "translation", fixed.shape)) for s in shifts]
        var_before = np.var(np.stack(imgs), axis=0).mean()
        mean_img, params = reg_engine.register_groupwise(
            imgs, max_iter=96, num_resolutions=2)
        moved = [np.asarray(transform.resample(
            jnp.asarray(im), {"W": jnp.asarray(p["W"]),
                              "t": jnp.asarray(p["t"])},
            "affine", fixed.shape)) for im, p in zip(imgs, params)]
        var_after = np.var(np.stack(moved), axis=0).mean()
        assert var_after < 0.5 * var_before
        # aligned mean sharper than unaligned mean
        assert mean_img.max() > np.mean(np.stack(imgs), axis=0).max()


class TestElastixFeatureParity:
    """Round-2 Elastix feature gap: points, masks, schedule, jitter."""

    def test_transform_points_affine_matches_coords(self):
        shape = (16, 16, 16)
        params = {"W": jnp.asarray(np.diag([0.1, -0.05, 0.0])),
                  "t": jnp.asarray([1.0, -2.0, 0.5])}
        pts = jnp.asarray([[3.0, 4.0, 5.0], [10.0, 2.0, 8.0]])
        mapped = np.asarray(transform.transform_points(
            pts, params, "affine", shape))
        coords = np.asarray(transform.transform_coords(
            params, "affine", shape))
        for p, m in zip(np.asarray(pts).astype(int), mapped):
            np.testing.assert_allclose(
                coords[:, p[0], p[1], p[2]], m, atol=1e-4)

    def test_transform_points_bspline_matches_field(self):
        shape = (16, 16, 16)
        spacing = (8.0, 8.0, 8.0)
        gshape = transform.bspline_grid_shape(shape, spacing)
        rng = np.random.default_rng(0)
        grid = jnp.asarray(
            rng.normal(scale=0.5, size=(3,) + gshape).astype(np.float32))
        disp = np.asarray(transform.bspline_displacement(
            grid, shape, spacing))
        pts = jnp.asarray([[2.0, 5.0, 7.0], [12.0, 3.0, 9.0]])
        at = np.asarray(transform.bspline_displacement_at(
            grid, pts, spacing))
        for p, d in zip(np.asarray(pts).astype(int), at):
            np.testing.assert_allclose(
                disp[:, p[0], p[1], p[2]], d, atol=1e-4)

    def test_point_metric_recovers_translation(self):
        """Landmarks consistent with the image shift must tighten
        translation recovery (CorrespondingPointsEuclideanDistanceMetric
        replacement; ref register.py:583-602)."""
        vol = blobby_volume(seed=5)
        shift = np.array([2.0, -3.0, 1.0])
        moving = np.asarray(transform.resample(
            jnp.asarray(vol), {"t": jnp.asarray(-shift)}, "translation",
            vol.shape))
        fix_pts = np.array(
            [[12., 12., 12.], [30., 20., 15.], [20., 35., 30.]])
        mov_pts = fix_pts + shift
        stage = make_reg_param_map(
            "translation", 64, metric="ncc", num_resolutions=2,
            point_based=True)
        params, _ = reg_engine.register_stage(
            vol, moving, stage, fix_pts=fix_pts, mov_pts=mov_pts,
            pt_weight=5.0)
        np.testing.assert_allclose(np.asarray(params["t"]), shift, atol=0.5)

    def test_fixed_mask_excludes_adversarial_region(self):
        """Outside-mask content pulls toward identity; with the fixed
        mask the true shift is recovered (ref SetFixedMask :515)."""
        vol = blobby_volume(seed=7)
        shift = np.array([3.0, 0.0, 0.0])
        moving = np.asarray(transform.resample(
            jnp.asarray(vol), {"t": jnp.asarray(-shift)}, "translation",
            vol.shape))
        # corrupt the fixed image's outer z-slabs with the UNSHIFTED
        # moving content so unmasked registration is pulled to t=0
        fixed_bad = vol.copy()
        fixed_bad[:12] = moving[:12]
        fixed_bad[-12:] = moving[-12:]
        mask = np.zeros_like(vol, bool)
        mask[12:-12] = True
        stage = make_reg_param_map("translation", 96, metric="ncc",
                                   num_resolutions=2)
        p_mask, _ = reg_engine.register_stage(
            fixed_bad, moving, stage, fixed_mask=mask)
        np.testing.assert_allclose(
            np.asarray(p_mask["t"]), shift, atol=0.7)

    def test_erode_mask_shrinks_smoothed_levels(self):
        mask = np.zeros((32, 32, 32), bool)
        mask[4:28, 4:28, 4:28] = True
        plain = reg_engine._mask_pyramid(mask, 3, erode=False)
        eroded = reg_engine._mask_pyramid(mask, 3, erode=True)
        # smoothed (coarser) levels shrink; finest level untouched
        assert int(np.asarray(eroded[0]).sum()) \
            < int(np.asarray(plain[0]).sum())
        np.testing.assert_array_equal(
            np.asarray(eroded[-1]), np.asarray(plain[-1]))

    def test_parse_grid_schedule_per_dimension(self):
        sched = [8, 8, 4, 4, 4, 2, 2, 2, 1, 1, 1, 1]
        levels = reg_engine._parse_grid_schedule(sched, 99)
        assert levels == [(8.0, 8.0, 4.0), (4.0, 4.0, 2.0),
                          (2.0, 2.0, 1.0), (1.0, 1.0, 1.0)]
        assert reg_engine._parse_grid_schedule([4, 2, 1], 99) == [
            (4.0,) * 3, (2.0,) * 3, (1.0,) * 3]
        # exactly-ndim schedules with repeated values are ONE
        # per-dimension level (reference register.py:408 heuristic),
        # not ndim isotropic levels
        assert reg_engine._parse_grid_schedule([2, 2, 1], 99) == [
            (2.0, 2.0, 1.0)]

    def test_grid_spacing_schedule_relattices(self):
        """A schedule must change the control lattice across levels and
        still register (groupwise profile, ref atlas_prof.py:287)."""
        fixed = blobby_volume(seed=9, shape=(32, 32, 32))
        rng = np.random.default_rng(1)
        gshape0 = transform.bspline_grid_shape((32, 32, 32), (12.0,) * 3)
        warp = {"grid": jnp.asarray(rng.normal(
            scale=0.8, size=(3,) + gshape0).astype(np.float32))}
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), warp, "bspline", (32, 32, 32),
            (12.0,) * 3))
        stage = make_reg_param_map(
            "bspline", 48, metric="ncc", grid_space_voxels=12,
            grid_spacing_schedule=[2, 2, 2, 1, 1, 1])
        params, _ = reg_engine.register_stage(fixed, moving, stage)
        # final lattice matches the schedule's last (1x) spacing
        assert tuple(params["grid"].shape[1:]) == gshape0
        moved = np.asarray(transform.resample(
            jnp.asarray(moving), params, "bspline", (32, 32, 32),
            (12.0,) * 3))
        before = float(metrics.ncc(jnp.asarray(fixed), jnp.asarray(moving)))
        after = float(metrics.ncc(jnp.asarray(fixed), jnp.asarray(moved)))
        assert after > before

    def test_resample_grid_preserves_field(self):
        """Re-latticing approximates the same displacement field (the
        coefficients differ — resample_grid samples the field at the new
        control locations; the optimizer refines the smoothing residue)."""
        shape = (24, 24, 24)
        old_sp, new_sp = (12.0,) * 3, (6.0,) * 3
        gshape_old = transform.bspline_grid_shape(shape, old_sp)
        gshape_new = transform.bspline_grid_shape(shape, new_sp)
        rng = np.random.default_rng(2)
        grid = jnp.asarray(
            rng.normal(scale=1.0, size=(3,) + gshape_old).astype(np.float32))
        new_grid = transform.resample_grid(grid, old_sp, gshape_new, new_sp)
        f_old = np.asarray(transform.bspline_displacement(
            grid, shape, old_sp))
        f_new = np.asarray(transform.bspline_displacement(
            jnp.asarray(new_grid), shape, new_sp))
        # interior field agreement well under the displacement scale
        err = np.abs(f_old - f_new)[:, 4:-4, 4:-4, 4:-4]
        assert float(err.mean()) < 0.15
        assert float(err.max()) < 0.6

    def test_load_elastix_points(self, tmp_path):
        from magellanmapper_tpu.atlas import register as reg_task
        p = tmp_path / "fix_pts.txt"
        p.write_text("point\n2\n10 20 30\n1.5 2.5 3.5\n")
        pts = reg_task.load_elastix_points(str(p))
        # x,y,z file order -> z,y,x rows
        np.testing.assert_allclose(
            pts, [[30.0, 20.0, 10.0], [3.5, 2.5, 1.5]])


class TestGroupwiseBspline:
    def test_bspline_stage_reduces_variance_beyond_affine(self):
        """Groupwise FFD refinement (reference groupwise profile's
        bspline stage, 130vx grid) must tighten the group beyond the
        affine-only joint stage."""
        base = blobby_volume(seed=21, shape=(32, 32, 32))
        rng = np.random.default_rng(3)
        spacing = (12.0,) * 3
        gshape = transform.bspline_grid_shape((32, 32, 32), spacing)
        imgs = [base]
        for i in range(2):
            warp = {"grid": jnp.asarray(rng.normal(
                scale=1.2, size=(3,) + gshape).astype(np.float32))}
            imgs.append(np.asarray(transform.resample(
                jnp.asarray(base), warp, "bspline", (32, 32, 32),
                spacing)))

        mean_aff, _ = reg_engine.register_groupwise(
            imgs, max_iter=96, num_resolutions=2)
        mean_bs, per_img = reg_engine.register_groupwise(
            imgs, max_iter=96, num_resolutions=2,
            bspline_iter=96, grid_space_voxels=12)
        assert "grid" in per_img[0] and per_img[0]["grid"].shape[0] == 3

        def group_var(mean_fn_params, bspline):
            moved = []
            for im, p in zip(imgs, mean_fn_params):
                kind = "bspline" if bspline else "affine"
                params = {"grid": jnp.asarray(p["grid"])} if bspline \
                    else {"W": jnp.asarray(p["W"]), "t": jnp.asarray(p["t"])}
                pre = {"W": jnp.asarray(p["W"]),
                       "t": jnp.asarray(p["t"])} if bspline else None
                moved.append(np.asarray(transform.resample(
                    jnp.asarray(im), params, kind, (32, 32, 32),
                    p.get("spacing"), pre_affine=pre)))
            return float(np.var(np.stack(moved), axis=0).mean())

        _, per_aff = reg_engine.register_groupwise(
            imgs, max_iter=96, num_resolutions=2)
        var_aff = group_var(per_aff, bspline=False)
        var_bs = group_var(per_img, bspline=True)
        assert var_bs < var_aff

    def test_grid_spacing_schedule_relattices(self):
        """A grid-spacing schedule must run coarse->fine (final lattice
        at base spacing) and still tighten the group (reference
        groupwise profile, atlas_prof.py:287)."""
        base = blobby_volume(seed=22, shape=(32, 32, 32))
        rng = np.random.default_rng(5)
        spacing = (12.0,) * 3
        gshape = transform.bspline_grid_shape((32, 32, 32), spacing)
        imgs = [base]
        for i in range(2):
            warp = {"grid": jnp.asarray(rng.normal(
                scale=1.2, size=(3,) + gshape).astype(np.float32))}
            imgs.append(np.asarray(transform.resample(
                jnp.asarray(base), warp, "bspline", (32, 32, 32),
                spacing)))
        mean_bs, per_img = reg_engine.register_groupwise(
            imgs, max_iter=64, num_resolutions=2,
            bspline_iter=96, grid_space_voxels=12,
            grid_spacing_schedule=[2.0, 2.0, 2.0, 1.0, 1.0, 1.0])
        # final lattice is at base spacing (multiplier 1.0)
        assert per_img[0]["spacing"] == (12.0, 12.0, 12.0)
        assert tuple(per_img[0]["grid"].shape[1:]) == gshape
        _, per_aff = reg_engine.register_groupwise(
            imgs, max_iter=64, num_resolutions=2)

        def group_var(plist, bspline):
            moved = []
            for im, p in zip(imgs, plist):
                kind = "bspline" if bspline else "affine"
                params = ({"grid": jnp.asarray(p["grid"])} if bspline
                          else {"W": jnp.asarray(p["W"]),
                                "t": jnp.asarray(p["t"])})
                pre = {"W": jnp.asarray(p["W"]),
                       "t": jnp.asarray(p["t"])} if bspline else None
                moved.append(np.asarray(transform.resample(
                    jnp.asarray(im), params, kind, (32, 32, 32),
                    p.get("spacing"), pre_affine=pre)))
            return float(np.var(np.stack(moved), axis=0).mean())

        assert group_var(per_img, True) < group_var(per_aff, False)


class TestSmoothingPyramid:
    def test_smoothing_mode_registers_with_one_program_per_stage(self):
        """pyramid_mode='smoothing' (constant-shape Elastix
        FixedSmoothingImagePyramid) must register as well as the
        downsampling pyramid while compiling ONE program per stage
        (all levels share shapes; iteration counts are traced)."""
        rng = np.random.default_rng(7)
        shape = (32, 40, 36)
        fixed = blobby_volume(seed=7, shape=shape, n=20)
        true_t = {"t": jnp.asarray([2.0, -1.5, 1.0])}
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), true_t, "translation", shape))

        from magellanmapper_tpu.settings.atlas_prof import (
            AtlasProfile, make_reg_param_map)
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 48, num_resolutions=3,
            pyramid_mode="smoothing")
        prof["reg_affine"] = make_reg_param_map(
            "affine", 48, num_resolutions=3, pyramid_mode="smoothing")
        prof["reg_bspline"] = None
        n0 = reg_engine._optimize_level._cache_size()
        moved, result = reg_engine.register_duo(fixed, moving, prof)
        n_compiled = reg_engine._optimize_level._cache_size() - n0
        assert n_compiled <= 2, n_compiled
        assert result.metrics["dsc_fixed_moved"] > 0.85
