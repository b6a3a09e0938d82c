"""Registration validation hardening (round-2 VERDICT item 6).

Beyond DSC > threshold: deformation-field recovery error norms,
per-region label-transfer DSC on a multi-label synthetic atlas, and the
``metric_sim_fallback`` re-registration trigger
(reference ``register.py:884-893``, BASELINE.json config 3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from magellanmapper_tpu.atlas import (
    atlas_refiner, metrics, reg_engine, register as reg_task, transform)
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)


def blobby(seed=0, shape=(40, 40, 40), n=25, width=18.0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(8, s - 8, n) for s in shape]):
        vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / width)
    return vol / vol.max()


class TestDeformationFieldRecovery:
    def test_bspline_field_error_norms(self):
        """Recovering a known FFD must shrink the displacement-field
        error in L2/Linf norms, not just improve DSC."""
        fixed = blobby(seed=11)
        spacing = (10.0,) * 3
        gs = transform.bspline_grid_shape(fixed.shape, spacing)
        rng = np.random.default_rng(4)
        true_grid = jnp.asarray(
            rng.uniform(-3.0, 3.0, (3,) + gs).astype(np.float32))
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"grid": true_grid}, "bspline",
            fixed.shape, spacing))

        stage = make_reg_param_map(
            "bspline", 96, metric="ncc", num_resolutions=2,
            grid_space_voxels=10)
        params, _ = reg_engine.register_stage(fixed, moving, stage)

        # composed field: recovered warp should invert the true warp —
        # T_rec(T_true(x)) ~ x on the interior
        coords = transform.transform_coords(
            {"grid": true_grid}, "bspline", fixed.shape, spacing)
        rec_disp = np.asarray(transform.bspline_displacement_at(
            params["grid"], jnp.asarray(
                coords.reshape(3, -1).T), spacing))
        composed = np.asarray(coords).reshape(3, -1).T + rec_disp
        ident = np.stack(np.indices(fixed.shape), -1).reshape(-1, 3)
        err = np.linalg.norm(composed - ident, axis=1).reshape(fixed.shape)
        raw = np.asarray(transform.bspline_displacement(
            true_grid, fixed.shape, spacing))
        raw_mag = np.linalg.norm(raw, axis=0)
        interior = (slice(6, -6),) * 3
        # mean residual under half the mean initial displacement, and
        # bounded everywhere (a field-norm gate, not just DSC > x)
        assert float(err[interior].mean()) < 0.5 * float(
            raw_mag[interior].mean())
        assert float(err[interior].max()) < 3.0


class TestPerRegionLabelTransfer:
    def test_multilabel_dsc_per_region(self):
        """Affine-register a multi-label synthetic atlas; every region's
        transfer DSC must clear the gate (not just the combined mask)."""
        shape = (40, 40, 40)
        labels = np.zeros(shape, np.int32)
        labels[6:20, 6:20, 6:20] = 1
        labels[22:36, 6:20, 8:30] = 2
        labels[8:30, 24:36, 22:34] = 3
        rng = np.random.default_rng(5)
        atlas = (labels > 0) * (0.5 + 0.5 * blobby(seed=5, shape=shape))
        atlas = atlas.astype(np.float32)

        true_t = np.array([2.0, -2.0, 1.0])
        mov_atlas = np.asarray(transform.resample(
            jnp.asarray(atlas), {"t": jnp.asarray(-true_t)},
            "translation", shape))
        mov_labels = np.asarray(transform.resample(
            jnp.asarray(labels.astype(np.float32)),
            {"t": jnp.asarray(-true_t)}, "translation", shape,
            order=0)).astype(np.int32)

        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 96, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = None
        prof["reg_bspline"] = None
        moved, result = reg_engine.register_duo(atlas, mov_atlas, prof)
        moved_labels = result.transform_img(mov_labels, order=0)

        for lid in (1, 2, 3):
            dsc = float(metrics.dice(
                jnp.asarray(labels == lid),
                jnp.asarray(moved_labels == lid)))
            assert dsc > 0.85, (lid, dsc)
        # combined-label DSC (the reference's aggregate gate) also holds
        assert atlas_refiner.measure_overlap_labels(
            labels, moved_labels) > 0.85


class TestMetricSimFallback:
    def test_fallback_triggers_and_keeps_best(self, monkeypatch):
        """A DSC below the fallback threshold must re-register with the
        fallback metric and keep the better result
        (reference register.py:884-893)."""
        fixed = blobby(seed=13, shape=(32, 32, 32))
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"t": jnp.asarray([-2.0, 1.0, 0.0])},
            "translation", fixed.shape))

        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 48, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = None
        prof["reg_bspline"] = None
        # threshold 1.01 always triggers; fallback to MI
        prof["metric_sim_fallback"] = (
            1.01, "AdvancedMattesMutualInformation")

        calls = []
        orig = reg_engine.register_duo

        def spy(fixed_a, moving_a, profile, **kw):
            calls.append(profile["reg_translation"]["metric_similarity"])
            return orig(fixed_a, moving_a, profile, **kw)

        monkeypatch.setattr(reg_task.reg_engine, "register_duo", spy)
        out = reg_task.register(
            fixed, {"atlas": moving,
                    "labels": (moving > 0.3).astype(np.int32)},
            prof, resolutions=(1.0, 1.0, 1.0), write_imgs=False)
        assert calls == ["ncc", "AdvancedMattesMutualInformation"]
        assert out["metrics"]["DSC_atlas_sample"] > 0.8
