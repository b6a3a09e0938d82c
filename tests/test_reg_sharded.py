"""Mesh-sharded registration (round-4 VERDICT item 2).

The #2 hot path gets its multi-chip story: metric samples shard over an
(sp, spy) mesh via shard_map (pass 1: each device gathers its sample
chunk's warp from the replicated moving volume; pass 2: per-device
partial Parzen joint histograms psum'd over ICI). These tests pin exact
single-eval loss parity and end-to-end stage/duo/groupwise agreement on
the virtual 8-device CPU mesh.

Reference hot path: ``/root/reference/magmap/atlas/register.py:423-638``
(register_duo) and ``:1189`` (4D groupwise join); SURVEY §2.10 maps
Mattes-MI's histogram accumulation to segment-sum + psum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from magellanmapper_tpu.atlas import metrics, reg_engine, transform
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("sp", "spy"))


def _pair(shape=(24, 28, 26), seed=0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    fixed = np.zeros(shape, np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(4, s - 4, 25) for s in shape]):
        fixed += np.exp(
            -((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
    fixed /= fixed.max()
    moving = np.asarray(transform.resample(
        jnp.asarray(fixed), {"t": jnp.asarray([1.5, -2.0, 1.0])},
        "translation", shape))
    return jnp.asarray(fixed), jnp.asarray(moving)


class TestShardedMetricParity:
    """Single loss evaluations: sharded == unsharded to float precision."""

    @pytest.mark.parametrize("metric", [
        "AdvancedMattesMutualInformation",
        "AdvancedNormalizedCorrelation", "AdvancedMeanSquares"])
    def test_loss_matches_unsharded(self, mesh, metric):
        fixed, moving = _pair()
        params = {"W": jnp.asarray(np.eye(3) * 0.02),
                  "t": jnp.asarray([0.5, -0.3, 0.2])}
        stride = (1, 1, 1)
        # unsharded loss at these params (0 iterations = evaluate only)
        _, base = reg_engine._optimize_level(
            fixed, moving, params, None, "affine", metric, 0, None,
            (("W", 0.01), ("t", 1.0)), stride)
        _, shard = reg_engine._optimize_level_sharded(
            mesh, fixed, moving, params, None, "affine", metric, 0,
            None, (("W", 0.01), ("t", 1.0)), stride)
        assert float(shard) == pytest.approx(float(base), abs=2e-5)

    def test_loss_matches_with_stride_and_masks(self, mesh):
        fixed, moving = _pair(seed=3)
        rng = np.random.default_rng(1)
        fmask = jnp.asarray(
            (rng.random(fixed.shape) > 0.3).astype(np.float32))
        mmask = jnp.asarray(
            (np.asarray(moving) > 0.05).astype(np.float32))
        params = {"t": jnp.asarray([1.0, 0.5, -0.5])}
        stride = (2, 2, 2)
        args = (fixed, moving, params, None, "translation",
                "AdvancedMattesMutualInformation", 0, None,
                (("t", 1.0),), stride)
        kw = dict(fixed_mask=fmask, moving_mask=mmask, jitter=False)
        _, base = reg_engine._optimize_level(*args, **kw)
        _, shard = reg_engine._optimize_level_sharded(mesh, *args, **kw)
        assert float(shard) == pytest.approx(float(base), abs=2e-5)

    def test_gradients_match_unsharded(self, mesh):
        """The psum'd-histogram loss must backprop the same parameter
        gradients (shard_map transpose correctness)."""
        fixed, moving = _pair(seed=5)

        def loss_unsharded(p):
            moved = transform.resample(
                moving, p, "affine", fixed.shape, order=1)
            return metrics.metric_loss(
                "AdvancedMattesMutualInformation", fixed, moved)

        def loss_sharded(p):
            coords = transform.transform_coords(
                p, "affine", fixed.shape)
            n = fixed.size
            n_dev = 8
            n_pad = -(-n // n_dev) * n_dev
            f = reg_engine._pad_to(fixed.reshape(-1), n_pad)
            c = reg_engine._pad_to(coords.reshape(3, -1), n_pad, axis=1)
            valid = reg_engine._pad_to(
                jnp.ones((n,), jnp.float32), n_pad)
            m = reg_engine._sharded_gather(mesh, moving, c)
            return reg_engine._sharded_metric_loss(
                mesh, "AdvancedMattesMutualInformation", f, m, valid,
                None)

        p = {"W": jnp.asarray(np.eye(3) * 0.01),
             "t": jnp.asarray([0.4, -0.2, 0.6])}
        g_base = jax.grad(loss_unsharded)(p)
        g_shard = jax.grad(loss_sharded)(p)
        for k in p:
            np.testing.assert_allclose(
                np.asarray(g_shard[k]), np.asarray(g_base[k]),
                rtol=2e-3, atol=2e-6)


class TestShardedStage:
    def test_stage_recovers_translation(self, mesh):
        """A full sharded stage must recover the known shift as well as
        the unsharded stage does (same seeds -> near-identical path)."""
        fixed, moving = _pair(seed=7)
        stage = make_reg_param_map("translation", 96, num_resolutions=2)
        p_base, _ = reg_engine.register_stage(
            fixed, moving, stage, kind="translation")
        p_shard, _ = reg_engine.register_stage(
            fixed, moving, stage, kind="translation", mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(p_shard["t"]), np.asarray(p_base["t"]), atol=0.2)
        # moving(x) = fixed(x + t), so registration recovers -t
        np.testing.assert_allclose(
            np.asarray(p_shard["t"]), [-1.5, 2.0, -1.0], atol=0.5)

    def test_register_duo_sharded_bspline_chain(self, mesh):
        """Full translation->affine->bspline chain through the sharded
        engine reaches the same DSC as unsharded."""
        fixed, moving = _pair(seed=9)
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 64, num_resolutions=2)
        prof["reg_affine"] = make_reg_param_map(
            "affine", 64, num_resolutions=2)
        prof["reg_bspline"] = make_reg_param_map(
            "bspline", 32, grid_space_voxels=12, num_resolutions=2)
        moved_b, res_b = reg_engine.register_duo(
            np.asarray(fixed), np.asarray(moving), prof)
        moved_s, res_s = reg_engine.register_duo(
            np.asarray(fixed), np.asarray(moving), prof, mesh=mesh)
        dsc_b = res_b.metrics["dsc_fixed_moved"]
        dsc_s = res_s.metrics["dsc_fixed_moved"]
        assert dsc_s > 0.9
        assert abs(dsc_s - dsc_b) < 0.03


class TestShardedGroupwise:
    def test_groupwise_dp_sharded_matches(self, mesh):
        """Subjects sharded over dp: same mean image/params as the
        unsharded joint optimization (sharding propagation only changes
        reduction layout)."""
        rng = np.random.default_rng(11)
        shape = (20, 24, 22)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        base = np.zeros(shape, np.float32)
        for cz, cy, cx in np.column_stack(
                [rng.uniform(4, s - 4, 15) for s in shape]):
            base += np.exp(
                -((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
        base /= base.max()
        imgs = []
        for i in range(4):
            shift = rng.uniform(-2, 2, 3)
            imgs.append(np.asarray(transform.resample(
                jnp.asarray(base), {"t": jnp.asarray(shift)},
                "translation", shape)))
        dp_mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        mean_b, params_b = reg_engine.register_groupwise(
            imgs, max_iter=48, num_resolutions=1)
        mean_s, params_s = reg_engine.register_groupwise(
            imgs, max_iter=48, num_resolutions=1, mesh=dp_mesh)
        np.testing.assert_allclose(mean_s, mean_b, rtol=1e-3, atol=1e-4)
        for pb, ps in zip(params_b, params_s):
            np.testing.assert_allclose(
                ps["t"], pb["t"], rtol=1e-3, atol=1e-3)

    def test_groupwise_bspline_stage_dp_sharded(self):
        """The joint FFD refinement also runs with subjects dp-sharded
        (per-subject control lattices shard over dp; the variance
        reduction crosses devices via propagation-inserted collectives)."""
        rng = np.random.default_rng(13)
        shape = (16, 20, 18)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        base = np.zeros(shape, np.float32)
        for cz, cy, cx in np.column_stack(
                [rng.uniform(4, s - 4, 10) for s in shape]):
            base += np.exp(
                -((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / 5.0)
        base /= base.max()
        imgs = []
        for i in range(4):
            shift = rng.uniform(-1.5, 1.5, 3)
            imgs.append(np.asarray(transform.resample(
                jnp.asarray(base), {"t": jnp.asarray(shift)},
                "translation", shape)))
        dp_mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        mean_b, params_b = reg_engine.register_groupwise(
            imgs, max_iter=24, num_resolutions=1, bspline_iter=16,
            grid_space_voxels=10.0)
        mean_s, params_s = reg_engine.register_groupwise(
            imgs, max_iter=24, num_resolutions=1, bspline_iter=16,
            grid_space_voxels=10.0, mesh=dp_mesh)
        np.testing.assert_allclose(mean_s, mean_b, rtol=2e-3, atol=2e-4)
        for pb, ps in zip(params_b, params_s):
            assert "grid" in pb and "grid" in ps
            np.testing.assert_allclose(
                ps["grid"], pb["grid"], rtol=2e-3, atol=2e-3)
