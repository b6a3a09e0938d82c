"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from magellanmapper_tpu.ops import pallas_kernels, peaks


class TestPrunePallas:
    @pytest.mark.parametrize("k,n_blobs", [(128, 60), (512, 300),
                                           (600, 600)])
    def test_matches_jnp_implementation(self, rng, k, n_blobs):
        coords = rng.uniform(0, 80, (k, 3)).astype(np.float32)
        sigmas = rng.uniform(1.5, 4.0, k).astype(np.float32)
        valid = np.zeros(k, bool)
        valid[:n_blobs] = True
        ref = np.asarray(peaks.prune_overlapping_blobs(
            jnp.asarray(coords), jnp.asarray(sigmas), jnp.asarray(valid),
            0.5))
        out = np.asarray(pallas_kernels.prune_overlap_pallas(
            jnp.asarray(coords), jnp.asarray(sigmas), jnp.asarray(valid),
            0.5, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_no_overlaps_keeps_all(self, rng):
        # well-separated blobs: nothing pruned
        coords = (np.indices((4, 4, 4)).reshape(3, -1).T * 50).astype(
            np.float32)
        k = len(coords)
        sigmas = np.full(k, 2.0, np.float32)
        valid = np.ones(k, bool)
        out = np.asarray(pallas_kernels.prune_overlap_pallas(
            jnp.asarray(coords), jnp.asarray(sigmas), jnp.asarray(valid),
            0.5, interpret=True))
        assert out.all()

    def test_identical_pair_prunes_one(self):
        coords = np.array([[10.0, 10, 10], [10, 10, 10.5],
                           [50, 50, 50]], np.float32)
        sigmas = np.array([2.0, 3.0, 2.0], np.float32)
        valid = np.ones(3, bool)
        out = np.asarray(pallas_kernels.prune_overlap_pallas(
            jnp.asarray(coords), jnp.asarray(sigmas), jnp.asarray(valid),
            0.5, interpret=True))
        # smaller of the overlapping pair (index 0) loses; both others stay
        np.testing.assert_array_equal(out, [False, True, True])


class TestFusedPeaks:
    @pytest.mark.parametrize("shape", [(4, 6, 32, 128), (3, 5, 20, 130)])
    def test_fused_matches_find_peaks(self, rng, shape):
        cube = np.full(shape, -0.05, np.float32)
        cs = np.column_stack([rng.integers(0, s, 40) for s in shape])
        for c in cs:
            cube[tuple(c)] = rng.uniform(0.2, 1.0)
        rc, rv, rn = peaks.find_peaks(jnp.asarray(cube), 0.1, 64)
        oc, ov, on = pallas_kernels.find_peaks_fused(
            jnp.asarray(cube), 0.1, 64, interpret=True)
        k = int(rn)
        assert int(on) == k
        np.testing.assert_allclose(np.asarray(ov)[:k], np.asarray(rv)[:k])
        assert ({tuple(r) for r in np.asarray(rc)[:k]}
                == {tuple(r) for r in np.asarray(oc)[:k]})
