"""Parity tests: JAX filtering ops vs scipy.ndimage."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from magellanmapper_tpu.ops import filters


@pytest.fixture
def vol(rng):
    return rng.normal(size=(20, 31, 27)).astype(np.float32)


class TestGaussian:
    @pytest.mark.parametrize("sigma", [0.8, 2.0, 3.7])
    @pytest.mark.parametrize("mode", ["reflect", "nearest", "constant",
                                      "mirror"])
    def test_gaussian_filter_matches_scipy(self, vol, sigma, mode):
        ours = np.asarray(filters.gaussian_filter(vol, sigma, mode=mode))
        ref = ndi.gaussian_filter(vol, sigma, mode=mode)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_anisotropic_sigma(self, vol):
        sigma = (1.0, 2.5, 0.9)
        ours = np.asarray(filters.gaussian_filter(vol, sigma))
        ref = ndi.gaussian_filter(vol, sigma)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("sigma", [1.0, 2.6])
    def test_gaussian_laplace_matches_scipy(self, vol, sigma):
        ours = np.asarray(filters.gaussian_laplace(vol, sigma))
        ref = ndi.gaussian_laplace(vol, sigma)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)

    def test_kernel_matches_scipy_order2(self):
        # order-2 kernel equals scipy's derivative-of-Gaussian weights
        sigma = 1.7
        ours = filters.gaussian_kernel1d(sigma, order=2)
        x = np.arange(-int(4 * sigma + 0.5), int(4 * sigma + 0.5) + 1)
        base = np.zeros(len(x))
        base[len(x) // 2] = 1.0
        ref = ndi.gaussian_filter1d(base, sigma, order=2)
        np.testing.assert_allclose(ours, ref[::-1], rtol=1e-9, atol=1e-12)

    def test_long_axis_tap_path(self, rng):
        # axis beyond the matmul cutoff exercises the conv path
        vol = rng.normal(size=(4, 900)).astype(np.float32)
        ours = np.asarray(filters.gaussian_filter(vol, (0.0, 2.0)))
        ref = ndi.gaussian_filter1d(vol, 2.0, axis=1)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


class TestMorphology:
    def test_erosion_matches_scipy(self, vol):
        fp = filters.octahedron_footprint(1)
        ours = np.asarray(filters.erosion(vol, fp))
        ref = ndi.grey_erosion(vol, footprint=fp, mode="reflect")
        np.testing.assert_allclose(ours, ref)

    def test_dilation_matches_scipy(self, vol):
        fp = filters.ball_footprint(2)
        ours = np.asarray(filters.dilation(vol, fp))
        ref = ndi.grey_dilation(vol, footprint=fp, mode="reflect")
        np.testing.assert_allclose(ours, ref)

    def test_footprints(self):
        assert filters.octahedron_footprint(1).sum() == 7
        assert filters.cube_footprint(3).sum() == 27


class TestLogPyramidLongAxis:
    def test_falls_back_to_taps_past_matmul_crossover(self):
        """log_pyramid on a volume with an axis beyond _MATMUL_MAX_LEN
        must not build dense (S, n, n) band stacks — the per-sigma
        gaussian_laplace fallback matches scipy on every scale."""
        rng = np.random.default_rng(11)
        vol = rng.random((4, 6, filters._MATMUL_MAX_LEN + 32)
                         ).astype(np.float32)
        sigmas = [1.5, 2.5]
        out = np.asarray(filters.log_pyramid(vol, sigmas))
        for i, s in enumerate(sigmas):
            want = -ndi.gaussian_laplace(
                vol.astype(np.float64), s) * s * s
            np.testing.assert_allclose(
                out[i], want, atol=2e-4)


class TestNegativeThresholdPeaks:
    def test_find_peaks_negative_threshold_keeps_negative_peaks(self):
        """Thresholds <= 0 must not clamp interior maxima to >= 0
        (skimage maximum_filter mode='constant' only zero-pads the
        border)."""
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import peaks
        cube = np.full((5, 7, 7), -2.0, np.float32)
        cube[2, 3, 3] = -0.5        # interior local max, negative value
        coords, vals, count = peaks.find_peaks(
            jnp.asarray(cube), -1.0, 8)
        assert int(count) == 1
        np.testing.assert_array_equal(
            np.asarray(coords)[0], (2, 3, 3))
