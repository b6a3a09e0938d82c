"""Randomized parity battery: TPU detector vs scipy reference.

Sweeps random detection configurations (sigma ranges, thresholds,
overlaps, volume shapes, blob densities) and requires >=97% Hungarian
agreement with the independently-implemented scipy pipeline on every
draw — the fuzz version of the SURVEY.md §7 parity gate.
"""

import numpy as np
import pytest

from magellanmapper_tpu.cv import detector, ref_detect


def random_config(rng):
    min_s = rng.uniform(1.5, 3.0)
    return {
        "shape": tuple(rng.integers(24, 56, 3)),
        "n": int(rng.integers(5, 40)),
        "min_sigma": min_s,
        "max_sigma": min_s + rng.uniform(0.5, 2.5),
        "num_sigma": int(rng.integers(3, 9)),
        "threshold": float(rng.uniform(0.05, 0.2)),
        "overlap": float(rng.uniform(0.2, 0.8)),
        "noise": float(rng.uniform(0.0, 0.05)),
    }


def make_vol(rng, cfg):
    shape = cfg["shape"]
    vol = rng.normal(scale=cfg["noise"], size=shape).astype(np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    for c in np.column_stack(
            [rng.uniform(4, s - 4, cfg["n"]) for s in shape]):
        sig = rng.uniform(cfg["min_sigma"], cfg["max_sigma"])
        vol += np.exp(-((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                        + (xx - c[2]) ** 2) / (2 * sig ** 2))
    vol = np.clip(vol, 0, None)
    return vol / max(vol.max(), 1e-6)


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_fuzz_parity(seed):
    rng = np.random.default_rng(seed)
    cfg = random_config(rng)
    vol = make_vol(rng, cfg)
    sigmas = tuple(detector.sigma_list(
        cfg["min_sigma"], cfg["max_sigma"], cfg["num_sigma"]))
    raw, valid = detector.blob_log(
        vol, sigmas, cfg["threshold"], cfg["overlap"], 4096)
    ours = np.asarray(raw)[np.asarray(valid)]
    ref = ref_detect.blob_log_reference(
        vol, cfg["min_sigma"], cfg["max_sigma"], cfg["num_sigma"],
        cfg["threshold"], cfg["overlap"])
    larger = max(len(ours), len(ref))
    if larger == 0:
        return
    tol = (2, 2, 2)
    n_match = ref_detect.match_blob_sets(ours[:, :3], ref[:, :3], tol)
    assert n_match >= 0.97 * larger, (
        cfg, len(ours), len(ref), n_match)


@pytest.mark.parametrize("seed", [606, 707, 808])
def test_fuzz_parity_extra_seeds(seed):
    test_fuzz_parity(seed)


class TestDetectorEdgeCases:
    def test_capacity_overflow_keeps_brightest(self, rng):
        """More peaks than capacity: the buffer keeps the highest-value
        peaks (top-k by response, the fixed-capacity contract)."""
        shape = (40, 60, 60)
        vol = np.zeros(shape, np.float32)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        centers = []
        amps = []
        k = 0
        for z in range(6, 40, 8):
            for y in range(6, 60, 8):
                for x in range(6, 60, 8):
                    amp = 0.3 + 0.7 * (k % 7) / 6
                    vol += amp * np.exp(
                        -((zz - z) ** 2 + (yy - y) ** 2 + (xx - x) ** 2)
                        / 6.0)
                    centers.append((z, y, x))
                    amps.append(amp)
                    k += 1
        vol /= vol.max()
        sigmas = tuple(detector.sigma_list(1.5, 3.0, 4))
        capacity = 32      # far fewer than ~196 planted blobs
        raw, valid = detector.blob_log(vol, sigmas, 0.05, 0.5, capacity)
        raw = np.asarray(raw)
        valid = np.asarray(valid)
        assert valid.sum() == capacity
        # kept blobs should come from the brighter half of the planted set
        kept = raw[valid][:, :3]
        centers = np.asarray(centers, float)
        amps = np.asarray(amps)
        from scipy.spatial import cKDTree
        tree = cKDTree(centers)
        d, idx = tree.query(kept)
        assert np.median(amps[idx]) >= np.median(amps)

    def test_high_threshold_empty(self):
        vol = np.random.default_rng(0).random((24, 24, 24)) \
            .astype(np.float32) * 0.1
        sigmas = tuple(detector.sigma_list(1.5, 3.0, 4))
        raw, valid = detector.blob_log(vol, sigmas, 5.0, 0.5, 256)
        assert np.asarray(valid).sum() == 0

    def test_single_voxel_spike_not_blob_scale(self):
        """A 1-voxel spike produces at most a tiny-sigma response; with
        sigmas starting at 2 it should not dominate real blobs."""
        shape = (32, 32, 32)
        vol = np.zeros(shape, np.float32)
        zz, yy, xx = np.indices(shape).astype(np.float32)
        vol += np.exp(-((zz-16)**2 + (yy-16)**2 + (xx-16)**2) / 8.0)
        vol[4, 4, 4] = 1.0  # hot pixel
        sigmas = tuple(detector.sigma_list(2.0, 4.0, 4))
        raw, valid = detector.blob_log(vol, sigmas, 0.1, 0.5, 64)
        kept = np.asarray(raw)[np.asarray(valid)]
        # the real blob at (16,16,16) must be the strongest detection
        d = np.linalg.norm(kept[:, :3] - 16, axis=1)
        assert (d < 3).any()
