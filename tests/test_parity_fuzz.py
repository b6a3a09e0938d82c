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
