"""Step-level checkpoint/resume (Orbax) for registration + classifier."""

import numpy as np
import jax.numpy as jnp
import pytest

from magellanmapper_tpu.atlas import reg_engine, transform
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)
from magellanmapper_tpu.utils import checkpoint


def blobby(seed=0, shape=(32, 32, 32)):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(8, s - 8, 15) for s in shape]):
        vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 14.0)
    return vol / vol.max()


class TestPytreeRoundtrip:
    def test_save_load(self, tmp_path):
        tree = {"W": np.eye(3, dtype=np.float32),
                "t": np.asarray([1.0, 2.0, 3.0], np.float32)}
        p = checkpoint.save_pytree(str(tmp_path / "ck"), tree)
        back = checkpoint.load_pytree(p)
        np.testing.assert_array_equal(back["W"], tree["W"])
        np.testing.assert_array_equal(back["t"], tree["t"])

    def test_missing_returns_none(self, tmp_path):
        assert checkpoint.load_pytree(str(tmp_path / "nope")) is None


class TestRegistrationResume:
    def test_stages_restore_and_skip(self, tmp_path, monkeypatch):
        fixed = blobby(seed=1)
        moving = np.asarray(transform.resample(
            jnp.asarray(fixed), {"t": jnp.asarray([-2.0, 1.0, -1.0])},
            "translation", fixed.shape))
        prof = AtlasProfile()
        prof["reg_translation"] = make_reg_param_map(
            "translation", 48, metric="ncc", num_resolutions=2)
        prof["reg_affine"] = make_reg_param_map(
            "affine", 48, metric="ncc", num_resolutions=2)
        prof["reg_bspline"] = None
        ckdir = str(tmp_path / "reg_ck")

        moved1, res1 = reg_engine.register_duo(
            fixed, moving, prof, checkpoint_dir=ckdir)

        # second run must RESTORE both stages, not re-optimize
        calls = []
        orig = reg_engine.register_stage

        def spy(*a, **kw):
            calls.append(kw.get("kind") or a[2].get("map_name"))
            return orig(*a, **kw)

        monkeypatch.setattr(reg_engine, "register_stage", spy)
        moved2, res2 = reg_engine.register_duo(
            fixed, moving, prof, checkpoint_dir=ckdir)
        assert calls == []          # every stage came from the checkpoint
        d1 = dict(res1.stages)
        d2 = dict(res2.stages)
        for kind in ("translation", "affine"):
            for k in d1[kind]:
                np.testing.assert_allclose(d1[kind][k], d2[kind][k])
        np.testing.assert_allclose(moved1, moved2, atol=1e-5)


class TestClassifierCheckpoint:
    def test_roundtrip_predictions(self, tmp_path):
        from magellanmapper_tpu.cv.classifier import (
            BlobClassifier, PATCH_SIZE)
        rng = np.random.default_rng(0)
        patches = rng.random((16, PATCH_SIZE, PATCH_SIZE)).astype(
            np.float32)
        labels = (rng.random(16) > 0.5).astype(np.float32)
        clf = BlobClassifier()
        clf.train(patches, labels, epochs=2)
        p = checkpoint.save_classifier_state(
            str(tmp_path / "clf_ck"), clf)
        clf2 = checkpoint.load_classifier_state(p)
        np.testing.assert_allclose(
            clf.predict(patches), clf2.predict(patches), atol=1e-6)
