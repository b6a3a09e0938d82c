"""Blob classifier tests (Flax CNN)."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import classifier


def make_patch_data(n=200, seed=0):
    """Bright-center patches = true blobs; flat noise = false."""
    rng = np.random.default_rng(seed)
    size = classifier.PATCH_SIZE
    yy, xx = np.indices((size, size)).astype(np.float32)
    blob = np.exp(-((yy - size / 2) ** 2 + (xx - size / 2) ** 2) / 8.0)
    pos = blob[None] + rng.normal(0, 0.1, (n // 2, size, size))
    neg = rng.normal(0.3, 0.15, (n // 2, size, size))
    x = np.concatenate([pos, neg]).astype(np.float32)
    y = np.concatenate([np.ones(n // 2), np.zeros(n // 2)])
    order = rng.permutation(n)
    return x[order], y[order]


class TestClassifier:
    def test_train_and_predict(self):
        x, y = make_patch_data()
        clf = classifier.BlobClassifier()
        stats = clf.train(x, y, epochs=20)
        assert stats["accuracy"] >= 0.9

    def test_extract_patches_centered(self):
        roi = np.zeros((5, 32, 32), np.float32)
        roi[2, 16, 16] = 1.0
        blobs = np.array([[2.0, 16, 16, 3]])
        patches = classifier.extract_patches(roi, blobs)
        assert patches.shape == (1, 16, 16)
        # bright voxel lands at the patch center
        cy, cx = np.unravel_index(patches[0].argmax(), patches[0].shape)
        assert abs(cy - 8) <= 1 and abs(cx - 8) <= 1

    def test_classify_blobs_sets_confirmed(self):
        # train on patches EXTRACTED the same way inference extracts them:
        # blob sites vs empty sites in a noisy volume
        rng = np.random.default_rng(1)
        size = classifier.PATCH_SIZE
        vol = rng.normal(0.3, 0.1, (8, 128, 128)).astype(np.float32)
        yy, xx = np.indices((size, size)).astype(np.float32)
        stamp = np.exp(-((yy - 8) ** 2 + (xx - 8) ** 2) / 8.0)
        pos_sites = np.column_stack([
            rng.integers(0, 8, 60), rng.integers(10, 60, 60),
            rng.integers(10, 118, 60)])
        for z, y, x in pos_sites:
            vol[z, y - 8:y + 8, x - 8:x + 8] += stamp
        neg_sites = np.column_stack([
            rng.integers(0, 8, 60), rng.integers(70, 118, 60),
            rng.integers(10, 118, 60)])
        sites = np.vstack([pos_sites, neg_sites]).astype(float)
        sites = np.column_stack([sites, np.full(len(sites), 3.0)])
        patches = classifier.extract_patches(vol, sites)
        labels = np.concatenate([np.ones(60), np.zeros(60)])
        clf = classifier.BlobClassifier()
        stats = clf.train(patches, labels, epochs=25)
        assert stats["accuracy"] >= 0.9

        blobs = np.array([
            [float(pos_sites[0][0]), pos_sites[0][1], pos_sites[0][2],
             3, -1, -1, 0, 0, 0, 0],
            [2.0, 100, 60, 3, -1, -1, 0, 0, 0, 0]])
        out = classifier.classify_blobs(clf, vol, blobs)
        assert out[0, 4] == 1.0
        assert out[1, 4] == 0.0
        # whole-image chunked path agrees
        out2 = classifier.classify_whole_image(
            clf, vol, blobs, chunk_planes=4)
        np.testing.assert_array_equal(out2[:, 4], out[:, 4])

    def test_save_load(self, tmp_path):
        clf = classifier.BlobClassifier()
        path = str(tmp_path / "model.pkl")
        clf.save(path)
        clf2 = classifier.BlobClassifier.load(path)
        x, _ = make_patch_data(20)
        np.testing.assert_allclose(
            clf.predict(x), clf2.predict(x), rtol=1e-6)

    def test_sharded_train_step(self):
        import jax
        from magellanmapper_tpu.parallel import mesh as mesh_mod
        x, y = make_patch_data(64)
        clf = classifier.BlobClassifier()
        m = mesh_mod.make_mesh(8, dp=8, sp=1)
        loss = clf.train_step_sharded(m, x, y)
        assert np.isfinite(loss)
