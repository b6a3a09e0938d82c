"""Blob patch classifier (Flax CNN) — TensorFlow/Keras replacement.

Equivalent of ``magmap/cv/classifier.py``: ``extract_patches :16`` (2D
patches around blobs), ``classify_patches :58``, ``classify_blobs :149``
(writes predictions into the blobs' ``confirmed`` column),
``ClassifyImage.classify_whole_image :230`` (chunked whole-image
classification). The Keras model becomes a small Flax CNN with an optax
training loop; training/inference batch over the dp mesh axis naturally.
"""

from __future__ import annotations

import logging
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from flax import linen as nn
    import optax
    _FLAX = True
except ImportError:  # pragma: no cover
    _FLAX = False

from magellanmapper_tpu.cv import blobs as blobs_mod

_logger = logging.getLogger(__name__)

#: patch edge length in px (reference ``classifier.py:16``)
PATCH_SIZE = 16


if _FLAX:
    class PatchCNN(nn.Module):
        """Small CNN over 2D blob patches -> P(true blob)."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = x[..., None] if x.ndim == 3 else x
            x = nn.Conv(16, (3, 3))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(32, (3, 3))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape((x.shape[0], -1))
            x = nn.Dense(64)(x)
            x = nn.relu(x)
            x = nn.Dense(1)(x)
            return x[..., 0]


def extract_patches(
        roi: np.ndarray, blobs: np.ndarray,
        size: int = PATCH_SIZE) -> np.ndarray:
    """2D patches centered on each blob's x,y at its z-plane
    (reference ``extract_patches :16``)."""
    half = size // 2
    vol = np.asarray(roi, np.float32)
    padded = np.pad(vol, ((0, 0), (half, half), (half, half)),
                    mode="edge")
    patches = []
    for b in blobs:
        z = int(np.clip(round(b[0]), 0, vol.shape[0] - 1))
        y = int(np.clip(round(b[1]), 0, vol.shape[1] - 1))
        x = int(np.clip(round(b[2]), 0, vol.shape[2] - 1))
        patch = padded[z, y:y + size, x:x + size]
        lo, hi = patch.min(), patch.max()
        if hi > lo:
            patch = (patch - lo) / (hi - lo)
        patches.append(patch)
    return np.asarray(patches, np.float32).reshape(-1, size, size)


class BlobClassifier:
    """Train/apply a patch classifier; checkpoints via pickle."""

    def __init__(self, params=None, seed: int = 0):
        if not _FLAX:
            raise ImportError("flax is required for the blob classifier")
        self.model = PatchCNN()
        self.rng = jax.random.PRNGKey(seed)
        if params is None:
            dummy = jnp.zeros((1, PATCH_SIZE, PATCH_SIZE))
            params = self.model.init(self.rng, dummy)
        self.params = params

    # -- training -------------------------------------------------------------

    def train(
            self, patches: np.ndarray, labels: np.ndarray,
            epochs: int = 10, batch_size: int = 128,
            learning_rate: float = 1e-3) -> Dict[str, float]:
        """Train on patches with binary labels; returns final metrics."""
        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.params)
        x = jnp.asarray(patches)
        y = jnp.asarray(labels, jnp.float32)

        @jax.jit
        def step(params, opt_state, xb, yb):
            def loss_fn(p):
                logits = self.model.apply(p, xb, train=True)
                return optax.sigmoid_binary_cross_entropy(
                    logits, yb).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        n = len(x)
        rng = np.random.default_rng(0)
        loss = jnp.inf
        for _ in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n, batch_size):
                idx = order[i:i + batch_size]
                self.params, opt_state, loss = step(
                    self.params, opt_state, x[idx], y[idx])
        acc = float(jnp.mean(
            (self.predict(patches) > 0.5) == (y > 0.5)))
        return {"loss": float(loss), "accuracy": acc}

    def train_step_sharded(self, mesh, patches, labels,
                           learning_rate: float = 1e-3):
        """One dp-sharded training step (for multi-chip validation)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.params)

        @jax.jit
        def step(params, opt_state, xb, yb):
            def loss_fn(p):
                logits = self.model.apply(p, xb, train=True)
                return optax.sigmoid_binary_cross_entropy(
                    logits, yb).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        with mesh:
            xb = jax.device_put(
                jnp.asarray(patches), NamedSharding(mesh, P("dp")))
            yb = jax.device_put(
                jnp.asarray(labels, jnp.float32),
                NamedSharding(mesh, P("dp")))
            self.params, _, loss = step(self.params, opt_state, xb, yb)
        return float(loss)

    # -- inference ------------------------------------------------------------

    def predict(self, patches: np.ndarray, batch_size: int = 4096
                ) -> np.ndarray:
        """P(true blob) per patch."""
        @jax.jit
        def fwd(params, xb):
            return jax.nn.sigmoid(self.model.apply(params, xb))
        out = []
        x = jnp.asarray(patches)
        for i in range(0, len(x), batch_size):
            out.append(np.asarray(fwd(self.params, x[i:i + batch_size])))
        return np.concatenate(out) if out else np.zeros(0)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.params), f)

    @classmethod
    def load(cls, path: str) -> "BlobClassifier":
        with open(path, "rb") as f:
            params = pickle.load(f)
        return cls(params=params)


def classify_blobs(
        clf: BlobClassifier, roi: np.ndarray, blobs: np.ndarray,
        threshold: float = 0.5, channel: Optional[int] = None
) -> np.ndarray:
    """Classify blobs and write predictions into ``confirmed``
    (reference ``classify_blobs :149``)."""
    if blobs is None or len(blobs) == 0:
        return blobs
    mask = np.ones(len(blobs), bool)
    if channel is not None:
        mask = blobs_mod.Blobs.get_blobs_channel(blobs) == channel
    patches = extract_patches(roi, blobs[mask])
    probs = clf.predict(patches)
    confirmed = (probs >= threshold).astype(float)
    out = np.array(blobs)
    out[np.flatnonzero(mask), 4] = confirmed
    return out


def classify_whole_image(
        clf: BlobClassifier, image: np.ndarray, blobs: np.ndarray,
        chunk_planes: int = 100, **kwargs) -> np.ndarray:
    """Chunk-by-z-planes whole-image classification
    (reference ``ClassifyImage.classify_whole_image :230``)."""
    out = np.array(blobs)
    z = blobs[:, 0]
    for z0 in range(0, image.shape[0], chunk_planes):
        z1 = min(z0 + chunk_planes, image.shape[0])
        sel = (z >= z0) & (z < z1)
        if not sel.any():
            continue
        sub_blobs = np.array(blobs[sel])
        sub_blobs[:, 0] -= z0
        classified = classify_blobs(
            clf, image[z0:z1], sub_blobs, **kwargs)
        out[np.flatnonzero(sel), 4] = classified[:, 4]
    return out


def classify_patches(model, x: np.ndarray, thresh: float = 0.5
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Predictions and raw scores for a stack of patches
    (reference ``classifier.classify_patches :58``). ``model`` is a
    :class:`BlobClassifier` or anything with a ``predict`` method."""
    y_score = np.asarray(model.predict(x)).squeeze()
    y_pred = (y_score > thresh).astype(int)
    return y_pred, y_score


def setup_classification_roi(
        image5d: np.ndarray, subimg_offset: Sequence[int],
        subimg_size: Sequence[int], blobs, patch_size: int,
        blobs_relative: bool = False):
    """Extract a sub-image with an xy border of ``patch_size // 2`` so
    edge blobs get full patches (reference
    ``classifier.setup_classification_roi :80``).

    Returns ``(roi, blobs_roi_relative, border)`` where blobs outside
    the core sub-image are dropped and coordinates become relative to
    the bordered ROI's origin.
    """
    half = patch_size // 2
    vol = image5d[0] if image5d.ndim >= 4 else image5d
    shape = vol.shape[:3]
    off = np.asarray(subimg_offset, int)
    size = np.asarray(subimg_size, int)
    # border only in y,x (patches are 2D); clamp to image bounds
    lo = np.array([off[0], max(off[1] - half, 0), max(off[2] - half, 0)])
    hi = np.array([
        min(off[0] + size[0], shape[0]),
        min(off[1] + size[1] + half, shape[1]),
        min(off[2] + size[2] + half, shape[2])])
    roi = vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    border = off - lo

    arr = blobs.blobs if hasattr(blobs, "blobs") else blobs
    if arr is None or len(arr) == 0:
        return roi, arr, border
    coords = np.array(arr[:, :3], float)
    if not blobs_relative:
        coords = coords - off
    # keep blobs inside the core sub-image
    keep = np.all((coords >= 0) & (coords < size), axis=1)
    rel = np.array(arr[keep])
    rel[:, :3] = coords[keep] + border
    return roi, rel, border


class ClassifyImage:
    """Whole-image classification facade (reference
    ``classifier.ClassifyImage :221``); the reference chunks planes
    across processes, here chunks run through the jitted patch CNN in
    device batches via :func:`classify_whole_image`."""

    def __init__(self, clf: BlobClassifier, image5d: np.ndarray,
                 blobs=None):
        self.clf = clf
        self.image5d = image5d
        self.blobs = blobs

    def classify_whole_image(self, blobs=None, **kwargs) -> np.ndarray:
        arr = blobs if blobs is not None else (
            self.blobs.blobs if hasattr(self.blobs, "blobs")
            else self.blobs)
        vol = self.image5d[0] if self.image5d.ndim >= 4 else self.image5d
        if vol.ndim > 3:
            vol = vol[..., 0]
        return classify_whole_image(self.clf, vol, arr, **kwargs)
