"""Step-level checkpoint/resume via Orbax (TPU-native persistence).

The reference's resumability is artifact-level only — every stage writes
a file and ``pipelines.sh get_image_files`` skips stages whose outputs
exist (reference ``bin/pipelines.sh:137+``; SURVEY §5). This module adds
the step-level tier production TPU jobs expect: registration stages and
classifier training states persist as Orbax checkpoints, so a preempted
multi-stage registration resumes at its last completed stage instead of
restarting the schedule.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

_logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Dict[str, Any]) -> str:
    """Save a pytree of arrays to an Orbax checkpoint directory."""
    import jax

    path = os.path.abspath(path)
    _checkpointer().save(
        path, jax.tree_util.tree_map(np.asarray, tree), force=True)
    return path


def load_pytree(path: str) -> Optional[Dict[str, Any]]:
    """Load a checkpointed pytree; None when absent."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    return _checkpointer().restore(path)


class RegistrationCheckpoint:
    """Per-stage registration checkpointing.

    ``register_duo(..., checkpoint_dir=...)`` saves each completed
    stage's transform parameters under ``<dir>/<kind>``; on rerun,
    completed stages restore instead of re-optimizing (the Elastix
    schedule's translation/affine/bspline stages become resumable
    units).
    """

    def __init__(self, ckpt_dir: str):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)

    def stage_path(self, kind: str) -> str:
        return os.path.join(self.dir, kind)

    def load_stage(self, kind: str) -> Optional[Dict[str, np.ndarray]]:
        out = load_pytree(self.stage_path(kind))
        if out is not None:
            _logger.info("resumed %s stage from %s", kind, self.dir)
        return out

    def save_stage(self, kind: str, params: Dict[str, Any]) -> None:
        save_pytree(self.stage_path(kind), dict(params))


def save_classifier_state(path: str, clf) -> str:
    """Persist a BlobClassifier's parameters as an Orbax checkpoint."""
    import jax
    return save_pytree(path, {
        "params": jax.tree_util.tree_map(np.asarray, clf.params)})


def load_classifier_state(path: str):
    """Restore a BlobClassifier from an Orbax checkpoint (or None)."""
    state = load_pytree(path)
    if state is None:
        return None
    from magellanmapper_tpu.cv.classifier import BlobClassifier
    return BlobClassifier(params=state["params"])
