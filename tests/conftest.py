"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/halo-exchange code
is validated on 8 virtual CPU devices. The environment's ``sitecustomize``
pre-imports jax with the remote-TPU platform, so plain env vars are too
late — ``jax.config.update`` is required.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax fallback
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(42)
