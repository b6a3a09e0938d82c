"""Device mesh construction for spatial-parallel volume processing.

The reference scales by farming overlap-halo blocks to an ``mp.Pool``
(``magmap/cv/chunking.py:143``); the TPU-native mapping (SURVEY.md §2.10)
is a ``jax.sharding.Mesh`` whose axes carry:

 - ``dp``: data parallel over independent blocks/volumes,
 - ``sp``: spatial parallel over z within one volume (halo exchange over
   ICI via ``ppermute`` instead of overlap recompute).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
        n_devices: Optional[int] = None,
        dp: Optional[int] = None,
        sp: Optional[int] = None,
        devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the available devices.

    Defaults put all devices on the spatial axis (whole-volume scaling,
    the common whole-brain case); pass ``dp`` to trade devices into block
    parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if dp is None and sp is None:
        dp, sp = 1, n_devices
    elif dp is None:
        dp = n_devices // sp
    elif sp is None:
        sp = n_devices // dp
    if dp * sp != n_devices:
        raise ValueError(
            f"dp ({dp}) x sp ({sp}) must equal device count {n_devices}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))
