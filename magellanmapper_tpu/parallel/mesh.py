"""Device mesh construction for spatial-parallel volume processing.

The reference scales by farming overlap-halo blocks to an ``mp.Pool``
(``magmap/cv/chunking.py:143``); the TPU-native mapping (SURVEY.md §2.10)
is a ``jax.sharding.Mesh`` whose axes carry:

 - ``dp``: data parallel over independent blocks/volumes,
 - ``sp``: spatial parallel over z within one volume (halo exchange over
   ICI via ``ppermute`` instead of overlap recompute),
 - ``spy``: spatial parallel over y, for plane sizes that exceed one
   chip's HBM (always present; size 1 unless requested).
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
        devices: Optional[Sequence] = None,
        spy: int = 1) -> Mesh:
    """Build a ``(dp, sp, spy)`` mesh over the available devices.

    Defaults put all devices on the z spatial axis (whole-volume scaling,
    the common whole-brain case); pass ``dp`` to trade devices into block
    parallelism and ``spy`` to split planes over y as well.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    spatial = n_devices // max(1, spy)
    if dp is None and sp is None:
        dp, sp = 1, spatial
    elif dp is None:
        dp = spatial // sp
    elif sp is None:
        sp = spatial // dp
    if dp * sp * spy != n_devices:
        raise ValueError(
            f"dp ({dp}) x sp ({sp}) x spy ({spy}) must equal device "
            f"count {n_devices}")
    arr = np.asarray(devices).reshape(dp, sp, spy)
    return Mesh(arr, axis_names=("dp", "sp", "spy"))
