"""Multi-chip whole-stack detection: blocks sharded across the mesh.

The production scale-out path (SURVEY.md §2.10 mapping): the host block
grid from ``cv.stack_detect`` feeds batches whose leading (block) axis is
sharded across all devices, so XLA partitions the already-batched
detection program — each chip detects its blocks independently (the
embarrassingly-parallel axis), with no collectives needed until the host
merges blobs. Complements ``parallel.halo`` (one volume sharded
spatially *within* chips via ICI halo exchange).
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import detector, stack_detect

_logger = logging.getLogger(__name__)


def detect_blobs_blocks_sharded(
        image: np.ndarray,
        settings,
        resolutions: Sequence[float],
        mesh: Optional[Mesh] = None,
        preprocess: bool = False,
) -> Tuple[Optional[np.ndarray], Dict[str, float]]:
    """Whole-stack detection with the block batch sharded over devices.

    Single-channel path; block geometry, border exclusion, and
    cross-block pruning reuse ``cv.stack_detect`` semantics. Batches are
    padded to the device count so every shard gets equal work.
    """
    import time as _time
    from magellanmapper_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(dp=len(jax.devices()), sp=1)
    n_dev = mesh.shape["dp"] * mesh.shape["sp"]

    shape = image.shape[:3]
    blocks = stack_detect.setup_blocks(settings, shape, resolutions)
    grid_shape = blocks.sub_roi_slices.shape
    block_shape = np.minimum(
        blocks.max_pixels + blocks.overlap, shape)
    capacity = stack_detect._choose_capacity(
        settings, int(np.prod(block_shape)))
    scaling_factor = detector.calc_scaling_factor(resolutions)[2]
    sigmas = tuple(detector.sigma_list(
        settings["min_sigma_factor"] * scaling_factor,
        settings["max_sigma_factor"] * scaling_factor,
        settings["num_sigma"]))

    coords_list = list(np.ndindex(*grid_shape))
    last_coord = np.asarray(grid_shape) - 1
    seg_rois = np.full(grid_shape, None, dtype=object)
    sharding = NamedSharding(mesh, P(("dp", "sp")))

    t0 = _time.time()
    for i0 in range(0, len(coords_list), n_dev):
        batch_coords = coords_list[i0:i0 + n_dev]
        starts = [stack_detect._window_for_block(
            shape, blocks.sub_rois_offsets[c], block_shape)
            for c in batch_coords]
        from magellanmapper_tpu import native
        stacked = native.extract_blocks(
            np.asarray(image) if not isinstance(image, np.ndarray)
            else image, np.asarray(starts), block_shape)
        n_real = len(batch_coords)
        if n_real < n_dev:  # pad the batch to the device count
            pad = np.repeat(stacked[-1:], n_dev - n_real, axis=0)
            stacked = np.concatenate([stacked, pad])
        with mesh:
            batch = jax.device_put(jnp.asarray(stacked), sharding)
            raw_b, valid_b, _count_b = stack_detect._detect_batch(
                batch, sigmas, float(settings["detection_threshold"]),
                float(settings["overlap"]), capacity, None, None)
        raw_b = np.asarray(raw_b)[:n_real]
        valid_b = np.asarray(valid_b)[:n_real]

        for bi, coord in enumerate(batch_coords):
            raw = raw_b[bi][valid_b[bi]]
            if raw.shape[0] == 0:
                continue
            raw[:, 3] *= math.sqrt(3)
            segs = blobs_mod.Blobs(raw).format_blobs(0)
            blobs_mod.Blobs.shift_blob_rel_coords(segs, starts[bi])
            blobs_mod.Blobs.shift_blob_abs_coords(segs, starts[bi])
            sl = blocks.sub_roi_slices[coord]
            lo = np.asarray([s.start for s in sl])
            hi = np.asarray([s.stop for s in sl])
            keep = np.all(
                (segs[:, :3] >= lo) & (segs[:, :3] < hi), axis=1)
            seg_rois[coord] = segs[keep]
    t_detect = _time.time() - t0

    t0 = _time.time()
    blobs_all = stack_detect.prune_blobs(seg_rois, blocks, shape, [0])
    timing = {"Detection": t_detect, "Pruning": _time.time() - t0}
    timing["Total_stack"] = sum(timing.values())
    return blobs_all, timing
