"""ICI halo exchange + sharded whole-volume blob detection.

TPU-native replacement for the reference's overlap-*recompute* strategy
(``magmap/cv/stack_detect.py:680`` prunes duplicates that both neighboring
mp workers detected): each device holds a z-shard, *communicates* its edge
slabs to neighbors over ICI (``ppermute`` inside ``shard_map``), detects on
interior+halo, and keeps only interior blobs — an exact partition with no
cross-device duplicates and no pruning pass.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from magellanmapper_tpu.cv import detector
from magellanmapper_tpu.cv.stack_detect import _blob_log_impl


def halo_exchange_z(
        local: jax.Array, halo: int, axis_name: str = "sp") -> jax.Array:
    """Extend a z-shard with ``halo`` planes from each neighbor over ICI.

    Boundary shards receive zero planes (the volume simply ends there,
    matching the constant-0 peak border of the detector).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # slab we send down (our low-z planes) goes to idx-1; up-slab to idx+1
    lo_slab = local[:halo]
    hi_slab = local[-halo:]
    # receive from idx+1 their low planes (append below our high end)
    from_up = jax.lax.ppermute(
        lo_slab, axis_name,
        perm=[(i, (i - 1) % n) for i in range(n)])
    # receive from idx-1 their high planes (prepend)
    from_down = jax.lax.ppermute(
        hi_slab, axis_name,
        perm=[(i, (i + 1) % n) for i in range(n)])
    # zero out wrapped halos at the global boundary
    from_down = jnp.where(idx == 0, jnp.zeros_like(from_down), from_down)
    from_up = jnp.where(idx == n - 1, jnp.zeros_like(from_up), from_up)
    return jnp.concatenate([from_down, local, from_up], axis=0)


def make_sharded_detector(
        mesh: Mesh, shard_shape: Tuple[int, int, int], halo: int,
        sigmas: Tuple[float, ...], threshold: float, overlap: float,
        capacity: int):
    """Build a jitted sharded whole-volume detection step.

    The returned function maps ``(dp, Z, Y, X)`` global volumes (z sharded
    over ``sp``, batch over ``dp``) to fixed-capacity blob buffers per
    shard with global z coordinates.

    Returns a function ``step(volume) -> (blobs, valid)`` with
    ``blobs: (dp, sp*capacity, 4)`` rows ``z,y,x,sigma`` (global coords).
    """
    shard_z = shard_shape[0]

    def per_shard(local: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # local: (1, shard_z, Y, X) — dp-local batch entry, z-shard
        vol = local[0]
        idx = jax.lax.axis_index("sp")
        extended = halo_exchange_z(vol, halo)
        raw, valid = _blob_log_impl(
            extended, sigmas, threshold, overlap, capacity)
        # keep interior detections only: z in [halo, halo + shard_z)
        z = raw[:, 0]
        interior = (z >= halo) & (z < halo + shard_z)
        valid = valid & interior
        # shift to global z
        raw = raw.at[:, 0].add(
            idx.astype(jnp.float32) * shard_z - halo)
        raw = jnp.where(valid[:, None], raw, 0.0)
        # gather every shard's buffer so each dp row sees all blobs
        raw_all = jax.lax.all_gather(raw, "sp").reshape(-1, 4)
        valid_all = jax.lax.all_gather(valid, "sp").reshape(-1)
        return raw_all[None], valid_all[None]

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=P("dp", "sp", None, None),
        out_specs=(P("dp", None, None), P("dp", None)),
        check_vma=False)
    return jax.jit(sharded)


def detect_blobs_sharded(
        volume: np.ndarray,
        settings,
        resolutions: Sequence[float],
        mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Whole-volume detection sharded over a device mesh.

    High-level entry: pads z to a multiple of the spatial axis, runs the
    sharded step, and returns an ``N x 10`` blob array (host).
    """
    from magellanmapper_tpu.parallel.mesh import make_mesh
    from magellanmapper_tpu.cv import blobs as blobs_mod

    if mesh is None:
        mesh = make_mesh()
    sp = mesh.shape["sp"]
    z, y, x = volume.shape[:3]
    halo = int(detector.calc_overlap(resolutions)[0])
    shard_z = -(-z // sp)
    pad_z = shard_z * sp - z
    vol = np.pad(volume.astype(np.float32), ((0, pad_z), (0, 0), (0, 0)))

    scaling_factor = detector.calc_scaling_factor(resolutions)[2]
    sigmas = tuple(detector.sigma_list(
        settings["min_sigma_factor"] * scaling_factor,
        settings["max_sigma_factor"] * scaling_factor,
        settings["num_sigma"]))
    capacity = int(settings["max_blobs_per_block"] or 4096)
    step = make_sharded_detector(
        mesh, (shard_z, y, x), halo, sigmas,
        float(settings["detection_threshold"]),
        float(settings["overlap"]), capacity)

    batch = vol[None]  # dp=1
    with mesh:
        sharding = NamedSharding(mesh, P("dp", "sp", None, None))
        batch = jax.device_put(batch, sharding)
        raw, valid = step(batch)
    raw = np.asarray(raw)[0]
    valid = np.asarray(valid)[0]
    out = raw[valid]
    if out.shape[0] == 0:
        return None
    out = out[out[:, 0] < z]  # drop pad-zone blobs
    out[:, 3] *= math.sqrt(3)
    return blobs_mod.Blobs(out).format_blobs(0)


def detect_blobs_sharded_stack(
        volume: np.ndarray,
        profiles,
        resolutions: Sequence[float],
        mesh: Optional[Mesh] = None,
        channels: Optional[Sequence[int]] = None) -> Optional[np.ndarray]:
    """Multichannel sharded whole-volume detection: channels loop over the
    single-channel sharded pipeline with per-channel profiles, channel
    stamped into the blob rows."""
    from magellanmapper_tpu.cv import blobs as blobs_mod

    multichannel = volume.ndim > 3
    if channels is None:
        channels = list(range(volume.shape[3])) if multichannel else [0]

    def get_prof(chl):
        if isinstance(profiles, (list, tuple)):
            return profiles[min(chl, len(profiles) - 1)]
        return profiles

    out = []
    for chl in channels:
        vol = volume[..., chl] if multichannel else volume
        blobs = detect_blobs_sharded(
            np.asarray(vol), get_prof(chl), resolutions, mesh=mesh)
        if blobs is None:
            continue
        blobs_mod.Blobs.set_blob_channel(blobs, chl)
        out.append(blobs)
    return np.vstack(out) if out else None
