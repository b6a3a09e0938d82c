"""3D Laplacian-of-Gaussian blob detection — the #1 hot path, on TPU.

Functional re-design of the reference detector (``magmap/cv/detector.py:874``
``detect_blobs``): the whole pipeline — optional isotropic resample,
spectral unmixing, scale-normalized LoG pyramid, 4D local-maxima peak
extraction, and sphere-overlap pruning — is one jittable program with
static shapes (fixed-capacity blob buffers + validity masks), compiled once
per (block shape, profile) and reused across every block of a stack.

Differences from the reference by design:
 - ``skimage.feature.blob_log`` (Cython/C on CPU) becomes separable
   Gaussian-derivative convolutions expressed as MXU band matmuls
   (``ops.filters``) plus a separable 4D max-filter peak finder
   (``ops.peaks``) — no host round trips inside a block.
 - dynamic blob counts become padded ``(capacity, 4)`` buffers with counts
   (SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.ops import filters, peaks, preproc, resize

#: overlap factor for block halos (reference ``detector.py:41``).
OVERLAP_FACTOR = 5


def calc_scaling_factor(resolutions: Sequence[float]) -> np.ndarray:
    """Pixels-per-um factor, ``1 / resolutions`` in z,y,x
    (reference ``detector.py:808-825``)."""
    res = np.asarray(resolutions, dtype=float)
    if res.ndim > 1:
        res = res[0]
    return 1.0 / res


def calc_overlap(
        resolutions: Sequence[float], factor: Optional[float] = None
) -> np.ndarray:
    """Block halo width in px per axis (reference ``detector.py:828``)."""
    if factor is None:
        factor = OVERLAP_FACTOR
    return np.ceil(calc_scaling_factor(resolutions) * factor).astype(int)


def sigma_list(
        min_sigma: float, max_sigma: float, num_sigma: int) -> np.ndarray:
    """Linearly spaced LoG scales (skimage ``blob_log`` semantics)."""
    if num_sigma <= 1:
        return np.asarray([float(min_sigma)])
    return np.linspace(float(min_sigma), float(max_sigma), int(num_sigma))


@functools.partial(
    jax.jit, static_argnames=(
        "sigmas", "threshold", "overlap", "capacity", "fast"))
def blob_log(
        roi: jax.Array, sigmas: Tuple[float, ...], threshold: float,
        overlap: float, capacity: int, fast: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """LoG blob detection on a single-channel 3D block.

    Args:
        roi: ``(Z, Y, X)`` float image, values typically in [0, 1].
        sigmas: LoG scales (static tuple).
        threshold: absolute peak threshold on the normalized LoG response.
        overlap: sphere-overlap fraction above which smaller blobs prune.
        capacity: fixed blob buffer size.

    Returns:
        ``blobs``: ``(capacity, 4)`` float32 rows ``z, y, x, sigma``.
        ``valid``: ``(capacity,)`` bool row validity.
    """
    roi = roi.astype(jnp.float32)
    prec = jax.lax.Precision.DEFAULT if fast else None
    # scale-normalized negated LoG response cube, scales-major (batched
    # band-matmul pyramid: 8 scale-batched einsums)
    cube = filters.log_pyramid(roi, sigmas, precision=prec)
    coords4, values, count = peaks.find_peaks(cube, threshold, capacity)
    valid = jnp.arange(capacity) < count
    sig = jnp.asarray(sigmas, jnp.float32)[coords4[:, 0]]
    coords = coords4[:, 1:].astype(jnp.float32)
    valid = peaks.prune_overlapping_blobs_auto(
        coords, sig, valid, overlap, ndim=roi.ndim)
    return jnp.concatenate([coords, sig[:, None]], axis=1), valid


@functools.partial(
    jax.jit, static_argnames=("sigmas", "overlap", "capacity", "fast"))
def blob_log_multi(
        roi: jax.Array, sigmas: Tuple[float, ...],
        thresholds: jax.Array, overlap: float, capacity: int,
        fast: bool = False) -> Tuple[jax.Array, jax.Array]:
    """LoG detection at K thresholds sharing ONE LoG pyramid.

    TPU-native grid-search accelerator (reference ``mlearn.grid_search
    :31`` re-runs the whole detection per hyperparameter combination):
    the scale-space pyramid — the MXU-heavy half of a detection — is
    computed once, and peak finding + overlap pruning ``vmap`` over the
    traced threshold vector, so a K-point threshold sweep costs one
    pyramid plus K cheap harvests in a single compiled program (vs K
    full runs AND K separate compiles, minutes each over a remote
    link, since ``blob_log`` treats the threshold as static).

    Returns ``(K, capacity, 4)`` blob rows and ``(K, capacity)``
    validity. Thresholds must be positive (detection semantics).
    """
    roi = roi.astype(jnp.float32)
    prec = jax.lax.Precision.DEFAULT if fast else None
    cube = filters.log_pyramid(roi, sigmas, precision=prec)
    sig_lut = jnp.asarray(sigmas, jnp.float32)

    def one(th):
        coords4, values, count = peaks.find_peaks(
            cube, th, capacity, fused=False)
        valid = jnp.arange(capacity) < count
        sig = sig_lut[coords4[:, 0]]
        coords = coords4[:, 1:].astype(jnp.float32)
        valid = peaks.prune_overlapping_blobs_auto(
            coords, sig, valid, overlap, ndim=roi.ndim)
        return jnp.concatenate([coords, sig[:, None]], axis=1), valid

    return jax.vmap(one)(jnp.asarray(thresholds, jnp.float32))


def blob_log_multi_sharded(
        roi: jax.Array, sigmas: Tuple[float, ...],
        thresholds, overlap: float, capacity: int, mesh,
        fast: bool = False, axis_name: Optional[str] = None
        ) -> Tuple[np.ndarray, np.ndarray]:
    """:func:`blob_log_multi` with the threshold axis sharded over a
    device mesh: one replicated LoG pyramid, per-device harvest/prune
    of its threshold shard (GSPMD partitions the ``vmap`` axis — the
    sweep is embarrassingly parallel, so no collectives run). An
    8-point sweep on an 8-device mesh costs ~one single-threshold
    harvest of wall-clock on top of the shared pyramid.

    The threshold list pads to a mesh-axis multiple by repeating the
    last value; only the real rows return. Output is host-side
    ``(K, capacity, 4)`` rows + ``(K, capacity)`` validity, matching
    :func:`blob_log_multi`. Reference analog: ``mlearn.grid_search``
    re-runs full detections serially per hyperparameter setting
    (``/root/reference/magmap/stats/mlearn.py:31``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis]
    thr = list(np.asarray(thresholds, np.float32))
    k_real = len(thr)
    if not k_real:
        raise ValueError("no thresholds")
    thr += [thr[-1]] * ((-k_real) % n)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        lambda r, t: blob_log_multi(
            r, sigmas, t, overlap, capacity, fast=fast),
        in_shardings=(rep, shd), out_shardings=(shd, shd))
    raws, valids = fn(
        jax.device_put(jnp.asarray(roi, jnp.float32), rep),
        jax.device_put(jnp.asarray(thr, jnp.float32), shd))
    return np.asarray(raws)[:k_real], np.asarray(valids)[:k_real]


def detect_blobs(
        roi: np.ndarray,
        settings,
        resolutions: Sequence[float],
        channel: Optional[Sequence[int]] = None,
        exclude_border: Optional[Sequence[int]] = None,
        near_max: Optional[Sequence[float]] = None,
        preprocess: bool = False,
        channel_settings=None) -> Optional[np.ndarray]:
    """Detect blobs in an ROI, reference ``detector.detect_blobs`` surface.

    Args:
        roi: ``(Z, Y, X[, C])`` image block (NumPy or JAX array).
        settings: :class:`ROIProfile`-like mapping with the detection keys
            (``min_sigma_factor`` .. ``overlap``; see ``roi_prof``).
        resolutions: z,y,x voxel spacing.
        channel: channels to detect; None = all.
        exclude_border: z,y,x border padding inside which to drop blobs.
        near_max: per-channel near-max intensities (for preprocessing).
        preprocess: run saturate+denoise per channel before detection
            (the reference applies these per denoise sub-block in
            ``stack_detect.py:122-150``; whole-block here since the fused
            kernel makes sub-blocking unnecessary).
        channel_settings: optional per-channel profile list; falls back to
            ``settings``.

    Returns:
        Blobs as an ``N x 10`` array (see :class:`blobs_mod.Blobs`), or
        None when nothing was found.
    """
    shape = roi.shape
    multichannel = roi.ndim > 3
    channels = (list(range(shape[3])) if multichannel else [0]) \
        if channel is None else list(np.atleast_1d(channel))

    def get_settings(chl):
        if channel_settings is not None:
            try:
                return channel_settings[chl]
            except (IndexError, KeyError, TypeError):
                pass
        return settings

    isotropic = get_settings(channels[0])["isotropic"]
    iso_factor = None
    if isotropic is not None:
        iso_factor = resize.calc_isotropic_factor(isotropic, resolutions)
        roi = np.asarray(
            resize.make_isotropic(jnp.asarray(roi), isotropic, resolutions))

    scaling_factor = calc_scaling_factor(resolutions)[2]
    blobs_all = []
    for chl in channels:
        roi_detect = jnp.asarray(roi[..., chl] if multichannel else roi)
        chl_set = get_settings(chl)

        unmix = chl_set["spectral_unmixing"]
        if unmix and chl in unmix:
            for subt_chl, subt_fac in unmix[chl].items():
                roi_detect = preproc.spectral_unmix(
                    roi_detect, jnp.asarray(roi[..., subt_chl]), subt_fac)

        if preprocess:
            nm = 1.0 if near_max is None else float(near_max[chl])
            roi_detect = preproc.saturate(
                roi_detect, chl_set["clip_vmin"], chl_set["clip_vmax"],
                nm * chl_set["max_thresh_factor"])
            roi_detect = preproc.denoise(
                roi_detect, chl_set["clip_min"], chl_set["clip_max"],
                chl_set["tot_var_denoise"], chl_set["unsharp_strength"],
                chl_set["erosion_threshold"])

        sigmas = tuple(sigma_list(
            chl_set["min_sigma_factor"] * scaling_factor,
            chl_set["max_sigma_factor"] * scaling_factor,
            chl_set["num_sigma"]))
        raw, valid = blob_log(
            roi_detect, sigmas, float(chl_set["detection_threshold"]),
            float(chl_set["overlap"]),
            int(chl_set["max_blobs_per_block"] or 4096),
            fast=str(chl_set["log_dtype"]).lower() == "bfloat16")
        raw = np.asarray(raw)[np.asarray(valid)]
        if raw.shape[0] < 1:
            continue
        # radius = sigma * sqrt(3) (reference detector.py:937)
        raw[:, 3] *= math.sqrt(3)
        blobs_all.append(blobs_mod.Blobs(raw).format_blobs(chl))

    if not blobs_all:
        return None
    out = np.vstack(blobs_all)

    if iso_factor is not None:
        # reposition coordinates back into anisotropic space
        out = blobs_mod.Blobs.multiply_blob_rel_coords(out, 1 / iso_factor)
        out = blobs_mod.Blobs.multiply_blob_abs_coords(out, 1 / iso_factor)

    if exclude_border is not None:
        out = blobs_mod.get_blobs_interior(
            out, shape[:3], exclude_border, exclude_border)
    return out


def remove_close_blobs(
        blobs: np.ndarray, blobs_master: np.ndarray, tol: Sequence[float]
) -> Tuple[np.ndarray, np.ndarray]:
    """Prune blobs within ``tol`` of any master blob; averages abs coords.

    Host-side equivalent of reference ``detector.remove_close_blobs``
    (``detector.py:1009-1085``) without the memory-chunking loop (a single
    broadcast suffices at per-border-zone blob counts).
    """
    if len(blobs) < 1 or len(blobs_master) < 1:
        return blobs, blobs_master
    diffs = np.abs(blobs_master[:, None, :3] - blobs[None, :, :3])
    close_master, close = np.nonzero((diffs <= np.asarray(tol)).all(2))
    pruned = np.delete(blobs, close, axis=0)
    if len(close) > 0:
        B = blobs_mod.Blobs
        abs_between = np.around((
            B.get_blob_abs_coords(blobs_master[close_master])
            + B.get_blob_abs_coords(blobs[close])) / 2)
        blobs_master[close_master] = B.set_blob_abs_coords(
            blobs_master[close_master], abs_between)
    return pruned, blobs_master


def remove_close_blobs_within_sorted_array(
        blobs: Optional[np.ndarray], tol: Sequence[float]
) -> Optional[np.ndarray]:
    """Sequential accept-loop pruning over z,y,x-sorted blobs.

    Mirrors reference ``detector.py:1160-1208``: each blob is accepted only
    if no already-accepted blob lies within ``tol``; duplicates shift the
    kept blob's absolute coordinates to the pair mean.
    """
    if blobs is None or len(blobs) < 1:
        return None if blobs is None else blobs
    sorted_blobs, _ = blobs_mod.sort_blobs(blobs)
    tol = np.asarray(tol, dtype=float)
    kept: list = []
    kept_coords: list = []
    B = blobs_mod.Blobs
    for blob in sorted_blobs:
        if kept_coords:
            diffs = np.abs(np.asarray(kept_coords) - blob[:3])
            matches = np.nonzero((diffs <= tol).all(axis=1))[0]
            if matches.size > 0:
                i = matches[-1]
                mean_abs = np.around((
                    B.get_blob_abs_coords(kept[i][None])
                    + B.get_blob_abs_coords(blob[None])) / 2)
                B.set_blob_abs_coords(kept[i][None], mean_abs)
                continue
        kept.append(blob.copy())
        kept_coords.append(blob[:3])
    return np.asarray(kept)


def blob_surroundings(
        blob: np.ndarray, roi: np.ndarray, padding: int = 1,
        plane: bool = False) -> np.ndarray:
    """Voxels surrounding a blob within radius+padding
    (reference ``detector._blob_surroundings :844``); ``plane`` returns
    only the blob's center z-plane."""
    rad = blob[3]
    start = np.maximum(np.subtract(blob[:3], rad + padding), 0).astype(int)
    end = np.minimum(
        np.add(blob[:3], rad + padding).astype(int),
        np.subtract(roi.shape[:3], 1))
    if plane:
        z = int(np.clip(blob[0], 0, roi.shape[0] - 1))
        return roi[z, start[1]:end[1], start[2]:end[2]]
    return roi[start[0]:end[0], start[1]:end[1], start[2]:end[2]]


def show_blob_surroundings(
        blobs: np.ndarray, roi: np.ndarray, padding: int = 1) -> None:
    """Print each blob's surrounding plane
    (reference ``detector.show_blob_surroundings :864``)."""
    np.set_printoptions(precision=2, linewidth=200)
    for blob in blobs:
        print(f"{blob} surroundings:")
        print(blob_surroundings(blob, roi, padding, True))
    np.set_printoptions()


def remove_close_blobs_within_array(blobs, region, tol):
    """Greedy self-pruning: keep each blob only if not within ``tol`` of
    any already-kept blob (reference
    ``detector.remove_close_blobs_within_array :1088``)."""
    if blobs is None:
        return None
    kept = None
    for blob in blobs:
        if kept is None:
            kept = np.array([blob])
        else:
            diff = np.abs(kept[:, region] - blob[region])
            if not np.any(np.all(diff <= tol, axis=1)):
                kept = np.concatenate([kept, [blob]])
    return kept


def meas_pruning_ratio(
        num_blobs_orig: int, num_blobs_after_pruning: int,
        num_blobs_next: int):
    """Pruning ratios (orig count, pruned:orig, pruned:next)
    (reference ``detector.meas_pruning_ratio :1126``)."""
    if num_blobs_next <= 0 or num_blobs_orig <= 0:
        return None
    return (num_blobs_orig,
            num_blobs_after_pruning / num_blobs_orig,
            num_blobs_after_pruning / num_blobs_next)
