"""ND image operations (JAX device kernels + host helpers).

Equivalent of ``magmap/cv/cv_nd.py``: distance transforms, in-painting,
carving, perimeters, heat maps, LoG images, zero crossings, isotropic
resampling. The scipy.ndimage C kernels the reference leans on
(``distance_transform_edt``, morphology) become device programs:

 - **EDT** runs as 1+JFA jump flooding (GPU/TPU-standard; SURVEY.md §7
   "EDT ... iterative/jump-flooding formulations"), returning distances
   and/or nearest-seed indices — the indices drive ``in_paint``.
 - morphology/perimeter/exterior are shift-reduce stencils (``ops.filters``).
 - connected-component labeling stays on host scipy (irregular,
   off the hot path).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as scipy_ndi

from magellanmapper_tpu.ops import filters, preproc
from magellanmapper_tpu.ops import resize as resize_ops

# re-exported resampling API (reference cv_nd surface)
calc_isotropic_factor = resize_ops.calc_isotropic_factor
make_isotropic = resize_ops.make_isotropic
rescale_resize = resize_ops.rescale


def _jfa_offsets(ndim: int) -> np.ndarray:
    """All nonzero {-1,0,1}^ndim neighbor directions."""
    grids = np.meshgrid(*([[-1, 0, 1]] * ndim), indexing="ij")
    offs = np.stack([g.ravel() for g in grids], axis=1)
    return offs[np.any(offs != 0, axis=1)]


@functools.partial(jax.jit, static_argnames=("sampling",))
def _edt_jfa(seed_mask: jnp.ndarray, sampling: Tuple[float, ...]):
    """Jump-flooding nearest-seed field (1+JFA).

    Structured as ``lax.scan`` over step sizes with a ``fori_loop`` over
    the 3^nd-1 neighbor directions (dynamic ``jnp.roll`` shifts), so the
    compiled graph stays small regardless of volume size.

    Args:
        seed_mask: True where seeds (distance 0) are.
        sampling: per-axis spacing for anisotropic distance.

    Returns:
        ``(dist, idx)``: distance to nearest seed and seed coordinates
        ``(ndim, ...)``.
    """
    shape = seed_mask.shape
    ndim = seed_mask.ndim
    samp = jnp.asarray(sampling, jnp.float32)
    coords = jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.int32) for s in shape],
        indexing="ij"))
    big = jnp.int32(-1)
    nearest = jnp.where(seed_mask[None], coords, big)

    def dist_to(near):
        d = (near.astype(jnp.float32) - coords.astype(jnp.float32))
        d = d * samp.reshape((ndim,) + (1,) * ndim)
        dist = jnp.sqrt(jnp.sum(d * d, axis=0))
        return jnp.where(jnp.any(near < 0, axis=0), jnp.inf, dist)

    offsets = jnp.asarray(_jfa_offsets(ndim), jnp.int32)
    max_step = int(2 ** np.ceil(np.log2(max(shape))))
    step_list = []
    s = max_step
    while s >= 1:
        step_list.append(s)
        s //= 2
    step_list.append(1)  # 1+JFA extra pass for accuracy
    steps = jnp.asarray(step_list, jnp.int32)

    def one_offset(k, carry, step):
        nearest, best = carry
        off = offsets[k]
        shifted = nearest
        for ax in range(ndim):  # static, tiny
            o = off[ax]
            shifted = jnp.roll(shifted, o * step, axis=ax + 1)
            idx_ax = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
            n = shape[ax]
            invalid = ((o > 0) & (idx_ax < o * step)) | (
                (o < 0) & (idx_ax >= n + o * step))
            shifted = jnp.where(invalid[None], big, shifted)
        cand = dist_to(shifted)
        take = cand < best
        return (jnp.where(take[None], shifted, nearest),
                jnp.where(take, cand, best))

    def one_round(carry, step):
        carry = jax.lax.fori_loop(
            0, offsets.shape[0],
            lambda k, c: one_offset(k, c, step), carry)
        return carry, None

    (nearest, best), _ = jax.lax.scan(
        one_round, (nearest, dist_to(nearest)), steps)
    return best, nearest


def distance_transform_edt(
        mask: np.ndarray, sampling: Optional[Sequence[float]] = None,
        return_indices: bool = False):
    """Euclidean distance transform (scipy semantics: distance from each
    True voxel to the nearest False voxel)."""
    mask = np.asarray(mask).astype(bool)
    if sampling is None:
        sampling = (1.0,) * mask.ndim
    dist, idx = _edt_jfa(jnp.asarray(~mask), tuple(float(s) for s in sampling))
    dist = np.array(dist)
    dist[~mask] = 0.0
    if return_indices:
        return dist, np.asarray(idx)
    return dist


def in_paint(roi: np.ndarray, to_fill: np.ndarray) -> np.ndarray:
    """Fill ``to_fill`` voxels with their nearest unfilled neighbor's value
    (reference ``cv_nd.in_paint :23``, EDT-indices method)."""
    _, idx = distance_transform_edt(to_fill, return_indices=True)
    out = np.array(roi)
    fill = np.where(to_fill)
    nearest = tuple(idx[d][fill] for d in range(roi.ndim))
    out[fill] = roi[nearest]
    return out


def carve(
        roi: np.ndarray, thresh: Optional[float] = None,
        holes_area: Optional[int] = None,
        return_unfilled: bool = False):
    """Carve image foreground by threshold + small-hole removal
    (reference ``cv_nd.carve :43``)."""
    roi_carved = np.copy(roi)
    if thresh is None:
        thresh = float(np.asarray(preproc.otsu_threshold(
            jnp.asarray(roi_carved.astype(np.float32)))))
    mask = roi_carved > thresh
    unfilled = None
    if holes_area:
        labeled, _ = scipy_ndi.label(~mask)
        counts = np.bincount(labeled.ravel())
        small = np.flatnonzero(counts < holes_area)
        small = small[small != 0]
        filled = mask | np.isin(labeled, small)
        if return_unfilled:
            unfilled = np.copy(mask)
        mask = filled
    roi_carved[~mask] = 0
    if return_unfilled:
        return roi_carved, mask, unfilled
    return roi_carved, mask


def perimeter_nd(
        img: np.ndarray, largest_only: bool = False) -> np.ndarray:
    """Boundary voxels of a boolean mask: mask XOR eroded(mask)
    (reference ``cv_nd.perimeter_nd :281``)."""
    mask = np.asarray(img).astype(bool)
    if largest_only:
        labeled, n = scipy_ndi.label(mask)
        if n > 1:
            counts = np.bincount(labeled.ravel())
            counts[0] = 0
            mask = labeled == np.argmax(counts)
    fp = filters.cube_footprint(3) if mask.ndim == 3 else np.ones(
        (3,) * mask.ndim, bool)
    eroded = np.asarray(filters.erosion(
        jnp.asarray(mask.astype(np.float32)), fp)) > 0.5
    return mask ^ eroded


def exterior_nd(img: np.ndarray) -> np.ndarray:
    """One-voxel shell just outside the mask
    (reference ``cv_nd.exterior_nd :313``)."""
    mask = np.asarray(img).astype(bool)
    fp = np.ones((3,) * mask.ndim, bool)
    dilated = np.asarray(filters.dilation(
        jnp.asarray(mask.astype(np.float32)), fp)) > 0.5
    return dilated ^ mask


def surface_area_3d(mask: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> float:
    """Surface area by orientation-corrected exposed-face counting.

    The reference uses marching cubes (``cv_nd.surface_area_3d :329``,
    skimage C). Face counting with the standard 2/3 orientation factor
    (expected |cos| projection over the sphere of normals) is near-exact
    for smooth digitized surfaces — a 4*pi*r^2 sphere lands within a few
    percent — while axis-aligned boxes are the worst case.
    """
    m = np.asarray(mask).astype(bool)
    area = 0.0
    face = [spacing[1] * spacing[2], spacing[0] * spacing[2],
            spacing[0] * spacing[1]]
    for ax in range(3):
        padded = np.pad(m, [(1, 1) if i == ax else (0, 0)
                            for i in range(3)])
        diff = np.diff(padded.astype(np.int8), axis=ax)
        area += np.abs(diff).sum() * face[ax]
    return float(area) * (2.0 / 3.0)


def compactness_3d(
        mask: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> Tuple[float, float,
                                                            float]:
    """(compactness, surface area, volume); compactness = SA^1.5 / vol
    (reference ``cv_nd.compactness_3d :376`` family)."""
    sa = surface_area_3d(mask, spacing)
    vol = float(np.sum(mask) * np.prod(spacing))
    comp = sa ** 1.5 / vol if vol > 0 else np.nan
    return comp, sa, vol


def signed_distance_transform(
        borders: Optional[np.ndarray], mask: Optional[np.ndarray] = None,
        return_indices: bool = False, spacing=None):
    """Distance to borders, negative inside ``mask``
    (reference ``cv_nd.signed_distance_transform :444``)."""
    if borders is None:
        borders = perimeter_nd(mask)
    if return_indices:
        dist, idx = distance_transform_edt(
            ~borders, sampling=spacing, return_indices=True)
    else:
        dist = distance_transform_edt(~borders, sampling=spacing)
    if mask is not None:
        dist = np.where(mask, -dist, dist)
    return (dist, idx) if return_indices else dist


def borders_distance(
        borders_orig: np.ndarray, borders_shifted: np.ndarray,
        mask_orig: Optional[np.ndarray] = None, spacing=None,
        filter_size: Optional[int] = None):
    """Distance from shifted borders to original borders
    (reference ``cv_nd.borders_distance :481``)."""
    if filter_size:
        fp = np.ones((filter_size,) * borders_orig.ndim, bool)
        borders_orig = np.asarray(filters.dilation(
            jnp.asarray(borders_orig.astype(np.float32)), fp)) > 0.5
    dist, idx = distance_transform_edt(
        ~borders_orig, sampling=spacing, return_indices=True)
    if mask_orig is not None:
        dist = np.where(mask_orig, -dist, dist)
    dist_to_orig = np.zeros_like(dist)
    dist_to_orig[borders_shifted] = dist[borders_shifted]
    return dist_to_orig, idx, borders_orig


def radial_dist(
        borders: np.ndarray, centroid: Sequence[float]) -> np.ndarray:
    """Distance of each border voxel from a centroid
    (reference ``cv_nd.radial_dist :534``)."""
    coords = np.argwhere(borders)
    return np.linalg.norm(coords - np.asarray(centroid), axis=1)


def get_bbox_region(
        bbox: Sequence[int], padding: int = 0, img_shape=None):
    """Slices for a regionprops-style bbox (reference ``cv_nd.py:584``)."""
    ndim = len(bbox) // 2
    lo = np.asarray(bbox[:ndim]) - padding
    hi = np.asarray(bbox[ndim:]) + padding
    if img_shape is not None:
        lo = np.clip(lo, 0, img_shape)
        hi = np.clip(hi, 0, img_shape)
    return [slice(int(a), int(b)) for a, b in zip(lo, hi)]


def get_label_bbox(labels_img: np.ndarray, label_id) -> Optional[list]:
    """Bounding box ``[lo..., hi...]`` of a label's extent."""
    mask = np.isin(labels_img, label_id) if np.ndim(label_id) else (
        labels_img == label_id)
    if not mask.any():
        return None
    coords = np.argwhere(mask)
    return list(coords.min(axis=0)) + list(coords.max(axis=0) + 1)


def crop_to_labels(
        img: np.ndarray, labels_img: np.ndarray, mask=None,
        dil_size: int = 2, padding: int = 5):
    """Crop both images to the labels' foreground extent
    (reference ``cv_nd.crop_to_labels :736``)."""
    if mask is None:
        mask = labels_img != 0
        if dil_size:
            fp = filters.ball_footprint(dil_size)
            mask = np.asarray(filters.dilation(
                jnp.asarray(mask.astype(np.float32)), fp)) > 0.5
    bbox = get_label_bbox(mask.astype(np.int8), 1)
    slices = get_bbox_region(bbox, padding, img.shape)
    img_crop = np.array(img[tuple(slices)])
    labels_crop = np.array(labels_img[tuple(slices)])
    img_crop[~mask[tuple(slices)]] = 0
    return img_crop, labels_crop, slices


def build_heat_map(
        shape: Sequence[int], coords: np.ndarray) -> np.ndarray:
    """Count coordinates per voxel (reference ``cv_nd.build_heat_map
    :896``; used for blob density images)."""
    heat = np.zeros(shape, dtype=np.int32)
    coords = np.round(np.asarray(coords)).astype(int)
    keep = np.all((coords >= 0) & (coords < np.asarray(shape)), axis=1)
    coords = coords[keep]
    np.add.at(heat, tuple(coords.T), 1)
    return heat


def laplacian_of_gaussian_img(
        img: np.ndarray, sigma: float = 5, labels_img=None,
        thresh: Optional[float] = None) -> np.ndarray:
    """Gaussian -> Laplacian -> percentile-clipped image
    (reference ``cv_nd.laplacian_of_gaussian_img :928``)."""
    arr = jnp.asarray(np.asarray(img, np.float32))
    log = filters.gaussian_laplace(arr, sigma)
    log = np.asarray(log)
    if labels_img is not None:
        mask = labels_img != 0
    elif thresh is not None:
        mask = np.asarray(img) > thresh
    else:
        mask = np.ones_like(log, bool)
    vmin, vmax = np.percentile(log[mask], (2, 98))
    log = np.clip(log, vmin, vmax)
    # invert so edges are bright (reference negates)
    return vmax - log


def zero_crossing(img: np.ndarray, filter_size: int = 1) -> np.ndarray:
    """Mask of voxels adjacent to a sign change
    (reference ``cv_nd.zero_crossing :963``)."""
    arr = jnp.asarray(np.asarray(img, np.float32))
    fp = np.ones((2 * filter_size + 1,) * arr.ndim, bool)
    vmin = filters.erosion(arr, fp)
    vmax = filters.dilation(arr, fp)
    out = np.asarray((vmin < 0) & (vmax > 0))
    return out


def remap_intensity(roi: np.ndarray, channel=None) -> np.ndarray:
    """CLAHE-lite intensity remap: per-plane histogram equalization
    (reference ``plot_3d.remap_intensity`` uses CLAHE)."""
    out = np.array(roi, np.float32)
    lo, hi = out.min(), out.max()
    if hi > lo:
        flat = ((out - lo) / (hi - lo) * 255).astype(np.uint8)
        hist = np.bincount(flat.ravel(), minlength=256).astype(np.float64)
        cdf = hist.cumsum()
        cdf = cdf / cdf[-1]
        out = cdf[flat].astype(np.float32)
    return out


def get_selem(ndim: int):
    """Structuring-element factory for the dimensionality
    (reference ``cv_nd.get_selem :1205``)."""
    return filters.ball_footprint if ndim >= 3 else (
        lambda r: _disk(r))


def _disk(radius: int) -> np.ndarray:
    n = 2 * radius + 1
    grid = ((np.indices((n, n)) - radius) ** 2).sum(axis=0)
    return grid <= radius * radius


def rotate_nd(
        img: np.ndarray, angle: float, axis: int = 0, order: int = 1,
        resize: bool = False) -> np.ndarray:
    """Rotate plane-by-plane about an axis
    (reference ``cv_nd.rotate_nd :81``)."""
    axes = tuple(ax for ax in range(3) if ax != axis)[:2]
    return scipy_ndi.rotate(
        img, angle, axes=axes, reshape=resize, order=order,
        mode="constant")


def affine_nd(
        img: np.ndarray, axis_along: int, axis_shift: int,
        shift: Sequence[float], bounds: Sequence[Sequence[int]],
        axis_attach: Optional[int] = None) -> np.ndarray:
    """Graded shear within bounds (reference ``cv_nd.affine_nd :185``):
    shifts ``axis_shift`` coordinates by amounts interpolated from
    ``shift[0]`` to ``shift[1]`` along ``axis_along``."""
    out = np.array(img)
    start, stop = bounds[axis_along]
    n = stop - start
    shifts = np.linspace(shift[0], shift[1], max(n, 1))
    for i, plane_i in enumerate(range(start, stop)):
        sl = [slice(b[0], b[1]) for b in bounds]
        sl[axis_along] = plane_i
        region = out[tuple(sl)]
        out[tuple(sl)] = np.roll(
            region, int(round(shifts[i])),
            axis=axis_shift - (1 if axis_shift > axis_along else 0))
    return out


def filter_adaptive_size(
        mask: np.ndarray, fn_filter, filter_size: int,
        min_filter_size: int = 1, min_size_ratio: float = 0.2,
        name: str = "") -> Tuple[np.ndarray, int]:
    """Apply a binary filter, shrinking the footprint until enough of the
    region survives (reference ``cv_nd.filter_adaptive_size :986``)."""
    size_orig = int(np.sum(mask))
    out = mask
    used = 0
    for fsize in range(filter_size, min_filter_size - 1, -1):
        selem = get_selem(mask.ndim)(fsize)
        try:
            cand = fn_filter(mask, structure=selem)
        except TypeError:
            cand = fn_filter(mask, selem)
        if np.sum(cand) >= max(min_size_ratio * size_orig, 1):
            out = cand
            used = fsize
            break
    return out, used


def interpolate_contours(
        plane_a: np.ndarray, plane_b: np.ndarray, frac: float
) -> np.ndarray:
    """Interpolate between two binary planes via signed distance maps
    (reference ``cv_nd.interpolate_contours :797``)."""
    def sdf(mask):
        mask = mask.astype(bool)
        inside = distance_transform_edt(mask)
        outside = distance_transform_edt(~mask)
        return np.where(mask, -inside, outside)

    blended = (1 - frac) * sdf(plane_a) + frac * sdf(plane_b)
    return blended <= 0


def interpolate_label_between_planes(
        labels_img: np.ndarray, label_id: int, axis: int,
        bounds: Sequence[int]) -> np.ndarray:
    """Fill a label between two annotated planes by contour interpolation
    (reference ``cv_nd.interpolate_label_between_planes :835``)."""
    out = np.array(labels_img)
    start, stop = int(bounds[0]), int(bounds[1])

    def get_plane(arr, i):
        sl = [slice(None)] * arr.ndim
        sl[axis] = i
        return arr[tuple(sl)]

    plane_a = get_plane(labels_img, start) == label_id
    plane_b = get_plane(labels_img, stop) == label_id
    n = stop - start
    for i in range(1, n):
        frac = i / n
        interp = interpolate_contours(plane_a, plane_b, frac)
        dst = get_plane(out, start + i)
        dst[interp] = label_id
    return out


def angle_indices(
        shape: Sequence[int], offset: Sequence[int], angle_deg: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Indices along a line at an angle within a 2D plane
    (reference ``cv_nd.angle_indices :1170``)."""
    h, w = shape[:2]
    theta = np.deg2rad(angle_deg)
    length = int(np.hypot(h, w))
    t = np.arange(length)
    ys = (offset[0] + t * np.sin(theta)).astype(int)
    xs = (offset[1] + t * np.cos(theta)).astype(int)
    keep = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return ys[keep], xs[keep]


def rotate90(roi: Optional[np.ndarray], rotate: int,
             axes: Optional[Sequence[int]] = None,
             multichannel: bool = False) -> Optional[np.ndarray]:
    """Rotate in 90-degree increments, default in the xy plane
    (reference ``cv_nd.rotate90 :147``). Negative ``axes`` shift down by
    one for multichannel images so the channel axis stays last."""
    if roi is None or not rotate:
        return roi
    ax = [-2, -1] if axes is None else list(axes)
    if multichannel:
        ax = [a - 1 if a < 0 else a for a in ax]
    return np.rot90(roi, int(rotate), ax)


class RegionProps:
    """Minimal ``regionprops``-style properties of a binary mask
    (bbox/area/centroid/image) without skimage."""

    def __init__(self, mask: np.ndarray):
        coords = np.argwhere(mask)
        lo = coords.min(axis=0)
        hi = coords.max(axis=0) + 1
        self.bbox = tuple(int(v) for v in lo) + tuple(int(v) for v in hi)
        self.area = int(len(coords))
        self.centroid = tuple(float(c) for c in coords.mean(axis=0))
        self.image = mask[tuple(
            slice(int(a), int(b)) for a, b in zip(lo, hi))]


def get_label_props(labels_img: np.ndarray, label_id) -> list:
    """Region properties of a label or label set
    (reference ``cv_nd.get_label_props :616``)."""
    if isinstance(label_id, (tuple, list, np.ndarray)):
        mask = np.isin(labels_img, label_id)
    else:
        mask = labels_img == label_id
    if not mask.any():
        return []
    return [RegionProps(mask)]


def extract_region(labels_img: np.ndarray, label_id):
    """Extract a label's bounding-box view and its slices
    (reference ``cv_nd.extract_region :658``)."""
    bbox = get_label_bbox(labels_img, label_id)
    if bbox is None:
        return None, None
    slices = get_bbox_region(bbox)
    return labels_img[tuple(slices)], slices


def meas_region(mask: np.ndarray, res: Sequence[float]):
    """Physical bounding-box dimensions, volume, and properties of a
    region mask (reference ``cv_nd.meas_region :681``)."""
    props = get_label_props(mask.astype(np.int8), 1)
    ndim = mask.ndim
    bbox = props[0].bbox
    shape = [bbox[ndim + i] - bbox[i] for i in range(ndim)]
    meas = np.multiply(shape, res)
    vol = float(np.prod(res) * np.sum(mask))
    return meas, vol, props


def compactness_count(mask_borders: np.ndarray, mask_object: np.ndarray):
    """Compactness from simple boundary/size voxel counts
    (reference ``cv_nd.compactness_count :376``)."""
    borders_meas = int(np.sum(mask_borders))
    size_object = int(np.sum(mask_object))
    compact = calc_compactness(
        mask_object.ndim, borders_meas, size_object)
    return compact, borders_meas, size_object


def calc_compactness(ndim: int, size_borders: float, size_object: float):
    """Classical compactness: perimeter^2/area (2D), area^3/vol^2 (3D)
    (reference ``cv_nd.calc_compactness :423``); NaN for empty objects."""
    if size_object <= 0:
        return np.nan
    return size_borders ** ndim / size_object ** (ndim - 1)


def radial_dist_map(
        borders: np.ndarray, centroid: Sequence[float]) -> np.ndarray:
    """Image-shaped distances from each border voxel to ``centroid``
    (the map flavor of :func:`radial_dist`; reference ``radial_dist
    :534`` returns this layout)."""
    idx = np.indices(borders.shape).astype(np.float64)
    cent = np.asarray(centroid, np.float64).reshape(
        (-1,) + (1,) * borders.ndim)
    dist = np.sqrt(((idx - cent) ** 2).sum(axis=0))
    out = np.zeros_like(dist)
    out[borders] = dist[borders]
    return out


def radial_dist_diff(radial_orig: np.ndarray, radial_shifted: np.ndarray,
                     indices) -> np.ndarray:
    """Relative border shift toward/away from the centroid: shifted
    distance minus the distance of the nearest original border point
    (reference ``cv_nd.radial_dist_diff :553``). ``indices`` maps each
    voxel to its nearest original border point (e.g. from an EDT with
    return_indices)."""
    dist_at_nearest = radial_orig[tuple(indices)]
    dist_at_nearest[radial_shifted <= 0] = 0
    return np.subtract(radial_shifted, dist_at_nearest)


def remove_bg_from_dil_fg(img: np.ndarray, mask: np.ndarray,
                          selem: np.ndarray) -> None:
    """Zero pixels outside the dilated foreground mask, in place
    (reference ``cv_nd.remove_bg_from_dil_fg :780``)."""
    import jax.numpy as _jnp
    mask_dil = np.asarray(filters.dilation(
        _jnp.asarray(mask.astype(np.float32)), selem)) > 0.5
    img[~mask_dil] = 0


def rescale_resize(
        roi: np.ndarray, target_size=None, multichannel: bool = False,
        preserve_range: bool = False, **kwargs) -> np.ndarray:
    """Rescale by a factor or resize to a shape
    (reference ``cv_nd.rescale_resize :1109``); ``order=0`` for label
    images. Output dtype follows skimage semantics: float unless
    ``preserve_range``."""
    from magellanmapper_tpu.ops import resize as resize_mod
    from magellanmapper_tpu.utils import libmag

    order = kwargs.get("order", 1)
    dtype = roi.dtype
    chan = roi.shape[-1:] if multichannel else ()
    spatial = roi.shape[:-1] if multichannel else roi.shape
    if libmag.is_seq(target_size):
        out_shape = tuple(int(s) for s in target_size)
    else:
        factor = float(target_size)
        out_shape = tuple(
            max(1, int(round(s * factor))) for s in spatial)

    def one(vol):
        return np.asarray(resize_mod.resize(vol, out_shape, order=order))

    if multichannel:
        out = np.stack([one(roi[..., c]) for c in range(chan[0])], axis=-1)
    else:
        out = one(roi)
    return out.astype(dtype) if preserve_range else out


def get_thresholded_regionprops(img_np: np.ndarray, threshold=10,
                                sort_reverse: bool = False,
                                min_size: int = 200) -> list:
    """Connected-component properties of a thresholded image sorted by
    area (reference ``cv_nd.get_thresholded_regionprops :704``)."""
    from scipy import ndimage as scipy_ndi
    thresholded = img_np
    if threshold is not None:
        thresholded = img_np > threshold
        labeled, n = scipy_ndi.label(thresholded)
        counts = np.bincount(labeled.ravel())
        small = np.flatnonzero(counts < min_size)
        thresholded = thresholded & ~np.isin(labeled, small)
    labeled, n = scipy_ndi.label(thresholded)
    props = []
    for lid in range(1, n + 1):
        mask = labeled == lid
        prop = RegionProps(mask)
        props.append((prop, prop.area))
    return sorted(props, key=lambda p: p[1], reverse=sort_reverse)


def surface_net_mesh(
        vol: np.ndarray, level: float,
        smooth_iters: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface mesh via naive surface nets (marching-cubes stand-in).

    The reference extracts meshes with skimage's marching cubes
    (``cv_nd.surface_area_3d :329``, Mayavi surface rendering in
    ``vis_3d.py``); surface nets place one vertex per surface-crossing
    cell and emit a quad (two triangles) per sign-changing voxel edge —
    a compact, fully vectorized formulation. Vertices are Laplacian-
    smoothed toward their face-neighbor mean.

    Returns:
        ``(verts, faces)``: ``(V, 3)`` float z,y,x vertices and
        ``(F, 3)`` int triangle indices.
    """
    fg = np.asarray(vol) > level
    z, y, x = fg.shape
    # cells between voxel corners: active when corners are mixed
    corners = np.zeros((z - 1, y - 1, x - 1), np.int8)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corners += fg[dz:z - 1 + dz, dy:y - 1 + dy,
                              dx:x - 1 + dx]
    active = (corners > 0) & (corners < 8)
    cell_idx = np.full(active.shape, -1, np.int64)
    acts = np.argwhere(active)
    if not len(acts):
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    cell_idx[tuple(acts.T)] = np.arange(len(acts))
    verts = acts.astype(float) + 0.5

    faces = []
    for ax in range(3):
        # voxel edges along `ax` whose endpoints straddle the level
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(0, fg.shape[ax] - 1)
        sl_hi[ax] = slice(1, fg.shape[ax])
        crossing = fg[tuple(sl_lo)] != fg[tuple(sl_hi)]
        o1, o2 = [a for a in range(3) if a != ax]
        # interior edges only: need all 4 adjacent cells to exist
        edges = np.argwhere(crossing)
        keep = (edges[:, o1] >= 1) & (edges[:, o1] <= crossing.shape[o1] - 1)
        keep &= (edges[:, o2] >= 1) & (edges[:, o2] <= crossing.shape[o2] - 1)
        keep &= edges[:, ax] <= active.shape[ax] - 1
        edges = edges[keep]
        if not len(edges):
            continue
        quad = []
        for d1 in (1, 0):
            for d2 in (1, 0):
                c = edges.copy()
                c[:, o1] -= d1
                c[:, o2] -= d2
                in_rng = np.all(
                    (c >= 0) & (c < np.asarray(active.shape)), axis=1)
                ids = np.full(len(edges), -1, np.int64)
                ids[in_rng] = cell_idx[tuple(c[in_rng].T)]
                quad.append(ids)
        q = np.stack(quad, axis=1)      # (E, 4): (11, 10, 01, 00)
        ok = np.all(q >= 0, axis=1)
        q = q[ok]
        # two triangles per quad (11,10,00) and (11,00,01)
        faces.append(np.stack([q[:, 0], q[:, 1], q[:, 3]], axis=1))
        faces.append(np.stack([q[:, 0], q[:, 3], q[:, 2]], axis=1))
    if not faces:
        return verts, np.zeros((0, 3), np.int64)
    faces_arr = np.concatenate(faces)

    # Laplacian smoothing toward connected-vertex means
    for _ in range(int(smooth_iters)):
        acc = np.zeros_like(verts)
        cnt = np.zeros(len(verts))
        for i in range(3):
            j = (i + 1) % 3
            np.add.at(acc, faces_arr[:, i], verts[faces_arr[:, j]])
            np.add.at(cnt, faces_arr[:, i], 1)
        mask = cnt > 0
        verts[mask] = 0.5 * verts[mask] + 0.5 * (
            acc[mask] / cnt[mask, None])
    return verts, faces_arr
