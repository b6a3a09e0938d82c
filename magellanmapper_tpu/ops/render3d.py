"""TPU-native 3D rendering: direct volume ray-casting + isosurface shading.

The reference renders 3D scenes through Mayavi/VTK (``magmap/gui/vis_3d.py:21``
— ``mlab.volume`` emission-absorption rendering, ``mlab.contour3d`` shaded
isosurfaces, ``mlab.points3d`` blob glyphs), a host-side C++ rasterization
engine. This module is the TPU-first equivalent, in two engines sharing one
orbit camera:

- Gather ray-casters (:func:`render_volume`, :func:`render_isosurface`):
  rays march front-to-back with trilinear sampling under ``lax.scan`` (the
  live state is a single (H, W) slab). Highest quality, but TPU gathers are
  serial (~115 ns/point measured): a 512^2 x 256-step frame costs ~8-10 s on
  one v5e. Use these as the quality/parity reference.
- Shear-warp engines (:func:`render_volume_sw`,
  :func:`render_isosurface_sw`): the Lacroute-Levoy factorization turns ALL
  resampling into MXU band matmuls (two per-slice volume shears + a
  Catmull-Smith two-pass film warp) with a pure cumprod/sum composite —
  zero gathers, ~20-100x the frame rate (sub-second 512^2 frames incl.
  tunnel RTT), at the classic one-bilinear-sample-per-slice quality trade.
  Supports emission-absorption compositing, arbitrary-angle MIP, exact
  piecewise-linear transfer-function colors, and Blinn-Phong isosurfaces
  with a depth buffer.

Both produce ``mlab.volume`` / ``mlab.contour3d`` semantics; blob glyphs
project through :func:`render_blobs_overlay` with depth-buffer occlusion
(``mlab.points3d``). Cameras are orbit-style (azimuth/elevation/zoom around
the volume center), the parameterization ``gui.vis_3d.Vis3DCanvas`` drives
interactively.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def camera_basis(azim_deg, elev_deg):
    """Orthonormal (view, right, up) for an orbit camera.

    Angles follow matplotlib's ``view_init`` convention (azimuth about
    the z axis, elevation above the xy plane) so the interactive canvas
    and the ray-caster agree on pose. Works with traced scalars.
    """
    az = jnp.deg2rad(azim_deg)
    el = jnp.deg2rad(elev_deg)
    # view direction points from the camera TOWARD the center
    view = -jnp.stack([
        jnp.sin(el),                       # z
        jnp.cos(el) * jnp.sin(az),         # y
        jnp.cos(el) * jnp.cos(az)])        # x
    world_up = jnp.asarray([1.0, 0.0, 0.0])  # +z (axis 0) up
    right = jnp.cross(view, world_up)
    nrm = jnp.linalg.norm(right)
    # top/bottom pole (view parallel to up): fall back to the x axis
    right = jnp.where(nrm > 1e-5, right / jnp.maximum(nrm, 1e-6),
                      jnp.asarray([0.0, 0.0, 1.0]))
    up = jnp.cross(right, view)
    return view, right, up


def _ray_grid(shape, azim_deg, elev_deg, out_hw, zoom,
              perspective: bool = False):
    """Ray origins + unit directions for an orbit camera.

    Returns ``(origins (H, W, 3), dirs, radius)`` in voxel coordinates
    (z, y, x order); ``dirs`` is the shared (1, 1, 3) view direction
    for orthographic projection (matching the mpl 3D canvas's
    ``proj_type='ortho'``) or per-pixel (H, W, 3) unit directions
    diverging from an eye at ``2.5 * radius / zoom`` for perspective
    (the Mayavi default camera).
    """
    h, w = out_hw
    extent = jnp.asarray(shape, jnp.float32)
    center = (extent - 1) / 2.0
    radius = jnp.linalg.norm(extent) / 2.0
    view, right, up = camera_basis(azim_deg, elev_deg)
    # film plane spans the bounding sphere, scaled by zoom
    span = 2.0 * radius / zoom
    ys = (jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) - 0.5) * span
    xs = (jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) - 0.5) * span
    # image rows go DOWN the screen -> negative up
    film = (center[None, None]
            - view[None, None] * radius
            - up[None, None] * ys[:, None, None]
            + right[None, None] * xs[None, :, None])
    if not perspective:
        return film, view[None, None], radius
    eye = center - view * (2.5 * radius / zoom)
    dirs = film - eye[None, None]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return film, dirs, radius


def _sample(vol, pts):
    """Trilinear sample at (..., 3) voxel coords; 0 outside."""
    coords = jnp.moveaxis(pts, -1, 0)
    return map_coordinates(vol, list(coords), order=1, mode="constant",
                           cval=0.0)


def _gradient_at(vol, pts, eps=1.0):
    """Central-difference intensity gradient at sample points."""
    grads = []
    for ax in range(3):
        off = jnp.zeros((3,), jnp.float32).at[ax].set(eps)
        grads.append(
            (_sample(vol, pts + off) - _sample(vol, pts - off))
            / (2 * eps))
    return jnp.stack(grads, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("out_hw", "n_steps", "shaded",
                              "perspective"))
def render_volume(
        vol: jax.Array, azim_deg, elev_deg,
        vmin=0.0, vmax=1.0, out_hw: Tuple[int, int] = (512, 512),
        n_steps: int = 256, zoom=1.0, opacity=0.05, gamma=1.0,
        color=(1.0, 1.0, 1.0), bg=(0.0, 0.0, 0.0),
        shaded: bool = False,
        light_dir: Optional[Sequence[float]] = None,
        perspective: bool = False) -> jax.Array:
    """Direct volume rendering (``mlab.volume`` semantics), one program.

    Front-to-back emission-absorption: each step samples the volume on
    the (H, W) ray front, maps intensity through the window/gamma
    transfer function to opacity ``a`` and emission ``a * color``, and
    composites ``C += T * a * c; T *= (1 - a)``. ``lax.scan`` keeps only
    the running (H, W) transmittance/color in registers — the full
    (H, W, n_steps) sample tensor never materializes (HBM is the TPU
    bottleneck, not FLOPs, for gather-bound rendering).

    Returns an (H, W, 3) float32 image in [0, 1].
    ``perspective=True`` diverges rays from an eye point (the Mayavi
    default camera) instead of the orthographic film.
    """
    vol = vol.astype(jnp.float32)
    view0 = camera_basis(azim_deg, elev_deg)[0]
    origins, dirs, radius = _ray_grid(
        vol.shape, azim_deg, elev_deg, out_hw, jnp.float32(zoom),
        perspective)
    dt = 2.0 * radius / n_steps
    col = jnp.asarray(color, jnp.float32)
    bgc = jnp.asarray(bg, jnp.float32)
    span = jnp.maximum(jnp.float32(vmax) - jnp.float32(vmin), 1e-6)
    ldir = None
    if shaded:
        ldir = (-view0 if light_dir is None
                else jnp.asarray(light_dir, jnp.float32))
        ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-6)

    acc, trans = _composite_volume_rays(
        vol, origins, dirs, dt, vmin, span, gamma, opacity, col,
        ldir, n_steps)
    return jnp.clip(acc + trans[..., None] * bgc[None, None], 0.0, 1.0)


def _composite_volume_rays(vol, origins, dirs, dt, vmin, span, gamma,
                           opacity, col, ldir, n_steps: int):
    """Front-to-back emission-absorption over an (H, W) ray front;
    shared by the single-device renderer and the film-sharded
    ``render_volume_sharded`` (whose shards see only their film rows).
    Returns the accumulated ``(color, transmittance)`` pair."""
    shaded = ldir is not None

    def step(carry, i):
        acc, trans = carry
        pts = origins + dirs * (i * dt)
        s = _sample(vol, pts)
        a = jnp.clip((s - vmin) / span, 0.0, 1.0) ** gamma * opacity
        emis = col[None, None]
        if shaded:
            g = _gradient_at(vol, pts)
            n = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)
            lam = jnp.abs(jnp.sum(n * ldir[None, None], axis=-1))
            emis = emis * (0.35 + 0.65 * lam)[..., None]
        acc = acc + (trans * a)[..., None] * emis
        trans = trans * (1.0 - a)
        return (acc, trans), None

    # derive the carry from `origins` so it inherits the shard-varying
    # axis under shard_map (a fresh zeros() is unvarying and scan then
    # rejects the carry-type mismatch)
    acc0 = jnp.zeros_like(origins)
    tr0 = jnp.ones_like(origins[..., 0])
    (acc, trans), _ = jax.lax.scan(
        step, (acc0, tr0), jnp.arange(n_steps, dtype=jnp.float32))
    return acc, trans


def render_volume_sharded(
        vol: jax.Array, mesh, azim_deg, elev_deg,
        vmin=0.0, vmax=1.0, out_hw: Tuple[int, int] = (512, 512),
        n_steps: int = 256, zoom=1.0, opacity=0.05, gamma=1.0,
        color=(1.0, 1.0, 1.0), bg=(0.0, 0.0, 0.0),
        shaded: bool = False,
        light_dir: Optional[Sequence[float]] = None,
        perspective: bool = False,
        axis_name: Optional[str] = None) -> jax.Array:
    """:func:`render_volume` with the film rows sharded over a device
    mesh — rays are independent, so each device composites its own
    row block against the replicated volume with NO collectives (the
    ICI cost is one all-gather of the final (H/n, W, 3) tiles when the
    caller assembles the image). This is the scale-out path for big
    films/volumes; the single-device renderer stays the reference.

    ``out_hw[0]`` must divide by the mesh axis size. Matches the
    single-device output exactly (same op order per ray).
    Reference analog: Mayavi renders on one host GPU
    (``/root/reference/magmap/gui/vis_3d.py:21``); this is the
    mesh-native redesign rather than a port.
    """
    from jax.sharding import PartitionSpec as P

    axis = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis]
    if out_hw[0] % n:
        raise ValueError(
            f"film height {out_hw[0]} not divisible by mesh axis "
            f"{axis!r} of size {n}")
    vol = vol.astype(jnp.float32)
    view0 = camera_basis(azim_deg, elev_deg)[0]
    origins, dirs, radius = _ray_grid(
        vol.shape, azim_deg, elev_deg, out_hw, jnp.float32(zoom),
        perspective)
    dt = 2.0 * radius / n_steps
    col = jnp.asarray(color, jnp.float32)
    bgc = jnp.asarray(bg, jnp.float32)
    span = jnp.maximum(jnp.float32(vmax) - jnp.float32(vmin), 1e-6)
    if shaded:
        ldir = (-view0 if light_dir is None
                else jnp.asarray(light_dir, jnp.float32))
        ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-6)
    else:
        # constant placeholder: shard_map specs are positional, and
        # the static `shaded` closure picks the code path
        ldir = jnp.zeros((3,), jnp.float32)

    def tile(vol_r, orig_s, dirs_s, dt_r, span_r, col_r, ldir_r):
        acc, trans = _composite_volume_rays(
            vol_r, orig_s, dirs_s, dt_r, vmin, span_r, gamma,
            opacity, col_r, ldir_r if shaded else None, n_steps)
        return jnp.clip(
            acc + trans[..., None] * bgc[None, None], 0.0, 1.0)

    dirs_spec = P(axis, None, None) if perspective else P(None, None,
                                                          None)
    fn = jax.shard_map(
        tile, mesh=mesh,
        in_specs=(P(), P(axis, None, None), dirs_spec, P(), P(), P(),
                  P()),
        out_specs=P(axis, None, None))
    return fn(vol, origins, dirs, jnp.float32(dt), span, col, ldir)


@functools.partial(
    jax.jit, static_argnames=("out_hw", "n_steps", "perspective"))
def render_isosurface(
        vol: jax.Array, level, azim_deg, elev_deg,
        out_hw: Tuple[int, int] = (512, 512), n_steps: int = 256,
        zoom=1.0, color=(0.8, 0.8, 0.85), bg=(0.0, 0.0, 0.0),
        light_dir: Optional[Sequence[float]] = None,
        specular=0.4, shininess=24.0, perspective: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Shaded isosurface ray-casting (``mlab.contour3d`` surface mode).

    Marches each ray to its FIRST ``level`` crossing (scan tracks the
    hit parameter and the previous sample; the crossing is refined by
    linear interpolation between the bracketing steps — sub-voxel
    accuracy without extra passes), then shades once per pixel with
    Blinn-Phong from the central-difference normal and a headlight
    (or ``light_dir``).

    Returns ``(rgb (H, W, 3), depth (H, W))``; depth is the ray
    parameter in voxels (``inf`` where the ray misses).
    """
    vol = vol.astype(jnp.float32)
    view = camera_basis(azim_deg, elev_deg)[0]
    origins, dirs, radius = _ray_grid(
        vol.shape, azim_deg, elev_deg, out_hw, jnp.float32(zoom),
        perspective)
    dt = 2.0 * radius / n_steps
    ldir = (-view if light_dir is None
            else jnp.asarray(light_dir, jnp.float32))
    return _march_isosurface(
        vol, origins, dirs, dt, jnp.float32(level), view, ldir,
        n_steps, specular, shininess, color, bg)


def _march_isosurface(vol, origins, dirs, dt, lvl, view, ldir,
                      n_steps: int, specular, shininess, color, bg):
    """First-crossing ray march + Blinn-Phong shading over an (H, W)
    ray front; shared by the single-device renderer and the
    film-sharded :func:`render_isosurface_sharded` (carries derive
    from ``origins`` so they inherit the shard-varying axis)."""

    def step(carry, i):
        t_hit, s_prev, hit = carry
        t = i * dt
        s = _sample(vol, origins + dirs * t)
        crossing = (~hit) & (s >= lvl)
        # linear refinement between (t - dt, s_prev) and (t, s)
        frac = jnp.where(
            jnp.abs(s - s_prev) > 1e-9, (lvl - s_prev) / (s - s_prev),
            1.0)
        t_ref = jnp.clip(t - dt + frac * dt, 0.0, None)
        t_hit = jnp.where(crossing, t_ref, t_hit)
        return (t_hit, s, hit | crossing), None

    t0 = jnp.full_like(origins[..., 0], jnp.inf)
    s0 = jnp.zeros_like(origins[..., 0])
    (t_hit, _, hit), _ = jax.lax.scan(
        step, (t0, s0, jnp.zeros_like(origins[..., 0], dtype=bool)),
        jnp.arange(n_steps, dtype=jnp.float32))

    pts = origins + dirs * jnp.where(hit, t_hit, 0.0)[..., None]
    g = _gradient_at(vol, pts)
    n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)
    # normals face the camera (gradient sign depends on inside/outside)
    n = n * -jnp.sign(jnp.sum(n * dirs, axis=-1, keepdims=True))
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-6)
    lam = jnp.clip(jnp.sum(n * ldir[None, None], axis=-1), 0.0, 1.0)
    half = ldir - view
    half = half / jnp.maximum(jnp.linalg.norm(half), 1e-6)
    spec = jnp.clip(jnp.sum(n * half[None, None], axis=-1),
                    0.0, 1.0) ** shininess
    col = jnp.asarray(color, jnp.float32)
    shade = (0.15 + 0.85 * lam)[..., None] * col[None, None] \
        + (specular * spec)[..., None]
    bgc = jnp.asarray(bg, jnp.float32)
    rgb = jnp.where(hit[..., None], jnp.clip(shade, 0.0, 1.0),
                    bgc[None, None])
    return rgb, jnp.where(hit, t_hit, jnp.inf)


def render_isosurface_sharded(
        vol: jax.Array, level, mesh, azim_deg, elev_deg,
        out_hw: Tuple[int, int] = (512, 512), n_steps: int = 256,
        zoom=1.0, color=(0.8, 0.8, 0.85), bg=(0.0, 0.0, 0.0),
        light_dir: Optional[Sequence[float]] = None,
        specular=0.4, shininess=24.0, perspective: bool = False,
        axis_name: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """:func:`render_isosurface` with the film rows sharded over a
    device mesh (see :func:`render_volume_sharded` — independent rays,
    replicated volume, no collectives). Returns the same
    ``(rgb, depth)`` pair, exactly matching the single-device
    renderer."""
    from jax.sharding import PartitionSpec as P

    axis = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis]
    if out_hw[0] % n:
        raise ValueError(
            f"film height {out_hw[0]} not divisible by mesh axis "
            f"{axis!r} of size {n}")
    vol = vol.astype(jnp.float32)
    view = camera_basis(azim_deg, elev_deg)[0]
    origins, dirs, radius = _ray_grid(
        vol.shape, azim_deg, elev_deg, out_hw, jnp.float32(zoom),
        perspective)
    dt = 2.0 * radius / n_steps
    ldir = (-view if light_dir is None
            else jnp.asarray(light_dir, jnp.float32))

    def tile(vol_r, orig_s, dirs_s, dt_r, lvl_r, view_r, ldir_r):
        return _march_isosurface(
            vol_r, orig_s, dirs_s, dt_r, lvl_r, view_r, ldir_r,
            n_steps, specular, shininess, color, bg)

    dirs_spec = P(axis, None, None) if perspective else P(None, None,
                                                          None)
    fn = jax.shard_map(
        tile, mesh=mesh,
        in_specs=(P(), P(axis, None, None), dirs_spec, P(), P(), P(),
                  P()),
        out_specs=(P(axis, None, None), P(axis, None)))
    return fn(vol, origins, dirs, jnp.float32(dt), jnp.float32(level),
              view, ldir)


# ---------------------------------------------------------------------------
# shear-warp rendering: the ray-cast modes above gather 8 neighbors per
# sample, and TPU gathers are serial — a 512^2 x 256-step frame measured
# ~8-10 s on one v5e. The shear-warp factorization (Lacroute & Levoy)
# replaces EVERY gather with MXU band matmuls: the viewing rotation
# factors into (a) two 1D shears that make rays parallel to the volume's
# principal axis — each shear is a batched (slice, out, in) linear-interp
# band matrix einsum, exactly the machinery of the LoG band pyramid —
# (b) a pure axis-0 composite (VPU cumprod/sum, no gathers), and (c) a
# 2D affine film warp done as a Catmull-Smith two-pass, again band
# matmuls. Measured: 6 chained shears in ~0 ms-to-noise on the same
# slice; whole frames land ~100x faster than the gather path. The
# classic quality trade applies (one bilinear sample per slice instead
# of trilinear supersampling); the gather renderers above remain the
# reference quality path.


def _lerp_bands(n_in: int, n_out: int, scale, shifts):
    """(B, n_out, n_in) linear-interp matrices: out[b, u] samples
    ``in[scale * u + shifts[b]]`` (clamped). Applied as one batched
    einsum, this is a whole family of per-slice 1D resamples on the MXU."""
    u = jnp.arange(n_out, dtype=jnp.float32)
    src = scale * u[None, :] + shifts[:, None]
    i0 = jnp.floor(src)
    f = src - i0
    # out-of-range samples weight to zero rather than clamping: rays
    # outside the volume must composite as empty, not edge-smeared
    valid = (src >= 0.0) & (src <= n_in - 1)
    i0c = jnp.clip(i0, 0, n_in - 1).astype(jnp.int32)
    i1c = jnp.clip(i0 + 1, 0, n_in - 1).astype(jnp.int32)
    w0 = jnp.where(valid, 1.0 - f, 0.0)
    w1 = jnp.where(valid, f, 0.0)
    return (jax.nn.one_hot(i0c, n_in, dtype=jnp.float32) * w0[..., None]
            + jax.nn.one_hot(i1c, n_in, dtype=jnp.float32)
            * w1[..., None])


def _camera_basis_np(azim_deg: float, elev_deg: float):
    """Pure-numpy :func:`camera_basis` for host-side static decisions
    (no device round-trip per frame)."""
    az, el = np.deg2rad(azim_deg), np.deg2rad(elev_deg)
    view = -np.asarray([np.sin(el), np.cos(el) * np.sin(az),
                        np.cos(el) * np.cos(az)])
    right = np.cross(view, [1.0, 0.0, 0.0])
    nrm = np.linalg.norm(right)
    right = (right / nrm if nrm > 1e-5
             else np.asarray([0.0, 0.0, 1.0]))
    return view, right, np.cross(right, view)


def _principal_setup(shape, azim_deg: float, elev_deg: float):
    """Host-side static choices: principal axis permutation + flip.

    The shear slopes must satisfy |slope| <= 1, which holds when the
    axis with the largest |view| component leads; the permutation/flip
    are Python statics (three-ish compiled variants, cached), while the
    angles stay traced inside each variant.
    """
    view = _camera_basis_np(float(azim_deg), float(elev_deg))[0]
    p = int(np.argmax(np.abs(view)))
    perm = (p,) + tuple(i for i in range(3) if i != p)
    flip = bool(view[p] < 0)
    return perm, flip


def _film_variant_np(shape, perm, flip, azim_deg: float,
                     elev_deg: float) -> bool:
    """Host-side ``transpose_film`` decision (numpy twin of the
    :func:`_film_affine` probe — avoids a device pull per frame).

    Probes in world units rather than film pixels, so on non-square
    films the threshold shifts by (h-1)/(w-1) — harmless: both warp
    variants are exact; the choice only steers conditioning away from
    the Catmull-Smith bottleneck at ~90 deg in-plane rotations."""
    view, right, up = _camera_basis_np(azim_deg, elev_deg)
    extent = np.asarray(shape, np.float64)
    center = (extent - 1) / 2.0
    radius = np.linalg.norm(extent) / 2.0

    def probe(r, c):
        o = center - view * radius - up * r + right * c
        op = np.asarray([o[perm[0]], o[perm[1]], o[perm[2]]])
        vp = np.asarray([view[perm[0]], view[perm[1]], view[perm[2]]])
        if flip:
            op[0] = shape[perm[0]] - 1 - op[0]
            vp[0] = -vp[0]
        t0 = -op[0] / vp[0]
        return np.asarray([op[1] + vp[1] * t0, op[2] + vp[2] * t0])

    p00 = probe(0.0, 0.0)
    dxdr = (probe(1.0, 0.0) - p00)[1]
    dxdc = (probe(0.0, 1.0) - p00)[1]
    return bool(abs(dxdc) < 0.5 * abs(dxdr))


def _shear_volume(vol_p, d1, d2):
    """Shear the (N0, N1, N2) permuted volume so rays run along axis 0.

    Slice z shifts by ``(d1, d2) * z`` in (axis1, axis2); outputs are
    padded to ``N + N0`` so every ray that crosses the volume keeps a
    column. Returns the sheared (N0, N1p, N2p) tensor.
    """
    n0, n1, n2 = vol_p.shape
    z = jnp.arange(n0, dtype=jnp.float32)
    off = n0 / 2.0
    # out index u samples in[u - off + d*z]
    b1 = _lerp_bands(n1, n1 + n0, 1.0, d1 * z - off)
    sh = jnp.einsum("zyx,zuy->zux", vol_p, b1,
                    precision=jax.lax.Precision.HIGH)
    b2 = _lerp_bands(n2, n2 + n0, 1.0, d2 * z - off)
    return jnp.einsum("zyx,zux->zyu", sh, b2,
                      precision=jax.lax.Precision.HIGH)


def _film_affine(shape, perm, flip, azim_deg, elev_deg, out_hw, zoom):
    """Affine (g, h): film (r, c) -> intermediate (Y', X') coordinates.

    A film ray's intermediate column is where it crosses slice 0 of the
    permuted volume (plus the shear pad offset); that crossing is affine
    in (r, c), so three probe evaluations recover the 2x3 map exactly.
    Also returns ``t0(r, c)`` coefficients — the ray parameter at slice
    0 — and the per-slice parameter step, for depth reconstruction.
    """
    h, w = out_hw
    extent = jnp.asarray(shape, jnp.float32)
    center = (extent - 1) / 2.0
    radius = jnp.linalg.norm(extent) / 2.0
    view, right, up = camera_basis(azim_deg, elev_deg)
    span = 2.0 * radius / zoom
    n0 = shape[perm[0]]

    def probe(r, c):
        ys = (r / max(h - 1, 1) - 0.5) * span
        xs = (c / max(w - 1, 1) - 0.5) * span
        o = center - view * radius - up * ys + right * xs
        op = jnp.stack([o[perm[0]], o[perm[1]], o[perm[2]]])
        vp = jnp.stack([view[perm[0]], view[perm[1]], view[perm[2]]])
        if flip:
            op = op.at[0].set(shape[perm[0]] - 1 - op[0])
            vp = vp.at[0].set(-vp[0])
        # ray crosses slice z=0 of the (possibly flipped) volume at
        t0 = (0.0 - op[0]) / vp[0]
        y_ref = op[1] + vp[1] * t0
        x_ref = op[2] + vp[2] * t0
        return jnp.stack([y_ref + n0 / 2.0, x_ref + n0 / 2.0, t0])

    p00 = probe(0.0, 0.0)
    p10 = probe(1.0, 0.0)
    p01 = probe(0.0, 1.0)
    g = jnp.stack([p10 - p00, p01 - p00], axis=1)  # (3, [dr, dc])
    return g, p00


def _film_warp(img, g, h0, out_hw, transpose_film: bool):
    """Catmull-Smith two-pass affine warp, band-matmul per pass.

    ``T(r, c) = I(Y'(r, c), X'(r, c))`` with the affine from
    :func:`_film_affine`. Pass 1 resamples each intermediate COLUMN
    onto film rows (the per-column shift solves c out of the X'
    equation); pass 2 resamples each film row onto film columns. When
    ``|dX'/dc|`` is small (film nearly 90 deg in plane) the caller
    renders with the film transposed instead (static choice).
    """
    hh, ww = out_hw
    if transpose_film:
        hh, ww = ww, hh
        g = g[:, ::-1]
    g11, g12 = g[0, 0], g[0, 1]
    g21, g22 = g[1, 0], g[1, 1]
    h1, h2 = h0[0], h0[1]
    n_y, n_x = img.shape[:2]
    # pass 1: tmp(r, x) = I(y(r, x), x); y = a*r + b*x + const
    a = g11 - g12 * g21 / g22
    b = g12 / g22
    const = h1 - g12 * h2 / g22
    xs = jnp.arange(n_x, dtype=jnp.float32)
    bands1 = _lerp_bands(n_y, hh, a, b * xs + const)
    flat = img.reshape(n_y, n_x, -1)
    tmp = jnp.einsum("yxk,xry->rxk", flat, bands1,
                     precision=jax.lax.Precision.HIGH)
    # pass 2: T(r, c) = tmp(r, x(r, c)); x = g22*c + g21*r + h2
    rs = jnp.arange(hh, dtype=jnp.float32)
    bands2 = _lerp_bands(n_x, ww, g22, g21 * rs + h2)
    out = jnp.einsum("rxk,rcx->rck", tmp, bands2,
                     precision=jax.lax.Precision.HIGH)
    out = out.reshape((hh, ww) + img.shape[2:])
    return jnp.swapaxes(out, 0, 1) if transpose_film else out


def _tf_emission(sn, w, color):
    """Composite per-voxel transfer-function color WITHOUT a LUT gather.

    ``sn`` (Z', H', W') normalized intensity, ``w`` the per-voxel
    compositing weight (transmittance x alpha). A single ``color``
    (3,) reproduces flat emission ``(sum w) * color``. A (K, 3) anchor
    stack evaluates a piecewise-linear colormap exactly: emission
    c(sn) is linear over anchors, so
    ``sum_z w c(sn) = sum_k (sum_z w hat_k(sn)) c_k`` — K weighted
    reductions instead of a per-voxel table lookup (TPU gathers are the
    slow path; arithmetic is free).
    """
    if color.ndim == 1:
        return jnp.sum(w, axis=0)[..., None] * color
    k = color.shape[0]
    out = 0.0
    for j in range(k):
        hat = jnp.clip(1.0 - jnp.abs(sn * (k - 1) - j), 0.0, 1.0)
        out = out + jnp.sum(w * hat, axis=0)[..., None] * color[j]
    return out


@functools.partial(
    jax.jit, static_argnames=("perm", "flip", "transpose_film",
                              "out_hw", "mode"))
def _render_volume_sw_impl(
        vol, azim_deg, elev_deg, vmin, vmax, zoom, opacity, gamma,
        color, bg, perm, flip, transpose_film, out_hw,
        mode: str = "composite"):
    vol_p = jnp.transpose(vol.astype(jnp.float32), perm)
    if flip:
        vol_p = jnp.flip(vol_p, axis=0)
    view, _, _ = camera_basis(azim_deg, elev_deg)
    vp = jnp.stack([view[perm[0]], view[perm[1]], view[perm[2]]])
    vp = jnp.where(flip, vp * jnp.asarray([-1.0, 1.0, 1.0]), vp)
    d1 = vp[1] / vp[0]
    d2 = vp[2] / vp[0]
    sheared = _shear_volume(vol_p, d1, d2)

    span = jnp.maximum(vmax - vmin, 1e-6)
    color = jnp.asarray(color, jnp.float32)
    if mode == "mip":
        # arbitrary-angle maximum intensity projection (the Mayavi MIP
        # volume mode / axis-aligned plot_max_intensity_projections,
        # generalized to any orbit pose): max along the sheared axis
        lum = jnp.clip(
            (jnp.max(sheared, axis=0) - vmin) / span, 0.0, 1.0) ** gamma
        trans = jnp.stack([1.0 - lum])
        inter = _tf_emission(lum[None], lum[None], color)
    else:
        sn = jnp.clip((sheared - vmin) / span, 0.0, 1.0) ** gamma
        a = sn * opacity
        # path-length opacity correction: one slice crosses L voxels
        length = jnp.sqrt(1.0 + d1 ** 2 + d2 ** 2)
        a = 1.0 - (1.0 - jnp.clip(a, 0.0, 0.999)) ** length
        trans = jnp.cumprod(1.0 - a, axis=0)
        trans_in = jnp.concatenate(
            [jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
        lum = jnp.sum(trans_in * a, axis=0)
        inter = _tf_emission(sn, trans_in * a, color)
    # carry total transmittance + a coverage plane: film pixels whose
    # rays never touch the intermediate grid warp to coverage 0 and must
    # read as fully transmissive (pure background), matching the gather
    # renderer's empty-ray behavior
    inter = jnp.concatenate(
        [inter, trans[-1][..., None], jnp.ones_like(lum)[..., None]],
        axis=-1)

    g, h0 = _film_affine(
        vol.shape, perm, flip, azim_deg, elev_deg, out_hw,
        jnp.float32(zoom))
    warped = _film_warp(inter, g[:2], h0, out_hw, transpose_film)
    rgb = warped[..., :3]
    cov = jnp.clip(warped[..., 4:5], 0.0, 1.0)
    t_eff = jnp.clip(warped[..., 3:4] + (1.0 - cov), 0.0, 1.0)
    bgc = jnp.asarray(bg, jnp.float32)
    return jnp.clip(rgb + t_eff * bgc[None, None], 0.0, 1.0)


def render_volume_sw(
        vol: jax.Array, azim_deg: float, elev_deg: float,
        vmin=0.0, vmax=1.0, out_hw: Tuple[int, int] = (512, 512),
        zoom=1.0, opacity=0.05, gamma=1.0, color=(1.0, 1.0, 1.0),
        bg=(0.0, 0.0, 0.0), mode: str = "composite") -> jax.Array:
    """Shear-warp direct volume rendering (MXU path).

    Same semantics as :func:`render_volume` (emission-absorption,
    window/gamma transfer function, orthographic orbit camera) at
    ~100x the TPU frame rate: all resampling runs as band matmuls, the
    composite as an axis cumprod, with one bilinear sample per slice
    (the classic shear-warp quality trade). ``mode="mip"`` replaces the
    composite with an arbitrary-angle maximum intensity projection.
    ``color`` is a flat (3,) emission color or a (K, 3) stack of
    colormap anchors — a piecewise-linear transfer function evaluated
    exactly through K weighted reductions (no LUT gathers). Angles must
    be concrete Python floats — the principal-axis permutation is a
    static choice (at most a handful of variants compile; orbiting
    stays cached).
    """
    perm, flip = _principal_setup(vol.shape, azim_deg, elev_deg)
    transpose_film = _film_variant_np(
        vol.shape, perm, flip, float(azim_deg), float(elev_deg))
    return _render_volume_sw_impl(
        vol, jnp.float32(azim_deg), jnp.float32(elev_deg),
        jnp.float32(vmin), jnp.float32(vmax), jnp.float32(zoom),
        jnp.float32(opacity), jnp.float32(gamma),
        jnp.asarray(color, jnp.float32), jnp.asarray(bg, jnp.float32),
        perm, flip, transpose_film, tuple(out_hw), mode)


@functools.partial(
    jax.jit, static_argnames=("perm", "flip", "transpose_film",
                              "out_hw"))
def _render_iso_sw_impl(
        vol, level, azim_deg, elev_deg, zoom, color, bg, light_dir,
        specular, shininess, perm, flip, transpose_film, out_hw):
    vol_p = jnp.transpose(vol.astype(jnp.float32), perm)
    if flip:
        vol_p = jnp.flip(vol_p, axis=0)
    view, _, _ = camera_basis(azim_deg, elev_deg)
    vp = jnp.stack([view[perm[0]], view[perm[1]], view[perm[2]]])
    vp = jnp.where(flip, vp * jnp.asarray([-1.0, 1.0, 1.0]), vp)
    d1 = vp[1] / vp[0]
    d2 = vp[2] / vp[0]
    sheared = _shear_volume(vol_p, d1, d2)
    n0 = sheared.shape[0]

    # first crossing along axis 0 via a one-hot selection (no gathers):
    # crossing slice = first z with s >= level
    above = sheared >= level
    hit_any = jnp.any(above, axis=0)
    z_idx = jnp.argmax(above, axis=0)
    onehot = (jnp.arange(n0)[:, None, None] == z_idx[None]).astype(
        jnp.float32)
    prev = (jnp.arange(n0)[:, None, None]
            == jnp.maximum(z_idx - 1, 0)[None]).astype(jnp.float32)
    s_hit = jnp.sum(onehot * sheared, axis=0)
    s_prev = jnp.sum(prev * sheared, axis=0)
    frac = jnp.where(jnp.abs(s_hit - s_prev) > 1e-9,
                     (level - s_prev) / (s_hit - s_prev), 1.0)
    z_ref = jnp.clip(z_idx.astype(jnp.float32) - 1.0 + frac, 0.0, None)

    # gradient in sheared space, selected at the crossing, then
    # un-sheared: ds/dz_orig = ds'/dz + d1 ds'/dy + d2 ds'/dx
    def cdiff(t, ax):
        fwd = jnp.roll(t, -1, axis=ax)
        bwd = jnp.roll(t, 1, axis=ax)
        return (fwd - bwd) / 2.0

    gz_s = jnp.sum(onehot * cdiff(sheared, 0), axis=0)
    gy_s = jnp.sum(onehot * cdiff(sheared, 1), axis=0)
    gx_s = jnp.sum(onehot * cdiff(sheared, 2), axis=0)
    gz = gz_s + d1 * gy_s + d2 * gx_s
    # permuted-space gradient -> original axis order, undoing the flip
    gz = jnp.where(flip, -gz, gz)
    grad_p = [gz, gy_s, gx_s]
    grad = [None, None, None]
    for i, ax in enumerate(perm):
        grad[ax] = grad_p[i]
    n = jnp.stack(grad, axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    n = n * -jnp.sign(jnp.sum(n * view[None, None], axis=-1,
                              keepdims=True))
    ldir = jnp.where(jnp.any(jnp.abs(light_dir) > 0), light_dir, -view)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-6)
    lam = jnp.clip(jnp.sum(n * ldir[None, None], axis=-1), 0.0, 1.0)
    half = ldir - view
    half = half / jnp.maximum(jnp.linalg.norm(half), 1e-6)
    spec = jnp.clip(jnp.sum(n * half[None, None], axis=-1),
                    0.0, 1.0) ** shininess
    col = jnp.asarray(color, jnp.float32)
    shade = (0.15 + 0.85 * lam)[..., None] * col[None, None] \
        + (specular * spec)[..., None]
    shade = jnp.clip(shade, 0.0, 1.0) * hit_any[..., None]

    g, h0 = _film_affine(
        vol.shape, perm, flip, azim_deg, elev_deg, out_hw,
        jnp.float32(zoom))
    # warp shade + hit mask + crossing slice together
    packed = jnp.concatenate(
        [shade, hit_any[..., None].astype(jnp.float32),
         (z_ref * hit_any)[..., None]], axis=-1)
    warped = _film_warp(packed, g[:2], h0, out_hw, transpose_film)
    hitw = warped[..., 3]
    hit = hitw > 0.5
    rgb = jnp.where(
        hit[..., None],
        jnp.clip(warped[..., :3] / jnp.maximum(hitw, 1e-6)[..., None],
                 0.0, 1.0),
        jnp.asarray(bg, jnp.float32)[None, None])
    # depth: t = t0(r, c) + z_hit * |d|; t0 is affine over the film
    length = jnp.sqrt(1.0 + d1 ** 2 + d2 ** 2)
    hh, ww = out_hw
    rs = jnp.arange(hh, dtype=jnp.float32)[:, None]
    cs = jnp.arange(ww, dtype=jnp.float32)[None, :]
    t0 = h0[2] + g[2, 0] * rs + g[2, 1] * cs
    z_hit = warped[..., 4] / jnp.maximum(hitw, 1e-6)
    depth = jnp.where(hit, t0 + z_hit * length, jnp.inf)
    return rgb, depth


def render_isosurface_sw(
        vol: jax.Array, level, azim_deg: float, elev_deg: float,
        out_hw: Tuple[int, int] = (512, 512), zoom=1.0,
        color=(0.8, 0.8, 0.85), bg=(0.0, 0.0, 0.0),
        light_dir: Optional[Sequence[float]] = None,
        specular=0.4, shininess=24.0
) -> Tuple[jax.Array, jax.Array]:
    """Shear-warp shaded isosurface (MXU path).

    Same semantics as :func:`render_isosurface` — first-crossing with
    sub-slice linear refinement, Blinn-Phong from central-difference
    normals (computed in sheared space and algebraically un-sheared),
    depth buffer — at band-matmul speed. Angles must be concrete
    Python floats (static principal-axis variant).
    """
    perm, flip = _principal_setup(vol.shape, azim_deg, elev_deg)
    transpose_film = _film_variant_np(
        vol.shape, perm, flip, float(azim_deg), float(elev_deg))
    ld = (jnp.zeros(3, jnp.float32) if light_dir is None
          else jnp.asarray(light_dir, jnp.float32))
    return _render_iso_sw_impl(
        vol, jnp.float32(level), jnp.float32(azim_deg),
        jnp.float32(elev_deg), jnp.float32(zoom),
        jnp.asarray(color, jnp.float32), jnp.asarray(bg, jnp.float32),
        ld, jnp.float32(specular), jnp.float32(shininess),
        perm, flip, transpose_film, tuple(out_hw))


def render_channels_sw(
        vol_c: jax.Array, azim_deg: float, elev_deg: float,
        colors: Optional[Sequence[Sequence[float]]] = None,
        vmin=0.0, vmax=1.0, out_hw: Tuple[int, int] = (512, 512),
        zoom=1.0, opacity=0.05, gamma=1.0, bg=(0.0, 0.0, 0.0),
        mode: str = "composite") -> jax.Array:
    """Multi-channel composite rendering (channel-colored overlay).

    ``vol_c`` is (Z, Y, X, C) (the importer's multichannel layout) or a
    single-channel (Z, Y, X); each channel renders through
    :func:`render_volume_sw` with its own emission color (defaults to
    the microscopy cyan/magenta/yellow/gray rotation) on a black
    background and the frames blend additively — the way the
    reference's Mayavi scene overlays channel actors. Per-channel
    ``vmin``/``vmax`` may be scalars or length-C sequences.
    """
    if vol_c.ndim == 3:
        vol_c = vol_c[..., None]
    n_c = vol_c.shape[-1]
    if colors is None:
        defaults = [(0.0, 1.0, 1.0), (1.0, 0.0, 1.0), (1.0, 1.0, 0.0),
                    (0.9, 0.9, 0.9)]
        colors = [defaults[i % len(defaults)] for i in range(n_c)]

    def per_chan(v, i):
        return (v[i] if np.ndim(v) and np.size(v) > 1 else v)

    acc = None
    for c in range(n_c):
        img = render_volume_sw(
            vol_c[..., c], azim_deg, elev_deg,
            vmin=per_chan(vmin, c), vmax=per_chan(vmax, c),
            out_hw=out_hw, zoom=zoom, opacity=per_chan(opacity, c),
            gamma=per_chan(gamma, c), color=jnp.asarray(
                colors[c], jnp.float32),
            bg=(0.0, 0.0, 0.0), mode=mode)
        acc = img if acc is None else acc + img
    bgc = jnp.asarray(bg, jnp.float32)
    lum = jnp.max(acc, axis=-1, keepdims=True)
    return jnp.clip(acc + jnp.clip(1.0 - lum, 0.0, 1.0)
                    * bgc[None, None], 0.0, 1.0)


def render_blobs_overlay(
        depth: jax.Array, blobs: np.ndarray, shape, azim_deg, elev_deg,
        out_hw: Tuple[int, int] = (512, 512), zoom: float = 1.0
) -> np.ndarray:
    """Project blob centers into the rendered view (``mlab.points3d``).

    Host-side helper: projects (z, y, x) blob rows through the same
    orthographic camera and returns (N, 4) ``(row, col, visible, t)`` —
    ``visible`` is 0 when the blob sits behind the rendered surface
    (depth-buffer occlusion test), letting the canvas scatter only the
    blobs the reference's 3D scene would show; ``t`` is the distance
    along the view ray from the film plane (picking selects the
    nearest-by-``t`` candidate under the cursor).
    """
    h, w = out_hw
    extent = np.asarray(shape, np.float32)
    center = (extent - 1) / 2.0
    radius = float(np.linalg.norm(extent)) / 2.0
    view, right, up = (np.asarray(v) for v in
                       camera_basis(float(azim_deg), float(elev_deg)))
    span = 2.0 * radius / zoom
    rel = np.asarray(blobs, np.float32)[:, :3] - center
    xs = rel @ right
    ys = rel @ up
    t = rel @ view + radius  # distance along the ray from the film plane
    rows = np.clip(((-ys / span) + 0.5) * (h - 1), 0, h - 1)
    cols = np.clip(((xs / span) + 0.5) * (w - 1), 0, w - 1)
    d = np.asarray(depth)
    surf = d[rows.astype(int), cols.astype(int)]
    visible = (t <= surf + 2.0) | ~np.isfinite(surf)
    return np.column_stack([rows, cols, visible.astype(np.float32), t])
