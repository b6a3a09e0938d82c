"""Multi-tile stitching: phase correlation, global optimization, fusion.

TPU-native replacement for the reference's Java stack
(``stitch/ij_bigstitch.py`` driving Fiji BigStitcher: pairwise shifts,
global optimization, fused export; ``stitch/tile_config.py`` grid
layout):

 - pairwise shifts by **3D FFT phase correlation on device** (the FFT is
   XLA-native), with peak quadratic refinement and normalized
   cross-power spectrum;
 - **global tile optimization** as the least-squares position solve
   min sum w_ij ||p_j - p_i - d_ij||^2 (graph Laplacian normal
   equations, host — tiny);
 - **fused export** with linear feather blending.

ImageJ ``TileConfiguration.txt`` files read/write for interchange.
"""

from __future__ import annotations

import logging
import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)


@jax.jit
def _phase_corr_surface(a: jax.Array, b: jax.Array):
    """Normalized cross-power spectrum inverse -> correlation surface.

    Mean subtraction + separable Hann window suppress the DC/edge energy
    that otherwise dominates whitened spectra of smooth microscopy data.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    fa = jnp.fft.fftn(a)
    fb = jnp.fft.fftn(b)
    cross = fa * jnp.conj(fb)
    mag = jnp.abs(cross)
    # regularized whitening: strong enough that spectral noise from
    # smooth microscopy content cannot dominate low-overlap peaks
    # (no window — the informative overlap strip sits at tile borders)
    cross = cross / (mag + 1e-2 * jnp.max(mag))
    return jnp.real(jnp.fft.ifftn(cross))


def phase_correlation(
        a: np.ndarray, b: np.ndarray
) -> Tuple[np.ndarray, float]:
    """Translation of ``b`` relative to ``a`` via phase correlation.

    Returns ``(shift, score)``: per-axis shift such that
    ``b`` shifted by ``shift`` aligns with ``a``; score is the
    correlation peak height.
    """
    surf = np.asarray(_phase_corr_surface(jnp.asarray(a), jnp.asarray(b)))
    peak = np.unravel_index(np.argmax(surf), surf.shape)
    score = float(surf[peak])
    shift = np.asarray(peak, dtype=float)
    # wrap shifts beyond half the extent to negative
    for ax, n in enumerate(surf.shape):
        if shift[ax] > n / 2:
            shift[ax] -= n
    # sub-voxel parabola refinement per axis
    for ax, n in enumerate(surf.shape):
        p = list(peak)
        p_lo = list(peak)
        p_hi = list(peak)
        p_lo[ax] = (peak[ax] - 1) % n
        p_hi[ax] = (peak[ax] + 1) % n
        c0, c1, c2 = surf[tuple(p_lo)], surf[tuple(p)], surf[tuple(p_hi)]
        denom = c0 - 2 * c1 + c2
        if abs(denom) > 1e-12:
            shift[ax] += 0.5 * (c0 - c2) / denom
    return shift, score


class TileGrid:
    """Regular tile layout (reference ``stitch/tile_config.py:28-60``)."""

    def __init__(
            self, rows: int, cols: int, tile_shape: Sequence[int],
            overlap_frac: float = 0.1, snake: bool = True):
        self.rows = rows
        self.cols = cols
        self.tile_shape = tuple(tile_shape)
        self.overlap_frac = overlap_frac
        self.snake = snake

    def nominal_positions(self) -> np.ndarray:
        """(n_tiles, 3) nominal z,y,x positions from the grid layout."""
        step_y = self.tile_shape[1] * (1 - self.overlap_frac)
        step_x = self.tile_shape[2] * (1 - self.overlap_frac)
        pos = []
        for r in range(self.rows):
            for c in range(self.cols):
                pos.append((0.0, r * step_y, c * step_x))
        return np.asarray(pos)

    def tile_index(self, r: int, c: int) -> int:
        if self.snake and r % 2 == 1:
            c = self.cols - 1 - c
        return r * self.cols + c

    def adjacent_pairs(self) -> List[Tuple[int, int]]:
        """Index pairs of horizontally/vertically adjacent tiles."""
        pairs = []
        for r in range(self.rows):
            for c in range(self.cols):
                i = r * self.cols + c
                if c + 1 < self.cols:
                    pairs.append((i, i + 1))
                if r + 1 < self.rows:
                    pairs.append((i, i + self.cols))
        return pairs


def compute_pairwise_shifts(
        tiles: Sequence[np.ndarray], grid: TileGrid
) -> List[Tuple[int, int, np.ndarray, float]]:
    """Phase-correlate the overlap strip of each adjacent tile pair.

    Returns list of ``(i, j, d_ij, score)`` where ``d_ij`` is the measured
    offset of tile j relative to tile i, in global coordinates.
    """
    nominal = grid.nominal_positions()
    out = []
    for i, j in grid.adjacent_pairs():
        rel_nominal = nominal[j] - nominal[i]
        shift, score = phase_correlation(tiles[i], tiles[j])
        # phase correlation yields displacement of tile j's content in
        # tile i's frame; actual offset = content shift
        d_ij = shift
        # wrap-resolve toward the nominal offset: choose the candidate
        # (shift +- N per axis) closest to the nominal displacement
        for ax, n in enumerate(tiles[i].shape):
            candidates = np.array([d_ij[ax], d_ij[ax] + n, d_ij[ax] - n])
            d_ij[ax] = candidates[
                np.argmin(np.abs(candidates - rel_nominal[ax]))]
        out.append((i, j, d_ij, score))
    return out


def globally_optimize(
        pairs: Sequence[Tuple[int, int, np.ndarray, float]],
        n_tiles: int,
        nominal: Optional[np.ndarray] = None,
        score_thresh: float = 0.0) -> np.ndarray:
    """Solve tile positions minimizing weighted pairwise residuals
    (BigStitcher's global optimization as a linear least squares).

    Tile 0 anchors at its nominal position (or the origin).
    """
    ndim = len(pairs[0][2]) if pairs else 3
    rows_a = []
    rows_b = []
    weights = []
    for i, j, d_ij, score in pairs:
        if score <= score_thresh:
            continue
        row = np.zeros(n_tiles)
        row[i] = -1.0
        row[j] = 1.0
        rows_a.append(row)
        rows_b.append(d_ij)
        weights.append(max(score, 1e-6))
    # anchor tile 0
    anchor = np.zeros(n_tiles)
    anchor[0] = 1.0
    rows_a.append(anchor)
    rows_b.append(nominal[0] if nominal is not None else np.zeros(ndim))
    weights.append(1.0)

    a = np.asarray(rows_a) * np.sqrt(np.asarray(weights))[:, None]
    b = np.asarray(rows_b) * np.sqrt(np.asarray(weights))[:, None]
    pos, *_ = np.linalg.lstsq(a, b, rcond=None)
    return pos


def fuse_tiles(
        tiles: Sequence[np.ndarray], positions: np.ndarray,
        blend: str = "linear") -> np.ndarray:
    """Blend tiles into one volume at the given (float) positions.

    ``linear`` feathers overlaps by distance-to-tile-edge weights
    (BigStitcher's linear blending); ``max`` takes the max.
    """
    positions = np.asarray(positions, float)
    tile_shape = np.asarray(tiles[0].shape)
    origin = positions.min(axis=0)
    positions = positions - origin
    extent = np.ceil(positions.max(axis=0) + tile_shape).astype(int)
    acc = np.zeros(tuple(extent), np.float64)
    wacc = np.zeros(tuple(extent), np.float64)

    # feather weight: distance to nearest tile face, per axis product
    w = np.ones(tuple(tile_shape), np.float64)
    if blend == "linear":
        for ax, n in enumerate(tile_shape):
            ramp = np.minimum(np.arange(n) + 1, np.arange(n)[::-1] + 1)
            ramp = ramp / ramp.max()
            shape = [1] * len(tile_shape)
            shape[ax] = n
            w = w * ramp.reshape(shape)

    for tile, pos in zip(tiles, positions):
        ipos = np.round(pos).astype(int)
        sl = tuple(slice(p, p + s) for p, s in zip(ipos, tile_shape))
        acc[sl] += tile * w
        wacc[sl] += w
    return (acc / np.maximum(wacc, 1e-12)).astype(np.float32)


def stitch(
        tiles: Sequence[np.ndarray], grid: TileGrid
) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline: pairwise shifts -> global optimization -> fusion.

    Returns ``(fused_volume, positions)``.
    """
    pairs = compute_pairwise_shifts(tiles, grid)
    positions = globally_optimize(
        pairs, len(tiles), grid.nominal_positions())
    fused = fuse_tiles(tiles, positions)
    return fused, positions


# ---------------------------------------------------------------------------
# ImageJ TileConfiguration interchange


def write_tile_config(
        path: str, names: Sequence[str], positions: np.ndarray,
        ndim: int = 3) -> None:
    """Write an ImageJ ``TileConfiguration.txt``
    (reference ``stitch/tile_config.py`` output format)."""
    with open(path, "w") as f:
        f.write(f"dim = {ndim}\n")
        for name, pos in zip(names, positions):
            coords = ", ".join(f"{v:.1f}" for v in pos[::-1])  # x,y,z
            f.write(f"{name}; ; ({coords})\n")


def read_tile_config(path: str) -> Tuple[List[str], np.ndarray]:
    """Read an ImageJ ``TileConfiguration.txt``; returns names + z,y,x
    positions."""
    names = []
    positions = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "dim")):
                continue
            m = re.match(r"(.+?);\s*;\s*\(([^)]*)\)", line)
            if not m:
                continue
            names.append(m.group(1).strip())
            coords = [float(v) for v in m.group(2).split(",")]
            positions.append(coords[::-1])  # x,y,z -> z,y,x
    return names, np.asarray(positions)
