"""Colormaps for labels and channels.

Equivalent of ``magmap/plot/colormaps.py``: ``DiscreteColormap`` for
label images (``:64``, deterministic per-ID colors with symmetric
(+/-id) pairing) and per-channel dark-background colormaps
(``setup_colormaps :555``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

try:
    from matplotlib import colors as mcolors
    _MPL = True
except ImportError:  # pragma: no cover
    _MPL = False

#: colorblind-friendly channel base colors (reference ``config.py:909``)
CHANNEL_COLORS = (
    (0.0, 0.447, 0.698),   # blue
    (0.902, 0.624, 0.0),   # orange
    (0.0, 0.620, 0.451),   # green
    (0.835, 0.369, 0.0),   # vermillion
    (0.8, 0.475, 0.655),   # purple-pink
    (0.941, 0.894, 0.259), # yellow
)


def discrete_colors(
        ids: Sequence[int], seed: int = 1442,
        alpha: float = 1.0,
        symmetric_colors: bool = True) -> Dict[int, tuple]:
    """Deterministic RGBA color per label ID; +/-id share a color when
    ``symmetric_colors`` (mirrored hemispheres)."""
    rng = np.random.RandomState(seed)
    out: Dict[int, tuple] = {}
    keys = sorted({abs(int(i)) for i in ids})
    for key in keys:
        rgb = rng.rand(3) * 0.85 + 0.1
        out[key] = (*rgb, alpha)
    colors = {}
    for i in ids:
        i = int(i)
        if i == 0:
            colors[i] = (0.0, 0.0, 0.0, 0.0)
            continue
        base = out[abs(i)]
        if not symmetric_colors and i < 0:
            base = tuple(np.clip(np.asarray(base[:3]) * 0.6, 0, 1)) + (
                base[3],)
        colors[i] = base
    return colors


class DiscreteColormap:
    """Label colormap mapping IDs to RGBA (reference ``:64``)."""

    def __init__(self, ids: Sequence[int], alpha: float = 1.0,
                 seed: int = 1442, symmetric_colors: bool = True):
        self.ids = np.asarray(sorted(set(int(i) for i in ids)))
        self.colors = discrete_colors(
            self.ids, seed, alpha, symmetric_colors)

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        """Map a labels array to an RGBA image."""
        out = np.zeros(labels.shape + (4,), dtype=float)
        for lid, rgba in self.colors.items():
            out[labels == lid] = rgba
        return out

    def to_mpl(self):
        """As a matplotlib ``ListedColormap`` + ``BoundaryNorm``."""
        if not _MPL:
            raise ImportError("matplotlib required")
        ids = self.ids
        cmap = mcolors.ListedColormap(
            [self.colors[int(i)] for i in ids])
        bounds = np.append(ids - 0.5, ids[-1] + 0.5)
        norm = mcolors.BoundaryNorm(bounds, cmap.N)
        return cmap, norm


def channel_colormap(channel: int):
    """Dark-background linear colormap for an intensity channel
    (reference ``setup_colormaps :555``)."""
    if not _MPL:
        raise ImportError("matplotlib required")
    base = CHANNEL_COLORS[channel % len(CHANNEL_COLORS)]
    return mcolors.LinearSegmentedColormap.from_list(
        f"chl{channel}", [(0, 0, 0), base])
