"""Atlas-level statistics (reference ``magmap/stats/atlas_stats.py``).

``meas_dice :577``, ``calc_sens_ppv :606``, ``smoothing_peak :281``,
landmark distances (``meas_landmark_dist :535``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from magellanmapper_tpu.cv import verifier

calc_sens_ppv = verifier.calc_sens_ppv


def meas_dice(
        mask1: np.ndarray, mask2: np.ndarray,
        img: Optional[np.ndarray] = None) -> float:
    """Dice coefficient of two masks, optionally weighted by an
    intensity image (reference ``meas_dice :577``)."""
    if img is not None:
        inter = float(img[mask1 & mask2].sum())
        denom = float(img[mask1].sum() + img[mask2].sum())
    else:
        inter = float(np.logical_and(mask1, mask2).sum())
        denom = float(mask1.sum() + mask2.sum())
    return 2 * inter / denom if denom else np.nan


def smoothing_peak(
        df: pd.DataFrame,
        quality_col: str = "SmoothingQuality",
        filter_col: str = "Filter") -> pd.Series:
    """Row with the highest smoothing quality — the optimal filter size
    (reference ``smoothing_peak :281``)."""
    idx = df[quality_col].idxmax()
    return df.loc[idx]


def meas_landmark_dist(
        coords1: np.ndarray, coords2: np.ndarray,
        spacing: Optional[Sequence[float]] = None) -> pd.DataFrame:
    """Pairwise landmark distances between two coordinate sets
    (reference ``meas_landmark_dist :535``)."""
    if spacing is None:
        spacing = (1.0,) * coords1.shape[1]
    deltas = (np.asarray(coords1) - np.asarray(coords2)) * np.asarray(
        spacing)
    dists = np.linalg.norm(deltas, axis=1)
    return pd.DataFrame({
        "Landmark": np.arange(len(dists)), "Dist": dists})


def coefvar(vals: np.ndarray) -> float:
    """Coefficient of variation."""
    vals = np.asarray(vals, float)
    mean = vals.mean()
    return float(vals.std() / mean) if mean else np.nan
