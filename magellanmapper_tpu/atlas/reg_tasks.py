"""Registered-image tasks (reference ``magmap/atlas/reg_tasks.py``).

``build_labels_diff_images :14`` — paint per-region metric differences
between conditions into label images for visualization.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from magellanmapper_tpu.io import sitk_io
from magellanmapper_tpu.stats import vols

_logger = logging.getLogger(__name__)


def build_labels_diff_images(
        labels_img: np.ndarray, df: pd.DataFrame, metric: str,
        cond_col: str = "Condition",
        conds: Optional[Sequence[str]] = None,
        out_path: Optional[str] = None) -> np.ndarray:
    """Per-region difference image between two conditions
    (reference ``build_labels_diff_images :14``).

    ``df`` holds per-region metric values with a condition column; the
    output image carries ``metric[cond1] - metric[cond0]`` per label.
    """
    if conds is None:
        conds = list(pd.unique(df[cond_col]))[:2]
    if len(conds) < 2:
        raise ValueError("need two conditions to difference")
    d0 = df[df[cond_col] == conds[0]].set_index("Region")[metric]
    d1 = df[df[cond_col] == conds[1]].set_index("Region")[metric]
    diff = (d1 - d0).dropna()
    diff_df = pd.DataFrame(
        {"Region": diff.index, metric: diff.values})
    out = vols.map_meas_to_labels(labels_img, diff_df, metric)
    if out_path:
        sitk_io.write_med_img(
            out_path, sitk_io.MedImage(out.astype(np.float32)))
    return out
