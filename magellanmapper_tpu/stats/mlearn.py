"""Hyperparameter grid search over detection profiles.

Equivalent of ``magmap/stats/mlearn.py``: ``grid_search :31`` (recursive
product over profile value grids, running detection + verification per
combination) and ``parse_grid_stats :110`` (ROC data: POS/TP/FP/FN/
FDR/SENS/PPV). Each combination reuses the same compiled detection
kernels (only threshold-like scalars change shapes rarely), so the sweep
is far cheaper than the reference's full re-runs.
"""

from __future__ import annotations

import itertools
import logging
from enum import Enum
from collections import OrderedDict
from typing import Callable, Sequence

import numpy as np
import pandas as pd

from magellanmapper_tpu.cv import detector, verifier

_logger = logging.getLogger(__name__)

#: grid-search stat columns (reference ``GridSearchStats :18``)
GRID_SEARCH_STATS = ("POS", "TP", "FP", "FN", "FDR", "SENS", "PPV")


def grid_search(
        hyperparams: "OrderedDict[str, Sequence]",
        fn_detect: Callable[[dict], np.ndarray],
        blobs_truth: np.ndarray,
        tol: Sequence[float]) -> pd.DataFrame:
    """Sweep hyperparameter combinations, verifying each against truth.

    Args:
        hyperparams: ordered mapping of profile key -> values to sweep.
        fn_detect: callback taking the parameter-override dict and
            returning detected blobs (N x >=3).
        blobs_truth: ground-truth blobs.
        tol: per-axis match tolerance.

    Returns:
        DataFrame with one row per combination: the swept values plus
        POS/TP/FP/FN/FDR/SENS/PPV.
    """
    keys = list(hyperparams)
    rows = []
    for combo in itertools.product(*hyperparams.values()):
        overrides = dict(zip(keys, combo))
        blobs = fn_detect(overrides)
        n_det = 0 if blobs is None else len(blobs)
        pos = len(blobs_truth)
        if n_det:
            sens, ppv, _ = verifier.verify_stack(blobs, blobs_truth, tol)
            tp = int(round(sens * pos))
            fp = n_det - tp
        else:
            sens = ppv = 0.0
            tp = 0
            fp = 0
        fn = pos - tp
        fdr = fp / n_det if n_det else 0.0
        row = dict(overrides)
        row.update({"POS": pos, "TP": tp, "FP": fp, "FN": fn,
                    "FDR": fdr, "SENS": sens, "PPV": ppv})
        rows.append(row)
        _logger.info("grid combo %s: sens %.3f ppv %.3f", overrides, sens,
                     ppv)
    return pd.DataFrame(rows)


def parse_grid_stats(df: pd.DataFrame) -> pd.DataFrame:
    """ROC-style summary sorted by sensitivity
    (reference ``parse_grid_stats :110``)."""
    out = df.copy()
    out["Distance"] = np.sqrt(
        (1 - out["SENS"]) ** 2 + out["FDR"] ** 2)
    return out.sort_values("Distance").reset_index(drop=True)


def grid_search_from_cli(rc) -> pd.DataFrame:
    """Run a grid search from CLI state (reference ``cli._grid_search``).

    Uses the named grid-search profile over the main image with truth
    blobs from the truth DB.
    """
    from magellanmapper_tpu.io import np_io, sqlite
    from magellanmapper_tpu.cv import stack_detect
    from magellanmapper_tpu.settings.grid_search_prof import (
        GridSearchProfile)

    gs_prof = GridSearchProfile()
    gs_prof.add_profiles(rc.grid_search)
    hyperparams = OrderedDict(gs_prof.get_param_grid())

    img5d = np_io.read_file(rc.filenames[0], rc.series)
    vol = np.asarray(img5d.img[0])
    res = (img5d.resolutions[0] if img5d.resolutions is not None
           else (1.0, 1.0, 1.0))

    if not rc.truth_db:
        raise SystemExit("grid search requires --truth_db")
    db = sqlite.load_truth_db(rc.truth_db)
    truth = db.select_blobs_confirmed(1)
    tol = detector.calc_overlap(res) * np.asarray(
        rc.roi_profile["verify_tol_factor"])

    def fn_detect(overrides):
        prof = type(rc.roi_profile)()
        prof.update(dict(rc.roi_profile))
        prof.update(overrides)
        blobs, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, channels=rc.channel, preprocess=False)
        return blobs

    df = grid_search(hyperparams, fn_detect, truth, tol)
    df = parse_grid_stats(df)
    out_csv = (rc.prefix or rc.filenames[0]) + "_gridsearch.csv"
    df.to_csv(out_csv, index=False)
    return df


class GridSearchStats(Enum):
    """Grid-search stat columns (reference ``mlearn.GridSearchStats
    :18``)."""
    PARAM = "Par"
    PPV = "PPV"
    SENS = "Sens"
    POS = "Pos"
    TP = "TP"
    FP = "FP"
    TN = "TN"
    FN = "FN"
    FDR = "FDR"
