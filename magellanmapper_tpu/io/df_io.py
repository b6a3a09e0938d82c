"""Pandas data-frame engine for stats outputs.

Equivalent of ``magmap/io/df_io.py``: CSV write/read with backup
(``data_frames_to_csv :647``), dict->frame (``dict_to_data_frame
:594``), merge/melt/pivot/normalize/zscore ops, and the ``--df`` task
vocabulary (``main :800``).
"""

from __future__ import annotations

import logging
import os
from enum import Enum, auto
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from magellanmapper_tpu.utils import libmag

_logger = logging.getLogger(__name__)


class DFTasks(Enum):
    """``--df`` tasks (reference ``config.DFTasks``, core subset)."""
    MERGE_CSVS = auto()
    MERGE_CSVS_COLS = auto()
    APPEND_CSVS_COLS = auto()
    EXPS_BY_REGION = auto()
    MELT_COLS = auto()
    PIVOT_TABLE = auto()
    SUM_COLS = auto()
    SUBTRACT_COLS = auto()
    MULTIPLY_COLS = auto()
    DIVIDE_COLS = auto()
    NORMALIZE = auto()
    ZSCORE = auto()
    REPLACE_VALS = auto()


def dict_to_data_frame(
        d: Dict, records_cols: Optional[Sequence[str]] = None,
        sort_cols: Optional[Union[str, Sequence[str]]] = None
) -> pd.DataFrame:
    """Build a frame from a dict of columns or records
    (reference ``dict_to_data_frame :594``)."""
    df = pd.DataFrame(d, columns=records_cols) if records_cols else \
        pd.DataFrame(d)
    if sort_cols:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    return df


def data_frames_to_csv(
        dfs: Union[pd.DataFrame, Sequence[pd.DataFrame]],
        path: str, sort_cols=None, index: bool = False) -> pd.DataFrame:
    """Concatenate frames and write CSV, backing up any existing file
    (reference ``data_frames_to_csv :647``)."""
    if isinstance(dfs, pd.DataFrame):
        dfs = [dfs]
    df = pd.concat(dfs, ignore_index=True) if len(dfs) > 1 else dfs[0]
    if sort_cols:
        df = df.sort_values(sort_cols)
    libmag.backup_file(path)
    df.to_csv(path, index=index)
    _logger.info("wrote %d rows to %s", len(df), path)
    return df


def merge_csvs(paths: Sequence[str], out_path: Optional[str] = None
               ) -> pd.DataFrame:
    """Concatenate CSVs row-wise."""
    df = pd.concat([pd.read_csv(p) for p in paths], ignore_index=True)
    if out_path:
        data_frames_to_csv(df, out_path)
    return df


def join_dfs(
        dfs: Sequence[pd.DataFrame], on: str,
        suffixes: Optional[Sequence[str]] = None) -> pd.DataFrame:
    """Outer-join frames on a key column."""
    out = dfs[0]
    for i, df in enumerate(dfs[1:], 1):
        sfx = ("", f"_{suffixes[i] if suffixes else i}")
        out = out.merge(df, on=on, how="outer", suffixes=sfx)
    return out


def melt_cols(
        df: pd.DataFrame, id_cols: Sequence[str],
        melt_cols_: Sequence[str], var_name: str = "Group",
        value_name: str = "Value") -> pd.DataFrame:
    """Wide -> long (reference melt ops)."""
    return df.melt(
        id_vars=id_cols, value_vars=melt_cols_, var_name=var_name,
        value_name=value_name)


def pivot_table(
        df: pd.DataFrame, index: str, columns: str, values: str
) -> pd.DataFrame:
    return df.pivot_table(
        index=index, columns=columns, values=values).reset_index()


def normalize_df(
        df: pd.DataFrame, id_cols: Sequence[str], cond_col: str,
        cond_base: str, metric_cols: Sequence[str]) -> pd.DataFrame:
    """Normalize metric columns to a baseline condition."""
    base = df[df[cond_col] == cond_base].set_index(list(id_cols))
    out = df.copy()
    for col in metric_cols:
        base_vals = out[id_cols[0]].map(base[col]) if len(id_cols) == 1 \
            else pd.MultiIndex.from_frame(out[list(id_cols)]).map(base[col])
        out[col] = out[col] / base_vals
    return out


def zscore_df(
        df: pd.DataFrame, group_cols: Sequence[str],
        metric_cols: Sequence[str]) -> pd.DataFrame:
    """Z-score metrics within groups."""
    out = df.copy()
    for col in metric_cols:
        grp = out.groupby(list(group_cols))[col]
        out[col] = (out[col] - grp.transform("mean")) / grp.transform("std")
    return out


def print_data_frame(df: pd.DataFrame, sep: str = " ") -> str:
    """Format a frame for logging (reference ``print_data_frame``)."""
    s = df.to_string(index=False)
    _logger.info("\n%s", s)
    return s
