"""Group statistics + volcano plots (reference ``clrstats/`` R package).

The reference ships an R package (``clrstats/R/clrstats.R``) running
volcano plots and per-region group models (t-test/GEE/logit) over the
regional stats CSVs. Python equivalent on scipy.stats: per-region
two-sample tests with effect sizes, multiple-comparison correction, and
volcano plotting via ``plot_2d``.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from scipy import stats as sp_stats

_logger = logging.getLogger(__name__)


def _fdr_bh(pvals: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted p-values."""
    p = np.asarray(pvals, float)
    n = len(p)
    order = np.argsort(p)
    ranked = p[order] * n / (np.arange(n) + 1)
    # enforce monotonicity from the largest p down
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.clip(ranked, 0, 1)
    return out


def meas_group_stats(
        df: pd.DataFrame, metric: str,
        cond_col: str = "Condition",
        region_col: str = "Region",
        conds: Optional[Sequence[str]] = None,
        model: str = "ttest") -> pd.DataFrame:
    """Per-region two-group comparison (reference ``kModel`` family).

    Returns per-region effect (log2 fold change of means), p-value, and
    BH-adjusted p-value.
    """
    if conds is None:
        conds = list(pd.unique(df[cond_col]))[:2]
    rows = []
    for region, grp in df.groupby(region_col):
        a = grp[grp[cond_col] == conds[0]][metric].dropna().to_numpy()
        b = grp[grp[cond_col] == conds[1]][metric].dropna().to_numpy()
        if len(a) < 2 or len(b) < 2:
            continue
        if model == "ttest":
            stat, p = sp_stats.ttest_ind(b, a, equal_var=False)
        elif model == "mannwhitney":
            stat, p = sp_stats.mannwhitneyu(b, a)
        elif model == "wilcoxon":
            n = min(len(a), len(b))
            stat, p = sp_stats.wilcoxon(b[:n], a[:n])
        else:
            raise ValueError(f"unknown model: {model}")
        mean_a = a.mean()
        mean_b = b.mean()
        effect = np.log2(mean_b / mean_a) if mean_a > 0 and mean_b > 0 \
            else np.nan
        rows.append({
            region_col: region, "MeanBase": mean_a, "MeanOther": mean_b,
            "Effect": effect, "Stat": float(stat), "P": float(p)})
    out = pd.DataFrame(rows)
    if len(out):
        out["Padj"] = _fdr_bh(out["P"].to_numpy())
    return out


def plot_volcano(
        df: pd.DataFrame, path: Optional[str] = None,
        p_col: str = "Padj", effect_col: str = "Effect",
        sig_thresh: float = 0.05, region_col: str = "Region"):
    """Volcano plot: effect vs -log10 p (reference volcano scripts)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from magellanmapper_tpu.plot import plot_support

    fig, ax = plt.subplots(figsize=(6, 6))
    logp = -np.log10(np.clip(df[p_col], 1e-300, 1))
    sig = df[p_col] < sig_thresh
    ax.scatter(df.loc[~sig, effect_col], logp[~sig], s=12, c="gray")
    ax.scatter(df.loc[sig, effect_col], logp[sig], s=14, c="crimson")
    for _, row in df[sig].iterrows():
        ax.annotate(str(row[region_col]),
                    (row[effect_col], -np.log10(max(row[p_col], 1e-300))),
                    fontsize=6)
    ax.axhline(-np.log10(sig_thresh), ls="--", lw=0.8, c="k")
    ax.set_xlabel("log2 fold change")
    ax.set_ylabel("-log10 adjusted p")
    if path:
        plot_support.save_fig(fig, path)
    plt.close(fig)
    return fig
