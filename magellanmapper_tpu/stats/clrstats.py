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


def _fit_logit_irls(X: np.ndarray, y: np.ndarray,
                    max_iter: int = 60, tol: float = 1e-9,
                    ridge: float = 1e-8):
    """Logistic regression via iteratively reweighted least squares.

    Python stand-in for R ``glm(..., family=binomial)`` (no statsmodels
    in this environment). Returns ``(beta, cov)`` with the model-based
    covariance ``(X'WX)^-1``; Wald z tests follow.
    """
    n, p = X.shape
    beta = np.zeros(p)
    H = np.eye(p)
    for _ in range(max_iter):
        eta = np.clip(X @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(mu * (1 - mu), 1e-10)
        z = eta + (y - mu) / w
        XtW = X.T * w
        H = XtW @ X + ridge * np.eye(p)
        new = np.linalg.solve(H, XtW @ z)
        if np.max(np.abs(new - beta)) < tol:
            beta = new
            break
        beta = new
    return beta, np.linalg.inv(H)


def _fit_gee_exchangeable(X: np.ndarray, y: np.ndarray,
                          clusters: np.ndarray,
                          max_iter: int = 50, tol: float = 1e-6):
    """Binomial-logit GEE with exchangeable working correlation.

    Python stand-in for R ``gee::gee(genos ~ ..., id, corstr=
    "exchangeable", family=binomial())`` (reference
    ``clrstats/R/clrstats.R:148``): moment estimate of the common
    within-cluster correlation from Pearson residuals, Fisher scoring on
    the working model, and the robust (sandwich) covariance for the
    reported z/p. Returns ``(beta, robust_cov)``.
    """
    X = np.asarray(X, float)
    y = np.asarray(y, float)
    _, p = X.shape
    beta, _ = _fit_logit_irls(X, y)      # independence start
    uids = np.unique(clusters)
    groups = [np.nonzero(clusters == u)[0] for u in uids]

    for _ in range(max_iter):
        eta = np.clip(X @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        a = np.maximum(mu * (1 - mu), 1e-10)
        r = (y - mu) / np.sqrt(a)
        # exchangeable alpha: mean off-diagonal residual product
        num = 0.0
        den = 0.0
        for idx in groups:
            ri = r[idx]
            ni = len(ri)
            if ni < 2:
                continue
            num += (ri.sum() ** 2 - (ri ** 2).sum()) / 2.0
            den += ni * (ni - 1) / 2.0
        alpha = float(np.clip(num / den, -0.99, 0.99)) if den > 0 else 0.0

        U = np.zeros(p)
        H = np.zeros((p, p))
        M = np.zeros((p, p))
        for idx in groups:
            ni = len(idx)
            Xi = X[idx]
            ai = a[idx]
            Di = Xi * ai[:, None]                       # d mu / d beta
            R = np.full((ni, ni), alpha) + (1 - alpha) * np.eye(ni)
            As = np.sqrt(ai)
            Vi = (As[:, None] * R * As[None, :])
            Vinv = np.linalg.inv(Vi + 1e-12 * np.eye(ni))
            resid = y[idx] - mu[idx]
            DtV = Di.T @ Vinv
            U += DtV @ resid
            H += DtV @ Di
            s = DtV @ resid
            M += np.outer(s, s)
        step = np.linalg.solve(H + 1e-10 * np.eye(p), U)
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            break
    Hinv = np.linalg.inv(H + 1e-10 * np.eye(p))
    return beta, Hinv @ M @ Hinv                        # sandwich


def _regression_stats(grp: pd.DataFrame, metric: str, cond_col: str,
                      conds, model: str, side_col: Optional[str],
                      sample_col: Optional[str]):
    """Per-region regression models of the reference ``fitModel``
    (``clrstats/R/clrstats.R:92``): logit ``glm(genos ~ vals [* sides])``,
    linregr ``lm(vals ~ genos [* sides])``, gee ``gee(genos ~ vals *
    sides, id, exchangeable, binomial)``. Effect/p come from the ``vals``
    (logit/gee) or ``genos`` (linregr) coefficient, as the reference
    takes the first non-intercept row."""
    sub = grp[grp[cond_col].isin(conds)].dropna(subset=[metric])
    if len(sub) < 4:
        return None
    vals = sub[metric].to_numpy(float)
    genos = (sub[cond_col] == conds[1]).to_numpy(float)
    if len(np.unique(genos)) < 2:
        return None
    sides = None
    if side_col and side_col in sub and sub[side_col].nunique() > 1:
        sides = (sub[side_col] == sorted(
            sub[side_col].unique())[1]).to_numpy(float)

    def design(x):
        cols = [np.ones_like(x), x]
        if sides is not None:
            cols += [sides, x * sides]
        return np.column_stack(cols)

    if model == "logit":
        X = design(vals)
        beta, cov = _fit_logit_irls(X, genos)
        est, se = beta[1], np.sqrt(max(cov[1, 1], 1e-300))
    elif model == "gee":
        X = design(vals)
        if sample_col and sample_col in sub:
            clusters = sub[sample_col].to_numpy()
        else:
            clusters = np.arange(len(sub))
        beta, cov = _fit_gee_exchangeable(X, genos, clusters)
        est, se = beta[1], np.sqrt(max(cov[1, 1], 1e-300))
    elif model == "linregr":
        X = design(genos)
        beta, res, *_ = np.linalg.lstsq(X, vals, rcond=None)
        fitted = X @ beta
        dof = max(len(vals) - X.shape[1], 1)
        s2 = float(np.sum((vals - fitted) ** 2)) / dof
        cov = s2 * np.linalg.inv(X.T @ X + 1e-12 * np.eye(X.shape[1]))
        est, se = beta[1], np.sqrt(max(cov[1, 1], 1e-300))
        z = est / se
        # lm uses the t distribution
        return est, z, 2 * sp_stats.t.sf(abs(z), dof)
    else:
        raise ValueError(model)
    z = est / se
    return est, z, 2 * sp_stats.norm.sf(abs(z))


#: models handled by per-region regression instead of two-sample tests
_REGRESSION_MODELS = ("logit", "gee", "linregr")


def meas_group_stats(
        df: pd.DataFrame, metric: str,
        cond_col: str = "Condition",
        region_col: str = "Region",
        conds: Optional[Sequence[str]] = None,
        model: str = "ttest",
        side_col: str = "Side",
        sample_col: str = "Sample") -> pd.DataFrame:
    """Per-region group comparison (reference ``kModel`` family).

    ``model``: "ttest" / "mannwhitney" / "wilcoxon" two-sample tests, or
    the regression family "logit" / "gee" / "linregr" (reference
    ``fitModel``, ``clrstats/R/clrstats.R:92``; GEE clusters on
    ``sample_col`` with exchangeable correlation and sandwich SEs).
    Returns per-region effect, p-value, and BH-adjusted p-value.
    """
    if conds is None:
        conds = list(pd.unique(df[cond_col]))[:2]
    rows = []
    for region, grp in df.groupby(region_col):
        a = grp[grp[cond_col] == conds[0]][metric].dropna().to_numpy()
        b = grp[grp[cond_col] == conds[1]][metric].dropna().to_numpy()
        if len(a) < 2 or len(b) < 2:
            continue
        if model in _REGRESSION_MODELS:
            fit = _regression_stats(
                grp, metric, cond_col, conds, model,
                side_col, sample_col)
            if fit is None:
                continue
            effect, stat, p = fit
        elif model == "ttest":
            stat, p = sp_stats.ttest_ind(b, a, equal_var=False)
            effect = None
        elif model == "mannwhitney":
            stat, p = sp_stats.mannwhitneyu(b, a)
            effect = None
        elif model == "wilcoxon":
            n = min(len(a), len(b))
            stat, p = sp_stats.wilcoxon(b[:n], a[:n])
            effect = None
        else:
            raise ValueError(f"unknown model: {model}")
        mean_a = a.mean()
        mean_b = b.mean()
        if effect is None:
            effect = np.log2(mean_b / mean_a) \
                if mean_a > 0 and mean_b > 0 else np.nan
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
