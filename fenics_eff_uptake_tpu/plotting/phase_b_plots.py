"""Phase-B scatter 'heatmaps' over (width, depth) per mu
(ref no_advection_analysis_B.py:220-345)."""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np

from .style import Config, latexify_label, safe_plot

__all__ = ["choose_colormap", "create_heatmap", "create_heatmaps"]


def choose_colormap(values):
    """Sign-aware colormap choice (ref :220-260): diverging if the data
    straddles a natural midpoint, sequential otherwise."""
    v = np.asarray(values, dtype=float)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return "viridis", None
    if v.min() < 0 < v.max():
        return "RdBu_r", 0.0
    if v.min() < 1 < v.max() and 0.5 < np.nanmedian(v) < 1.5:
        return "RdBu_r", 1.0
    return "viridis", None


def create_heatmap(df, value_col, mu, path_base, title=None):
    sub = df[df["mu_factor"] == mu]
    if sub.empty:
        return
    cmap, center = choose_colormap(sub[value_col])
    with safe_plot(path_base) as (fig, ax):
        vals = sub[value_col].to_numpy(dtype=float)
        if center is not None:
            r = np.nanmax(np.abs(vals - center)) or 1.0
            vmin, vmax = center - r, center + r
        else:
            vmin = vmax = None
        sc = ax.scatter(sub["width_mm"], sub["depth_mm"], c=vals,
                        s=160, cmap=cmap, vmin=vmin, vmax=vmax,
                        edgecolors="k", linewidths=0.4)
        fig.colorbar(sc, ax=ax, label=latexify_label(value_col))
        ax.set_xlabel("sulcus width (mm)")
        ax.set_ylabel("sulcus depth (mm)")
        ax.set_title(latexify_label(
            title or f"{value_col} (μ*={mu})"))


def create_heatmaps(df, plots_dir):
    """All Phase-B heatmaps (ref :341-345)."""
    os.makedirs(plots_dir, exist_ok=True)
    for mu in sorted(df["mu_factor"].unique()):
        for col in ("CR", "flux_ratio", "flux_error_pct"):
            if col not in df.columns:
                continue
            name = f"heatmap_{col}_mu{str(mu).replace('.', 'p')}"
            create_heatmap(df, col, mu, os.path.join(plots_dir, name))
