"""No-uptake study figures: exchange / ratio heatmaps + profile grids
(ref no_uptake_analysis.py:551-915, lean re-design)."""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np

from .phase_b_plots import choose_colormap
from .style import Config, safe_plot, set_style

__all__ = ["generate_all_plots", "plot_profiles_grid_from_samples_csv"]

_HEATMAP_COLS = [
    "Mouth E_L1", "Mouth E_avg", "Mouth_Flux_Total",
    "Concentration_Ratio", "Channel_Conc_Ratio", "Intradomain_Enrichment",
]
_VELOCITY_COLS = ["VR_mid_avg", "VR_mid_max", "VR_intradomain_avg",
                  "VR_intradomain_max"]


def _scatter_heatmap(sub, col, path_base, title):
    cmap, center = choose_colormap(sub[col])
    with safe_plot(path_base) as (fig, ax):
        vals = sub[col].to_numpy(dtype=float)
        if center is not None:
            r = np.nanmax(np.abs(vals - center)) or 1.0
            vmin, vmax = center - r, center + r
        else:
            vmin = vmax = None
        sc = ax.scatter(sub["Sulcus Width (mm)"], sub["Sulcus Depth (mm)"],
                        c=vals, s=160, cmap=cmap, vmin=vmin, vmax=vmax,
                        edgecolors="k", linewidths=0.4)
        fig.colorbar(sc, ax=ax, label=col)
        ax.set_xlabel("sulcus width (mm)")
        ax.set_ylabel("sulcus depth (mm)")
        ax.set_title(title)


def generate_all_plots(df, plots_dir):
    """Exchange heatmaps per Pe + velocity-ratio heatmaps at Pe=1
    (ref :609-641)."""
    os.makedirs(plots_dir, exist_ok=True)
    sulc = df[df["Domain"] == "sulcus"]
    for pe in sorted(sulc["Peclet"].dropna().unique()):
        sub = sulc[sulc["Peclet"] == pe]
        for col in _HEATMAP_COLS:
            if col in sub.columns and sub[col].notna().any():
                name = (f"heatmap_{col.replace(' ', '_')}_"
                        f"Pe{str(pe).replace('.', 'p')}")
                _scatter_heatmap(sub, col, os.path.join(plots_dir, name),
                                 f"{col} (Pe={pe:g})")
    # velocity ratios at Pe=1 (ref :622-641)
    pe1 = sulc[np.isclose(sulc["Peclet"], 1.0)]
    if len(pe1):
        for col in _VELOCITY_COLS:
            if col in pe1.columns and pe1[col].notna().any():
                _scatter_heatmap(pe1, col,
                                 os.path.join(plots_dir,
                                              f"heatmap_{col}_Pe1"),
                                 f"{col} (Pe=1)")


def plot_profiles_grid_from_samples_csv(csv_path, plots_dir=None):
    """Profile grid figure from a profiles_samples_<geom>.csv
    (ref :643-915).  Pure replot: consumes ONLY the CSV (the reference's
    version lazily re-runs rectangle sims -- SURVEY.md 3.4 flags that
    impurity; here replot never simulates)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    if plots_dir is None:
        plots_dir = os.path.join(os.path.dirname(csv_path), "Grids")
    os.makedirs(plots_dir, exist_ok=True)
    geom = df["Geometry"].iloc[0] if len(df) else "unknown"
    lines = sorted(df["LineName"].unique())
    pes = sorted(df["Peclet"].dropna().unique())
    set_style()
    fig, axes = plt.subplots(len(lines), 1,
                             figsize=(8, 2.2 * len(lines)), squeeze=False)
    try:
        has_domain = "Domain" in df.columns
        for i, line in enumerate(lines):
            ax = axes[i][0]
            for pe in pes:
                sel = (df["LineName"] == line) & (df["Peclet"] == pe)
                sub = df[sel & (df["Domain"] == "sulcus")] \
                    if has_domain else df[sel]
                if len(sub):
                    coord = "x" if sub["LineType"].iloc[0] == \
                        "horizontal" else "y"
                    (ln,) = ax.plot(sub[coord], sub["c"], lw=1.0,
                                    label=f"Pe={pe:g}")
                else:
                    ln = None
                if has_domain:
                    # rectangle-baseline overlay (ref :709-745, but from
                    # exported samples -- replot never re-simulates)
                    rsub = df[sel & (df["Domain"] == "rectangular")]
                    if len(rsub):
                        coord = "x" if rsub["LineType"].iloc[0] == \
                            "horizontal" else "y"
                        ax.plot(rsub[coord], rsub["c"], lw=0.9, ls="--",
                                color=(ln.get_color() if ln else None),
                                alpha=0.7,
                                label=f"rect Pe={pe:g}")
            ax.set_ylabel("c")
            ax.set_title(line, fontsize=9)
            if i == 0:
                ax.legend(fontsize=7, ncol=2)
        axes[-1][0].set_xlabel("position")
        fig.tight_layout()
        out = os.path.join(plots_dir, f"profiles_grid_{geom}")
        fig.savefig(out + ".png", dpi=Config.DPI, bbox_inches="tight")
        fig.savefig(out + ".pdf", bbox_inches="tight")
    finally:
        plt.close(fig)
