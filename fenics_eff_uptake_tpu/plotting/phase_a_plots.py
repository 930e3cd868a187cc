"""Phase-A figures: mu-sweep curves, aspect-ratio lines, geometry scatter
(ref no_advection_analysis_A.py:417-1249, lean re-design)."""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np

from .style import Config, safe_plot, set_style

__all__ = ["plot_mu_sweep", "plot_aspect_ratio", "plot_geometry_analysis",
           "plot_mu_eff_spatial", "plot_phase_a_csv"]

_RATIO_COLS = {
    "Ratio_Sim": ("simulation", "C0"),
    "Ratio_Analytical": ("arc (analytic)", "C1"),
    "Ratio_Enhanced": ("enhanced", "C2"),
    "Ratio_Opening": ("opening", "C3"),
}


def plot_mu_sweep(df, plots_dir):
    """mu_eff/mu vs mu over the three regimes (ref :417-719)."""
    os.makedirs(plots_dir, exist_ok=True)
    with safe_plot(os.path.join(plots_dir, "mu_sweep_ratios")) as (fig, ax):
        for col, (label, color) in _RATIO_COLS.items():
            if col in df and df[col].notna().any():
                sub = df.sort_values("Mu_Factor")
                ax.semilogx(sub["Mu_Factor"], sub[col], "o-", ms=4,
                            label=label, color=color)
        ax.axhline(1.0, color="gray", lw=0.6, ls="--")
        ax.set_xlabel(r"$\mu$ factor")
        ax.set_ylabel(r"$\mu_{\mathrm{eff}}/\mu$")
        ax.set_title(r"$\mu_{\mathrm{eff}}/\mu$ across uptake regimes")
        ax.legend()
    with safe_plot(os.path.join(plots_dir, "mu_sweep_errors")) as (fig, ax):
        for col, label in [("Relative_Error_Analytical", "arc"),
                           ("Relative_Error_Enhanced", "enhanced"),
                           ("Relative_Error_Opening", "opening")]:
            if col in df and df[col].notna().any():
                sub = df.sort_values("Mu_Factor")
                ax.loglog(sub["Mu_Factor"], sub[col], "o-", ms=4,
                          label=label)
        ax.set_xlabel(r"$\mu$ factor")
        ax.set_ylabel("relative error vs sim (%)")
        ax.legend()


def plot_aspect_ratio(df, plots_dir):
    """mu_eff/mu vs depth per AR family (ref :1361-1461 plots)."""
    os.makedirs(plots_dir, exist_ok=True)
    with safe_plot(os.path.join(plots_dir,
                                "aspect_ratio_ratios")) as (fig, ax):
        for ar_type, sub in df.groupby("Aspect_Ratio_Type"):
            sub = sub.sort_values("Depth")
            ax.semilogx(sub["Depth"], sub["Ratio_Sim"], "o-", ms=4,
                        label=f"{ar_type} (sim)")
        ax.axhline(1.0, color="gray", lw=0.6, ls="--")
        ax.set_xlabel("sulcus depth (mm)")
        ax.set_ylabel(r"$\mu_{\mathrm{eff}}^{sim}/\mu$")
        ax.legend()
    with safe_plot(os.path.join(plots_dir,
                                "aspect_ratio_estimators")) as (fig, ax):
        sub = df[df["Aspect_Ratio_Type"] == "h_equals_w"].sort_values(
            "Depth")
        for col, (label, color) in _RATIO_COLS.items():
            if col in sub and sub[col].notna().any():
                ax.semilogx(sub["Depth"], sub[col], "o-", ms=4,
                            label=label, color=color)
        ax.set_xlabel("sulcus depth (mm)  [h = w family]")
        ax.set_ylabel(r"$\mu_{\mathrm{eff}}/\mu$")
        ax.legend()


def plot_geometry_analysis(df, plots_dir):
    """Estimator ratios vs aspect ratio, colored by mu factor."""
    os.makedirs(plots_dir, exist_ok=True)
    with safe_plot(os.path.join(plots_dir,
                                "geometry_ratio_vs_ar")) as (fig, ax):
        for mf, sub in df.groupby("Mu_Factor"):
            sub = sub.sort_values("Aspect_Ratio")
            ax.semilogx(sub["Aspect_Ratio"], sub["Ratio_Sim"], "o",
                        ms=5, label=f"μ×{mf:g}")
        ax.axhline(1.0, color="gray", lw=0.6, ls="--")
        ax.set_xlabel("aspect ratio h/w")
        ax.set_ylabel(r"$\mu_{\mathrm{eff}}^{sim}/\mu$")
        ax.legend()


def plot_mu_eff_spatial(df, plots_dir):
    """mu(x) sampled profiles per mu factor (ref :1583-1682 plots)."""
    import ast
    os.makedirs(plots_dir, exist_ok=True)
    with safe_plot(os.path.join(plots_dir,
                                "mu_bottom_profiles")) as (fig, ax):
        for _, row in df.iterrows():
            try:
                xs = ast.literal_eval(row["Mu_X_Array"])
                ms = ast.literal_eval(row["Mu_Values_Array"])
            except Exception:
                continue
            ax.plot(xs, ms, label=f"μ×{row['Mu_Factor']:g}")
        ax.set_xlabel("x")
        ax.set_ylabel(r"$\mu(x)$")
        ax.legend()


def plot_phase_a_csv(csv_path):
    """Dispatch on CSV name (used by replot_from_csv)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    plots_dir = os.path.join(os.path.dirname(csv_path), "Plots")
    name = os.path.basename(csv_path)
    if "mu_parameter_sweep" in name:
        plot_mu_sweep(df, plots_dir)
    elif "aspect_ratio" in name:
        plot_aspect_ratio(df, plots_dir)
    elif "geometry_analysis" in name:
        plot_geometry_analysis(df, plots_dir)
    elif "mu_eff_analysis" in name:
        plot_mu_eff_spatial(df, plots_dir)
    else:
        raise ValueError(f"unknown Phase-A CSV: {name}")
