"""Phase-A figures: mu-sweep curves, aspect-ratio lines, geometry scatter
(ref no_advection_analysis_A.py:417-1249, lean re-design)."""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np

from .style import Config, safe_plot, set_style

__all__ = ["plot_mu_sweep", "plot_mu_sweep_correlation",
           "plot_mu_sweep_abs_error", "plot_aspect_ratio",
           "plot_aspect_ratio_subplots", "plot_model_error_comparison",
           "plot_geometry_analysis", "plot_geometry_error_grids",
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


_REGIME_LABELS = {"low": "Low uptake", "physiological": "Physiological",
                  "high": "High uptake"}


def _regime_groups(df):
    if "Regime" in df:
        return df.groupby("Regime")
    return [("all", df)]


def plot_mu_sweep_correlation(df, plots_dir):
    """Analytical vs simulation mu_eff scatter with the identity line
    (ref no_advection_analysis_A.py:557-594)."""
    os.makedirs(plots_dir, exist_ok=True)
    if "Mu_Eff_Sim" not in df:
        return
    with safe_plot(os.path.join(
            plots_dir, "analytical_vs_simulation_correlation")) as (fig, ax):
        for name, sub in _regime_groups(df):
            label = _REGIME_LABELS.get(name, str(name))
            if "Mu_Eff_Analytical" in sub:
                ax.loglog(sub["Mu_Eff_Sim"], sub["Mu_Eff_Analytical"],
                          "o", ms=5, label=f"{label} (arc)")
            if "Mu_Eff_Enhanced" in sub and sub["Mu_Eff_Enhanced"].notna(
                    ).any():
                ax.loglog(sub["Mu_Eff_Sim"], sub["Mu_Eff_Enhanced"],
                          "s", ms=4, alpha=0.7, label=f"{label} (enh)")
        lo = float(df["Mu_Eff_Sim"].min()) * 0.5
        hi = float(df["Mu_Eff_Sim"].max()) * 2.0
        ax.plot([lo, hi], [lo, hi], "k--", lw=0.8, label="identity")
        ax.set_xlabel(r"$\mu_{\mathrm{eff}}^{\mathrm{sim}}$")
        ax.set_ylabel(r"analytical $\mu_{\mathrm{eff}}$")
        ax.set_title(r"Analytical vs simulation $\mu_{\mathrm{eff}}$"
                     " correlation")
        ax.legend(fontsize=8)


def plot_mu_sweep_abs_error(df, plots_dir):
    """Absolute analytic-model error vs mu factor (ref :520-553)."""
    os.makedirs(plots_dir, exist_ok=True)
    cols = [("Mu_Eff_Analytical", "arc"), ("Mu_Eff_Enhanced", "enhanced"),
            ("Mu_Eff_Opening", "opening")]
    if "Mu_Eff_Sim" not in df:
        return
    with safe_plot(os.path.join(
            plots_dir, "absolute_error_vs_mu_factor")) as (fig, ax):
        sub = df.sort_values("Mu_Factor")
        for col, label in cols:
            if col in sub and sub[col].notna().any():
                ax.loglog(sub["Mu_Factor"],
                          np.abs(sub[col] - sub["Mu_Eff_Sim"]),
                          "o-", ms=4, label=label)
        ax.set_xlabel(r"$\mu$ factor")
        ax.set_ylabel(r"$|\mu_{\mathrm{eff}} - "
                      r"\mu_{\mathrm{eff}}^{\mathrm{sim}}|$")
        ax.set_title("Analytical model absolute error vs uptake strength")
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


def plot_aspect_ratio_subplots(df, plots_dir):
    """One panel per AR family: mu_eff/mu vs depth, all estimators
    (ref :819-866)."""
    os.makedirs(plots_dir, exist_ok=True)
    fams = sorted(df["Aspect_Ratio_Type"].dropna().unique())
    if not fams:
        return
    n = len(fams)
    with safe_plot(os.path.join(plots_dir, "aspect_ratio_subplots"),
                   figsize=(4 * n, 3.2)) as (fig, ax0):
        ax0.remove()
        axes = fig.subplots(1, n, squeeze=False)[0]
        for ax, fam in zip(axes, fams):
            sub = df[df["Aspect_Ratio_Type"] == fam].sort_values("Depth")
            for col, (label, color) in _RATIO_COLS.items():
                if col in sub and sub[col].notna().any():
                    ax.semilogx(sub["Depth"], sub[col], "o-", ms=3,
                                label=label, color=color)
            ax.axhline(1.0, color="gray", lw=0.6, ls="--")
            ax.set_title(fam.replace("_", " "))
            ax.set_xlabel("depth (mm)")
            ax.set_ylabel(r"$\mu_{\mathrm{eff}}/\mu$")
        axes[-1].legend(fontsize=7)


def plot_model_error_comparison(df, plots_dir):
    """Relative model error vs depth per estimator (ref :870-905)."""
    os.makedirs(plots_dir, exist_ok=True)
    cols = [("Relative_Error_Analytical", "arc"),
            ("Relative_Error_Enhanced", "enhanced"),
            ("Relative_Error_Opening", "opening")]
    have = [c for c, _ in cols if c in df and df[c].notna().any()]
    if not have:
        return
    with safe_plot(os.path.join(
            plots_dir, "model_error_comparison")) as (fig, ax):
        for col, label in cols:
            if col not in df or not df[col].notna().any():
                continue
            sub = df.sort_values("Depth") if "Depth" in df else df
            xs = sub["Depth"] if "Depth" in sub else np.arange(len(sub))
            ax.loglog(xs, np.abs(sub[col]), "o-", ms=3, label=label)
        ax.set_xlabel("depth (mm)")
        ax.set_ylabel("relative error vs sim (%)")
        ax.set_title("Model relative error vs depth")
        ax.legend()


def plot_geometry_error_grids(df, plots_dir):
    """Per-mu-factor panels of estimator errors vs aspect ratio
    (ref :988-1092 absolute + relative grids)."""
    os.makedirs(plots_dir, exist_ok=True)
    if "Mu_Factor" not in df:
        return
    mfs = sorted(df["Mu_Factor"].dropna().unique())
    pairs = [("absolute", [("Mu_Eff_Analytical", "arc"),
                           ("Mu_Eff_Enhanced", "enhanced"),
                           ("Mu_Eff_Opening", "opening")]),
             ("relative", [("Relative_Error_Analytical", "arc"),
                           ("Relative_Error_Enhanced", "enhanced"),
                           ("Relative_Error_Opening", "opening")])]
    for kind, cols in pairs:
        have = [c for c, _ in cols if c in df and df[c].notna().any()]
        if not have:
            continue
        n = len(mfs)
        with safe_plot(os.path.join(
                plots_dir, f"geometry_{kind}_error_grid"),
                figsize=(4.5 * n, 3.4)) as (fig, ax0):
            ax0.remove()
            axes = fig.subplots(1, n, squeeze=False)[0]
            for ax, mf in zip(axes, mfs):
                sub = df[df["Mu_Factor"] == mf].sort_values(
                    "Aspect_Ratio")
                for col, label in cols:
                    if col not in sub or not sub[col].notna().any():
                        continue
                    if kind == "absolute" and "Mu_Eff_Sim" in sub:
                        ys = np.abs(sub[col] - sub["Mu_Eff_Sim"])
                    else:
                        ys = np.abs(sub[col])
                    ax.loglog(sub["Aspect_Ratio"], ys, "o", ms=4,
                              label=label)
                ax.set_title(rf"$\mu$ factor = {mf:g}")
                ax.set_xlabel("aspect ratio h/w")
                ax.set_ylabel(f"{kind} error"
                              + (" (%)" if kind == "relative" else ""))
            axes[-1].legend(fontsize=7)


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
        plot_mu_sweep_correlation(df, plots_dir)
        plot_mu_sweep_abs_error(df, plots_dir)
    elif "aspect_ratio" in name:
        plot_aspect_ratio(df, plots_dir)
        plot_aspect_ratio_subplots(df, plots_dir)
        plot_model_error_comparison(df, plots_dir)
    elif "geometry_analysis" in name:
        plot_geometry_analysis(df, plots_dir)
        plot_geometry_error_grids(df, plots_dir)
    elif "mu_eff_analysis" in name:
        plot_mu_eff_spatial(df, plots_dir)
    else:
        raise ValueError(f"unknown Phase-A CSV: {name}")
