"""Adv-diff validation figures (ref adv_diff_analysis.py:308-598):
3x3 mu(x) spatial grid + side-by-side flux-error / CR-deviation heatmaps."""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np

from ..params import StepUptakeOpen
from .style import Config, safe_plot, set_style

__all__ = ["create_validation_plots"]


def _pivot(df, col):
    rect = df[(df["domain_type"] == "rectangular")]
    pes = sorted(rect["Pe"].unique())
    mus = sorted(rect["mu_factor"].unique())
    M = np.full((len(pes), len(mus)), np.nan)
    for i, pe in enumerate(pes):
        for j, mf in enumerate(mus):
            sel = rect[(rect["Pe"] == pe) & (rect["mu_factor"] == mf)]
            if len(sel):
                M[i, j] = sel[col].iloc[0]
    return pes, mus, M


def _heat(ax, pes, mus, M, title, cmap="RdBu_r", center=0.0):
    r = np.nanmax(np.abs(M - center)) or 1.0
    im = ax.imshow(M, cmap=cmap, vmin=center - r, vmax=center + r,
                   origin="lower", aspect="auto")
    ax.set_xticks(range(len(mus)))
    ax.set_xticklabels([f"{m:g}" for m in mus])
    ax.set_yticks(range(len(pes)))
    ax.set_yticklabels([f"{p:g}" for p in pes])
    ax.set_xlabel(r"$\mu$ factor")
    ax.set_ylabel("Pe")
    ax.set_title(title)
    for i in range(len(pes)):
        for j in range(len(mus)):
            if np.isfinite(M[i, j]):
                ax.text(j, i, f"{M[i, j]:.3g}", ha="center", va="center",
                        fontsize=9)
    return im


def create_validation_plots(df, plots_dir):
    set_style()
    os.makedirs(plots_dir, exist_ok=True)

    # 1) error heatmaps (ref :500-598)
    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    try:
        pes, mus, E = _pivot(df, "flux_error_pct")
        im0 = _heat(axes[0], pes, mus, E,
                    "Step-surrogate flux error (%)")
        fig.colorbar(im0, ax=axes[0])
        pes, mus, C = _pivot(df, "CR")
        im1 = _heat(axes[1], pes, mus, (C - 1.0) * 100,
                    "CR deviation from 1 (%)")
        fig.colorbar(im1, ax=axes[1])
        fig.tight_layout()
        fig.savefig(os.path.join(plots_dir, "validation_heatmaps.png"),
                    dpi=Config.DPI, bbox_inches="tight")
        fig.savefig(os.path.join(plots_dir, "validation_heatmaps.pdf"),
                    bbox_inches="tight")
    except Exception as e:
        print(f"  [plot] validation heatmaps failed: {e}")
    finally:
        plt.close(fig)

    # 2) 3x3 mu(x) spatial grid (ref :308-470)
    rect = df[df["domain_type"] == "rectangular"]
    if rect.empty:
        return
    pes = sorted(rect["Pe"].unique())
    mfs = sorted(rect["mu_factor"].unique())
    fig, axes = plt.subplots(len(mfs), len(pes),
                             figsize=(4 * len(pes), 2.8 * len(mfs)),
                             squeeze=False)
    try:
        # geometry constants from the sulcus rows
        sulc = df[df["domain_type"] == "sulcus"]
        L = float(sulc["Domain_Length_mm"].dropna().iloc[0]) \
            if "Domain_Length_mm" in sulc and sulc[
                "Domain_Length_mm"].notna().any() else 10.0
        w = float(sulc["Sulcus_Width_mm"].dropna().iloc[0]) \
            if "Sulcus_Width_mm" in sulc and sulc[
                "Sulcus_Width_mm"].notna().any() else 0.5
        xL, xR = L / 2 - w / 2, L / 2 + w / 2
        xs = np.linspace(0, L, 1500)
        # zoom to the mouth neighbourhood (ref zoom='mouth', 0.5mm margin)
        x_lo, x_hi = max(0.0, xL - 0.5), min(L, xR + 0.5)
        handles = labels = None
        # reference orientation: rows = mu factor, cols = Pe (ref :372)
        for i, mf in enumerate(mfs):
            row_vals = [float(mf)]
            for j, pe in enumerate(pes):
                ax = axes[i][j]
                sel = rect[(rect["Pe"] == pe)
                           & (rect["mu_factor"] == mf)]
                if not len(sel):
                    ax.text(0.5, 0.5, "No data", ha="center",
                            va="center", transform=ax.transAxes)
                    continue
                mu_open = sel["mu_eff_open"].iloc[0]
                step = StepUptakeOpen(mf, mu_open, xL, xR, L_c=0.1 * w)
                vals = step(xs)
                ax.plot(xs, vals, lw=1.4, label=r"Step $\mu(x)$")
                ax.axhline(mf, color="gray", lw=1.2, ls=":",
                           label=r"Baseline $\mu$")
                ax.axvspan(xL, xR, alpha=0.15, color="gray")
                ax.set_xlim(x_lo, x_hi)
                ax.grid(True, alpha=0.3)
                if i == 0:
                    ax.set_title(f"Pe = {pe:g}", fontsize=10)
                ax.set_xlabel("x")
                if j == 0:
                    ax.set_ylabel(rf"$\mu={mf:g}$" "\n" r"$\mu(x)$")
                row_vals += [float(np.min(vals)), float(np.max(vals))]
                handles, labels = ax.get_legend_handles_labels()
            if len(row_vals) > 1:
                # row-uniform y-limits (ref :427-441)
                lo, hi = min(row_vals), max(row_vals)
                pad = 0.05 * max(hi - lo, 1e-12)
                for ax in axes[i]:
                    ax.set_ylim(lo - pad, hi + pad)
        if handles:
            fig.legend(handles, labels, loc="lower center",
                       ncol=len(labels), fontsize=9,
                       bbox_to_anchor=(0.5, -0.02))
        fig.tight_layout()
        fig.savefig(os.path.join(plots_dir, "mu_step_profiles_grid.png"),
                    dpi=Config.DPI, bbox_inches="tight")
        fig.savefig(os.path.join(plots_dir, "mu_step_profiles_grid.pdf"),
                    bbox_inches="tight")
    except Exception as e:
        print(f"  [plot] mu(x) grid failed: {e}")
    finally:
        plt.close(fig)
