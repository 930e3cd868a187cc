"""Cross-configuration comparison plots + JSON summary
(ref plotting.py:778-1143)."""

from __future__ import annotations

import json
import os

import numpy as np

from .style import Config, latexify_label, safe_plot

__all__ = ["plot_configuration_comparison", "plot_aspect_ratio_comparison",
           "save_summary"]


def _get(results, *path, default=None):
    cur = results
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return default
        cur = cur[p]
    return cur


def plot_configuration_comparison(results_dict, plots_dir):
    """Bar comparisons of flux / mass / avg-conc / mu_eff over configs
    (ref plotting.py:778-951)."""
    os.makedirs(plots_dir, exist_ok=True)
    names = list(results_dict.keys())

    def bars(path_base, values, title, ylabel):
        with safe_plot(os.path.join(plots_dir, path_base),
                       figsize=Config.FIGSIZE_WIDE) as (fig, ax):
            x = np.arange(len(names))
            vals = [v if v is not None else np.nan for v in values]
            ax.bar(x, vals)
            ax.set_xticks(x)
            ax.set_xticklabels(names, rotation=45, ha="right", fontsize=8)
            ax.set_title(latexify_label(title))
            ax.set_ylabel(latexify_label(ylabel))

    bars("compare_total_mass",
         [_get(r, "mass_metrics", "total_mass") for r in
          results_dict.values()],
         "Total mass by configuration", "∫c dx")
    bars("compare_uptake_flux",
         [_get(r, "flux_metrics", "uptake_flux") for r in
          results_dict.values()],
         "Uptake flux by configuration", "∫μc ds")
    avg = []
    for r in results_dict.values():
        a = _get(r, "mass_metrics", "average_concentration")
        avg.append(a.get("total") if isinstance(a, dict) else a)
    bars("compare_avg_concentration", avg,
         "Average concentration by configuration", "c̄")
    mue = [_get(r, "mu_eff_comparison", "mu_eff_sim") for r in
           results_dict.values()]
    if any(v is not None for v in mue):
        bars("compare_mu_eff_sim", mue,
             "μ_eff^sim by configuration", "μ_eff")


def plot_aspect_ratio_comparison(results_dict, plots_dir):
    """mu_eff ratios vs aspect ratio line plot (ref plotting.py:953-1090)."""
    os.makedirs(plots_dir, exist_ok=True)
    pts = []
    for name, r in results_dict.items():
        ar = _get(r, "aspect_ratio") or _get(r, "aspect_ratio_metadata",
                                             "aspect_ratio")
        ratio = _get(r, "mu_eff_comparison", "ratios", "sim")
        if ar is not None and ratio is not None:
            pts.append((ar, ratio, name))
    if not pts:
        return
    pts.sort()
    with safe_plot(os.path.join(plots_dir,
                                "aspect_ratio_comparison")) as (fig, ax):
        ars = [p[0] for p in pts]
        ratios = [p[1] for p in pts]
        ax.semilogx(ars, ratios, "o-")
        ax.axhline(1.0, color="gray", lw=0.6, ls="--")
        ax.set_xlabel("aspect ratio h/w")
        ax.set_ylabel(r"$\mu_{\mathrm{eff}}^{sim}/\mu$")


def save_summary(results_dict, path):
    """JSON summary of key metrics across configs (ref plotting.py:1096-1143)."""
    summary = {}
    for name, r in results_dict.items():
        if r is None:
            summary[name] = None
            continue
        avg = _get(r, "mass_metrics", "average_concentration")
        summary[name] = {
            "total_mass": _get(r, "mass_metrics", "total_mass"),
            "average_concentration": (avg.get("total")
                                      if isinstance(avg, dict) else avg),
            "uptake_flux": _get(r, "flux_metrics", "uptake_flux"),
            "mu_eff_sim": _get(r, "mu_eff_comparison", "mu_eff_sim"),
            "mu_eff_arc": _get(r, "mu_eff_comparison", "mu_eff_arc"),
            "mu_eff_enh": _get(r, "mu_eff_comparison", "mu_eff_enh"),
            "mu_eff_open": _get(r, "mu_eff_comparison", "mu_eff_open"),
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary
