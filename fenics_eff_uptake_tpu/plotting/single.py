"""Per-simulation plot suite (ref plotting.py:291-772).

Generates the same figure set as the reference's plot_single_simulation:
mesh, |u| and c fields, flux bar charts (overview / external breakdown /
sulcus breakdown / consistency check / physical-vs-Robin / segment ratios),
mass bars, mu_eff method comparison.
"""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import matplotlib.tri as mtri
import numpy as np

from .style import (Config, add_value_labels, latexify_label, safe_plot,
                    set_style)

__all__ = ["plot_single_simulation"]


def _triangulation(mesh):
    return mtri.Triangulation(mesh.vertices[:, 0], mesh.vertices[:, 1],
                              mesh.cells)


def _vertex_scalar(fn):
    V = len(fn.space.mesh.vertices)
    vals = np.asarray(fn.values)
    if fn.space.vs == 1:
        return vals[:V]
    return np.stack([vals[0::2][:V], vals[1::2][:V]], axis=1)


def _bar(ax, labels, values, colors=None, title="", ylabel="",
         label_mode="dual"):
    x = np.arange(len(labels))
    vals = [v if (v is not None and np.isfinite(v)) else 0.0
            for v in values]
    ax.bar(x, vals, color=colors)
    ax.set_xticks(x)
    ax.set_xticklabels([latexify_label(l) for l in labels], rotation=30,
                       ha="right")
    ax.set_title(latexify_label(title))
    ax.set_ylabel(latexify_label(ylabel))
    ax.axhline(0, color="k", lw=0.5)
    # dual-format value labels + y-limit auto-extension
    # (ref plotting.py:116-170)
    add_value_labels(ax, mode=label_mode)


def plot_single_simulation(results, plots_dir):
    """All per-run figures (ref plotting.py:758-772)."""
    set_style()
    os.makedirs(plots_dir, exist_ok=True)
    mesh = results["mesh_results"]["mesh"]
    c = results["c"]
    u = results.get("u")
    tri = _triangulation(mesh)

    # 1) mesh (ref plotting.py:291-318)
    with safe_plot(os.path.join(plots_dir, "mesh"),
                   figsize=Config.FIGSIZE_WIDE) as (fig, ax):
        ax.triplot(tri, lw=0.2, color="steelblue")
        ax.set_aspect("equal")
        ax.set_title("Mesh")

    # 2) concentration field (ref plotting.py:344-365)
    with safe_plot(os.path.join(plots_dir, "concentration_field"),
                   figsize=Config.FIGSIZE_WIDE) as (fig, ax):
        tc = ax.tripcolor(tri, _vertex_scalar(c), shading="gouraud",
                          cmap=Config.CMAP_FIELD)
        fig.colorbar(tc, ax=ax, label="c")
        ax.set_aspect("equal")
        ax.set_title("Concentration")

    # 3) velocity magnitude (ref plotting.py:320-342)
    if u is not None and np.any(np.asarray(u.values) != 0):
        with safe_plot(os.path.join(plots_dir, "velocity_field"),
                       figsize=Config.FIGSIZE_WIDE) as (fig, ax):
            uv = _vertex_scalar(u)
            umag = np.linalg.norm(uv, axis=1)
            tc = ax.tripcolor(tri, umag, shading="gouraud",
                              cmap=Config.CMAP_FIELD)
            fig.colorbar(tc, ax=ax, label="|u|")
            ax.set_aspect("equal")
            ax.set_title("Velocity magnitude")

    fm = results.get("flux_metrics", {})
    pf = fm.get("physical_flux", {})

    # 4) flux overview (ref plotting.py:380-430)
    with safe_plot(os.path.join(plots_dir, "flux_overview")) as (fig, ax):
        labels = ["left", "right", "top", "bottom"]
        vals = [pf.get(k, {}).get("total", 0.0) for k in labels]
        _bar(ax, labels, vals, title="Physical flux per boundary",
             ylabel="flux")

    # 4b) external breakdown: diffusive vs advective per boundary
    # (ref plotting.py:432-470)
    with safe_plot(os.path.join(plots_dir,
                                "flux_external_breakdown")) as (fig, ax):
        labels = ["left", "right", "top", "bottom"]
        x = np.arange(len(labels))
        w = 0.38
        dv = [pf.get(k, {}).get("diffusive", 0.0) or 0.0 for k in labels]
        av = [pf.get(k, {}).get("advective", 0.0) or 0.0 for k in labels]
        ax.bar(x - w / 2, dv, w, label="diffusive", color="steelblue")
        ax.bar(x + w / 2, av, w, label="advective", color="darkorange")
        ax.set_xticks(x)
        ax.set_xticklabels(labels)
        ax.axhline(0, color="k", lw=0.5)
        ax.set_title("External flux breakdown")
        ax.set_ylabel("flux")
        ax.legend()
        add_value_labels(ax, mode="sci")

    # 5) uptake vs physical bottom flux (ref plotting.py:551-600)
    with safe_plot(os.path.join(plots_dir,
                                "flux_physical_vs_robin")) as (fig, ax):
        phys = pf.get("bottom", {}).get("total", 0.0)
        upt = fm.get("uptake_flux", 0.0)
        _bar(ax, ["physical −D∇c·n", "Robin μc"], [phys, upt],
             colors=["steelblue", "darkorange"],
             title="Bottom flux: physical vs Robin", ylabel="flux")

    sulc = fm.get("sulcus_specific", {})
    if sulc:
        spf = sulc.get("physical_flux", {})
        # 6) sulcus segment breakdown (ref plotting.py:432-500)
        with safe_plot(os.path.join(plots_dir,
                                    "flux_sulcus_breakdown")) as (fig, ax):
            labels = ["bottom_left", "sulcus", "bottom_right",
                      "sulcus_opening", "y0_flux"]
            vals = [spf.get(k, {}).get("total", 0.0) for k in labels]
            _bar(ax, labels, vals, title="Sulcus segment fluxes",
                 ylabel="flux")
        # 7) consistency check (ref plotting.py:524-548)
        with safe_plot(os.path.join(plots_dir,
                                    "flux_consistency_check")) as (fig, ax):
            y0 = spf.get("y0_flux", {}).get("total", 0.0)
            y0c = spf.get("y0_combined", {}).get("total", 0.0)
            _bar(ax, ["y0_flux (one-shot)", "y0_combined (5+7+mouth)"],
                 [y0, y0c], colors=["seagreen", "slateblue"],
                 title="Flux consistency check", ylabel="flux")
        # 7b) segment ratios: share of the combined bottom flux
        # (ref plotting.py:570-602 segment-ratio panel)
        with safe_plot(os.path.join(plots_dir,
                                    "flux_segment_ratios")) as (fig, ax):
            tot = spf.get("y0_combined", {}).get("total", 0.0)
            labels = ["bottom_left", "sulcus_opening", "bottom_right"]
            vals = [(spf.get(k, {}).get("total", 0.0) / tot
                     if tot not in (0.0, None) else np.nan)
                    for k in labels]
            _bar(ax, labels, vals, label_mode="simple",
                 title="Segment share of y0 flux", ylabel="fraction")
        # 8) uptake segments (ref plotting.py:502-522)
        uf = sulc.get("uptake_flux", {})
        with safe_plot(os.path.join(plots_dir,
                                    "uptake_flux_segments")) as (fig, ax):
            labels = ["bottom_left", "sulcus", "bottom_right", "total"]
            vals = [uf.get(k, 0.0) for k in labels]
            _bar(ax, labels, vals, title="Robin uptake flux per segment",
                 ylabel="μc flux")

    # 9) mass metrics (ref plotting.py:604-655)
    mm = results.get("mass_metrics", {})
    with safe_plot(os.path.join(plots_dir, "mass_metrics")) as (fig, ax):
        if "sulcus_mass" in mm:
            labels = ["total", "sulcus", "channel"]
            vals = [mm.get("total_mass"), mm.get("sulcus_mass"),
                    mm.get("rectangle_mass")]
        else:
            labels = ["total"]
            vals = [mm.get("total_mass")]
        _bar(ax, labels, vals, title="Mass by region", ylabel="∫c dx")

    # 10) mu_eff comparison (ref plotting.py:657-756)
    me = results.get("mu_eff_comparison")
    if me:
        with safe_plot(os.path.join(plots_dir,
                                    "mu_eff_methods")) as (fig, ax):
            labels = ["sim", "arc", "enh", "open"]
            vals = [me.get(f"mu_eff_{k}") for k in labels]
            vals = [v if v is not None else np.nan for v in vals]
            _bar(ax, [f"μ_eff^{k}" for k in labels], vals,
                 title="μ_eff estimators", ylabel="μ_eff")
