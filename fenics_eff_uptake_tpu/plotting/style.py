"""Plot styling and safe figure management (ref plotting.py:21-285).

Differences from the reference: LaTeX text rendering is used only if a latex
binary exists (the reference hard-requires it, plotting.py:35-85); otherwise
matplotlib mathtext gives equivalent output without the dependency.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

__all__ = ["Config", "set_style", "safe_plot", "latexify_label",
           "format_filename_value", "create_study_dirs",
           "format_bar_label", "add_value_labels"]


class Config:
    DPI = 300
    FIGSIZE = (8, 5)
    FIGSIZE_WIDE = (12, 5)
    FIGSIZE_GRID = (12, 10)
    CMAP_FIELD = "viridis"
    CMAP_DIVERGING = "RdBu_r"
    SAVE_PDF = True


_STYLE_SET = False


def set_style():
    """Serif/Computer-Modern styling (ref plotting.py:35-85)."""
    global _STYLE_SET
    if _STYLE_SET:
        return
    use_latex = shutil.which("latex") is not None
    plt.rcParams.update({
        "font.family": "serif",
        "mathtext.fontset": "cm",
        "text.usetex": use_latex,
        "axes.labelsize": 12,
        "axes.titlesize": 13,
        "legend.fontsize": 10,
        "xtick.labelsize": 10,
        "ytick.labelsize": 10,
        "figure.dpi": 100,
        "savefig.dpi": Config.DPI,
        "axes.unicode_minus": False,
    })
    _STYLE_SET = True


@contextmanager
def safe_plot(path_base, figsize=None):
    """Create/save/close a figure, swallowing plot errors
    (ref plotting.py:87-114): a failed figure never kills a study."""
    set_style()
    fig, ax = plt.subplots(figsize=figsize or Config.FIGSIZE)
    try:
        yield fig, ax
        os.makedirs(os.path.dirname(path_base) or ".", exist_ok=True)
        fig.savefig(path_base + ".png", bbox_inches="tight",
                    dpi=Config.DPI)
        if Config.SAVE_PDF:
            fig.savefig(path_base + ".pdf", bbox_inches="tight")
    except Exception as e:
        print(f"  [plot] failed for {os.path.basename(path_base)}: {e}")
    finally:
        plt.close(fig)


def format_bar_label(value, mode="dual"):
    """Bar-label text (ref plotting.py:116-134 behaviour): 'dual' shows
    a compact decimal plus scientific notation underneath."""
    import numpy as _np
    if not _np.isfinite(value) or abs(value) < 1e-12:
        return "0" if mode != "dual" else "0\n(0.0e+00)"
    if mode == "simple":
        return f"{value:.3f}"
    if mode == "sci":
        return f"{value:.2e}"
    if abs(value) >= 1e6 or abs(value) < 1e-3:
        dec = f"{value:.3g}"
    else:
        dec = f"{value:.6f}".rstrip("0").rstrip(".")
    return f"{dec}\n({value:.2e})"


def add_value_labels(ax, mode="dual", rotation=0.0, pad_frac=0.04):
    """Write value labels above each bar and auto-extend the y-limits so
    none clip (ref plotting.py:136-170 behaviour)."""
    import numpy as _np
    tops = []
    for container in getattr(ax, "containers", []):
        for bar in container:
            if not hasattr(bar, "get_height"):
                continue
            h = bar.get_height()
            if h == 0 or not _np.isfinite(h):
                continue
            x = bar.get_x() + bar.get_width() / 2.0
            y0, y1 = ax.get_ylim()
            y = h + 0.02 * (y1 - y0)
            ax.text(x, y, format_bar_label(h, mode), ha="center",
                    va="bottom", rotation=rotation, fontsize=7,
                    fontweight="bold")
            tops.append(y)
    if tops:
        y0, y1 = ax.get_ylim()
        span = max(y1 - y0, 1e-300)
        # two text lines in the 'dual' mode need ~12% of the axis height
        need = max(tops) + (0.12 if mode == "dual" else 0.06) * span \
            + pad_frac * span
        if need > y1:
            ax.set_ylim(y0, need)


_GREEK = {
    "mu": r"\mu", "mu_eff": r"\mu_{\mathrm{eff}}", "Pe": r"\mathrm{Pe}",
}


def latexify_label(text):
    """unicode/plain -> mathtext label (ref plotting.py:255-281)."""
    replacements = {
        "μ_eff": r"$\mu_{\mathrm{eff}}$",
        "μ": r"$\mu$",
        "Φ": r"$\Phi$",
        "×": r"$\times$",
    }
    for k, v in replacements.items():
        text = text.replace(k, v)
    return text


def format_filename_value(value):
    """Numeric -> filename-safe string (ref plotting.py:249-253)."""
    return f"{value}".replace(".", "p")


def create_study_dirs(study_name, base_dir):
    """(ref plotting.py:241-247)"""
    study_dir = os.path.join(base_dir, f"{study_name} Analysis")
    sim_dir = os.path.join(base_dir, f"{study_name} Simulations")
    os.makedirs(study_dir, exist_ok=True)
    os.makedirs(sim_dir, exist_ok=True)
    return study_dir, sim_dir
