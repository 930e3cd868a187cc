"""Point evaluation and line-profile extraction.

Replaces the reference's per-point dolfin bounding-box-tree evaluation loops
(analysis.py:341-632) with a vectorised locate-and-evaluate: candidate cells
from a centroid KD-tree, barycentric inside-tests computed for all points at
once, P1/P2 evaluation by basis tabulation at the located reference coords.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

from ..fem.elements import tabulate
from ..fem.space import Function, FunctionSpace
from ..meshing.mesh_data import MeshData

__all__ = [
    "PointLocator", "eval_function", "extract_line_profile",
    "compute_conc_profiles", "compute_velocity_metrics",
]


class PointLocator:
    """Locate points in a triangle mesh via centroid KD-tree + barycentric test."""

    def __init__(self, mesh: MeshData, k=24, tol=1e-10):
        self.mesh = mesh
        v = mesh.vertices
        c = mesh.cells
        self.p0 = v[c[:, 0]]
        d1 = v[c[:, 1]] - self.p0
        d2 = v[c[:, 2]] - self.p0
        det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        # inverse affine map rows
        self.inv = np.stack([
            np.stack([d2[:, 1], -d2[:, 0]], axis=1),
            np.stack([-d1[:, 1], d1[:, 0]], axis=1),
        ], axis=1) / det[:, None, None]
        self.tree = cKDTree(v[c].mean(axis=1))
        self.k = min(k, len(c))
        self.tol = tol

    def locate(self, pts) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (cell_idx (N,), ref_coords (N,2)); cell_idx=-1 if outside."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        _, cand = self.tree.query(pts, k=self.k, workers=-1)
        cand = np.atleast_2d(cand)                       # (N,k)
        rel = pts[:, None, :] - self.p0[cand]            # (N,k,2)
        ref = np.einsum("nkab,nkb->nka", self.inv[cand], rel)
        lam0 = 1.0 - ref[..., 0] - ref[..., 1]
        inside = ((ref[..., 0] >= -self.tol) & (ref[..., 1] >= -self.tol)
                  & (lam0 >= -self.tol))
        first = inside.argmax(axis=1)
        found = inside.any(axis=1)
        cells = np.where(found, cand[np.arange(len(pts)), first], -1)
        refc = ref[np.arange(len(pts)), first]
        return cells, refc


def eval_function(fn: Function, pts, locator: Optional[PointLocator] = None):
    """Evaluate a scalar or vector Function at points.

    Returns (values (N,) or (N,2), valid (N,) bool).
    """
    space = fn.space
    if locator is None:
        locator = PointLocator(space.mesh)
    cells, ref = locator.locate(pts)
    valid = cells >= 0
    safe_cells = np.where(valid, cells, 0)
    phi = tabulate(space.element, ref)                 # (N,nd)
    vals_np = np.asarray(fn.values)
    if space.vs == 1:
        ce = vals_np[space.cell_dofs[safe_cells]]      # (N,nd)
        out = (phi * ce).sum(1)
    else:
        ce = vals_np[space.cell_dofs[safe_cells]].reshape(len(cells), -1, 2)
        out = np.einsum("ni,nia->na", phi, ce)
    return out, valid


def extract_line_profile(fn: Function, axis: str, location: float,
                         span, n_points=100,
                         locator: Optional[PointLocator] = None):
    """Sample along a horizontal (axis='x') or vertical (axis='y') line.

    Mirrors extract_concentration_*_line_profile (ref analysis.py:341-419):
    out-of-mesh points are dropped.
    """
    lo, hi = span
    coords = np.linspace(lo, hi, n_points)
    if axis == "x":     # horizontal line: vary x at fixed y=location
        pts = np.stack([coords, np.full_like(coords, location)], axis=1)
    else:               # vertical line: vary y at fixed x=location
        pts = np.stack([np.full_like(coords, location), coords], axis=1)
    vals, valid = eval_function(fn, pts, locator)
    return coords[valid], vals[valid]


def compute_conc_profiles(c: Function, mesh: MeshData, params, domain_type,
                          n_points=400):
    """Standard line-profile stats + samples (ref analysis.py:421-550).

    Returns {'profiles': stats, 'profiles_full': samples, 'profiles_meta':...}
    to merge into mass_metrics, same structure as the reference.
    """
    L = float(getattr(params, "L", getattr(params, "L_dim", 1.0)))
    H = float(getattr(params, "H", getattr(params, "H_dim", 1.0)))
    locator = PointLocator(mesh)

    if domain_type == "rectangular":
        horiz = [(1e-6 * H, "mouth_level"), (0.25 * H, "lower_channel"),
                 (0.50 * H, "mid_channel"), (0.75 * H, "upper_channel")]
        x_range = (0.0, L)
        y_range = (0.0, H)
    else:
        y_min = float(mesh.vertices[:, 1].min())
        y_sulcus_mid = 0.5 * y_min
        horiz = [(y_sulcus_mid, "sulcus_mid"), (1e-6 * H, "mouth_level"),
                 (0.25 * H, "lower_channel"), (0.50 * H, "mid_channel"),
                 (0.75 * H, "upper_channel")]
        x_range = (float(mesh.vertices[:, 0].min()),
                   float(mesh.vertices[:, 0].max()))
        y_range = (y_min, float(mesh.vertices[:, 1].max()))
    vert = [(0.25 * L, "x_quarter"), (0.50 * L, "x_mid"),
            (0.75 * L, "x_three_quarters")]

    def _stats(vals):
        if vals.size == 0:
            return {"min_c": None, "max_c": None, "avg_c": None,
                    "n_samples": 0}
        return {"min_c": float(vals.min()), "max_c": float(vals.max()),
                "avg_c": float(vals.mean()), "n_samples": int(vals.size)}

    stats = {"horizontal": {}, "vertical": {}}
    full = {"horizontal": {}, "vertical": {}}
    for y_loc, name in horiz:
        xs, vs = extract_line_profile(c, "x", y_loc, x_range, n_points,
                                      locator)
        s = _stats(vs)
        if s["n_samples"] > 0:
            stats["horizontal"][name] = {"y": float(y_loc), **s}
            full["horizontal"][name] = {"y": float(y_loc),
                                        "x": xs.tolist(), "c": vs.tolist()}
    for x_loc, name in vert:
        ys, vs = extract_line_profile(c, "y", x_loc, y_range, n_points,
                                      locator)
        s = _stats(vs)
        if s["n_samples"] > 0:
            stats["vertical"][name] = {"x": float(x_loc), **s}
            full["vertical"][name] = {"x": float(x_loc),
                                      "y": ys.tolist(), "c": vs.tolist()}
    return {
        "profiles": stats,
        "profiles_full": full,
        "profiles_meta": {
            "n_points": int(n_points),
            "domain_type": domain_type,
            "x_range": tuple(map(float, x_range)),
            "y_range": tuple(map(float, y_range)) if y_range else None,
        },
    }


def compute_velocity_metrics(u: Optional[Function], mesh: MeshData, params,
                             n_global=1000, seed=0):
    """Velocity line/global stats (ref analysis.py:721-830).

    Same metric keys as the reference; the global vertex sample is seeded
    (deterministic) unlike the reference's unseeded np.random.choice
    (SURVEY.md 5.9 flags that as a latent defect).
    """
    if u is None:
        return {}
    mode = getattr(params, "mode", "unknown")
    if mode not in ("adv-diff", "no-uptake"):
        return {}
    L = float(params.L)
    H = float(params.H)
    sulcus_w = float(getattr(params, "sulci_w", 0.0))
    cx = L / 2
    locator = PointLocator(mesh)
    out = {}

    def hline(y_loc, name):
        xs = np.linspace(0, L, 100)
        pts = np.stack([xs, np.full_like(xs, y_loc)], axis=1)
        vals, valid = eval_function(u, pts, locator)
        v = vals[valid]
        if len(v):
            umag = np.linalg.norm(v, axis=1)
            out[f"max_ux_{name}"] = float(np.abs(v[:, 0]).max())
            out[f"max_umag_{name}"] = float(umag.max())
            out[f"avg_ux_{name}"] = float(np.abs(v[:, 0]).mean())
            out[f"avg_umag_{name}"] = float(umag.mean())
        else:
            for k in ("max_ux", "max_umag", "avg_ux", "avg_umag"):
                out[f"{k}_{name}"] = 0

    def vline(x_loc, name):
        ys = np.linspace(0, H, 100)
        pts = np.stack([np.full_like(ys, x_loc), ys], axis=1)
        vals, valid = eval_function(u, pts, locator)
        v = vals[valid]
        if len(v):
            umag = np.linalg.norm(v, axis=1)
            out[f"max_umag_{name}"] = float(umag.max())
            out[f"max_uy_{name}"] = float(np.abs(v[:, 1]).max())
            out[f"avg_umag_{name}"] = float(umag.mean())
            out[f"avg_uy_{name}"] = float(np.abs(v[:, 1]).mean())
        else:
            for k in ("max_umag", "max_uy", "avg_umag", "avg_uy"):
                out[f"{k}_{name}"] = 0

    for y_loc, name in [(1e-6 * H, "mouth_level"), (0.25 * H, "lower_channel"),
                        (0.50 * H, "mid_channel"), (0.75 * H, "upper_channel")]:
        if 0 <= y_loc <= H:
            hline(y_loc, name)
    for x_loc, name in [(cx - sulcus_w / 2, "sulcus_leading"),
                        (cx, "sulcus_center"),
                        (cx + sulcus_w / 2, "sulcus_trailing")]:
        if 0 <= x_loc <= L:
            vline(x_loc, name)

    coords = mesh.vertices
    n_sample = min(n_global, len(coords))
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(coords), n_sample, replace=False)
    vals, valid = eval_function(u, coords[idx], locator)
    v = vals[valid]
    if len(v):
        umag = np.linalg.norm(v, axis=1)
        out["global_max_umag"] = float(umag.max())
        out["global_avg_umag"] = float(umag.mean())
        out["global_max_ux"] = float(np.abs(v[:, 0]).max())
        out["global_avg_ux"] = float(np.abs(v[:, 0]).mean())
        out["global_max_uy"] = float(np.abs(v[:, 1]).max())
        out["global_avg_uy"] = float(np.abs(v[:, 1]).mean())
    else:
        for k in ("global_max_umag", "global_avg_umag", "global_max_ux",
                  "global_avg_ux", "global_max_uy", "global_avg_uy"):
            out[k] = 0
    return out
