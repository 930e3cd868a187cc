"""Batched metrics: all post-processing for a whole sweep in ONE dispatch.

The per-run metrics engine (analysis/flux.py etc.) issues dozens of small
eager device ops; through the TPU tunnel each pays ~0.1-1 s of latency, so
a 20-point sweep spends minutes in metrics (measured: the dominant tail of
TPU study runs).  This module precomputes the facet/cell quadrature tables
once per (mesh, space) and evaluates every boundary/interface/mass integral
for ALL sweep columns in one jitted call returning (B,) arrays, which the
study drivers then reshape into the reference's metric dict schema.

Round-2: the jitted program is STRUCTURE-KEYED with every quadrature
table as a runtime ARGUMENT and facet/cell counts padded to buckets
(padding rows carry zero arc-length / zero detJ, so integrals are
unaffected) -- multi-geometry studies share one compiled metrics program
per bucket instead of remote-compiling per mesh (parallel/sweep.py's
argument-passing convention).

Supports the full advection-diffusion bookkeeping: pass a velocity
Function (shared across the batch -- the nondimensional Stokes field is
Pe-independent), per-sample diffusivities ``D_vec`` (for Pe sweeps), and
per-sample spatially varying uptake profiles ``mu_profiles`` (step-mu).
With none of those, it reduces to the pure-diffusion no-adv path.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import cell_geometry
from ..fem.elements import tabulate
from ..fem.quadrature import triangle_rule
from ..fem.space import Function, FunctionSpace
from ..meshing.mesh_data import MARKERS, MeshData
from .facets import build_facet_quad
from .flux import boundary_quad, mouth_quad

__all__ = ["SweepMetrics", "build_sweep_metrics", "metrics_to_dicts"]


class SweepMetrics(NamedTuple):
    fn: "object"          # (X (B,n), mu_vec (B,), D_vec|None) -> dict (B,)
    space: FunctionSpace


def _bucket(n, g=256):
    """Power-of-two shape menu (>= g): the metrics program compiles once
    per DISTINCT combination of ~9 facet-set sizes + the cell count, so
    fine-grained padding still gave nearly every geometry its own
    program (one remote TPU compile each, ~10 s/geometry of study tail).
    A geometric menu collapses the 23 study geometries into a handful of
    classes at <= 2x einsum padding waste on a once-per-geometry kernel.
    """
    m = g
    while m < n:
        m *= 2
    return m


class _FQArgs(NamedTuple):
    """Padded facet-set quadrature tables (runtime arguments)."""
    phi: jnp.ndarray          # (F,Q,nd)
    grad: jnp.ndarray         # (F,Q,nd,2)
    normal: jnp.ndarray       # (F,2)
    length: jnp.ndarray       # (F,)  zero on padding rows
    cell_dofs: jnp.ndarray    # (F,nd)


def _fq_args(fq, pad=True):
    if fq is None:
        return None
    F = fq.phi.shape[0]
    Fp = _bucket(F) if pad else F
    def p(a, fill=0.0):
        a = np.asarray(a)
        if Fp == F:
            return jnp.asarray(a)
        w = [(0, Fp - F)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(a, w, constant_values=fill))
    return _FQArgs(phi=p(fq.phi), grad=p(fq.grad), normal=p(fq.normal),
                   length=p(fq.length),
                   cell_dofs=p(fq.cell_dofs).astype(jnp.int32))


def _batch_eval(fq: _FQArgs, X):
    ce = X[:, fq.cell_dofs]                        # (B,F,nd)
    return jnp.einsum("fqi,bfi->bfq", fq.phi, ce)


def _batch_grad_n(fq: _FQArgs, X):
    ce = X[:, fq.cell_dofs]
    g = jnp.einsum("fqia,bfi->bfqa", fq.grad, ce)  # (B,F,Q,2)
    return jnp.einsum("bfqa,fa->bfq", g, fq.normal)


def _batch_facet_integral(qw, fq: _FQArgs, density):
    return jnp.einsum("q,bfq,f->b", qw, density, fq.length)


_METRICS_PROG_CACHE = {}


def _tables_struct(tables):
    """Static structure key for the padded tables pytree."""
    def sh(x):
        return None if x is None else tuple(x.shape)
    quads, un_tab, mu_tab, cell = tables
    return (tuple(sorted((k, sh(v.phi) if v is not None else None)
                         for k, v in quads.items())),
            tuple(sorted((k, sh(v)) for k, v in un_tab.items())),
            tuple(sorted((k, None if v is None else tuple(v.shape[1:]))
                         for k, v in mu_tab.items())),
            tuple(sh(c) for c in cell[:4]),
            )


def _metrics_program(struct, is_sulcus):
    key = (struct, is_sulcus)
    hit = _METRICS_PROG_CACHE.get(key)
    if hit is not None:
        return hit

    @jax.jit
    def fn(tables, X, mu_vec, D_vec):
        quads, un_tab, mu_tab, cell = tables
        phi_c, detJ, cdofs, cav_mask, qwj, qw_f = cell
        B = X.shape[0]
        Ds = D_vec[:, None, None]
        zeros = jnp.zeros(B)

        def densities(name, fq):
            dd = -Ds * _batch_grad_n(fq, X)
            un = un_tab.get(name)
            ad = (un[None, :, :] * _batch_eval(fq, X)
                  if un is not None else None)
            return dd, ad

        def uptake(name, fq):
            cq = _batch_eval(fq, X)
            if name in mu_tab:
                mt = mu_tab[name]
                if mt is None:
                    return zeros
                return _batch_facet_integral(qw_f, fq, mt * cq)
            return mu_vec * _batch_facet_integral(qw_f, fq, cq)

        out = {}
        for name in ("left", "right", "top", "bottom"):
            fq = quads.get(name)
            if fq is None:
                out[f"flux_{name}"] = out[f"adv_{name}"] = zeros
                continue
            dd, ad = densities(name, fq)
            out[f"flux_{name}"] = _batch_facet_integral(qw_f, fq, dd)
            out[f"adv_{name}"] = (_batch_facet_integral(qw_f, fq, ad)
                                  if ad is not None else zeros)
        out["uptake_bottom"] = (uptake("bottom", quads["bottom"])
                                if quads.get("bottom") is not None
                                else zeros)

        if is_sulcus:
            for name in ("bottom_left", "sulcus", "bottom_right"):
                fq = quads.get(name)
                if fq is None:
                    out[f"flux_{name}"] = out[f"adv_{name}"] = zeros
                    out[f"uptake_{name}"] = zeros
                    continue
                dd, ad = densities(name, fq)
                out[f"flux_{name}"] = _batch_facet_integral(qw_f, fq, dd)
                out[f"adv_{name}"] = (
                    _batch_facet_integral(qw_f, fq, ad)
                    if ad is not None else zeros)
                out[f"uptake_{name}"] = uptake(name, fq)
            fy = quads.get("y0_ext")
            mq = quads.get("mouth")
            if fy is not None:
                dd, ad = densities("y0_ext", fy)
                d_ext = _batch_facet_integral(qw_f, fy, dd)
                a_ext = (_batch_facet_integral(qw_f, fy, ad)
                         if ad is not None else zeros)
            else:
                d_ext = a_ext = zeros
            if mq is not None:
                dd, ad = densities("mouth", mq)
                J_open = _batch_facet_integral(qw_f, mq, dd)
                J_open_adv = (_batch_facet_integral(qw_f, mq, ad)
                              if ad is not None else zeros)
                # exchange metrics use the TOTAL signed density
                # (ref analysis.py:252-263)
                q_open = dd if ad is None else dd + ad
                out["E_L1"] = _batch_facet_integral(
                    qw_f, mq, jnp.abs(q_open))
                out["Q_in"] = _batch_facet_integral(
                    qw_f, mq, jnp.maximum(q_open, 0.0))
                out["Q_out"] = _batch_facet_integral(
                    qw_f, mq, jnp.maximum(-q_open, 0.0))
                out["C_mouth"] = _batch_facet_integral(
                    qw_f, mq, _batch_eval(mq, X))
            else:
                J_open = J_open_adv = zeros
                out["E_L1"] = out["Q_in"] = out["Q_out"] = zeros
                out["C_mouth"] = zeros
            out["flux_mouth"] = J_open
            out["adv_mouth"] = J_open_adv
            out["flux_y0_ext"] = d_ext
            out["adv_y0_ext"] = a_ext
            out["C_y0_ext"] = (
                _batch_facet_integral(qw_f, fy, _batch_eval(fy, X))
                if fy is not None else zeros)

        # mass integrals (padding cells carry detJ = 0)
        cq = jnp.einsum("qi,bti->btq", phi_c, X[:, cdofs])   # (B,T,Q)
        per_cell = jnp.einsum("q,btq,t->bt", qwj, cq, detJ)  # (B,T)
        out["total_mass"] = per_cell.sum(axis=1)
        if cav_mask is not None:
            out["sulcus_mass"] = jnp.where(cav_mask[None, :], per_cell,
                                           0.0).sum(axis=1)
        return out

    _METRICS_PROG_CACHE[key] = fn
    return fn


def build_sweep_metrics(space: FunctionSpace, mesh: MeshData, D,
                        degree=4, u=None, mu_profiles=None) -> SweepMetrics:
    """Build the all-metrics kernel for a sweep (structure-cached).

    D            default diffusivity; per-sample values can be supplied
                 at call time via ``D_vec``.
    u            optional velocity Function (vector space), SHARED across
                 the batch; its facet normal traces u.n are baked in as
                 (F, Q) tables (ref analysis.py:29-37 advective term).
    mu_profiles  optional list (len B) of callables mu(x) evaluated at
                 the bottom/segment quad points into (B, F, Q) tables;
                 overrides the runtime ``mu_vec`` for the uptake
                 integrals (the adv-diff step-mu studies,
                 ref analysis.py:307-333).
    """
    raw = {}
    for name in ("left", "right", "top", "bottom"):
        raw[name] = boundary_quad(space, mesh.bc_marker == MARKERS[name],
                                  degree)
    is_sulcus = mesh.domain_type == "sulcus"
    if is_sulcus:
        for name in ("bottom_left", "sulcus", "bottom_right"):
            raw[name] = boundary_quad(
                space, mesh.bottom_marker == MARKERS[name], degree)
        raw["y0_ext"] = boundary_quad(
            space, mesh.y0_marker == MARKERS["y0_line"], degree)
        raw["mouth"] = mouth_quad(space, degree)

    quads = {k: _fq_args(v) for k, v in raw.items()}

    # facet quad weights (shared across sets at one degree)
    qw_f = None
    for v in raw.values():
        if v is not None:
            qw_f = jnp.asarray(v.qw)
            break

    # cell quadrature (padded: detJ = 0 on padding cells)
    qp, qw = triangle_rule(degree)
    phi_c = jnp.asarray(tabulate(space.element, qp))
    detJ_t, _ = cell_geometry(jnp.asarray(mesh.vertices),
                              jnp.asarray(mesh.cells))
    T = mesh.num_cells
    Tp = _bucket(T, 4096)
    detJ = jnp.asarray(np.pad(np.asarray(detJ_t), (0, Tp - T)))
    cdofs = jnp.asarray(np.pad(np.asarray(space.cell_dofs),
                               ((0, Tp - T), (0, 0))), dtype=jnp.int32)
    if is_sulcus:
        cav_mask = jnp.asarray(np.pad(mesh.cell_domain == 1,
                                      (0, Tp - T)))
    else:
        cav_mask = None
    qwj = jnp.asarray(qw)
    cell = (phi_c, detJ, cdofs, cav_mask, qwj, qw_f)

    # baked u.n traces per facet set (shared across the batch); padded
    un_tab = {}
    if u is not None:
        for name, fq in raw.items():
            if fq is None:
                continue
            uq = fq.eval_vector(u.values, u.space)          # (F,Q,2)
            un = np.einsum("fqa,fa->fq", np.asarray(uq),
                           np.asarray(fq.normal))
            Fp = quads[name].phi.shape[0]
            un_tab[name] = jnp.asarray(
                np.pad(un, ((0, Fp - un.shape[0]), (0, 0))))

    # baked per-sample mu(x) quadrature tables (step-mu sweeps); padded
    mu_tab = {}
    if mu_profiles is not None:
        names = ["bottom"] + (["bottom_left", "sulcus", "bottom_right"]
                              if is_sulcus else [])
        for name in names:
            fq = raw.get(name)
            if fq is None:
                mu_tab[name] = None
                continue
            mt = np.stack(
                [np.asarray(m(fq.x[:, :, 0]), dtype=np.float64)
                 for m in mu_profiles])                    # (B,F,Q)
            Fp = quads[name].phi.shape[0]
            mu_tab[name] = jnp.asarray(
                np.pad(mt, ((0, 0), (0, Fp - mt.shape[1]), (0, 0))))

    tables = (quads, un_tab, mu_tab, cell)
    prog = _metrics_program(_tables_struct(tables), is_sulcus)
    D_default = float(D)

    def fn(X, mu_vec, D_vec=None):
        if D_vec is None:
            D_vec = jnp.full(X.shape[0], D_default, dtype=jnp.float64)
        return prog(tables, X, mu_vec, D_vec)

    return SweepMetrics(fn=fn, space=space)
def metrics_to_dicts(sm: SweepMetrics, mesh: MeshData, X, mu_values, D,
                     params_list, D_values=None):
    """Run the batched kernel and expand into the reference's metric dicts.

    Returns (flux_metrics_list, mass_metrics_list, mu_eff_list).
    Geometry scalars (areas, lengths) are computed once on host.
    ``D_values`` (len B) supplies per-sample diffusivities (Pe sweeps);
    otherwise the build-time scalar D applies to every column.
    """
    from .mu_eff import (compute_mu_eff_arc, compute_mu_eff_enh,
                         compute_mu_eff_metrics)

    B = X.shape[0]
    mu_vec = jnp.asarray(np.asarray(mu_values, dtype=np.float64))
    D_vec = (None if D_values is None
             else jnp.asarray(np.asarray(D_values, dtype=np.float64)))
    raw = {k: np.asarray(v) for k, v in sm.fn(X, mu_vec, D_vec).items()}

    areas = mesh.cell_areas()
    total_area = float(areas.sum())
    sulc = mesh.cell_domain == 1
    sulcus_area = float(areas[sulc].sum())
    rect_area = total_area - sulcus_area
    is_sulcus = mesh.domain_type == "sulcus"
    if is_sulcus:
        iy = mesh.interior_y0
        v = mesh.vertices
        L_mouth = float(np.linalg.norm(
            v[iy.edges[:, 1]] - v[iy.edges[:, 0]], axis=1).sum()) \
            if iy is not None else 0.0
        e = mesh.boundary.edges[mesh.y0_marker == MARKERS["y0_line"]]
        L_y0_ext = float(np.linalg.norm(
            v[e[:, 1]] - v[e[:, 0]], axis=1).sum())

    flux_list, mass_list, mueff_list = [], [], []
    for b in range(B):
        def F(name):
            d = float(raw[f"flux_{name}"][b])
            a = float(raw[f"adv_{name}"][b])
            return {"diffusive": d, "advective": a, "total": d + a}

        fm = {
            "physical_flux": {n: F(n) for n in
                              ("left", "right", "top", "bottom")},
            "uptake_flux": float(raw["uptake_bottom"][b]),
        }
        if is_sulcus:
            segs = {n: F(n) for n in
                    ("bottom_left", "sulcus", "bottom_right")}
            J_open = float(raw["flux_mouth"][b])
            J_open_adv = float(raw["adv_mouth"][b])
            segs["sulcus_opening"] = {"diffusive": J_open,
                                      "advective": J_open_adv,
                                      "total": J_open + J_open_adv}
            E_L1 = float(raw["E_L1"][b])
            segs["sulcus_opening_extra"] = {
                "E_L1": E_L1,
                "E_avg": E_L1 / L_mouth if L_mouth > 0 else 0.0,
                "Q_in": float(raw["Q_in"][b]),
                "Q_out": float(raw["Q_out"][b]),
                "net_check": float(raw["Q_in"][b] - raw["Q_out"][b]),
                "length": L_mouth,
            }
            d_y0 = float(raw["flux_y0_ext"][b]) + J_open
            a_y0 = float(raw["adv_y0_ext"][b]) + J_open_adv
            segs["y0_flux"] = {"diffusive": d_y0, "advective": a_y0,
                               "total": d_y0 + a_y0}
            segs["bottom_combined"] = {
                f: sum(segs[k][f] for k in
                       ("bottom_left", "sulcus", "bottom_right"))
                for f in ("diffusive", "advective", "total")}
            segs["y0_combined"] = {
                f: sum(segs[k][f] for k in
                       ("bottom_left", "bottom_right", "sulcus_opening"))
                for f in ("diffusive", "advective", "total")}
            segs["_y0_identity_gap"] = abs(
                segs["y0_flux"]["total"] - segs["y0_combined"]["total"])
            fm["sulcus_specific"] = {
                "physical_flux": segs,
                "uptake_flux": {
                    "bottom_left": float(raw["uptake_bottom_left"][b]),
                    "sulcus": float(raw["uptake_sulcus"][b]),
                    "bottom_right": float(raw["uptake_bottom_right"][b]),
                    "total": float(raw["uptake_bottom_left"][b]
                                   + raw["uptake_sulcus"][b]
                                   + raw["uptake_bottom_right"][b]),
                },
            }
        flux_list.append(fm)

        tm = float(raw["total_mass"][b])
        if is_sulcus:
            sm_ = float(raw["sulcus_mass"][b])
            rm = tm - sm_
            mass_list.append({
                "total_mass": tm, "sulcus_mass": sm_,
                "rectangle_mass": rm,
                "total_area": total_area, "sulcus_area": sulcus_area,
                "rectangle_area": rect_area,
                "average_concentration": {
                    "total": tm / total_area,
                    "sulcus_region": (sm_ / sulcus_area
                                      if sulcus_area > 0 else None),
                    "rectangle_region": (rm / rect_area
                                         if rect_area > 0 else None),
                },
            })
        else:
            mass_list.append({
                "total_mass": tm, "total_area": total_area,
                "average_concentration": tm / total_area,
            })

        if is_sulcus:
            params = params_list[b]
            C_mouth = float(raw["C_mouth"][b])
            C_ext = float(raw["C_y0_ext"][b])
            C_tot = C_mouth + C_ext
            mu = float(params.mu)
            arc = compute_mu_eff_arc(params)
            enh = compute_mu_eff_enh(params)
            J_y0 = flux_list[-1]["sulcus_specific"]["physical_flux"][
                "y0_flux"]["total"]
            sim = J_y0 / C_tot if C_tot > 0 else None
            open_ = (flux_list[-1]["sulcus_specific"]["physical_flux"][
                "sulcus_opening"]["total"] / C_mouth
                if C_mouth > 0 else None)

            def _ratio(x):
                return (float(x / mu) if x is not None and mu != 0
                        else None)

            def _pct(a, t):
                return (float(abs(a - t) / abs(t) * 100.0)
                        if a is not None and t not in (None, 0.0) else None)

            mueff_list.append({
                "mu_eff_arc": arc, "mu_eff_enh": enh,
                "mu_eff_sim": sim, "mu_eff_open": open_,
                "ratios": {"arc": _ratio(arc), "enh": _ratio(enh),
                           "sim": _ratio(sim), "open": _ratio(open_)},
                "errors_vs_sim": {"arc": _pct(arc, sim),
                                  "enh": _pct(enh, sim),
                                  "open": _pct(open_, sim)},
                "audit": {
                    "concentrations": {"C_y0_ext": C_ext,
                                       "C_mouth": C_mouth,
                                       "C_y0_total": C_tot},
                    "lengths": {"L_y0_ext": L_y0_ext,
                                "L_mouth": L_mouth,
                                "L_y0_total": L_y0_ext + L_mouth},
                    "means": {
                        "mean_y0_ext": (C_ext / L_y0_ext
                                        if L_y0_ext > 0 else np.nan),
                        "mean_mouth": (C_mouth / L_mouth
                                       if L_mouth > 0 else np.nan),
                        "mean_y0_total": (
                            C_tot / (L_y0_ext + L_mouth)
                            if (L_y0_ext + L_mouth) > 0 else np.nan),
                    },
                    "fluxes": {"J_y0_total": J_y0,
                               "J_sigma_mouth": flux_list[-1][
                                   "sulcus_specific"]["physical_flux"][
                                   "sulcus_opening"]["total"]},
                },
            })
        else:
            mueff_list.append(None)
    return flux_list, mass_list, mueff_list
