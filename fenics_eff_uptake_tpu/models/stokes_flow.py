"""Stokes flow: Taylor-Hood, Poiseuille inlet, no-slip walls, free outlet.

TPU-native equivalent of ``stokes_solver`` / ``stokes_solver_no_adv``
(ref solvers.py:237-315):

  spaces : u in vector P2, p in P1 (Taylor-Hood; ref simulation.py:128-130)
  BCs    : u = (4 y (H - y), 0) on left (marker 1)  [ref solvers.py:254-258]
           u = 0 on top (3) and bottom (4)          [ref solvers.py:259-264]
           natural (do-nothing) outflow on right -- which also fixes the
           pressure level; the reference's pointwise outlet pin is a no-op
           under legacy dolfin semantics (see solvers/stokes.py docstring).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (divergence_block, make_bc, mass_block,
                            vector_stiffness_block)
from ..fem.space import Function, FunctionSpace
from ..meshing.mesh_data import MARKERS, MeshData
from ..ops.elemspmv import SumOperator
from ..solvers.stokes import stokes_schur_cg

__all__ = ["stokes_solve", "stokes_zero_fields", "taylor_hood_spaces"]


def taylor_hood_spaces(mesh: MeshData) -> Tuple[FunctionSpace, FunctionSpace]:
    V = FunctionSpace(mesh, "P2", vs=2)
    Q = FunctionSpace(mesh, "P1", vs=1)
    return V, Q


def stokes_zero_fields(mesh: MeshData):
    """Zero velocity/pressure for no-adv mode (ref solvers.py:308-315)."""
    V, Q = taylor_hood_spaces(mesh)
    return V.new_function(), Q.new_function()


def stokes_solve(mesh: MeshData, H: float,
                 inner_rtol=5e-13, outer_rtol=1e-11,
                 outer_maxiter=400, precision=None):
    """Solve Stokes flow; returns (u Function on V, p Function on Q)."""
    import jax

    if precision is None:
        precision = ("mixed" if jax.default_backend() == "tpu" else "f64")
    V, Q = taylor_hood_spaces(mesh)
    Ablk = vector_stiffness_block(V)
    A = SumOperator([Ablk], V.ndofs)
    B = divergence_block(Q, V)
    Mp = mass_block(Q)

    # column-wise operator applies for the chunked solver ((n,1) layout)
    import jax.numpy as jnp
    A64_e = Ablk.A_e
    A32_e = Ablk.A_e.astype(jnp.float32)
    dofs = Ablk.entity_dofs
    perm = Ablk.scatter.perm
    ids_sorted = Ablk.scatter.ids_sorted
    ndofs = V.ndofs

    def _apply_cols(Ae, X):
        Xe = X[dofs]                                   # (N, nd, B)
        Ye = jnp.einsum("nij,njb->nib", Ae, Xe,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=X.dtype)
        N, nd, Bc = Ye.shape
        return jax.ops.segment_sum(Ye.reshape(N * nd, Bc)[perm],
                                   ids_sorted, num_segments=ndofs,
                                   indices_are_sorted=True)

    A_apply_col = lambda X: _apply_cols(A64_e, X)
    A_apply32_col = lambda X: _apply_cols(A32_e, X)

    def inflow(x, y):
        # Poiseuille profile (ref solvers.py:254-258)
        return np.stack([4.0 * y * (H - y), np.zeros_like(y)], axis=1)

    bc = make_bc(V, [
        (MARKERS["left"], inflow),
        (MARKERS["bottom"], 0.0),
        (MARKERS["top"], 0.0),
    ])

    # lumped pressure mass inverse as Schur preconditioner
    ones = jnp.ones(Q.ndofs)
    from ..ops.elemspmv import SumOperator as _S
    Mp_op = _S([Mp], Q.ndofs)
    mp_lump = Mp_op.apply(ones)
    mp_inv = 1.0 / jnp.where(mp_lump > 0, mp_lump, 1.0)

    res = stokes_schur_cg(
        A_apply_col, B, bc,
        Mp_inv=lambda r: mp_inv * r,
        A_diag=A.diagonal(),
        A_apply32=A_apply32_col,
        inner_rtol=inner_rtol, outer_rtol=outer_rtol,
        outer_maxiter=outer_maxiter, precision=precision)

    u = Function(V, res.u)
    p = Function(Q, res.p)
    info = {
        "outer_iters": int(res.outer_iters),
        "inner_iters": int(res.inner_iters),
        "resnorm": float(res.resnorm),
        "converged": bool(res.converged),
    }
    u.solver_info = info
    p.solver_info = info
    return u, p
