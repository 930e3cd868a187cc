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
                 outer_maxiter=400):
    """Solve Stokes flow; returns (u Function on V, p Function on Q)."""
    V, Q = taylor_hood_spaces(mesh)
    A = SumOperator([vector_stiffness_block(V)], V.ndofs)
    B = divergence_block(Q, V)
    Mp = mass_block(Q)

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
        A.apply, B, bc,
        Mp_inv=lambda r: mp_inv * r,
        A_diag=A.diagonal(),
        inner_rtol=inner_rtol, outer_rtol=outer_rtol,
        outer_maxiter=outer_maxiter)

    u = Function(V, res.u)
    p = Function(Q, res.p)
    info = {
        "outer_iters": int(res.outer_iters),
        "resnorm": float(res.resnorm),
        "converged": bool(res.converged),
    }
    u.solver_info = info
    p.solver_info = info
    return u, p
