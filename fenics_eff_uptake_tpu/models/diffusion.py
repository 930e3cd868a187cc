"""Steady pure-diffusion concentration solves with Robin uptake.

TPU-native equivalent of ``pure_diffusion_solver`` /
``pure_diffusion_solver_variable_mu`` (ref solvers.py:113-231):

  weak form:  D grad(c).grad(phi) dx [+ (u.grad c) phi dx] + mu(x) c phi ds_4
  BCs:        c=1 on left (marker 1), c=0 on right (marker 2) (Dirichlet),
              Robin on the whole bottom (marker 4).

The operator is SPD for u=0, solved with Jacobi-CG; post-solve the
reference's tiny-negative clamp (|min|<1e-12 -> 0) is applied
(ref solvers.py:154-173, 216-228).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (advection_block, constrained_operator,
                            constrained_rhs, make_bc, robin_facet_block,
                            stiffness_block)
from ..fem.space import Function, FunctionSpace
from ..meshing.mesh_data import MARKERS, MeshData
from ..ops.elemspmv import SumOperator
from ..solvers.cg import cg, jacobi_preconditioner

__all__ = ["build_diffusion_system", "pure_diffusion_solve"]


class LinearSystem(NamedTuple):
    op: SumOperator
    bc: "object"
    apply: Callable
    rhs: jnp.ndarray
    precond: Callable
    space: FunctionSpace


def build_diffusion_system(space: FunctionSpace, D, mu,
                           u_values=None, u_space=None) -> LinearSystem:
    """Assemble the (adv-)diffusion + Robin operator with Dirichlet BCs."""
    mesh = space.mesh
    blocks = [stiffness_block(space, D=D)]
    if u_values is not None:
        blocks.append(advection_block(space, u_values, u_space))
    bottom = mesh.bc_marker == MARKERS["bottom"]
    if bottom.any():
        blocks.append(robin_facet_block(space, bottom, mu))
    op = SumOperator(blocks, space.ndofs)
    bc = make_bc(space, [(MARKERS["left"], 1.0), (MARKERS["right"], 0.0)])
    apply = constrained_operator(op, bc)
    rhs = constrained_rhs(op, bc)
    diag = op.diagonal()
    precond = jacobi_preconditioner(diag, bc.free)
    return LinearSystem(op=op, bc=bc, apply=apply, rhs=rhs,
                        precond=precond, space=space)


def _clamp_tiny_negative(values):
    """Clamp tiny negative entries to 0 (ref solvers.py:154-173)."""
    mn = jnp.min(values)
    return jnp.where((mn < 0) & (jnp.abs(mn) < 1e-12),
                     jnp.maximum(values, 0.0), values)


def pure_diffusion_solve(mesh: MeshData, D=1.0, mu=1.0, element="P2",
                         rtol=1e-13, maxiter=50000) -> Function:
    """End-to-end pure-diffusion solve; returns the concentration Function.

    ``mu`` may be a scalar or a vectorised mu(x) callable (variable-mu path,
    ref solvers.py:176-231 -- callables are clamped to >= 0 at quadrature
    points inside robin_facet_block).
    """
    space = FunctionSpace(mesh, element)
    sys = build_diffusion_system(space, D, mu)
    res = cg(sys.apply, sys.rhs, M=sys.precond, rtol=rtol, maxiter=maxiter)
    vals = _clamp_tiny_negative(res.x)
    fn = Function(space, vals)
    fn.solver_info = {
        "iters": int(res.iters),
        "resnorm": float(res.resnorm),
        "converged": bool(res.converged),
    }
    return fn
