"""Advection-diffusion concentration solves with Robin uptake.

TPU-native equivalent of ``advdiff_solver`` / ``advdiff_solver_variable_mu``
(ref solvers.py:16-107):

  weak form: D grad(c).grad(phi) dx + (u.grad c) phi dx + mu(x) c phi ds_4
  BCs:       c=1 left (marker 1), c=0 right (marker 2); plain Galerkin, no
             stabilisation (fine at Pe<=10 with CG2; cell Peclet << 1).

Nonsymmetric system -> Jacobi-BiCGStab.  Post-solve: clamp non-finite to 0
and tiny negatives (|min| < 1e-12) to 0 (ref solvers.py:86-103).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.space import Function, FunctionSpace
from ..meshing.mesh_data import MeshData
from ..solvers.bicgstab import bicgstab
from ..solvers.cg import jacobi_preconditioner
from .diffusion import build_diffusion_system, _clamp_tiny_negative

__all__ = ["advdiff_solve"]


def advdiff_solve(mesh: MeshData, u: Function, D, mu, element="P2",
                  rtol=1e-13, maxiter=50000) -> Function:
    """Solve steady advection-diffusion; ``u`` is the velocity Function."""
    space = FunctionSpace(mesh, element)
    sys = build_diffusion_system(space, D, mu,
                                 u_values=u.values, u_space=u.space)
    res = bicgstab(sys.apply, sys.rhs, M=sys.precond,
                   rtol=rtol, maxiter=maxiter)
    vals = res.x
    vals = jnp.where(jnp.isfinite(vals), vals, 0.0)
    vals = _clamp_tiny_negative(vals)
    fn = Function(space, vals)
    fn.solver_info = {
        "iters": int(res.iters),
        "resnorm": float(res.resnorm),
        "converged": bool(res.converged),
    }
    return fn
