"""Batched (vmapped) parameter sweeps -- the framework's data parallelism.

The reference runs every sweep point as a separate serial FEniCS solve
(SURVEY.md 2.3: e.g. no_advection_analysis_B.py:110-181 -- 138 sequential
solves).  Here a sweep over the Robin coefficient mu shares one mesh/operator
sparsity, so the mu-dependence is factored out:

    A(mu) = K + mu * R      (K = stiffness [+advection], R = unit-Robin)

and the whole sweep is ONE jitted, vmapped batched CG solve: gathers,
batched 6x6 matmuls and segment-sums all carry a leading batch axis that XLA
maps onto the MXU.  The batched while_loop runs until the slowest sweep point
converges.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (advection_block, make_bc, robin_facet_block,
                            stiffness_block)
from ..fem.space import FunctionSpace
from ..meshing.mesh_data import MARKERS, MeshData
from ..ops.elemspmv import SumOperator
from ..solvers.cg import cg, jacobi_preconditioner

__all__ = ["MuSweepSystem", "build_mu_sweep_system", "solve_mu_sweep"]


class MuSweepSystem(NamedTuple):
    """K + mu R with Dirichlet data; closes over device-resident blocks."""

    applyK: "object"
    applyR: "object"
    diagK: jnp.ndarray
    diagR: jnp.ndarray
    free: jnp.ndarray
    bc_values: jnp.ndarray
    ndofs: int


def build_mu_sweep_system(mesh: MeshData, D=1.0, element="P2",
                          u_values=None, u_space=None) -> MuSweepSystem:
    space = FunctionSpace(mesh, element)
    blocks = [stiffness_block(space, D=D)]
    if u_values is not None:
        blocks.append(advection_block(space, u_values, u_space))
    K = SumOperator(blocks, space.ndofs)
    bottom = mesh.bc_marker == MARKERS["bottom"]
    R = SumOperator([robin_facet_block(space, bottom, mu=1.0)], space.ndofs)
    bc = make_bc(space, [(MARKERS["left"], 1.0), (MARKERS["right"], 0.0)])
    return MuSweepSystem(applyK=K.apply, applyR=R.apply,
                         diagK=K.diagonal(), diagR=R.diagonal(),
                         free=bc.free, bc_values=bc.values,
                         ndofs=space.ndofs)


def _solve_single(sys: MuSweepSystem, mu, rtol, maxiter):
    def A(x):
        x0 = jnp.where(sys.free, x, 0.0)
        y = sys.applyK(x0) + mu * sys.applyR(x0)
        return jnp.where(sys.free, y, x)

    g = sys.bc_values
    Ag = sys.applyK(g) + mu * sys.applyR(g)
    rhs = jnp.where(sys.free, -Ag, g)
    diag = sys.diagK + mu * sys.diagR
    M = jacobi_preconditioner(diag, sys.free)
    res = cg(A, rhs, M=M, rtol=rtol, maxiter=maxiter)
    return res.x, res.iters, res.resnorm


_JIT_CACHE = {}


def _sweep_fn(sys: MuSweepSystem, rtol, maxiter):
    """Jitted vmapped solver, cached per (system, tolerances).

    The system's callables close over device arrays, so the jitted function
    takes only the mu batch; one trace per system + batch shape.
    """
    key = (id(sys), rtol, maxiter)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(jax.vmap(
            lambda mu: _solve_single(sys, mu, rtol, maxiter)))
    return _JIT_CACHE[key]


def solve_mu_sweep(sys: MuSweepSystem, mu_values, rtol=1e-13,
                   maxiter=50000):
    """Solve for all mu values in one vmapped CG; returns (B, ndofs) + info."""
    mu_batch = jnp.asarray(np.asarray(mu_values, dtype=np.float64))
    x, iters, resnorm = _sweep_fn(sys, rtol, maxiter)(mu_batch)
    return x, {"iters": np.asarray(iters), "resnorm": np.asarray(resnorm)}
