"""Domain/field integral helpers (device-side quadrature reductions).

These replace scattered ``assemble(expr*dx)`` calls in the reference
(analysis.py:677-719 etc.) and provide error norms for the test pyramid the
reference lacks (SURVEY.md section 4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.assembly import cell_geometry
from ..fem.elements import tabulate
from ..fem.quadrature import triangle_rule
from ..fem.space import Function, FunctionSpace

__all__ = ["integrate_scalar", "l2_error", "integrate_cells"]


def _cell_quad(space: FunctionSpace, degree):
    mesh = space.mesh
    qp, qw = triangle_rule(degree)
    phi = tabulate(space.element, qp)                       # (Q,nd)
    lam = np.concatenate([1 - qp.sum(1, keepdims=True), qp], axis=1)
    xq = np.einsum("qv,tva->tqa", lam, mesh.vertices[mesh.cells])
    return qp, qw, phi, xq


def integrate_cells(fn: Function, degree=4, cell_mask=None):
    """Per-cell integral of the (scalar) function; returns (T,) array."""
    space = fn.space
    mesh = space.mesh
    qp, qw, phi, xq = _cell_quad(space, degree)
    detJ, _ = cell_geometry(jnp.asarray(mesh.vertices),
                            jnp.asarray(mesh.cells))
    ce = fn.values[jnp.asarray(space.cell_dofs)]            # (T,nd)
    cq = jnp.einsum("qi,ti->tq", jnp.asarray(phi), ce)      # (T,Q)
    per_cell = jnp.einsum("q,tq,t->t", jnp.asarray(qw), cq, detJ)
    if cell_mask is not None:
        per_cell = jnp.where(jnp.asarray(cell_mask), per_cell, 0.0)
    return per_cell


def integrate_scalar(fn: Function, degree=4, cell_mask=None):
    """int fn dx over the (optionally masked) domain."""
    return float(integrate_cells(fn, degree, cell_mask).sum())


def l2_error(space: FunctionSpace, values, exact, degree=6):
    """||u_h - u_exact||_L2 by high-order quadrature."""
    mesh = space.mesh
    qp, qw, phi, xq = _cell_quad(space, degree)
    detJ, _ = cell_geometry(jnp.asarray(mesh.vertices),
                            jnp.asarray(mesh.cells))
    ce = values[jnp.asarray(space.cell_dofs)]
    uh = jnp.einsum("qi,ti->tq", jnp.asarray(phi), ce)
    ue = jnp.asarray(np.asarray(exact(xq[..., 0], xq[..., 1]),
                                dtype=np.float64))
    err2 = jnp.einsum("q,tq,t->", jnp.asarray(qw), (uh - ue) ** 2, detJ)
    return float(jnp.sqrt(err2))
