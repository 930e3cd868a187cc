"""Stokes saddle-point solver: pressure-Schur (Uzawa) CG, matrix-free.

Replaces the sparse direct LU behind the reference's mixed Taylor-Hood solve
(ref solvers.py:291-298).  The saddle system

    [A  B^T] [u]   [f]
    [B   0 ] [p] = [0],   A = vector Laplacian (with velocity Dirichlet BCs),
                          B = -div coupling

is reduced to the SPD pressure Schur complement S = B A^{-1} B^T:

    S p = B u0,   u0 = A^{-1} f   (BCs folded into A-solves)

solved by outer CG preconditioned with the lumped pressure mass matrix
(spectrally equivalent to S for Stokes), inner Jacobi-CG for each A-solve.
Fully jittable: nested lax.while_loops, fixed shapes.

Pressure level: with the do-nothing outlet (right boundary traction-free)
the pressure is determined by the weak form itself; the reference's
"pointwise" outlet pin (solvers.py:272-283) matches no dof under legacy
dolfin pointwise semantics (inside() is called with on_boundary=False), so
no explicit pin is applied here either.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .cg import cg, jacobi_preconditioner

__all__ = ["stokes_schur_cg", "StokesResult"]


class StokesResult(NamedTuple):
    u: jnp.ndarray
    p: jnp.ndarray
    outer_iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def stokes_schur_cg(A_apply: Callable, B, bc, f=None,
                    Mp_inv: Callable = None, A_diag=None,
                    inner_rtol=5e-13, inner_maxiter=20000,
                    outer_rtol=1e-11, outer_maxiter=300):
    """Solve the constrained Stokes saddle system.

    A_apply: unconstrained velocity-block operator (SumOperator.apply)
    B:       RectBlock (pressure rows x velocity cols)
    bc:      BCData on the velocity space (inlet + no-slip)
    f:       velocity rhs (defaults to 0)
    Mp_inv:  pressure preconditioner (lumped mass inverse)
    """
    nu = bc.values.shape[0]
    np_ = B.row_scatter.ndofs
    if f is None:
        f = jnp.zeros(nu, dtype=bc.values.dtype)
    if Mp_inv is None:
        Mp_inv = lambda r: r
    pre_u = (jacobi_preconditioner(A_diag, bc.free)
             if A_diag is not None else None)

    def A_bc(x):
        x0 = jnp.where(bc.free, x, 0.0)
        y = A_apply(x0)
        return jnp.where(bc.free, y, x)

    def solve_A(rhs_free, x0):
        """A^{-1} with Dirichlet dofs pinned to rhs_free's bc entries."""
        res = cg(A_bc, rhs_free, x0=x0, M=pre_u,
                 rtol=inner_rtol, maxiter=inner_maxiter)
        return res.x

    # u0 = A^{-1} f with bc values g
    g = bc.values
    rhs0 = jnp.where(bc.free, f - A_apply(g), g)
    u0 = solve_A(rhs0, g)

    # Schur operator: S q = B A_ff^{-1} (B^T q)_free
    def S(q, w_prev):
        rhs = jnp.where(bc.free, B.apply_t(q), 0.0)
        w = solve_A(rhs, w_prev)
        return B.apply(w), w

    b_p = B.apply(u0)
    bnorm = jnp.linalg.norm(b_p)
    tol = outer_rtol * bnorm

    p0 = jnp.zeros(np_, dtype=f.dtype)
    r0 = b_p
    z0 = Mp_inv(r0)
    d0 = z0
    rz0 = jnp.vdot(r0, z0)
    w0 = jnp.zeros(nu, dtype=f.dtype)

    def cond(state):
        p, r, z, d, rz, w, k = state
        return (jnp.linalg.norm(r) > tol) & (k < outer_maxiter)

    def body(state):
        p, r, z, d, rz, w, k = state
        Sd, w = S(d, w)
        dSd = jnp.vdot(d, Sd)
        alpha = rz / jnp.where(dSd != 0, dSd, 1.0)
        p = p + alpha * d
        r = r - alpha * Sd
        z = Mp_inv(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        d = z + beta * d
        return (p, r, z, d, rz_new, w, k + 1)

    p, r, z, d, rz, w, k = jax.lax.while_loop(
        cond, body, (p0, r0, z0, d0, rz0, w0, jnp.array(0)))

    # final velocity: u = A^{-1}(f - B^T p) with bc values
    rhs_u = jnp.where(bc.free, f - A_apply(g) - B.apply_t(p), g)
    u = solve_A(rhs_u, u0)
    rn = jnp.linalg.norm(r)
    return StokesResult(u=u, p=p, outer_iters=k, resnorm=rn,
                        converged=rn <= tol)
