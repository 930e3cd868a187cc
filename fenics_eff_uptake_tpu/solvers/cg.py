"""Matrix-free preconditioned conjugate gradients.

Replaces the sparse direct LU behind ``solve(a == L)`` for the SPD
diffusion+Robin systems (ref solvers.py:55,151,213).  Entirely jittable:
fixed-shape ``lax.while_loop``, no host sync inside the loop, so batched
(vmapped) sweeps run as one XLA program.

Convergence: relative residual ||r|| <= max(rtol*||b||, atol), default
rtol tight enough (1e-13) that the Krylov error is negligible against the
reference's direct solves.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["cg", "CGResult", "jacobi_preconditioner"]


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def jacobi_preconditioner(diag, free=None):
    """M^{-1} = 1/diag; identity on constrained dofs."""
    d = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
    if free is not None:
        d = jnp.where(free, d, 1.0)
    inv = 1.0 / d

    def apply(r):
        return inv * r

    return apply


def cg(A: Callable, b, x0=None, M: Optional[Callable] = None,
       rtol=1e-13, atol=0.0, maxiter=20000) -> CGResult:
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)

    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - A(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.linalg.norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.array(0)))
    rn = jnp.linalg.norm(r)
    return CGResult(x=x, iters=k, resnorm=rn, converged=rn <= tol)
