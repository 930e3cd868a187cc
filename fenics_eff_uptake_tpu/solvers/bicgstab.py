"""Matrix-free preconditioned BiCGStab for nonsymmetric systems.

Used for the advection-diffusion operator (ref solvers.py:16-107 solved
there by direct LU).  At the study's Peclet range (Pe <= 10, cell Peclet
<< 1 on the default mesh) the operator is mildly nonsymmetric and BiCGStab
with Jacobi preconditioning converges quickly.  Jittable lax.while_loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["bicgstab", "BiCGStabResult"]


class BiCGStabResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def bicgstab(A: Callable, b, x0=None, M: Optional[Callable] = None,
             rtol=1e-13, atol=0.0, maxiter=20000) -> BiCGStabResult:
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - A(x0)
    rhat = r0

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        return (jnp.linalg.norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * \
               (alpha / jnp.where(omega != 0, omega, 1.0))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A(phat)
        denom = jnp.vdot(rhat, v)
        alpha = rho_new / jnp.where(denom != 0, denom, 1.0)
        s = r - alpha * v
        shat = M(s)
        t = A(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt != 0, tt, 1.0)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    zeros = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype=b.dtype)
    x, r, p, v, rho, alpha, omega, k = jax.lax.while_loop(
        cond, body, (x0, r0, zeros, zeros, one, one, one, jnp.array(0)))
    rn = jnp.linalg.norm(r)
    return BiCGStabResult(x=x, iters=k, resnorm=rn, converged=rn <= tol)
