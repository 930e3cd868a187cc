"""Batched (vmapped) parameter sweeps -- the framework's data parallelism.

The reference runs every sweep point as a separate serial FEniCS solve
(SURVEY.md 2.3: e.g. no_advection_analysis_B.py:110-181 -- 138 sequential
solves).  Here a sweep shares one mesh/operator sparsity and the
coefficient dependence is factored out:

    A(D, mu) = D * K + Adv + R(mu)

K = unit stiffness, Adv = advection (fixed velocity field; note the
nondimensional Stokes field is Pe-independent, so ONE velocity solve feeds
every Pe point), R(mu) = mu * R_unit for scalar mu or per-sample facet
matrices for step-mu(x).  The whole sweep is ONE jitted vmapped batched
Krylov solve; gathers, batched small matmuls and segment-sums carry a batch
axis that amortises the irregular memory traffic (measured on TPU v5e:
0.19 ms/iter/sample at batch 32 vs 7.4 ms single -- the batch axis is the
TPU-native answer to unstructured sparsity).

Precision: 'f64' (CPU/testing), 'f32', or 'mixed' = f32 inner Krylov with
f64 iterative refinement (solvers/mixed.py) -- the default on TPU, where
f64 is emulated.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (advection_block, make_bc, robin_facet_block,
                            stiffness_block)
from ..fem.space import FunctionSpace
from ..meshing.mesh_data import MARKERS, MeshData
from ..ops.elemspmv import ElementBlock, SumOperator
from ..solvers.bicgstab import bicgstab
from ..solvers.cg import cg
from ..solvers.mixed import refined_solve

__all__ = ["TransportSystem", "build_transport_system", "solve_sweep",
           "robin_matrices_for_mu", "default_precision",
           # legacy aliases used by tests / graft entry
    "build_mu_sweep_system", "solve_mu_sweep", "_solve_single",
           "MuSweepSystem"]


def default_precision():
    return "mixed" if jax.default_backend() == "tpu" else "f64"


class _Block(NamedTuple):
    A64: jnp.ndarray
    A32: jnp.ndarray
    dofs: jnp.ndarray
    perm: jnp.ndarray
    ids_sorted: jnp.ndarray
    ndofs: int

    def apply(self, x, f32=False, A_override=None):
        A = A_override if A_override is not None else (
            self.A32 if f32 else self.A64)
        xe = x[self.dofs]
        ye = jnp.einsum("nij,nj->ni", A, xe)
        return jax.ops.segment_sum(
            ye.reshape(-1)[self.perm], self.ids_sorted,
            num_segments=self.ndofs, indices_are_sorted=True)

    def diagonal(self, A_override=None):
        A = A_override if A_override is not None else self.A64
        de = jnp.diagonal(A, axis1=1, axis2=2)
        return jax.ops.segment_sum(
            de.reshape(-1)[self.perm], self.ids_sorted,
            num_segments=self.ndofs, indices_are_sorted=True)


def _from_element_block(b: ElementBlock) -> _Block:
    return _Block(A64=b.A_e, A32=b.A_e.astype(jnp.float32),
                  dofs=b.entity_dofs, perm=b.scatter.perm,
                  ids_sorted=b.scatter.ids_sorted,
                  ndofs=b.scatter.ndofs)


class TransportSystem(NamedTuple):
    K: _Block
    Adv: Optional[_Block]
    R: Optional[_Block]          # unit-mu Robin
    free: jnp.ndarray
    bc_values: jnp.ndarray
    ndofs: int
    space: "object"


def build_transport_system(mesh: MeshData, element="P2",
                           u_values=None, u_space=None,
                           robin_degree=None) -> TransportSystem:
    space = FunctionSpace(mesh, element)
    K = _from_element_block(stiffness_block(space, D=1.0))
    Adv = None
    if u_values is not None:
        Adv = _from_element_block(advection_block(space, u_values, u_space))
    bottom = mesh.bc_marker == MARKERS["bottom"]
    R = None
    if bottom.any():
        kw = {} if robin_degree is None else {"degree": robin_degree}
        R = _from_element_block(robin_facet_block(space, bottom, mu=1.0,
                                                  **kw))
    bc = make_bc(space, [(MARKERS["left"], 1.0), (MARKERS["right"], 0.0)])
    return TransportSystem(K=K, Adv=Adv, R=R, free=bc.free,
                           bc_values=bc.values, ndofs=space.ndofs,
                           space=space)


def robin_matrices_for_mu(sys: TransportSystem, mu, degree=None):
    """Per-facet Robin matrices for a spatially-varying mu(x) callable."""
    mesh = sys.space.mesh
    bottom = mesh.bc_marker == MARKERS["bottom"]
    kw = {} if degree is None else {"degree": degree}
    return robin_facet_block(sys.space, bottom, mu=mu, **kw).A_e


def _solve_one_factory(sys: TransportSystem, rtol, maxiter, precision):
    """Builds solve_one(D, mu, R_e) -> (x, iters, resnorm).

    R_e: per-sample Robin element matrices (f64) or None -> mu * R_unit.
    """
    free64 = sys.free
    g64 = sys.bc_values
    g32 = g64.astype(jnp.float32)
    nonsym = sys.Adv is not None

    def A_raw(D, mu, R_e, x, f32):
        # coefficients follow the vector dtype so the f32 path stays f32
        Dc = jnp.asarray(D).astype(x.dtype)
        y = Dc * sys.K.apply(x, f32)
        if sys.Adv is not None:
            y = y + sys.Adv.apply(x, f32)
        if sys.R is not None:
            if R_e is None:
                muc = jnp.asarray(mu).astype(x.dtype)
                y = y + muc * sys.R.apply(x, f32)
            else:
                y = y + sys.R.apply(
                    x, f32, A_override=R_e.astype(x.dtype))
        return y

    def make_A(D, mu, R_e, f32):
        def A(x):
            y = A_raw(D, mu, R_e, jnp.where(free64, x, 0.0), f32)
            return jnp.where(free64, y, x)
        return A

    def diag(D, mu, R_e):
        d = D * sys.K.diagonal()
        if sys.Adv is not None:
            d = d + sys.Adv.diagonal()
        if sys.R is not None:
            d = d + (mu * sys.R.diagonal() if R_e is None
                     else sys.R.diagonal(A_override=R_e))
        return d

    def solve_one(D, mu, R_e):
        rhs64 = jnp.where(free64, -A_raw(D, mu, R_e, g64, False), g64)
        d = diag(D, mu, R_e)
        dinv = jnp.where(free64 & (d != 0),
                         1.0 / jnp.where(d != 0, d, 1.0), 1.0)
        if precision == "f64":
            M = lambda r: dinv * r
            A = make_A(D, mu, R_e, False)
            krylov = bicgstab if nonsym else cg
            res = krylov(A, rhs64, M=M, rtol=rtol, maxiter=maxiter)
            return res.x, res.iters, res.resnorm
        if precision == "f32":
            dinv32 = dinv.astype(jnp.float32)
            A = make_A(D.astype(jnp.float32) if hasattr(D, "astype") else D,
                       mu, R_e, True)
            krylov = bicgstab if nonsym else cg
            res = krylov(A, rhs64.astype(jnp.float32),
                         M=lambda r: dinv32 * r,
                         rtol=max(rtol, 1e-6), maxiter=maxiter)
            return (res.x.astype(jnp.float64), res.iters, res.resnorm)
        # mixed: f32 inner + f64 refinement
        dinv32 = dinv.astype(jnp.float32)
        A64 = make_A(D, mu, R_e, False)
        A32 = make_A(jnp.asarray(D, dtype=jnp.float32), mu, R_e, True)
        res = refined_solve(A64, A32, rhs64, M32=lambda r: dinv32 * r,
                            rtol=rtol, inner_rtol=1e-4,
                            inner_maxiter=maxiter,
                            nonsymmetric=nonsym)
        return res.x, res.inner_iters, res.resnorm

    return solve_one


_JIT_CACHE: Dict = {}


def solve_sweep(sys: TransportSystem, D_values, mu_values=None,
                robin_matrices=None, rtol=1e-12, maxiter=50000,
                precision=None):
    """Batched transport solve over sweep points.

    D_values: (B,); mu_values: (B,) scalars (ignored if robin_matrices
    given); robin_matrices: (B, F, nd, nd) per-sample Robin assemblies.
    Returns (X (B, ndofs) f64, info dict).
    """
    if precision is None:
        precision = default_precision()
    D_batch = jnp.asarray(np.asarray(D_values, dtype=np.float64))
    B = D_batch.shape[0]
    if mu_values is None:
        mu_values = np.zeros(B)
    mu_batch = jnp.asarray(np.asarray(mu_values, dtype=np.float64))

    key = (id(sys), rtol, maxiter, precision, robin_matrices is not None)
    if key not in _JIT_CACHE:
        solve_one = _solve_one_factory(sys, rtol, maxiter, precision)
        if robin_matrices is not None:
            f = jax.jit(jax.vmap(lambda D, mu, R: solve_one(D, mu, R)))
        else:
            f = jax.jit(jax.vmap(lambda D, mu: solve_one(D, mu, None)))
        _JIT_CACHE[key] = f
    fn = _JIT_CACHE[key]
    if robin_matrices is not None:
        x, iters, resnorm = fn(D_batch, mu_batch,
                               jnp.asarray(robin_matrices))
    else:
        x, iters, resnorm = fn(D_batch, mu_batch)
    return x, {"iters": np.asarray(iters), "resnorm": np.asarray(resnorm)}


# ---------------------------------------------------------------------------
# legacy simple-mu API (pure diffusion, D fixed) kept for tests/entry points
# ---------------------------------------------------------------------------

MuSweepSystem = TransportSystem


_MU_D: Dict[int, float] = {}


def build_mu_sweep_system(mesh: MeshData, D=1.0, element="P2",
                          u_values=None, u_space=None) -> TransportSystem:
    sys = build_transport_system(mesh, element=element, u_values=u_values,
                                 u_space=u_space, robin_degree=4)
    # record the fixed D for solve_mu_sweep (sweep varies mu only)
    _MU_D[id(sys)] = float(D)
    return sys


def solve_mu_sweep(sys: TransportSystem, mu_values, rtol=1e-13,
                   maxiter=50000, precision=None):
    D = _MU_D.get(id(sys), 1.0)
    B = len(mu_values)
    return solve_sweep(sys, [D] * B, mu_values=mu_values, rtol=rtol,
                       maxiter=maxiter, precision=precision)


def _solve_single(sys: TransportSystem, mu, rtol, maxiter):
    """Single-mu solve (used by __graft_entry__)."""
    solve_one = _solve_one_factory(sys, rtol, maxiter, "f64")
    D = _MU_D.get(id(sys), 1.0)
    return solve_one(jnp.asarray(D, dtype=jnp.float64), mu, None)
