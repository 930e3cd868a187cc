"""Production sharded sweep solve: DP over "sweep" x TP over "cells".

Round-1's ShardedMuSweep (parallel/sharding.py) proved the sharding
pattern but used an unpreconditioned, unchunked Jacobi-CG -- demo-grade.
This module runs the REAL solver stack -- batch-minor chunked CG with the
multigrid V-cycle preconditioner and mixed f32/f64 refinement -- under a
jax.sharding.Mesh:

  "sweep" (DP): the (n, B) Krylov state is sharded on the B axis; every
      vector op and reduction is column-local -- zero collectives.
  "cells" (TP): each device owns an element-chunk of the operator with
      its own gather/scatter plan; an operator apply is
      local-scatter -> psum("cells") -- the one collective, riding ICI.

The preconditioner's coarse levels are tiny and replicated across the
"cells" groups (identical redundant compute beats communicating), while
its fine-level smoothing operator is cells-sharded like A.

Chunking, per-column freezing, and f64 refinement reuse the exact
host-loop protocol of solvers/batched.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

__all__ = ["build_sharded_system", "sharded_solve_sweep",
           "ShardedSystem"]


class _ShardBlockArgs(NamedTuple):
    """Element block split into per-"cells"-shard chunks.

    Arrays carry a leading shard axis (tp, ...); each shard has its own
    scatter plan into the FULL dof vector (summed via psum).
    """
    A: jnp.ndarray            # (tp, N_loc, nd, nd)
    dofs: jnp.ndarray         # (tp, N_loc, nd)
    perm: jnp.ndarray         # (tp, N_loc*nd)
    ids_sorted: jnp.ndarray   # (tp, N_loc*nd)


def _split_block(block, tp: int, ndofs: int, dummy_dof: int):
    """Split a _Block's entities into tp chunks with local scatter plans."""
    A = np.asarray(block.A64)
    dofs = np.asarray(block.dofs)
    N, nd, _ = A.shape
    N_loc = (N + tp - 1) // tp
    N_pad = N_loc * tp
    if N_pad > N:
        A = np.concatenate(
            [A, np.zeros((N_pad - N, nd, nd), A.dtype)], axis=0)
        dofs = np.concatenate(
            [dofs, np.full((N_pad - N, nd), dummy_dof, dofs.dtype)],
            axis=0)
    As, Ds, Ps, Is = [], [], [], []
    for t in range(tp):
        sl = slice(t * N_loc, (t + 1) * N_loc)
        d = dofs[sl]
        ids = d.ravel()
        perm = np.argsort(ids, kind="stable")
        As.append(A[sl])
        Ds.append(d)
        Ps.append(perm)
        Is.append(ids[perm])
    return _ShardBlockArgs(
        A=jnp.asarray(np.stack(As)),
        dofs=jnp.asarray(np.stack(Ds), dtype=jnp.int32),
        perm=jnp.asarray(np.stack(Ps), dtype=jnp.int32),
        ids_sorted=jnp.asarray(np.stack(Is), dtype=jnp.int32))


def _local_apply(ba, ndofs, X, coef=None):
    """One shard's entity chunk applied into the full dof vector.

    ba arrays arrive WITHOUT the shard axis (shard_map strips it).
    """
    A = ba.A[0]
    dofs = ba.dofs[0]
    perm = ba.perm[0]
    ids = ba.ids_sorted[0]
    Xe = X[dofs]                                   # (N_loc, nd, B)
    Ac = A.astype(X.dtype)
    nd = Xe.shape[1]
    Ye = jnp.stack(
        [sum(Ac[:, i, j, None] * Xe[:, j, :] for j in range(nd))
         for i in range(nd)], axis=1)
    if coef is not None:
        Ye = Ye * coef.astype(X.dtype)[None, None, :]
    N, _, B = Ye.shape
    return jax.ops.segment_sum(
        Ye.reshape(N * nd, B)[perm], ids,
        num_segments=ndofs, indices_are_sorted=True)


class ShardedSystem(NamedTuple):
    sys: "object"                 # fine TransportSystem
    mesh_dev: Mesh
    K: _ShardBlockArgs
    Adv: Optional[_ShardBlockArgs]
    R: Optional[_ShardBlockArgs]
    ml: "object"                  # MultilevelData or None
    ml_K: Optional[_ShardBlockArgs]   # fine-level smoother operator


def build_sharded_system(sys, device_mesh: Mesh, multilevel=None):
    """Partition a TransportSystem (and optional MG data) over the mesh."""
    tp = device_mesh.shape["cells"]
    dummy = sys.ndofs - 1   # scatter target for padding (masked anyway
    # by the bucketing dummy dof when pad_shapes was on; otherwise the
    # padded entities carry zero matrices so any target is harmless)
    K = _split_block(sys.K, tp, sys.ndofs, dummy)
    Adv = (_split_block(sys.Adv, tp, sys.ndofs, dummy)
           if sys.Adv is not None else None)
    R = (_split_block(sys.R, tp, sys.ndofs, dummy)
         if sys.R is not None else None)
    return ShardedSystem(sys=sys, mesh_dev=device_mesh, K=K, Adv=Adv,
                         R=R, ml=multilevel,
                         ml_K=K if multilevel is not None else None)


def _sharded_ops(ss: ShardedSystem, f32: bool):
    """Shared machinery of the sharded Krylov chunks: the cells-psum
    operator apply, the (optionally multigrid) preconditioner builder,
    and the shard_map partition specs.  Used by both the CG (SPD
    transport) and BiCGStab (nonsymmetric adv-diff) chunk programs."""
    sys = ss.sys
    ndofs = sys.ndofs
    free = sys.free
    dt = jnp.float32 if f32 else jnp.float64
    ml = ss.ml

    blk_spec = _ShardBlockArgs(A=P("cells"), dofs=P("cells"),
                               perm=P("cells"), ids_sorted=P("cells"))
    col = P(None, "sweep")     # (n, B) arrays
    vec = P("sweep")           # (B,) arrays

    def A_apply(Kb, Advb, Rb, D_vec, mu_vec, X):
        Y = _local_apply(Kb, ndofs, X, coef=D_vec)
        if Advb is not None:
            Y = Y + _local_apply(Advb, ndofs, X)
        if Rb is not None:
            Y = Y + _local_apply(Rb, ndofs, X, coef=mu_vec)
        Y = jax.lax.psum(Y, "cells")
        return Y

    def A_bc(Kb, Advb, Rb, D_vec, mu_vec, X):
        Y = A_apply(Kb, Advb, Rb, D_vec, mu_vec,
                    jnp.where(free[:, None], X, 0.0))
        return jnp.where(free[:, None], Y, X)

    if ml is not None:
        from ..solvers.multilevel import (_ml_program, _ml_struct_key,
                                          ml_preconditioner_args)
        # mid/coarse levels replicated; fine level operator inside the
        # V-cycle reuses the cells-sharded apply
        # band=False: the fine level is cells-partitioned here; a
        # replicated banded operator would cost full-system HBM/device
        m_args_global = ml_preconditioner_args(ml, f32=f32, band=False)

        def M_apply(Kb, Advb, Rb, m_args, R):
            levels, free_c, Ainv, D_vec, mu_vec, omega = m_args
            la = levels[0]
            Rw = R.astype(dt)
            # fine pre-smooth
            x = omega * la.dinv * Rw
            Ax = A_bc(Kb, Advb, Rb, D_vec, mu_vec, x)
            res = Rw - Ax
            # restrict, then run the REPLICATED sub-cycle on mid levels
            n, _, B = (la.t_w[:, :, None] * res[:, None, :]).shape
            flat = (la.t_w[:, :, None] * res[:, None, :]).reshape(
                n * 3, B)[la.t_perm]
            rc = jax.ops.segment_sum(
                flat, la.t_ids, num_segments=levels[1].free.shape[0]
                if len(levels) > 1 else free_c.shape[0],
                indices_are_sorted=True)
            if len(levels) > 1:
                rc = jnp.where(levels[1].free[:, None], rc, 0.0)
                xc = _sub_vcycle(levels, 1, rc, free_c, Ainv,
                                 D_vec, mu_vec, omega)
            else:
                rc = jnp.where(free_c[:, None], rc, 0.0)
                xc_b = jnp.matmul(Ainv,
                                  jnp.moveaxis(rc, 1, 0)[..., None],
                                  preferred_element_type=jnp.float32)
                xc = jnp.moveaxis(xc_b[..., 0], 0, 1)
            x = x + jnp.einsum("nk,nkb->nb", la.t_w, xc[la.t_cols],
                               preferred_element_type=xc.dtype)
            Ax = A_bc(Kb, Advb, Rb, D_vec, mu_vec, x)
            x = x + omega * la.dinv * (Rw - Ax)
            return x.astype(R.dtype)

        def _sub_vcycle(levels, l, r, free_c, Ainv, D_vec, mu_vec, omega):
            from ..parallel.sweep import _args_block_apply
            la = levels[l]
            nd_l = la.free.shape[0]

            def A_l(X):
                Y = _args_block_apply(la.K, nd_l, X,
                                      coef=D_vec.astype(X.dtype))
                if la.Adv is not None:
                    Y = Y + _args_block_apply(la.Adv, nd_l, X)
                if la.R is not None:
                    Y = Y + _args_block_apply(
                        la.R, nd_l, X, coef=mu_vec.astype(X.dtype))
                return jnp.where(la.free[:, None], Y, X)

            x = omega * la.dinv * r
            res = r - A_l(jnp.where(la.free[:, None], x, 0.0))
            n = la.t_w.shape[0]
            B = r.shape[1]
            flat = (la.t_w[:, :, None] * res[:, None, :]).reshape(
                n * 3, B)[la.t_perm]
            n_next = (levels[l + 1].free.shape[0]
                      if l + 1 < len(levels) else free_c.shape[0])
            rc = jax.ops.segment_sum(flat, la.t_ids,
                                     num_segments=n_next,
                                     indices_are_sorted=True)
            if l + 1 < len(levels):
                rc = jnp.where(levels[l + 1].free[:, None], rc, 0.0)
                xc = _sub_vcycle(levels, l + 1, rc, free_c, Ainv,
                                 D_vec, mu_vec, omega)
            else:
                rc = jnp.where(free_c[:, None], rc, 0.0)
                xc_b = jnp.matmul(Ainv,
                                  jnp.moveaxis(rc, 1, 0)[..., None],
                                  preferred_element_type=jnp.float32)
                xc = jnp.moveaxis(xc_b[..., 0], 0, 1)
            x = x + jnp.einsum("nk,nkb->nb", la.t_w, xc[la.t_cols],
                               preferred_element_type=xc.dtype)
            x = x + omega * la.dinv * (
                r - A_l(jnp.where(la.free[:, None], x, 0.0)))
            return x

        # spec for the ml args pytree: everything replicated except the
        # (B,)/( n,B)/(B,nc,nc) arrays which shard over "sweep"
        def _ml_spec(m_args):
            levels, free_c, Ainv, D_vec, mu_vec, omega = m_args
            def _blk_spec(b):
                return type(b)(P(), P(), P(), P(),
                               None if b.band is None else P())

            lev_specs = tuple(
                type(la)(K=_blk_spec(la.K),
                         Adv=None if la.Adv is None
                         else _blk_spec(la.Adv),
                         R=None if la.R is None
                         else _blk_spec(la.R),
                         R_batch=None if la.R_batch is None else P("sweep"),
                         free=P(), dinv=P(None, "sweep"),
                         t_cols=P(), t_w=P(), t_perm=P(), t_ids=P())
                for la in levels)
            return (lev_specs, P(), P("sweep"), P("sweep"), P("sweep"),
                    P())
        m_spec = _ml_spec(m_args_global)
    else:
        M_apply = None
        m_args_global = None
        m_spec = None

    def make_Mfn(Kb, Advb, Rb, m_args, dinv):
        def Mfn(R):
            if ml is not None:
                return M_apply(Kb, Advb, Rb, m_args, R)
            return dinv * R
        return Mfn

    return dict(A_bc=A_bc, make_Mfn=make_Mfn, blk_spec=blk_spec,
                col=col, vec=vec, m_spec=m_spec,
                m_args_global=m_args_global)


def _cg_chunk_sharded(ss: ShardedSystem, n_iters: int, f32: bool):
    """Jitted shard_map CG chunk over (sweep, cells)."""
    ops = _sharded_ops(ss, f32)
    A_bc, make_Mfn = ops["A_bc"], ops["make_Mfn"]
    blk_spec, col, vec, m_spec = (ops["blk_spec"], ops["col"],
                                  ops["vec"], ops["m_spec"])
    m_args_global = ops["m_args_global"]

    def chunk_impl(Kb, Advb, Rb, D_vec, mu_vec, m_args, dinv,
                   X, Rr, Z, Pp, rz, tol):
        Mfn = make_Mfn(Kb, Advb, Rb, m_args, dinv)

        def body(_, state):
            X, Rr, Z, Pp, rz = state
            active = jnp.sqrt(jnp.sum(Rr * Rr, axis=0)) > tol
            AP = A_bc(Kb, Advb, Rb, D_vec, mu_vec, Pp)
            pAp = jnp.sum(Pp * AP, axis=0)
            alpha = jnp.where(active & (pAp != 0),
                              rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
            X = X + alpha[None, :] * Pp
            Rr = Rr - alpha[None, :] * AP
            Z = Mfn(Rr)
            rz_new = jnp.sum(Rr * Z, axis=0)
            beta = jnp.where(active & (rz != 0),
                             rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
            Pp = jnp.where(active[None, :], Z + beta[None, :] * Pp, Pp)
            return (X, Rr, Z, Pp, rz_new)

        X, Rr, Z, Pp, rz = jax.lax.fori_loop(
            0, n_iters, body, (X, Rr, Z, Pp, rz))
        return X, Rr, Z, Pp, rz, jnp.sqrt(jnp.sum(Rr * Rr, axis=0))

    in_specs = (blk_spec,
                None if ss.Adv is None else blk_spec,
                None if ss.R is None else blk_spec,
                vec, vec, m_spec, col,
                col, col, col, col, vec, vec)
    out_specs = (col, col, col, col, vec, vec)
    smap_kwargs = dict(mesh=ss.mesh_dev, in_specs=in_specs,
                       out_specs=out_specs)
    try:
        fn = shard_map(chunk_impl, check_vma=False, **smap_kwargs)
    except TypeError:
        fn = shard_map(chunk_impl, check_rep=False, **smap_kwargs)
    return jax.jit(fn), m_args_global


def _bicgstab_chunk_sharded(ss: ShardedSystem, n_iters: int, f32: bool):
    """Jitted shard_map BiCGStab chunk over (sweep, cells): the
    nonsymmetric (adv-diff) twin of _cg_chunk_sharded, mirroring the
    single-mesh batched recurrence (parallel/sweep.py
    _refine_program_bicgstab).  Collective budget: 2 operator psums +
    2 preconditioner applies (2 fine-level psums each under MG) per
    iteration, all riding "cells"/ICI; the sweep axis stays
    collective-free."""
    ops = _sharded_ops(ss, f32)
    A_bc, make_Mfn = ops["A_bc"], ops["make_Mfn"]
    blk_spec, col, vec, m_spec = (ops["blk_spec"], ops["col"],
                                  ops["vec"], ops["m_spec"])
    m_args_global = ops["m_args_global"]

    def chunk_impl(Kb, Advb, Rb, D_vec, mu_vec, m_args, dinv,
                   X, Rr, Rhat, Pp, V, rho, alpha, omega, tol):
        Mfn = make_Mfn(Kb, Advb, Rb, m_args, dinv)

        def body(_, st):
            X, Rr, Pp, V, rho, alpha, omega = st
            active = jnp.sqrt(jnp.sum(Rr * Rr, axis=0)) > tol
            rho_new = jnp.sum(Rhat * Rr, axis=0)
            beta = jnp.where(
                active,
                (rho_new / jnp.where(rho != 0, rho, 1.0))
                * (alpha / jnp.where(omega != 0, omega, 1.0)), 0.0)
            Pp = jnp.where(
                active[None, :],
                Rr + beta[None, :] * (Pp - omega[None, :] * V), Pp)
            Phat = Mfn(Pp)
            V = A_bc(Kb, Advb, Rb, D_vec, mu_vec, Phat)
            denom = jnp.sum(Rhat * V, axis=0)
            alpha = jnp.where(active & (denom != 0),
                              rho_new / jnp.where(denom != 0, denom,
                                                  1.0), 0.0)
            S = Rr - alpha[None, :] * V
            Shat = Mfn(S)
            T = A_bc(Kb, Advb, Rb, D_vec, mu_vec, Shat)
            tt = jnp.sum(T * T, axis=0)
            omega = jnp.where(active & (tt != 0),
                              jnp.sum(T * S, axis=0)
                              / jnp.where(tt != 0, tt, 1.0), 0.0)
            X = X + alpha[None, :] * Phat + omega[None, :] * Shat
            Rr = jnp.where(active[None, :], S - omega[None, :] * T, Rr)
            return (X, Rr, Pp, V, rho_new, alpha, omega)

        X, Rr, Pp, V, rho, alpha, omega = jax.lax.fori_loop(
            0, n_iters, body, (X, Rr, Pp, V, rho, alpha, omega))
        return (X, Rr, Pp, V, rho, alpha, omega,
                jnp.sqrt(jnp.sum(Rr * Rr, axis=0)))

    in_specs = (blk_spec,
                None if ss.Adv is None else blk_spec,
                None if ss.R is None else blk_spec,
                vec, vec, m_spec, col,
                col, col, col, col, col, vec, vec, vec, vec)
    out_specs = (col, col, col, col, vec, vec, vec, vec)
    smap_kwargs = dict(mesh=ss.mesh_dev, in_specs=in_specs,
                       out_specs=out_specs)
    try:
        fn = shard_map(chunk_impl, check_vma=False, **smap_kwargs)
    except TypeError:
        fn = shard_map(chunk_impl, check_rep=False, **smap_kwargs)
    return jax.jit(fn), m_args_global


_SHARD_CHUNK_CACHE = {}


def sharded_solve_sweep(ss: ShardedSystem, D_values, mu_values,
                        rtol=1e-10, maxiter=5000, chunk_iters=50,
                        f32=False):
    """Chunked (optionally MG-preconditioned) CG over the device mesh.

    Same host protocol as solvers/batched.py: fixed-size device chunks,
    per-column freezing, only (B,) norms crossing the host boundary.
    Returns (X (B, ndofs) host layout, info).
    """
    sys = ss.sys
    dt = jnp.float32 if f32 else jnp.float64
    D_vec = jnp.asarray(np.asarray(D_values, dtype=np.float64)).astype(dt)
    mu_vec = jnp.asarray(np.asarray(mu_values,
                                    dtype=np.float64)).astype(dt)
    B = int(D_vec.shape[0])
    dp = ss.mesh_dev.shape["sweep"]
    if B % dp:
        raise ValueError(f"sweep batch {B} must divide over dp={dp}")

    nonsym = sys.Adv is not None
    key = (id(ss), chunk_iters, f32, nonsym)
    hit = _SHARD_CHUNK_CACHE.get(key)
    if hit is not None and hit[0] is ss:
        chunk, m_args = hit[1]
    else:
        maker = _bicgstab_chunk_sharded if nonsym else _cg_chunk_sharded
        chunk, m_args = maker(ss, chunk_iters, f32)
        _SHARD_CHUNK_CACHE[key] = (ss, (chunk, m_args))

    free = sys.free
    g = sys.bc_values.astype(dt)
    G = jnp.tile(g[:, None], (1, B))

    # eager RHS/diag via one chunk-free apply on device (replicated math)
    from ..parallel.sweep import _operator_program, operator_args, \
        sys_struct_key
    A_fn, rhs_fn, residual_fn, diag_fn = _operator_program(
        sys_struct_key(sys))
    a = operator_args(sys, D_vec.astype(jnp.float64),
                      mu_vec.astype(jnp.float64), None, f32=f32)
    RHS = rhs_fn(a, G.astype(dt))
    dinv = diag_fn(operator_args(sys, D_vec.astype(jnp.float64),
                                 mu_vec.astype(jnp.float64), None,
                                 f32=False)).astype(dt)

    X = G
    Rr = RHS - A_fn(a, X)
    bnorm = np.asarray(jnp.linalg.norm(RHS, axis=0))
    tol = jnp.asarray(rtol * bnorm, dtype=dt)

    iters = 0
    rn = np.asarray(jnp.linalg.norm(Rr, axis=0))
    tol_np = np.asarray(tol)
    col_iters = np.zeros(B, dtype=np.int64)
    if nonsym:
        Rhat = Rr
        Pp = jnp.zeros_like(Rr)
        V = jnp.zeros_like(Rr)
        ones = jnp.ones(B, dt)
        rho, alpha, omega = ones, ones, ones
        while iters < maxiter and (rn > tol_np).any():
            active = rn > tol_np
            (X, Rr, Pp, V, rho, alpha, omega, rn_dev) = chunk(
                ss.K, ss.Adv, ss.R, D_vec, mu_vec, m_args, dinv,
                X, Rr, Rhat, Pp, V, rho, alpha, omega, tol)
            iters += chunk_iters
            rn = np.asarray(rn_dev)
            col_iters[active] = iters
    else:
        if ss.ml is not None:
            from ..solvers.multilevel import make_ml_preconditioner
            M_fn, M_args = make_ml_preconditioner(ss.ml, f32=f32)
            Z = M_fn(M_args, Rr)
        else:
            Z = dinv * Rr
        Pp = Z
        rz = jnp.sum(Rr * Z, axis=0)
        while iters < maxiter and (rn > tol_np).any():
            active = rn > tol_np
            X, Rr, Z, Pp, rz, rn_dev = chunk(
                ss.K, ss.Adv, ss.R, D_vec, mu_vec, m_args, dinv,
                X, Rr, Z, Pp, rz, tol)
            iters += chunk_iters
            rn = np.asarray(rn_dev)
            col_iters[active] = iters
    from ..parallel.sweep import unpermute_columns
    Xout = unpermute_columns(sys, jnp.moveaxis(X, 0, 1))
    return Xout, {"iters": col_iters, "resnorm": rn,
                  "rel_resnorm": rn / np.where(bnorm > 0, bnorm, 1.0)}
