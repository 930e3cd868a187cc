"""Batched geometric multigrid V-cycle preconditioner.

Round-1's two-level preconditioner (solvers/twolevel.py) cut Jacobi-CG's
O(1/h) iteration growth ~10x, but its dense per-sample coarse inverses
dominated the sweep setup (20 x (nc=1850)^2 f32 = 274 MB upload + 46 s
host factorisation at the study mesh h=0.02).  This module replaces it
with a TPU-native geometric multigrid hierarchy:

    fine (P2, h)  ->  mid (P1, ~3h)  ->  coarsest (P1, ~9h, DENSE)

  - every level's operator is the SAME batched element machinery as the
    fine sweep (A_l(D,mu) = D*K_l + Adv_l + mu*R_l, batch-minor (n_l, B)):
    coefficients stay factored out, so setup is coefficient-independent
    except for the tiny coarsest inverses (~400 dofs -> ~13 MB for B=20);
  - transfers are barycentric interpolation between independently
    generated meshes of the same geometry (non-nested rediscretised MG),
    restriction = P^T as a sorted segment-sum scatter;
  - the V(1,1) cycle uses weighted-Jacobi smoothing; pre-smooth from zero
    + mirrored post-smooth makes M symmetric positive definite for omega
    below 2/lambda_max(D^-1 A), so plain CG applies.

The whole cycle is (n, B)-batched: one V-cycle preconditions all sweep
columns at once, and the only mu-dependent setup is a stack of small
dense inverses.

Replaces: PETSc LU (ref solvers.py:55,151) as the scalable solve path;
see SURVEY.md section 7.1 item 4.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MultilevelData", "build_multilevel", "make_ml_preconditioner",
           "coarse_level_meshes"]


class _Transfer(NamedTuple):
    cols: jnp.ndarray         # (n_fine, 3) coarse vertex ids
    weights: jnp.ndarray      # (n_fine, 3) barycentric weights (f32)
    perm: jnp.ndarray         # scatter plan for P^T
    ids_sorted: jnp.ndarray
    n_coarse: int


class _Level(NamedTuple):
    sys: "object"             # TransportSystem (parallel/sweep.py)
    dinv: jnp.ndarray         # (n_l, B) f32 inverse diagonal (free dofs)
    free: jnp.ndarray         # (n_l,) bool
    transfer: Optional[_Transfer]   # to next coarser level (None = coarsest)


class MultilevelData(NamedTuple):
    levels: tuple             # tuple of _Level, fine -> coarse
    Ainv: jnp.ndarray         # (B, nc, nc) f32 coarsest dense inverses
    free_c: jnp.ndarray       # (nc,) bool coarsest free mask
    omega: float
    D_vec: jnp.ndarray
    mu_vec: jnp.ndarray
    R_batches: tuple          # per-level per-sample Robin (fine first),
                              # None entries = scalar mu_vec scaling


def coarse_level_meshes(mesh_kwargs, mesh_size, factors=(3.0, 9.0),
                        generate=None):
    """Generate the coarser-level meshes of the same geometry.

    mesh_kwargs: the generate_mesh kwargs minus mesh_size.
    Returns a list of MeshData, one per factor (ordered fine->coarse).
    """
    if generate is None:
        from ..meshing.generator import generate_mesh as generate
    out = []
    for f in factors:
        out.append(generate(mesh_size=mesh_size * f, **mesh_kwargs))
    return out


def _interp(fine_coords, coarse_mesh, free_fine):
    """Barycentric transfer data (host). Same scheme as twolevel.py."""
    from ..analysis.profiles import PointLocator
    from scipy.spatial import cKDTree
    loc = PointLocator(coarse_mesh, k=12, tol=1e-8)
    cells, ref = loc.locate(fine_coords)
    bad = cells < 0
    lam = np.concatenate([1 - ref.sum(1, keepdims=True), ref], axis=1)
    lam = np.clip(lam, 0.0, 1.0)
    lam /= np.maximum(lam.sum(1, keepdims=True), 1e-300)
    cols = coarse_mesh.cells[np.where(bad, 0, cells)]
    if bad.any():
        tree = cKDTree(coarse_mesh.vertices)
        _, nearest = tree.query(fine_coords[bad])
        cols[bad] = np.stack([nearest] * 3, axis=1)
        lam[bad] = np.array([1.0, 0.0, 0.0])
    lam[~np.asarray(free_fine)] = 0.0
    ids = cols.ravel()
    perm = np.argsort(ids, kind="stable")
    return _Transfer(
        cols=jnp.asarray(cols, dtype=jnp.int32),
        weights=jnp.asarray(lam, dtype=jnp.float32),
        perm=jnp.asarray(perm, dtype=jnp.int32),
        ids_sorted=jnp.asarray(ids[perm], dtype=jnp.int32),
        n_coarse=len(coarse_mesh.vertices))


def _level_diag(sys_l, D_vec, mu_vec, R_batch):
    """(n_l, B) f64 operator diagonal with per-column coefficients."""
    diag = D_vec[None, :] * sys_l.K.diagonal()[:, None]
    if sys_l.Adv is not None:
        diag = diag + sys_l.Adv.diagonal()[:, None]
    if sys_l.R is not None:
        if R_batch is None:
            diag = diag + mu_vec[None, :] * sys_l.R.diagonal()[:, None]
        else:
            diag = diag + sys_l.R.diagonal_batched(R_batch)
    return diag


def build_multilevel(sys, level_meshes, D_values, mu_values=None,
                     robin_matrices_levels=None, robin_matrices_fine=None,
                     u_levels=None, omega=0.65):
    """Build the MG hierarchy for a TransportSystem sweep.

    sys: fine TransportSystem; level_meshes: MeshData list fine->coarse
    (the last one is solved densely).  D_values/mu_values: (B,) sweep
    coefficients.  robin_matrices_levels: optional per-level (B,F,nd,nd)
    per-sample Robin element matrices (step-mu sweeps); list aligned with
    level_meshes.  robin_matrices_fine: the fine system's per-sample
    Robin matrices (step-mu), used for fine-level smoothing.  u_levels:
    optional list of (values, space) velocity per level mesh (advective
    systems).
    """
    from ..parallel.sweep import build_transport_system

    D_vec = jnp.asarray(np.asarray(D_values, dtype=np.float64))
    B = int(D_vec.shape[0])
    mu_vec = (jnp.zeros(B) if mu_values is None
              else jnp.asarray(np.asarray(mu_values, dtype=np.float64)))

    n_levels = len(level_meshes)
    R_batches = ([None] * n_levels if robin_matrices_levels is None
                 else list(robin_matrices_levels))

    # per-level systems (P1, never padded: these are small)
    lsys = []
    for i, m in enumerate(level_meshes):
        kw = {}
        if u_levels is not None and u_levels[i] is not None:
            kw = dict(u_values=u_levels[i][0], u_space=u_levels[i][1])
        lsys.append(build_transport_system(m, element="P1",
                                           pad_shapes=False, **kw))

    # transfers: fine(sys) -> mesh0, mesh0 -> mesh1, ...
    transfers = []
    n_true = len(sys.space.dof_coords)
    free_fine = np.asarray(sys.free)[:n_true]
    tr = _interp(sys.space.dof_coords, level_meshes[0], free_fine)
    if sys.ndofs > n_true:      # shape-bucketing padding: no correction
        pad = sys.ndofs - n_true
        cols = np.concatenate([np.asarray(tr.cols),
                               np.zeros((pad, 3), np.int32)])
        lam = np.concatenate([np.asarray(tr.weights),
                              np.zeros((pad, 3), np.float32)])
        ids = cols.ravel()
        perm = np.argsort(ids, kind="stable")
        tr = _Transfer(cols=jnp.asarray(cols, dtype=jnp.int32),
                       weights=jnp.asarray(lam, dtype=jnp.float32),
                       perm=jnp.asarray(perm, dtype=jnp.int32),
                       ids_sorted=jnp.asarray(ids[perm], dtype=jnp.int32),
                       n_coarse=tr.n_coarse)
    transfers.append(tr)
    for i in range(n_levels - 1):
        transfers.append(_interp(level_meshes[i].vertices,
                                 level_meshes[i + 1],
                                 np.asarray(lsys[i].free)))

    # levels: fine + all mids (the coarsest is the dense solve, no smooth)
    levels = []
    fine_diag = _level_diag(sys, D_vec, mu_vec, robin_matrices_fine)
    fine_dinv = jnp.where(
        sys.free[:, None] & (fine_diag != 0),
        1.0 / jnp.where(fine_diag != 0, fine_diag, 1.0),
        1.0).astype(jnp.float32)
    levels.append(_Level(sys=sys, dinv=fine_dinv, free=sys.free,
                         transfer=transfers[0]))
    for i in range(n_levels - 1):
        d = _level_diag(lsys[i], D_vec, mu_vec, R_batches[i])
        dinv = jnp.where(
            lsys[i].free[:, None] & (d != 0),
            1.0 / jnp.where(d != 0, d, 1.0), 1.0).astype(jnp.float32)
        levels.append(_Level(sys=lsys[i], dinv=dinv, free=lsys[i].free,
                             transfer=transfers[i + 1]))

    # coarsest: per-sample dense inverses on HOST (tiny: ~nc^2 per sample;
    # on-device factorisations lower to pathologically slow sequential
    # kernels under this TPU runtime -- same finding as twolevel.py)
    csys = lsys[-1]
    nc = csys.ndofs
    import numpy as _np

    def dense_of(block, A_e):
        M = _np.zeros((nc, nc))
        dofs = _np.asarray(block.dofs)
        Ae = _np.asarray(A_e)
        for li in range(dofs.shape[1]):
            rows = dofs[:, li]
            for lj in range(dofs.shape[1]):
                _np.add.at(M, (rows, dofs[:, lj]), Ae[:, li, lj])
        return M

    K_c = dense_of(csys.K, csys.K.A64)
    Adv_c = (dense_of(csys.Adv, csys.Adv.A64)
             if csys.Adv is not None else None)
    R_c = dense_of(csys.R, csys.R.A64) if csys.R is not None else None
    free_c = _np.asarray(csys.free)

    def constrain(A):
        A[~free_c, :] = 0.0
        A[:, ~free_c] = 0.0
        idx = _np.flatnonzero(~free_c)
        A[idx, idx] = 1.0
        return A

    K_c = constrain(K_c)
    if Adv_c is not None:
        Adv_c = constrain(0.5 * (Adv_c + Adv_c.T))
    if R_c is not None:
        R_c = constrain(R_c)

    D_np = _np.asarray(D_vec)
    mu_np = _np.asarray(mu_vec)
    Rb_c = R_batches[-1]
    Ainvs = []
    for b in range(B):
        A = D_np[b] * K_c
        if Adv_c is not None:
            A = A + Adv_c
        if R_c is not None:
            if Rb_c is not None:
                A = A + constrain(dense_of(csys.R, Rb_c[b]))
            else:
                A = A + mu_np[b] * R_c
        A = A + 1e-6 * _np.abs(_np.diag(A)).mean() * _np.eye(nc)
        Ainvs.append(_np.linalg.inv(A.astype(_np.float32)))
    Ainv = jnp.asarray(_np.stack(Ainvs))

    return MultilevelData(levels=tuple(levels), Ainv=Ainv,
                          free_c=jnp.asarray(free_c),
                          omega=float(omega), D_vec=D_vec, mu_vec=mu_vec,
                          R_batches=tuple([robin_matrices_fine]
                                          + R_batches[:-1]))


def _restrict(tr: _Transfer, R):
    """(n_f, B) -> (n_c, B): P^T via sorted segment-sum."""
    contrib = tr.weights[:, :, None] * R[:, None, :]       # (n,3,B)
    n, _, B = contrib.shape
    flat = contrib.reshape(n * 3, B)[tr.perm]
    return jax.ops.segment_sum(flat, tr.ids_sorted,
                               num_segments=tr.n_coarse,
                               indices_are_sorted=True)


def _prolong(tr: _Transfer, Xc):
    """(n_c, B) -> (n_f, B): barycentric interpolation."""
    return jnp.einsum("nk,nkb->nb", tr.weights, Xc[tr.cols],
                      preferred_element_type=Xc.dtype)


def make_ml_preconditioner(ml: MultilevelData, f32=True):
    """M^{-1}: (n, B) -> (n, B) as one V(1,1) multigrid cycle.

    Returned as an (fn, args) pair (solvers/batched.py convention).  The
    per-sample coarsest inverses travel as arguments; everything else is
    closure constants (each level's element arrays are <= a few MB).
    """
    from ..parallel.sweep import _batched_operator

    dt = jnp.float32 if f32 else jnp.float64
    omega = ml.omega
    D32 = ml.D_vec.astype(dt)
    mu32 = ml.mu_vec.astype(dt)

    # per-level constrained operator applies; ml.R_batches is aligned
    # with ml.levels (fine first, then the mid levels)
    applies = []
    for i, lev in enumerate(ml.levels):
        Rb = ml.R_batches[i]
        if Rb is not None:
            Rb = jnp.asarray(Rb).astype(dt)
        _, A_l, _ = _batched_operator(lev.sys, D32, mu32, Rb, f32=f32)
        applies.append(A_l)

    levels = ml.levels
    n_mid = len(levels)          # fine + mids; coarsest handled densely
    free_c = ml.free_c

    def vcycle(l, r, Ainv):
        lev = levels[l]
        A_l = applies[l]
        # pre-smooth from zero: x = omega D^-1 r  (no A apply needed)
        x = omega * lev.dinv * r
        res = r - A_l(x)
        rc = _restrict(lev.transfer, res)
        if l + 1 < n_mid:
            rc = jnp.where(levels[l + 1].free[:, None], rc, 0.0)
            xc = vcycle(l + 1, rc, Ainv)
        else:
            rc = jnp.where(free_c[:, None], rc, 0.0)
            xc_b = jnp.matmul(Ainv, jnp.moveaxis(rc, 1, 0)[..., None],
                              preferred_element_type=jnp.float32)
            xc = jnp.moveaxis(xc_b[..., 0], 0, 1)
        x = x + _prolong(lev.transfer, xc)
        # mirrored post-smooth keeps M symmetric (CG-safe)
        x = x + omega * lev.dinv * (r - A_l(x))
        return x

    args = (ml.Ainv,)

    def apply(m_args, R):
        (Ainv,) = m_args
        Rw = R.astype(dt)
        out = vcycle(0, Rw, Ainv)
        return out.astype(R.dtype)

    return (apply, args)
