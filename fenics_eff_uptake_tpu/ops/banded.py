"""Banded-dense (MXU) form of the assembled operator.

The element-scatter apply (ops/elemspmv.py, parallel/sweep.py:_Block)
is gather -> tiny matmul -> segment-sum: measured ~30x above its HBM
bandwidth bound on TPU because XLA lowers the random row gather/scatter
of (n, B) lane-minor arrays into per-row transactions (PERFORMANCE.md).

This module trades that irregular traffic for regular, MXU-shaped
dense work.  The dof graph of a 2-D FEM mesh has O(sqrt(n)) bandwidth
under a reverse-Cuthill-McKee ordering (measured: 643 at ~1e5 P2 dofs
on the default study mesh, vs ~1e5 natural).  After RCM the assembled
matrix fits in a block-banded form:

    band[t, r, w] = A[t*R + r, (t - halo)*R + w]

with row tiles of R rows and a window of W = (2*halo + 1)*R columns,
halo = ceil(max |i - j| / R).  The apply is then ONE batched dense
matmul per operator:

    Y[t] = band[t] @ X_window[t]          # (R, W) @ (W, B) on the MXU

where the X windows are built from shifted reshapes (contiguous
copies, no gather).  At the study mesh (n ~ 1e5, W = 1792, B = 20)
the band costs ~760 MB HBM and the apply is compute/bandwidth bound at
~1-2 ms -- vs 9.6 ms for the element path.

The band stores the raw assembled matrix (no Dirichlet masking baked
in); constraint semantics stay in the caller exactly as for the
element path.  f64 outer-defect applies keep using the element path
(the band is the f32 inner-Krylov workhorse).

No reference-code counterpart: the reference delegates SpMV to PETSc
(ref solvers.py:55,151); this layout is the TPU-native answer to
SURVEY.md 7.3 item 5 (irregular sparsity on a dense-matrix machine).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandPlan", "rcm_permutation", "best_bandwidth_permutation",
           "build_band_plan", "band_from_elements", "band_apply"]


class BandPlan(NamedTuple):
    """Host-built scatter plan: element entries -> band slots."""
    perm: jnp.ndarray         # (N*nd*nd,) argsort of flat band ids
    ids_sorted: jnp.ndarray   # (N*nd*nd,) sorted flat ids (row*W + w)
    tiles: int                # T
    tile: int                 # R (rows per tile)
    width: int                # W = (2*halo + 1) * R
    halo: int


def rcm_permutation(entity_dofs: np.ndarray, ndofs_true: int,
                    ndofs_padded: int):
    """Reverse-Cuthill-McKee ordering of the dof graph.

    entity_dofs: (N, nd) cell dof map (true cells only, or padded --
    dummy-dof rows produce self-loops, which are harmless).
    Returns (new2old, old2new) int32 arrays over the PADDED dof range;
    padding dofs keep their (tail) positions.
    """
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ed = np.asarray(entity_dofs)
    ed = ed[(ed < ndofs_true).all(axis=1)]     # drop padding entities
    nd = ed.shape[1]
    rows = np.repeat(ed, nd, axis=1).ravel()
    cols = np.tile(ed, (1, nd)).ravel()
    A = sps.coo_matrix(
        (np.ones(len(rows), dtype=np.int8), (rows, cols)),
        shape=(ndofs_true, ndofs_true)).tocsr()
    p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                   dtype=np.int64)
    new2old = np.concatenate(
        [p, np.arange(ndofs_true, ndofs_padded, dtype=np.int64)])
    old2new = np.empty(ndofs_padded, dtype=np.int64)
    old2new[new2old] = np.arange(ndofs_padded)
    return (new2old.astype(np.int32), old2new.astype(np.int32))


def _spread_of(entity_dofs, old2new):
    e = old2new.astype(np.int64)[np.asarray(entity_dofs)]
    return int((e.max(axis=1) - e.min(axis=1)).max())


def best_bandwidth_permutation(entity_dofs: np.ndarray,
                               dof_coords: np.ndarray,
                               ndofs_true: int, ndofs_padded: int):
    """Minimum-spread dof ordering: RCM vs geometric sweep.

    On elongated domains (the studies' 10:1 sulcus channel) a plain
    lexicographic (x, y) sweep beats RCM substantially (measured 357 vs
    643 at ~1e5 P2 dofs), and band HBM bytes -- the banded apply's cost
    -- scale with the spread.  Returns the (new2old, old2new) pair with
    the smaller graph spread."""
    cand = [rcm_permutation(entity_dofs, ndofs_true, ndofs_padded)]
    if dof_coords is not None and len(dof_coords) >= ndofs_true:
        xy = np.asarray(dof_coords)[:ndofs_true]
        order = np.lexsort((xy[:, 1], xy[:, 0]))
        n2o = np.concatenate(
            [order.astype(np.int64),
             np.arange(ndofs_true, ndofs_padded, dtype=np.int64)])
        o2n = np.empty(ndofs_padded, dtype=np.int64)
        o2n[n2o] = np.arange(ndofs_padded)
        cand.append((n2o.astype(np.int32), o2n.astype(np.int32)))
    ed = np.asarray(entity_dofs)
    ed = ed[(ed < ndofs_true).all(axis=1)]
    return min(cand, key=lambda c: _spread_of(ed, c[1]))


def build_band_plan(entity_dofs: np.ndarray, ndofs: int,
                    tile: int = 256) -> BandPlan:
    """Band scatter plan for (already permuted) entity dofs.

    ndofs must be a multiple of `tile` (shape bucketing guarantees it).
    """
    ed = np.asarray(entity_dofs, dtype=np.int64)
    if ndofs % tile:
        raise ValueError(f"ndofs {ndofs} not a multiple of tile {tile}")
    spread = int((ed.max(axis=1) - ed.min(axis=1)).max())
    halo = max(1, -(-spread // tile))
    # quantise the halo to a short menu: W enters every banded program's
    # shape, so a per-geometry halo would recompile the full solver
    # stack per geometry class in multi-mesh studies (minutes each on
    # the remote TPU compiler).  The menu is deliberately SPARSE around
    # the study-scale range: h=0.02 sulcus meshes straddle halo 3/4, and
    # carrying both shapes recompiled the Stokes MINRES chunk (~60-90 s)
    # for half the geometries -- one padded-out halo costs ~25% more
    # band zeros but compiles once (round-3 profile_stokes.py).
    for h in (1, 2, 4, 8, 16, 32):
        if h >= halo:
            halo = h
            break
    W = (2 * halo + 1) * tile
    T = ndofs // tile
    nd = ed.shape[1]
    rows = ed[:, :, None]                        # (N, nd, 1)
    cols = ed[:, None, :]                        # (N, 1, nd)
    t = rows // tile
    w = cols - (t - halo) * tile                 # in [0, W)
    flat = (rows * W + w).ravel()
    order = np.argsort(flat, kind="stable")
    return BandPlan(
        perm=jnp.asarray(order, dtype=jnp.int32),
        ids_sorted=jnp.asarray(flat[order], dtype=jnp.int32),
        tiles=T, tile=tile, width=W, halo=halo)


def band_from_elements(A_e, plan: BandPlan, dtype=jnp.float32):
    """Scatter element matrices (N, nd, nd) into the (T, R, W) band."""
    vals = jnp.asarray(A_e).astype(dtype).reshape(-1)[plan.perm]
    flat = jax.ops.segment_sum(
        vals, plan.ids_sorted,
        num_segments=plan.tiles * plan.tile * plan.width,
        indices_are_sorted=True)
    return flat.reshape(plan.tiles, plan.tile, plan.width)


def band_apply(band, X, coef=None):
    """Y = A @ X via shifted batched dense tile matmuls.

    band: (T, R, W) with W = (2*halo+1)*R; X: (T*R, B).
    coef: optional (B,) per-column scaling fused into the output.

    Formulated as (2*halo+1) batched (R, R) @ (R, B) matmuls over
    tile-shifted copies of X rather than one (T, W, B) window gather:
    the shifted operands are contiguous pad+slice copies, nothing
    larger than X itself is materialised (the windowed form faulted
    the remote TPU compiler inside large fused solver programs).
    """
    T, R, W = band.shape
    halo = (W // R - 1) // 2
    n, B = X.shape
    Xt = X.reshape(T, R, B).astype(band.dtype)
    Y = None
    for k in range(2 * halo + 1):
        bk = jax.lax.slice_in_dim(band, k * R, (k + 1) * R,
                                  axis=2)                    # (T, R, R)
        s = k - halo
        if s < 0:
            Xs = jnp.concatenate(
                [jnp.zeros((-s, R, B), Xt.dtype), Xt[:T + s]], axis=0)
        elif s > 0:
            Xs = jnp.concatenate(
                [Xt[s:], jnp.zeros((s, R, B), Xt.dtype)], axis=0)
        else:
            Xs = Xt
        Yk = jnp.einsum("trw,twb->trb", bk, Xs,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=Xt.dtype)
        Y = Yk if Y is None else Y + Yk
    Y = Y.astype(X.dtype)
    if coef is not None:
        Y = Y * coef.astype(X.dtype)[None, None, :]
    return Y.reshape(n, B)
