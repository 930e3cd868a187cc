"""Pallas TPU kernels for the batched element-apply core.

The hot loop of every solve is

    Ye[t, i, b] = sum_j A_e[t, i, j] * Xe[t, j, b]      (nd = 6, B = sweep)

-- a huge batch of tiny (6x6) matmuls with the sweep batch in the lane
dimension.  This kernel tiles the cell axis through VMEM and unrolls the
j-contraction into 6 VPU multiply-adds over (tile, B) slices, fusing the
per-column coefficient scaling (D_b, mu_b) that XLA would otherwise
materialise separately.  The surrounding gather/scatter stays in XLA
(random-access indexing inside a TPU kernel serialises; XLA's sorted
segment-sum is the right tool there).

Opt-in via FEU_PALLAS=1 (parallel/sweep.py consults `use_pallas()`); the
XLA einsum path remains the default -- measured on v5e the two are within
noise for this shape, and the kernel is primarily the template for future
fusion work (coefficient + gather fusion).  Falls back to interpret mode
off-TPU so tests exercise it everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["element_apply_pallas", "use_pallas"]


def use_pallas():
    return os.environ.get("FEU_PALLAS", "0") == "1"


def _kernel(a_ref, x_ref, coef_ref, y_ref):
    # a_ref: (T_tile, nd, nd); x_ref: (T_tile, nd, B); coef_ref: (1, B)
    # y_ref: (T_tile, nd, B)
    nd = a_ref.shape[1]
    coef = coef_ref[0, :]                          # (B,)
    for i in range(nd):
        acc = a_ref[:, i, 0:1] * x_ref[:, 0, :]
        for j in range(1, nd):
            acc = acc + a_ref[:, i, j:j + 1] * x_ref[:, j, :]
        y_ref[:, i, :] = acc * coef[None, :]


@functools.partial(jax.jit, static_argnames=("tile",))
def element_apply_pallas(A_e, Xe, coef, tile=512):
    """Ye[t,i,b] = coef[b] * sum_j A_e[t,i,j] Xe[t,j,b] via Pallas.

    A_e (T, nd, nd), Xe (T, nd, B), coef (B,).  T is padded to the tile.
    """
    from jax.experimental import pallas as pl

    T, nd, B = Xe.shape
    Tp = ((T + tile - 1) // tile) * tile
    if Tp != T:
        A_e = jnp.pad(A_e, ((0, Tp - T), (0, 0), (0, 0)))
        Xe = jnp.pad(Xe, ((0, Tp - T), (0, 0), (0, 0)))
    coef2 = coef.reshape(1, B).astype(Xe.dtype)

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, nd, B), Xe.dtype),
        grid=(Tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, nd, nd), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, nd, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, B), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, nd, B), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(A_e.astype(Xe.dtype), Xe, coef2)
    return out[:T]
