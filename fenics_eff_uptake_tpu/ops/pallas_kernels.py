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

__all__ = ["element_apply_pallas", "use_pallas", "band_apply_pallas",
           "use_band_pallas"]


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
    # x64-enabled tracing leaks i64 index constants into Mosaic's memref
    # slices, which its verifier rejects ("failed to legalize
    # func.return" / "must be 32-bit signless integer") -- trace the
    # kernel with x64 off when lowering for TPU.  Interpret mode has no
    # Mosaic verifier and must keep x64 on: disabling it silently
    # truncates f64 operands while out_shape stays f64, which the
    # interpreter rejects at the ref store.
    with jax.enable_x64(interpret and jax.config.jax_enable_x64):
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


# ---------------------------------------------------------------------------
# Banded-dense tile matvec: Y[t] = band[t] @ X[window(t)]  on the MXU.
#
# The XLA formulation (ops/banded.py band_apply: 2*halo+1 shifted batched
# matmuls) runs fine standalone but faults the axon TPU worker when inlined
# into the V-cycle preconditioner program (PERFORMANCE.md round-2 catalogue).
# This kernel expresses the same contraction as ONE (R, W) @ (W, B) dot per
# 128-row tile, with the X window double-buffer DMA'd from HBM -- a different
# lowering path that sidesteps the faulting XLA pattern and removes the
# shifted-copy materialisation.
#
# No reference counterpart: the reference delegates SpMV to PETSc
# (ref solvers.py:55,151); this is the TPU-native assembled-operator apply.
# ---------------------------------------------------------------------------


def use_band_pallas():
    """Pallas banded apply inside jitted solver programs (default ON on
    TPU; FEU_BAND_PALLAS=0 restores the XLA shifted-matmul form)."""
    return os.environ.get("FEU_BAND_PALLAS", "1") == "1"


def _band_kernel_factory(R, W, T):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(band_ref, x_hbm, coef_ref, y_ref, xwin, sems):
        t = pl.program_id(0).astype(jnp.int32)
        slot = jax.lax.rem(t, jnp.asarray(2, jnp.int32))
        nslot = jax.lax.rem(t + jnp.asarray(1, jnp.int32),
                            jnp.asarray(2, jnp.int32))

        zero = jnp.asarray(0, jnp.int32)

        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(zero, W), :], xwin.at[zero],
                sems.at[zero]).start()

        @pl.when(t + 1 < T)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds((t + 1) * R, W), :], xwin.at[nslot],
                sems.at[nslot]).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * R, W), :], xwin.at[slot],
            sems.at[slot]).wait()
        # bf16 operands take the native single-pass MXU mode: Mosaic
        # rejects fp32 contract precision on bf16 inputs, and the 6-pass
        # decomposition is the point of AVOIDING when the caller chose
        # bf16 (V-cycle preconditioner applies)
        prec = (jax.lax.Precision.DEFAULT
                if band_ref.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        y = jax.lax.dot_general(
            band_ref[0], xwin[slot], (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)
        y_ref[:, :] = (y * coef_ref[0, :][None, :]).astype(y_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_apply_pallas(band, X, coef=None, interpret=None):
    """Y = A @ X from the (T, R, W) band form, as a Pallas TPU kernel.

    band: (T, R, W) with W = (2*halo+1)*R; X: (T*R, B); coef: optional
    (B,) per-column scaling fused into the output.  Matches
    ops.banded.band_apply in structure (same HIGHEST-precision f32
    contraction); interpret mode off-TPU so CPU tests cover it.

    The batch dim is padded to the 128-lane tile inside the kernel: the
    HBM buffer of an (n, B) array is physically lane-padded to 128
    anyway, and Mosaic requires DMA slices lane-aligned -- the pad makes
    the physical traffic explicit without adding any.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, R, W = band.shape
    halo = (W // R - 1) // 2
    n, B = X.shape
    dt = X.dtype
    if coef is None:
        coef = jnp.ones((B,), dt)
    Bp = ((B + 127) // 128) * 128
    coef2 = jnp.pad(coef.reshape(1, B).astype(dt), ((0, 0), (0, Bp - B)))
    # zero halo pad (window reads in-bounds) + lane pad (DMA alignment)
    Xp = jnp.pad(X.astype(band.dtype),
                 ((halo * R, halo * R), (0, Bp - B)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # x64-enabled tracing leaks i64 index constants into Mosaic memref
    # slices (verifier rejects them); trace with x64 off when lowering
    # for TPU.  Interpret mode keeps the caller's x64 setting (see
    # element_apply_pallas).
    with jax.enable_x64(interpret and jax.config.jax_enable_x64):
        Y = pl.pallas_call(
            _band_kernel_factory(R, W, T),
            out_shape=jax.ShapeDtypeStruct((n, Bp), dt),
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, Bp), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, Bp), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, W, Bp), band.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(band, Xp, coef2)
    return Y[:, :B]


# ---------------------------------------------------------------------------
# Rectangular windowed-band apply: MG transfer operators (restriction /
# prolongation) as per-tile MXU matmuls with sliding windows.
#
#     Y[t*R + r] = sum_w band[t, r, w] * X[offs[t] + w]
#
# The row/col ratio of a transfer is non-integer, so unlike the square
# operator band the window start is PER-TILE DATA (SMEM) rather than t*R.
# Replaces the (3n, B) gather + sorted segment-sum pair that XLA lowers to
# per-row transactions (measured 8.6 ms of a 15.6 ms V-cycle at 1e5 dofs).
# See ops/banded.py build_rect_band_plan for the host plan.
# ---------------------------------------------------------------------------


def _rect_band_kernel_factory(R, W, T):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(offs_ref, band_ref, x_hbm, y_ref, xwin, sems):
        t = pl.program_id(0).astype(jnp.int32)
        slot = jax.lax.rem(t, jnp.asarray(2, jnp.int32))
        nslot = jax.lax.rem(t + jnp.asarray(1, jnp.int32),
                            jnp.asarray(2, jnp.int32))

        # window starts are runtime SMEM data; the host plan 16-aligns
        # them (ops/banded.py build_rect_band_plan) and multiple_of
        # carries that fact to Mosaic -- required for bf16's packed
        # (16, 128) VMEM tiling, harmless for f32
        def _o(i):
            return pl.multiple_of(offs_ref[i], 16)

        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(_o(0), W), :], xwin.at[0],
                sems.at[0]).start()

        @pl.when(t + 1 < T)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(_o(t + 1), W), :], xwin.at[nslot],
                sems.at[nslot]).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(_o(t), W), :], xwin.at[slot],
            sems.at[slot]).wait()
        # same rule as the square-band kernel: bf16 operands take the
        # native single-pass MXU mode (Mosaic rejects fp32 contract
        # precision on bf16 inputs); f32 keeps the 6-pass HIGHEST form
        prec = (jax.lax.Precision.DEFAULT
                if band_ref.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        y = jax.lax.dot_general(
            band_ref[0], xwin[slot], (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)
        y_ref[:, :] = y.astype(y_ref.dtype)

    return kernel


@jax.jit
def rect_band_apply_pallas(band, offs, Xp):
    """Y = rect_band @ Xp via per-tile windowed MXU matmuls.

    band (T, R, W) f32; offs (T,) int32 8-aligned window starts; Xp
    (n_cols_pad, B) with n_cols_pad >= max(offs) + W (zero-padded by the
    caller).  Returns (T*R, B).  Interpret mode off-TPU so CPU tests
    cover the kernel; the lane dim is padded to 128 inside (the HBM
    buffer is physically lane-padded anyway)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, R, W = band.shape
    n, B = Xp.shape
    dt = Xp.dtype
    Bp = ((B + 127) // 128) * 128
    Xq = jnp.pad(Xp.astype(band.dtype), ((0, 0), (0, Bp - B)))

    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(interpret and jax.config.jax_enable_x64):
        Y = pl.pallas_call(
            _rect_band_kernel_factory(R, W, T),
            out_shape=jax.ShapeDtypeStruct((T * R, Bp), dt),
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, Bp), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, W, Bp), band.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(offs, band, Xq)
    return Y[:, :B]
