"""Round-5 roofline experiments: actual shapes + per-op timings of the
hot solve path on the TPU, to locate the bytes behind the 8.7%-of-HBM
measurement (BENCH_r04) before touching any code."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))
REPS = int(os.environ.get("REPS", "30"))


def timeit(jax, fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1000


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)
    import jax.numpy as jnp

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system, _operator_program, operator_args,
        sys_struct_key)
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, make_ml_preconditioner, level_meshes_for)

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, refinement_factor=1,
              domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    lm = level_meshes_for(mesh)
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)

    B = 20
    mus = np.linspace(0.1, 3.0, B)
    D = np.ones(B)
    ml = build_multilevel(sys_t, lm, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)

    print(f"ndofs={sys_t.ndofs} B={B}")
    print(f"fine Kband: {None if sys_t.Kband is None else sys_t.Kband.shape}")
    for i, lev in enumerate(ml.levels):
        s = lev.sys
        kb = None if s.Kband is None else tuple(s.Kband.shape)
        bands = None
        if lev.bands is not None:
            bands = (tuple(lev.bands[0].band.shape),
                     tuple(lev.bands[2].band.shape))
        print(f"level {i}: ndofs={s.ndofs} Kband={kb} tbands={bands}")
    print(f"coarse Ainv: {ml.Ainv.shape}")

    # per-op timings
    from fenics_eff_uptake_tpu.ops.pallas_kernels import band_apply_pallas
    X = jnp.ones((sys_t.ndofs, B), jnp.float32)
    band = sys_t.Kband
    print(f"\nband bytes (f32): {band.size * 4 / 2**20:.1f} MB")
    t = timeit(jax, jax.jit(band_apply_pallas), band, X)
    print(f"band_apply_pallas (fine, f32): {t:.2f} ms")
    t = timeit(jax, jax.jit(band_apply_pallas), band.astype(jnp.bfloat16),
               X.astype(jnp.bfloat16))
    print(f"band_apply_pallas (fine, bf16): {t:.2f} ms")

    # vector-op cost: one axpy + one dot on (n, B)
    @jax.jit
    def axpy_dot(X, Y):
        Z = X + 1.3 * Y
        return Z, jnp.sum(Z * Y, axis=0)
    t = timeit(jax, axpy_dot, X, X + 1.0)
    print(f"axpy+dot (n,B) f32: {t:.2f} ms  "
          f"(logical bytes {3 * X.size * 4 / 2**20:.0f} MB)")

    Xm = jnp.ones((B, sys_t.ndofs), jnp.float32)

    @jax.jit
    def axpy_dot_major(X, Y):
        Z = X + 1.3 * Y
        return Z, jnp.sum(Z * Y, axis=1)
    t = timeit(jax, axpy_dot_major, Xm, Xm + 1.0)
    print(f"axpy+dot (B,n) f32: {t:.2f} ms  (same logical bytes)")

    # V-cycle and full body
    M_fn, m_args = make_ml_preconditioner(ml, f32=True)
    M_jit = jax.jit(M_fn)
    t = timeit(jax, M_jit, m_args, X)
    print(f"\nV-cycle apply f32: {t:.2f} ms")
    os.environ["FEU_ML_BF16"] = "1"
    M_fn2, m_args2 = make_ml_preconditioner(ml, f32=True)
    M_jit2 = jax.jit(M_fn2)
    t = timeit(jax, M_jit2, m_args2, X)
    print(f"V-cycle apply bf16: {t:.2f} ms")
    del os.environ["FEU_ML_BF16"]

    # f64 element apply (defect-pass cost)
    skey = sys_struct_key(sys_t)
    A_fn, _, _, _ = _operator_program(skey)
    a64 = operator_args(sys_t, jnp.asarray(D), jnp.asarray(mus), None,
                        f32=False)
    X64 = jnp.ones((sys_t.ndofs, B), jnp.float64)
    A_jit = jax.jit(A_fn)
    t = timeit(jax, A_jit, a64, X64, reps=5)
    print(f"f64 element apply: {t:.2f} ms")


if __name__ == "__main__":
    main()
