"""Micro-profile the ML V-cycle components on the real TPU."""
import os
import time

import numpy as np

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)
    import jax.numpy as jnp

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system, _operator_program, operator_args,
        sys_struct_key)
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, make_ml_preconditioner)
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25, sulcus_width=0.25,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    mids = [generate_mesh(mesh_size=max(3 * MESH_SIZE, 0.06), **kw),
            generate_mesh(mesh_size=max(9 * MESH_SIZE, 0.18), **kw)]
    sys_t = build_transport_system(mesh, element="P2")
    mus = np.array([f for r in MU_SWEEP_REGIMES.values() for f in r])[:20]
    D = np.ones_like(mus)
    ml = build_multilevel(sys_t, mids, D, mu_values=mus)
    print(f"built: ndofs={sys_t.ndofs} nc={ml.Ainv.shape[1]}", flush=True)

    B = 20
    X = jnp.ones((sys_t.ndofs, B), jnp.float32)

    def timeit(name, fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
        return out

    A_fn, rhs_fn, residual_fn, diag_fn = _operator_program(
        sys_struct_key(sys_t))
    a32 = operator_args(sys_t, jnp.asarray(D), jnp.asarray(mus), None,
                        f32=True)
    A_jit = jax.jit(A_fn)
    timeit("A apply (f32, B=20)", A_jit, a32, X)

    M_fn, m_args = make_ml_preconditioner(ml, f32=True)
    M_jit = jax.jit(M_fn)
    timeit("ML V-cycle apply (f32)", M_jit, m_args, X)

    # level-by-level: fine smoother pieces
    levels, free_c, Ainv, D_vec, mu_vec, omega = m_args
    la = levels[0]

    @jax.jit
    def fine_smooth(la, X):
        return 0.65 * la.dinv * X

    timeit("fine Jacobi smooth", fine_smooth, la, X)

    @jax.jit
    def restrict0(la, R):
        contrib = la.t_w[:, :, None] * R[:, None, :]
        n, _, Bc = contrib.shape
        flat = contrib.reshape(n * 3, Bc)[la.t_perm]
        return jax.ops.segment_sum(flat, la.t_ids,
                                   num_segments=levels[1].free.shape[0],
                                   indices_are_sorted=True)

    rc = timeit("restrict fine->mid", restrict0, la, X)

    @jax.jit
    def prolong0(la, Xc):
        return jnp.einsum("nk,nkb->nb", la.t_w, Xc[la.t_cols],
                          preferred_element_type=Xc.dtype)

    timeit("prolong mid->fine", prolong0, la, rc)

    la1 = levels[1]

    @jax.jit
    def mid_apply(la1, Xc, D_vec, mu_vec):
        from fenics_eff_uptake_tpu.parallel.sweep import _args_block_apply
        nd1 = la1.free.shape[0]
        Y = _args_block_apply(la1.K, nd1, Xc, coef=D_vec.astype(Xc.dtype))
        Y = Y + _args_block_apply(la1.R, nd1, Xc,
                                  coef=mu_vec.astype(Xc.dtype))
        return Y

    timeit("mid operator apply", mid_apply, la1, rc,
           D_vec, mu_vec)

    @jax.jit
    def coarsest(Ainv, rc):
        xc_b = jnp.matmul(Ainv, jnp.moveaxis(rc, 1, 0)[..., None],
                          preferred_element_type=jnp.float32)
        return jnp.moveaxis(xc_b[..., 0], 0, 1)

    rcc = jnp.ones((ml.Ainv.shape[1], B), jnp.float32)
    timeit("coarsest dense solve", coarsest, Ainv, rcc)

    # one full CG iteration via the chunk (n_iters=1)
    from fenics_eff_uptake_tpu.solvers.batched import _cg_chunk
    chunk1 = _cg_chunk(A_fn, M_fn, 1)
    Z = M_jit(m_args, X)
    rz = jnp.sum(X * Z, axis=0)
    tol = jnp.zeros(B, jnp.float32)
    out = chunk1(a32, m_args, X, X, Z, Z, rz, tol)
    jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(10):
        out = chunk1(a32, m_args, *out[:5], tol)
    jax.block_until_ready(out[0])
    print(f"CG+ML chunk (1 iter/call): {(time.time()-t0)/10*1000:.2f} ms",
          flush=True)

    chunk50 = _cg_chunk(A_fn, M_fn, 50)
    out = chunk50(a32, m_args, X, X, Z, Z, rz, tol)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = chunk50(a32, m_args, *out[:5], tol)
    jax.block_until_ready(out[0])
    print(f"CG+ML chunk (50 iters): {(time.time()-t0)/50*1000:.2f} "
          f"ms/iter", flush=True)


if __name__ == "__main__":
    main()
