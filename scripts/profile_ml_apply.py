"""Micro-profile the ML-preconditioned CG chunk on the real TPU.

(The standalone jitted V-cycle apply faulted the TPU worker once; all
timings here go through the chunk kernels, which are the production
path anyway.)
"""
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
    from fenics_eff_uptake_tpu.solvers.batched import _cg_chunk
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, make_ml_preconditioner, ml_preconditioner_args)
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
    A_fn, rhs_fn, residual_fn, diag_fn = _operator_program(
        sys_struct_key(sys_t))
    a32 = operator_args(sys_t, jnp.asarray(D), jnp.asarray(mus), None,
                        f32=True)

    A_jit = jax.jit(A_fn)
    Y = A_jit(a32, X)
    jax.block_until_ready(Y)
    t0 = time.time()
    for _ in range(20):
        Y = A_jit(a32, Y)
    jax.block_until_ready(Y)
    print(f"A apply: {(time.time()-t0)/20*1000:.2f} ms", flush=True)

    M_fn, m_args = make_ml_preconditioner(ml, f32=True)

    # Jacobi-only chunk as the per-iteration floor
    dinv32 = diag_fn(operator_args(sys_t, jnp.asarray(D),
                                   jnp.asarray(mus), None,
                                   f32=False)).astype(jnp.float32)
    Mj = ((lambda ma, R: ma[0] * R), (dinv32,))
    tol = jnp.zeros(B, jnp.float32)

    def time_chunk(name, Mpair, n_iters, reps):
        Mfn, margs = Mpair
        chunk = _cg_chunk(A_fn, Mfn, n_iters)
        Z = X
        rz = jnp.sum(X * X, axis=0)
        st = (X, X, Z, Z, rz)
        out = chunk(a32, margs, *st, tol)
        jax.block_until_ready(out[0])
        t0 = time.time()
        for _ in range(reps):
            out = chunk(a32, margs, *out[:5], tol)
        jax.block_until_ready(out[0])
        ms = (time.time() - t0) / reps / n_iters * 1000
        print(f"{name} ({n_iters} iters/chunk): {ms:.2f} ms/iter",
              flush=True)

    time_chunk("CG+Jacobi chunk", Mj, 50, 3)
    time_chunk("CG+ML chunk", (M_fn, m_args), 10, 3)
    time_chunk("CG+ML chunk", (M_fn, m_args), 50, 2)

    # omega sweep (runtime arg -> no recompile): true convergence iters
    from fenics_eff_uptake_tpu.parallel.sweep import solve_sweep
    for om in (0.5, 0.65, 0.8, 0.9):
        ml2 = ml._replace(omega=float(om))
        t0 = time.time()
        Xs, info = solve_sweep(sys_t, D, mu_values=mus, rtol=1e-11,
                               multilevel=ml2, chunk_iters=25)
        jax.block_until_ready(Xs)
        print(f"omega={om}: {time.time()-t0:.2f}s "
              f"iters={info['iters'].tolist()} "
              f"maxrel={info['rel_resnorm'].max():.2e}", flush=True)


if __name__ == "__main__":
    main()
