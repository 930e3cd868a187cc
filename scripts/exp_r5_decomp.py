"""Round-5 per-iteration decomposition on the TPU: standalone wall-clock
of the fine CG operator apply (A) and the hybrid preconditioner (M),
each as a fused 50-application fori_loop (no per-apply dispatch), vs the
full steady solve -- under f32 and bf16 transfer bands.  Pins where the
18.8 ms/iteration actually goes (modeled bytes say ~6 ms at the fine
apply's achieved 220 GB/s)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(jax, fn, *args, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)
    import jax.numpy as jnp

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        _operator_program, build_transport_system, operator_args,
        solve_sweep, sys_struct_key)
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, level_meshes_for, make_ml_preconditioner)
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, refinement_factor=1,
              domain_type="sulcus")
    mesh = generate_mesh(mesh_size=0.02, **kw)
    lm = level_meshes_for(mesh)
    sys_t = build_transport_system(mesh, element="P2")
    mus = np.array([f for r in MU_SWEEP_REGIMES.values()
                    for f in r])[:20]
    D = np.ones_like(mus)
    ml = build_multilevel(sys_t, lm, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    n, B = int(sys_t.ndofs), len(mus)
    print(f"ndofs={n} B={B}", flush=True)

    skey = sys_struct_key(sys_t)
    A_fn, _, _, _ = _operator_program(skey)
    a32 = operator_args(sys_t, jnp.asarray(D), jnp.asarray(mus), None,
                        True)
    X = jnp.ones((n, B), jnp.float32)

    LOOP = 50

    @jax.jit
    def loop_A(X):
        return jax.lax.fori_loop(0, LOOP, lambda i, x: A_fn(a32, x), X)

    t = timeit(jax, loop_A, X)
    print(f"A apply (banded f32): {1e3 * t / LOOP:.3f} ms", flush=True)

    for tbf in ("0", "1"):
        os.environ["FEU_ML_TB_BF16"] = tbf
        M_fn, m_args = make_ml_preconditioner(ml, f32=True,
                                              cycle="hybrid")

        @jax.jit
        def loop_M(X):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda i, x: M_fn(m_args, x), X)

        t = timeit(jax, loop_M, X)
        print(f"M hybrid (tb_bf16={tbf}): {1e3 * t / LOOP:.3f} ms",
              flush=True)

        # vector-op shell: one CG body minus A and M (axpys + dots)
        @jax.jit
        def loop_vec(X):
            def body(i, st):
                x, p, r = st
                pap = jnp.sum(p * x, axis=0)
                alpha = 1.0 / jnp.where(pap != 0, pap, 1.0)
                x = x + alpha[None, :] * p
                r = r - alpha[None, :] * x
                rz = jnp.sum(r * r, axis=0)
                beta = rz / jnp.where(pap != 0, pap, 1.0)
                p = r + beta[None, :] * p
                return (x, p, r)
            return jax.lax.fori_loop(0, LOOP, body, (X, X + 1.0, X * 2.0))

        t = timeit(jax, loop_vec, X)
        print(f"CG vector shell: {1e3 * t / LOOP:.3f} ms", flush=True)

        best = None
        info = None
        for rep in range(3):
            t0 = time.time()
            Xs, info = solve_sweep(sys_t, D,
                                   mu_values=mus * (1 + 1e-7 * (rep + 1)),
                                   rtol=1e-11, multilevel=ml,
                                   chunk_iters=50)
            jax.block_until_ready(Xs)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"full solve (tb_bf16={tbf}): {best:.3f} s "
              f"iters={int(np.max(info['iters']))} "
              f"maxrel={float(np.max(info['rel_resnorm'])):.2e}",
              flush=True)
    os.environ.pop("FEU_ML_TB_BF16", None)


if __name__ == "__main__":
    main()
