"""Per-component steady-state timings of the ML-CG hot path on TPU.

Splits the ~42 ms/iter refine-body cost into: banded operator apply,
V-cycle preconditioner apply, and the full CG body (apply + M + vector
ops), so optimisation lands where the time goes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))
REPS = int(os.environ.get("REPS", "20"))


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
        build_multilevel, make_ml_preconditioner)
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, refinement_factor=1,
              domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    mids = [generate_mesh(mesh_size=max(3 * MESH_SIZE, 0.06), **kw),
            generate_mesh(mesh_size=max(9 * MESH_SIZE, 0.18), **kw)]
    print("meshes done", flush=True)
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)
    print("fine assembly done", flush=True)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values()
                    for f in r])[:20]
    D = np.ones_like(mus)
    B = len(mus)
    ml = build_multilevel(sys_t, mids, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    print(f"ndofs={sys_t.ndofs} B={B} banded={sys_t.Kband is not None}",
          flush=True)

    skey = sys_struct_key(sys_t)
    A_fn, _, _, _ = _operator_program(skey)
    a32 = operator_args(sys_t, jnp.asarray(D), jnp.asarray(mus), None,
                        f32=True)
    X = jnp.ones((sys_t.ndofs, B), jnp.float32)

    A_jit = jax.jit(A_fn)
    print(f"A apply (banded f32): {timeit(jax, A_jit, a32, X):.2f} ms",
          flush=True)

    M_fn, m_args = make_ml_preconditioner(ml, f32=True)
    M_jit = jax.jit(M_fn)
    print(f"V-cycle apply: {timeit(jax, M_jit, m_args, X):.2f} ms",
          flush=True)

    # one full CG body iteration (apply + M + vector ops)
    def cg_body(a32, m_args, R, Z, P, Dx, rz):
        AP = A_fn(a32, P)
        pAp = jnp.sum(P * AP, axis=0)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        Dx = Dx + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = M_fn(m_args, R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        P = Z + beta[None, :] * P
        return R, Z, P, Dx, rz_new

    body_jit = jax.jit(cg_body)
    rz = jnp.ones(B, jnp.float32)

    def run_body(a32, m_args):
        return body_jit(a32, m_args, X, X, X, X, rz)

    print(f"CG body (A+M+vec):   "
          f"{timeit(jax, run_body, a32, m_args):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
