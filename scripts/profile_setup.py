"""Decompose the two-level setup + solve costs on the real TPU.

Stage timings for the bench workload so optimisation effort lands where
the time actually goes (round-2 perf work; see PERFORMANCE.md).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)
    import jax.numpy as jnp

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import build_transport_system
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    MESH_SIZE = 0.02
    t0 = time.time()
    mesh = generate_mesh(width=10.0, height=1.0, sulcus_depth=0.25,
                         sulcus_width=0.25, mesh_size=MESH_SIZE,
                         refinement_factor=1, domain_type="sulcus")
    coarse = generate_mesh(width=10.0, height=1.0, sulcus_depth=0.25,
                           sulcus_width=0.25, mesh_size=0.08,
                           refinement_factor=1, domain_type="sulcus")
    print(f"meshes: {time.time()-t0:.2f}s fine={mesh.num_cells} "
          f"coarse={coarse.num_cells}", flush=True)

    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)
    t0 = time.time()
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)
    print(f"assembly warm: {time.time()-t0:.2f}s ndofs={sys_t.ndofs}",
          flush=True)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values() for f in r])[:20]
    D = np.ones_like(mus)

    # ---- two-level setup decomposition ----
    from fenics_eff_uptake_tpu.solvers import twolevel as tl_mod

    t0 = time.time()
    csys = tl_mod.build_twolevel.__wrapped__ if False else None
    # replicate build_twolevel stage by stage
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system as bts)
    csys = bts(coarse, element="P1", pad_shapes=False)
    nc = csys.ndofs
    print(f"coarse assembly: {time.time()-t0:.2f}s nc={nc}", flush=True)

    t0 = time.time()

    def dense_of(block, A_e):
        M = np.zeros((nc, nc))
        dofs = np.asarray(block.dofs)
        Ae = np.asarray(A_e)
        for local in range(dofs.shape[1]):
            rows = dofs[:, local]
            for lj in range(dofs.shape[1]):
                np.add.at(M, (rows, dofs[:, lj]), Ae[:, local, lj])
        return M

    K_c = dense_of(csys.K, csys.K.A64)
    R_c = dense_of(csys.R, csys.R.A64)
    print(f"dense_of x2: {time.time()-t0:.2f}s", flush=True)

    free_c = np.asarray(csys.free)

    def constrain(A):
        A[~free_c, :] = 0.0
        A[:, ~free_c] = 0.0
        idx = np.flatnonzero(~free_c)
        A[idx, idx] = 1.0
        return A

    K_c = constrain(K_c)
    R_c = constrain(R_c)

    t0 = time.time()
    Ainvs = []
    for b in range(20):
        A = D[b] * K_c + mus[b] * R_c
        A = A + 1e-6 * np.abs(np.diag(A)).mean() * np.eye(nc)
        Ainvs.append(np.linalg.inv(A.astype(np.float32)))
    Astack = np.stack(Ainvs)
    print(f"20 host inverses: {time.time()-t0:.2f}s "
          f"({Astack.nbytes/1e6:.0f} MB)", flush=True)

    t0 = time.time()
    Ainv_dev = jnp.asarray(Astack)
    jax.block_until_ready(Ainv_dev)
    print(f"upload {Astack.nbytes/1e6:.0f}MB: {time.time()-t0:.2f}s",
          flush=True)

    t0 = time.time()
    from fenics_eff_uptake_tpu.solvers.twolevel import build_twolevel
    tl = build_twolevel(sys_t, coarse, D, mu_values=mus)
    jax.block_until_ready(tl.Ainv)
    print(f"full build_twolevel: {time.time()-t0:.2f}s", flush=True)

    # ---- per-iteration cost decomposition ----
    from fenics_eff_uptake_tpu.parallel.sweep import _batched_operator
    from fenics_eff_uptake_tpu.solvers.twolevel import make_preconditioner

    B = 20
    D_vec = jnp.asarray(D)
    mu_vec = jnp.asarray(mus)
    _, A32, diag = _batched_operator(sys_t, D_vec, mu_vec, None, f32=True)
    dinv = jnp.where(sys_t.free[:, None] & (diag != 0),
                     1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)
    M_fn, m_args = make_preconditioner(tl, dinv, f32=True)

    X = jnp.ones((sys_t.ndofs, B), jnp.float32)

    A_jit = jax.jit(A32)
    Y = A_jit(X)
    jax.block_until_ready(Y)
    t0 = time.time()
    for _ in range(20):
        Y = A_jit(Y)
    jax.block_until_ready(Y)
    ms_op = (time.time() - t0) / 20 * 1000
    print(f"operator apply: {ms_op:.1f} ms", flush=True)

    M_jit = jax.jit(M_fn)
    Z = M_jit(m_args, X)
    jax.block_until_ready(Z)
    t0 = time.time()
    for _ in range(20):
        Z = M_jit(m_args, Z)
    jax.block_until_ready(Z)
    ms_m = (time.time() - t0) / 20 * 1000
    print(f"preconditioner apply: {ms_m:.1f} ms", flush=True)

    # full CG chunk timing
    from fenics_eff_uptake_tpu.solvers.batched import _cg_chunk, _as_op
    A_pair = ((lambda a, Xv: A32(Xv)), ())
    A_fn, a_args = _as_op(A_pair)
    chunk = _cg_chunk(A_fn, M_fn, 100)
    R0 = X
    Z0 = M_jit(m_args, R0)
    rz = jnp.sum(R0 * Z0, axis=0)
    tol = jnp.zeros(B, jnp.float32)
    out = chunk(a_args, m_args, X, R0, Z0, Z0, rz, tol)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = chunk(a_args, m_args, *out[:5], tol)
    jax.block_until_ready(out[0])
    ms_chunk = (time.time() - t0) / 100 * 1000
    print(f"CG chunk: {ms_chunk:.1f} ms/iter "
          f"(components {ms_op + ms_m:.1f})", flush=True)


if __name__ == "__main__":
    main()
