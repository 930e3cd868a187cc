"""Time the MG transfer primitives (restrict/prolong/segment_sum) and
the additive-M apply on the real TPU, at bench shapes (~1e5 P2 dofs,
B=20).  Finds where the ~13 ms non-operator part of the CG iteration
goes."""
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
    os.environ.setdefault("FEU_ML_CYCLE", "add")
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)
    import jax.numpy as jnp

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system)
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, make_ml_preconditioner)
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, refinement_factor=1,
              domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    mids = [generate_mesh(mesh_size=max(3 * MESH_SIZE, 0.06), **kw),
            generate_mesh(mesh_size=max(9 * MESH_SIZE, 0.18), **kw)]
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)
    print("assembled", flush=True)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values()
                    for f in r])[:20]
    D = np.ones_like(mus)
    B = len(mus)
    ml = build_multilevel(sys_t, mids, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)

    lv0 = ml.levels[0]
    tr = lv0.transfer
    n = sys_t.ndofs
    nco = tr.n_coarse
    print(f"n={n} nc={nco} B={B}", flush=True)

    X = jnp.ones((n, B), jnp.float32)
    Xc = jnp.ones((nco, B), jnp.float32)
    t_w = jnp.asarray(tr.weights)
    t_cols = jnp.asarray(tr.cols)
    t_perm = jnp.asarray(tr.perm)
    t_ids = jnp.asarray(tr.ids_sorted)

    @jax.jit
    def restrict(t_w, t_perm, t_ids, R):
        contrib = t_w[:, :, None] * R[:, None, :]
        nn, _, BB = contrib.shape
        flat = contrib.reshape(nn * 3, BB)[t_perm]
        return jax.ops.segment_sum(flat, t_ids, num_segments=nco,
                                   indices_are_sorted=True)

    @jax.jit
    def prolong(t_w, t_cols, Xc):
        return jnp.einsum("nk,nkb->nb", t_w, Xc[t_cols],
                          preferred_element_type=Xc.dtype)

    @jax.jit
    def gather_only(t_perm, Y):
        return Y[t_perm]

    @jax.jit
    def segsum_only(t_ids, Yp):
        return jax.ops.segment_sum(Yp, t_ids, num_segments=nco,
                                   indices_are_sorted=True)

    Y = jnp.ones((n * 3, B), jnp.float32)
    print(f"restrict (fine->mid): {timeit(jax, restrict, t_w, t_perm, t_ids, X):.2f} ms",
          flush=True)
    print(f"prolong (mid->fine):  {timeit(jax, prolong, t_w, t_cols, Xc):.2f} ms",
          flush=True)
    print(f"gather perm (320k):   {timeit(jax, gather_only, t_perm, Y):.2f} ms",
          flush=True)
    print(f"segment_sum (320k):   {timeit(jax, segsum_only, t_ids, Y):.2f} ms",
          flush=True)

    # per-k restrict variant: three n-row sorted scatters, no (n,3,B)
    # intermediate materialisation
    cols_np = np.asarray(tr.cols)
    w_np = np.asarray(tr.weights)
    pks, iks, wks = [], [], []
    for k in range(3):
        order = np.argsort(cols_np[:, k], kind="stable")
        pks.append(jnp.asarray(order.astype(np.int32)))
        iks.append(jnp.asarray(cols_np[order, k].astype(np.int32)))
        wks.append(jnp.asarray(w_np[order, k]))
    pks, iks, wks = tuple(pks), tuple(iks), tuple(wks)

    @jax.jit
    def restrict_perk(pks, iks, wks, R):
        out = None
        for pk, ik, wk in zip(pks, iks, wks):
            c = jax.ops.segment_sum(wk[:, None] * R[pk], ik,
                                    num_segments=nco,
                                    indices_are_sorted=True)
            out = c if out is None else out + c
        return out

    print(f"restrict per-k:       "
          f"{timeit(jax, restrict_perk, pks, iks, wks, X):.2f} ms",
          flush=True)

    # dinv scale + axpy at fine shape, for reference
    dinv = lv0.dinv

    @jax.jit
    def scale_axpy(dinv, R, C):
        return 0.65 * dinv * R + C

    print(f"dinv scale+axpy:      {timeit(jax, scale_axpy, dinv, X, X):.2f} ms",
          flush=True)

    # the full additive M
    M_fn, m_args = make_ml_preconditioner(ml, f32=True)
    M_jit = jax.jit(M_fn)
    print(f"M additive apply:     {timeit(jax, M_jit, m_args, X):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
