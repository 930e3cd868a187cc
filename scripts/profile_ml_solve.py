"""Steady-state ML-preconditioned sweep timing on the real TPU.

Verifies the args-refactor: repeated solve_sweep calls (same and perturbed
mu batches) must reuse the compiled chunks (no re-trace / re-compile).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import time

import numpy as np

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system, solve_sweep)
    from fenics_eff_uptake_tpu.solvers.multilevel import build_multilevel
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25, sulcus_width=0.25,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    mids = [generate_mesh(mesh_size=max(3 * MESH_SIZE, 0.06), **kw),
            generate_mesh(mesh_size=max(9 * MESH_SIZE, 0.18), **kw)]
    print(f"cells fine={mesh.num_cells} mid={mids[0].num_cells} "
          f"coarse={mids[1].num_cells}", flush=True)

    t0 = time.time()
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)
    print(f"assembly: {time.time()-t0:.2f}s ndofs={sys_t.ndofs}",
          flush=True)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values() for f in r])[:20]
    D = np.ones_like(mus)

    # decompose the ml build
    from fenics_eff_uptake_tpu.solvers import multilevel as ml_mod
    t0 = time.time()
    lsys = [build_transport_system(m, element="P1", pad_shapes=False)
            for m in mids]
    jax.block_until_ready(lsys[0].K.A64)
    print(f"  level assemblies: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    tr0 = ml_mod._interp(sys_t.space.dof_coords, mids[0],
                         np.asarray(sys_t.free)[:len(
                             sys_t.space.dof_coords)])
    tr1 = ml_mod._interp(mids[0].vertices, mids[1],
                         np.asarray(lsys[0].free))
    print(f"  transfers (host): {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    ml = build_multilevel(sys_t, mids, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    print(f"ml build: {time.time()-t0:.2f}s nc={ml.Ainv.shape[1]}",
          flush=True)

    chunk = int(os.environ.get("BENCH_CHUNK", "50"))
    for trial, mvals in (("cold", mus), ("warm", mus),
                         ("perturbed", mus * 1.0000001),
                         ("warm2", mus)):
        t0 = time.time()
        X, info = solve_sweep(sys_t, D, mu_values=mvals, rtol=1e-11,
                              multilevel=ml, chunk_iters=chunk)
        jax.block_until_ready(X)
        print(f"solve [{trial}]: {time.time()-t0:.2f}s "
              f"iters={info['iters'].tolist()} "
              f"maxrel={info['rel_resnorm'].max():.2e}", flush=True)


if __name__ == "__main__":
    main()
