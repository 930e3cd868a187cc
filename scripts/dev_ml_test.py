"""Dev check: multilevel-preconditioned sweep == Jacobi sweep (CPU)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system, solve_sweep)
    from fenics_eff_uptake_tpu.solvers.multilevel import build_multilevel

    h = float(os.environ.get("ML_H", "0.08"))
    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25, sulcus_width=0.25,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(mesh_size=h, **kw)
    mids = [generate_mesh(mesh_size=3 * h, **kw),
            generate_mesh(mesh_size=9 * h, **kw)]
    print(f"fine cells={mesh.num_cells}, mid={mids[0].num_cells}, "
          f"coarse={mids[1].num_cells}")

    sys_t = build_transport_system(mesh, element="P2", pad_shapes=False)
    mus = np.array([0.1, 1.0, 10.0, 150.0])
    D = np.ones_like(mus)

    t0 = time.time()
    ml = build_multilevel(sys_t, mids, D, mu_values=mus)
    print(f"ml build: {time.time()-t0:.2f}s  nc={ml.Ainv.shape[1]}")

    t0 = time.time()
    X_ml, info_ml = solve_sweep(sys_t, D, mu_values=mus, rtol=1e-12,
                                precision="f64", multilevel=ml,
                                chunk_iters=10, maxiter=2000)
    print(f"ML solve: {time.time()-t0:.1f}s iters={info_ml['iters']} "
          f"resnorm={info_ml['resnorm']}")

    t0 = time.time()
    X_j, info_j = solve_sweep(sys_t, D, mu_values=mus, rtol=1e-12,
                              precision="f64", chunk_iters=200,
                              maxiter=20000)
    print(f"Jacobi solve: {time.time()-t0:.1f}s iters={info_j['iters']}")

    err = np.max(np.abs(np.asarray(X_ml) - np.asarray(X_j)))
    print(f"max |X_ml - X_jacobi| = {err:.3e}")
    assert err < 1e-8, err

    # mixed precision path
    X_m, info_m = solve_sweep(sys_t, D, mu_values=mus, rtol=1e-11,
                              precision="mixed", multilevel=ml,
                              chunk_iters=10, maxiter=2000)
    err = np.max(np.abs(np.asarray(X_m) - np.asarray(X_j)))
    print(f"mixed: iters={info_m['iters']} max err={err:.3e}")
    assert err < 1e-7, err
    print("OK")


if __name__ == "__main__":
    main()
