"""Profile the WARM build_multilevel floor (bench's t_tl_warm stage).

Round-3: the warm MG build (~0.95 s) is the largest bench component;
decompose it with FEU_TIMING and wall-repeat stats to see whether the
cost is host plan/cache reads, the NS coarse stage, or payload refresh.
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

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import build_transport_system
    from fenics_eff_uptake_tpu.solvers.multilevel import build_multilevel
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))
    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25, sulcus_width=0.25,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    aux = [mesh,
           generate_mesh(mesh_size=max(3 * MESH_SIZE, 0.06), **kw),
           generate_mesh(mesh_size=max(9 * MESH_SIZE, 0.18), **kw)]
    # mirror bench.py's FEU_ML_NESTED handling so the profiled hierarchy
    # matches the bench stage it decomposes (bench.py:53-54)
    if os.environ.get("FEU_ML_NESTED", "1") != "1":
        aux = aux[1:]
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values() for f in r])[:20]
    D = np.ones_like(mus)

    # cold (in-process) build
    t0 = time.time()
    ml = build_multilevel(sys_t, aux, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    print(f"build[cold-process]: {time.time()-t0:.3f}s", flush=True)

    # one instrumented build OUTSIDE the timed loop: FEU_TIMING inserts
    # block_until_ready sync points inside build_multilevel that inflate
    # the measured wall time, so the warm repeats below all run clean
    os.environ["FEU_TIMING"] = "1"
    t0 = time.time()
    ml = build_multilevel(sys_t, aux, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    print(f"build[instrumented]: {time.time()-t0:.3f}s", flush=True)
    os.environ["FEU_TIMING"] = "0"

    for rep in range(4):
        t0 = time.time()
        ml = build_multilevel(sys_t, aux, D, mu_values=mus)
        jax.block_until_ready(ml.Ainv)
        print(f"build[warm {rep}]: {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
