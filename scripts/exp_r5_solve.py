"""Round-5 solve-knob matrix on the TPU: steady solve_sweep wall-clock,
pass counts and iterations under {cycle, bf16, inner_rtol} combinations,
to pick the BENCH_r05 configuration."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))
REPS = int(os.environ.get("REPS", "4"))


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import (
        build_transport_system, solve_sweep)
    from fenics_eff_uptake_tpu.solvers.multilevel import (
        build_multilevel, level_meshes_for)
    from fenics_eff_uptake_tpu.studies.phase_a import MU_SWEEP_REGIMES

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, refinement_factor=1,
              domain_type="sulcus")
    mesh = generate_mesh(mesh_size=MESH_SIZE, **kw)
    lm = level_meshes_for(mesh)
    sys_t = build_transport_system(mesh, element="P2")
    jax.block_until_ready(sys_t.K.A64)

    mus = np.array([f for r in MU_SWEEP_REGIMES.values()
                    for f in r])[:20]
    D = np.ones_like(mus)
    ml = build_multilevel(sys_t, lm, D, mu_values=mus)
    jax.block_until_ready(ml.Ainv)
    print(f"ndofs={sys_t.ndofs} B={len(mus)}", flush=True)

    configs = [
        ("default", {}),
        ("inner1e-5", {"FEU_INNER_RTOL": "1e-5"}),
        ("inner3e-6", {"FEU_INNER_RTOL": "3e-6"}),
        ("bf16", {"FEU_ML_BF16": "1"}),
        ("hybrid", {"FEU_ML_CYCLE": "hybrid"}),
        ("hybrid+bf16", {"FEU_ML_CYCLE": "hybrid", "FEU_ML_BF16": "1"}),
        ("hybrid+inner1e-5", {"FEU_ML_CYCLE": "hybrid",
                              "FEU_INNER_RTOL": "1e-5"}),
        ("bf16+inner1e-5", {"FEU_ML_BF16": "1",
                            "FEU_INNER_RTOL": "1e-5"}),
    ]
    keys = ["FEU_INNER_RTOL", "FEU_ML_CYCLE", "FEU_ML_BF16"]
    for name, env in configs:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        best = None
        for rep in range(REPS):
            t0 = time.time()
            X, info = solve_sweep(sys_t, D,
                                  mu_values=mus * (1 + 1e-7 * rep),
                                  rtol=1e-11, multilevel=ml,
                                  chunk_iters=50)
            jax.block_until_ready(X)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:20s} solve={best:.3f}s iters={int(info['iters'].max())} "
              f"passes={info.get('passes')} "
              f"maxrel={info['rel_resnorm'].max():.2e}", flush=True)
    for k in keys:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
