"""Stokes MINRES+MG wall-clock + iteration check on the real TPU at
study scale (h=0.02).  Calls stokes_solve_mg directly (bypasses the
solved-field disk cache; setup caches stay on).

Usage: python scripts/tpu_stokes_check.py [mesh_size] [depth] [width_s]
Env: FEU_STOKES_COARSE_P / FEU_STOKES_COARSE_SCALE as in production.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_SIZE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
DEPTH = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
WIDTH_S = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.models.stokes_flow import stokes_solve_mg

    kw = dict(width=10.0, height=1.0, sulcus_depth=DEPTH,
              sulcus_width=WIDTH_S, mesh_size=MESH_SIZE,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(**kw)
    print(f"backend={jax.default_backend()} cells={mesh.num_cells}",
          flush=True)

    t0 = time.time()
    u, p = stokes_solve_mg(mesh, H=1.0)
    jax.block_until_ready(u.values)
    i = u.solver_info
    print(f"cold: {time.time()-t0:.1f}s iters={i['outer_iters']} "
          f"resnorm={i['resnorm']:.2e} converged={i['converged']}",
          flush=True)

    t0 = time.time()
    u, p = stokes_solve_mg(mesh, H=1.0)
    jax.block_until_ready(u.values)
    i = u.solver_info
    print(f"warm: {time.time()-t0:.1f}s iters={i['outer_iters']} "
          f"resnorm={i['resnorm']:.2e} converged={i['converged']}",
          flush=True)


if __name__ == "__main__":
    main()
