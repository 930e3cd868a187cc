"""Stokes (MINRES+MG) wall-clock decomposition on the real TPU at the
no-uptake study scale (h=0.02 sulcus): setup vs iteration cost, and
warm re-solve cost for a second geometry-like call.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_SIZE = float(os.environ.get("BENCH_MESH_SIZE", "0.02"))


def main():
    from fenics_eff_uptake_tpu.utils.jaxconfig import setup
    jax = setup(x64=True)

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.models.stokes_flow import (stokes_solve,
                                                          stokes_solve_mg)

    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25,
              sulcus_width=0.25, mesh_size=MESH_SIZE,
              refinement_factor=1, domain_type="sulcus")
    mesh = generate_mesh(**kw)
    print(f"cells={mesh.num_cells}", flush=True)

    t0 = time.time()
    u, p = stokes_solve_mg(mesh, H=1.0)
    jax.block_until_ready(u.values)
    print(f"stokes cold (solver, no disk-cache replay): "
          f"{time.time()-t0:.1f}s iters={u.solver_info['outer_iters']}",
          flush=True)

    t0 = time.time()
    u, p = stokes_solve(mesh, H=1.0)
    jax.block_until_ready(u.values)
    print(f"stokes warm (same mesh, checkpoint path): "
          f"{time.time()-t0:.1f}s", flush=True)

    # further geometries (same size bucket): per-geometry cost in a
    # study process with warm compiled programs, disk cache BYPASSED
    for depth, width in ((0.5, 0.5), (0.8, 0.4)):
        kw2 = dict(kw, sulcus_depth=depth, sulcus_width=width)
        mesh2 = generate_mesh(**kw2)
        t0 = time.time()
        u2, p2 = stokes_solve_mg(mesh2, H=1.0)
        jax.block_until_ready(u2.values)
        print(f"stokes warm (new geometry, cells={mesh2.num_cells}): "
              f"{time.time()-t0:.1f}s "
              f"iters={u2.solver_info['outer_iters']}", flush=True)


if __name__ == "__main__":
    main()
