"""Pre-warm the persistent setup cache (utils/diskcache.py) for a
workload, off the TPU: builds the transport system (RCM/band plans) and
the multigrid transfer data on the CPU backend.  The cache entries are
content-addressed on host arrays, so a subsequent TPU run of the same
workload (e.g. bench.py) skips the host point-location work.

Usage: python scripts/warm_setup_cache.py [mesh_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    # force the windowed-band transfer PLANS to build (host arrays,
    # backend-independent) so the TPU run hits the tbandplan cache
    os.environ.setdefault("FEU_ML_TBAND", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from fenics_eff_uptake_tpu.meshing.generator import generate_mesh
    from fenics_eff_uptake_tpu.parallel.sweep import build_transport_system
    from fenics_eff_uptake_tpu.solvers.multilevel import (CACHE_STATS,
                                                          build_multilevel)

    mesh_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    kw = dict(width=10.0, height=1.0, sulcus_depth=0.25, sulcus_width=0.25,
              refinement_factor=1, domain_type="sulcus")
    t0 = time.time()
    mesh = generate_mesh(mesh_size=mesh_size, **kw)
    mids = [generate_mesh(mesh_size=max(3 * mesh_size, 0.06), **kw),
            generate_mesh(mesh_size=max(9 * mesh_size, 0.18), **kw)]
    # mirror the TPU default: shape-bucketed (banded) system
    sys_t = build_transport_system(mesh, element="P2", pad_shapes=True)
    B = 20
    build_multilevel(sys_t, mids, np.ones(B), mu_values=np.ones(B))
    print(f"warmed in {time.time() - t0:.1f}s; transfer cache "
          f"hits={CACHE_STATS['hits']} misses={CACHE_STATS['misses']}")


if __name__ == "__main__":
    main()
