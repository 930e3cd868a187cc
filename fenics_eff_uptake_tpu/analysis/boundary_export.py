"""Per-facet boundary flux export (physical vs Robin) for ParaView.

Equivalent of the reference's ``export_boundary_flux_comparison``
(simulation.py:57-92): facet-averaged physical flux -D grad(c).n and Robin
flux mu*c along a marked boundary, written as CSV (x, flux) profiles and a
legacy-VTK polyline; the reference's DG0 projection becomes a direct
per-facet quadrature average (no projection solve needed).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..fem.space import Function
from ..meshing.mesh_data import MARKERS, MeshData
from .flux import boundary_quad

__all__ = ["export_boundary_flux_comparison"]


def export_boundary_flux_comparison(c: Function, mu, D, mesh: MeshData,
                                    output_dir, marker_id=None,
                                    u: Function = None):
    """Write per-facet flux profiles along the marked boundary.

    Returns dict with the per-facet arrays (midpoint x, physical, robin).
    """
    if marker_id is None:
        marker_id = MARKERS["bottom"]
    fq = boundary_quad(c.space, mesh.bc_marker == marker_id, degree=4)
    if fq is None:
        return None
    gq = fq.eval_grad(c.values)
    phys_density = -D * jnp.einsum("fqa,fa->fq", gq, fq.normal)
    if u is not None:
        uq = fq.eval_vector(u.values, u.space)
        un = jnp.einsum("fqa,fa->fq", uq, fq.normal)
        phys_density = phys_density + un * fq.eval(c.values)
    cq = fq.eval(c.values)
    if np.isscalar(mu):
        mu_q = float(mu) * cq
    else:
        mu_q = jnp.asarray(np.asarray(mu(fq.x[:, :, 0]))) * cq
    # facet averages (DG0-equivalent)
    qw = fq.qw
    phys = np.asarray(jnp.einsum("q,fq->f", qw, phys_density))
    robin = np.asarray(jnp.einsum("q,fq->f", qw, mu_q))
    xmid = fq.x.mean(axis=1)[:, 0]
    order = np.argsort(xmid)

    os.makedirs(output_dir, exist_ok=True)
    import pandas as pd
    df = pd.DataFrame({
        "x": xmid[order],
        "physical_flux": phys[order],
        "robin_flux": robin[order],
        "length": np.asarray(fq.length)[order],
    })
    df.to_csv(os.path.join(output_dir, "boundary_flux_comparison.csv"),
              index=False)

    # polyline VTK with flux as point data
    path = os.path.join(output_dir, "flux_bottom.vtk")
    pts = fq.x.mean(axis=1)[order]
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nboundary flux\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {len(pts)} double\n")
        for x, y in pts:
            f.write(f"{x:.16g} {y:.16g} 0\n")
        f.write(f"POINT_DATA {len(pts)}\n")
        f.write("SCALARS physical_flux double 1\nLOOKUP_TABLE default\n")
        for v in phys[order]:
            f.write(f"{v:.16g}\n")
        f.write("SCALARS robin_flux double 1\nLOOKUP_TABLE default\n")
        for v in robin[order]:
            f.write(f"{v:.16g}\n")
    return {"x": xmid[order], "physical": phys[order],
            "robin": robin[order]}
