"""Mesh/marker/facet-normal visualisation exports.

Equivalent of the reference's ``save_mesh_pvd_files`` (mesh.py:600-713):
mesh + domain markers, boundary facets per marker set, and outward unit
facet normals per marker id -- as legacy VTK (lines with per-cell marker
ids; normals as point vectors at facet midpoints).  The reference computes
normals by solving a boundary mass-matrix system per marker
(mesh.py:603-637); ours are exact per-facet normals from the CCW cell
orientation, no solve needed.
"""

from __future__ import annotations

import os

import numpy as np

from .mesh_data import MARKERS, MeshData

__all__ = ["save_mesh_visualization"]


def _write_vtk_lines(path, points, lines, cell_data, title):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# vtk DataFile Version 3.0\n{title}\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {len(points)} double\n")
        for x, y in points:
            f.write(f"{x:.16g} {y:.16g} 0\n")
        f.write(f"LINES {len(lines)} {3 * len(lines)}\n")
        for a, b in lines:
            f.write(f"2 {a} {b}\n")
        if cell_data:
            f.write(f"CELL_DATA {len(lines)}\n")
            for name, arr in cell_data.items():
                f.write(f"SCALARS {name} int 1\nLOOKUP_TABLE default\n")
                for v in arr:
                    f.write(f"{int(v)}\n")


def _facet_normals(mesh: MeshData):
    """Outward unit normals per boundary facet (CCW convention)."""
    e = mesh.boundary.edges
    v = mesh.vertices
    d = v[e[:, 1]] - v[e[:, 0]]
    lens = np.linalg.norm(d, axis=1)
    return np.stack([d[:, 1], -d[:, 0]], axis=1) / np.maximum(
        lens[:, None], 1e-300)


def save_mesh_visualization(mesh: MeshData, out_dir):
    """Write mesh + markers + per-marker facet normals under out_dir."""
    from ..utils.vtk import write_vtk_mesh
    os.makedirs(out_dir, exist_ok=True)
    normals_dir = os.path.join(out_dir, "normals")
    os.makedirs(normals_dir, exist_ok=True)

    prefix = "sulcus" if mesh.domain_type == "sulcus" else "rect"
    write_vtk_mesh(os.path.join(out_dir, f"{prefix}_mesh.vtk"), mesh,
                   cell_data={"domain": mesh.cell_domain},
                   title="mesh + domain markers")

    marker_sets = {"bc_markers": mesh.bc_marker}
    if mesh.domain_type == "sulcus":
        marker_sets["bottom_markers"] = mesh.bottom_marker
        marker_sets["y0_markers"] = mesh.y0_marker
    for name, arr in marker_sets.items():
        _write_vtk_lines(
            os.path.join(out_dir, f"{prefix}_{name}.vtk"),
            mesh.vertices, mesh.boundary.edges,
            {"marker": arr}, name)

    # per-marker-id facet normals (midpoint + unit normal vector)
    normals = _facet_normals(mesh)
    mids = 0.5 * (mesh.vertices[mesh.boundary.edges[:, 0]]
                  + mesh.vertices[mesh.boundary.edges[:, 1]])
    id_to_name = {v: k for k, v in MARKERS.items()}
    for name, arr in marker_sets.items():
        for marker_id in np.unique(arr):
            if marker_id == 0:
                continue
            sel = arr == marker_id
            label = id_to_name.get(int(marker_id), str(marker_id))
            path = os.path.join(normals_dir,
                                f"normals_{label}_id{marker_id}.vtk")
            with open(path, "w") as f:
                f.write(f"# vtk DataFile Version 3.0\nnormals {label}\n"
                        "ASCII\nDATASET POLYDATA\n")
                f.write(f"POINTS {sel.sum()} double\n")
                for x, y in mids[sel]:
                    f.write(f"{x:.16g} {y:.16g} 0\n")
                f.write(f"POINT_DATA {sel.sum()}\n")
                f.write("VECTORS normal double\n")
                for nx, ny in normals[sel]:
                    f.write(f"{nx:.16g} {ny:.16g} 0\n")
    return out_dir
