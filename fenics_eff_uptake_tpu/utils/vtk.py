"""Minimal legacy-VTK writers for ParaView visualisation.

Replaces the reference's dolfin ``File(...pvd) <<`` exports
(ref mesh.py:600-713, simulation.py:137-138,165) with plain ASCII legacy
.vtk files (readable by ParaView without a .pvd wrapper).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["write_vtk_mesh", "write_vtk_point_scalar", "write_vtk_point_vector",
           "write_vtk_cell_scalar"]


def _header(f, title):
    f.write("# vtk DataFile Version 3.0\n")
    f.write(f"{title}\n")
    f.write("ASCII\n")
    f.write("DATASET UNSTRUCTURED_GRID\n")


def _write_grid(f, vertices, cells):
    V = len(vertices)
    T = len(cells)
    f.write(f"POINTS {V} double\n")
    for x, y in vertices:
        f.write(f"{x:.16g} {y:.16g} 0\n")
    f.write(f"CELLS {T} {4 * T}\n")
    for c in cells:
        f.write(f"3 {c[0]} {c[1]} {c[2]}\n")
    f.write(f"CELL_TYPES {T}\n")
    f.write("5\n" * T)


def write_vtk_mesh(path, mesh, cell_data=None, title="mesh"):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        _header(f, title)
        _write_grid(f, mesh.vertices, mesh.cells)
        if cell_data:
            f.write(f"CELL_DATA {len(mesh.cells)}\n")
            for name, arr in cell_data.items():
                f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                for v in np.asarray(arr, dtype=float):
                    f.write(f"{v:.16g}\n")


def _vertex_values(fn):
    """Vertex-dof values of a P1/P2 Function (first V scalar dofs)."""
    V = len(fn.space.mesh.vertices)
    vals = np.asarray(fn.values)
    if fn.space.vs == 1:
        return vals[:V]
    return np.stack([vals[0::2][:V], vals[1::2][:V]], axis=1)


def write_vtk_point_scalar(path, fn, name="c", title="field"):
    mesh = fn.space.mesh
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vals = _vertex_values(fn)
    with open(path, "w") as f:
        _header(f, title)
        _write_grid(f, mesh.vertices, mesh.cells)
        f.write(f"POINT_DATA {len(mesh.vertices)}\n")
        f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
        for v in vals:
            f.write(f"{v:.16g}\n")


def write_vtk_point_vector(path, fn, name="u", title="field"):
    mesh = fn.space.mesh
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vals = _vertex_values(fn)
    with open(path, "w") as f:
        _header(f, title)
        _write_grid(f, mesh.vertices, mesh.cells)
        f.write(f"POINT_DATA {len(mesh.vertices)}\n")
        f.write(f"VECTORS {name} double\n")
        for vx, vy in vals:
            f.write(f"{vx:.16g} {vy:.16g} 0\n")


def write_vtk_cell_scalar(path, mesh, arr, name="marker", title="markers"):
    write_vtk_mesh(path, mesh, cell_data={name: arr}, title=title)
