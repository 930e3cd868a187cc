"""Gmsh MSH v2 (ASCII) reader/writer -- the mesh-ingestion contract.

The reference generates meshes by writing a .geo and shelling out to Gmsh,
then converting .msh -> legacy dolfin XML via meshio (mesh.py:350-391).
This module replaces BOTH external dependencies with an own parser: a user
holding the reference's Gmsh artifacts can ingest the *same* triangulations
directly (SURVEY.md 7.1: "mesh ingestion -> device arrays is the contract");
the writer round-trips our own meshes for interchange.

Only what the study needs is supported: 2-D nodes (z stripped like the
reference's converter), element type 2 (3-node triangles); other element
types (points, lines) are skipped for connectivity but line elements'
physical tags are retained for optional boundary identification.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import native
from .geometry import SulcusGeometry
from .markers import build_mesh_data
from .mesh_data import MeshData, orient_ccw

__all__ = ["read_msh2", "write_msh2", "mesh_from_msh2"]


def read_msh2(path):
    """Parse an ASCII MSH 2.x file; returns dict with nodes/triangles/lines.

    Node ids are remapped to contiguous 0-based indices.  Large meshes go
    through the native C++ parser (native/meshkernel.cpp feu_msh2_parse,
    ~12x the Python throughput); the pure-Python path below is the fallback
    and the behavioural spec (FEU_NATIVE_MSHIO=0 forces it).
    """
    if os.environ.get("FEU_NATIVE_MSHIO", "1") != "0":
        data = native.read_msh2_native(path)
        if data is not None:
            return data
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    nodes = {}
    tris = []
    tri_tags = []
    segs = []
    seg_tags = []
    version = None
    while i < len(lines):
        line = lines[i].strip()
        if line == "$MeshFormat":
            version = lines[i + 1].split()[0]
            if not version.startswith("2"):
                raise ValueError(f"unsupported MSH version {version} "
                                 "(only 2.x ASCII)")
            i += 3
        elif line == "$Nodes":
            count = int(lines[i + 1])
            for k in range(count):
                parts = lines[i + 2 + k].split()
                # z stripped (ref mesh.py:380-382)
                nodes[int(parts[0])] = (float(parts[1]), float(parts[2]))
            i += count + 3
        elif line == "$Elements":
            count = int(lines[i + 1])
            for k in range(count):
                parts = lines[i + 2 + k].split()
                etype = int(parts[1])
                ntags = int(parts[2])
                tags = [int(t) for t in parts[3:3 + ntags]]
                conn = [int(v) for v in parts[3 + ntags:]]
                if etype == 2:       # 3-node triangle
                    tris.append(conn)
                    tri_tags.append(tags[0] if tags else 0)
                elif etype == 1:     # 2-node line
                    segs.append(conn)
                    seg_tags.append(tags[0] if tags else 0)
            i += count + 3
        else:
            i += 1
    if not nodes:
        raise ValueError(f"no $Nodes section found in {path}")
    ids = sorted(nodes)
    remap = {nid: j for j, nid in enumerate(ids)}
    vertices = np.array([nodes[nid] for nid in ids], dtype=np.float64)
    cells = np.array([[remap[v] for v in t] for t in tris],
                     dtype=np.int64) if tris else np.zeros((0, 3), np.int64)
    lines_arr = np.array([[remap[v] for v in s] for s in segs],
                         dtype=np.int64) if segs else np.zeros((0, 2),
                                                              np.int64)
    return {
        "vertices": vertices,
        "triangles": cells,
        "triangle_tags": np.asarray(tri_tags, dtype=np.int64),
        "lines": lines_arr,
        "line_tags": np.asarray(seg_tags, dtype=np.int64),
        "version": version,
    }


def write_msh2(path, vertices, cells):
    """Write an ASCII MSH 2.2 file (triangles only)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(vertices)}\n")
        for i, (x, y) in enumerate(vertices, start=1):
            f.write(f"{i} {x:.16g} {y:.16g} 0\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{len(cells)}\n")
        for i, c in enumerate(cells, start=1):
            f.write(f"{i} 2 2 0 1 {c[0] + 1} {c[1] + 1} {c[2] + 1}\n")
        f.write("$EndElements\n")


def mesh_from_msh2(path, geom: SulcusGeometry,
                   domain_type="sulcus") -> MeshData:
    """Ingest a Gmsh MSH2 triangulation and mark it with the reference's
    marker scheme -- the geometry parameters tell the marker predicates
    where the mouth/corners are (identical predicates to our own meshes)."""
    data = read_msh2(path)
    cells = orient_ccw(data["vertices"], data["triangles"])
    return build_mesh_data(data["vertices"], cells, geom, domain_type)
