"""Mass / region-average metrics (ref analysis.py:677-719)."""

from __future__ import annotations

import numpy as np

from ..fem.space import Function
from ..meshing.mesh_data import MeshData
from .integrals import integrate_cells

__all__ = ["compute_mass_metrics"]


def compute_mass_metrics(c: Function, mesh: MeshData, domain_type,
                         degree=4):
    """Total / per-region mass & averages; same keys as the reference."""
    per_cell = np.asarray(integrate_cells(c, degree))
    ones = Function(c.space, c.values * 0 + 1.0)
    area_cell = np.asarray(integrate_cells(ones, degree))
    if domain_type == "sulcus":
        sulc = mesh.cell_domain == 1
        rect = mesh.cell_domain == 2
        total_mass = float(per_cell.sum())
        total_area = float(area_cell.sum())
        sulcus_mass = float(per_cell[sulc].sum())
        rectangle_mass = float(per_cell[rect].sum())
        sulcus_area = float(area_cell[sulc].sum())
        rect_area = float(area_cell[rect].sum())
        return {
            "total_mass": total_mass,
            "sulcus_mass": sulcus_mass,
            "rectangle_mass": rectangle_mass,
            "total_area": total_area,
            "sulcus_area": sulcus_area,
            "rectangle_area": rect_area,
            "average_concentration": {
                "total": total_mass / total_area if total_area > 0 else None,
                "sulcus_region": (sulcus_mass / sulcus_area
                                  if sulcus_area > 0 else None),
                "rectangle_region": (rectangle_mass / rect_area
                                     if rect_area > 0 else None),
            },
        }
    total_mass = float(per_cell.sum())
    total_area = float(area_cell.sum())
    return {
        "total_mass": total_mass,
        "total_area": total_area,
        "average_concentration": (total_mass / total_area
                                  if total_area else 0.0),
    }
