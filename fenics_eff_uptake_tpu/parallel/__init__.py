"""Sweep batching + device-mesh sharding (the framework's parallel axes)."""

from .sharding import build_sharded_mu_sweep, make_device_mesh
from .sweep import (build_transport_system, robin_matrices_for_mu,
                    solve_sweep)
