"""femx — TPU-native structural finite-element framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the reference desktop app
``euler8511/FEM-calculator`` (3D Timoshenko frame analysis + 3D solid Tetra10
elasticity with reaction recovery, modal analysis, section properties, mesh
I/O, reports) designed TPU-first: batched/vmapped element kernels, scatter-add
assembly, matrix-free preconditioned CG, and `shard_map` element/DOF sharding
over a `jax.sharding.Mesh`.

Import side effect: enables float64 (``jax_enable_x64``) — structural FEM
conditioning (E ~ 2e11 Pa vs displacements ~1e-3 m) requires it on the
host path; single-precision paths are explicit opt-ins on TPU.
"""

from femx import config as config  # noqa: F401  (enables x64 at import)

from femx.config import ReferenceCompat, default_dtype, set_default_dtype
from femx.mesh import (
    FrameBuilder,
    Mesh,
    box_tet10,
    box_tet10_from_cells,
    cantilever_line_mesh,
    nodes_in_physical_group,
    read_msh,
    write_msh,
)
from femx.sections import calculate_section_properties, compute_properties, SectionProperties
from femx.analysis import (
    BeamAnalysis,
    ForceAnalysis,
    PipeThermalAnalysis,
    PlaneAnalysis,
    ShaftModalAnalysis,
    SolidReactionAnalysis,
)

__version__ = "0.1.0"

__all__ = [
    "ReferenceCompat",
    "default_dtype",
    "set_default_dtype",
    "Mesh",
    "FrameBuilder",
    "read_msh",
    "write_msh",
    "box_tet10",
    "box_tet10_from_cells",
    "cantilever_line_mesh",
    "nodes_in_physical_group",
    "calculate_section_properties",
    "compute_properties",
    "SectionProperties",
    "BeamAnalysis",
    "SolidReactionAnalysis",
    "ForceAnalysis",
    "PlaneAnalysis",
    "PipeThermalAnalysis",
    "ShaftModalAnalysis",
]
