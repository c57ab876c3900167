"""femx.mesh — mesh data model, Gmsh .msh I/O, and generators."""

from femx.mesh.core import (
    Mesh,
    nearest_node,
    nodes_in_physical_group,
    GMSH_TYPE_TO_NAME,
    NODES_PER_CELL,
)
from femx.mesh.msh_io import read_msh, write_msh
from femx.mesh.generators import (
    FrameBuilder,
    box_tet10,
    box_tet10_from_cells,
    cantilever_line_mesh,
    tet4_to_tet10,
    TET10_EDGES,
)

__all__ = [
    "Mesh",
    "nearest_node",
    "nodes_in_physical_group",
    "GMSH_TYPE_TO_NAME",
    "NODES_PER_CELL",
    "read_msh",
    "write_msh",
    "FrameBuilder",
    "box_tet10",
    "box_tet10_from_cells",
    "cantilever_line_mesh",
    "tet4_to_tet10",
    "TET10_EDGES",
]
