"""General (unstructured) mesh end-to-end: a perturbed Tetra10 mesh round-
trips through .msh file I/O and solves via the gather-based operator path —
the route a real gmsh mesh takes (the reference's primary input,
ReactionSolver.py:59-73)."""

import io

import numpy as np
import pytest

from femx.analysis import SolidReactionAnalysis
from femx.mesh import box_tet10, read_msh, write_msh


def _perturbed_mesh():
    """Structured box with interior corner nodes jittered: genuinely
    unstructured geometry with valid (positive-detJ) elements."""
    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0), (0.4, 0, 0.4)])
    pts = mesh.points.copy()
    rng = np.random.default_rng(0)
    interior = (
        (pts[:, 0] > 1e-9) & (pts[:, 0] < 0.4 - 1e-9)
        & (pts[:, 1] > 1e-9) & (pts[:, 1] < 0.2 - 1e-9)
        & (pts[:, 2] > 1e-9) & (pts[:, 2] < 0.4 - 1e-9)
    )
    pts[interior] += rng.uniform(-0.015, 0.015, size=(interior.sum(), 3))
    # re-snap midside nodes to edge midpoints so elements stay valid Tet10
    conn = mesh.cells["tetra10"]
    from femx.mesh.generators import TET10_EDGES

    for k, (a, b) in enumerate(TET10_EDGES):
        pts[conn[:, 4 + k]] = 0.5 * (pts[conn[:, a]] + pts[conn[:, b]])
    mesh.points = pts
    mesh.structured = None  # forces the general gather-based path
    return mesh


def test_unstructured_roundtrip_and_solve():
    mesh = _perturbed_mesh()
    buf = io.StringIO()
    write_msh(buf, mesh)
    mesh2 = read_msh(buf.getvalue())
    assert mesh2.structured is None

    fa = SolidReactionAnalysis(
        mesh2,
        [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False, solver="cg", cg_tol=1e-11,
    )
    fa.run_simulation()
    assert fa.solve_info["method"] == "block_jacobi_pcg"  # general path
    assert fa.negative_detJ_count == 0
    assert np.abs(fa.equilibrium_residual()).max() < 1e-7
    # perturbation breaks symmetry but reactions still resist the +y load
    for info in fa.fixed_nodes_info:
        assert fa.reaction_forces[3 * info["node_idx"] + 1] < 0
