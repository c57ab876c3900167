"""Golden regression locks: exact flagship numbers frozen in-repo.

These are femx's own goldens (the reference ships .docx artifacts as its
goldens, SURVEY.md §4); any silent numerical change in kernels, assembly,
solvers, or section properties trips these first.
"""

import numpy as np
import pytest

from femx.analysis import BeamAnalysis, SolidReactionAnalysis
from femx.mesh import box_tet10, cantilever_line_mesh, tet4_to_tet10

# Cantilever beam (rect 0.1x0.05, L=2, E=2e11, nu=0.3, rho=7850, Fy=-1000 at
# tip): nodally-exact static solution + lumped-mass modal spectrum.
GOLDEN_BEAM_TIP_UY = -0.012806240000000  # m
GOLDEN_BEAM_FREQS_HZ = [
    9.145550264377, 18.268565293454, 46.999628931779, 93.236573457980,
]


def test_beam_cantilever_golden():
    mesh = cantilever_line_mesh(length=2.0, n_elems=2)
    ba = BeamAnalysis(
        mesh,
        [{"group": "beam", "type": "rectangular section", "params": {"d": 0.1, "b": 0.05}}],
        [{"group": "fix", "type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True,
          "fix_rx": True, "fix_ry": True, "fix_rz": True},
         {"group": "load_y", "type": "Force", "force_x": 0.0, "force_y": -1000.0,
          "force_z": 0.0}],
        E=2e11, nu=0.3, rho=7850.0,
    )
    res = ba.run()
    assert res.u[6 * 1 + 1] == pytest.approx(GOLDEN_BEAM_TIP_UY, rel=1e-12)
    np.testing.assert_allclose(
        res.natural_frequencies_hz[:4], GOLDEN_BEAM_FREQS_HZ, rtol=1e-9
    )


# Solid box 0.4x0.2x0.4 @ 0.2, +3000 N at top center, 4 fixed corners:
# reactions at the two symmetry-distinct fix classes (dense solve, f64).
GOLDEN_SOLID_RY_SUM = -3000.0
GOLDEN_SOLID_MAX_U = 3.549918556056e-07  # m


def test_solid_box_golden():
    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0), (0.4, 0, 0.4)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False, solver="dense",
    )
    fa.run_simulation()
    ry = sum(fa.reaction_forces[3 * i["node_idx"] + 1] for i in fa.fixed_nodes_info)
    assert ry == pytest.approx(GOLDEN_SOLID_RY_SUM, rel=1e-11)
    assert np.abs(fa.u).max() == pytest.approx(GOLDEN_SOLID_MAX_U, rel=1e-9)


def test_tet4_to_tet10_promotion():
    """Utility parity: promoting the corner tets of a structured mesh
    reproduces a valid Tet10 mesh with shared midside nodes."""
    mesh = box_tet10(0.2, 0.2, 0.2, 0.1)
    conn4 = mesh.cells["tetra10"][:, :4]
    # build corner-only point set
    used = np.unique(conn4)
    remap = -np.ones(mesh.num_nodes, dtype=np.int64)
    remap[used] = np.arange(len(used))
    pts, conn10 = tet4_to_tet10(mesh.points[used], remap[conn4])
    assert conn10.shape == (len(conn4), 10)
    from femx.mesh.generators import TET10_EDGES

    for k, (a, b) in enumerate(TET10_EDGES):
        np.testing.assert_allclose(
            pts[conn10[:, 4 + k]],
            0.5 * (pts[conn10[:, a]] + pts[conn10[:, b]]),
            atol=1e-14,
        )
