import numpy as np
from femx.analysis import SolidReactionAnalysis
from femx.mesh import box_tet10_from_cells


def test_solve_cases_matches_individual_runs():
    cells = (4, 4, 8)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    def force(fy, fx=0.0):
        return [{"force_x": fx, "force_y": fy, "force_z": 0,
                 "force_x_pstn": cells[0] * h / 2,
                 "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]
    fa = SolidReactionAnalysis(mesh, force(-500.0), fixes, E=2e11, v=0.3,
                               verbose=False, cg_tol=1e-10)
    fa.run_simulation()
    U = fa.solve_cases([force(-500.0), force(-1000.0), force(300.0, fx=200.0)])
    assert U.shape[0] == 3
    assert all(i["converged"] for i in fa.case_solve_info)
    # case 0 equals the single solve; case 1 is its double (linearity)
    scale = np.abs(fa.u).max()
    np.testing.assert_allclose(U[0], fa.u, atol=scale * 1e-8)
    np.testing.assert_allclose(U[1], 2.0 * U[0], atol=scale * 1e-8)
    # independent run for case 2
    fa2 = SolidReactionAnalysis(mesh, force(300.0, fx=200.0), fixes,
                                E=2e11, v=0.3, verbose=False, cg_tol=1e-10)
    fa2.run_simulation()
    np.testing.assert_allclose(U[2], fa2.u, atol=np.abs(fa2.u).max() * 1e-8)


def test_solve_cases_unstructured():
    cells = (3, 3, 6)
    h = 0.05
    mesh0 = box_tet10_from_cells(cells, (h, h, h))
    rng = np.random.default_rng(3)
    relabel = rng.permutation(mesh0.num_nodes)
    pts = np.empty_like(mesh0.points)
    pts[relabel] = mesh0.points
    conn = relabel[np.asarray(mesh0.cells["tetra10"])]
    from femx.mesh.core import Mesh as FMesh
    umesh = FMesh(points=pts, cells={"tetra10": conn},
                  cell_physical={"tetra10": np.ones(len(conn), np.int32)},
                  field_data={"box": (1, 3)})
    zmax = float(pts[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    def force(fy):
        return [{"force_x": 0, "force_y": fy, "force_z": 0,
                 "force_x_pstn": cells[0] * h / 2,
                 "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]
    fa = SolidReactionAnalysis(umesh, force(-100.0), fixes, E=2e11, v=0.3,
                               verbose=False, cg_tol=1e-10)
    fa.run_simulation()
    U = fa.solve_cases([force(-100.0), force(250.0)])
    scale = np.abs(fa.u).max()
    np.testing.assert_allclose(U[0], fa.u, atol=scale * 1e-8)
    np.testing.assert_allclose(U[1], -2.5 * U[0], atol=scale * 1e-8)


def test_solve_cases_distributed_structured():
    """solve_cases after a devices=N analysis routes through the distributed
    solver built by solve() (round-4 composition): results must match the
    single-device solve_cases to solver precision."""
    import jax

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs a multi-device mesh (tests/conftest.py)")
    cells = (4, 4, 8)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]

    def force(fy, fx=0.0):
        return [{"force_x": fx, "force_y": fy, "force_z": 0,
                 "force_x_pstn": cells[0] * h / 2,
                 "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]

    cases = [force(-500.0), force(-1000.0), force(300.0, fx=200.0)]
    fa_d = SolidReactionAnalysis(mesh, force(-500.0), fixes, E=2e11, v=0.3,
                                 verbose=False, cg_tol=1e-10, devices=4)
    fa_d.run_simulation()
    assert fa_d.solve_info.get("devices") == 4, fa_d.solve_info
    Ud = fa_d.solve_cases(cases)
    assert all(i["converged"] for i in fa_d.case_solve_info)

    fa_1 = SolidReactionAnalysis(mesh, force(-500.0), fixes, E=2e11, v=0.3,
                                 verbose=False, cg_tol=1e-10)
    fa_1.run_simulation()
    U1 = fa_1.solve_cases(cases)
    scale = np.abs(U1).max()
    np.testing.assert_allclose(Ud, U1, atol=scale * 1e-7)
    # linearity within the distributed results themselves
    np.testing.assert_allclose(Ud[1], 2.0 * Ud[0], atol=scale * 1e-7)
