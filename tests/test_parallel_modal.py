"""Distributed solid modal (femx.parallel.modal): frequencies from the
8-virtual-device shift-invert Lanczos must match the single-device solver
to inner-solve accuracy (identical recurrence; only the inner K-solve is
distributed)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from femx.assembly_structured import StructuredSolidOperator
from femx.mesh import box_tet10_from_cells
from femx.modal import modal_shift_invert
from femx.parallel.halo import DistributedMultigrid
from femx.parallel.modal import modal_shift_invert_halo
from femx.solve.cg import pcg
from femx.solve.multigrid import StructuredMultigrid


def test_distributed_modal_matches_single_device():
    cells = (4, 4, 16)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    op = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float64)
    mask = np.ones(op.ndof)
    for n in np.where(mesh.points[:, 2] < 1e-9)[0]:
        mask[3 * n:3 * n + 3] = 0
    op = op.with_free_mask(op.to_internal(mask))
    mg = StructuredMultigrid(None, cells, 2e11, 0.3, mask,
                             spacing=(h, h, h), dtype=np.float64, fine_op=op)
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    dmg = DistributedMultigrid(mg, dmesh)

    m_int = op.lumped_mass_diagonal(7850.0)
    n_modes = 4

    res_d = modal_shift_invert_halo(
        dmg, m_int, op.free_mask, n_modes=n_modes, tol=1e-8, maxiter=60,
        inner_tol=1e-10)

    @jax.jit
    def k_solve(b):
        return pcg(op.apply_constrained, b, M_inv_diag=mg,
                   tol=1e-10, maxiter=2000).x

    res_1 = modal_shift_invert(k_solve, m_int, op.free_mask,
                               n_modes=n_modes, tol=1e-8, maxiter=60)

    w_d = np.asarray(res_d.omega)
    w_1 = np.asarray(res_1.omega)
    assert w_d.shape == (n_modes,) and np.all(w_d > 0)
    np.testing.assert_allclose(w_d, w_1, rtol=1e-6)

    # mode shapes: mass-orthonormal and matching up to sign
    md = np.asarray(res_d.modes)
    m1 = np.asarray(res_1.modes)
    G = md.T @ (np.asarray(m_int)[:, None] * md)
    np.testing.assert_allclose(G, np.eye(n_modes), atol=1e-6)
    for j in range(n_modes):
        c = float(md[:, j] @ (np.asarray(m_int) * m1[:, j]))
        np.testing.assert_allclose(abs(c), 1.0, atol=1e-5)


def test_pipeline_modal_devices():
    """SolidReactionAnalysis(devices=N).modal() uses the distributed inner
    solver and matches the single-device pipeline modal frequencies."""
    from femx.analysis import SolidReactionAnalysis

    cells = (4, 4, 16)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": cells[0] * h / 2,
               "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]

    def run(devices=None):
        fa = SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                                   verbose=False, devices=devices,
                                   cg_tol=1e-10)
        fa.run_simulation()
        return fa.modal(n_modes=3, tol=1e-7, inner_tol=1e-9)

    m1 = run()
    md = run(devices=8)
    np.testing.assert_allclose(np.asarray(md.omega), np.asarray(m1.omega),
                               rtol=1e-5)


def test_pipeline_modal_devices_unstructured():
    """modal(devices=N) on an UNSTRUCTURED mesh runs distributed
    lattice-MG inner solves and matches the single-device frequencies."""
    from femx.analysis import SolidReactionAnalysis
    from femx.mesh.core import Mesh as FMesh

    cells = (4, 4, 16)
    h = 0.1
    mesh0 = box_tet10_from_cells(cells, (h, h, h))
    rng = np.random.default_rng(13)
    relabel = rng.permutation(mesh0.num_nodes)
    pts = np.empty_like(mesh0.points)
    pts[relabel] = mesh0.points
    conn = relabel[np.asarray(mesh0.cells["tetra10"])]
    umesh = FMesh(points=pts, cells={"tetra10": conn},
                  cell_physical={"tetra10": np.ones(len(conn), np.int32)},
                  field_data={"box": (1, 3)})
    zmax = float(pts[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": cells[0] * h / 2,
               "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]

    def run(devices=None):
        fa = SolidReactionAnalysis(umesh, forces, fixes, E=2e11, v=0.3,
                                   verbose=False, devices=devices,
                                   cg_tol=1e-8)
        fa.run_simulation()
        return fa.modal(n_modes=3, tol=1e-7, inner_tol=1e-9)

    m1 = run()
    md = run(devices=8)
    np.testing.assert_allclose(np.asarray(md.omega), np.asarray(m1.omega),
                               rtol=1e-5)


def test_pipeline_modal_devices_refine_bounds():
    """modal(refine=True) composes with devices=N (round 4): the distributed
    path runs the inverse-iteration + Rayleigh-Ritz refinement through
    distributed accurate solves, stores per-mode Ritz error bounds, and the
    refined frequencies match the single-device refined path tightly."""
    from femx.analysis import SolidReactionAnalysis

    cells = (4, 4, 16)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": cells[0] * h / 2,
               "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]

    def run(devices=None):
        fa = SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                                   verbose=False, devices=devices,
                                   cg_tol=1e-10)
        fa.run_simulation()
        res = fa.modal(n_modes=3, tol=1e-7, inner_tol=1e-9, refine=True)
        return res, fa.modal_error_bounds, fa.solve_info

    md, bounds_d, info_d = run(devices=8)
    assert info_d.get("devices") == 8, info_d
    assert bounds_d is not None and bounds_d.shape == (3,)
    assert np.all(bounds_d < 1e-6), bounds_d  # f64 path: tight Ritz bounds
    m1, bounds_1, _ = run()
    np.testing.assert_allclose(np.asarray(md.omega), np.asarray(m1.omega),
                               rtol=1e-8)
