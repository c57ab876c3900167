"""2D geometric multigrid (femx.solve.multigrid2d) for the rect Tri6
lattice products: transfer adjointness, solve parity vs block-Jacobi PCG,
mesh-size-independent iteration counts, routing + fallbacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femx.analysis.pipe import PipeThermalAnalysis
from femx.analysis.plane import PlaneAnalysis, _jit_pcg_bj
from femx.assembly_plane import PlaneOperator
from femx.elements import tri6 as tri6_el
from femx.mesh.generators2d import rect_tri6_from_cells
from femx.solve.multigrid2d import Multigrid2D, prolong2d, restrict2d


def test_transfers_are_exact_adjoints(rng):
    uc = jnp.asarray(rng.standard_normal((5, 9, 2)))
    rf = jnp.asarray(rng.standard_normal((9, 17, 2)))
    lhs = float(jnp.vdot(prolong2d(uc), rf))
    rhs = float(jnp.vdot(uc, restrict2d(rf)))
    assert lhs == pytest.approx(rhs, rel=1e-13)
    # interpolation reproduces linear fields exactly
    x = jnp.arange(5.0)[:, None, None] + 2.0 * jnp.arange(9.0)[None, :, None]
    lin = jnp.broadcast_to(x, (5, 9, 2))
    up = prolong2d(lin)
    want = (0.5 * jnp.arange(9.0)[:, None, None]
            + 1.0 * jnp.arange(17.0)[None, :, None])
    assert jnp.abs(up - want).max() < 1e-12


def _cantilever_setup(nx, ny):
    mesh = rect_tri6_from_cells((nx, ny), (1.0 / nx, 0.25 / ny))
    C = tri6_el.material_matrix_plane(2e11, 0.3, mode="stress",
                                      dtype=jnp.float64)
    op, _ = PlaneOperator.from_mesh(mesh.points, mesh.cells["triangle6"], C,
                                    thickness=0.01)
    ndof = 2 * len(mesh.points)
    mask = np.ones(ndof)
    left = np.where(np.abs(mesh.points[:, 0]) < 1e-12)[0]
    mask[2 * left] = mask[2 * left + 1] = 0.0
    f = np.zeros(ndof)
    right = np.where(np.abs(mesh.points[:, 0] - 1.0) < 1e-12)[0]
    f[2 * right + 1] = -1000.0 / len(right)
    return mesh, C, op, mask, jnp.asarray(f * mask)


def _mg_iters(nx, ny, coarse_dof_limit=3000):
    mesh, C, op, mask, fv = _cantilever_setup(nx, ny)
    mg = Multigrid2D("plane", (nx, ny), mesh.lattice2d["spacing"],
                     (0.0, 0.0), C, mask, thickness=0.01, fine_op=op,
                     coarse_dof_limit=coarse_dof_limit)
    from femx.analysis.plane import _jit_pcg_mg2d

    x, iters, rn = _jit_pcg_mg2d(fv, mg, 1e-10, 2000)
    return x, int(iters), float(rn), op.with_free_mask(jnp.asarray(mask)), fv


def test_mg_matches_block_jacobi_solution():
    x_mg, iters, rn, opm, fv = _mg_iters(48, 16)
    assert rn <= 1e-9
    assert iters < 45
    x_bj, it_bj, _ = _jit_pcg_bj(fv, opm, 1e-10, 20000)
    assert float(jnp.abs(x_mg - x_bj).max()
                 / jnp.abs(x_bj).max()) < 1e-8
    assert int(it_bj) > 5 * iters  # MG earns its setup


def test_mg_iterations_mesh_size_independent():
    # force BOTH sizes to multi-level V-cycles (same coarse limit) so the
    # comparison is about h, not about the small case degenerating to the
    # exact single-level dense preconditioner
    _, it_small, _, _, _ = _mg_iters(32, 8, coarse_dof_limit=400)
    _, it_big, _, _, _ = _mg_iters(128, 32, coarse_dof_limit=400)
    assert it_big <= it_small + 10  # h-independence (BJ would grow ~4x)


def test_hierarchy_specs_and_guards():
    mesh, C, op, mask, fv = _cantilever_setup(16, 8)
    mg = Multigrid2D("plane", (16, 8), mesh.lattice2d["spacing"], (0.0, 0.0),
                     C, mask, thickness=0.01, coarse_dof_limit=700)
    shapes = mg.level_shapes()
    assert shapes[0] == (16, 8)
    assert all((a // 2, b // 2) == n for (a, b), n
               in zip(shapes[:-1], shapes[1:]))
    assert 2 * (2 * shapes[-1][0] + 1) * (2 * shapes[-1][1] + 1) <= 700
    # odd cell counts can't coarsen -> informative raise
    mesh3, C3, op3, mask3, _ = _cantilever_setup(15, 9)
    with pytest.raises(ValueError, match="2\\^k-divisible"):
        Multigrid2D("plane", (15, 9), mesh3.lattice2d["spacing"], (0.0, 0.0),
                    C3, mask3, thickness=0.01, coarse_dense_limit=300)


def test_plane_pipeline_routes_to_mg_and_matches_theory():
    """Public pipeline on a 128x16 plate (>6k DOF): routes through MG and
    still matches the Timoshenko cantilever deflection."""
    L, H, t, E, v, P = 1.0, 0.1, 0.01, 2e11, 0.3, -500.0
    mesh = rect_tri6_from_cells((128, 16), (L / 128, H / 16))
    pa = PlaneAnalysis(mesh, [{"group": "right", "force_x": 0, "force_y": P}],
                       [{"group": "left", "fix_x": 0, "fix_y": 0}],
                       E=E, v=v, thickness=t, verbose=False).run_simulation()
    assert pa.solve_info["method"] == "mg_pcg_2d"
    assert pa.solve_info["converged"]
    assert pa.solve_info["iterations"] < 60
    I = t * H**3 / 12.0
    G = E / (2 * (1 + v))
    want = P * L**3 / (3 * E * I) + P * L / (5.0 / 6.0 * t * H * G)
    tip = np.where((np.abs(pa.points[:, 0] - L) < 1e-12)
                   & (np.abs(pa.points[:, 1] - H / 2) < 1e-9))[0]
    got = float(pa.u.reshape(-1, 2)[tip[0], 1])
    assert got == pytest.approx(want, rel=0.03)
    assert np.abs(pa.equilibrium_residual()).max() < 1e-6 * abs(P)


def test_axisym_mg_matches_dense_lame():
    """Pipe product on a lattice too big for dense: MG path reproduces the
    exact Lame bore hoop stress."""
    a, b, p = 0.1, 0.16, 50e6
    pa = PipeThermalAnalysis(a, b, length=0.4, E=2e11, v=0.3, alpha=1e-5,
                             pressure_inner=p, n_r=16, n_z=96,
                             verbose=False).run_simulation()
    assert pa.solve_info["method"] == "mg_pcg_2d"
    radii, s_tt = pa.radial_profile(pa.stress_nodes[:, 2])
    want = p * (a**2 + b**2) / (b**2 - a**2)
    assert s_tt[0] == pytest.approx(want, rel=0.01)
