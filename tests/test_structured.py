"""Structured lattice operator: bit-equality with the unstructured path and
end-to-end pipeline integration."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.assembly import SolidOperator
from femx.assembly_structured import StructuredSolidOperator
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10
from femx.solve.cg import pcg


@pytest.fixture(scope="module")
def ops():
    mesh = box_tet10(0.4, 0.3, 0.2, 0.1)
    C = material_matrix(2e11, 0.3)
    aos, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    st = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float64)
    return mesh, aos, st


def test_lattice_node_ordering(ops):
    mesh, _, st = ops
    info = mesh.structured
    assert info.grid_shape == (9, 7, 5)
    assert mesh.num_nodes == 9 * 7 * 5
    # node id = raster index of the half-spaced lattice
    p = mesh.points
    hx, hy, hz = info.spacing
    idx = np.round(p / np.array([hx / 2, hy / 2, hz / 2])).astype(int)
    np.testing.assert_array_equal(
        info.node_id(idx[:, 0], idx[:, 1], idx[:, 2]), np.arange(mesh.num_nodes)
    )


def test_permutation_roundtrip(ops):
    _, aos, st = ops
    x = np.random.default_rng(5).normal(size=st.ndof)
    np.testing.assert_array_equal(st.to_global(st.to_internal(x)), x)


def test_apply_bit_equal(ops):
    mesh, aos, st = ops
    u = np.random.default_rng(0).normal(size=aos.ndof)
    a = np.asarray(aos.apply(jnp.asarray(u)))
    b = st.to_global(np.asarray(st.apply(jnp.asarray(st.to_internal(u)))))
    np.testing.assert_allclose(b, a, rtol=1e-13, atol=np.abs(a).max() * 1e-14)


def test_diagonals_match(ops):
    _, aos, st = ops
    d = np.asarray(aos.diagonal())
    d_st = st.to_global(np.asarray(st.diagonal()))
    np.testing.assert_allclose(d_st, d, rtol=1e-13, atol=d.max() * 1e-14)


def test_constrained_solve_matches(ops):
    mesh, aos, st = ops
    mask = np.ones(aos.ndof)
    fixed = np.where(mesh.points[:, 0] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0.0
    aos_m = aos.with_free_mask(jnp.asarray(mask))
    st_m = st.with_free_mask(jnp.asarray(st.to_internal(mask)))
    f = np.random.default_rng(1).normal(size=aos.ndof) * mask
    ua = pcg(aos_m.apply_constrained, jnp.asarray(f),
             M_inv_diag=aos_m.block_jacobi_preconditioner(), tol=1e-11)
    us = pcg(st_m.apply_constrained, jnp.asarray(st_m.to_internal(f)),
             M_inv_diag=st_m.block_jacobi_preconditioner(), tol=1e-11)
    assert bool(us.converged)
    np.testing.assert_allclose(
        st_m.to_global(np.asarray(us.x)), np.asarray(ua.x), rtol=1e-7,
        atol=np.abs(np.asarray(ua.x)).max() * 1e-9,
    )


def test_pipeline_uses_structured_path():
    from femx.analysis import SolidReactionAnalysis

    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0), (0.4, 0, 0.4)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False, solver="cg", cg_tol=1e-11,
    )
    fa.run_simulation()
    assert fa.solve_info["method"] == "structured_block_jacobi_pcg"
    assert np.abs(fa.equilibrium_residual()).max() < 1e-7


def test_pipeline_mg_solver():
    """solver='mg' routes through the multigrid preconditioner and matches
    the dense solution."""
    from femx.analysis import SolidReactionAnalysis

    mesh = box_tet10(0.4, 0.4, 0.8, 0.1,
                     force_points=[(0.2, 0.4, 0.4)],
                     fix_points=[(0, 0, 0), (0, 0, 0.8), (0.4, 0, 0), (0.4, 0, 0.8)])
    args = (
        [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.4, "force_z_pstn": 0.4}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.8), (0.4, 0), (0.4, 0.8)]],
    )
    fa_mg = SolidReactionAnalysis(mesh, *args, E=2e11, v=0.3, verbose=False,
                                  solver="mg", cg_tol=1e-10)
    fa_mg.run_simulation()
    assert fa_mg.solve_info["method"] == "structured_multigrid_pcg"
    assert fa_mg.solve_info["iterations"] < 40
    assert np.abs(fa_mg.equilibrium_residual()).max() < 1e-7

    fa_cg = SolidReactionAnalysis(mesh, *args, E=2e11, v=0.3, verbose=False,
                                  solver="cg", cg_tol=1e-10)
    fa_cg.run_simulation()
    np.testing.assert_allclose(fa_mg.u, fa_cg.u, atol=np.abs(fa_cg.u).max() * 1e-6)
