"""Clustered dense-block operator == the reference einsum operator."""

import numpy as np
import pytest
import jax.numpy as jnp

from femx.assembly import SolidOperator
from femx.assembly_cluster import SolidOperatorCluster
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10


@pytest.fixture(scope="module")
def meshdata():
    mesh = box_tet10(0.4, 0.3, 0.6, 0.1)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(7)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    return pts_s, relabel[conn]


@pytest.mark.parametrize("k", [4, 8, 13])
def test_cluster_apply_matches_reference(meshdata, k):
    pts, conn = meshdata
    C = material_matrix(2e11, 0.3)
    ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op, detJ = SolidOperatorCluster.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float64,
                                              cluster_size=k)
    assert detJ.shape[0] == len(conn)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(3 * len(pts))
    y = op.to_global(np.asarray(op.apply(jnp.asarray(op.to_internal(u)))))
    y_ref = np.asarray(ref.apply(jnp.asarray(u)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-11,
                               atol=np.abs(y_ref).max() * 1e-12)


def test_cluster_constrained_solve_matches(meshdata):
    from femx.solve.cg import pcg

    pts, conn = meshdata
    ndof = 3 * len(pts)
    mask = np.ones(ndof)
    for n in np.where(pts[:, 2] < 1e-9)[0]:
        mask[3 * n:3 * n + 3] = 0
    f = np.zeros(ndof)
    tip = np.where(pts[:, 2] > pts[:, 2].max() - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)

    op, _ = SolidOperatorCluster.from_mesh(pts, conn, 2e11, 0.3,
                                           dtype=np.float64)
    op = op.with_free_mask(op.to_internal(mask))
    binv = op.block_jacobi_tensors()
    res = pcg(op.apply_constrained, jnp.asarray(op.to_internal(f * mask)),
              M_inv_diag=lambda r: op.apply_block_jacobi(binv, r),
              tol=1e-10, maxiter=4000)
    assert bool(res.converged)
    u = op.to_global(np.asarray(res.x))

    from femx.assembly_tg import SolidOperatorTG

    tg, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)
    tg = tg.with_free_mask(jnp.asarray(tg.to_internal(mask)))
    bj = tg.soa.block_jacobi_tensors()
    ref = pcg(tg.apply_constrained, jnp.asarray(tg.to_internal(f * mask)),
              M_inv_diag=lambda r: tg.soa.apply_block_jacobi(bj, r),
              tol=1e-10, maxiter=4000)
    u_ref = tg.to_global(np.asarray(ref.x))
    # same preconditioner family -> same trajectory, same answer
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(u, u_ref, atol=np.abs(u_ref).max() * 1e-8)


def test_cluster_row_count_advantage(meshdata):
    """The reason this operator exists: gather rows per apply well below
    the TG operator's 20E."""
    pts, conn = meshdata
    op, _ = SolidOperatorCluster.from_mesh(pts, conn, 2e11, 0.3,
                                           dtype=np.float32, cluster_size=16)
    E = len(conn)
    # this tiny mesh is mostly surface (clusters share less); the ratio
    # improves toward ~0.4 at the 1.39M flagship
    assert op.gather_rows() < 0.75 * 20 * E, (op.gather_rows(), 20 * E)


def test_pipeline_cluster_operator_route(tmp_path):
    """unstructured_operator="cluster" routes a big unstructured mesh
    through SolidOperatorCluster end-to-end and matches the TG route."""
    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import write_msh

    dims = (0.2, 0.2, 0.6)
    mesh = box_tet10(*dims, mesh_size=0.04,
                     force_points=[(0.1, 0.2, 0.3)],
                     fix_points=[(0, 0, 0), (0.2, 0, 0), (0, 0, 0.6),
                                 (0.2, 0, 0.6)])
    forces = [{"force_x": 0, "force_y": 3000.0, "force_z": 0,
               "force_x_pstn": 0.1, "force_y_pstn": 0.2, "force_z_pstn": 0.3}]
    fixes = [{"pos_x": x, "pos_y": 0.0, "pos_z": z,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for x, z in [(0, 0), (0.2, 0), (0, 0.6), (0.2, 0.6)]]

    p = str(tmp_path / "box.msh")
    write_msh(p, mesh)
    fa_t = SolidReactionAnalysis(p, forces, fixes, E=2e11, v=0.3,
                                 verbose=False)
    assert 3 * fa_t.num_nodes > fa_t.DENSE_DOF_LIMIT
    fa_t.run_simulation()
    assert fa_t.solve_info["method"].startswith("tg_")

    fa_c = SolidReactionAnalysis(p, forces, fixes, E=2e11, v=0.3,
                                 verbose=False,
                                 unstructured_operator="cluster")
    fa_c.run_simulation()
    assert isinstance(fa_c.operator, SolidOperatorCluster)
    assert fa_c.solve_info["method"].startswith("cluster_")
    assert fa_c.solve_info["converged"]

    scale = np.abs(fa_t.u).max()
    np.testing.assert_allclose(fa_c.u, fa_t.u, atol=1e-7 * scale)
    np.testing.assert_allclose(fa_c.reaction_forces, fa_t.reaction_forces,
                               atol=1e-6 * np.abs(fa_t.reaction_forces).max())
    np.testing.assert_allclose(fa_c.equilibrium_residual(), 0, atol=1e-6)

    # modal + solve_cases compose with the cluster operator
    m_t = fa_t.modal(n_modes=3, rho=7850.0, tol=1e-8, inner_tol=1e-10)
    m_c = fa_c.modal(n_modes=3, rho=7850.0, tol=1e-8, inner_tol=1e-10)
    np.testing.assert_allclose(np.asarray(m_c.omega), np.asarray(m_t.omega),
                               rtol=1e-5)
    cases = [forces, [{**forces[0], "force_y": -1500.0}]]
    U_t = fa_t.solve_cases(cases)
    U_c = fa_c.solve_cases(cases)
    np.testing.assert_allclose(U_c, U_t, atol=1e-6 * np.abs(U_t).max())


def test_unstructured_operator_validation():
    from femx.analysis import SolidReactionAnalysis

    mesh = box_tet10(0.2, 0.2, 0.2, 0.1)
    with pytest.raises(ValueError, match="unstructured_operator"):
        SolidReactionAnalysis(mesh, [], [], E=2e11, v=0.3, verbose=False,
                              unstructured_operator="nope")
