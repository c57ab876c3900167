"""Transpose-gather operator: exact equality with the reference-validated
einsum operator, constrained apply, preconditioner, and an end-to-end solve."""

import numpy as np
import jax.numpy as jnp

from femx.assembly import SolidOperator
from femx.assembly_tg import SolidOperatorTG
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10
from femx.solve.cg import pcg


def _scrambled_box(mesh_size=0.05):
    mesh = box_tet10(0.3, 0.2, 0.4, mesh_size=mesh_size)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    return pts_s, relabel[conn]


def test_apply_matches_einsum_operator():
    pts, conn = _scrambled_box()
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_tg, detJ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)
    assert np.all(np.asarray(detJ) > 0)

    rng = np.random.default_rng(1)
    u = rng.standard_normal(op_tg.ndof)
    want = np.asarray(op_ref.apply(jnp.asarray(u)))
    got = op_tg.to_global(np.asarray(op_tg.apply(jnp.asarray(op_tg.to_internal(u)))))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9 * np.abs(want).max())


def test_roundtrip_layout():
    pts, conn = _scrambled_box(mesh_size=0.1)
    op, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)
    x = np.arange(op.ndof, dtype=np.float64)
    np.testing.assert_array_equal(op.to_global(op.to_internal(x)), x)


def test_constrained_apply_and_diagonal():
    pts, conn = _scrambled_box(mesh_size=0.1)
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_tg, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)

    rng = np.random.default_rng(2)
    mask = (rng.random(op_tg.ndof) > 0.1).astype(np.float64)
    op_ref = op_ref.with_free_mask(jnp.asarray(mask))
    op_tg = op_tg.with_free_mask(jnp.asarray(op_tg.to_internal(mask)))

    u = rng.standard_normal(op_tg.ndof)
    want = np.asarray(op_ref.apply_constrained(jnp.asarray(u)))
    got = op_tg.to_global(
        np.asarray(op_tg.apply_constrained(jnp.asarray(op_tg.to_internal(u))))
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9 * np.abs(want).max())

    d_ref = np.asarray(op_ref.diagonal())
    d_tg = op_tg.to_global(np.asarray(op_tg.diagonal()))
    np.testing.assert_allclose(d_tg, d_ref, rtol=1e-10)


def test_pcg_solve_matches():
    """Full constrained PCG solve through the TG operator equals the einsum
    operator's solve on the same problem."""
    pts, conn = _scrambled_box(mesh_size=0.1)
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_tg, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)

    ndof = op_tg.ndof
    mask = np.ones(ndof)
    fixed_nodes = np.where(pts[:, 1] < 1e-9)[0]
    for n in fixed_nodes:
        mask[3 * n : 3 * n + 3] = 0.0
    rng = np.random.default_rng(3)
    f = rng.standard_normal(ndof) * mask * 1e3

    op_ref = op_ref.with_free_mask(jnp.asarray(mask))
    res_ref = pcg(op_ref.apply_constrained, jnp.asarray(f),
                  M_inv_diag=op_ref.block_jacobi_preconditioner(),
                  tol=1e-12, maxiter=4000)
    assert bool(res_ref.converged)

    op_tg = op_tg.with_free_mask(jnp.asarray(op_tg.to_internal(mask)))
    res_tg = pcg(op_tg.apply_constrained, jnp.asarray(op_tg.to_internal(f)),
                 M_inv_diag=op_tg.block_jacobi_preconditioner(),
                 tol=1e-12, maxiter=4000)
    assert bool(res_tg.converged)

    u_ref = np.asarray(res_ref.x)
    u_tg = op_tg.to_global(np.asarray(res_tg.x))
    np.testing.assert_allclose(u_tg, u_ref, rtol=1e-8,
                               atol=1e-10 * np.abs(u_ref).max())


def test_pipeline_routes_large_unstructured_through_tg(tmp_path):
    """SolidReactionAnalysis must route big unstructured meshes through the
    transpose-gather operator and produce the same solution as the
    structured pipeline on the identical box."""
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

    fa_s = SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                                 verbose=False)
    fa_s.run_simulation()
    assert fa_s._structured

    p = str(tmp_path / "box.msh")
    write_msh(p, mesh)
    fa_t = SolidReactionAnalysis(p, forces, fixes, E=2e11, v=0.3,
                                 verbose=False)
    assert 3 * fa_t.num_nodes > fa_t.DENSE_DOF_LIMIT
    fa_t.run_simulation()
    assert fa_t.solve_info["method"].startswith("tg_")
    assert fa_t.solve_info["converged"]

    scale = np.abs(fa_s.u).max()
    np.testing.assert_allclose(fa_t.u, fa_s.u, atol=1e-7 * scale)
    np.testing.assert_allclose(fa_t.equilibrium_residual(), 0, atol=1e-6)

    # modal through the TG layout matches the structured-operator modal
    m_s = fa_s.modal(n_modes=4, rho=7850.0, tol=1e-8, inner_tol=1e-10)
    m_t = fa_t.modal(n_modes=4, rho=7850.0, tol=1e-8, inner_tol=1e-10)
    np.testing.assert_allclose(np.asarray(m_t.omega), np.asarray(m_s.omega),
                               rtol=1e-5)
