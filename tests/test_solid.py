"""Solid Tetra10 tests: element exactness, cross-validation vs an
independent numpy assembly, pipeline equilibrium, solver agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.assembly import SolidOperator, assemble_dense, dof_map
from femx.analysis import SolidReactionAnalysis
from femx.config import ReferenceCompat
from femx.elements import tet10 as tet10_el
from femx.mesh import box_tet10


def numpy_reference_assembly(points, conn, E, v, weight):
    """Independent per-element numpy implementation (textbook Tet10 B^T C B,
    same math as ReactionSolver.py:115-152) for cross-validation."""
    C1 = E / ((1 + v) * (1 - 2 * v))
    C2 = (1 - 2 * v) / 2
    C = C1 * np.array(
        [
            [1 - v, v, v, 0, 0, 0],
            [v, 1 - v, v, 0, 0, 0],
            [v, v, 1 - v, 0, 0, 0],
            [0, 0, 0, C2, 0, 0],
            [0, 0, 0, 0, C2, 0],
            [0, 0, 0, 0, 0, C2],
        ]
    )
    ndof = 3 * len(points)
    K = np.zeros((ndof, ndof))
    for tet in conn:
        coords = points[tet]
        Ke = np.zeros((30, 30))
        for g, pt in enumerate(tet10_el.GAUSS_POINTS):
            dN_nat = np.asarray(tet10_el.DN_NATURAL[g])
            J = dN_nat @ coords
            detJ = np.linalg.det(J)
            if detJ <= 1e-12:
                continue
            dN = np.linalg.inv(J) @ dN_nat
            B = np.zeros((6, 30))
            for i in range(10):
                dx, dy, dz = dN[:, i]
                c = 3 * i
                B[0, c] = dx
                B[1, c + 1] = dy
                B[2, c + 2] = dz
                B[3, c] = dy
                B[3, c + 1] = dx
                B[4, c + 1] = dz
                B[4, c + 2] = dy
                B[5, c] = dz
                B[5, c + 2] = dx
            Ke += B.T @ C @ B * detJ * weight
        dofs = (3 * np.repeat(tet, 3) + np.tile(range(3), 10)).flatten()
        K[np.ix_(dofs, dofs)] += Ke
    return K


@pytest.fixture(scope="module")
def small_box():
    return box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0), (0.4, 0, 0.4)])


def test_stiffness_cross_validation(small_box):
    """femx einsum assembly == independent numpy loop assembly to 1e-10 rel."""
    mesh = small_box
    conn = mesh.cells["tetra10"]
    E, v = 2e11, 0.3
    C = tet10_el.material_matrix(E, v)
    op, _ = SolidOperator.from_mesh(mesh.points, conn, C)
    ke = op.element_stiffness()
    K_femx = np.asarray(assemble_dense(ke, dof_map(op.conn, 3), 3 * mesh.num_nodes))
    K_ref = numpy_reference_assembly(mesh.points, conn, E, v, tet10_el.GAUSS_WEIGHT_CORRECT)
    scale = np.abs(K_ref).max()
    np.testing.assert_allclose(K_femx, K_ref, atol=scale * 1e-12)


def test_matrix_free_apply_matches_dense(small_box):
    mesh = small_box
    conn = mesh.cells["tetra10"]
    C = tet10_el.material_matrix(2e11, 0.3)
    op, _ = SolidOperator.from_mesh(mesh.points, conn, C)
    ndof = 3 * mesh.num_nodes
    K = np.asarray(assemble_dense(op.element_stiffness(), dof_map(op.conn, 3), ndof))
    rng = np.random.default_rng(0)
    u = rng.normal(size=ndof)
    np.testing.assert_allclose(
        np.asarray(op.apply(jnp.asarray(u))), K @ u, rtol=1e-10, atol=np.abs(K @ u).max() * 1e-12
    )
    # matrix-free diagonal == diag of assembled K
    np.testing.assert_allclose(np.asarray(op.diagonal()), np.diag(K), rtol=1e-10)


def test_rigid_body_modes_zero_energy(small_box):
    """K annihilates rigid translations and (linearized) rotations."""
    mesh = small_box
    C = tet10_el.material_matrix(2e11, 0.3)
    op, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    pts = mesh.points
    scale = 2e11
    for mode in range(6):
        u = np.zeros((mesh.num_nodes, 3))
        if mode < 3:
            u[:, mode] = 1.0
        else:
            axis = np.zeros(3)
            axis[mode - 3] = 1.0
            u = np.cross(np.broadcast_to(axis, pts.shape), pts - pts.mean(0))
        r = np.asarray(op.apply(jnp.asarray(u.reshape(-1))))
        assert np.abs(r).max() < scale * 1e-10, mode


def test_patch_uniform_strain_energy(small_box):
    """Quadratic elements reproduce linear displacement fields exactly:
    strain energy of u = eps*x equals 1/2 * V * C00 * eps^2."""
    mesh = small_box
    E, v = 2e11, 0.3
    C = np.asarray(tet10_el.material_matrix(E, v))
    op, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], jnp.asarray(C))
    eps = 1e-3
    u = np.zeros((mesh.num_nodes, 3))
    u[:, 0] = eps * mesh.points[:, 0]
    uf = jnp.asarray(u.reshape(-1))
    energy = 0.5 * float(uf @ op.apply(uf))
    V = 0.4 * 0.2 * 0.4
    assert energy == pytest.approx(0.5 * V * C[0, 0] * eps**2, rel=1e-10)


def _run_case(mesh, solver, compat=None, **kw):
    force_data = [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
                   "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}]
    fix_data = [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
                for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]]
    fa = SolidReactionAnalysis(
        mesh, force_data, fix_data, E=2e11, v=0.3, verbose=False, solver=solver,
        **({"compat": compat} if compat else {}), **kw)
    fa.assemble_stiffness_matrix()
    fa.apply_boundary_conditions()
    fa.solve()
    return fa


def test_pipeline_equilibrium_dense(small_box):
    fa = _run_case(small_box, "dense")
    resid = fa.equilibrium_residual()
    assert np.abs(resid).max() < 1e-8
    assert fa.negative_detJ_count == 0
    # all four corner fixes resist the +y load: Ry < 0 at every fix
    for info in fa.fixed_nodes_info:
        n = info["node_idx"]
        assert fa.reaction_forces[3 * n + 1] < 0


def test_cg_matches_dense(small_box):
    fa_d = _run_case(small_box, "dense")
    fa_c = _run_case(small_box, "cg", cg_tol=1e-12)
    assert fa_c.solve_info["method"].endswith("pcg")
    assert fa_c.solve_info["converged"]
    np.testing.assert_allclose(fa_c.u, fa_d.u, rtol=1e-6, atol=np.abs(fa_d.u).max() * 1e-8)
    np.testing.assert_allclose(
        fa_c.reaction_forces, fa_d.reaction_forces,
        atol=np.abs(fa_d.reaction_forces).max() * 1e-6)


def test_reference_compat_weight_scales_displacements(small_box):
    """The reference's w=1/4 (vs correct 1/24) stiffens K 6x: displacements
    shrink 6x, reactions unchanged (SURVEY.md §6 quirk 1)."""
    fa_fix = _run_case(small_box, "dense")
    fa_bug = _run_case(small_box, "dense", compat=ReferenceCompat(tet10_quadrature_weight_bug=True))
    np.testing.assert_allclose(fa_bug.u * 6.0, fa_fix.u, rtol=1e-9)
    np.testing.assert_allclose(
        fa_bug.reaction_forces, fa_fix.reaction_forces,
        atol=np.abs(fa_fix.reaction_forces).max() * 1e-9)


def test_missing_tetra10_raises():
    from femx.mesh import cantilever_line_mesh

    with pytest.raises(ValueError, match="tetra10"):
        SolidReactionAnalysis(cantilever_line_mesh(), [], [], E=2e11, v=0.3, verbose=False)


def test_stress_recovery_uniaxial_patch(small_box):
    """Impose a uniform uniaxial strain field; recovered nodal stresses must
    equal C @ eps everywhere and von Mises must be constant."""
    mesh = small_box
    fa = _run_case(mesh, "dense")
    eps = 1e-4
    u = np.zeros((mesh.num_nodes, 3))
    u[:, 0] = eps * mesh.points[:, 0]
    fa.u = u.reshape(-1)
    nodal, vm = fa.compute_stresses()
    C = np.asarray(tet10_el.material_matrix(2e11, 0.3))
    expect = C @ np.array([eps, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(nodal, np.broadcast_to(expect, nodal.shape),
                               rtol=1e-9, atol=np.abs(expect).max() * 1e-10)
    assert np.allclose(vm, vm[0], rtol=1e-9)


def test_stress_recovery_real_solution(small_box):
    fa = _run_case(small_box, "dense")
    nodal, vm = fa.compute_stresses()
    assert nodal.shape == (small_box.num_nodes, 6)
    assert np.isfinite(vm).all() and vm.max() > 0
