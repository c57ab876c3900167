"""Matrix-free LOBPCG modal path vs the dense generalized eigensolver."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.assembly import SolidOperator, assemble_dense, dof_map
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10
from femx.modal import modal_dense, modal_lobpcg, reference_qr_eigensolve


def test_lobpcg_matches_dense_lowest_modes():
    mesh = box_tet10(0.4, 0.2, 0.2, 0.1)
    n = mesh.num_nodes
    C = material_matrix(2e11, 0.3)
    op, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    K = np.asarray(assemble_dense(op.element_stiffness(), dof_map(op.conn, 3), 3 * n))
    fixed_nodes = np.where(mesh.points[:, 0] < 1e-9)[0]
    fixed = (3 * fixed_nodes[:, None] + np.arange(3)).ravel()
    mask = np.ones(3 * n)
    mask[fixed] = 0
    m_diag = np.ones(3 * n) * 7850.0 * (0.4 * 0.2 * 0.2) / n

    dense = modal_dense(K, np.diag(m_diag), fixed, n_modes=5)
    res = modal_lobpcg(op.apply, jnp.asarray(m_diag), jnp.asarray(mask),
                       n_modes=10, maxiter=600)
    w = np.sort(np.asarray(res.omega))
    w = w[w > 1.0][:5]
    np.testing.assert_allclose(w, np.asarray(dense.omega)[:5], rtol=1e-8)


def test_reference_qr_eigensolver_eigenvalues():
    """The reference-compat QR iteration reproduces symmetric eigenvalues
    (cross-validation utility, BeamSolver.py:467-481 semantics)."""
    rng = np.random.default_rng(0)
    Q = np.linalg.qr(rng.normal(size=(20, 20)))[0]
    # well-separated spectrum: unshifted QR converges; clustered eigenvalues
    # are exactly where the reference's algorithm degrades (SURVEY.md §6
    # quirk 2 — why femx's pipelines use symmetric solvers instead)
    lam_true = np.arange(1.0, 21.0) ** 2
    A = Q @ np.diag(lam_true) @ Q.T
    lam, V = reference_qr_eigensolve(A, max_iter=5000, tol=1e-12)
    # the reference's stagnation test rides np.allclose's default rtol=1e-5,
    # which caps achievable accuracy around 1e-5 — faithful behavior
    np.testing.assert_allclose(np.sort(lam), lam_true, rtol=1e-4)
