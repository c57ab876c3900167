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
