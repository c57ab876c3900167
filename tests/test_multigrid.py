"""Geometric multigrid preconditioner tests (structured lattice)."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.mesh import box_tet10
from femx.solve.cg import pcg
from femx.solve.multigrid import StructuredMultigrid, prolong, restrict


def _cantilever(dims, ms):
    mesh = box_tet10(*dims, mesh_size=ms)
    mask = np.ones(3 * mesh.num_nodes)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(3 * mesh.num_nodes)
    tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)
    return mesh, mask, f


def test_transfer_transpose_consistency():
    """restrict == prolong^T: <R f, c> == <f, P c> for random fields."""
    rng = np.random.default_rng(0)
    cshape = (3, 5, 4, 6)
    fshape = (3, 9, 7, 11)
    c = jnp.asarray(rng.normal(size=cshape))
    f = jnp.asarray(rng.normal(size=fshape))
    lhs = float(jnp.vdot(restrict(f), c))
    rhs = float(jnp.vdot(f, prolong(c)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_prolong_exact_on_linear_fields():
    """Trilinear interpolation reproduces linear coordinate fields exactly."""
    qx, qy, qz = 5, 4, 6
    X, Y, Z = np.meshgrid(np.arange(qx), np.arange(qy), np.arange(qz), indexing="ij")
    lin = 2.0 * X + 3.0 * Y - Z + 1.0
    c = jnp.asarray(np.broadcast_to(lin, (3, qx, qy, qz)))
    fine = np.asarray(prolong(c))
    Xf, Yf, Zf = np.meshgrid(
        np.arange(2 * qx - 1) / 2, np.arange(2 * qy - 1) / 2, np.arange(2 * qz - 1) / 2,
        indexing="ij",
    )
    expect = 2.0 * Xf + 3.0 * Yf - Zf + 1.0
    np.testing.assert_allclose(fine[0], expect, rtol=1e-12)


def test_mg_cg_converges_fast_and_matches_bj():
    dims = (0.4, 0.4, 2.0)
    mesh, mask, f = _cantilever(dims, 0.1)
    mg = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask,
                             dtype=np.float64, coarse_dof_limit=3000)
    assert len(mg.levels) >= 2
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask))
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-8, maxiter=200)
    assert bool(res.converged)
    assert int(res.iterations) < 40  # mesh-independent convergence
    res_bj = pcg(op.apply_constrained, fj,
                 M_inv_diag=op.block_jacobi_preconditioner(), tol=1e-8, maxiter=20000)
    x = op.to_global(np.asarray(res.x))
    y = op.to_global(np.asarray(res_bj.x))
    np.testing.assert_allclose(x, y, atol=np.abs(y).max() * 1e-6)


def test_mg_f32_converges():
    """float32 end-to-end (the TPU configuration): MG-CG still converges to
    a tight relative residual in few iterations."""
    dims = (0.4, 0.4, 1.6)
    mesh, mask, f = _cantilever(dims, 0.1)
    mg = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask, dtype=np.float32)
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask), dtype=jnp.float32)
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-5, maxiter=100)
    assert bool(res.converged)
    assert int(res.iterations) < 40
