"""SoA (element-last) kernels vs the AoS einsum reference: bit-equality."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.assembly import SolidOperator
from femx.assembly_soa import SolidOperatorSoA
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10


@pytest.fixture(scope="module")
def ops():
    mesh = box_tet10(0.4, 0.2, 0.2, 0.1)
    C = material_matrix(2e11, 0.3)
    aos, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    soa, _ = SolidOperatorSoA.from_mesh(mesh.points, mesh.cells["tetra10"], 2e11, 0.3,
                                        dtype=np.float64)
    mask = np.ones(3 * mesh.num_nodes)
    mask[:30] = 0.0
    return aos.with_free_mask(jnp.asarray(mask)), soa.with_free_mask(jnp.asarray(mask))


def test_apply_matches(ops):
    aos, soa = ops
    u = jnp.asarray(np.random.default_rng(0).normal(size=aos.ndof))
    a = np.asarray(aos.apply(u))
    b = np.asarray(soa.apply(u))
    np.testing.assert_allclose(b, a, rtol=1e-13, atol=np.abs(a).max() * 1e-14)


def test_diagonal_matches(ops):
    aos, soa = ops
    d = np.asarray(aos.diagonal())
    np.testing.assert_allclose(np.asarray(soa.diagonal()), d, rtol=1e-12)


def test_preconditioner_matches(ops):
    aos, soa = ops
    r = jnp.asarray(np.random.default_rng(1).normal(size=aos.ndof))
    pa = np.asarray(aos.block_jacobi_preconditioner()(r))
    pb = np.asarray(soa.block_jacobi_preconditioner()(r))
    np.testing.assert_allclose(pb, pa, rtol=1e-11, atol=np.abs(pa).max() * 1e-12)


def test_block_jacobi_degenerate_node_is_finite():
    """A free node referenced by no element must not poison the
    preconditioner with inf/NaN (ADVICE round-1 low #3): its block maps to
    the identity."""
    import jax.numpy as jnp
    from femx.assembly_soa import SolidOperatorSoA
    from femx.mesh import box_tet10

    mesh = box_tet10(0.2, 0.2, 0.2, 0.1)
    pts = np.concatenate([mesh.points, [[9.0, 9.0, 9.0]]])  # orphan node
    op, _detj = SolidOperatorSoA.from_mesh(pts, mesh.cells["tetra10"], 2e11, 0.3,
                                           dtype=np.float64)
    op = op.with_free_mask(np.ones(op.ndof))
    minv = op.block_jacobi_preconditioner()
    r = jnp.asarray(np.random.default_rng(0).standard_normal(op.ndof))
    z = np.asarray(minv(r))
    assert np.all(np.isfinite(z))
    # orphan block acts as identity
    np.testing.assert_allclose(z[-3:], np.asarray(r)[-3:], rtol=1e-12)


def test_coords_soa_and_dof_table_match_naive_forms():
    """The layout-optimized geometry-table builders must equal the naive
    gather-then-transpose formulations bit-for-bit (they replaced an ~8 s
    strided copy at 331k elements)."""
    from femx.elements.tet10_soa import coords_soa, dof_table
    from femx.mesh import box_tet10

    mesh = box_tet10(0.3, 0.2, 0.4, 0.1)
    pts = np.asarray(mesh.points)
    conn = np.asarray(mesh.cells["tetra10"])
    rng = np.random.default_rng(3)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]

    for dt in (np.float32, np.float64):
        ref = np.ascontiguousarray(
            np.transpose(pts_s[conn_s], (1, 2, 0)).astype(dt))
        np.testing.assert_array_equal(coords_soa(pts_s, conn_s, dt), ref)
    ref_dofs = np.ascontiguousarray(
        (3 * conn_s[:, :, None] + np.arange(3)).reshape(len(conn_s), 30)
        .T.astype(np.int32))
    np.testing.assert_array_equal(dof_table(conn_s), ref_dofs)
