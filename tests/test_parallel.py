"""Multi-device tests on the 8-way virtual CPU mesh: sharded operator
equivalence (same bits with and without sharding) and distributed CG."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from femx.assembly import SolidOperator
from femx.elements import tet10 as tet10_el
from femx.mesh import box_tet10
from femx.parallel import ShardedSolidOperator, batched_solve_cg, device_mesh, pad_elements
from femx.solve.cg import pcg


@pytest.fixture(scope="module")
def setup():
    mesh = box_tet10(0.4, 0.2, 0.2, 0.1)
    C = tet10_el.material_matrix(2e11, 0.3)
    op, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    fixed = np.where(mesh.points[:, 0] < 1e-9)[0]
    mask = np.ones(3 * mesh.num_nodes)
    for n in fixed:
        mask[3 * n : 3 * n + 3] = 0.0
    op = op.with_free_mask(jnp.asarray(mask))
    rng = np.random.default_rng(0)
    f = rng.normal(size=3 * mesh.num_nodes) * mask
    return mesh, op, jnp.asarray(f)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_apply_matches_single_device(setup):
    _mesh, op, f = setup
    dmesh = device_mesh(8)
    sop = ShardedSolidOperator.create(op, dmesh)
    u = jnp.asarray(np.random.default_rng(1).normal(size=op.ndof))
    want = np.asarray(op.apply(u))
    got = np.asarray(sop.apply(u))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=np.abs(want).max() * 1e-13)


def test_pad_elements_identity(setup):
    _mesh, op, _f = setup
    padded = pad_elements(op, 7)
    assert padded.conn.shape[0] % 7 == 0
    u = jnp.asarray(np.random.default_rng(2).normal(size=op.ndof))
    np.testing.assert_allclose(
        np.asarray(padded.apply(u)), np.asarray(op.apply(u)), rtol=1e-12
    )


def test_dof_sharded_apply_matches(setup):
    _mesh, op, _f = setup
    dmesh = device_mesh(8)
    sop = ShardedSolidOperator.create(op, dmesh)
    ndof = op.ndof
    pad = (-ndof) % 8
    u = np.random.default_rng(3).normal(size=ndof + pad)
    u[ndof:] = 0.0
    u_sh = jax.device_put(jnp.asarray(u), NamedSharding(dmesh, P("elem")))
    got = np.asarray(sop.apply_dof_sharded(u_sh))[:ndof]
    want = np.asarray(op.apply(jnp.asarray(u[:ndof])))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=np.abs(want).max() * 1e-12)


def test_distributed_cg_solution_matches(setup):
    """Same bits with and without sharding: CG through the sharded operator
    reproduces the single-device solution."""
    _mesh, op, f = setup
    minv = op.block_jacobi_preconditioner()
    want = pcg(op.apply_constrained, f, M_inv_diag=minv, tol=1e-10)
    dmesh = device_mesh(8)
    sop = ShardedSolidOperator.create(op, dmesh)
    got = pcg(sop.apply_constrained, f, M_inv_diag=minv, tol=1e-10)
    assert bool(got.converged)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(want.x),
        rtol=1e-6, atol=np.abs(np.asarray(want.x)).max() * 1e-8,
    )


def test_block_jacobi_beats_scalar_jacobi(setup):
    _mesh, op, f = setup
    d_iters = pcg(op.apply_constrained, f, M_inv_diag=1.0 / op.constrained_diagonal(), tol=1e-8)
    b_iters = pcg(op.apply_constrained, f, M_inv_diag=op.block_jacobi_preconditioner(), tol=1e-8)
    assert int(b_iters.iterations) <= int(d_iters.iterations)


def test_batched_load_cases(setup):
    """EP-analog: vmapped CG over a batch of RHS matches per-case solves."""
    _mesh, op, f = setup
    rhs = jnp.stack([f, 2.0 * f, -0.5 * f])
    minv = 1.0 / op.constrained_diagonal()
    batch = np.asarray(batched_solve_cg(op, rhs, minv, tol=1e-10))
    single = np.asarray(pcg(op.apply_constrained, f, M_inv_diag=minv, tol=1e-10).x)
    np.testing.assert_allclose(batch[0], single, rtol=1e-6, atol=np.abs(single).max() * 1e-9)
    np.testing.assert_allclose(batch[1], 2.0 * single, rtol=1e-6, atol=np.abs(single).max() * 1e-8)
