"""Multi-device structured solves on the 8-device virtual CPU mesh:
z-slab cell decomposition under shard_map (psum-reduced apply)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.assembly_structured import StructuredSolidOperator
from femx.mesh import box_tet10
from femx.parallel.structured import ShardedStructuredOperator
from femx.solve.cg import pcg


@pytest.fixture(scope="module")
def setup():
    mesh = box_tet10(0.2, 0.2, 1.6, 0.1)  # (2, 2, 16) cells -> z shardable by 8
    op = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float64)
    mask = np.ones(op.ndof)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0.0
    f = np.zeros(op.ndof)
    tip = np.where(mesh.points[:, 2] > 1.6 - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)
    op = op.with_free_mask(jnp.asarray(op.to_internal(mask)))
    return mesh, op, mask, f


def test_phase_apply_matches_flat(setup):
    _mesh, op, _mask, f = setup
    u = np.random.default_rng(0).normal(size=op.ndof)
    u_int = jnp.asarray(op.to_internal(u))
    flat = np.asarray(op.apply(u_int))
    phases = op._split_phases(u_int)
    out = op.apply_phases(phases)
    flat2 = np.asarray(jnp.concatenate([g.reshape(-1) for g in out]))
    np.testing.assert_allclose(flat2, flat, rtol=1e-13)


def test_phase_constrained_apply_matches_flat(setup):
    _mesh, op, _mask, f = setup
    u = np.random.default_rng(1).normal(size=op.ndof)
    u_int = jnp.asarray(op.to_internal(u))
    flat = np.asarray(op.apply_constrained(u_int))
    out = op.apply_constrained_phases(op._split_phases(u_int))
    flat2 = np.asarray(jnp.concatenate([g.reshape(-1) for g in out]))
    np.testing.assert_allclose(flat2, flat, rtol=1e-13)


def test_slab_sharded_apply_matches(setup):
    """8-way z-slab shard_map apply is bit-compatible with one device."""
    _mesh, op, _mask, _f = setup
    devmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = ShardedStructuredOperator(op=op, mesh=devmesh)
    u = jnp.asarray(np.random.default_rng(2).normal(size=op.ndof))
    want = np.asarray(op.apply(u))
    got = np.asarray(sop.apply(u))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=np.abs(want).max() * 1e-13)


def test_slab_sharded_cg_matches_single_device(setup):
    _mesh, op, mask, f = setup
    f_int = jnp.asarray(op.to_internal(f * mask))
    minv = op.block_jacobi_preconditioner()
    ref = pcg(op.apply_constrained, f_int, M_inv_diag=minv, tol=1e-10)
    assert bool(ref.converged)

    devmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = ShardedStructuredOperator(op=op, mesh=devmesh)
    res = pcg(sop.apply_constrained, f_int, M_inv_diag=minv, tol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x),
        rtol=1e-8, atol=np.abs(np.asarray(ref.x)).max() * 1e-10,
    )


def test_uneven_slab_rejected(setup):
    _mesh, op, _mask, _f = setup
    devmesh = Mesh(np.array(jax.devices()[:3]), ("z",))
    with pytest.raises(ValueError, match="must divide"):
        ShardedStructuredOperator(op=op, mesh=devmesh)
