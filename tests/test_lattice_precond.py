"""Structured-lattice MG preconditioner for unstructured meshes: exact
transfer adjointness, M^-1 symmetry, iteration reduction, and solution
invariance vs plain block-Jacobi PCG."""

import numpy as np
import jax.numpy as jnp

from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10
from femx.solve.cg import pcg
from femx.solve.lattice_precond import LatticePreconditioner


def _problem(mesh_size=0.025, dims=(0.1, 0.1, 0.4)):
    mesh = box_tet10(*dims, mesh_size=mesh_size)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]

    op, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3, dtype=np.float64)
    mask = np.ones(op.ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n : 3 * n + 3] = 0
    op = op.with_free_mask(jnp.asarray(op.to_internal(mask)))
    f = np.zeros(op.ndof)
    tips = np.where(pts_s[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tips + 1] = -1000.0 / len(tips)
    return pts_s, conn_s, op, mask, jnp.asarray(op.to_internal(f * mask))


def test_transfer_adjoint_and_symmetry():
    pts, conn, op, mask, f_int = _problem()
    bj = op.block_jacobi_preconditioner()
    lp = LatticePreconditioner(pts, conn, 2e11, 0.3, mask, bj,
                               dtype=np.float64, node_perm=op.new_of_old)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(op.ndof))
    e = jnp.asarray(rng.standard_normal(3 * int(np.prod(lp.mg.fine_op.grid_shape))))
    lhs = float(jnp.vdot(lp.transfer.restrict(r), e))
    rhs = float(jnp.vdot(r, lp.transfer.interpolate(e, op.n_nodes)))
    assert abs(lhs - rhs) < 1e-10 * abs(rhs)

    m_int = jnp.asarray(op.to_internal(mask))
    a = jnp.asarray(rng.standard_normal(op.ndof)) * m_int
    b = jnp.asarray(rng.standard_normal(op.ndof)) * m_int
    s1 = float(jnp.vdot(lp(a), b))
    s2 = float(jnp.vdot(a, lp(b)))
    assert abs(s1 - s2) < 1e-12 * abs(s1)
    # positive definiteness probe
    assert float(jnp.vdot(a, lp(a))) > 0


def test_pruned_transfer_matches_dense():
    """On a grid-matched mesh the pruned transfer must reproduce the dense
    one exactly (it drops only exact-zero weights there), be selected by
    the auto heuristic, and stay the exact adjoint on a jittered mesh
    where mid-range weights survive the pruning."""
    from femx.solve.lattice_precond import (
        LatticeTransfer, LatticeTransferPruned, build_lattice_transfer,
        build_lattice_transfer_pruned)

    pts, conn, op, mask, _ = _problem()
    bj = op.block_jacobi_preconditioner()
    lp = LatticePreconditioner(pts, conn, 2e11, 0.3, mask, bj,
                               dtype=np.float64, node_perm=op.new_of_old)
    assert isinstance(lp.transfer, LatticeTransferPruned)

    gs = lp.mg.fine_op.grid_shape
    lo = pts.min(axis=0)
    half_h = np.asarray(lp.spacing) / 2.0
    inv = np.argsort(op.new_of_old, kind="stable")
    pts_cal = pts[inv]
    dense = build_lattice_transfer(pts_cal, lo, half_h, gs, dtype=np.float64)

    rng = np.random.default_rng(2)
    L = int(np.prod(gs))
    e = jnp.asarray(rng.standard_normal(3 * L))
    r = jnp.asarray(rng.standard_normal(op.ndof))
    np.testing.assert_allclose(
        np.asarray(lp.transfer.interpolate(e, op.n_nodes)),
        np.asarray(dense.interpolate(e, op.n_nodes)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(lp.transfer.restrict(r)),
        np.asarray(dense.restrict(r)), atol=1e-12)

    # jittered mesh: generic trilinear weights, pruning must keep the
    # transfer an exact adjoint pair (same kept set both directions)
    pts_j = pts_cal + rng.uniform(-0.3, 0.3, pts_cal.shape) * half_h[None, :]
    pr = build_lattice_transfer_pruned(pts_j, pts_j.min(axis=0), half_h, gs,
                                       dtype=np.float64)
    lhs = float(jnp.vdot(pr.restrict(r), e))
    rhs = float(jnp.vdot(r, pr.interpolate(e, len(pts_j))))
    assert abs(lhs - rhs) < 1e-10 * max(abs(rhs), 1.0)
    # constants interpolate exactly despite renormalization
    ones_lat = jnp.ones(3 * L)
    out = np.asarray(pr.interpolate(ones_lat, len(pts_j)))
    np.testing.assert_allclose(out, 1.0, atol=1e-12)


def test_iteration_reduction_and_solution():
    pts, conn, op, mask, f_int = _problem()
    bj = op.block_jacobi_preconditioner()
    res_bj = pcg(op.apply_constrained, f_int, M_inv_diag=bj, tol=1e-9,
                 maxiter=20000)
    assert bool(res_bj.converged)

    lp = LatticePreconditioner(pts, conn, 2e11, 0.3, mask, bj,
                               dtype=np.float64, node_perm=op.new_of_old)
    res_lp = pcg(op.apply_constrained, f_int, M_inv_diag=lp, tol=1e-9,
                 maxiter=20000)
    assert bool(res_lp.converged)
    # measured on this case: ~500 -> ~60; assert a conservative 4x
    assert int(res_lp.iterations) * 4 < int(res_bj.iterations), (
        int(res_lp.iterations), int(res_bj.iterations))
    err = float(jnp.max(jnp.abs(res_lp.x - res_bj.x)) /
                jnp.max(jnp.abs(res_bj.x)))
    assert err < 1e-8


def test_n_caller_padded_layout_sizes():
    """Callers with PADDED internal layouts (group-ELL pads nodes to whole
    16-node groups) must get caller-sized vectors even when the top padded
    slots are all dummies — n_cal inferred from max(node_perm)+1 undersizes
    _mask_cal exactly then (advisor round-4 medium finding)."""
    pts, conn, _op, mask, _f = _problem(mesh_size=0.05)
    N = len(pts)
    n_pad = N + 5  # top 5 caller slots are dummy nodes
    node_perm = np.arange(N)  # identity embed: max(node_perm)+1 == N < n_pad

    lp = LatticePreconditioner(pts, conn, 2e11, 0.3, mask,
                               dtype=np.float64, node_perm=node_perm,
                               block_jacobi_apply=lambda r: r,
                               n_caller=n_pad)
    assert lp.n_cal == n_pad
    rng = np.random.default_rng(7)
    r = rng.standard_normal(3 * n_pad)
    z = np.asarray(lp.coarse_correct(jnp.asarray(r)))
    assert z.shape == (3 * n_pad,)
    # dummy slots carry zero mask: no contribution in, zeros out
    assert np.all(z[3 * N:] == 0.0)

    # same problem through the REAL padded operator path: n_caller wired
    # from SolidOperatorGroupELL.n_pad keeps shapes consistent
    from femx.assembly_groupell import SolidOperatorGroupELL

    ge, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                            dtype=np.float64)
    ge = ge.with_free_mask(ge.to_internal(mask))
    binv = ge.block_jacobi_tensors()
    lp2 = LatticePreconditioner(pts, conn, 2e11, 0.3, mask,
                                dtype=np.float64, node_perm=ge.new_of_old,
                                bj_fn=type(ge).apply_block_jacobi,
                                bj_data=binv, n_caller=ge.n_pad)
    assert lp2.n_cal == ge.n_pad
    z2 = np.asarray(lp2(jnp.asarray(ge.to_internal(mask * 0 + 1.0))))
    assert z2.shape == (3 * ge.n_pad,)
