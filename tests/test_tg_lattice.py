"""Distributed lattice-MG unstructured solve (femx.parallel.tg_lattice).

The 8-virtual-device solve must converge in the same iteration class as
the single-device lattice-MG path (same lattice, same additive coupling)
and produce the same solution.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10
from femx.parallel.tg_lattice import DistributedUnstructuredSolver
from femx.solve.cg import pcg
from femx.solve.lattice_precond import LatticePreconditioner


@pytest.fixture(scope="module")
def problem():
    h = 0.1
    mesh = box_tet10(0.4, 0.4, 1.6, h)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(5)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    ndof = 3 * len(pts_s)
    mask = np.ones(ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n:3 * n + 3] = 0
    f = np.zeros(ndof)
    tip = np.where(pts_s[:, 2] > 1.6 - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)
    return pts_s, conn_s, mask, f


def test_distributed_solve_matches_single_device(problem):
    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    solver = DistributedUnstructuredSolver.build(
        pts, conn, 2e11, 0.3, mask, dmesh, dtype=np.float64)
    # the auto lattice on this box is 4x4x16 cells: already 2*ndev-aligned
    assert solver.n_cells[2] % 16 == 0

    tol = 1e-8
    x, it, res, ok = solver.solve(f * mask, tol=tol, maxiter=500)
    assert ok and res <= tol

    # single-device reference: same operator family + lattice-MG precond
    uop, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3,
                                       dtype=np.float64)
    uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask)))
    bj_data = uop.soa.block_jacobi_tensors()
    lp = LatticePreconditioner(pts, conn, 2e11, 0.3, mask,
                               dtype=np.float64, node_perm=uop.new_of_old,
                               bj_fn=type(uop.soa).apply_block_jacobi,
                               bj_data=bj_data)
    fu = jnp.asarray(uop.to_internal(f * mask))
    ref = pcg(uop.apply_constrained, fu, M_inv_diag=lp, tol=tol,
              maxiter=500)
    assert bool(ref.converged)
    x_ref = uop.to_global(np.asarray(ref.x))

    # same iteration class (pruned vs dense transfer weights differ only
    # in renormalized near-zero entries)
    assert abs(int(it) - int(ref.iterations)) <= 5, (it, ref.iterations)
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x * mask, x_ref * mask, atol=scale * 1e-7)


def test_distributed_solve_collectives_are_surface_sized(problem):
    """No volume-sized collective in the compiled program: permute
    payloads are interface rows or lattice planes, all-gathers only the
    small replicated-coarse handoff, all-reduces only scalars/planes —
    never the per-device volume."""
    import re

    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    solver = DistributedUnstructuredSolver.build(
        pts, conn, 2e11, 0.3, mask, dmesh, dtype=np.float64)

    top = solver.top
    f_st = jnp.asarray(top.scatter(f * mask))
    tg_args, tr_args = solver._stacked_args()
    hlo = solver.solver_fn(1e-8, 100).lower(
        f_st, jnp.zeros_like(f_st), tg_args, tr_args,
        solver.dmg_extra, solver.dmg_repl).compile().as_text()

    ndof_local = int(np.prod(f_st.shape[1:]))  # per-device owned volume
    # the one legitimately-global payload: the replicated-coarse handoff
    # all_gather of the lattice level dmg.handoff (shrinks ~8x per level
    # at scale; comparable to the volume only on toy problems like this)
    coarse_ndof = int(solver.dmg.mg.levels[solver.dmg.handoff].op.ndof)
    pat = re.compile(
        r"=\s*\(?\s*[a-z0-9]+\[([\d,]*)\][^=\n]*"
        r"\b(collective-permute|all-gather|all-reduce)")
    matches = list(pat.finditer(hlo))
    assert matches, "HLO collective scan matched nothing — pattern stale"
    for m in matches:
        dims = [int(v) for v in m.group(1).split(",") if v]
        n = int(np.prod(dims)) if dims else 1
        assert n < ndof_local / 2 or n <= coarse_ndof, (
            m.group(0)[:120], n, ndof_local, coarse_ndof)


def test_distributed_transfer_adjointness(problem):
    """<P e, r>_mesh == <e, P^T r>_lattice globally — the exact-adjoint
    property that keeps the additive preconditioner SPD (ownership dots on
    the mesh side; lattice dot weights shared planes by ownership)."""
    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    solver = DistributedUnstructuredSolver.build(
        pts, conn, 2e11, 0.3, mask, dmesh, dtype=np.float64)
    top = solver.top
    halo0 = solver.dmg.halo
    ax = solver.axis

    rng = np.random.default_rng(0)
    r_mesh = rng.standard_normal(3 * len(pts))
    e_latt = rng.standard_normal(halo0.op.ndof)

    r_st = jnp.asarray(top.scatter(r_mesh))
    e_st = jnp.asarray(halo0.scatter(e_latt))  # ghost-consistent slabs
    own_st = jnp.asarray(halo0.ownership_weights())
    tg_args, tr_args = solver._stacked_args()

    def kernel(r_b, e_b, own_b, tr_b):
        r_own, e_loc, own = r_b[0], e_b[0], own_b[0]
        ii, iw, ridx, rw, _lm = jax.tree.map(lambda a: a[0], tr_b)
        Pe = solver._interp_local(e_loc, ii, iw)  # (Nl, 3)
        lhs = jax.lax.psum(jnp.vdot(Pe, r_own), ax)
        Ptr = solver._restrict_local(r_own, ridx, rw)
        phases = halo0.local._split_phases(Ptr)
        Ptr = halo0.local._join_phases(
            halo0._halo_reduce_and_sync(phases))
        rhs = jax.lax.psum(jnp.vdot(Ptr * own, e_loc), ax)
        return lhs, rhs

    spec = P("z")
    lhs, rhs = jax.jit(jax.shard_map(
        kernel, mesh=dmesh, in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P())))(r_st, e_st, own_st, tr_args)
    assert abs(float(lhs) - float(rhs)) <= 1e-10 * max(1.0, abs(float(lhs)))


def test_distributed_solve_device_count_invariance(problem):
    """With a lattice that slab-decomposes for every device count, the
    iteration count must not depend on how many devices share the work
    (the math is identical; only the partition changes)."""
    pts, conn, mask, f = problem
    iters = {}
    for ndev in (2, 4, 8):
        dmesh = Mesh(np.array(jax.devices()[:ndev]), ("z",))
        solver = DistributedUnstructuredSolver.build(
            pts, conn, 2e11, 0.3, mask, dmesh, dtype=np.float64)
        assert solver.n_cells[2] == 16  # same lattice at every ndev
        x, it, res, ok = solver.solve(f * mask, tol=1e-8, maxiter=500)
        assert ok
        iters[ndev] = int(it)
    vals = list(iters.values())
    assert max(vals) - min(vals) <= 2, iters


def test_distributed_solve_jittered_mesh():
    """Non-grid-matched meshes (interior nodes jittered off the lattice)
    exercise the dense trilinear weights and interval ownership; the
    distributed solve must still match single-device."""
    h = 0.1
    mesh = box_tet10(0.4, 0.4, 1.6, h)
    pts = np.asarray(mesh.points).copy()
    conn = np.asarray(mesh.cells["tetra10"])
    rng = np.random.default_rng(11)
    interior = ((pts[:, 0] > 1e-9) & (pts[:, 0] < 0.4 - 1e-9)
                & (pts[:, 1] > 1e-9) & (pts[:, 1] < 0.4 - 1e-9)
                & (pts[:, 2] > 1e-9) & (pts[:, 2] < 1.6 - 1e-9))
    pts[interior] += rng.uniform(-0.008, 0.008, (int(interior.sum()), 3))
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    ndof = 3 * len(pts_s)
    mask = np.ones(ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n:3 * n + 3] = 0
    f = np.zeros(ndof)
    tip = np.where(pts_s[:, 2] > 1.6 - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)

    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    solver = DistributedUnstructuredSolver.build(
        pts_s, conn_s, 2e11, 0.3, mask, dmesh, dtype=np.float64)
    x, it, res, ok = solver.solve(f * mask, tol=1e-8, maxiter=500)
    assert ok and int(it) < 120, (it, res)

    uop, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                       dtype=np.float64)
    uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask)))
    lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask,
                               dtype=np.float64, node_perm=uop.new_of_old,
                               bj_fn=type(uop.soa).apply_block_jacobi,
                               bj_data=uop.soa.block_jacobi_tensors())
    ref = pcg(uop.apply_constrained, jnp.asarray(uop.to_internal(f * mask)),
              M_inv_diag=lp, tol=1e-8, maxiter=500)
    assert bool(ref.converged)
    x_ref = uop.to_global(np.asarray(ref.x))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x * mask, x_ref * mask, atol=scale * 1e-7)
