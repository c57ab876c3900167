"""Per-component timing of the unstructured solve at flagship scale.

Times each piece of one lattice-MG-preconditioned CG iteration on the TG
operator — TG apply, block-Jacobi, transfer restrict/interpolate, lattice
V-cycle — with the in-jit fori_loop differencing method (random data;
jnp.ones gets constant-folded, and per-dispatch relay cost ~30 ms swamps
single-op timing).

Usage: python examples/bench_unstructured_parts.py [nx,ny,nz]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10
from femx.solve.lattice_precond import LatticePreconditioner


def log(*a):
    print(*a, flush=True)


def timed_op(name, fn, data, x0, reps=(4, 12)):
    """fn(data, x) -> x-like; time via (t(n2)-t(n1))/(n2-n1)."""

    @jax.jit
    def loop(data_, x, n):
        def body(_, v):
            return fn(data_, v)
        return jax.lax.fori_loop(0, n, body, x)

    outs = {}
    for n in reps:
        r = loop(data, x0, n)
        float(r.ravel()[0])  # block_until_ready does not sync through the relay
        t0 = time.perf_counter()
        r = loop(data, x0, n)
        float(r.ravel()[0])  # scalar readback forces device completion
        outs[n] = time.perf_counter() - t0
    n1, n2 = reps
    per = (outs[n2] - outs[n1]) / (n2 - n1)
    log(f"{name:<28} {per*1e3:8.3f} ms/apply")
    return per


def main():
    grid = sys.argv[1] if len(sys.argv) > 1 else "24,24,96"
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.0 / 96
    mesh = box_tet10(nx * h, ny * h, nz * h, mesh_size=h)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]

    op, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3, dtype=np.float32)
    ndof = op.ndof
    mask = np.ones(ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n : 3 * n + 3] = 0
    op = op.with_free_mask(jnp.asarray(op.to_internal(mask)))
    log(f"ndof {ndof}, elements {op.n_elements}")

    bj_data = op.soa.block_jacobi_tensors()
    bj_fn = type(op.soa).apply_block_jacobi
    lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask,
                               dtype=np.float32, node_perm=op.new_of_old,
                               bj_fn=bj_fn, bj_data=bj_data)

    x = jnp.asarray(rng.standard_normal(ndof).astype(np.float32))

    timed_op("tg_apply", lambda o, v: o.apply_constrained(v), op, x)
    timed_op("block_jacobi", lambda t, v: bj_fn(t, v), bj_data, x)
    timed_op("lp_full (BJ + coarse)", lambda l, v: l(v), lp, x)
    timed_op("lp_coarse_correct", lambda l, v: l.coarse_correct(v), lp, x)

    # transfer pieces (mesh->lattice->mesh roundtrip, and V-cycle alone)
    def restrict_interp(l, v):
        rl = l.transfer.restrict(v * l._mask_cal) * l._lat_mask
        return l.transfer.interpolate(rl, l.n_nodes) * l._mask_cal

    timed_op("restrict+interpolate", restrict_interp, lp, x)

    # dense (unpruned) transfer for comparison when the auto pick is pruned
    from femx.solve.lattice_precond import (LatticeTransferPruned,
                                            build_lattice_transfer)
    if isinstance(lp.transfer, LatticeTransferPruned):
        kept = lp.transfer.kept_incidences()
        log(f"pruned transfer: kept {kept} of {8 * op.n_nodes} incidences")
        inv = np.argsort(op.new_of_old, kind="stable")
        dense_t = build_lattice_transfer(
            pts_s[inv], pts_s.min(axis=0), np.asarray(lp.spacing) / 2.0,
            lp.mg.fine_op.grid_shape, dtype=np.float32)

        def restrict_interp_dense(t, v):
            rl = t.restrict(v * lp._mask_cal) * lp._lat_mask
            return t.interpolate(rl, lp.n_nodes) * lp._mask_cal

        timed_op("restrict+interp (dense)", restrict_interp_dense, dense_t, x)

    xl = jnp.asarray(
        rng.standard_normal(lp.mg.fine_op.ndof).astype(np.float32))
    timed_op("lattice_vcycle", lambda l, v: l.mg(v), lp, xl)
    log(f"lattice n_cells {lp.n_cells} "
        f"(lattice ndof {lp.mg.fine_op.ndof})")


if __name__ == "__main__":
    main()
