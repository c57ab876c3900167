"""Flagship unstructured solve: additive vs multiplicative lattice coupling.

mode="add" (production default) costs one block-Jacobi + lattice V-cycles
per iteration; mode="mult" adds one unstructured A-apply (43 ms — the
per-row gather wall) per iteration but couples the corrections
multiplicatively, and mode="mult_sym" adds two. Worth it iff the iteration
count drops enough to pay for the extra applies. This measures all three
warm at 1.39M DOF with randomized node labels (the bench.py scenario).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from femx.mesh import box_tet10
    from femx.solve.cg import pcg, fcg
    from femx.assembly_tg import SolidOperatorTG
    from femx.solve.lattice_precond import (
        LatticePreconditioner, estimate_bj_lambda_max)

    grid = (24, 24, 96)
    h = 1.6 / 96
    dims = tuple(n * h for n in grid)
    mesh = box_tet10(*dims, mesh_size=h)
    ndof = 3 * mesh.num_nodes
    mask = np.ones(ndof)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(ndof)
    tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)

    conn_u = np.asarray(mesh.cells["tetra10"])
    pts_u = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts_u))
    pts_s = np.empty_like(pts_u)
    pts_s[relabel] = pts_u
    conn_s = relabel[conn_u]
    mask_s = np.empty_like(mask)
    mask_s.reshape(-1, 3)[relabel] = mask.reshape(-1, 3)
    f_s = np.empty_like(f)
    f_s.reshape(-1, 3)[relabel] = f.reshape(-1, 3)

    dtype = np.float32
    t0 = time.perf_counter()
    uop, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3, dtype=dtype)
    uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask_s),
                                         dtype=uop.dtype))
    bj_data = uop.soa.block_jacobi_tensors()
    log(f"TG setup: {time.perf_counter()-t0:.1f}s")
    fu = jnp.asarray(uop.to_internal(f_s * mask_s), dtype=uop.dtype)
    tol = 1e-5

    @jax.jit
    def solve_pcg(fv, op_, lp_):
        r = pcg(op_.apply_constrained, fv, M_inv_diag=lp_, tol=tol,
                maxiter=2000)
        return r.x, r.iterations, r.residual_norm

    @jax.jit
    def solve_fcg(fv, op_, lp_):
        r = fcg(op_.apply_constrained, fv, M_inv=lp_, tol=tol, maxiter=2000)
        return r.x, r.iterations, r.residual_norm

    def run(mode, solver, **kw):
        t0 = time.perf_counter()
        lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask_s,
                                   dtype=dtype, node_perm=uop.new_of_old,
                                   bj_fn=type(uop.soa).apply_block_jacobi,
                                   bj_data=bj_data, mode=mode, **kw)
        log(f"[{mode}] precond setup: {time.perf_counter()-t0:.1f}s")
        x, it, rn = solver(fu, uop, lp)
        float(rn)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            x, it, rn = solver(fu, uop, lp)
            v = float(rn)
            best = min(best, time.perf_counter() - t0)
        log(f"[{mode}] warm {best:.3f}s  iters {int(it)}  res {v:.2e}")

    run("add", solve_pcg)
    run("mult", solve_fcg, op=uop)
    lam = float(estimate_bj_lambda_max(uop, type(uop.soa).apply_block_jacobi,
                                       bj_data))
    log(f"lambda_max(D^-1 A) ~ {lam:.3f}")
    run("mult_sym", solve_pcg, op=uop, omega=1.0 / lam)


if __name__ == "__main__":
    main()
