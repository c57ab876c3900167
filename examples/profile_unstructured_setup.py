"""Profile the unstructured-path setup stages + re-bench the solve.

Mirrors bench.py's unstructured section (randomized node labels on the
1.39M-DOF cantilever) but times every setup stage separately so the
72.9 s wall (BENCH_r03 log) can be attributed and attacked.
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
    from femx.solve.cg import pcg

    grid = (24, 24, 96)
    h = 1.6 / 96
    dims = tuple(n * h for n in grid)

    t0 = time.perf_counter()
    mesh = box_tet10(*dims, mesh_size=h)
    ndof = 3 * mesh.num_nodes
    log(f"mesh: {ndof} DOF ({time.perf_counter()-t0:.2f}s)")

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

    from femx.assembly_tg import SolidOperatorTG
    from femx.solve.lattice_precond import LatticePreconditioner

    dtype = np.float32

    t0 = time.perf_counter()
    uop, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3, dtype=dtype)
    t_tg = time.perf_counter() - t0
    log(f"TG from_mesh: {t_tg:.2f}s")

    t0 = time.perf_counter()
    uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask_s),
                                         dtype=uop.dtype))
    jax.block_until_ready(uop.free_mask)
    t_mask = time.perf_counter() - t0
    log(f"free mask: {t_mask:.2f}s")

    t0 = time.perf_counter()
    bj_data = uop.soa.block_jacobi_tensors()
    jax.block_until_ready(bj_data)
    t_bj = time.perf_counter() - t0
    log(f"block_jacobi_tensors: {t_bj:.2f}s")

    t0 = time.perf_counter()
    lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask_s,
                               dtype=dtype, node_perm=uop.new_of_old,
                               bj_fn=type(uop.soa).apply_block_jacobi,
                               bj_data=bj_data)
    t_lp = time.perf_counter() - t0
    log(f"LatticePreconditioner: {t_lp:.2f}s")

    fu = jnp.asarray(uop.to_internal(f_s * mask_s), dtype=uop.dtype)
    tol = 1e-5

    @jax.jit
    def solve_u(fv, op_, lp_):
        r = pcg(op_.apply_constrained, fv, M_inv_diag=lp_, tol=tol,
                maxiter=2000)
        return r.x, r.iterations, r.residual_norm

    t0 = time.perf_counter()
    xu, itu, rnu = solve_u(fu, uop, lp)
    jax.block_until_ready(xu)
    t_compile = time.perf_counter() - t0
    log(f"compile+first solve: {t_compile:.2f}s")

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        xu, itu, rnu = solve_u(fu, uop, lp)
        jax.block_until_ready(xu)
        best = min(best, time.perf_counter() - t0)
    log(f"warm solve: {best:.3f}s ({int(itu)} iters, res {float(rnu):.2e})")


if __name__ == "__main__":
    main()
