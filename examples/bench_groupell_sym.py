"""A/B the symmetric vs full group-ELL storage at the 1.39M-DOF flagship.

Symmetric storage keeps one copy of each (row node, col node) 3x3 tile
(morton r <= c) and reconstructs the lower half in the apply from the same
blocks (flat per-block column contributions + degree-bucketed WIDE row
gathers) minus the double-counted nodal diagonal — halving both the block
storage and the dominant Kb HBM stream (see femx.assembly_groupell).

Reports per variant: build wall, block count/storage, steady apply, and
the full lattice-MG PCG solve (iteration count must match — the operator
is the same matrix). Appends one JSON line per variant to
examples/groupell_sym_results.jsonl when --log is passed.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from femx.assembly_groupell import SolidOperatorGroupELL
    from femx.mesh import box_tet10
    from femx.solve.cg import pcg
    from femx.solve.lattice_precond import LatticePreconditioner

    grid = os.environ.get("FEMX_BENCH_GRID", "24,24,96")
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.6 / 96
    mesh = box_tet10(nx * h, ny * h, nz * h, mesh_size=h)
    ndof = 3 * mesh.num_nodes
    log(f"mesh: {ndof} DOF")

    mask = np.ones(ndof)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(ndof)
    tip = np.where(mesh.points[:, 2] > nz * h - 1e-9)[0]
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
    results = []
    for symmetric in (False, True):
        tag = "sym" if symmetric else "full"
        t0 = time.perf_counter()
        uop, _ = SolidOperatorGroupELL.from_mesh(
            pts_s, conn_s, 2e11, 0.3, dtype=dtype, symmetric=symmetric)
        jax.block_until_ready(uop.Kb)
        t_build = time.perf_counter() - t0
        nblocks = sum(int(i.shape[0]) * g
                      for i, g in zip(uop.idx, uop.bucket_g))
        gb = nblocks * 6 * 48 * 4 / 1e9
        log(f"[{tag}] build {t_build:.1f}s, {nblocks} blocks "
            f"({gb:.2f} GB f32)")

        t0 = time.perf_counter()
        uop = uop.with_free_mask(uop.to_internal(mask_s).astype(dtype))
        bj_data = uop.block_jacobi_tensors()
        lp = LatticePreconditioner(
            pts_s, conn_s, 2e11, 0.3, mask_s, dtype=dtype,
            node_perm=uop.new_of_old, bj_fn=type(uop).apply_block_jacobi,
            bj_data=bj_data, n_caller=uop.n_pad)
        t_pre = time.perf_counter() - t0
        log(f"[{tag}] mask+bj+lattice {t_pre:.1f}s")

        fu = jnp.asarray(uop.to_internal(f_s * mask_s), dtype=dtype)

        @jax.jit
        def apply_fn(op_, x):
            return op_.apply_constrained(x)

        x0 = fu
        r = apply_fn(uop, x0)
        jax.block_until_ready(r)
        t_apply = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            r = apply_fn(uop, x0)
            _ = float(r[0])
            t_apply = min(t_apply, time.perf_counter() - t0)
        log(f"[{tag}] apply {t_apply*1e3:.2f} ms")

        @jax.jit
        def solve_u(fv, op_, lp_):
            res = pcg(op_.apply_constrained, fv, M_inv_diag=lp_,
                      tol=1e-5, maxiter=2000)
            return res.x, res.iterations, res.residual_norm

        t0 = time.perf_counter()
        xu, itu, rnu = solve_u(fu, uop, lp)
        jax.block_until_ready(xu)
        t_compile = time.perf_counter() - t0
        t_solve = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            xu, itu, rnu = solve_u(fu, uop, lp)
            jax.block_until_ready(xu)
            _ = float(rnu)
            t_solve = min(t_solve, time.perf_counter() - t0)
        log(f"[{tag}] solve {t_solve:.3f}s ({int(itu)} iters, "
            f"res {float(rnu):.2e}, compile {t_compile:.1f}s)")
        results.append({
            "variant": tag, "ndof": ndof, "build_s": round(t_build, 2),
            "precond_s": round(t_pre, 2), "blocks": nblocks,
            "storage_gb": round(gb, 3), "apply_ms": round(t_apply * 1e3, 3),
            "solve_s": round(t_solve, 3), "iters": int(itu),
            "residual": float(rnu),
        })
        del uop, lp, bj_data, fu

    print(json.dumps(results))
    if "--log" in sys.argv:
        with open(os.path.join(os.path.dirname(__file__),
                               "groupell_sym_results.jsonl"), "a") as fh:
            for r in results:
                fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
