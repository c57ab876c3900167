"""femx headline benchmark: ~1M-DOF 3D solid cantilever, assemble + PCG solve.

North-star target (BASELINE.json): 1M-DOF static solve (assemble + PCG) in
< 2 s wall on TPU. The reference app has no benchmarks (SURVEY.md §6); its
pipeline on this problem class is a Python per-element assembly loop plus
SuperLU — minutes at this scale on CPU. vs_baseline = target_seconds / ours
(>1.0 means beating the 2 s target).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_case(nx, ny, nz, dtype):
    """Solid cantilever: box meshed nx x ny x nz hexes (6 tets each), fixed
    at x=0, downward tip line load at x=L."""
    from femx.assembly import SolidOperator
    from femx.elements import tet10 as tet10_el
    from femx.mesh import box_tet10
    import jax.numpy as jnp

    L, H, W = 2.0, 0.4, 0.4
    t0 = time.perf_counter()
    mesh = box_tet10(L, H, W, mesh_size=min(L / nx, H / ny, W / nz))
    t_mesh = time.perf_counter() - t0
    conn = mesh.cells["tetra10"]
    n_nodes = mesh.num_nodes
    log(f"mesh: {n_nodes} nodes, {len(conn)} tet10, {3 * n_nodes} DOF ({t_mesh:.2f}s host)")

    points = np.asarray(mesh.points, dtype=dtype)
    C = tet10_el.material_matrix(2e11, 0.3, dtype=jnp.dtype(dtype))

    mask = np.ones(3 * n_nodes, dtype=dtype)
    fixed_nodes = np.where(mesh.points[:, 0] < 1e-9)[0]
    mask[(3 * fixed_nodes[:, None] + np.arange(3)).ravel()] = 0.0
    f = np.zeros(3 * n_nodes, dtype=dtype)
    tip_nodes = np.where(mesh.points[:, 0] > L - 1e-9)[0]
    f[3 * tip_nodes + 1] = -1000.0 / len(tip_nodes)
    return mesh, points, conn, mask, f, C


def main():
    import jax
    import jax.numpy as jnp
    from femx.assembly import SolidOperator
    from femx.elements import tet10 as tet10_el
    from femx.solve.cg import pcg

    dtype = np.float32 if jax.default_backend() != "cpu" else np.float64
    # ~1.05M DOF: 52x26x26 hexes -> 210k tets -> ~350k nodes.
    nx, ny, nz = (int(v) for v in os.environ.get("FEMX_BENCH_GRID", "52,26,26").split(","))
    mesh, points, conn, mask, f, C = build_case(nx, ny, nz, dtype)
    ndof = 3 * mesh.num_nodes

    conn_j = jnp.asarray(conn)
    points_j = jnp.asarray(points)
    mask_j = jnp.asarray(mask)
    f_j = jnp.asarray(f * mask)
    tol = 1e-5 if dtype == np.float32 else 1e-8

    def assemble(points_flat):
        coords = points_flat.reshape(-1, 3)[conn_j]
        dN, wdet, _ = tet10_el.jacobians(coords)
        op = SolidOperator(conn=conn_j, dN=dN, wdet=wdet, C=jnp.asarray(C),
                           n_nodes=mesh.num_nodes, weight=tet10_el.GAUSS_WEIGHT_CORRECT,
                           free_mask=mask_j)
        return op

    @jax.jit
    def step(points_flat, f_vec):
        op = assemble(points_flat)
        minv = op.block_jacobi_preconditioner()
        res = pcg(op.apply_constrained, f_vec, M_inv_diag=minv, tol=tol, maxiter=6000)
        return res.x, res.iterations, res.residual_norm

    # warmup/compile
    t0 = time.perf_counter()
    u, it, rn = step(points_j, f_j)
    jax.block_until_ready(u)
    t_compile = time.perf_counter() - t0
    log(f"compile+first run: {t_compile:.1f}s, iters={int(it)}, residual={float(rn):.2e}")

    # timed runs (assemble + solve together, steady state)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, it, rn = step(points_j, f_j)
        jax.block_until_ready(u)
        times.append(time.perf_counter() - t0)
    t_best = min(times)
    iters = int(it)
    log(f"steady-state assemble+solve: {t_best:.3f}s (runs: {[round(t, 3) for t in times]}), "
        f"iters={iters}, residual={float(rn):.2e}, dtype={np.dtype(dtype).name}")

    tip = int(np.argmax(points[:, 0] + (points[:, 1] == 0)))
    log(f"sanity: max|u| = {float(jnp.max(jnp.abs(u))):.3e} m")

    mdof_s = ndof / 1e6 / t_best
    target = 2.0  # BASELINE.json north star: < 2 s at 1M DOF
    print(json.dumps({
        "metric": "solid_cantilever_assemble_solve_wall",
        "value": round(t_best, 4),
        "unit": f"s @ {ndof} DOF (PCG tol {tol:g}, {iters} iters, {np.dtype(dtype).name})",
        "vs_baseline": round(target / t_best, 3),
    }))


if __name__ == "__main__":
    main()
