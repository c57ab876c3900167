"""Unstructured-path benchmark at flagship scale on the real TPU.

Builds the 1.39M-DOF cantilever with RANDOM node labels (so no structured
metadata survives), solves with the transpose-gather operator under (a) the
structured-lattice MG preconditioner and (b) plain block-Jacobi, and prints
wall times + iteration counts. All operators/preconditioners enter jit as
pytree ARGUMENTS (closures exceed the remote-compile payload limit at this
scale — HTTP 413).

Usage:  python examples/bench_unstructured.py [nx,ny,nz]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10
from femx.solve.cg import pcg
from femx.solve.lattice_precond import LatticePreconditioner


def log(*a):
    print(*a, flush=True)


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

    t0 = time.perf_counter()
    op, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3, dtype=np.float32)
    ndof = op.ndof
    mask = np.ones(ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n : 3 * n + 3] = 0
    op = op.with_free_mask(jnp.asarray(op.to_internal(mask)))
    f = np.zeros(ndof)
    tips = np.where(pts_s[:, 2] > nz * h - 1e-9)[0]
    f[3 * tips + 1] = -1000.0 / len(tips)
    f_int = jnp.asarray(op.to_internal(f * mask), dtype=jnp.float32)
    log(f"TG operator setup: {time.perf_counter()-t0:.1f}s, ndof {ndof}")

    bj_data = op.soa.block_jacobi_tensors()
    bj_fn = type(op.soa).apply_block_jacobi
    t0 = time.perf_counter()
    lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask,
                               dtype=np.float32, node_perm=op.new_of_old,
                               bj_fn=bj_fn, bj_data=bj_data)
    log(f"lattice preconditioner setup: {time.perf_counter()-t0:.1f}s, "
        f"n_cells {lp.n_cells}")

    @jax.jit
    def solve_lp(fv, op_, lp_):
        r = pcg(op_.apply_constrained, fv, M_inv_diag=lp_, tol=1e-5,
                maxiter=2000)
        return r.x, r.iterations, r.residual_norm

    t0 = time.perf_counter()
    x, it, rn = solve_lp(f_int, op, lp)
    jax.block_until_ready(x)
    log(f"lattice-MG PCG compile+first: {time.perf_counter()-t0:.1f}s, "
        f"iters {int(it)}, res {float(rn):.2e}")
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        x, it, rn = solve_lp(f_int, op, lp)
        jax.block_until_ready(x)
        _ = float(rn)
        times.append(time.perf_counter() - t0)
    log(f"lattice-MG PCG steady: {min(times):.2f}s ({int(it)} iters)")
    log(f"sanity max|u| = {float(jnp.max(jnp.abs(x))):.3e}")

    # Block-Jacobi baseline, CHUNKED: a single long while_loop (>~1000
    # iterations, ~1 min on-device) exceeds the tunnel's per-execution
    # limit and faults the TPU worker, so restart from x every 300.
    @jax.jit
    def solve_bj_chunk(fv, x0, op_, t):
        r = pcg(op_.apply_constrained, fv, x0=x0,
                M_inv_diag=lambda v: op_.soa.apply_block_jacobi(t, v),
                tol=1e-5, maxiter=300)
        return r.x, r.iterations, r.residual_norm

    xb = jnp.zeros_like(f_int)
    xb, _, _ = solve_bj_chunk(f_int, xb, op, bj_data)  # compile
    xb = jnp.zeros_like(f_int)
    total = 0
    t0 = time.perf_counter()
    for _ in range(6):
        xb, itb, rnb = solve_bj_chunk(f_int, xb, op, bj_data)
        jax.block_until_ready(xb)
        total += int(itb)
        if float(rnb) <= 1e-5:
            break
    dt = time.perf_counter() - t0
    log(f"block-Jacobi PCG: {dt:.2f}s for {total} iters "
        f"({1e3*dt/max(total,1):.1f} ms/iter), res {float(rnb):.2e}"
        + ("" if float(rnb) <= 1e-5 else " (budget-capped, NOT converged)"))


if __name__ == "__main__":
    main()
