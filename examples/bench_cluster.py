"""Clustered dense-block operator vs transpose-gather at flagship scale.

The TG apply's cost is per gather ROW (~4.3 ns/row, width-invariant):
2 x 10E rows/apply = 43 ms at 1.39M DOF. SolidOperatorCluster replaces the
per-element slot incidences with per-cluster unique-node incidences
(m ~ 35 unique nodes per 16-tet Morton cluster vs 160 slots), cutting both
gather directions ~4x and moving the physics to batched dense MXU matvecs.
This script measures the tradeoff honestly at the flagship 1.39M-DOF
shuffled-box mesh: host build time, device memory, ms/apply for both
operators, and an equality check.

Usage: python examples/bench_cluster.py [nx,ny,nz] [cluster_size]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from femx.assembly_cluster import SolidOperatorCluster
from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10


def log(*a):
    print(*a, flush=True)


def timed_op(name, fn, data, x0, reps=(4, 12)):
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
    grid = (24, 24, 96)
    if len(sys.argv) > 1:
        grid = tuple(int(v) for v in sys.argv[1].split(","))
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = 1.6 / 96
    dims = tuple(g * h for g in grid)
    mesh = box_tet10(*dims, mesh_size=h)
    pts = np.asarray(mesh.points)
    conn = np.asarray(mesh.cells["tetra10"])
    # shuffle node ids: honest unstructured conditions
    rng = np.random.default_rng(3)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    ndof = 3 * len(pts)
    log(f"mesh: {len(pts)} nodes / {ndof} DOF, {len(conn)} tets, "
        f"cluster_size={k}")

    t0 = time.perf_counter()
    tg, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                      dtype=np.float32)
    log(f"TG build: {time.perf_counter()-t0:.1f}s "
        f"(rows/apply {20*len(conn)/1e6:.2f}M)")

    t0 = time.perf_counter()
    cl, _ = SolidOperatorCluster.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                           dtype=np.float32, cluster_size=k)
    rows = cl.gather_rows()
    kbytes = sum(int(np.prod(K.shape)) * 4 for K in cl.Kcl) / 1e6
    log(f"cluster build: {time.perf_counter()-t0:.1f}s "
        f"(rows/apply {rows/1e6:.2f}M, Kcl {kbytes:.0f} MB, "
        f"classes {[int(m) for m in cl.class_M]})")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(ndof),
                    jnp.float32)
    x_tg = jnp.asarray(tg.to_internal(np.asarray(x)))
    x_cl = jnp.asarray(cl.to_internal(np.asarray(x)))

    # equality first
    y_tg = tg.to_global(np.asarray(tg.apply(x_tg)))
    y_cl = cl.to_global(np.asarray(cl.apply(x_cl)))
    err = np.abs(y_tg - y_cl).max() / np.abs(y_tg).max()
    log(f"rel max diff TG vs cluster: {err:.2e}")

    t_tg = timed_op("tg_apply", lambda o, v: o.apply(v), tg, x_tg)
    t_cl = timed_op("cluster_apply", lambda o, v: o.apply(v), cl, x_cl)
    log(f"speedup: {t_tg/t_cl:.2f}x")


if __name__ == "__main__":
    main()
