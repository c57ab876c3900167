"""On-chip A/B: group-ELL vs transpose-gather apply at the 1.39M-DOF
flagship unstructured mesh (randomized node labels).

Measures the steady-state K@u wall per apply for both operators with the
in-jit fori_loop differencing recipe (relay round-trips are ~30 ms, so
eager per-apply timing is meaningless). Prints one JSON line.

Run: python examples/bench_groupell_tpu.py [nx,ny,nz]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _loop_apply(op, u, n):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(u0, op_, k):
        def body(_, v):
            w = op_.apply(v)
            # keep magnitudes bounded without leaving the apply's dtype
            return w / jnp.float32(1e9)

        out = jax.lax.fori_loop(0, k, body, u0)
        return jnp.sum(out)

    # compile both iteration counts first
    s1 = run(u, op, n)
    s2 = run(u, op, 2 * n)
    float(s1), float(s2)
    t0 = time.perf_counter()
    float(run(u, op, n))
    t1 = time.perf_counter()
    float(run(u, op, 2 * n))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / n


def main():
    import jax
    import jax.numpy as jnp

    from femx.assembly_groupell import SolidOperatorGroupELL
    from femx.assembly_tg import SolidOperatorTG
    from femx.mesh import box_tet10

    grid = sys.argv[1] if len(sys.argv) > 1 else "24,24,96"
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.6 / 96
    mesh = box_tet10(nx * h, ny * h, nz * h, mesh_size=h)
    pts = np.asarray(mesh.points)
    conn = np.asarray(mesh.cells["tetra10"])
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    ndof = 3 * len(pts)
    log(f"mesh: {len(pts)} nodes / {ndof} DOF / {len(conn)} tets")

    t0 = time.perf_counter()
    ge, _ = SolidOperatorGroupELL.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                            dtype=np.float32)
    t_build_ge = time.perf_counter() - t0
    kb_gb = sum(k.size * 4 for k in ge.Kb) / 1e9
    log(f"group-ELL build: {t_build_ge:.1f}s host; "
        f"{ge.gather_rows()/1e6:.2f}M wide rows, Kb {kb_gb:.2f} GB, "
        f"buckets g={ge.bucket_g}")

    skip_tg = os.environ.get("FEMX_BENCH_SKIP_TG", "0") == "1"
    t_tg = float("nan")
    if not skip_tg:
        t0 = time.perf_counter()
        tg, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                          dtype=np.float32)
        t_build_tg = time.perf_counter() - t0
        log(f"TG build: {t_build_tg:.1f}s host")

    u = jnp.asarray(rng.standard_normal(3 * ge.n_pad).astype(np.float32))
    t_ge = _loop_apply(ge, u, 50)
    log(f"group-ELL apply: {t_ge*1e3:.2f} ms")
    if not skip_tg:
        ut = jnp.asarray(rng.standard_normal(tg.ndof).astype(np.float32))
        t_tg = _loop_apply(tg, ut, 50)
        log(f"TG apply: {t_tg*1e3:.2f} ms")

    print(json.dumps({
        "metric": "groupell_vs_tg_apply",
        "ndof": ndof,
        "groupell_ms": round(t_ge * 1e3, 3),
        **({} if skip_tg else {
            "tg_ms": round(t_tg * 1e3, 3),
            "speedup": round(t_tg / t_ge, 2)}),
        "groupell_build_s": round(t_build_ge, 1),
        "kb_gb": round(kb_gb, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
