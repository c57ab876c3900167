"""Attribute the 49.8M-DOF (80x80x320) solve degradation.

The scaling sweep (README) shows 15.2 MDOF/s at 25.6M DOF but 5.8 at
49.8M with iters 15 -> 20. This times the fine apply and the MG V-cycle
in isolation (in-jit fori differencing) and prints device memory stats.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_loop(call, data, x, iters=20):
    """Difference two in-jit fori loops. `data` (operator/preconditioner
    pytree) is a jit ARGUMENT — closing over it would serialize its arrays
    into the remote-compile payload (HTTP 413 past ~100 MB)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=(0, 4))
    def loop(call_, d, x0, seed, n):
        def body(_, c):
            return call_(d, c)
        return jax.lax.fori_loop(0, n, body, x0 + 1e-20 * seed)

    data = jax.device_put(data)  # ensure every leaf is device-resident
    seed = jnp.asarray(np.random.default_rng(0).standard_normal(x.shape),
                       dtype=x.dtype)
    jax.block_until_ready(loop(call, data, x, seed, 2))
    jax.block_until_ready(loop(call, data, x, seed, 2 + iters))
    t2 = min_time(lambda: loop(call, data, x, seed, 2))
    tN = min_time(lambda: loop(call, data, x, seed, 2 + iters))
    log(f"  raw: n=2 {t2*1e3:.2f} ms, n={2+iters} {tN*1e3:.2f} ms")
    return (tN - t2) / iters


def min_time(thunk, reps=3):
    """block_until_ready through the axon relay does NOT synchronize on the
    device program — force a scalar readback per rep (constant ~30 ms relay
    round-trip, cancelled by the two-loop differencing)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = thunk()
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _apply_call(op, v):
    return op.apply_constrained(v)


def _minv_call(mg, v):
    return mg(v)


def main():
    import jax
    import jax.numpy as jnp
    from femx.solve.multigrid import StructuredMultigrid

    grid = tuple(int(v) for v in
                 (sys.argv[1].split(",") if len(sys.argv) > 1 else (80, 80, 320)))
    h = 1.6 / grid[2]
    ndof = 3 * int(np.prod([2 * g + 1 for g in grid]))
    log(f"grid {grid}, ndof {ndof}")

    mask = np.ones(ndof, dtype=np.float64)
    # fix z=0 plane like the sweep
    Px, Py, Pz = (2 * g + 1 for g in grid)
    g0 = np.zeros((Px, Py, Pz, 3))
    g0[:, :, 0, :] = 1
    mask[np.nonzero(g0.reshape(-1))[0]] = 0

    t0 = time.perf_counter()
    mg = StructuredMultigrid(None, grid, 2e11, 0.3, mask,
                             spacing=(h, h, h), dtype=np.float32)
    log(f"setup {time.perf_counter()-t0:.1f}s; levels "
        f"{[lv.op.n_cells for lv in mg.levels]}")

    dev = jax.devices()[0]
    ms = dev.memory_stats()
    if ms:
        log({k: round(v / 2**30, 2) for k, v in ms.items()
             if "bytes" in k and v})

    op = mg.levels[0].op
    x = jnp.asarray(np.random.default_rng(1).standard_normal(op.ndof),
                    dtype=jnp.float32)

    t_apply = bench_loop(_apply_call, op, x, iters=10)
    log(f"fine apply: {t_apply*1e3:.2f} ms")
    t_v = bench_loop(_minv_call, mg, x, iters=10)
    log(f"V-cycle:    {t_v*1e3:.2f} ms")

    ms = dev.memory_stats()
    if ms:
        log({k: round(v / 2**30, 2) for k, v in ms.items()
             if "bytes" in k and v})


if __name__ == "__main__":
    main()
