"""Gather cost vs ROW WIDTH on the real chip — sizing the block-gather idea.

The TG apply's 42.6 ms at 1.39M DOF is gather-bound: ~6.6M row gathers at
~4.3 ns/row (width-invariant in the 12 B range measured so far). If the
per-row cost stays flat as rows widen to 8-16 nodes (96-192 B), gathering
NODE BLOCKS instead of nodes (then selecting in-register via tiny one-hot
einsums) cuts the index count ~2.5-4x and with it the apply time — without
Pallas. This microbench measures ns/row for row widths 3..96 f32 lanes at
a fixed index count, plus a sortedness control.

Run: python examples/bench_gather_width.py [n_rows_millions]
One JSON line per (width, sorted) case; summary line last.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def min_time(thunk, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = thunk()
        float(out.ravel()[0])  # force scalar readback through the relay
        best = min(best, time.perf_counter() - t0)
    return best


def bench_gather(n_idx, width, n_src, sort_idx, iters=20):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx = rng.integers(0, n_src, size=n_idx).astype(np.int32)
    if sort_idx:
        idx = np.sort(idx)
    src = jnp.asarray(
        rng.standard_normal((n_src, width)), dtype=jnp.float32)
    idx = jnp.asarray(idx)

    @partial(jax.jit, static_argnums=(3,))
    def loop(src_, idx_, seed, n):
        def body(_, c):
            # fold the gather result back into a (n_src, width)-shaped
            # carry so the loop body is gather -> reduce -> broadcast and
            # XLA cannot hoist the gather out of the loop
            g = c[idx_]  # (n_idx, width) row gather
            s = g.sum() * 1e-30
            return c + s
        return jax.lax.fori_loop(0, n, body, src_ + 1e-20 * seed)

    seed = jnp.asarray(rng.standard_normal((n_src, width)),
                       dtype=jnp.float32)
    jax.block_until_ready(loop(src, idx, seed, 2))
    jax.block_until_ready(loop(src, idx, seed, 2 + iters))
    t2 = min_time(lambda: loop(src, idx, seed, 2))
    tN = min_time(lambda: loop(src, idx, seed, 2 + iters))
    per_apply = (tN - t2) / iters
    return per_apply


def main():
    n_idx = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 3_300_000
    n_src = 463_393  # flagship node count
    rows = []
    for width in (3, 6, 12, 24, 48, 96):
        for sort_idx in (False, True):
            # keep the source table at flagship scale; width widens rows
            t = bench_gather(n_idx, width, max(n_src // (width // 3), 4096),
                             sort_idx)
            rec = {
                "n_idx": n_idx, "width": width, "sorted": sort_idx,
                "ms": round(t * 1e3, 3),
                "ns_per_row": round(t / n_idx * 1e9, 3),
                "gb_per_s": round(n_idx * width * 4 / t / 1e9, 1),
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"gather_width_sweep": rows}))


if __name__ == "__main__":
    main()
