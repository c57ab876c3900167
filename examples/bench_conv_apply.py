"""A/B the conv-form structured apply against the slot form, on-chip.

The conv stencil (femx.assembly_conv) is parity-tested on CPU
(tests/test_conv_apply.py); what needs the chip is whether XLA's TPU conv
emitter beats the slot stack's HBM traffic in practice — at the flagship
size, at the 50M-cliff grid (80x80x320), and at its 2^k-friendly control
(64x64x512). Timing method per memory: in-jit fori differencing + scalar
readback (block_until_ready does not synchronize through the axon relay).

    python examples/bench_conv_apply.py              # default 3 grids
    python examples/bench_conv_apply.py 24,24,96     # named grids only

Prints one JSON line per (grid, variant) and a final summary line.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


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


def bench_apply(call, op, x, iters=20):
    import jax

    @partial(jax.jit, static_argnums=(0, 4))
    def loop(call_, d, x0, seed, n):
        def body(_, c):
            return call_(d, c)
        return jax.lax.fori_loop(0, n, body, x0 + 1e-20 * seed)

    import jax.numpy as jnp

    op = jax.device_put(op)
    seed = jnp.asarray(
        np.random.default_rng(0).standard_normal(x.shape), dtype=x.dtype)
    jax.block_until_ready(loop(call, op, x, seed, 2))
    jax.block_until_ready(loop(call, op, x, seed, 2 + iters))
    t2 = min_time(lambda: loop(call, op, x, seed, 2))
    tN = min_time(lambda: loop(call, op, x, seed, 2 + iters))
    return (tN - t2) / iters


def main():
    import os

    # The slot arm times env-routed op.apply: a preset FEMX_STRUCTURED_APPLY
    # (e.g. exported by a prior conv_flagship job shell) would silently turn
    # this into conv-vs-conv. Pin the env so the A/B is honest.
    os.environ.pop("FEMX_STRUCTURED_APPLY", None)

    import jax
    import jax.numpy as jnp
    from femx.assembly_conv import apply_conv
    from femx.assembly_structured import StructuredSolidOperator

    grids = [tuple(int(v) for v in g.split(",")) for g in sys.argv[1:]] or [
        (24, 24, 96), (80, 80, 320), (64, 64, 512)]
    results = []
    for grid in grids:
        h = 1.6 / grid[2]
        op = StructuredSolidOperator.from_lattice(
            grid, (h, h, h), 2e11, 0.3, dtype=np.float32)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(op.ndof),
            dtype=jnp.float32)
        # correctness footprint on-chip before timing
        ref = np.asarray(op.apply(x[: op.ndof]))
        got = np.asarray(apply_conv(op, x))
        rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        t_slot = bench_apply(lambda d, c: d.apply(c), op, x)
        t_conv = bench_apply(apply_conv, op, x)
        rec = {
            "grid": list(grid), "ndof": op.ndof, "conv_rel_err": rel,
            "slot_ms": round(t_slot * 1e3, 3),
            "conv_ms": round(t_conv * 1e3, 3),
            "speedup": round(t_slot / t_conv, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"conv_apply_ab": results}), flush=True)


if __name__ == "__main__":
    main()
