"""Map which lattice cell-count extents give a fast structured apply.

Context (examples/revalidation_results.jsonl, cliff_* jobs): at equal
~50M DOF, (80,80,320) and both its permutations run the fine apply at
50-53 ms while (64,64,512) runs 24 ms — a 2.1x penalty that follows the
extents themselves, not their order. Before building a ghost-padding fix
into StructuredMultigrid we need to know WHICH paddings restore the fast
rate (80->96? nz->2^k only? full 2^k everywhere?).

This scans fine-operator applies only (no MG setup, no coarse factor) so
each shape costs one compile + a few timed loops. Cost model printed per
shape: ns/cell, so shapes of different sizes compare directly.

Run: python examples/bench_apply_shapes.py [shape1 shape2 ...]
  shapes as nx,ny,nz; default panel isolates the 80-vs-2^k axes.
One JSON line per shape; summary line last.
"""
from __future__ import annotations

import json
import sys
import time

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


def bench_shape(grid, iters=10):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from femx.assembly_structured import StructuredSolidOperator

    h = 1.6 / grid[2]
    op = StructuredSolidOperator.from_lattice(
        grid, (h, h, h), 2e11, 0.3, dtype=np.float32)
    # fix the z=0 plane (same as the scaling sweep)
    Px, Py, Pz = op.grid_shape
    g0 = np.zeros((Px, Py, Pz, 3), dtype=np.float32)
    g0[:, :, 0, :] = 1
    mask = op.to_internal(1.0 - g0.reshape(-1))
    op = op.with_free_mask(mask)

    @partial(jax.jit, static_argnums=(3,))
    def loop(d, x0, seed, n):
        def body(_, c):
            return d.apply_constrained(c)
        return jax.lax.fori_loop(0, n, body, x0 + 1e-20 * seed)

    x = jnp.asarray(np.random.default_rng(1).standard_normal(op.ndof),
                    dtype=jnp.float32)
    seed = jnp.asarray(np.random.default_rng(0).standard_normal(op.ndof),
                       dtype=jnp.float32)
    op = jax.device_put(op)
    t0 = time.perf_counter()
    jax.block_until_ready(loop(op, x, seed, 2))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(loop(op, x, seed, 2 + iters))
    t2 = min_time(lambda: loop(op, x, seed, 2))
    tN = min_time(lambda: loop(op, x, seed, 2 + iters))
    per_apply = (tN - t2) / iters
    cells = int(np.prod(grid))
    return {
        "grid": list(grid), "cells": cells, "ndof": op.ndof,
        "apply_ms": round(per_apply * 1e3, 3),
        "ns_per_cell": round(per_apply / cells * 1e9, 3),
        "compile_s": round(compile_s, 1),
    }


DEFAULT_PANEL = (
    # anchors (measured in the cliff jobs; re-run here apply-only)
    (80, 80, 320),
    (64, 64, 512),
    # isolate nz: is a 2^k minor axis alone enough?
    (80, 80, 256),
    (64, 64, 320),
    # isolate ny vs nx
    (80, 64, 320),
    (64, 80, 320),
    # candidate pads of 80 that are NOT full 2^k
    (96, 96, 320),
    (80, 80, 384),
)


def main():
    if len(sys.argv) > 1:
        panel = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    else:
        panel = list(DEFAULT_PANEL)
    rows = []
    for grid in panel:
        log(f"--- {grid}")
        try:
            rec = bench_shape(grid)
        except Exception as e:  # keep scanning on OOM etc.
            rec = {"grid": list(grid), "error": repr(e)[:200]}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"apply_shape_sweep": rows}), flush=True)


if __name__ == "__main__":
    main()
