"""Synthetic core of a BCSR-48 unstructured apply: is it ~3-5 ms?

Design under test (examples/bench_gather_width.py, 2026-08-19: gathers
cost per INDEX; width>=48 rows run 2.5x cheaper per index and 10-40x more
bytes/s): pack nodes into 16-node Morton blocks, pre-assemble K into dense
(48, 48) tiles over (block-row, block-col) pairs, then

  apply = gather u block-cols (wide rows)  ->  batched tile matvec
          ->  per-block-row sum (reshape, NO scatter)

At flagship scale (463k nodes -> 28963 blocks, ~8 tiles/row) the tile
stream is ~2.1 GB f32; HBM roofline ~2.6 ms. This bench measures the XLA
einsum+gather form with synthetic tiles/indices so we know the ceiling
before paying the host assembly build.

Run: python examples/bench_bcsr_core.py [tiles_per_row]
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
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8  # tiles per block-row
    n_nodes = 463_393
    B = 16  # nodes per block
    n_blk = -(-n_nodes // B)
    rng = np.random.default_rng(0)

    tiles = rng.standard_normal((n_blk * T, 48, 48)).astype(np.float32)
    # neighbor blocks are Morton-near: draw cols near the row index
    rows = np.repeat(np.arange(n_blk), T)
    cols = np.clip(rows + rng.integers(-40, 41, size=n_blk * T), 0, n_blk - 1)
    cols = cols.astype(np.int32)

    tiles_d = jnp.asarray(tiles)
    cols_d = jnp.asarray(cols)
    u = jnp.asarray(rng.standard_normal((n_blk, 48)).astype(np.float32))

    @partial(jax.jit, static_argnums=(3,))
    def loop(tiles, cols, u, n):
        def body(_, x):
            ub = x[cols]                       # (n_blk*T, 48) wide gather
            yv = jnp.einsum("tab,tb->ta", tiles, ub)
            y = yv.reshape(n_blk, T, 48).sum(axis=1)
            return y * (1.0 / jnp.maximum(jnp.abs(y).max(), 1e-30))
        return jax.lax.fori_loop(0, n, body, u)

    gb = tiles.nbytes / 1e9
    log(f"n_blk={n_blk} T={T} tiles={gb:.2f} GB")
    iters = 10
    jax.block_until_ready(loop(tiles_d, cols_d, u, 2))
    t2 = min_time(lambda: loop(tiles_d, cols_d, u, 2))
    tN = min_time(lambda: loop(tiles_d, cols_d, u, 2 + iters))
    per = (tN - t2) / iters
    print(json.dumps({
        "tiles_per_row": T, "n_blk": n_blk, "tiles_gb": round(gb, 2),
        "apply_ms": round(per * 1e3, 3),
        "gb_per_s": round(gb / per, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
