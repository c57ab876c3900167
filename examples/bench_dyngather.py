"""Throughput of Mosaic's tpu.dynamic_gather vs table height.

jax 0.9.0's Pallas-TPU gather lowering (pallas/mosaic/lowering.py:2465)
accepts exactly one pattern: lax.gather where operand, indices[..., 0] and
output all share one 2D shape, lowered to tpu.dynamic_gather along sublanes
(out[i,j] = tab[idx[i,j], j]) or lanes. XLA's own take_along_axis lowers to
a general gather at ~8.3 ns/element (examples/bench_routed_gather.py) — the
same per-index cost that makes the unstructured TG apply gather-bound. If
dynamic_gather runs at VPU rate and its cost does NOT grow with the table
height, a routed (gather/transpose/gather) formulation of the arbitrary
mesh gather becomes pure streaming.

Measures ns/element for H in 8..4096 at fixed total output (~32M el).

Run: python examples/bench_dyngather.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from femx.elements.pallas_structured import ensure_tpu_compile_env

    ensure_tpu_compile_env()

    DNUMS = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
        operand_batching_dims=(1,),
        start_indices_batching_dims=(1,),
    )

    def kernel(t_ref, i_ref, o_ref):
        t = t_ref[...]
        idx = i_ref[...]
        o_ref[...] = lax.gather(
            t, idx[..., None], DNUMS, (1, 1),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    TOTAL = 32 * 1024 * 1024 // 128  # output rows across the grid

    rows = []
    for H in (8, 32, 128, 512, 2048, 4096):
        G = max(1, TOTAL // H)
        rng = np.random.default_rng(0)
        tab = jnp.asarray(rng.standard_normal((H, 128)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, H, size=(G * H, 128)).astype(np.int32))

        @jax.jit
        def run(tab_, idx_):
            return pl.pallas_call(
                kernel,
                grid=(G,),
                out_shape=jax.ShapeDtypeStruct((G * H, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((H, 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((H, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
            )(tab_, idx_)

        try:
            out = run(tab, idx)
            ok = bool(np.array_equal(
                np.asarray(out),
                np.asarray(tab)[np.asarray(idx),
                                np.arange(128)[None, :]]))
            n_el = G * H * 128
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = run(tab, idx)
                float(np.asarray(o).ravel()[0])
                best = min(best, time.perf_counter() - t0)
            rec = {"H": H, "grid": G, "ns_per_el": round(best / n_el * 1e9, 4),
                   "ms": round(best * 1e3, 3), "correct": ok}
        except Exception as e:
            msg = str(e)
            for marker in ("Mosaic failed", "Unsupported", "NotImplemented"):
                i = msg.find(marker)
                if i >= 0:
                    msg = msg[i:i + 200]
                    break
            rec = {"H": H, "error": f"{type(e).__name__}: {msg[:200]}"}
        print(json.dumps(rec), flush=True)
        rows.append(rec)


if __name__ == "__main__":
    main()
