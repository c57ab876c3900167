"""Synthetic on-chip validation of the group-ELL apply cost model.

Design sized by examples/groupell_stats.py on the 1.39M-DOF flagship
(r=2 node-pair row blocks, 16-node column groups, Morton column order,
exact-g buckets in bucket-major order):
  B = 2.95M (pair, group) blocks, avg g = 12.7
  per apply: pair-permutation row gather (232k x 24 B)
           + per-bucket u16 row gathers (B x 192 B, fast-regime)
           + per-bucket einsum (n, g, 48) x (n, g, 6, 48) -> (n, 6)
Model: 6.2 ms gather + 4.2 ms K-stream + ~1 ms permute ~= 11.5 ms
(vs the TG operator's measured 42.6 ms). This bench builds the same
shapes with random data and times one apply.

Run: python examples/bench_groupell_core.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    N = 463_393
    NP2 = -(-(N + 1) // 2 // 8) * 8  # pairs, padded to a whole 48-lane row
    S = NP2 * 2 // 16                # 16-node groups
    # bucket layout approximating the measured g histogram (avg 12.74)
    BUCKETS = [(8, 46_000), (11, 50_000), (13, 90_000), (16, 35_000),
               (20, 10_697)]
    B = sum(g * n for g, n in BUCKETS)
    log(f"pairs={NP2} groups={S} blocks={B/1e6:.2f}M "
        f"K={B*6*48*4/1e9:.2f} GB")

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(6 * NP2).astype(np.float32))
    pairperm = jnp.asarray(rng.permutation(NP2).astype(np.int32))
    idx = [jnp.asarray(rng.integers(0, S, size=(n, g)).astype(np.int32))
           for g, n in BUCKETS]
    Kb = [jnp.asarray(rng.standard_normal((n, g, 6, 48)).astype(np.float32)
                      * 1e-3)
          for g, n in BUCKETS]

    def contract(variant, got, kk):
        if variant == "einsum_nr":
            return jnp.einsum("ngw,ngrw->nr", got, kk)
        if variant == "einsum_hi":
            return jnp.einsum("ngw,ngrw->nr", got, kk,
                              precision=jax.lax.Precision.HIGHEST)
        if variant == "mulsum":
            # explicit broadcast-multiply + reduce: pure VPU (exact f32
            # products), no dot lowering
            return jnp.sum(got[:, :, None, :] * kk, axis=(1, 3))
        if variant == "dotgen":
            n, g = got.shape[:2]
            return jax.lax.dot_general(
                got.reshape(n, g * 48), kk.reshape(n, g * 48, 6),
                (((1,), (1,)), ((0,), (0,))))
        if variant == "split6":
            # kk here: tuple of 6 (n, g, 48) — full-array elementwise
            # multiply + reduce per output component, no tiny minor dim
            return jnp.stack([jnp.sum(got * k6, axis=(1, 2))
                              for k6 in kk], axis=1)
        raise ValueError(variant)

    def make_apply(variant, cast=None):
        @jax.jit
        def apply_fn(u_, pairperm_, idx_, Kb_):
            u6 = u_.reshape(-1, 6)                   # bucket-major pairs
            u6m = u6[pairperm_]                      # -> morton pair order
            u16 = u6m.reshape(-1, 48)                # (S', 48) group table
            if cast is not None:
                u16 = u16.astype(cast)
            outs = []
            for ii, kk in zip(idx_, Kb_):
                got = u16[ii]                        # (n, g, 48) wide rows
                o = contract(variant, got, kk)
                outs.append(o.astype(u_.dtype) if cast is not None else o)
            return jnp.concatenate(outs).reshape(-1)
        return apply_fn

    @jax.jit
    def gather_only(u_, pairperm_, idx_):
        u16 = u_.reshape(-1, 6)[pairperm_].reshape(-1, 48)
        return sum(jnp.sum(u16[ii]) for ii in idx_)

    def timed(fn, *args, iters=10):
        @partial(jax.jit, static_argnums=(0, 1))
        def loop(fn_, n, u_, *rest):
            def body(_, c):
                o = fn_(u_ + c, *rest)
                return jnp.sum(o) * jnp.asarray(1e-38, u_.dtype)
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0, u_.dtype))

        def run(n):
            t0 = time.perf_counter()
            float(np.asarray(loop(fn, n, *args)))
            return time.perf_counter() - t0

        run(2); run(2 + iters)
        t2 = min(run(2) for _ in range(2))
        tN = min(run(2 + iters) for _ in range(2))
        return (tN - t2) / iters

    per = timed(gather_only, u, pairperm, idx)
    print(json.dumps({"gather_only_ms": round(per * 1e3, 3),
                      "ns_per_row": round(per / B * 1e9, 3)}), flush=True)

    variants = (
        ("einsum_nr_f32", "einsum_nr", lambda: Kb, None),
        ("einsum_hi_f32", "einsum_hi", lambda: Kb, None),
        ("mulsum_f32", "mulsum", lambda: Kb, None),
        ("dotgen_f32", "dotgen", lambda: Kb, None),
        ("split6_f32", "split6",
         lambda: [tuple(jnp.asarray(np.ascontiguousarray(
             np.asarray(k[:, :, r]))) for r in range(6)) for k in Kb], None),
        ("einsum_nr_bf16", "einsum_nr",
         lambda: [k.astype(jnp.bfloat16) for k in Kb], jnp.bfloat16),
    )
    only = os.environ.get("GECORE_VARIANTS")
    if only:
        names = set(only.split(","))
        variants = tuple(v for v in variants if v[0] in names)
    for name, variant, mk, cast in variants:
        try:
            kb = mk()
            per = timed(make_apply(variant, cast), u, pairperm, idx, kb)
            print(json.dumps({name: {
                "apply_ms": round(per * 1e3, 3),
                "ns_per_block": round(per / B * 1e9, 3)}}), flush=True)
        except Exception as e:
            print(json.dumps({name: {"error": repr(e)[:200]}}), flush=True)
        finally:
            if kb is not Kb:
                del kb


if __name__ == "__main__":
    main()
