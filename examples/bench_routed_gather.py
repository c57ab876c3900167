"""Can a 3-stage ROUTED gather beat the narrow row gather on TPU?

The unstructured TG apply's floor is two narrow (width-3) row gathers of
~3.1M indices at ~5.25 ns/index (examples/bench_gather_width.py): ~33 ms
of the 42.6 ms apply at 1.39M DOF. Narrow gathers pay per-INDEX; but an
arbitrary gather out[k] = u[c[k]] factors into three lane-parallel ops:

  1. column gather  A[g, l] = U[idxA[g, l], l]   (take_along_axis, axis=0)
  2. per-128-tile transpose of A
  3. column gather  out[i, j] = At[idxB[i, j], j]

with U the (S, 128) table (value n at (n//128, n%128)) and idxA/idxB
precomputed host-side: an output k destined for lane j with source
(r, c) = (c[k]//128, c[k]%128) is staged at A[t*128 + j, c] so the tile
transpose lands it at At[t*128 + c, j]. Slot (t, j, c) capacity 1; t is
assigned greedily per (j, c) pair. All three steps are dense vector ops —
if XLA lowers take_along_axis(axis=0) to the VPU's dynamic-gather
(Mosaic: "2D gather"), the cost is pure HBM streaming (~5 passes over M
floats) instead of per-index latency.

This measures, on the real chip:
  - baseline: narrow (width-1 and width-3) row gathers at M indices
  - stage cost: take_along_axis(axis=0) alone (i32 vs default promotion)
  - the full 3-stage routed gather, correctness-checked vs the baseline

Run: python examples/bench_routed_gather.py [M]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_routing(c: np.ndarray, n_src: int):
    """Precompute (idxA, idxB) int32 tables for out[k] = u[c[k]].

    c: (M,) int64/int32 source indices, M % 128 == 0 assumed (pad first).
    Returns idxA (P, 128) into the (S, 128) source table, idxB (M//128, 128)
    into the transposed staging table, with P = 128 * T.
    """
    M = c.shape[0]
    assert M % 128 == 0
    j = np.arange(M, dtype=np.int64) % 128          # output lane
    r, cc = c // 128, c % 128                        # source row / lane
    # greedy tile assignment: t = running count per (lane j, source lane cc)
    key = j * 128 + cc
    order = np.argsort(key, kind="stable")
    sk = key[order]
    starts = np.r_[0, np.flatnonzero(np.diff(sk)) + 1]
    runlen = np.diff(np.r_[starts, M])
    t_sorted = np.arange(M, dtype=np.int64) - np.repeat(starts, runlen)
    t = np.empty(M, dtype=np.int64)
    t[order] = t_sorted
    T = int(t.max()) + 1
    P = 128 * T
    idxA = np.zeros((P, 128), dtype=np.int32)
    # staging slot for k: A[t*128 + j, cc] <- U[r, cc]
    idxA[t * 128 + j, cc] = r
    # after per-tile transpose: At[t*128 + cc, j]
    idxB = (t * 128 + cc).astype(np.int32).reshape(-1, 128)
    return idxA, idxB, T


def min_time(thunk, reps=5):
    """Relay-safe: forces a scalar readback (block_until_ready alone
    returns at dispatch time through the axon relay — commit 36df1f5)."""
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = thunk()
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def loop_time(make_loop, iters=20):
    """Per-iteration time of a jitted fori_loop body: (t(2+iters) - t(2)) /
    iters, each timed with a scalar readback (amortizes dispatch + readback
    out of the measurement)."""
    f2 = make_loop(2)
    fN = make_loop(2 + iters)
    float(np.asarray(f2()).ravel()[0])  # compile
    float(np.asarray(fN()).ravel()[0])
    t2, _ = min_time(f2, reps=3)
    tN, _ = min_time(fN, reps=3)
    return (tN - t2) / iters


def main():
    import jax
    import jax.numpy as jnp

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 3_145_728  # ~3.1M
    N = 466_000  # ~1.39M DOF / 3 nodes
    S = (N + 127) // 128
    N_pad = S * 128
    rng = np.random.default_rng(0)
    u = rng.standard_normal(N_pad).astype(np.float32)
    c = rng.integers(0, N, size=M).astype(np.int64)

    t0 = time.perf_counter()
    idxA, idxB, T = build_routing(c, N_pad)
    t_route = time.perf_counter() - t0
    log(f"routing built: T={T} staging tiles, P={128*T} rows, "
        f"{t_route:.2f}s host")

    U = jnp.asarray(u.reshape(S, 128))
    u_flat = jnp.asarray(u)
    u3 = jnp.asarray(np.repeat(u[:N], 3).reshape(N, 3))  # width-3 table
    cj = jnp.asarray(c.astype(np.int32))
    iA = jnp.asarray(idxA)
    iB = jnp.asarray(idxB)

    from functools import partial

    rows = {}

    # --- correctness of the routed form (one un-looped run) --------------
    @jax.jit
    def routed(Ut, iAt, iBt):
        A = jnp.take_along_axis(Ut, iAt, axis=0)          # (P, 128)
        At = A.reshape(-1, 128, 128).swapaxes(1, 2).reshape(-1, 128)
        return jnp.take_along_axis(At, iBt, axis=0)       # (M//128, 128)

    out = routed(U, iA, iB)
    ok = bool(np.array_equal(np.asarray(out).ravel(), u[c]))
    log(f"routed correct: {ok}")

    # --- loop-timed variants (chained so iterations can't overlap/DCE) ---
    @partial(jax.jit, static_argnums=(2,))
    def narrow_loop(t, i, n):
        def body(_, acc):
            o = (t + acc)[i]
            # full-sum dependency: a [0]-element readout would let XLA
            # shrink the gather itself to one index
            return jnp.sum(o) * jnp.asarray(1e-38, t.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, t.dtype))

    tt = loop_time(lambda n: (lambda: narrow_loop(u_flat, cj, n)))
    rows["narrow_w1"] = {"ms": tt * 1e3, "ns_per_idx": tt / M * 1e9}

    tt = loop_time(lambda n: (lambda: narrow_loop(u3, cj % N, n)))
    rows["narrow_w3"] = {"ms": tt * 1e3, "ns_per_idx": tt / M * 1e9}

    @partial(jax.jit, static_argnums=(3,))
    def routed_loop(Ut, iAt, iBt, n):
        def body(_, acc):
            o = routed(Ut + acc, iAt, iBt)
            return jnp.sum(o) * jnp.asarray(1e-38, Ut.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, Ut.dtype))

    tt = loop_time(lambda n: (lambda: routed_loop(U, iA, iB, n)))
    rows["routed_3stage"] = {"ms": tt * 1e3, "ns_per_idx": tt / M * 1e9,
                             "correct": ok, "staging_tiles": T}

    # --- stage decomposition: take_along alone / transpose alone ---------
    @partial(jax.jit, static_argnums=(2,))
    def ta_loop(t, i, n):
        def body(_, acc):
            o = jnp.take_along_axis(t + acc, i, axis=0)
            return jnp.sum(o) * jnp.asarray(1e-38, t.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, t.dtype))

    tt = loop_time(lambda n: (lambda: ta_loop(U, iA, n)))
    rows["stageA_take_along"] = {"ms": tt * 1e3,
                                 "ns_per_el": tt / iA.size * 1e9}

    @partial(jax.jit, static_argnums=(1,))
    def tr_loop(a, n):
        def body(_, acc):
            o = ((a + acc)
                 .reshape(-1, 128, 128).swapaxes(1, 2).reshape(-1, 128))
            return jnp.sum(o) * jnp.asarray(1e-38, a.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, a.dtype))

    a0 = jnp.zeros((128 * T, 128), jnp.float32)
    tt = loop_time(lambda n: (lambda: tr_loop(a0, n)))
    rows["transpose_tiles"] = {"ms": tt * 1e3, "ns_per_el": tt / a0.size * 1e9}

    for k, v in rows.items():
        print(json.dumps({k: {kk: (round(vv, 4) if isinstance(vv, float)
                                   else vv) for kk, vv in v.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
