"""Group-ELL assembled unstructured operator — wide-row gathers only.

Why: on TPU, XLA row gathers cost per ROW, in two regimes (measured,
examples/bench_gather_width.py on v5e): ~5 ns/row below 48 f32 of width,
~2.1 ns/row at 48+ (the DMA-friendly width). The transpose-gather operator
(femx.assembly_tg) needs 2 x 10E NARROW rows per apply — 42.6 ms at the
1.39M-DOF flagship, gather-bound. Mosaic offers no tall-table vectorized
gather to fix this in a kernel (its tpu.dynamic_gather is limited to one
source vreg along sublanes — examples/bench_dyngather.py), so the win must
come from the fast WIDE regime:

  * nodes are Morton-ordered and cut into COLUMN GROUPS of 16 consecutive
    nodes = 48 f32 of u — one fast-regime gather row;
  * K is pre-assembled into dense (6, 48) blocks per (node PAIR, column
    group) — a pair's two nodes share most of their stiffness neighborhood
    (measured: pairing cuts blocks 1.5x);
  * node pairs are bucketed by their group COUNT g (exact, zero padding)
    and live in bucket-major internal order, so per bucket the apply is
      u16[idx]                       (n_g, g, 48)   wide row gather
      einsum("ngw,ngrw->nr", ., Kb)  (n_g, 6)       dense contraction
    and outputs CONCATENATE — no scatter, no extraction;
  * the only narrow movement left is one pair-level permutation
    (bucket-major -> Morton) of (NP, 6) rows per apply.

Measured at the flagship (examples/bench_groupell_core.py): 2.86M blocks,
3.3 GB of Kb. Trade-off vs TG: ~13 GB/s of extra HBM streaming for ~27x
fewer narrow gather rows; storage grows with mesh size, so the pipeline
keeps TG the default above FEMX_GROUPELL_MAX_BLOCKS.

Same math as femx.assembly.SolidOperator (blocks are exact f64 host sums
of the same element matrices) — equality enforced by
tests/test_assembly_groupell.py. astype(float64) returns a compact SoA
shadow (exact, scatter-based — fine for the ~4 residual evaluations per
refined solve).

Reference replaced: scipy lil/CSR assembly + SuperLU for arbitrary gmsh
meshes (ReactionSolver.py:115-152, 196-205).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

GROUP = 16          # nodes per column group (48 f32 — the fast-gather width)
PAIR = 2            # nodes per row block


@dataclasses.dataclass
class SolidOperatorGroupELL:
    """Assembled (pair x 16-node-group) dense-block ELL, bucketed by g."""

    idx: List[jnp.ndarray]       # per bucket (n_g, g) int32 group ids
    Kb: List[jnp.ndarray]        # per bucket (n_g, g, 6, 48)
    bucket_g: List[int]
    pairperm: jnp.ndarray        # (NP,) int32: morton pair -> internal pair
    new_of_old: np.ndarray       # mesh node -> internal node id
    n_nodes: int                 # real mesh nodes
    n_pad: int                   # internal nodes (multiple of GROUP)
    weight: float
    free_mask: Optional[jnp.ndarray] = None  # (3*n_pad,) internal layout
    # -- symmetric storage (default): Kb holds only tiles with morton row
    # node <= col node; apply adds the transpose side from the SAME blocks
    # (per-block column contributions written flat, accumulated per column
    # group by degree-bucketed WIDE 48-f32 row gathers — the TG transpose
    # recipe at block granularity) and subtracts the double-counted nodal
    # diagonal. Halves the dominant Kb HBM stream AND the storage.
    symmetric: bool = False
    tidx: Optional[List[jnp.ndarray]] = None  # per degree bucket (m_d, d)
    tdeg: Optional[List[int]] = None          # block positions per group
    out_take: Optional[jnp.ndarray] = None    # (NG,) -> concat row (or zero)
    ord_rb: Optional[jnp.ndarray] = None      # (NP,) internal -> morton pair
    bd_dev: Optional[jnp.ndarray] = None      # (n_pad,3,3) true diagonal
    io_dtype: str = "float32"    # vector dtype (u/f/masks); Kb may be
    # stored NARROWER (kb_dtype="bfloat16" halves the dominant HBM stream:
    # 17.5 -> 10.1 ms synthetic apply). MEASURED AND REJECTED as a default
    # at the flagship: the ~4e-3-rel operator perturbation collapses
    # lattice-MG PCG convergence (119 iterations to 8.9e-6 vs 17 for f32;
    # even tol 1e-3 needs 69), and f64 refinement around bf16 inner solves
    # stalls outright (true residual 0.40 after 705 inner iterations) —
    # the cheaper stream loses 7x+ on iterations. Kept as an opt-in for
    # future smoother-side uses.

    # ------------------------------------------------------------------
    @classmethod
    def from_mesh(cls, points, conn, E_mod, nu, weight=None,
                  dtype=np.float32, kb_dtype=None, build=None,
                  symmetric=None):
        """Build from host mesh arrays. Returns (op, detJ).

        kb_dtype: storage dtype for the dense blocks (default = dtype;
        env FEMX_GROUPELL_KB overrides, e.g. "bfloat16").

        build: "device" (default) assembles the blocks ON DEVICE — element
        stiffness einsum + one flat scatter-add — transferring only the
        mesh + block-structure indices (~60 MB at 1.39M DOF) instead of
        the 3.4 GB block tensor; measured 358 s -> ~15 s at the flagship
        (round-4 profile: numpy ke 144 s + pair aggregation ~100 s +
        relay transfer 59 s, examples/profile_groupell_setup.py). "host"
        keeps the exact-f64 numpy aggregation (the parity reference;
        env FEMX_GROUPELL_BUILD overrides)."""
        build = (build or os.environ.get("FEMX_GROUPELL_BUILD", "")
                 or "device")
        if build == "host":
            if symmetric:
                raise ValueError(
                    "symmetric storage is device-build only (the host "
                    "build is the full-storage parity reference)")
            return cls._from_mesh_host(points, conn, E_mod, nu,
                                       weight=weight, dtype=dtype,
                                       kb_dtype=kb_dtype)
        if build != "device":
            raise ValueError(f"build must be 'device' or 'host', got "
                             f"{build!r}")
        return cls._from_mesh_device(points, conn, E_mod, nu,
                                     weight=weight, dtype=dtype,
                                     kb_dtype=kb_dtype, symmetric=symmetric)

    @classmethod
    def _from_mesh_host(cls, points, conn, E_mod, nu, weight=None,
                        dtype=np.float32, kb_dtype=None):
        """Exact-f64 host aggregation build (the original path — kept as
        the parity reference for the device build and for environments
        without a usable accelerator)."""
        from femx.assembly_cluster import _element_stiffness_host
        from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT
        from femx.mesh.reorder import morton_codes

        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        points = np.asarray(points, dtype=np.float64)
        conn = np.asarray(conn)
        N, E = len(points), len(conn)
        n_pad = -(-N // GROUP) * GROUP
        dt = np.dtype(dtype)
        kbt = jnp.dtype(kb_dtype
                        or os.environ.get("FEMX_GROUPELL_KB", "")
                        or dt)

        # ---- Morton node order (dummies pad the tail) -------------------
        code = morton_codes(points)
        perm_m = np.argsort(code, kind="stable")
        morton_of_old = np.argsort(perm_m, kind="stable")  # mesh -> morton
        cm = morton_of_old[conn]                           # (E, 10)

        # ---- element stiffness (exact f64 host, shared with cluster) ----
        ke, detJ = _element_stiffness_host(points, conn, E_mod, nu,
                                           float(weight))

        # ---- aggregate to unique node pairs (f64 sums) -------------------
        rowm = np.repeat(cm, 10, axis=1).reshape(-1).astype(np.int64)
        colm = np.tile(cm, (1, 10)).reshape(-1).astype(np.int64)
        key = rowm * n_pad + colm
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        starts = np.r_[0, np.flatnonzero(np.diff(key_s)) + 1]
        upairs = key_s[starts]                             # unique (r, c)
        e_i = order // 100
        a_i = (order // 10) % 10
        b_i = order % 10
        kev = ke.reshape(E, 10, 3, 10, 3)
        vals = kev[e_i[:, None, None], a_i[:, None, None],
                   np.arange(3)[None, :, None],
                   b_i[:, None, None],
                   np.arange(3)[None, None, :]]            # (100E, 3, 3)
        agg = np.add.reduceat(vals.reshape(-1, 9), starts, axis=0)
        del vals, kev, key, key_s, order, e_i, a_i, b_i
        ur = upairs // n_pad                               # morton row node
        uc = upairs % n_pad                                # morton col node
        agg_diag64 = agg[ur == uc].reshape(-1, 3, 3).copy()  # f64, pre-cast

        # ---- (pair, group) blocks + g buckets ----------------------------
        rb = ur // PAIR
        grp = uc // GROUP
        NP = n_pad // PAIR
        NG = n_pad // GROUP
        ublocks = np.unique(rb * NG + grp)                 # sorted (rb, grp)
        blk_rb = ublocks // NG
        g_of_rb = np.bincount(blk_rb, minlength=NP)        # groups per pair
        # Optional g quantization up to a multiple of FEMX_GROUPELL_QUANT
        # (padded slots index group 0 with an all-zero Kb block). Default 1
        # = exact-g: the flagship A/B measured exact-g 38-bucket apply at
        # 16.8 ms vs 19.4 ms for quant=4's 11 buckets — the apply is
        # K-stream/gather bound, so the ~12% extra stream (3.81 vs 3.40 GB)
        # costs more than 27 fewer launches save.
        quant = max(1, int(os.environ.get("FEMX_GROUPELL_QUANT", "1")))
        gq_of_rb = -(-g_of_rb // quant) * quant            # 0 stays 0

        order_rb = np.argsort(gq_of_rb, kind="stable")     # bucket-major
        rank_rb = np.argsort(order_rb, kind="stable")      # morton pair->int
        new_of_old = (rank_rb[morton_of_old // PAIR] * PAIR
                      + morton_of_old % PAIR)

        # per-block position: row-in-bucket = rank of its pair within its
        # g class; slot = index of its group among the pair's sorted groups
        g_sorted = gq_of_rb[order_rb]
        counts = np.bincount(g_sorted)
        cstart = np.r_[0, np.cumsum(counts)][:-1]          # start per g
        blk_g = gq_of_rb[blk_rb]
        blk_row = rank_rb[blk_rb] - cstart[blk_g]
        # ublocks is sorted by (rb, grp); slot = index within the rb run
        rb_starts = np.r_[0, np.flatnonzero(np.diff(blk_rb)) + 1]
        blk_slot = np.arange(len(ublocks)) - np.repeat(
            rb_starts, np.diff(np.r_[rb_starts, len(ublocks)]))

        # ---- allocate buckets, place aggregated 3x3s (unique slots) ------
        gs = np.unique(g_sorted)
        bucket_g = [int(g) for g in gs]
        n_of_g = {int(g): int((g_sorted == g).sum()) for g in gs}
        idx_h = {g: np.zeros((n_of_g[g], g), dtype=np.int32)
                 for g in bucket_g if g > 0}
        Kb_h = {g: np.zeros((n_of_g[g], g, 6, 3 * GROUP), dtype=dt)
                for g in bucket_g if g > 0}
        # group ids per block
        for g in bucket_g:
            if g == 0:
                continue
            m = blk_g == g
            idx_h[g][blk_row[m], blk_slot[m]] = (ublocks[m] % NG).astype(
                np.int32)

        # unique-pair placement: find each pair's block, then its in-block
        # (rloc, cloc) 3x3 tile — destinations are unique, so flat fancy
        # ASSIGNMENT (no add.at) applies the aggregated values in one shot
        pblock = np.searchsorted(ublocks, rb * NG + grp)
        pr = ur % PAIR
        pc = uc % GROUP
        agg = agg.reshape(-1, 3, 3).astype(dt)
        for g in bucket_g:
            if g == 0:
                continue
            m = blk_g[pblock] == g
            kb = Kb_h[g]
            n_g = kb.shape[0]
            flat = kb.reshape(n_g * g * 6 * 3 * GROUP)
            base = ((blk_row[pblock[m]] * g + blk_slot[pblock[m]])
                    * (6 * 3 * GROUP)
                    + pr[m] * 3 * (3 * GROUP) + pc[m] * 3)
            off = (np.arange(3)[:, None] * (3 * GROUP)
                   + np.arange(3)[None, :]).reshape(-1)
            flat[(base[:, None] + off[None, :]).reshape(-1)] = (
                agg[m].reshape(-1, 9).reshape(-1))

        op = cls(
            idx=[jnp.asarray(idx_h[g]) if g > 0
                 else jnp.zeros((n_of_g[0], 0), dtype=jnp.int32)
                 for g in bucket_g],
            Kb=[jnp.asarray(Kb_h[g].astype(kbt, copy=False)) if g > 0
                else jnp.zeros((n_of_g[0], 0, 6, 3 * GROUP), dtype=kbt)
                for g in bucket_g],
            bucket_g=bucket_g,
            pairperm=jnp.asarray(rank_rb.astype(np.int32)),
            new_of_old=new_of_old,
            n_nodes=N,
            n_pad=n_pad,
            weight=float(weight),
            io_dtype=dt.name,
        )
        # host-side data for the f64 shadow + block-Jacobi (not leaves)
        op._points = points
        op._conn = conn
        op._E_mod = float(E_mod)
        op._nu = float(nu)
        # nodal diagonal blocks in INTERNAL order (f64, for block-Jacobi);
        # dummy nodes keep identity so their inverse blocks stay finite
        bd = np.tile(np.eye(3), (n_pad, 1, 1))
        ar = np.arange(n_pad)
        int_of_morton = rank_rb[ar // PAIR] * PAIR + ar % PAIR
        bd[int_of_morton[ur[ur == uc]]] = agg_diag64
        op._bd_host = bd
        op._int_of_morton = int_of_morton
        return op, detJ

    @classmethod
    def _from_mesh_device(cls, points, conn, E_mod, nu, weight=None,
                          dtype=np.float32, kb_dtype=None, symmetric=None):
        """Device-resident block assembly (the default build).

        Host does only the block STRUCTURE discovery (one np.unique over
        the 100E block keys + NB-sized bucket bookkeeping); the element
        stiffness einsum and the value accumulation run ON DEVICE as one
        compiled chunk program (batched Tet10 einsum -> flat scatter-add
        into the bucket-major block buffer). Transfers: element coords +
        connectivity + per-block base offsets (~60 MB at 1.39M DOF)
        instead of the assembled 3.4 GB block tensor. Values match the
        host build up to scatter summation order (each 3x3 tile sums the
        <= ~30 elements sharing its node pair); tests/test_lane_pad.py
        and test_assembly_groupell.py pin the parity."""
        from femx.assembly_structured import _material_matrix_np
        from femx.elements.tet10 import DN_NATURAL, GAUSS_WEIGHT_CORRECT, _SEL
        from femx.mesh.reorder import morton_codes

        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        if symmetric is None:
            symmetric = os.environ.get("FEMX_GROUPELL_SYM", "0") == "1"
        points = np.asarray(points, dtype=np.float64)
        conn = np.asarray(conn)
        N, E = len(points), len(conn)
        n_pad = -(-N // GROUP) * GROUP
        dt = np.dtype(dtype)
        kbt = jnp.dtype(kb_dtype
                        or os.environ.get("FEMX_GROUPELL_KB", "")
                        or dt)

        # ---- Morton node order (dummies pad the tail) -------------------
        code = morton_codes(points)
        perm_m = np.argsort(code, kind="stable")
        morton_of_old = np.argsort(perm_m, kind="stable")  # mesh -> morton
        cm = morton_of_old[conn].astype(np.int32)          # (E, 10)

        NP = n_pad // PAIR
        NG = n_pad // GROUP

        # ---- block structure (one 100E unique; the rest is NB-sized) ----
        cml = cm.astype(np.int64)
        bk = (cml // PAIR)[:, :, None] * NG + (cml // GROUP)[:, None, :]
        if symmetric:
            # store each (row node, col node) tile once: keep r <= c in
            # morton order; the apply reconstructs the lower half from
            # the same blocks (transpose side) minus the double-counted
            # nodal diagonal
            keep = cml[:, :, None] <= cml[:, None, :]
            ublocks = np.unique(bk[keep])
        else:
            keep = None
            ublocks = np.unique(bk)                        # sorted (rb, grp)
        del cml
        blk_rb = ublocks // NG
        g_of_rb = np.bincount(blk_rb, minlength=NP)        # groups per pair
        quant = max(1, int(os.environ.get("FEMX_GROUPELL_QUANT", "1")))
        gq_of_rb = -(-g_of_rb // quant) * quant            # 0 stays 0
        order_rb = np.argsort(gq_of_rb, kind="stable")     # bucket-major
        rank_rb = np.argsort(order_rb, kind="stable")      # morton pair->int
        new_of_old = (rank_rb[morton_of_old // PAIR] * PAIR
                      + morton_of_old % PAIR)
        g_sorted = gq_of_rb[order_rb]
        counts = np.bincount(g_sorted)
        cstart = np.r_[0, np.cumsum(counts)][:-1]          # start per g
        blk_g = gq_of_rb[blk_rb]
        blk_row = rank_rb[blk_rb] - cstart[blk_g]
        rb_starts = np.r_[0, np.flatnonzero(np.diff(blk_rb)) + 1]
        blk_slot = np.arange(len(ublocks)) - np.repeat(
            rb_starts, np.diff(np.r_[rb_starts, len(ublocks)]))

        gs = np.unique(g_sorted)
        bucket_g = [int(g) for g in gs]
        n_of_g = {int(g): int((g_sorted == g).sum()) for g in gs}

        # ---- flat bucket-major layout + per-block base offsets ----------
        blkw = 6 * 3 * GROUP                               # f32s per block
        idx_sizes = [n_of_g[g] * g for g in bucket_g]
        idx_base_b = np.r_[0, np.cumsum(idx_sizes)]
        kb_base_b = idx_base_b * blkw
        total = int(kb_base_b[-1])
        gidx_of = np.zeros(int(gs.max()) + 1, dtype=np.int64)
        gidx_of[gs] = np.arange(len(gs))
        blk_gidx = gidx_of[blk_g]
        within = blk_row.astype(np.int64) * blk_g + blk_slot
        idx_pos = idx_base_b[blk_gidx] + within
        idx_all = np.zeros(int(idx_base_b[-1]), dtype=np.int32)
        idx_all[idx_pos] = (ublocks % NG).astype(np.int32)
        block_base = kb_base_b[blk_gidx] + within * blkw   # (NB,) int64
        idt = np.int32 if total < 2**31 else np.int64

        # ---- device accumulation ------------------------------------------
        # Every dispatch below pays a ~0.6 s REMOTE compile round trip on
        # the axon deployment, and programs under jax's persistent-cache
        # time floor recompile every process — so (a) all eager ops are
        # folded into two jits (_ge_build_chunk + one slicing program),
        # and (b) the chunk program's array shapes are QUANTIZED (element
        # count to the chunk size, flat/node buffers to coarse multiples)
        # so its one expensive compile persists across meshes via the
        # compile cache (measured round-4 profile: 62 remote compiles =
        # 37.6 s on a 56k-DOF mesh with a warm cache). Tile destinations
        # are resolved on HOST (vectorized searchsorted, ~1 s for 33M
        # tiles at the flagship) — the device-side searchsorted variant
        # measured ~20 s of binary-search gathers per build.
        C = _material_matrix_np(E_mod, nu)
        chat = np.einsum("ack,ab,bdl->ckdl", _SEL, C, _SEL)
        ar = np.arange(n_pad)
        int_of_morton = rank_rb[ar // PAIR] * PAIR + ar % PAIR

        del bk, keep

        def _quant(n, q):
            """Round n up to a multiple of q, or to a power of two below
            q — coarse enough that repeat runs and same-family meshes hit
            the same compiled chunk program, cheap enough (<= q waste)
            that tiny meshes don't pay a large allocation floor."""
            n = int(n)
            if n >= q:
                return -(-n // q) * q
            p = 1
            while p < n:
                p <<= 1
            return p

        chunk = int(os.environ.get("FEMX_GROUPELL_CHUNK", "16384"))
        chunk = max(1, min(chunk, E))
        E_pad = -(-E // chunk) * chunk
        conn_p = np.zeros((E_pad, 10), dtype=np.int64)     # pad: node 0
        conn_p[:E] = conn                                  # (degenerate J ->
        cm_p = np.zeros((E_pad, 10), dtype=np.int32)       # zero values; any
        cm_p[:E] = cm                                      # dest is harmless)

        total_a = _quant(total, 1 << 24)                   # <= 64 MB waste
        npad_a = _quant(n_pad, 1 << 16)
        NB = len(ublocks)
        NB_a = _quant(NB, 1 << 20)
        # per-block lookup tables for the ON-DEVICE tile-destination
        # resolution (searchsorted + base arithmetic live in the chunk
        # program: this host has ONE CPU, and the numpy equivalents
        # measured ~35 s at the flagship vs a few device-seconds)
        ub_p = np.full(NB_a, np.iinfo(np.int64).max)       # sentinel tail:
        ub_p[:NB] = ublocks                                # queries stay < it
        bb_p = np.zeros(NB_a, dtype=idt)
        bb_p[:NB] = block_base.astype(idt)
        iom_p = np.zeros(npad_a, dtype=np.int32)
        iom_p[:n_pad] = int_of_morton

        import time as _time

        _dbg = os.environ.get("FEMX_GROUPELL_DEBUG") == "1"
        _t = _time.perf_counter

        def _mark(label, prev, sync=None):
            if not _dbg:
                return prev
            if sync is not None:
                jax.block_until_ready(sync)
            now = _t()
            print(f"      [groupell build] {label}: {now - prev:.2f}s",
                  file=__import__('sys').stderr, flush=True)
            return now

        t_s = _t()
        chat_d = jnp.asarray(chat.astype(dt))
        dn_d = jnp.asarray(DN_NATURAL.astype(dt))
        wgt = jnp.asarray(float(weight), dtype=dt)
        ub_d = jnp.asarray(ub_p)
        bb_d = jnp.asarray(bb_p)
        iom_d = jnp.asarray(iom_p)
        ng_t = jnp.asarray(NG, dtype=jnp.int64)

        flat = jnp.zeros((total_a,), dtype=dt)
        bd_dev = jnp.zeros((npad_a * 9,), dtype=dt)
        t_s = _mark("zeros+tables", t_s, (flat, bd_dev, ub_d, bb_d))
        djs = []
        for s in range(0, E_pad, chunk):
            coords = jnp.asarray(
                points[conn_p[s:s + chunk]].astype(dt))    # (e, 10, 3)
            cm_c = jnp.asarray(cm_p[s:s + chunk])
            t_s = _mark(f"chunk {s // chunk} transfer", t_s,
                        (coords, cm_c))
            flat, bd_dev, dj = _ge_build_chunk(
                flat, bd_dev, coords, cm_c, ub_d, bb_d, iom_d, chat_d,
                dn_d, wgt, ng_t, symmetric)
            t_s = _mark(f"chunk {s // chunk} exec", t_s, dj)
            djs.append(dj)
        detJ = np.concatenate([np.asarray(d) for d in djs])[:E]
        t_s = _mark("detJ readback", t_s)
        bd_dev = bd_dev.reshape(npad_a, 3, 3)

        # nodal diagonal blocks (internal order) for block-Jacobi; nodes
        # with no stiffness (dummies / isolated) keep identity so their
        # inverse blocks stay finite (same rule as the host build)
        bd = np.asarray(bd_dev)[:n_pad].astype(np.float64)
        del bd_dev
        t_s = _mark("bd readback", t_s)
        empty = ~(np.abs(bd).reshape(n_pad, 9).max(axis=1) > 0)
        bd[empty] = np.eye(3)

        # one compiled program slices + reshapes every bucket (38 eager
        # slice/reshape dispatches would pay 38 remote compiles)
        shapes = [(n_of_g[g], g) for g in bucket_g]
        starts = [int(v) for v in kb_base_b[:-1]]

        @jax.jit
        def _split(fl):
            out = []
            for (n_g, g), a in zip(shapes, starts):
                if g == 0:
                    out.append(jnp.zeros((n_g, 0, 6, 3 * GROUP), dtype=kbt))
                    continue
                kb = jax.lax.dynamic_slice_in_dim(
                    fl, a, n_g * g * blkw).reshape(n_g, g, 6, 3 * GROUP)
                out.append(kb.astype(kbt))
            return tuple(out)

        Kb: List[jnp.ndarray] = list(_split(flat))
        del flat
        t_s = _mark("split", t_s, Kb)
        idx: List[jnp.ndarray] = [
            jnp.asarray(idx_all[idx_base_b[i]:idx_base_b[i + 1]]
                        .reshape(n_of_g[g], g) if g > 0
                        else np.zeros((n_of_g[g], 0), dtype=np.int32))
            for i, g in enumerate(bucket_g)]

        sym_fields = {}
        if symmetric:
            # transpose-side structure: per column group, the flat
            # positions (bucket-major block order) of its incident
            # blocks, bucketed by incidence degree — accumulated in the
            # apply as degree-bucketed WIDE 48-f32 row gathers over the
            # per-block contribution table
            q = (ublocks % NG).astype(np.int64)
            ordq = np.argsort(q, kind="stable")
            pos_s = idx_pos[ordq].astype(np.int64)
            deg = np.bincount(q, minlength=NG)
            gstart = np.r_[0, np.cumsum(deg)][:-1]
            ds = np.unique(deg[deg > 0])
            tidx = []
            tdeg = []
            tgroups = []
            for d in ds:
                sel = np.flatnonzero(deg == d)
                tidx.append(jnp.asarray(
                    (pos_s[gstart[sel][:, None] + np.arange(d)[None, :]])
                    .astype(np.int32)))
                tdeg.append(int(d))
                tgroups.append(sel)
            cat = np.concatenate(tgroups) if tgroups else np.zeros(
                0, np.int64)
            out_take = np.full(NG, len(cat), dtype=np.int32)  # zero row
            out_take[cat] = np.arange(len(cat), dtype=np.int32)
            bd_true = bd.copy()
            bd_true[empty] = 0.0
            sym_fields = dict(
                symmetric=True,
                tidx=tidx,
                tdeg=tdeg,
                out_take=jnp.asarray(out_take),
                ord_rb=jnp.asarray(order_rb.astype(np.int32)),
                bd_dev=jnp.asarray(bd_true.astype(dt)),
            )

        op = cls(
            idx=idx,
            Kb=Kb,
            bucket_g=bucket_g,
            pairperm=jnp.asarray(rank_rb.astype(np.int32)),
            new_of_old=new_of_old,
            n_nodes=N,
            n_pad=n_pad,
            weight=float(weight),
            io_dtype=dt.name,
            **sym_fields,
        )
        op._points = points
        op._conn = conn
        op._E_mod = float(E_mod)
        op._nu = float(nu)
        op._bd_host = bd
        op._int_of_morton = int_of_morton
        return op, np.asarray(detJ)

    # -- layout ------------------------------------------------------------
    @property
    def ndof(self) -> int:
        return 3 * self.n_pad

    @property
    def n_elements(self) -> int:
        return len(self._conn)

    @property
    def dtype(self):
        """Vector (u/f/mask) dtype — Kb storage may be narrower."""
        return jnp.dtype(self.io_dtype)

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        x3 = np.asarray(x).reshape(self.n_nodes, 3)
        out = np.zeros((self.n_pad, 3), dtype=x3.dtype)
        out[self.new_of_old] = x3
        return out.reshape(-1)

    def to_global(self, y: np.ndarray) -> np.ndarray:
        y3 = np.asarray(y).reshape(self.n_pad, 3)
        return y3[self.new_of_old].reshape(-1)

    def with_free_mask(self, free_mask_internal) -> "SolidOperatorGroupELL":
        m = jnp.asarray(free_mask_internal, dtype=self.dtype)
        out = dataclasses.replace(self, free_mask=m)
        _copy_host(self, out)
        # keep the host mirror in lockstep with free_mask: a stale copied
        # mirror would silently drive block_jacobi_tensors() with the OLD
        # mask (advisor round-4). Device inputs clear it (the builder then
        # reads free_mask back once).
        out._free_mask_host = (free_mask_internal
                               if isinstance(free_mask_internal, np.ndarray)
                               else None)
        return out

    def astype(self, dtype) -> object:
        """f64 view for refinement residuals: a compact SoA shadow on the
        internal-ordered padded mesh (exact element einsum + scatter —
        slow per apply but only ~4 residual evaluations per solve use it;
        a f64 copy of Kb would double the dominant HBM cost instead).
        Returned wrapped so it carries this operator's layout converters
        (the pipeline's reaction path runs to_internal -> apply ->
        to_global on the residual operator)."""
        dt = jnp.dtype(dtype)
        if dt == jnp.dtype(self.dtype):
            return self
        from femx.assembly_soa import SolidOperatorSoA

        pts_int = np.zeros((self.n_pad, 3))
        pts_int[self.new_of_old] = self._points
        conn_int = self.new_of_old[self._conn]
        shadow, _ = SolidOperatorSoA.from_mesh(
            pts_int, conn_int, self._E_mod, self._nu, weight=self.weight,
            dtype=np.dtype(dtype).type)
        if self.free_mask is not None:
            shadow = shadow.with_free_mask(self.free_mask.astype(dt))
        return GroupELLShadow(soa=shadow, new_of_old=self.new_of_old,
                              n_nodes=self.n_nodes, n_pad=self.n_pad)

    # -- core ----------------------------------------------------------------
    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u (internal bucket-major layout)."""
        u6 = u.reshape(-1, 3 * PAIR)
        u6m = u6[self.pairperm]                  # -> morton pair order
        u16 = u6m.reshape(-1, 3 * GROUP)         # (NG, 48) group table
        outs = []
        c2s = []
        off = 0
        for ii, kk, g in zip(self.idx, self.Kb, self.bucket_g):
            n_g = ii.shape[0]
            if g == 0:
                outs.append(jnp.zeros((n_g, 3 * PAIR), dtype=u.dtype))
                off += n_g
                continue
            got = u16[ii]                        # (n_g, g, 48) wide rows
            if kk.dtype != got.dtype:            # narrow Kb storage: cast
                got = got.astype(kk.dtype)       # tiles, accumulate f32 on
                outs.append(_contract(got, kk).astype(u.dtype))  # the MXU
            else:
                outs.append(_contract(got, kk))
            if self.symmetric:
                # per-block COLUMN contributions K_b^T u_pair (48,) from
                # the same Kb stream; bucket pairs are contiguous in the
                # internal order so no gather is needed for u here
                ub = u6[off:off + n_g]           # (n_g, 6)
                if kk.dtype != ub.dtype:
                    c2 = jnp.einsum("nr,ngrw->ngw", ub.astype(kk.dtype),
                                    kk, precision=jax.lax.Precision.HIGHEST
                                    ).astype(u.dtype)
                else:
                    c2 = jnp.einsum("nr,ngrw->ngw", ub, kk,
                                    precision=jax.lax.Precision.HIGHEST)
                c2s.append(c2.reshape(n_g * g, 3 * GROUP))
            off += n_g
        y1 = jnp.concatenate(outs)               # (NP, 6) internal order
        if not self.symmetric:
            return y1.reshape(-1)
        # transpose side: accumulate block contributions per column group
        # (degree-bucketed wide row gathers), reorder to morton groups,
        # convert to the internal pair order, subtract the double-counted
        # nodal diagonal
        c2 = jnp.concatenate(c2s) if c2s else jnp.zeros(
            (0, 3 * GROUP), dtype=u.dtype)
        parts = [c2[tt].sum(axis=1) for tt in self.tidx]  # (m_d, 48)
        parts.append(jnp.zeros((1, 3 * GROUP), dtype=u.dtype))
        y2m = jnp.concatenate(parts)[self.out_take]       # (NG, 48) morton
        y2m6 = y2m.reshape(-1, 3 * PAIR)                  # morton pairs
        y2 = y2m6[self.ord_rb]                            # internal pairs
        du = jnp.einsum("ncd,nd->nc", self.bd_dev,
                        u.reshape(-1, 3),
                        precision=jax.lax.Precision.HIGHEST)
        return (y1 + y2).reshape(-1) - du.reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    # -- preconditioning ------------------------------------------------------
    def block_jacobi_tensors(self) -> jnp.ndarray:
        """(n_pad, 3, 3) inverse nodal blocks, constrained by free_mask,
        internal node order (dummy nodes get identity)."""
        from femx.assembly_structured import _inv3x3_np

        bd = self._bd_host.copy()
        mask = np.asarray(self._free_mask_host
                          if getattr(self, "_free_mask_host", None)
                          is not None else self.free_mask).reshape(
                              self.n_pad, 3)
        bd *= mask[:, :, None] * mask[:, None, :]
        bd += (1.0 - mask)[:, :, None] * np.eye(3)
        return jnp.asarray(_inv3x3_np(bd).astype(np.dtype(self.dtype)))

    @staticmethod
    def apply_block_jacobi(binv, r):
        r3 = r.reshape(-1, 3)
        return jnp.einsum("ncd,nd->nc", binv, r3).reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        d = np.einsum("ncc->nc", self._bd_host).reshape(-1)
        return jnp.asarray(d.astype(np.dtype(self.dtype)))

    def gather_rows(self) -> int:
        """Wide gather rows per apply (vs the TG operator's 20E narrow)."""
        return sum(int(i.shape[0]) * g
                   for i, g in zip(self.idx, self.bucket_g))


@dataclasses.dataclass
class GroupELLShadow:
    """f64 residual operator for a SolidOperatorGroupELL: SoA element
    apply on the padded internal layout + the parent's layout converters
    (so the pipeline's generic to_internal -> apply -> to_global reaction
    recovery works on it unchanged)."""

    soa: object                 # SolidOperatorSoA on the padded mesh
    new_of_old: np.ndarray      # mesh node -> internal node id
    n_nodes: int
    n_pad: int

    @property
    def dtype(self):
        return self.soa.dNg.dtype

    @property
    def ndof(self) -> int:
        return 3 * self.n_pad

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.soa.apply(u)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.soa.apply_constrained(u)

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        x3 = np.asarray(x).reshape(self.n_nodes, 3)
        out = np.zeros((self.n_pad, 3), dtype=x3.dtype)
        out[self.new_of_old] = x3
        return out.reshape(-1)

    def to_global(self, y: np.ndarray) -> np.ndarray:
        y3 = np.asarray(y).reshape(self.n_pad, 3)
        return y3[self.new_of_old].reshape(-1)

    def astype(self, dtype) -> "GroupELLShadow":
        dt = jnp.dtype(dtype)
        if dt == jnp.dtype(self.dtype):
            return self
        return dataclasses.replace(self, soa=self.soa.astype(dt))


def _shadow_flatten(s: GroupELLShadow):
    return (s.soa,), (_HostArr(s.new_of_old), s.n_nodes, s.n_pad)


def _shadow_unflatten(aux, children):
    hoa, n_nodes, n_pad = aux
    return GroupELLShadow(soa=children[0], new_of_old=hoa.a,
                          n_nodes=n_nodes, n_pad=n_pad)


@partial(jax.jit, donate_argnums=(0, 1), static_argnums=(11,))
def _ge_build_chunk(flat, bd, coords, cm_c, ublocks, block_base, iom,
                    chat, dn, weight, NG, sym=False):
    """One device assembly chunk: batched Tet10 element stiffness (same
    contraction as assembly_cluster._element_stiffness_host), ON-DEVICE
    tile-destination resolution (searchsorted over the padded block-key
    table + base arithmetic — the numpy equivalents cost ~35 s at the
    flagship on this single-CPU host), flat scatter-add of every 3x3
    (row-node, col-node) tile into the bucket-major block buffer, and
    nodal diagonal accumulation for block-Jacobi. In symmetric mode the
    dropped (r > c) tiles are zero-valued, so whatever (clamped)
    destination their nonexistent block key resolves to is harmless —
    as are the padding rows (node 0 everywhere: singular J -> wdet 0).
    Every array shape here is quantized by the caller and NG/weight are
    traced, so the compile caches across meshes."""
    hi = jax.lax.Precision.HIGHEST
    J = jnp.einsum("gkn,enc->egkc", dn, coords, precision=hi)
    # closed-form 3x3 det/inverse (adjugate): jnp.linalg lowers batched
    # LU machinery that costs compile time on TPU for no accuracy gain
    # at this size
    a = J[..., 0, 0]; b = J[..., 0, 1]; c = J[..., 0, 2]
    d = J[..., 1, 0]; e = J[..., 1, 1]; f = J[..., 1, 2]
    g = J[..., 2, 0]; h = J[..., 2, 1]; i = J[..., 2, 2]
    A = e * i - f * h; B = c * h - b * i; Cc = b * f - c * e
    D = f * g - d * i; E = a * i - c * g; F = c * d - a * f
    G = d * h - e * g; H = b * g - a * h; I = a * e - b * d
    dj = a * A + b * D + c * G
    adj = jnp.stack([jnp.stack([A, B, Cc], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    Jinv = adj / jnp.where(dj == 0.0, 1.0, dj)[..., None, None]
    dN = jnp.einsum("egkc,gcn->egkn", Jinv, dn, precision=hi)
    wdet = jnp.where(dj > 1e-12, dj, 0.0) * weight
    # accumulate the 4 Gauss points explicitly: the single 4-operand
    # einsum lets XLA materialize (e,g,10,3,3,3)-class intermediates that
    # OOM the chip at useful chunk sizes (measured: 13.2 GB program
    # requirement at chunk 65536)
    vals = None                                           # (e,10,10,3,3)
    for g in range(dN.shape[1]):
        dNg = dN[:, g] * wdet[:, g, None, None]           # (e,3,10)
        t = jnp.einsum("eki,ckdl->eicdl", dNg, chat, precision=hi)
        kg = jnp.einsum("eicdl,elj->eijcd", t, dN[:, g], precision=hi)
        vals = kg if vals is None else vals + kg
    a10 = jnp.arange(10)
    vdiag = vals[:, a10, a10]                             # (e,10,3,3)
    cml = cm_c.astype(jnp.int64)
    if sym:
        # symmetric storage: zero the dropped (r > c) tiles — their
        # (possibly nonexistent) destinations then receive harmless 0.0
        keep = (cml[:, :, None] <= cml[:, None, :])
        vals = vals * keep[..., None, None].astype(vals.dtype)
    bk = (cml // PAIR)[:, :, None] * NG + (cml // GROUP)[:, None, :]
    pblock = jnp.searchsorted(ublocks, bk)                # (e,10,10)
    bdt = block_base.dtype
    pr = (cm_c % PAIR)[:, :, None].astype(bdt)
    pc = (cm_c % GROUP)[:, None, :].astype(bdt)
    base = block_base[pblock] + pr * (3 * 3 * GROUP) + pc * 3
    off = (jnp.arange(3, dtype=bdt)[:, None] * (3 * GROUP)
           + jnp.arange(3, dtype=bdt)[None, :])
    dest = base[..., None, None] + off
    flat = flat.at[dest.reshape(-1)].add(vals.reshape(-1))
    # nodal diagonal: scalar-index form (windowed row scatter measured
    # 6.6x more ns/value on this chip)
    bdest = (iom[cm_c] * 9)[..., None] + jnp.arange(9, dtype=jnp.int32)
    bd = bd.at[bdest.reshape(-1)].add(vdiag.reshape(-1))
    return flat, bd, dj


def _contract(got: jnp.ndarray, kk: jnp.ndarray) -> jnp.ndarray:
    """Per-bucket contraction (n, g, 48) x (n, g, 6, 48) -> (n, 6).
    Form selectable for on-chip A/B (FEMX_GROUPELL_CONTRACT)."""
    form = os.environ.get("FEMX_GROUPELL_CONTRACT", "einsum")
    if form == "dotgen":
        n, g, w = got.shape
        return jax.lax.dot_general(
            got.reshape(n, g * w), kk.reshape(n, g * w, 6),
            (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ngw,ngrw->nr", got, kk,
                      precision=jax.lax.Precision.HIGHEST)


_HOST_FIELDS = ("_points", "_conn", "_E_mod", "_nu", "_bd_host",
                "_int_of_morton", "_free_mask_host")


def _copy_host(src, dst):
    for f in _HOST_FIELDS:
        if getattr(src, f, None) is not None:
            object.__setattr__(dst, f, getattr(src, f))


def _ge_flatten(op: SolidOperatorGroupELL):
    children = (tuple(op.idx), tuple(op.Kb), op.pairperm, op.free_mask,
                tuple(op.tidx) if op.tidx is not None else None,
                op.out_take, op.ord_rb, op.bd_dev)
    aux = (tuple(op.bucket_g), _HostArr(op.new_of_old), op.n_nodes,
           op.n_pad, op.weight, op.io_dtype, op.symmetric,
           tuple(op.tdeg) if op.tdeg is not None else None)
    return children, aux


def _ge_unflatten(aux, children):
    idx, Kb, pairperm, free_mask, tidx, out_take, ord_rb, bd_dev = children
    (bucket_g, hoa, n_nodes, n_pad, weight, io_dtype, symmetric,
     tdeg) = aux
    op = object.__new__(SolidOperatorGroupELL)
    op.idx = list(idx)
    op.Kb = list(Kb)
    op.pairperm = pairperm
    op.free_mask = free_mask
    op.bucket_g = list(bucket_g)
    op.new_of_old = hoa.a
    op.n_nodes = n_nodes
    op.n_pad = n_pad
    op.weight = weight
    op.io_dtype = io_dtype
    op.symmetric = symmetric
    op.tidx = list(tidx) if tidx is not None else None
    op.tdeg = list(tdeg) if tdeg is not None else None
    op.out_take = out_take
    op.ord_rb = ord_rb
    op.bd_dev = bd_dev
    return op


class _HostArr:
    __slots__ = ("a", "_key")

    def __init__(self, a):
        self.a = np.asarray(a)
        self._key = (self.a.shape, self.a.dtype.str, hash(self.a.tobytes()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HostArr) and self._key == other._key


jax.tree_util.register_pytree_node(
    SolidOperatorGroupELL, _ge_flatten, _ge_unflatten
)
jax.tree_util.register_pytree_node(
    GroupELLShadow, _shadow_flatten, _shadow_unflatten
)
