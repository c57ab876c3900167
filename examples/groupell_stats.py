"""Size the group-ELL operator on the flagship unstructured mesh.

Design (motivated by examples/bench_gather_width.py: row gathers cost
~5.25 ns/row below 48 f32 of width but 2.1 ns/row at >= 48 — and the TG
apply is 2 x 3.1M narrow rows): assemble K into per-(row-node, column
GROUP) dense (3, 3*Gs) blocks where a group is Gs consecutive nodes in a
locality (Morton) ordering. The apply then gathers one (3*Gs)-wide u row
per block — fast regime — and writes outputs contiguously per
groups-count bucket. No scatter, no extraction.

Cost model per apply at B = sum_n g(n) blocks:
  gather:   B rows * 2.1 ns
  K stream: B * 3 * 3*Gs * 4 B / 820 GB/s
so everything follows the distribution of g(n) = number of distinct
column groups among node n's stiffness neighbors. This script measures it
on the flagship 1.39M-DOF cantilever with randomized labels (the
bench_unstructured mesh), after femx's own Morton relabel.

Run: python examples/groupell_stats.py [nx,ny,nz]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from femx.mesh import box_tet10
from femx.mesh.reorder import morton_codes


def main():
    grid = sys.argv[1] if len(sys.argv) > 1 else "24,24,96"
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.0 / 96
    mesh = box_tet10(nx * h, ny * h, nz * h, mesh_size=h)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    N, E = len(pts_s), len(conn_s)
    print(json.dumps({"nodes": N, "elements": E, "ndof": 3 * N}), flush=True)

    # femx-side Morton relabel (what the operator would do at setup)
    t0 = time.perf_counter()
    code = morton_codes(pts_s)
    perm = np.argsort(code, kind="stable")  # new order: old index perm[i]
    new_of_old = np.argsort(perm, kind="stable")
    conn_m = new_of_old[conn_s]
    t_perm = time.perf_counter() - t0

    # node-node adjacency via element pairs (upper storage as sorted pairs)
    t0 = time.perf_counter()
    a = np.repeat(conn_m, 10, axis=1).reshape(E, 10, 10)
    b = np.tile(conn_m, (1, 10)).reshape(E, 10, 10)
    pairs = (a.astype(np.int64) * N + b.astype(np.int64)).reshape(-1)
    pairs = np.unique(pairs)
    rows = (pairs // N).astype(np.int64)
    cols = (pairs % N).astype(np.int64)
    t_adj = time.perf_counter() - t0
    nnz = len(pairs)
    deg = np.bincount(rows, minlength=N)
    print(json.dumps({
        "nnz_node_pairs": int(nnz),
        "avg_neighbors": round(nnz / N, 2),
        "max_neighbors": int(deg.max()),
        "adj_s": round(t_adj, 1), "perm_s": round(t_perm, 2)}), flush=True)

    # row-block r nodes x column-group Gs nodes: B = distinct
    # (row-block, col-group) pairs; storage B*(3r)*(3Gs); one wide gather
    # row per (row-block, col-group).
    for Gs in (8, 16, 32):
        for r in (1, 2, 4, 8):
            rb = rows // r
            grp = cols // Gs
            key = rb * (N // Gs + 2) + grp
            key = np.unique(key)
            B = len(key)
            g_of_rb = np.bincount((key // (N // Gs + 2)).astype(np.int64))
            gather_ms = B * 2.1e-6
            k_mb = B * 3 * r * 3 * Gs * 4 / 1e6
            stream_ms = k_mb / 820e3 * 1e3
            print(json.dumps({
                "group_size": Gs, "row_block": r,
                "blocks": int(B),
                "avg_groups_per_rowblock": round(B / len(g_of_rb), 2),
                "p99_groups": int(np.percentile(g_of_rb, 99)),
                "max_groups": int(g_of_rb.max()),
                "K_storage_MB": round(k_mb, 1),
                "est_gather_ms": round(gather_ms, 2),
                "est_stream_ms": round(stream_ms, 2),
                "est_total_ms": round(gather_ms + stream_ms, 2),
                "fill_pct": round(100 * nnz * 1.0 / (B * Gs * r), 1),
            }), flush=True)

    bucket_order_penalty(rows, cols, N, Gs=16, r=1)
    bucket_order_penalty(rows, cols, N, Gs=16, r=2)


def bucket_order_penalty(rows, cols, N, Gs=16, r=2, quant=4):
    """The operator wants ONE internal node order that is simultaneously
    (a) bucket-major in g (so per-bucket outputs concatenate contiguously)
    and (b) the order the 16-node column groups are cut from. Bucket-
    sorting permutes nodes away from Morton, which can scatter neighbors
    across more groups. Measure g before/after the bucket sort."""
    def stats(rw, cl):
        rb = rw // r
        key = rb * (N // Gs + 2) + (cl // Gs)
        B = len(np.unique(key))
        return B

    B0 = stats(rows, cols)
    rb = rows // r
    key = rb * (N // Gs + 2) + (cols // Gs)
    key = np.unique(key)
    g_of_rb = np.bincount((key // (N // Gs + 2)).astype(np.int64))
    gq = ((g_of_rb + quant - 1) // quant) * quant
    order_rb = np.argsort(gq, kind="stable")
    # node permutation induced by the row-block sort
    new_of_old_rb = np.argsort(order_rb, kind="stable")
    node_new = (new_of_old_rb[rows // r] * r + rows % r)
    col_new = (new_of_old_rb[cols // r] * r + cols % r)
    B1 = stats(node_new, col_new)
    key1 = (node_new // r) * (N // Gs + 2) + (col_new // Gs)
    key1 = np.unique(key1)
    g1 = np.bincount((key1 // (N // Gs + 2)).astype(np.int64))
    pad_rows = int((((g1 + quant - 1) // quant) * quant).sum())
    print(json.dumps({
        "bucket_order_check": {"Gs": Gs, "r": r, "quant": quant,
                               "B_morton": int(B0),
                               "B_bucket_major": int(B1),
                               "penalty_pct": round(100 * (B1 / B0 - 1), 1),
                               "quant_padded_rows": pad_rows,
                               "quant_pad_pct": round(
                                   100 * (pad_rows / B1 - 1), 1)}}),
        flush=True)


if __name__ == "__main__":
    main()
