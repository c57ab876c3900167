"""Host-only tile statistics for the planned BCSR-48 unstructured operator.

For 16-node blocks under a Morton node ordering, counts unique
(block-row, block-col) tiles on the flagship 1.39M-DOF mesh: storage,
tiles/row distribution, and class quantization waste. Decides the operator
layout before paying the device build.

Run: python examples/bcsr_stats.py [nx,ny,nz]
"""
from __future__ import annotations

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
    N, E = len(pts), len(conn)
    print(f"mesh: {N} nodes, {E} tets")

    for B in (8, 16, 32):
        t0 = time.perf_counter()
        key = morton_codes(pts)
        morder = np.argsort(key, kind="stable")
        new_of_old = np.empty(N, dtype=np.int64)
        new_of_old[morder] = np.arange(N)
        conn_int = new_of_old[conn]
        blk = conn_int // B
        n_blk = -(-N // B)
        pr = np.repeat(blk, 10, axis=1).astype(np.int64)
        pc = np.tile(blk, (1, 10)).astype(np.int64)
        keys = (pr * n_blk + pc).reshape(-1)
        ukeys = np.unique(keys)
        rows_t = ukeys // n_blk
        counts = np.bincount(rows_t, minlength=n_blk)
        tile_b = (3 * B) ** 2 * 4
        gb = len(ukeys) * tile_b / 1e9
        # class quantization waste (pad count up to multiple of 2)
        q = np.maximum(2, ((counts + 1) // 2) * 2)
        waste = (q - counts).sum() * tile_b / 1e9
        n_classes = len(np.unique(q))
        print(
            f"B={B}: n_blk={n_blk} tiles={len(ukeys)} "
            f"({gb:.2f} GB f32, read@800GB/s={gb/0.8:.2f} ms) "
            f"tiles/row min/med/mean/max="
            f"{counts.min()}/{int(np.median(counts))}/"
            f"{counts.mean():.1f}/{counts.max()} "
            f"classes(q2)={n_classes} pad_waste={waste*1e3:.0f} MB "
            f"[{time.perf_counter()-t0:.1f}s]"
        )


if __name__ == "__main__":
    main()
