"""Attribute the group-ELL unstructured setup wall (BENCH_r04: 303.8 s).

Replicates bench.py's unstructured section stage by stage under cProfile
so each hot spot in SolidOperatorGroupELL.from_mesh + LatticePreconditioner
is attributable. Grid selectable (FEMX_PROFILE_GRID, default the 1.39M-DOF
flagship 24,24,96).
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from femx.mesh import box_tet10

    grid = os.environ.get("FEMX_PROFILE_GRID", "24,24,96")
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.6 / 96
    dims = (nx * h, ny * h, nz * h)

    t0 = time.perf_counter()
    mesh = box_tet10(*dims, mesh_size=h)
    ndof = 3 * mesh.num_nodes
    log(f"mesh: {ndof} DOF ({time.perf_counter()-t0:.2f}s)")

    mask = np.ones(ndof)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0

    conn_u = np.asarray(mesh.cells["tetra10"])
    pts_u = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts_u))
    pts_s = np.empty_like(pts_u)
    pts_s[relabel] = pts_u
    conn_s = relabel[conn_u]
    mask_s = np.empty_like(mask)
    mask_s.reshape(-1, 3)[relabel] = mask.reshape(-1, 3)

    from femx.assembly_groupell import SolidOperatorGroupELL
    from femx.solve.lattice_precond import LatticePreconditioner

    dtype = np.float32
    pr1 = cProfile.Profile()
    pr2 = cProfile.Profile()

    t0 = time.perf_counter()
    pr1.enable()
    uop, _ = SolidOperatorGroupELL.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                             dtype=dtype)
    pr1.disable()
    log(f"groupell from_mesh: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    uop = uop.with_free_mask(uop.to_internal(mask_s).astype(dtype))
    bj_data = uop.block_jacobi_tensors()
    jax.block_until_ready(bj_data)
    log(f"free mask + block_jacobi: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    pr2.enable()
    lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask_s,
                               dtype=dtype, node_perm=uop.new_of_old,
                               bj_fn=type(uop).apply_block_jacobi,
                               bj_data=bj_data)
    pr2.disable()
    log(f"LatticePreconditioner: {time.perf_counter()-t0:.2f}s")
    del lp

    for name, pr in (("from_mesh", pr1), ("lattice_precond", pr2)):
        for sort in ("cumulative", "tottime"):
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats(sort).print_stats(25)
            log(f"===== {name} by {sort} =====")
            log(s.getvalue())


if __name__ == "__main__":
    main()
