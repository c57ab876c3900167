"""Single-chip scaling sweep for the structured MG-PCG solve.

Measures the flagship cantilever solve (same problem family as bench.py:
fixed base, 1 kN tip shear, f32 MG-PCG to 1e-5) across grid sizes from the
1.39M-DOF flagship up to the largest case that fits one chip's HBM, and
reports seconds / iterations / MDOF-per-second per point. The reference has
no analog at ANY of these sizes (its pipeline is a Python per-element loop
plus SuperLU, ReactionSolver.py:115-205); the sweep documents how far one
TPU chip carries the production path and that iteration count stays
mesh-size-independent (the multigrid contract).

Run on the TPU: `python examples/bench_scaling.py`. One JSON line per grid
on stdout; diagnostics on stderr. Grids are overridable:
`FEMX_SCALING_GRIDS="24,24,96;32,32,128" python examples/bench_scaling.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# 80,80,320 and 64,64,512 are both ~50M DOF: the 80-grid used to be the
# non-power-of-two worst case (fine applies at 24 vs 11 ns/cell — the
# round-3 "50M-DOF cliff"). Root cause: nz extents above 224 that are not
# multiples of 128 defeat lane tiling (examples/bench_apply_shapes.py);
# the solver now auto-pads nz with ghost cells
# (assembly_structured.lane_friendly_nz), which this sweep exercises at
# the 80,80,320 point.
DEFAULT_GRIDS = ("24,24,96;32,32,128;40,40,160;48,48,192;64,64,256;"
                 "80,80,320;64,64,512")


def main():
    import jax
    import jax.numpy as jnp

    from femx.mesh import box_tet10
    from femx.solve.cg import pcg
    from femx.solve.multigrid import StructuredMultigrid

    on_cpu = jax.default_backend() == "cpu"
    dtype = np.float64 if on_cpu else np.float32
    tol = 1e-5 if dtype == np.float32 else 1e-8

    # ONE jitted solver reused across grids (shapes differ per grid, so each
    # still compiles once; the pytree-argument pattern keeps programs free of
    # embedded operator constants).
    @jax.jit
    def solve_args(fv, mg_):
        res = pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                  tol=tol, maxiter=300)
        return res.x, res.iterations, res.residual_norm

    from femx.assembly_structured import lane_friendly_nz, pad_z_raster

    grids = os.environ.get("FEMX_SCALING_GRIDS", DEFAULT_GRIDS)
    for gspec in grids.split(";"):
        nx, ny, nz = (int(v) for v in gspec.split(","))
        h = 1.6 / 96  # fixed element size: weak-ish scaling (bigger domain)
        dims = (nx * h, ny * h, nz * h)
        try:
            t0 = time.perf_counter()
            mesh = box_tet10(*dims, mesh_size=h)
            ndof = 3 * mesh.num_nodes
            t_mesh = time.perf_counter() - t0
            mask = np.ones(ndof)
            fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
            mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
            f = np.zeros(ndof)
            tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
            f[3 * tip + 1] = -1000.0 / len(tip)

            t0 = time.perf_counter()
            nzp = lane_friendly_nz(nz)
            if nzp != nz:  # same ghost pad the pipeline applies
                grid_old = (2 * nx + 1, 2 * ny + 1, 2 * nz + 1)
                grid_new = (2 * nx + 1, 2 * ny + 1, 2 * nzp + 1)
                mask_p = pad_z_raster(mask, grid_old, grid_new)
                f = pad_z_raster(f, grid_old, grid_new)
                mask, dims_mg = mask_p, None
                mg = StructuredMultigrid(None, (nx, ny, nzp), 2e11, 0.3,
                                         mask, dtype=dtype,
                                         spacing=(h, h, h),
                                         real_cells=(nx, ny, nz))
            else:
                mg = StructuredMultigrid(dims, (nx, ny, nz), 2e11, 0.3,
                                         mask, dtype=dtype)
            fj = jnp.asarray(mg.fine_op.to_internal(f * mask),
                             dtype=mg.fine_op.Kcell.dtype)
            t_setup = time.perf_counter() - t0

            t0 = time.perf_counter()
            u, it, rn = solve_args(fj, mg)
            jax.block_until_ready(u)
            t_compile = time.perf_counter() - t0

            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                u, it, rn = solve_args(fj, mg)
                jax.block_until_ready(u)
                _ = float(rn)
                times.append(time.perf_counter() - t0)
            t_best = min(times)
            print(json.dumps({
                "grid": [nx, ny, nz],
                **({"padded_nz": nzp} if nzp != nz else {}),
                "ndof": int(ndof),
                "solve_s": round(t_best, 4),
                "iters": int(it),
                "residual": float(rn),
                "mdof_per_s": round(ndof / t_best / 1e6, 1),
                "setup_s": round(t_setup, 2),
                "mg_cache": "hit" if mg.setup_cache_hit else "miss",
                "mesh_s": round(t_mesh, 2),
                "compile_s": round(t_compile, 1),
                "max_u": float(jnp.max(jnp.abs(u))),
            }), flush=True)
            del mg, fj, u
        except Exception as e:  # OOM at the top end is an expected outcome
            print(json.dumps({
                "grid": [nx, ny, nz],
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)
            break


if __name__ == "__main__":
    main()
