"""Chebyshev vs damped-Jacobi MG smoothing: iteration-count study.

Per-degree cost of the two smoothers is identical (1 operator apply +
1 block-Jacobi solve), so PCG iteration count — which is platform-
independent — is the whole comparison; wall times here (CPU) are
indicative only. Run on CPU:

    python examples/bench_cheb_smoother.py [nx,ny,nz ...]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS is pre-empted

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from femx.mesh import box_tet10
from femx.solve.cg import pcg
from femx.solve.multigrid import StructuredMultigrid


def _cantilever(n_cells, h=0.05):
    dims = tuple(c * h for c in n_cells)
    mesh = box_tet10(*dims, mesh_size=h)
    mask = np.ones(3 * mesh.num_nodes)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(3 * mesh.num_nodes)
    tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)
    return dims, mesh, mask, f


def run(n_cells, configs, tol=1e-10):
    dims, mesh, mask, f = _cantilever(n_cells)
    print(f"== grid {n_cells}  ({3 * mesh.num_nodes} DOF) ==", flush=True)
    for label, kw in configs:
        t0 = time.perf_counter()
        mg = StructuredMultigrid(dims, n_cells, 2e11, 0.3, mask,
                                 dtype=np.float64, **kw)
        setup = time.perf_counter() - t0
        op = mg.fine_op
        fj = jnp.asarray(op.to_internal(f * mask))
        t0 = time.perf_counter()
        res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=tol,
                  maxiter=400)
        rn = float(res.residual_norm)  # readback inside the timed region
        wall = time.perf_counter() - t0
        print(f"  {label:<34} iters={int(res.iterations):3d} "
              f"conv={bool(res.converged)} rn={rn:.2e}"
              f" setup={setup:.1f}s solve={wall:.1f}s", flush=True)


if __name__ == "__main__":
    grids = [(4, 4, 16), (8, 8, 32), (12, 12, 24)]
    if len(sys.argv) > 1:
        grids = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    configs = [
        ("jacobi n=2 (default)", dict(n_smooth=2)),
        ("cheb deg=2 lower=1/30", dict(n_smooth=2, smoother="chebyshev")),
        ("cheb deg=2 lower=1/8",
         dict(n_smooth=2, smoother="chebyshev", cheb_lower=1 / 8)),
        ("cheb deg=2 lower=1/4",
         dict(n_smooth=2, smoother="chebyshev", cheb_lower=1 / 4)),
        ("jacobi n=3", dict(n_smooth=3)),
        ("cheb deg=3 lower=1/30", dict(n_smooth=3, smoother="chebyshev")),
        ("cheb deg=3 lower=1/8",
         dict(n_smooth=3, smoother="chebyshev", cheb_lower=1 / 8)),
    ]
    for g in grids:
        run(g, configs)
