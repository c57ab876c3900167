"""Geometric multigrid preconditioner for structured 2D Tri6 lattices.

The 2D products (PlaneAnalysis / PipeThermalAnalysis — the reference's
placeholder menu entries, FEM_main.py:412-431) mesh rectangles with
`rect_tri6_from_cells`, whose node set is the FULL regular half-step grid
(2nx+1, 2ny+1) in row-major order (generators2d.py). That makes textbook
geometric MG natural and TPU-friendly:

  * coarsening by 2 on the CELL grid — coarse nodes coincide exactly with
    the even-even fine nodes, so mask transfer is pure injection;
  * bilinear prolongation / full-weighting restriction (exact adjoints) as
    strided slice arithmetic on the (Px, Py, 2) grid — no gathers at all;
  * rediscretized coarse operators: each level rebuilds the same
    plane/axisymmetric Tri6 operator on the coarser lattice (uniform
    geometry, so rediscretization ~ Galerkin);
  * damped block-Jacobi smoothing (the operators' masked nodal 2x2
    inverses) and a dense masked-Cholesky-inverse bottom.

Same architecture as the 3D `femx.solve.multigrid.StructuredMultigrid`:
the preconditioner is a registered PYTREE so jitted solves take it as an
ARGUMENT (closure constants bloat the remote-compile payload — measured on
the 3D path, see multigrid.py).

Measured (CPU f64, plane cantilever, tol 1e-10, warm steady-state):
256x64 cells / 132k DOF: block-Jacobi PCG 4450 iters / 114 s -> MG-PCG
19 iters / 2.8 s (41x). Iteration counts are mesh-size-independent
(16 / 19 / 19 across 64x16 / 256x64 / 512x128 = 8.5k..527k DOF) while BJ
grows ~O(h^-1) (1110 -> 4450).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from femx.assembly_plane import AxisymOperator, PlaneOperator
from femx.mesh.generators2d import rect_tri6_from_cells


def prolong2d(uc: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation (Pxc, Pyc, 2) -> (2Pxc-1, 2Pyc-1, 2)."""
    pxc, pyc, c = uc.shape
    uf = jnp.zeros((2 * pxc - 1, 2 * pyc - 1, c), dtype=uc.dtype)
    uf = uf.at[0::2, 0::2].set(uc)
    uf = uf.at[1::2, 0::2].set(0.5 * (uc[:-1, :] + uc[1:, :]))
    uf = uf.at[0::2, 1::2].set(0.5 * (uc[:, :-1] + uc[:, 1:]))
    uf = uf.at[1::2, 1::2].set(0.25 * (uc[:-1, :-1] + uc[1:, :-1]
                                       + uc[:-1, 1:] + uc[1:, 1:]))
    return uf


def restrict2d(rf: jnp.ndarray) -> jnp.ndarray:
    """Full weighting — the exact adjoint of :func:`prolong2d`,
    (Pxf, Pyf, 2) -> ((Pxf+1)/2, (Pyf+1)/2, 2)."""
    p = jnp.pad(rf, ((1, 1), (1, 1), (0, 0)))
    # padded row/col 2i+1 is fine index 2i; strided slices below pick the
    # (2i-1, 2i, 2i+1) x (2j-1, 2j, 2j+1) neighborhoods for all i, j at once
    xm, x0, xp = p[0:-2:2], p[1:-1:2], p[2::2]
    out = x0[:, 1:-1:2]
    out = out + 0.5 * (xm[:, 1:-1:2] + xp[:, 1:-1:2]
                       + x0[:, 0:-2:2] + x0[:, 2::2])
    out = out + 0.25 * (xm[:, 0:-2:2] + xm[:, 2::2]
                        + xp[:, 0:-2:2] + xp[:, 2::2])
    return out


def _make_operator(kind: str, n_cells, spacing, origin, C, thickness, dtype):
    mesh = rect_tri6_from_cells(n_cells, spacing, origin=origin)
    conn = mesh.cells["triangle6"]
    if kind == "plane":
        op, _ = PlaneOperator.from_mesh(mesh.points, conn, C,
                                        thickness=thickness, dtype=dtype)
    elif kind == "axisym":
        op, _ = AxisymOperator.from_mesh(mesh.points, conn, C, dtype=dtype)
    else:
        raise ValueError(f"unknown operator kind {kind!r}")
    return op


@jax.tree_util.register_pytree_node_class
class Multigrid2D:
    """Symmetric V-cycle preconditioner M^-1 for CG on a rect Tri6 lattice.

    Args:
      kind: "plane" or "axisym" (selects the level operator family).
      n_cells, spacing, origin: the FINE lattice (mesh.lattice2d of a
        rect_tri6 mesh).
      C: material matrix (3,3 plane / 4,4 axisym).
      free_mask: (ndof,) fine Dirichlet mask (1 = free).
      thickness: plane only.
      n_smooth: damped block-Jacobi sweeps pre & post (equal => symmetric).
      omega: smoother damping.
      coarse_dof_limit: stop coarsening once ndof fits a dense inverse.
      fine_op: reuse the pipeline's already-built fine operator (optional;
        must match kind/n_cells/C).

    Coarsening halves both axes while both cell counts are even; a
    hierarchy that bottoms out above `coarse_dense_limit` DOF raises with
    advice (prefer 2^k-divisible cell counts) so callers can fall back to
    block-Jacobi.
    """

    def __init__(self, kind, n_cells, spacing, origin, C, free_mask,
                 thickness=1.0, n_smooth=2, omega=0.7,
                 coarse_dof_limit=3000, coarse_dense_limit=20000,
                 dtype=None, fine_op=None):
        nx, ny = (int(v) for v in n_cells)
        hx, hy = (float(v) for v in spacing)
        dtype = dtype or np.float64
        C = jnp.asarray(C, dtype=dtype)

        def _ndof(cx, cy):
            return 2 * (2 * cx + 1) * (2 * cy + 1)

        specs: List[Tuple[int, int, float, float]] = [(nx, ny, hx, hy)]
        while (_ndof(specs[-1][0], specs[-1][1]) > coarse_dof_limit
               and specs[-1][0] % 2 == 0 and specs[-1][1] % 2 == 0):
            cx, cy, chx, chy = specs[-1]
            specs.append((cx // 2, cy // 2, 2 * chx, 2 * chy))
        coarse_ndof = _ndof(specs[-1][0], specs[-1][1])
        if coarse_ndof > coarse_dense_limit:
            raise ValueError(
                f"2D multigrid hierarchy stuck at {specs[-1][:2]} cells "
                f"({coarse_ndof} DOF > dense limit {coarse_dense_limit}); "
                "prefer even (ideally 2^k-divisible) cell counts, or use "
                "block-Jacobi PCG")
        # len(specs) == 1 is legal: the "V-cycle" is one dense solve —
        # an exact preconditioner for a fine grid already under the limit

        self._aux = (kind, tuple(specs), float(thickness), int(n_smooth),
                     float(omega), str(np.dtype(dtype)))
        ops, binvs, masks = [], [], []
        mask = jnp.asarray(free_mask, dtype=dtype)
        for lvl, (cx, cy, chx, chy) in enumerate(specs):
            if lvl == 0 and fine_op is not None:
                op = fine_op
            else:
                op = _make_operator(kind, (cx, cy), (chx, chy), origin, C,
                                    thickness, dtype)
            if lvl > 0:
                # coarse nodes ARE the even-even fine nodes: inject the mask
                mask = mask.reshape(2 * 2 * cx + 1, 2 * 2 * cy + 1, 2)[
                    ::2, ::2].reshape(-1)
            op = op.with_free_mask(mask)
            ops.append(op)
            binvs.append(op.block_jacobi_inverse_blocks())
            masks.append(mask)
        # dense MASKED inverse at the bottom (host inversion, one-time):
        # S K S + (I - S) — the raw dense() is unconstrained and singular
        Kc = np.asarray(ops[-1].dense(), dtype=np.float64)
        s = np.asarray(masks[-1], dtype=np.float64)
        Kc = s[:, None] * Kc * s[None, :] + np.diag(1.0 - s)
        self._coarse_inv = jnp.asarray(np.linalg.inv(Kc), dtype=dtype)
        self._ops = tuple(ops)
        self._binvs = tuple(binvs)
        self._masks = tuple(masks)

    # -- pytree protocol (leaves ride as jit ARGUMENTS) ----------------------
    def tree_flatten(self):
        return (self._ops, self._binvs, self._masks, self._coarse_inv), self._aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj._aux = aux
        obj._ops, obj._binvs, obj._masks, obj._coarse_inv = leaves
        return obj

    @property
    def fine_op(self):
        return self._ops[0]

    @property
    def n_levels(self) -> int:
        return len(self._aux[1])

    def level_shapes(self) -> List[Tuple[int, int]]:
        return [(cx, cy) for cx, cy, _, _ in self._aux[1]]

    def _grid(self, k: int) -> Tuple[int, int]:
        cx, cy, _, _ = self._aux[1][k]
        return 2 * cx + 1, 2 * cy + 1

    def _smooth(self, k: int, x, b, sweeps: int):
        op, binv = self._ops[k], self._binvs[k]
        omega = self._aux[4]
        for _ in range(sweeps):
            r = b - op.apply_constrained(x)
            rn = r.reshape(-1, 2)
            x = x + omega * jnp.einsum("ncd,nd->nc", binv, rn).reshape(-1)
        return x

    def _vcycle(self, k: int, b):
        n_smooth = self._aux[3]
        if k == self.n_levels - 1:
            return self._coarse_inv @ b
        x = self._smooth(k, jnp.zeros_like(b), b, n_smooth)
        r = b - self._ops[k].apply_constrained(x)
        px, py = self._grid(k)
        rc = restrict2d(r.reshape(px, py, 2)).reshape(-1) * self._masks[k + 1]
        xc = self._vcycle(k + 1, rc)
        pxc, pyc = self._grid(k + 1)
        x = x + prolong2d(xc.reshape(pxc, pyc, 2)).reshape(-1) * self._masks[k]
        return self._smooth(k, x, b, n_smooth)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        """One symmetric V-cycle: z ~= K^-1 r (use as pcg's M_inv)."""
        return self._vcycle(0, r)
