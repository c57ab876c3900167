"""One-call multi-chip structured solve: the product-surface entry point.

Round-2 femx had the distributed machinery (parallel.halo: slab-local CG,
plane-only halo exchange, distributed V-cycle) as a library that no
user-facing pipeline invoked. This module is the missing driver:
`SolidReactionAnalysis(..., devices=N).solve()` and `femx solid --devices N`
route structured meshes here, mirroring the reference's one-call
`run_simulation` ergonomics (ReactionSolver.py:226-232) on a device mesh.

Divisibility: parallel.halo requires the z cell count to divide the device
count (slab decomposition) and 2x that for a distributed restriction. Real
meshes won't always cooperate, so the driver GHOST-PADS the lattice in z up
to the next multiple of 2*ndev: padded cells are entirely Dirichlet-fixed
(free_mask 0), the operator treats fixed DOFs as identity rows, and the
padded region provably carries zeros through the whole solve — the answer
on the physical region is unchanged (equality-tested vs the single-device
solve in tests/test_distributed_pipeline.py).

Mixed precision: for float32 operators the same adaptive f64 iterative
refinement as the single-chip path (solve.cg.pcg_refined's scheme) wraps
pcg_halo — residuals evaluated through the f64 operator on the host-visible
full vector, corrections solved distributed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from femx.assembly_structured import (StructuredSolidOperator, pad_z_raster,
                                      unpad_z_raster)
from femx.parallel.halo import DistributedMultigrid, pcg_halo
from femx.solve.multigrid import StructuredMultigrid

# shared with the single-device lane-pad path (assembly_structured)
_pad_z = pad_z_raster
_unpad_z = unpad_z_raster


class DistributedStructuredSolver:
    """Reusable z-slab-distributed structured solver: builds the padded
    operator + distributed multigrid ONCE, then solves any number of
    right-hand sides through the same cached compiled kernels (pcg_halo's
    per-(halo, preconditioner, tol) jit cache). Powers both
    ``SolidReactionAnalysis(devices=N).solve()`` and
    ``solve_cases(...)`` after a distributed solve."""

    def __init__(self, n_cells, spacing, E, nu, mask_global, weight=None,
                 dtype=np.float32, devices=None, axis="z"):
        devs = jax.devices()
        ndev = len(devs) if devices is None else int(devices)
        if ndev < 2:
            raise ValueError("distributed solve needs >= 2 devices")
        if ndev > len(devs):
            raise ValueError(f"requested {ndev} devices, have {len(devs)}")
        nx, ny, nz = (int(c) for c in n_cells)
        sp = tuple(float(s) for s in spacing)
        self.ndev, self.axis, self.dtype = ndev, axis, np.dtype(dtype)

        # ghost-pad z so slabs decompose AND the first z-restriction stays
        # local
        step = 2 * ndev
        nz_p = ((nz + step - 1) // step) * step
        self.nz_p = nz_p
        self.grid_old = (2 * nx + 1, 2 * ny + 1, 2 * nz + 1)
        self.grid_new = (2 * nx + 1, 2 * ny + 1, 2 * nz_p + 1)
        self.mask_global = np.asarray(mask_global, dtype=np.float64)
        mask_p = _pad_z(self.mask_global, self.grid_old, self.grid_new)

        op_p = StructuredSolidOperator.from_lattice(
            (nx, ny, nz_p), sp, E, nu, weight=weight, dtype=dtype)
        if nz_p != nz:
            import dataclasses

            zw = np.zeros(nz_p)
            zw[:nz] = 1.0
            kch = op_p.Kcell_host
            op_p = dataclasses.replace(op_p,
                                       z_weight=jnp.asarray(zw, dtype=dtype))
            object.__setattr__(op_p, "_Kcell_host", kch)
        self.op_p = op_p = op_p.with_free_mask(
            op_p.to_internal(mask_p).astype(dtype))

        self.mg = StructuredMultigrid(None, (nx, ny, nz_p), E, nu, mask_p,
                                      weight=weight, spacing=sp, dtype=dtype,
                                      fine_op=op_p)
        dmesh = Mesh(np.array(devs[:ndev]), (axis,))
        self.dmg = DistributedMultigrid(self.mg, dmesh, axis=axis)  # raises
        self.prec = self.dmg.preconditioner()  # built once; every solve and
        # refinement pass reuses it so pcg_halo's traced-solver cache hits
        self._op64 = None

    def solve(self, f_global, tol=1e-8, refine_steps=4,
              checkpoint_path=None, checkpoint_chunk=500):
        """Solve for one global-raster RHS; returns (u_global, info) on the
        UNPADDED lattice. float32 operators with tol < 1e-5 get the adaptive
        guarded f64 refinement wrap.

        checkpoint_path: when set, the distributed CG runs in
        `checkpoint_chunk`-iteration warm-restarted segments with (x,
        iterations) persisted atomically between segments
        (femx.checkpoint); a re-run resumes from the saved state."""
        f_p = _pad_z(np.asarray(f_global, dtype=np.float64)
                     * self.mask_global, self.grid_old, self.grid_new)
        op_p, dmg = self.op_p, self.dmg
        f_int = op_p.to_internal(f_p)
        inner_tol = max(tol, 1e-5) if self.dtype == np.float32 else tol
        resumed = None
        if checkpoint_path:
            from femx.checkpoint import load_state, save_state

            arrays, meta = load_state(checkpoint_path)
            x0 = None
            resumed = 0
            if arrays is not None and arrays["x"].shape == f_int.shape:
                x0 = np.asarray(arrays["x"], dtype=f_int.dtype)
                resumed = int((meta or {}).get("iterations", 0))
            it = resumed
            while True:
                x_int, it_c, res, ok = pcg_halo(
                    dmg.halo, f_int, tol=inner_tol, maxiter=checkpoint_chunk,
                    preconditioner=self.prec, x0_internal=x0)
                it += it_c
                save_state(checkpoint_path, {"x": np.asarray(x_int)},
                           {"iterations": it, "residual": float(res)})
                if ok or it_c == 0 or it >= 50000:
                    break
                x0 = np.asarray(x_int)
        else:
            x_int, it, res, ok = pcg_halo(dmg.halo, f_int, tol=inner_tol,
                                          preconditioner=self.prec)
        total_it = it
        info = {
            "method": f"distributed_halo_mg_pcg[{self.ndev}x{self.axis}]",
            "devices": self.ndev,
            "distributed_levels": dmg.n_dist,
            "padded_nz": self.nz_p,
            "iterations": it,
            "residual": res,
            "converged": ok,
            **({} if resumed is None else {
                "checkpoint": checkpoint_path,
                "resumed_iterations": resumed}),
        }

        if self.dtype == np.float32 and tol < 1e-5:
            # adaptive guarded f64 refinement (same scheme/measurements as
            # solve.cg.pcg_refined: ~86x contraction per pass, revert on
            # non-improvement, stop at the f64 evaluation floor)
            if self._op64 is None:
                self._op64 = op_p.astype(np.float64)
            op64 = self._op64
            f64_int = jnp.asarray(op_p.to_internal(f_p))
            from femx.analysis.solid import _jit_apply_op

            x_h = jnp.asarray(x_int, dtype=jnp.float64)
            bnorm = float(jnp.linalg.norm(f64_int)) or 1.0
            rn_prev = np.inf
            for _ in range(refine_steps):
                r_h = f64_int - _jit_apply_op(x_h, op64)
                rn = float(jnp.linalg.norm(r_h)) / bnorm
                if rn <= tol or rn >= rn_prev:
                    break
                rn_prev = rn
                d_int, it_c, _res_c, _ok = pcg_halo(
                    dmg.halo, np.asarray(r_h, dtype=np.float32),
                    tol=inner_tol, preconditioner=self.prec)
                x_new = x_h + jnp.asarray(d_int, dtype=jnp.float64)
                r_new = f64_int - _jit_apply_op(x_new, op64)
                rn_new = float(jnp.linalg.norm(r_new)) / bnorm
                total_it += it_c
                if rn_new < rn:
                    x_h = x_new
                else:
                    break  # past the f64 floor; keep the better iterate
            r_h = f64_int - _jit_apply_op(x_h, op64)
            rn = float(jnp.linalg.norm(r_h)) / bnorm
            x_int = np.asarray(x_h)
            info.update({
                "method": info["method"] + "_refined",
                "iterations": total_it,
                "residual": rn,
                "converged": rn <= tol,
            })

        u_global_p = op_p.to_global(np.asarray(x_int))
        return _unpad_z(u_global_p, self.grid_old, self.grid_new), info


def distributed_structured_solve(
    n_cells,
    spacing,
    E: float,
    nu: float,
    mask_global: np.ndarray,
    f_global: np.ndarray,
    weight: Optional[float] = None,
    dtype=np.float32,
    tol: float = 1e-8,
    devices: Optional[int] = None,
    axis: str = "z",
    refine_steps: int = 4,
) -> Tuple[np.ndarray, dict]:
    """Solve K u = f on a structured lattice over a z-slab device mesh.

    One-shot wrapper around DistributedStructuredSolver (build + solve).

    Args:
      n_cells, spacing: lattice geometry (mesh.structured contract).
      mask_global, f_global: (ndof,) in GLOBAL raster DOF order.
      tol: target TRUE relative residual. For float32 this drives the f64
        refinement loop; inner distributed solves run at max(tol, 1e-5).
      devices: number of devices (default: all available).

    Returns (u_global, info) with u in global raster order on the UNPADDED
    lattice. Raises ValueError when the lattice cannot be slab-distributed
    (e.g. nx/ny odd — no uniform first coarsening); callers fall back to the
    single-device path.
    """
    solver = DistributedStructuredSolver(
        n_cells, spacing, E, nu, mask_global, weight=weight, dtype=dtype,
        devices=devices, axis=axis)
    return solver.solve(f_global, tol=tol, refine_steps=refine_steps)
