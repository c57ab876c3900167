"""Solid reaction-force analysis: 3D Tetra10 elasticity pipeline.

Headless equivalent of the reference's `ForceAnalysis`
(ReactionSolver.py:16-306) with the same constructor contract
(msh_file, force_data, fix_data, E, v), the same pipeline stages and console
observability, and the same outputs (u, reactions at snapped fix nodes,
equilibrium check, negative-detJ quality count) — built on femx's matrix-free
TPU operator instead of scipy lil/CSR + SuperLU:

  assemble   -> SolidOperator (per-gauss gradients, einsum action; no global
                sparse matrix is ever formed)
  small path -> materialized element matrices, dense masked Cholesky
  large path -> Jacobi-PCG on the constrained matrix-free operator

Quadrature: correct w=1/24 by default; pass
ReferenceCompat(tet10_quadrature_weight_bug=True) to bit-match the
reference's 6x-stiffened displacement field (SURVEY.md §6 quirk 1; reactions
are identical either way since r = K u).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from femx import bc as bc_mod
from femx.assembly import SolidOperator, assemble_dense, dof_map
from femx.config import DEFAULT_COMPAT, ReferenceCompat
from femx.elements import tet10 as tet10_el
from femx.mesh.core import Mesh, nodes_in_physical_group
from femx.mesh.msh_io import read_msh
from femx.solve.cg import pcg, pcg_refined
from femx.solve.dense import solve_dense


# ---------------------------------------------------------------------------
# Module-level jitted solver entry points. These MUST be defined once at
# module scope: wrapping a fresh jax.jit(lambda ...) per call re-traces and
# re-loads the executable every time (tens of seconds per trace for the
# million-DOF programs through the remote TPU compiler — measured), whereas
# module-level jits hit the in-process cache after the first call. All
# operators/preconditioners enter as pytree ARGUMENTS (closed-over device
# arrays become compiled-program constants and dominate the remote-compile
# payload); tol/maxiter are traced scalars so retuning them doesn't retrace.
# ---------------------------------------------------------------------------
def _bj_apply(op_, bj_data, r):
    """Block-Jacobi application for either internal-order unstructured
    operator: SolidOperatorTG carries its tensors on .soa ((3,3,N) cols),
    SolidOperatorCluster on itself ((N,3,3) blocks). Static Python dispatch —
    resolved at trace time, zero runtime cost."""
    src = getattr(op_, "soa", op_)
    return type(src).apply_block_jacobi(bj_data, r)


@jax.jit
def _jit_pcg_mg(fv, mg_, tol, maxiter):
    return pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
               tol=tol, maxiter=maxiter)


@jax.jit
def _jit_pcg_mg_cases(F, mg_, tol, maxiter):
    def one(fv):
        r = pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                tol=tol, maxiter=maxiter)
        return r.x, r.iterations, r.residual_norm

    return jax.lax.map(one, F)


@jax.jit
def _jit_pcg_op_precond_cases(F, op_, pre_, tol, maxiter):
    def one(fv):
        r = pcg(op_.apply_constrained, fv, M_inv_diag=pre_, tol=tol,
                maxiter=maxiter)
        return r.x, r.iterations, r.residual_norm

    return jax.lax.map(one, F)


@jax.jit
def _jit_pcg_st_bj_cases(F, op_, binv, tol, maxiter):
    def one(fv):
        r = pcg(op_.apply_constrained, fv,
                M_inv_diag=lambda v: op_.apply_block_jacobi(binv, v),
                tol=tol, maxiter=maxiter)
        return r.x, r.iterations, r.residual_norm

    return jax.lax.map(one, F)


@jax.jit
def _jit_pcg_op_bj_cases(F, op_, bj_data, tol, maxiter):
    def one(fv):
        r = pcg(op_.apply_constrained, fv,
                M_inv_diag=lambda v: _bj_apply(op_, bj_data, v),
                tol=tol, maxiter=maxiter)
        return r.x, r.iterations, r.residual_norm

    return jax.lax.map(one, F)


@jax.jit
def _jit_pcg_refined_mg(fv, fv64, mg_, op64_, tol, outer_tol):
    return pcg_refined(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                       tol=tol, refine_steps=8,
                       A_residual=op64_.apply_constrained, b_residual=fv64,
                       outer_tol=outer_tol)


@jax.jit
def _jit_pcg_op_precond(fv, op_, precond_, tol, maxiter):
    return pcg(op_.apply_constrained, fv, M_inv_diag=precond_, tol=tol,
               maxiter=maxiter)


@jax.jit
def _jit_pcg_op_bj(fv, op_, bj_data, tol, maxiter):
    return pcg(op_.apply_constrained, fv,
               M_inv_diag=lambda r: _bj_apply(op_, bj_data, r),
               tol=tol, maxiter=maxiter)


@jax.jit
def _jit_pcg_st_bj(fv, op_, binv, tol, maxiter):
    return pcg(op_.apply_constrained, fv,
               M_inv_diag=lambda r: op_.apply_block_jacobi(binv, r), tol=tol,
               maxiter=maxiter)


@jax.jit
def _jit_pcg_refined_st_bj(fv, fv64, op_, op64_, binv, tol, outer_tol):
    return pcg_refined(op_.apply_constrained, fv,
                       M_inv_diag=lambda r: op_.apply_block_jacobi(binv, r),
                       tol=tol, refine_steps=8,
                       A_residual=op64_.apply_constrained, b_residual=fv64,
                       outer_tol=outer_tol)


@jax.jit
def _jit_pcg_refined_op_precond(fv, fv64, op_, op64_, precond_, tol, outer_tol):
    return pcg_refined(op_.apply_constrained, fv, M_inv_diag=precond_,
                       tol=tol, refine_steps=8,
                       A_residual=op64_.apply_constrained, b_residual=fv64,
                       outer_tol=outer_tol)


@jax.jit
def _jit_pcg_refined_op_bj(fv, fv64, op_, op64_, bj_data, tol, outer_tol):
    return pcg_refined(op_.apply_constrained, fv,
                       M_inv_diag=lambda r: _bj_apply(op_, bj_data, r),
                       tol=tol, refine_steps=8,
                       A_residual=op64_.apply_constrained, b_residual=fv64,
                       outer_tol=outer_tol)


# warm-restartable (x0-taking) chunk solvers for the checkpoint=PATH path
# (femx.checkpoint.pcg_checkpointed drives these in `chunk`-iteration
# segments, persisting state between segments)
@jax.jit
def _jit_pcg_mg_chunk(fv, x0, mg_, tol, maxiter):
    return pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_, x0=x0,
               tol=tol, maxiter=maxiter)


@jax.jit
def _jit_pcg_st_bj_chunk(fv, x0, op_, binv, tol, maxiter):
    return pcg(op_.apply_constrained, fv,
               M_inv_diag=lambda r: op_.apply_block_jacobi(binv, r), x0=x0,
               tol=tol, maxiter=maxiter)


@jax.jit
def _jit_pcg_op_precond_chunk(fv, x0, op_, precond_, tol, maxiter):
    return pcg(op_.apply_constrained, fv, M_inv_diag=precond_, x0=x0,
               tol=tol, maxiter=maxiter)


@jax.jit
def _jit_pcg_op_bj_chunk(fv, x0, op_, bj_data, tol, maxiter):
    return pcg(op_.apply_constrained, fv,
               M_inv_diag=lambda r: _bj_apply(op_, bj_data, r),
               x0=x0, tol=tol, maxiter=maxiter)


@jax.jit
def _jit_apply_op(v, op_):
    return op_.apply_constrained(v)


class SolidReactionAnalysis:
    """3D solid elasticity with point loads/fixes and reaction recovery."""

    DENSE_DOF_LIMIT = 6000  # below: dense Cholesky; above: matrix-free PCG
    MG_DOF_THRESHOLD = 150_000  # structured meshes above this get MG-PCG

    def __init__(
        self,
        msh_file: Union[str, Mesh],
        force_data: Sequence[dict],
        fix_data: Sequence[dict],
        E: float,
        v: float,
        compat: ReferenceCompat = DEFAULT_COMPAT,
        dtype=None,
        solver: str = "auto",
        cg_tol: float = 1e-10,
        verbose: bool = True,
        devices: Optional[int] = None,
        checkpoint: Optional[str] = None,
        checkpoint_chunk: int = 500,
        unstructured_operator: Optional[str] = None,
        structured_apply: Optional[str] = None,
    ):
        self.msh_file = msh_file
        self.force_data = list(force_data)
        self.fix_data = list(fix_data)
        self.E = float(E)
        self.v = float(v)
        self.compat = compat
        self.dtype = dtype
        self.solver = solver
        self.cg_tol = cg_tol
        self.verbose = verbose
        # devices > 1 routes structured meshes through the z-slab-distributed
        # halo MG-PCG (femx.parallel.driver) — multi-chip with the same
        # one-call ergonomics as the reference's run_simulation
        self.devices = devices
        # checkpoint=PATH makes the solve resumable after a crash/preemption:
        # CG runs in `checkpoint_chunk`-iteration segments, persisting
        # (x, iterations) atomically between segments; a re-run with the same
        # path warm-starts from the saved state (femx.checkpoint). Covers
        # the structured, unstructured and devices=N solve paths.
        self.checkpoint = checkpoint
        self.checkpoint_chunk = int(checkpoint_chunk)
        # Large-unstructured operator family: "tg" (transpose-gather,
        # femx.assembly_tg — the default) or "cluster" (Morton-clustered
        # dense blocks, femx.assembly_cluster — ~4x fewer gather rows per
        # apply at the cost of a heavier host-side build; opt in per
        # analysis or globally via FEMX_UNSTRUCTURED_OP=cluster).
        uop = unstructured_operator or os.environ.get(
            "FEMX_UNSTRUCTURED_OP", "tg")
        if uop not in ("tg", "cluster", "groupell"):
            raise ValueError(
                "unstructured_operator must be 'tg', 'cluster' or "
                f"'groupell', got {uop!r}")
        self.unstructured_operator = uop
        # Structured apply form: "slot" (gather-free slot stack, default)
        # or "conv" (femx.assembly_conv one-correlation stencil; pending the
        # on-chip A/B). The routing flag is read at TRACE time deep inside
        # the operator, so the per-analysis arg sets the process-wide env
        # (same contract as FEMX_STRUCTURED_APPLY itself — one form per
        # process; mixing forms in one process needs jax.clear_caches()).
        sap = structured_apply or os.environ.get("FEMX_STRUCTURED_APPLY",
                                                 "slot")
        if sap not in ("slot", "conv"):
            raise ValueError(
                f"structured_apply must be 'slot' or 'conv', got {sap!r}")
        self.structured_apply = sap
        if structured_apply is not None:
            prev = os.environ.get("FEMX_STRUCTURED_APPLY", "slot")
            os.environ["FEMX_STRUCTURED_APPLY"] = sap
            if prev != sap:
                # The flag is read at TRACE time: a same-shape program
                # compiled under the previous form would be silently reused
                # from the jit cache otherwise.
                import jax

                jax.clear_caches()

        self.pd = 3
        self.u: Optional[np.ndarray] = None
        self.f: Optional[np.ndarray] = None
        self.reaction_forces: Optional[np.ndarray] = None
        self.fixed_nodes_info: List[dict] = []
        self.applied_forces_info: List[dict] = []
        self.negative_detJ_count = 0
        self.operator: Optional[SolidOperator] = None
        self.solve_info: dict = {}
        self.stage_times: dict = {}

        self._read_mesh()
        self.C = tet10_el.material_matrix(self.E, self.v)

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def _read_mesh(self) -> None:
        self._log("1. Reading mesh file...")
        t0 = time.perf_counter()
        self.mesh = self.msh_file if isinstance(self.msh_file, Mesh) else read_msh(self.msh_file)
        self.points = self.mesh.points
        self.num_nodes = len(self.points)
        self.tetra10_conn = self.mesh.cells.get("tetra10")
        if self.tetra10_conn is None:
            raise ValueError("Mesh has no 'tetra10' elements.")
        self.diri_nodes = nodes_in_physical_group(self.mesh, "Diri_BCs", "vertex")
        self.neumann_nodes = nodes_in_physical_group(self.mesh, "Neumann_BCs", "vertex")
        self.stage_times["read_mesh"] = time.perf_counter() - t0
        self._log(f"   - Nodes: {self.num_nodes}, Tetra10 Elements: {len(self.tetra10_conn)}")

    @property
    def weight(self) -> float:
        return self.compat.tet10_gauss_weight

    def assemble_stiffness_matrix(self) -> None:
        """Build the matrix-free operator (and count bad Jacobians).

        Structured box meshes (femx.mesh.box_tet10) get the gather-free
        lattice operator (femx.assembly_structured) — the TPU fast path;
        general unstructured meshes use the gather/scatter operator."""
        self._log("2. Assembling global stiffness operator (matrix-free)...")
        t0 = time.perf_counter()
        if getattr(self.mesh, "structured", None) is not None and self.solver != "dense":
            from femx.assembly_structured import StructuredSolidOperator

            self.operator = StructuredSolidOperator.from_mesh(
                self.mesh, self.E, self.v, weight=self.weight,
                dtype=self.dtype or np.float64,
            )
            # Structured cells are affine images of the unit Kuhn subdivision:
            # every Jacobian is positive by construction.
            self.negative_detJ_count = 0
            self._structured = True
        elif (
            self.solver not in ("dense",)
            and 3 * self.num_nodes > self.DENSE_DOF_LIMIT
        ):
            # Large unstructured: transpose-gather operator (scatter-free;
            # measured 39 ms vs 139 ms per apply @ 1.39M DOF on v5e — see
            # femx.assembly_tg), or the Morton-clustered dense-block
            # operator (femx.assembly_cluster, ~4x fewer gather rows) when
            # unstructured_operator="cluster". Both run in an internal
            # node order; solve() converts layouts once per solve.
            if self.unstructured_operator == "cluster":
                from femx.assembly_cluster import SolidOperatorCluster

                self.operator, detJ = SolidOperatorCluster.from_mesh(
                    self.points, self.tetra10_conn, self.E, self.v,
                    weight=self.weight, dtype=self.dtype or np.float64,
                )
            elif self.unstructured_operator == "groupell":
                # group-ELL pre-assembles dense blocks whose storage grows
                # with the mesh (~8.7 blocks x 1152 B per element measured
                # at the flagship); above FEMX_GROUPELL_MAX_BLOCKS
                # (default sized for a ~5 GB ceiling on a 16 GB chip) the
                # route falls back to the matrix-free TG operator instead
                # of exhausting HBM (advisor round-4).
                max_blocks = int(os.environ.get(
                    "FEMX_GROUPELL_MAX_BLOCKS", "4500000"))
                est_blocks = int(8.7 * len(self.tetra10_conn))
                if est_blocks > max_blocks:
                    self._log(
                        f"   - group-ELL estimated {est_blocks} blocks > "
                        f"cap {max_blocks}; using the TG operator "
                        "(FEMX_GROUPELL_MAX_BLOCKS raises the cap).")
                    from femx.assembly_tg import SolidOperatorTG

                    self.operator, detJ = SolidOperatorTG.from_mesh(
                        self.points, self.tetra10_conn, self.E, self.v,
                        weight=self.weight, dtype=self.dtype or np.float64,
                    )
                else:
                    from femx.assembly_groupell import SolidOperatorGroupELL

                    self.operator, detJ = SolidOperatorGroupELL.from_mesh(
                        self.points, self.tetra10_conn, self.E, self.v,
                        weight=self.weight, dtype=self.dtype or np.float64,
                    )
            else:
                from femx.assembly_tg import SolidOperatorTG

                self.operator, detJ = SolidOperatorTG.from_mesh(
                    self.points, self.tetra10_conn, self.E, self.v,
                    weight=self.weight, dtype=self.dtype or np.float64,
                )
            self.negative_detJ_count = int(jnp.sum(detJ <= 1e-12))
            self._structured = False
        else:
            self.operator, detJ = SolidOperator.from_mesh(
                self.points, self.tetra10_conn, self.C, weight=self.weight, dtype=self.dtype
            )
            self.negative_detJ_count = int(jnp.sum(detJ <= 1e-12))
            self._structured = False
        self.stage_times["assemble"] = time.perf_counter() - t0
        self._log("   - Assembly complete.")

    def apply_boundary_conditions(self) -> None:
        self._log("3. Applying point-based boundary conditions...")
        t0 = time.perf_counter()
        cs = bc_mod.solid_point_constraints(self.mesh, self.fix_data, self.diri_nodes)
        self.constraints = cs
        self.fixed_dofs = cs.fixed_dofs
        self.fixed_nodes_info = cs.fixed_nodes_info
        self._log(f"   - Fixed {len(self.fixed_dofs)} DOFs.")

        self._log(f"   - Applying {len(self.force_data)} force(s)...")
        self.f, self.applied_forces_info = bc_mod.solid_point_loads(
            self.mesh, self.force_data, self.neumann_nodes
        )
        for info in self.applied_forces_info:
            self._log(f"     - Applied force {info['force_vec']} N to node {info['node_idx']}.")
        self.active_dofs = cs.free_dofs
        self.stage_times["bc"] = time.perf_counter() - t0

    def _solve_chunked(self, f_vec, solve_chunk, tol):
        """checkpoint=PATH driver: chunked warm-restart CG with persisted
        state (femx.checkpoint.pcg_checkpointed); returns
        (CGResult, resumed_iteration_count)."""
        from femx import checkpoint as ckpt

        arrays, meta = ckpt.load_state(self.checkpoint)
        resumed = (int((meta or {}).get("iterations", 0))
                   if arrays is not None else 0)
        res = ckpt.pcg_checkpointed(
            None, f_vec, tol=tol, maxiter=50000, chunk=self.checkpoint_chunk,
            checkpoint_path=self.checkpoint, verbose=self.verbose,
            solve_chunk=solve_chunk)
        return res, resumed

    def _refine_host(self, res, corr_solve, f64_int, low_dtype):
        """Adaptive guarded f64 refinement around a checkpointed
        low-precision solve — solve.cg.pcg_refined's scheme (accept a pass
        only if the true residual drops; stop at the f64 floor),
        host-orchestrated so each ACCEPTED pass persists to the checkpoint
        (a preempted refinement redoes at most one pass on resume)."""
        from femx.checkpoint import save_state
        from femx.solve.cg import CGResult

        op64 = self._op64
        x_h = jnp.asarray(res.x, jnp.float64)
        bnorm = float(jnp.linalg.norm(f64_int)) or 1.0
        total = int(res.iterations)
        rn_prev = np.inf
        rn = float(jnp.linalg.norm(f64_int - _jit_apply_op(x_h, op64))) / bnorm
        for _ in range(8):
            if rn <= self.cg_tol or rn >= rn_prev:
                break
            rn_prev = rn
            r = f64_int - _jit_apply_op(x_h, op64)
            c = corr_solve(jnp.asarray(r, dtype=low_dtype))
            x_new = x_h + jnp.asarray(c.x, jnp.float64)
            rn_new = float(jnp.linalg.norm(
                f64_int - _jit_apply_op(x_new, op64))) / bnorm
            total += int(c.iterations)
            if rn_new < rn:
                x_h, rn = x_new, rn_new
                if self.checkpoint:
                    save_state(self.checkpoint, {"x": np.asarray(x_h)},
                               {"iterations": total, "residual": rn})
            else:
                break  # past the f64 floor; keep the better iterate
        return CGResult(x=x_h, iterations=jnp.asarray(total),
                        residual_norm=jnp.asarray(rn),
                        converged=jnp.asarray(rn <= self.cg_tol))

    def solve(self) -> None:
        self._log("4. Solving the linear system...")
        t0 = time.perf_counter()
        ndof = 3 * self.num_nodes
        if self._structured and (self.devices or 0) > 1:
            if self._solve_distributed():
                self.stage_times["solve"] = time.perf_counter() - t0
                return
        elif (self.devices or 0) > 1:
            if self._solve_distributed_unstructured():
                self.stage_times["solve"] = time.perf_counter() - t0
                return
        if self._structured:
            from femx.assembly_structured import (
                conv_routing_active, lane_friendly_nz, pad_z_raster,
                unpad_z_raster)

            dtype = self.operator.Kcell.dtype
            # structured operator runs in its internal phase-major layout
            mask_g = self.constraints.free_mask()
            # Large structured systems get the geometric-multigrid
            # preconditioner (mesh-independent ~15 iterations); small ones
            # stay on block-Jacobi (MG level setup doesn't pay off).
            use_mg = self.solver == "mg" or (
                self.solver == "auto" and ndof > self.MG_DOF_THRESHOLD
            )
            info = self.mesh.structured
            # Lane-pad nz out of the slow tiling regime (the ~50M-DOF cliff:
            # 24 vs 11 ns/cell — see assembly_structured.lane_friendly_nz).
            # Ghost cells carry zero stiffness (z_weight) + fixed DOFs, so
            # the solution on the real lattice is identical
            # (tests/test_lane_pad.py).
            pad_grids = None
            t_pre = time.perf_counter()
            if use_mg:
                nzc = int(info.n_cells[2])
                nzp = lane_friendly_nz(nzc)
                if nzp != nzc:
                    nxc, nyc = int(info.n_cells[0]), int(info.n_cells[1])
                    pad_grids = ((2 * nxc + 1, 2 * nyc + 1, 2 * nzc + 1),
                                 (2 * nxc + 1, 2 * nyc + 1, 2 * nzp + 1))
                    self._log(f"   - Lane-padding nz {nzc} -> {nzp} "
                              "(ghost cells; fast-tiling lattice).")
            minv = None
            if use_mg:
                from femx.solve.multigrid import StructuredMultigrid

                try:
                    if pad_grids is not None:
                        mask_r = pad_z_raster(mask_g, *pad_grids)
                        minv = StructuredMultigrid(
                            None, (nxc, nyc, nzp), self.E, self.v, mask_r,
                            weight=self.weight, dtype=np.dtype(dtype).type,
                            spacing=info.spacing, real_cells=info.n_cells,
                            smoother=os.environ.get("FEMX_MG_SMOOTHER",
                                                    "jacobi"),
                        )
                        op = minv.fine_op
                    else:
                        op = self.operator.with_free_mask(
                            jnp.asarray(self.operator.to_internal(mask_g),
                                        dtype=dtype))
                        minv = StructuredMultigrid(
                            None, info.n_cells, self.E, self.v, mask_g,
                            weight=self.weight, dtype=np.dtype(dtype).type,
                            fine_op=op, spacing=info.spacing,
                            smoother=os.environ.get("FEMX_MG_SMOOTHER",
                                                    "jacobi"),
                        )
                    method = "structured_multigrid_pcg"
                except ValueError as e:
                    # e.g. hierarchy bottoms out too large (odd anisotropic
                    # cell counts) — block-Jacobi PCG still solves correctly.
                    self._log(f"   - Multigrid unavailable ({e}); "
                              "falling back to block-Jacobi PCG.")
                    pad_grids = None
            if minv is None:
                op = self.operator.with_free_mask(
                    jnp.asarray(self.operator.to_internal(mask_g),
                                dtype=dtype))
            self.operator = op
            f_raster = self.f * mask_g
            if pad_grids is not None:
                f_raster = pad_z_raster(f_raster, *pad_grids)
            f_int = jnp.asarray(op.to_internal(f_raster), dtype=dtype)
            binv = None
            if minv is None:
                # block-Jacobi tensors (not the closure form) so the solve
                # can take them as jit ARGUMENTS
                binv = [jnp.asarray(b) for b in op.block_jacobi_tensors()]
                minv = ("st_bj", binv)
                method = "structured_block_jacobi_pcg"
            self._precond = minv
            t_pre = time.perf_counter() - t_pre
            from femx.solve.multigrid import StructuredMultigrid

            # The MG preconditioner enters jit as a pytree ARGUMENT (its
            # ~100 MB of arrays as closed-over constants dominate the
            # remote-compile payload on TPU; see StructuredMultigrid).
            mg_arg = minv if isinstance(minv, StructuredMultigrid) else None
            resumed = None
            if self.checkpoint:
                inner_tol = (max(self.cg_tol, 1e-5)
                             if np.dtype(dtype) == np.float32 else self.cg_tol)
                if mg_arg is not None:
                    chunk_fn = (lambda fv, x0: _jit_pcg_mg_chunk(
                        fv, x0, mg_arg, inner_tol, self.checkpoint_chunk))
                else:
                    chunk_fn = (lambda fv, x0: _jit_pcg_st_bj_chunk(
                        fv, x0, op, binv, inner_tol, self.checkpoint_chunk))
                res, resumed = self._solve_chunked(f_int, chunk_fn, inner_tol)
                if np.dtype(dtype) == np.float32 and self.cg_tol < 1e-5:
                    self._op64 = op.astype(np.float64)
                    f64_int = jnp.asarray(op.to_internal(f_raster))
                    corr = ((lambda r: _jit_pcg_mg(r, mg_arg, inner_tol, 10000))
                            if mg_arg is not None else
                            (lambda r: _jit_pcg_st_bj(r, op, binv, inner_tol,
                                                      10000)))
                    res = self._refine_host(res, corr, f64_int,
                                            np.dtype(dtype))
                method += "_checkpointed"
            elif np.dtype(dtype) == np.float32:
                # f32 inner solves + ADAPTIVE f64 iterative refinement to a
                # true residual <= cg_tol (~86x contraction per pass,
                # divergence-guarded; see solve.cg.pcg_refined). A pure-f32
                # solve cannot push the TRUE residual below ~1e-2 rel
                # (catastrophic cancellation in b - K x with K entries ~E*h).
                op64 = op.astype(np.float64)
                self._op64 = op64
                f64_int = jnp.asarray(op.to_internal(f_raster))
                inner_tol = max(self.cg_tol, 1e-5)
                if mg_arg is not None:
                    res = _jit_pcg_refined_mg(f_int, f64_int, mg_arg, op64,
                                              inner_tol, self.cg_tol)
                else:
                    res = _jit_pcg_refined_st_bj(f_int, f64_int, op, op64,
                                                 binv, inner_tol, self.cg_tol)
                method += "_refined"
            elif mg_arg is not None:
                res = _jit_pcg_mg(f_int, mg_arg, self.cg_tol, 10000)
            else:
                res = _jit_pcg_st_bj(f_int, op, binv, self.cg_tol, 10000)
            u_int = res.x
            self.solve_info = {
                "method": method,
                "iterations": int(res.iterations),
                "residual": float(res.residual_norm),
                "converged": bool(res.converged),
                # setup-vs-solve honesty (round-4 VERDICT): MG hierarchy /
                # block-Jacobi build vs compile+iterate
                "precond_setup_s": round(t_pre, 3),
                "solve_s": round(time.perf_counter() - t0 - t_pre, 3),
                # EFFECTIVE apply form (the request can be gated off by
                # size/dtype/weights — report what actually ran)
                "structured_apply": "conv" if conv_routing_active(op)
                else "slot",
                **({} if resumed is None else {
                    "checkpoint": self.checkpoint,
                    "resumed_iterations": resumed}),
            }
            u_raster = op.to_global(np.asarray(u_int))
            self.u = (u_raster if pad_grids is None
                      else unpad_z_raster(u_raster, *pad_grids))
            self._log("   - System solved.")
            # reactions r = K u in the precision of the solution (the
            # refined path returns f64 x; applying the f32 operator to it
            # would both lose the refinement and mismatch lax.dot dtypes)
            x_dt = np.dtype(np.asarray(u_int).dtype)
            r_op = getattr(self, "_op64", op) if x_dt == np.float64 else op
            r_op = r_op.astype(x_dt)
            r_raster = r_op.to_global(np.asarray(r_op.apply(u_int)))
            self.reaction_forces = (r_raster if pad_grids is None
                                    else unpad_z_raster(r_raster, *pad_grids))
            self._lane_pad_grids = pad_grids  # for tests/solve_cases
            self.stage_times["solve"] = time.perf_counter() - t0
            return

        from femx.assembly_cluster import SolidOperatorCluster
        from femx.assembly_groupell import SolidOperatorGroupELL
        from femx.assembly_tg import SolidOperatorTG

        if isinstance(self.operator, (SolidOperatorTG, SolidOperatorCluster,
                                      SolidOperatorGroupELL)):
            # internal-order unstructured operator (degree-sorted for TG,
            # cluster-degree-sorted for cluster, pair/group-bucketed for
            # group-ELL) — same solve machinery
            op = self.operator
            dtype = op.dtype
            mask_g = self.constraints.free_mask()
            # group-ELL's block-Jacobi builder runs on HOST tensors — hand
            # it the numpy mask (np in -> host mirror kept) instead of a
            # device array it would have to read back through the relay.
            mask_int = op.to_internal(mask_g)
            op = op.with_free_mask(
                mask_int.astype(np.dtype(dtype))
                if isinstance(op, SolidOperatorGroupELL)
                else jnp.asarray(mask_int, dtype=dtype))
            self.operator = op
            f_int = jnp.asarray(op.to_internal(self.f * mask_g), dtype=dtype)
            # Block-Jacobi as (capture-free fn, pytree data) so everything
            # below can enter jit as ARGUMENTS (closures embed the operator/
            # preconditioner arrays as compiled constants — at 1M+ DOF that
            # exceeds the remote-compile payload limit outright).
            t_pre = time.perf_counter()
            bj_src = getattr(op, "soa", op)
            bj_data = bj_src.block_jacobi_tensors()
            bj_fn = type(bj_src).apply_block_jacobi
            minv = None
            op_tag = ("tg" if isinstance(op, SolidOperatorTG)
                      else "groupell" if isinstance(op, SolidOperatorGroupELL)
                      else "cluster")
            method_prefix = f"{op_tag}_block_jacobi"
            if ndof > self.MG_DOF_THRESHOLD:
                # auxiliary structured-lattice MG coarse correction: cuts
                # block-Jacobi's O(1000) iterations ~15x (measured; see
                # femx.solve.lattice_precond)
                from femx.solve.lattice_precond import LatticePreconditioner

                try:
                    minv = LatticePreconditioner(
                        self.points, self.tetra10_conn, self.E, self.v,
                        mask_g, dtype=np.dtype(dtype).type,
                        node_perm=op.new_of_old, bj_fn=bj_fn, bj_data=bj_data,
                        n_caller=getattr(op, "n_pad", None),
                    )
                    method_prefix = f"{op_tag}_lattice_mg"
                except ValueError as e:
                    self._log(f"   - Lattice preconditioner unavailable ({e}); "
                              "using block-Jacobi.")
            self._precond = minv if minv is not None else ("bj", bj_data)
            t_pre = time.perf_counter() - t_pre

            resumed = None
            if self.checkpoint:
                inner_tol = (max(self.cg_tol, 1e-5)
                             if np.dtype(dtype) == np.float32 else self.cg_tol)
                if minv is not None:
                    chunk_fn = (lambda fv, x0: _jit_pcg_op_precond_chunk(
                        fv, x0, op, minv, inner_tol, self.checkpoint_chunk))
                else:
                    chunk_fn = (lambda fv, x0: _jit_pcg_op_bj_chunk(
                        fv, x0, op, bj_data, inner_tol, self.checkpoint_chunk))
                res, resumed = self._solve_chunked(f_int, chunk_fn, inner_tol)
                if np.dtype(dtype) == np.float32 and self.cg_tol < 1e-5:
                    self._op64 = op.astype(np.float64)
                    f64_int = jnp.asarray(op.to_internal(self.f * mask_g))
                    corr = ((lambda r: _jit_pcg_op_precond(r, op, minv,
                                                           inner_tol, 10000))
                            if minv is not None else
                            (lambda r: _jit_pcg_op_bj(r, op, bj_data,
                                                      inner_tol, 10000)))
                    res = self._refine_host(res, corr, f64_int,
                                            np.dtype(dtype))
                method = method_prefix + "_pcg_checkpointed"
            elif np.dtype(dtype) == np.float32:
                # f32 inner solves + adaptive f64 refinement (one compiled
                # program; see solve.cg.pcg_refined). Module-level jits —
                # per-call jit(lambda) retraced the identical million-DOF
                # program on every invocation (advisor finding, round 2).
                op64 = op.astype(np.float64)
                self._op64 = op64
                f64_int = jnp.asarray(op.to_internal(self.f * mask_g))
                inner_tol = max(self.cg_tol, 1e-5)
                if minv is not None:
                    res = _jit_pcg_refined_op_precond(
                        f_int, f64_int, op, op64, minv, inner_tol, self.cg_tol)
                else:
                    res = _jit_pcg_refined_op_bj(
                        f_int, f64_int, op, op64, bj_data, inner_tol, self.cg_tol)
                method = method_prefix + "_pcg_refined"
            elif minv is not None:
                res = _jit_pcg_op_precond(f_int, op, minv, self.cg_tol, 10000)
                method = method_prefix + "_pcg"
            else:
                res = _jit_pcg_op_bj(f_int, op, bj_data, self.cg_tol, 10000)
                method = method_prefix + "_pcg"
            self.solve_info = {
                "method": method,
                "iterations": int(res.iterations),
                "residual": float(res.residual_norm),
                "converged": bool(res.converged),
                # setup-vs-solve honesty (round-4 VERDICT): operator
                # assembly is stage_times["assemble"]; this is the
                # preconditioner build inside solve(); solve_s is the
                # remainder (compile + iterations)
                "precond_setup_s": round(t_pre, 3),
                "solve_s": round(time.perf_counter() - t0 - t_pre, 3),
                # REQUESTED form: on this (unstructured) path the flag only
                # reaches the lattice preconditioner's internal structured
                # applies, each with its own size gate
                "structured_apply": self.structured_apply,
                **({} if resumed is None else {
                    "checkpoint": self.checkpoint,
                    "resumed_iterations": resumed}),
            }
            self.u = op.to_global(np.asarray(res.x))
            self._log("   - System solved.")
            x_dt = np.dtype(np.asarray(res.x).dtype)
            r_op = getattr(self, "_op64", op) if x_dt == np.float64 else op
            r_op = r_op.astype(x_dt)
            self.reaction_forces = r_op.to_global(
                np.asarray(r_op.apply(jnp.asarray(r_op.to_internal(self.u))))
            )
            self.stage_times["solve"] = time.perf_counter() - t0
            return

        dtype = self.operator.dN.dtype
        free_mask = jnp.asarray(self.constraints.free_mask(), dtype=dtype)
        op = self.operator.with_free_mask(free_mask)
        self.operator = op
        f = jnp.asarray(self.f, dtype=dtype)

        use_dense = self.solver == "dense" or (self.solver == "auto" and ndof <= self.DENSE_DOF_LIMIT)
        if use_dense:
            ke = op.element_stiffness()
            edofs = dof_map(op.conn, 3)
            K = assemble_dense(ke, edofs, ndof)
            u = solve_dense(K, f, free_mask=free_mask)
            self.solve_info = {"method": "dense_cholesky"}
        else:
            minv = op.block_jacobi_preconditioner()
            self._precond = minv
            res = pcg(op.apply_constrained, f * free_mask, M_inv_diag=minv, tol=self.cg_tol)
            u = res.x
            self.solve_info = {
                "method": "block_jacobi_pcg",
                "iterations": int(res.iterations),
                "residual": float(res.residual_norm),
                "converged": bool(res.converged),
            }
        self.u = np.asarray(u)
        self._log("   - System solved.")
        self.reaction_forces = np.asarray(op.apply(jnp.asarray(self.u)))
        self.stage_times["solve"] = time.perf_counter() - t0

    def _solve_distributed(self) -> bool:
        """z-slab-distributed structured solve through the public pipeline
        (femx.parallel.driver). Returns False (with a log line) when the
        lattice cannot be slab-distributed so solve() falls back to the
        single-device path."""
        info_s = self.mesh.structured
        mask_g = np.asarray(self.constraints.free_mask(), dtype=np.float64)
        dtype = np.dtype(self.operator.Kcell.dtype).type
        try:
            from femx.parallel.driver import DistributedStructuredSolver

            solver = DistributedStructuredSolver(
                info_s.n_cells, info_s.spacing, self.E, self.v, mask_g,
                weight=self.weight, dtype=dtype, devices=self.devices)
            u, dinfo = solver.solve(np.asarray(self.f, dtype=np.float64),
                                    tol=self.cg_tol,
                                    checkpoint_path=self.checkpoint,
                                    checkpoint_chunk=self.checkpoint_chunk)
        except ValueError as e:
            self._log(f"   - Distributed solve unavailable ({e}); "
                      "using the single-device path.")
            return False
        self._dist_solver = solver  # reused by solve_cases(devices kept)
        self.u = u
        self.solve_info = dinfo
        self._log(f"   - System solved on {dinfo['devices']} devices "
                  f"({dinfo['method']}).")
        # reactions through the single-device operator at solution precision
        op = self.operator.with_free_mask(
            self.operator.to_internal(mask_g).astype(
                np.dtype(self.operator.Kcell.dtype)))
        self.operator = op
        r_op = op.astype(np.asarray(u).dtype)
        self.reaction_forces = r_op.to_global(
            np.asarray(r_op.apply(jnp.asarray(r_op.to_internal(u)))))
        # keep a preconditioner for modal() parity with the single-chip path
        self._precond = ("st_bj", [jnp.asarray(b)
                                   for b in op.block_jacobi_tensors()])
        return True

    def solve_cases(self, force_cases, tol: Optional[float] = None):
        """Solve K u = f_k for MULTIPLE independent load cases at once.

        Beyond the reference (which re-runs its whole pipeline per load
        case): the assembled operator and preconditioner from solve() are
        reused and all cases run inside ONE compiled program
        (`lax.map` over the stacked right-hand sides — the EP-analog
        surfaced as a product API; SURVEY.md §2b). On a devices=N analysis
        the cases run through the distributed solver built by solve()
        (halo MG / lattice-MG kernels compiled once, executed per case).

        Args:
          force_cases: list of force_data lists (each in the constructor's
            format). Fixes stay those of the analysis.
          tol: relative residual per case (default: the analysis cg_tol;
            float32 operators floor at 1e-5 — run the single-case solve()
            for refined accuracy).
        Returns (n_cases, 3N) displacements in global DOF order; per-case
        iterations/residuals are stored as self.case_solve_info.
        """
        if self.u is None:
            raise RuntimeError("Run the analysis (solve) before solve_cases().")
        from femx import bc as bc_mod
        from femx.solve.lattice_precond import LatticePreconditioner
        from femx.solve.multigrid import StructuredMultigrid

        op = self.operator  # free mask set by solve()
        if self._structured:
            dtype = np.dtype(op.Kcell.dtype)
        elif hasattr(op, "dtype"):
            dtype = np.dtype(op.dtype)  # transpose-gather operator
        else:
            dtype = np.dtype(op.dN.dtype)  # generic einsum operator
        t = float(self.cg_tol if tol is None else tol)
        if dtype == np.float32:
            t = max(t, 1e-5)
        mask_g = self.constraints.free_mask()

        # devices=N analyses reuse the distributed solver built by solve():
        # the first case compiled the halo/lattice-MG kernel, so every
        # further case is execute-only (pcg_halo / lattice solver caches are
        # keyed per (solver, tol)). f32 cases floor at 1e-5 like the
        # single-device path — run solve() per case for refined accuracy.
        dist_s = getattr(self, "_dist_solver", None)
        dist_u = getattr(self, "_dist_usolver", None)
        if dist_s is not None or dist_u is not None:
            us, infos = [], []
            for case in force_cases:
                fg = bc_mod.solid_point_loads(
                    self.mesh, case, self.neumann_nodes)[0] * mask_g
                if dist_s is not None:
                    u_g, dinfo = dist_s.solve(np.asarray(fg, np.float64),
                                              tol=t)
                    it_i, rn_i, ok_i = (dinfo["iterations"],
                                        dinfo["residual"],
                                        dinfo["converged"])
                else:
                    u_g, it_i, rn_i, ok_i = dist_u.solve(
                        np.asarray(fg, np.float64), tol=t, maxiter=10000)
                us.append(np.asarray(u_g))
                infos.append({"iterations": int(it_i),
                              "residual": float(rn_i),
                              "converged": bool(ok_i)})
            self.case_solve_info = infos
            return np.stack(us)

        # the generic einsum operator works in global DOF order directly
        to_int = getattr(op, "to_internal", lambda v: v)
        to_glob = getattr(op, "to_global", lambda v: v)
        # after a lane-padded solve() the operator/preconditioner live on
        # the GHOST-PADDED lattice: embed each real-lattice load into it
        # (zeros in ghost planes) and slice results back out below
        pad_grids = getattr(self, "_lane_pad_grids", None)
        if pad_grids is not None:
            from femx.assembly_structured import pad_z_raster, unpad_z_raster
        rows = []
        for case in force_cases:
            fg = bc_mod.solid_point_loads(self.mesh, case,
                                          self.neumann_nodes)[0] * mask_g
            if pad_grids is not None:
                fg = pad_z_raster(fg, *pad_grids)
            rows.append(to_int(fg))
        F = jnp.asarray(np.stack(rows), dtype=dtype)

        pre = getattr(self, "_precond", None)
        if isinstance(pre, StructuredMultigrid):
            X, its, rns = _jit_pcg_mg_cases(F, pre, t, 10000)
        elif isinstance(pre, LatticePreconditioner):
            X, its, rns = _jit_pcg_op_precond_cases(F, op, pre, t, 10000)
        elif isinstance(pre, tuple) and pre[0] == "st_bj":
            X, its, rns = _jit_pcg_st_bj_cases(F, op, pre[1], t, 20000)
        elif isinstance(pre, tuple) and pre[0] == "bj":
            X, its, rns = _jit_pcg_op_bj_cases(F, op, pre[1], t, 20000)
        else:
            # generic operator (small meshes): sequential solves with the
            # closure block-Jacobi (its captures become jit constants —
            # fine at this scale)
            minv = (pre if callable(pre)
                    else op.block_jacobi_preconditioner())
            xs, its_l, rns_l = [], [], []
            for i in range(F.shape[0]):
                r = pcg(op.apply_constrained, F[i], M_inv_diag=minv,
                        tol=t, maxiter=20000)
                xs.append(r.x)
                its_l.append(int(r.iterations))
                rns_l.append(float(r.residual_norm))
            X = jnp.stack(xs)
            its = np.asarray(its_l)
            rns = np.asarray(rns_l)
        U = np.stack([np.asarray(to_glob(np.asarray(X[i])))
                      for i in range(len(force_cases))])
        if pad_grids is not None:
            U = np.stack([unpad_z_raster(U[i], *pad_grids)
                          for i in range(len(force_cases))])
        self.case_solve_info = [
            {"iterations": int(its[i]), "residual": float(rns[i]),
             "converged": bool(rns[i] <= t)}
            for i in range(len(force_cases))
        ]
        return U

    def _solve_distributed_unstructured(self) -> bool:
        """z-slab-distributed UNSTRUCTURED solve: sharded transpose-gather
        apply + the distributed lattice-MG preconditioner
        (femx.parallel.tg_lattice). Returns False (with a log line) when
        the mesh/device setup can't slab-distribute, so solve() falls back
        to the single-device lattice-MG path."""
        from femx.assembly_tg import SolidOperatorTG

        if not isinstance(self.operator, SolidOperatorTG):
            self._log("   - devices= requested but the generic operator is "
                      "in use; single-device path.")
            return False
        mask_g = np.asarray(self.constraints.free_mask(), dtype=np.float64)
        dtype = np.dtype(self.operator.dtype).type
        try:
            from jax.sharding import Mesh as _JMesh

            from femx.parallel.tg_lattice import DistributedUnstructuredSolver

            ndev = int(self.devices)
            devs = jax.devices()
            if len(devs) < ndev:
                raise ValueError(
                    f"devices={ndev} requested, {len(devs)} available")
            dmesh = _JMesh(np.array(devs[:ndev]), ("z",))
            solver = DistributedUnstructuredSolver.build(
                self.points, self.tetra10_conn, self.E, self.v, mask_g,
                dmesh, dtype=dtype)
            # f32 inner tolerance floor mirrors the single-device path
            # (a pure-f32 recurrence can't certify much below 1e-5 rel)
            tol = (max(self.cg_tol, 1e-5)
                   if np.dtype(dtype) == np.float32 else self.cg_tol)
            x, it, res, ok = solver.solve(self.f * mask_g, tol=tol,
                                          maxiter=10000)
        except ValueError as e:
            self._log(f"   - Distributed unstructured solve unavailable "
                      f"({e}); using the single-device path.")
            return False
        self._dist_usolver = solver  # reused by modal(devices=N)
        method = "tg_distributed_lattice_mg_pcg"
        if np.dtype(dtype) == np.float32 and self.cg_tol < 1e-5:
            # adaptive guarded f64 refinement around the distributed f32
            # inner solves (the parallel.driver scheme; residual evaluated
            # by the f64 single-device operator — one apply per pass)
            opm = self.operator.with_free_mask(
                jnp.asarray(self.operator.to_internal(mask_g),
                            dtype=self.operator.dtype))
            op64 = opm.astype(np.float64)
            f64_int = jnp.asarray(op64.to_internal(self.f * mask_g))
            bnorm = float(jnp.linalg.norm(f64_int)) or 1.0
            x_int = jnp.asarray(op64.to_internal(x), dtype=jnp.float64)
            rn_prev = np.inf
            total_it = int(it)
            for _ in range(4):
                r_int = f64_int - op64.apply_constrained(x_int)
                rn = float(jnp.linalg.norm(r_int)) / bnorm
                if rn <= self.cg_tol or rn >= rn_prev:
                    break
                rn_prev = rn
                d, it_c, _res_c, _okc = solver.solve(
                    op64.to_global(np.asarray(r_int)), tol=tol,
                    maxiter=10000)
                x_new = x_int + jnp.asarray(op64.to_internal(d))
                rn_new = float(jnp.linalg.norm(
                    f64_int - op64.apply_constrained(x_new))) / bnorm
                total_it += int(it_c)
                if rn_new < rn:
                    x_int = x_new
                else:
                    break  # past the f64 floor; keep the better iterate
            res = float(jnp.linalg.norm(
                f64_int - op64.apply_constrained(x_int))) / bnorm
            x = op64.to_global(np.asarray(x_int))
            it = total_it
            ok = res <= self.cg_tol
            method += "_refined"
        self.u = x
        self.solve_info = {
            "method": method,
            "iterations": int(it),
            "residual": float(res),
            "converged": bool(ok),
            "devices": int(self.devices),
            "lattice_cells": tuple(solver.n_cells),
        }
        self._log(f"   - System solved on {self.devices} devices "
                  f"(tg_distributed_lattice_mg_pcg, {int(it)} iterations).")
        # reactions + downstream state through the single-device operator
        op = self.operator.with_free_mask(
            jnp.asarray(self.operator.to_internal(mask_g),
                        dtype=self.operator.dtype))
        self.operator = op
        r_op = op.astype(np.asarray(x).dtype)
        self.reaction_forces = r_op.to_global(
            np.asarray(r_op.apply(jnp.asarray(r_op.to_internal(x)))))
        self._precond = ("bj", op.soa.block_jacobi_tensors())
        return True

    def compute_stresses(self):
        """Per-node averaged stress tensors + von Mises field (postprocess).

        Beyond the reference (which reports only displacements/reactions for
        the solid product): Voigt stresses at the 4 Gauss points of every
        element, averaged to nodes with element-count weighting — the
        standard nodal-smoothing recipe the reference uses for beams
        (BeamSolver.py:420-438), applied to the solid field.

        Returns (nodal_stress (N,6), nodal_von_mises (N,)).
        """
        if self.u is None:
            raise RuntimeError("Run the analysis first.")
        from femx.elements.tet10 import element_strain_stress, jacobians, von_mises

        conn = jnp.asarray(self.tetra10_conn, dtype=jnp.int32)
        pts = jnp.asarray(self.points)
        dN, wdet, _ = jacobians(pts[conn])
        ue = jnp.asarray(self.u).reshape(-1, 3)[conn]  # (E, 10, 3)
        _, stress = element_strain_stress(dN, jnp.asarray(self.C, dtype=ue.dtype), ue)
        elem_stress = jnp.mean(stress, axis=1)  # (E, 6) element-average
        nodal = np.zeros((self.num_nodes, 6))
        counts = np.zeros(self.num_nodes)
        conn_np = np.asarray(self.tetra10_conn)
        es = np.asarray(elem_stress)
        for k in range(10):
            np.add.at(nodal, conn_np[:, k], es)
            np.add.at(counts, conn_np[:, k], 1.0)
        nodal /= np.maximum(counts, 1.0)[:, None]
        vm = np.asarray(von_mises(jnp.asarray(nodal)))
        self.nodal_stress = nodal
        self.nodal_von_mises = vm
        return nodal, vm

    def modal(self, n_modes: int = 10, rho: float = 7850.0, tol: float = 1e-6,
              maxiter: int = 100, inner_tol: Optional[float] = None,
              refine: bool = False):
        """First n_modes natural frequencies/shapes of the constrained solid.

        Extension beyond the reference (its modal analysis is beam-only,
        BeamSolver.py:440-455; the solid product reports statics only) and a
        BASELINE.json north-star metric ("first-10-modes eig time"). Mass is
        HRZ-lumped Tet10 (exact element totals); the eigensolver is
        shift-invert Lanczos whose inner K-solves reuse the preconditioner
        built by solve() (multigrid on large structured meshes).

        refine=True runs femx.modal.shift_invert_refine afterwards: one
        inverse-iteration step + Rayleigh-Ritz through ACCURATE solves
        (1e-9 true residual via f64 iterative refinement when the operator
        is f32). Costs 2*n_modes accurate solves; returns the refined
        frequencies/shapes and stores per-mode relative-eigenvalue Ritz
        BOUNDS in self.modal_error_bounds. On the 1.39M-DOF flagship this
        corrected a 0.6% error in the f32-Lanczos fundamental (measured:
        121.73 -> 120.96 Hz with a 2e-6 bound).

        Requires solve() to have run. Returns femx.modal.ModalResult with
        omega (rad/s, ascending) and mass-orthonormal mode shapes in GLOBAL
        (3*node+comp) DOF order; also stored as self.modal_result.
        """
        if self.u is None:
            raise RuntimeError("Run the analysis (solve) before modal().")
        import jax

        from femx.modal import ModalResult, modal_shift_invert

        op = self.operator
        if inner_tol is None:
            inner_tol = max(self.cg_tol, 1e-6)
        if self._structured:
            from femx.solve.multigrid import StructuredMultigrid

            m_int = op.lumped_mass_diagonal(rho)

            if (self.devices or 0) > 1:
                # devices= extends to modal: inner K-solves run z-slab-
                # distributed (femx.parallel.modal). The hierarchy is a
                # disk-cache hit after solve(); fall back on ValueError.
                # refine=True composes (round 4): the Rayleigh-Ritz
                # refinement's accurate solves also run distributed — f32
                # operators wrap pcg_halo in the adaptive f64 refinement
                # scheme, f64 operators tighten the distributed tolerance —
                # and self.modal_error_bounds gets the same per-mode Ritz
                # bounds as the single-device path.
                try:
                    from jax.sharding import Mesh as _JMesh

                    from femx.parallel.halo import (DistributedMultigrid,
                                                    pcg_halo)
                    from femx.parallel.modal import modal_shift_invert_halo

                    mask_g = self.constraints.free_mask()
                    info = self.mesh.structured
                    mg = StructuredMultigrid(
                        None, info.n_cells, self.E, self.v, mask_g,
                        weight=self.weight,
                        dtype=np.dtype(op.Kcell.dtype).type,
                        fine_op=op, spacing=info.spacing)
                    devs = jax.devices()
                    dmesh = _JMesh(np.array(devs[:int(self.devices)]),
                                   ("z",))
                    dmg = DistributedMultigrid(mg, dmesh)
                    prec = dmg.preconditioner()  # shared: one traced solver
                    res = modal_shift_invert_halo(
                        dmg, m_int, op.free_mask, n_modes=n_modes,
                        tol=tol, maxiter=maxiter, inner_tol=inner_tol,
                        preconditioner=prec)
                    if refine:
                        is_f32 = np.dtype(op.Kcell.dtype) == np.float32
                        if is_f32:
                            op64 = op.astype(np.float64)

                            def ks_acc(b):
                                # adaptive guarded f64 refinement around the
                                # distributed f32 inner solves (the
                                # parallel.driver scheme; residuals through
                                # the f64 single-device operator)
                                b64 = jnp.asarray(b, jnp.float64)
                                bn = float(jnp.linalg.norm(b64)) or 1.0
                                x, *_ = pcg_halo(
                                    dmg.halo, np.asarray(b, np.float32),
                                    tol=1e-5, preconditioner=prec)
                                x = jnp.asarray(x, jnp.float64)
                                rn_prev = np.inf
                                for _ in range(6):
                                    r = b64 - _jit_apply_op(x, op64)
                                    rn = float(jnp.linalg.norm(r)) / bn
                                    if rn <= 1e-9 or rn >= rn_prev:
                                        break
                                    rn_prev = rn
                                    d, *_ = pcg_halo(
                                        dmg.halo,
                                        np.asarray(r, dtype=np.float32),
                                        tol=1e-5, preconditioner=prec)
                                    x_new = x + jnp.asarray(d, jnp.float64)
                                    rn_new = float(jnp.linalg.norm(
                                        b64 - _jit_apply_op(x_new, op64))) / bn
                                    if rn_new < rn:
                                        x = x_new
                                    else:
                                        break
                                return x
                        else:
                            def ks_acc(b):
                                x, *_ = pcg_halo(
                                    dmg.halo, np.asarray(b, np.float64),
                                    tol=1e-11, maxiter=6000,
                                    preconditioner=prec)
                                return jnp.asarray(x)
                        res = self._refine_modal(res, ks_acc, m_int)
                    modes_g = np.stack(
                        [op.to_global(np.asarray(res.modes[:, j]))
                         for j in range(res.modes.shape[1])], axis=1)
                    self.modal_result = ModalResult(
                        omega=res.omega, modes=jnp.asarray(modes_g),
                        iterations=res.iterations)
                    self._log(
                        f"   - Modal ({self.devices} devices"
                        + (", Ritz-refined" if refine else "") + "): f = "
                        + ", ".join(f"{w / (2 * np.pi):.3f}"
                                    for w in np.asarray(res.omega))
                        + " Hz")
                    return self.modal_result
                except ValueError as e:
                    self._log(f"   - Distributed modal unavailable ({e}); "
                              "single-device inner solves.")

            # maxiter is a bound, not a cost: the while_loop exits on
            # convergence (MG needs ~20; block-Jacobi fallback needs
            # thousands at tight tolerances)
            state = None
            if isinstance(self._precond, StructuredMultigrid):
                def k_solve(b):
                    return _jit_pcg_mg(b, self._precond, inner_tol, 4000).x

                state = (op, self._precond, float(inner_tol), 4000)
            else:
                binv = self._precond[1]  # ("st_bj", tensors) from solve()

                def k_solve(b):
                    return _jit_pcg_st_bj(b, op, binv, inner_tol, 4000).x

            res = modal_shift_invert(
                k_solve, m_int, op.free_mask_host, n_modes=n_modes, tol=tol,
                maxiter=maxiter, dtype=op.Kcell.dtype, solver_state=state,
            )
            if refine:
                is_f32 = np.dtype(op.Kcell.dtype) == np.float32
                if isinstance(self._precond, StructuredMultigrid):
                    if is_f32:
                        op64 = op.astype(np.float64)

                        def ks_acc(b):
                            return _jit_pcg_refined_mg(
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(b, jnp.float64),
                                self._precond, op64, 1e-5, 1e-9).x
                    else:
                        def ks_acc(b):
                            return _jit_pcg_mg(b, self._precond, 1e-11, 6000).x
                else:
                    binv = self._precond[1]
                    if is_f32:
                        op64 = op.astype(np.float64)

                        def ks_acc(b):
                            return _jit_pcg_refined_st_bj(
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(b, jnp.float64),
                                op, op64, binv, 1e-5, 1e-9).x
                    else:
                        def ks_acc(b):
                            return _jit_pcg_st_bj(b, op, binv, 1e-11, 6000).x
                res = self._refine_modal(res, ks_acc, m_int)
            modes = np.stack(
                [op.to_global(np.asarray(res.modes[:, i]))
                 for i in range(res.modes.shape[1])], axis=1,
            )
            # lane-padded solve(): the operator lives on the ghost-padded
            # lattice (zero ghost mass, fixed ghost DOFs — the eigenpairs
            # are those of the real lattice); slice the ghost planes off so
            # mode shapes match the mesh's global DOF order
            pad_grids = getattr(self, "_lane_pad_grids", None)
            if pad_grids is not None:
                from femx.assembly_structured import unpad_z_raster

                modes = np.stack(
                    [unpad_z_raster(modes[:, i], *pad_grids)
                     for i in range(modes.shape[1])], axis=1)
            res = ModalResult(omega=res.omega, modes=jnp.asarray(modes),
                              iterations=res.iterations)
        else:
            from femx.assembly_cluster import SolidOperatorCluster
            from femx.assembly_tg import SolidOperatorTG

            conn = np.asarray(self.tetra10_conn)
            ml = np.asarray(tet10_el.element_mass_lumped(
                jnp.asarray(self.points[conn]), rho))  # (E, 10)
            m_node = np.zeros(self.num_nodes)
            np.add.at(m_node, conn, ml)
            m_dof = np.repeat(m_node, 3)
            is_tg = isinstance(op, (SolidOperatorTG, SolidOperatorCluster))
            if is_tg:  # internal (degree- or cluster-degree-sorted) layout
                m_use = op.to_internal(m_dof)
                dtype = op.dtype
            else:
                m_use = m_dof
                dtype = op.dN.dtype
            free_mask = np.asarray(op.free_mask)
            precond = getattr(self, "_precond", None)
            from femx.solve.lattice_precond import LatticePreconditioner

            dist_solver = getattr(self, "_dist_usolver", None)
            if (self.devices or 0) > 1 and is_tg and dist_solver is not None \
                    and not refine:
                # devices= extends to unstructured modal: each inner
                # K-solve is one distributed lattice-MG solve (the solver
                # built by solve(); refine=True keeps the single-device
                # accurate path).
                def k_solve_d(b):
                    x, _it, res_i, ok_i = dist_solver.solve(
                        op.to_global(np.asarray(b)), tol=inner_tol,
                        maxiter=10000)
                    if not ok_i and not np.isfinite(res_i):
                        raise RuntimeError(
                            f"distributed inner solve diverged: {res_i}")
                    return jnp.asarray(op.to_internal(x), dtype=dtype)

                res = modal_shift_invert(
                    k_solve_d, m_use, free_mask, n_modes=n_modes, tol=tol,
                    maxiter=maxiter, dtype=dtype, jit_inner=False)
                modes = np.stack(
                    [op.to_global(np.asarray(res.modes[:, i]))
                     for i in range(res.modes.shape[1])], axis=1)
                self.modal_result = ModalResult(
                    omega=res.omega, modes=jnp.asarray(modes),
                    iterations=res.iterations)
                self._log(
                    f"   - Modal ({self.devices} devices, unstructured): "
                    "f = "
                    + ", ".join(f"{w / (2 * np.pi):.3f}"
                                for w in np.asarray(res.omega))
                    + " Hz")
                return self.modal_result

            state = None
            if is_tg and isinstance(precond, LatticePreconditioner):
                def k_solve(b):
                    return _jit_pcg_op_precond(b, op, precond, inner_tol, 4000).x

                state = (op, precond, float(inner_tol), 4000)
            elif is_tg:
                from femx.assembly_cluster import ClusterBJPrecond
                from femx.assembly_soa import BlockJacobiPrecond

                bj_data = (precond[1] if isinstance(precond, tuple)
                           else getattr(op, "soa", op).block_jacobi_tensors())
                bj_obj = (BlockJacobiPrecond(bj_data) if hasattr(op, "soa")
                          else ClusterBJPrecond(bj_data))

                def k_solve(b):
                    return _jit_pcg_op_bj(b, op, bj_data, inner_tol, 4000).x

                state = (op, bj_obj, float(inner_tol), 4000)
            else:
                if precond is None:  # dense path never built one
                    precond = op.block_jacobi_preconditioner()

                @jax.jit
                def k_solve(b):
                    return pcg(op.apply_constrained, b, M_inv_diag=precond,
                               tol=inner_tol, maxiter=4000).x

            res = modal_shift_invert(
                k_solve, m_use, free_mask, n_modes=n_modes, tol=tol,
                maxiter=maxiter, dtype=dtype, solver_state=state,
            )
            if refine:
                is_f32 = np.dtype(dtype) == np.float32
                if is_tg and isinstance(precond, LatticePreconditioner):
                    if is_f32:
                        op64 = op.astype(np.float64)

                        def ks_acc(b):
                            return _jit_pcg_refined_op_precond(
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(b, jnp.float64),
                                op, op64, precond, 1e-5, 1e-9).x
                    else:
                        def ks_acc(b):
                            return _jit_pcg_op_precond(b, op, precond,
                                                       1e-11, 6000).x
                elif is_tg:
                    if is_f32:
                        op64 = op.astype(np.float64)

                        def ks_acc(b):
                            return _jit_pcg_refined_op_bj(
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(b, jnp.float64),
                                op, op64, bj_data, 1e-5, 1e-9).x
                    else:
                        def ks_acc(b):
                            return _jit_pcg_op_bj(b, op, bj_data,
                                                  1e-11, 6000).x
                else:
                    def ks_acc(b):
                        return k_solve(b)
                res = self._refine_modal(res, ks_acc, m_use)
            if is_tg:
                modes = np.stack(
                    [op.to_global(np.asarray(res.modes[:, i]))
                     for i in range(res.modes.shape[1])], axis=1,
                )
                res = ModalResult(omega=res.omega, modes=jnp.asarray(modes),
                                  iterations=res.iterations)
        self.modal_result = res
        self._log(
            "   - Modal: f = "
            + ", ".join(f"{w / (2 * np.pi):.3f}" for w in np.asarray(res.omega))
            + " Hz"
        )
        if refine and getattr(self, "modal_error_bounds", None) is not None:
            self._log(
                "   - Refined (Ritz bound max "
                f"{float(np.max(self.modal_error_bounds)):.1e} on the "
                "relative eigenvalue error)"
            )
        return res

    def _refine_modal(self, res, ks_acc, m_diag):
        """Inverse-iteration + Rayleigh-Ritz refinement of a ModalResult in
        the operator's SOLVER layout; stores per-mode Ritz bounds."""
        from femx.modal import ModalResult, shift_invert_refine

        om_ref, eta, modes_ref = shift_invert_refine(ks_acc, m_diag, res.modes)
        self.modal_error_bounds = np.asarray(eta)
        return ModalResult(
            omega=jnp.asarray(om_ref, dtype=res.omega.dtype),
            modes=jnp.asarray(modes_ref, dtype=res.modes.dtype),
            iterations=res.iterations,
        )

    def print_reactions(self) -> None:
        """Console reaction table + equilibrium check
        (reference: ReactionSolver.py:207-224)."""
        if self.reaction_forces is None:
            return
        self._log("\n--- Reaction Forces ---")
        total_reaction = np.zeros(3)
        for i, info in enumerate(self.fixed_nodes_info):
            n = info["node_idx"]
            r = self.reaction_forces[3 * n : 3 * n + 3]
            total_reaction += r
            self._log(
                f"  Node {n} (Fix Point {i + 1}): Rx={r[0]:.4e}, Ry={r[1]:.4e}, Rz={r[2]:.4e} N"
            )
        self._log("\n--- Force Equilibrium Check ---")
        total_applied = np.zeros(3)
        for item in self.force_data:
            total_applied += [item["force_x"], item["force_y"], item["force_z"]]
        self._log(f"  Sum of Applied Forces (Fx, Fy, Fz): {total_applied}")
        self._log(f"  Sum of Reaction Forces (Rx, Ry, Rz): {-total_reaction}")
        self.total_applied_force = total_applied
        self.total_reaction = total_reaction

    def equilibrium_residual(self) -> np.ndarray:
        """Sum of applied + sum of reactions (should be ~0)."""
        total_applied = np.zeros(3)
        for item in self.force_data:
            total_applied += [item["force_x"], item["force_y"], item["force_z"]]
        total_reaction = np.zeros(3)
        for info in self.fixed_nodes_info:
            n = info["node_idx"]
            total_reaction += self.reaction_forces[3 * n : 3 * n + 3]
        return total_applied + total_reaction

    def run_simulation(self, report: bool = False, report_path: str = "FEM_Report.md"):
        """Full pipeline (reference: ReactionSolver.py:226-232)."""
        self.assemble_stiffness_matrix()
        self.apply_boundary_conditions()
        self.solve()
        self.print_reactions()
        if report:
            self.generate_report(report_path)
        return self

    def generate_report(self, filename: str = "FEM_Report.md") -> None:
        self._log(f"\n6. Generating analysis report to {filename}...")
        from femx.report import solid_report

        solid_report(self, filename)
        self._log("   - Report generation complete.")

    def plot(self, factor: float = 1.0, show_window: bool = True,
             filename: str = "fem_result.png", color: str = "disp"):
        from femx.viz import plot_solid_results

        return plot_solid_results(self, factor=factor, show_window=show_window,
                                  filename=filename, color=color)

    def export_html(self, filename: str = "fem_result.html",
                    factor: float = 1.0) -> str:
        """Standalone interactive WebGL viewer (femx.viz_html) — the
        headless-environment answer to the reference's interactive PyVista
        window (ReactionSolver.py:234-294)."""
        from femx.viz_html import export_solid_html

        return export_solid_html(self, filename, factor=factor)


# Reference-compatible alias (ReactionSolver.py:16).
ForceAnalysis = SolidReactionAnalysis
