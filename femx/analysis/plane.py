"""2D plane stress/strain static analysis — the reference's "2D Static
Analysis" menu entry, implemented for real.

The reference app lists "2D Static Analysis" in its launcher but loads a
19-line empty placeholder dialog (FEM_main.py:412-431, static.ui). femx
implements the product on the same TPU-first architecture as the solid path
(femx/analysis/solid.py): Tri6 quadratic triangles, matrix-free operator with
masked Dirichlet BCs, dense Cholesky under a size limit and block-Jacobi PCG
above it, reaction recovery r = K u with the unconstrained operator, and the
solid pipeline's equilibrium self-check and stage prints.

BC semantics mirror the solid product (SURVEY.md §6 quirk 5):
  - fix dicts use 0 = fixed / None = free per axis;
  - point BCs snap to the nearest node within the matching physical group;
  - additionally (2D extension) fix/force dicts may name a 1D physical
    *group* (e.g. the rect_tri6 mesher's "left"/"right"/"bottom"/"top"
    boundary edges) to constrain or load every node of that edge. Group
    forces are applied as consistent line tractions: the total force is
    distributed by each node's tributary edge length (quadratic line3
    weights 1/6, 4/6, 1/6 per element), so the load resultant is exact.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from femx import bc as bc_mod
from femx.assembly_plane import PlaneOperator
from femx.elements import tri6 as tri6_el
from femx.mesh.core import Mesh, nearest_node, nodes_in_physical_group
from femx.mesh.msh_io import read_msh
from femx.solve.cg import pcg
from femx.solve.dense import solve_dense


@jax.jit
def _jit_pcg_bj(fv, op_, tol, maxiter):
    pre = op_.block_jacobi_preconditioner()
    r = pcg(op_.apply_constrained, fv, M_inv_diag=pre, tol=tol,
            maxiter=maxiter)
    return r.x, r.iterations, r.residual_norm


@jax.jit
def _jit_pcg_mg2d(fv, mg, tol, maxiter):
    # mg rides as a pytree ARGUMENT (closure constants bloat compile payloads)
    r = pcg(mg.fine_op.apply_constrained, fv, M_inv_diag=mg, tol=tol,
            maxiter=maxiter)
    return r.x, r.iterations, r.residual_norm


def solve_2d(operator, mesh, C, mask, fv, cg_tol, *, kind, thickness=1.0,
             log=lambda msg: None):
    """Iterative-solve routing shared by the 2D products: geometric MG-PCG
    when the mesh is a rect_tri6 lattice (mesh-size-independent iterations,
    femx.solve.multigrid2d), block-Jacobi PCG otherwise.

    Returns (u, solve_info)."""
    lat = getattr(mesh, "lattice2d", None)
    if lat is not None:
        from femx.solve.multigrid2d import Multigrid2D

        try:
            mg = Multigrid2D(kind, lat["n_cells"], lat["spacing"],
                             lat["origin"], C, mask, thickness=thickness,
                             fine_op=operator, dtype=fv.dtype)
        except ValueError as e:
            log(f"   - 2D multigrid unavailable ({e}); block-Jacobi PCG.")
        else:
            u, iters, rn = _jit_pcg_mg2d(fv, mg, cg_tol, 2000)
            return u, {
                "method": "mg_pcg_2d", "ndof": int(fv.shape[0]),
                "mg_levels": mg.level_shapes(),
                "iterations": int(iters), "residual_norm": float(rn),
                "converged": bool(float(rn) <= cg_tol * 10),
            }
    u, iters, rn = _jit_pcg_bj(fv, operator, cg_tol, 20000)
    return u, {
        "method": "block_jacobi_pcg", "ndof": int(fv.shape[0]),
        "iterations": int(iters), "residual_norm": float(rn),
        "converged": bool(float(rn) <= cg_tol * 10),
    }


@jax.jit
def _jit_apply(v, op_):
    return op_.apply(v)


def _edge_tributary_weights(mesh: Mesh, group: str) -> Optional[np.ndarray]:
    """Per-node consistent weights (summing to 1) for a line3 edge group.

    integral(N_i) over a straight quadratic edge of length L is
    (L/6, L/6, 4L/6) for (end, end, mid) — a point load scaled by these
    weights is the consistent equivalent of a uniform traction with the
    same resultant.
    """
    conn = mesh.cells.get("line3")
    tags = mesh.cell_physical.get("line3")
    if conn is None or tags is None or group not in mesh.field_data:
        return None
    gid = mesh.field_data[group][0]
    elems = conn[tags == gid]
    if not len(elems):
        return None
    w = np.zeros(mesh.num_nodes)
    for a, b, m in elems:
        L = float(np.linalg.norm(mesh.points[b] - mesh.points[a]))
        w[a] += L / 6.0
        w[b] += L / 6.0
        w[m] += 4.0 * L / 6.0
    total = w.sum()
    return w / total if total > 0 else None


class PlaneAnalysis:
    """2D plane-elasticity static analysis with point/edge loads and fixes."""

    DENSE_DOF_LIMIT = 6000

    def __init__(
        self,
        msh_file: Union[str, Mesh],
        force_data: Sequence[dict],
        fix_data: Sequence[dict],
        E: float,
        v: float,
        thickness: float = 1.0,
        mode: str = "stress",
        alpha: float = 0.0,
        temperature=None,
        dtype=None,
        cg_tol: float = 1e-10,
        verbose: bool = True,
    ):
        """temperature: optional temperature RISE field for thermoelastic
        loading — a scalar (uniform), an (n_nodes,) array, or a callable
        f(x, y) -> dT evaluated at the nodes. Requires alpha > 0. Thermal
        strains use alpha (plane stress) / (1+v) alpha (plane strain) — the
        formulation-consistent in-plane expansion."""
        self.force_data = list(force_data)
        self.fix_data = list(fix_data)
        self.E = float(E)
        self.v = float(v)
        self.thickness = float(thickness)
        if mode not in ("stress", "strain"):
            raise ValueError(f"mode must be 'stress' or 'strain', got {mode!r}")
        self.mode = mode
        self.dtype = dtype or np.float64
        self.cg_tol = cg_tol
        self.verbose = verbose

        self.u: Optional[np.ndarray] = None
        self.f: Optional[np.ndarray] = None
        self.reaction_forces: Optional[np.ndarray] = None
        self.fixed_nodes_info: List[dict] = []
        self.applied_forces_info: List[dict] = []
        self.solve_info: dict = {}
        self.stage_times: dict = {}

        self._log("1. Reading mesh file...")
        t0 = time.perf_counter()
        self.mesh = msh_file if isinstance(msh_file, Mesh) else read_msh(msh_file)
        conn = self.mesh.cells.get("triangle6")
        if conn is None:
            tri3 = self.mesh.cells.get("triangle")
            if tri3 is None:
                raise ValueError("Mesh has no 'triangle6' (or 'triangle') elements.")
            # promote linear gmsh triangles in place (shared midside nodes)
            from femx.mesh.generators2d import tri3_to_tri6

            pts6, conn = tri3_to_tri6(self.mesh.points, tri3)
            self.mesh = Mesh(
                points=pts6, cells={**self.mesh.cells, "triangle6": conn},
                cell_physical={**self.mesh.cell_physical,
                               "triangle6": self.mesh.cell_physical.get(
                                   "triangle",
                                   np.ones(len(conn), dtype=np.int32))},
                field_data=self.mesh.field_data)
        self.conn = np.asarray(conn)
        self.points = self.mesh.points
        self.num_nodes = len(self.points)
        self.diri_nodes = nodes_in_physical_group(self.mesh, "Diri_BCs", "vertex")
        self.neumann_nodes = nodes_in_physical_group(self.mesh, "Neumann_BCs", "vertex")
        self.stage_times["read_mesh"] = time.perf_counter() - t0
        self._log(f"   - Nodes: {self.num_nodes}, Triangle6 Elements: {len(self.conn)}")

        self.C = tri6_el.material_matrix_plane(self.E, self.v, mode=self.mode,
                                               dtype=jnp.dtype(self.dtype))

        self.alpha = float(alpha)
        if temperature is None:
            self.dT_nodes = None
        else:
            if callable(temperature):
                dT = np.asarray([temperature(x, y)
                                 for x, y in self.points[:, :2]])
            else:
                dT = np.broadcast_to(
                    np.asarray(temperature, dtype=np.float64),
                    (self.num_nodes,)).copy()
            if self.alpha == 0.0:
                raise ValueError("temperature loading requires alpha > 0")
            self.dT_nodes = dT

    @property
    def _alpha_eff(self) -> float:
        # plane strain sees the constrained-z in-plane expansion (1+v) alpha
        return self.alpha * (1.0 + self.v if self.mode == "strain" else 1.0)

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    @property
    def ndof(self) -> int:
        return 2 * self.num_nodes

    def assemble(self) -> None:
        self._log("2. Assembling global stiffness operator (matrix-free)...")
        t0 = time.perf_counter()
        self.operator, detJ = PlaneOperator.from_mesh(
            self.points, self.conn, self.C, thickness=self.thickness,
            dtype=self.dtype)
        self.negative_detJ_count = int(jnp.sum(detJ <= 1e-14))
        self.stage_times["assemble"] = time.perf_counter() - t0
        self._log("   - Assembly complete.")

    def apply_boundary_conditions(self) -> None:
        self._log("3. Applying boundary conditions...")
        t0 = time.perf_counter()
        fixed: List[int] = []
        info: List[dict] = []
        for fix in self.fix_data:
            if "group" in fix:
                nodes = nodes_in_physical_group(self.mesh, fix["group"])
                if not len(nodes):
                    raise ValueError(
                        f"Fix group {fix['group']!r} resolves to no nodes")
            else:
                pos = (fix["pos_x"], fix["pos_y"], 0.0)
                nodes = [nearest_node(self.points, pos, self.diri_nodes)]
            for n in nodes:
                dofs = []
                if fix.get("fix_x") == 0:
                    dofs.append(2 * n)
                if fix.get("fix_y") == 0:
                    dofs.append(2 * n + 1)
                fixed.extend(dofs)
                info.append({"node_idx": int(n), "pos": self.points[n],
                             "dofs": dofs})
        self.fixed_dofs = np.unique(fixed).astype(np.int64)
        self.fixed_nodes_info = info
        self._log(f"   - Fixed {len(self.fixed_dofs)} DOFs.")

        f = np.zeros(self.ndof)
        applied: List[dict] = []
        for item in self.force_data:
            vec = np.array([item.get("force_x", 0.0),
                            item.get("force_y", 0.0)], dtype=np.float64)
            if "group" in item:
                w = _edge_tributary_weights(self.mesh, item["group"])
                nodes = nodes_in_physical_group(self.mesh, item["group"])
                if w is None or not len(nodes):
                    raise ValueError(
                        f"Force group {item['group']!r} resolves to no "
                        "line3 edge elements")
                for n in nodes:
                    f[2 * n: 2 * n + 2] += vec * w[n]
                applied.append({"group": item["group"],
                                "nodes": len(nodes), "force_vec": vec})
                self._log(f"   - Applied force {vec} N over edge group "
                          f"{item['group']!r} ({len(nodes)} nodes).")
            else:
                pos = (item["force_x_pstn"], item["force_y_pstn"], 0.0)
                n = nearest_node(self.points, pos, self.neumann_nodes)
                f[2 * n: 2 * n + 2] += vec
                applied.append({"node_idx": n, "pos": self.points[n],
                                "force_vec": vec})
                self._log(f"   - Applied force {vec} N to node {n}.")
        if self.dT_nodes is not None:
            fe_th = tri6_el.element_thermal_load_plane(
                jnp.asarray(self.points[:, :2], dtype=self.dtype)[
                    jnp.asarray(self.conn)],
                self.C, self._alpha_eff,
                jnp.asarray(self.dT_nodes[self.conn], dtype=self.dtype),
                thickness=self.thickness)
            fn = np.zeros((self.num_nodes, 2))
            np.add.at(fn, self.conn.reshape(-1),
                      np.asarray(fe_th, dtype=np.float64).reshape(-1, 2))
            f += fn.reshape(-1)
            self._log(f"   - Applied thermal loads (dT range "
                      f"[{self.dT_nodes.min():g}, {self.dT_nodes.max():g}] K).")
        self.f = f
        self.applied_forces_info = applied
        self.stage_times["bc"] = time.perf_counter() - t0

    def solve(self) -> None:
        self._log("4. Solving the linear system...")
        t0 = time.perf_counter()
        mask = np.ones(self.ndof, dtype=self.dtype)
        mask[self.fixed_dofs] = 0.0
        self.operator = self.operator.with_free_mask(jnp.asarray(mask))
        fv = jnp.asarray(self.f * mask, dtype=self.operator.dtype)
        if self.ndof <= self.DENSE_DOF_LIMIT:
            K = self.operator.dense()
            u = solve_dense(K, fv, free_mask=jnp.asarray(mask))
            self.solve_info = {"method": "dense_cholesky", "ndof": self.ndof}
        else:
            u, self.solve_info = solve_2d(
                self.operator, self.mesh, self.C, mask, fv, self.cg_tol,
                kind="plane", thickness=self.thickness, log=self._log)
        self.u = np.asarray(u, dtype=np.float64)
        self.reaction_forces = np.asarray(_jit_apply(jnp.asarray(u), self.operator),
                                          dtype=np.float64)
        self.stage_times["solve"] = time.perf_counter() - t0
        self._log("   - System solved.")

    def print_reactions(self) -> None:
        self._log("\n--- Reaction Forces ---")
        r = self.reaction_forces
        for i, rec in enumerate(self.fixed_nodes_info[:12]):
            n = rec["node_idx"]
            self._log(f"  Node {n}: Rx={r[2 * n]:.4e}, Ry={r[2 * n + 1]:.4e} N")
        total_applied = np.zeros(2)
        for item in self.applied_forces_info:
            total_applied += item["force_vec"]
        total_reaction = np.array([
            r[self.fixed_dofs[self.fixed_dofs % 2 == 0]].sum(),
            r[self.fixed_dofs[self.fixed_dofs % 2 == 1]].sum(),
        ])
        self._log("\n--- Force Equilibrium Check ---")
        self._log(f"  Sum of Applied Forces (Fx, Fy): {total_applied}")
        self._log(f"  Sum of Reaction Forces (Rx, Ry): {total_reaction}")

    def equilibrium_residual(self) -> np.ndarray:
        """Sum of applied + reaction forces at fixed DOFs; ~0 at convergence."""
        total_applied = np.zeros(2)
        for item in self.applied_forces_info:
            total_applied += np.asarray(item["force_vec"])
        r = self.reaction_forces
        total_reaction = np.array([
            r[self.fixed_dofs[self.fixed_dofs % 2 == 0]].sum(),
            r[self.fixed_dofs[self.fixed_dofs % 2 == 1]].sum(),
        ])
        return total_applied + total_reaction

    def compute_stresses(self):
        """Nodal-averaged stresses (Voigt [xx, yy, xy]) and von Mises.

        Stresses are evaluated AT each element's own node positions and
        averaged across the elements sharing a node — O(h^2) accurate where
        gauss-mean smoothing (the reference beam path's idiom,
        BeamSolver.py:420-438) is only O(h) at boundaries. Returns
        (stress_nodes (N, 3), vm (N,)).
        """
        coords = jnp.asarray(self.points[:, :2], dtype=self.dtype)[
            jnp.asarray(self.conn)]
        ue = jnp.asarray(self.u.reshape(-1, 2)[self.conn], dtype=self.dtype)
        dT = (None if self.dT_nodes is None else
              jnp.asarray(self.dT_nodes[self.conn], dtype=self.dtype))
        stress = tri6_el.element_stress_at_nodes_plane(
            coords, self.C, ue, alpha_eff=self._alpha_eff, dT_nodes=dT)
        acc = np.zeros((self.num_nodes, 3))
        cnt = np.zeros(self.num_nodes)
        np.add.at(acc, self.conn.reshape(-1),
                  np.asarray(stress, dtype=np.float64).reshape(-1, 3))
        np.add.at(cnt, self.conn.reshape(-1), 1.0)
        s_node = acc / np.maximum(cnt, 1.0)[:, None]
        vm = np.asarray(tri6_el.von_mises_plane(
            jnp.asarray(s_node), None if self.mode == "stress" else self.v))
        self.stress_nodes = s_node
        self.von_mises = vm
        return s_node, vm

    MODAL_DOF_LIMIT = 40000

    def modal(self, n_modes: int = 10, rho: float = 7850.0):
        """2D natural frequencies and mode shapes (consistent Tri6 mass,
        exact degree-4 quadrature; host-partitioned dense eigensolve,
        femx.modal.modal_dense — the reference pipeline semantics).

        Returns a femx.modal.ModalResult (omega rad/s ascending, modes as
        full-DOF columns); also stored as .modal_result for the report."""
        from femx.assembly import assemble_dense
        from femx.modal import modal_dense

        if self.u is None:
            raise RuntimeError("Run the analysis first (BCs are set there).")
        if self.ndof > self.MODAL_DOF_LIMIT:
            raise ValueError(
                f"dense 2D modal is limited to {self.MODAL_DOF_LIMIT} DOF "
                f"(got {self.ndof}); coarsen the mesh")
        coords = jnp.asarray(self.points[:, :2], dtype=self.dtype)[
            jnp.asarray(self.conn)]
        me = tri6_el.element_mass_plane(coords, float(rho),
                                        thickness=self.thickness)
        comp = jnp.arange(2, dtype=jnp.int32)
        edofs = (jnp.asarray(self.conn, dtype=jnp.int32)[..., None] * 2
                 + comp).reshape(len(self.conn), 12)
        M = assemble_dense(me, edofs, self.ndof)
        K = self.operator.dense()
        res = modal_dense(np.asarray(K), np.asarray(M), self.fixed_dofs,
                          n_modes=n_modes)
        self.modal_result = res
        return res

    def plot(self, filename: str = "plane_result.png",
             field: str = "von_mises", warp_scale=None) -> str:
        """Deformed contour plot (field: von_mises/disp/sxx/syy/sxy)."""
        from femx.viz import save_plane_results_plot

        if self.u is None:
            raise RuntimeError("Run the analysis first.")
        return save_plane_results_plot(self, filename, field=field,
                                       warp_scale=warp_scale)

    def generate_report(self, filename: str = "plane_report.md") -> str:
        from femx.report import plane_report

        if self.u is None:
            raise RuntimeError("Run the analysis first.")
        if getattr(self, "von_mises", None) is None:
            self.compute_stresses()
        return plane_report(self, filename)

    def run_simulation(self):
        self.assemble()
        self.apply_boundary_conditions()
        self.solve()
        self.print_reactions()
        return self
