"""Beam analysis pipeline: 3D Timoshenko frames (static + stress + modal).

Headless, GUI-free equivalent of the reference's
`BeamAnalysisWindow.run_simulation` (BeamSolver.py:345-465): same inputs
(line mesh with physical groups, per-group section assignments, per-group
BC/force assignments, E, nu), same outputs (u, smoothed nodal stresses,
natural frequencies, full-DOF mode shapes) — computed with batched vmapped
element kernels, one scatter-add dense assembly, a Cholesky solve, and a
symmetric generalized eigensolver.

Deviations from the reference (documented, flag-gated where cheap):
- density honors the caller's `rho` (reference hardcodes 7850 and ignores its
  density widget, BeamSolver.py:376 — set rho=7850 for compat);
- modal uses a symmetric solver instead of unshifted QR on inv(M)K
  (identical eigenvalues, correct eigenvectors — SURVEY.md §6 quirk 2);
- consistent mass is available in addition to lumped.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from femx import bc as bc_mod
from femx.assembly import assemble_dense, dof_map
from femx.elements import beam as beam_el
from femx.mesh.core import Mesh
from femx.modal import modal_dense
from femx.sections.properties import SectionProperties, compute_properties
from femx.solve.dense import partitioned_solve


@dataclasses.dataclass
class BeamResults:
    u: np.ndarray  # (6N,) displacements/rotations
    smoothed_stresses: np.ndarray  # (N,) nodal stress (averaged element ends)
    natural_frequencies: np.ndarray  # rad/s, ascending
    mode_shapes: np.ndarray  # (6N, n_modes)
    props_map: Dict[str, SectionProperties]
    K: np.ndarray
    M: np.ndarray
    fixed_dofs: np.ndarray
    f: np.ndarray

    @property
    def natural_frequencies_hz(self) -> np.ndarray:
        return self.natural_frequencies / (2 * np.pi)

    def reactions(self) -> np.ndarray:
        return self.K @ self.u


class BeamAnalysis:
    """3D Timoshenko frame analysis on a 'line'-element mesh.

    Args:
      mesh: femx Mesh with 'line' cells, line physical groups naming section
        assignments and 'vertex' physical groups naming BCs.
      section_data: [{'group', 'type', 'params', 'rotate'}] — the reference's
        section assignment records (BeamSolver.py:237).
      bc_data: [{'group', 'type': 'Fix'|'Force', ...}] — the reference's BC
        records (BeamSolver.py:250).
      E, nu: material. rho: density (7850 reproduces the reference).
      mass: 'lumped' (reference) or 'consistent'.
      section_method: 'auto' | 'fem' | 'closed_form' for J/kappa.
    """

    def __init__(
        self,
        mesh: Mesh,
        section_data: Sequence[dict],
        bc_data: Sequence[dict],
        E: float,
        nu: float,
        rho: float = 7850.0,
        mass: str = "lumped",
        section_method: str = "auto",
    ):
        if "line" not in mesh.cells:
            raise ValueError("No 'line' elements in mesh.")
        self.mesh = mesh
        self.section_data = list(section_data)
        self.bc_data = list(bc_data)
        self.E = float(E)
        self.nu = float(nu)
        self.rho = float(rho)
        self.mass = mass
        self.section_method = section_method
        self.points = mesh.points
        self.conn = mesh.cells["line"]
        self.results: Optional[BeamResults] = None

    # -- element-group resolution (reference: BeamSolver.py:357-371) --------
    def _element_props(self) -> Dict[str, SectionProperties]:
        props_map: Dict[str, SectionProperties] = {}
        for sec in self.section_data:
            props_map[sec["group"]] = compute_properties(
                sec["type"],
                {k: v for k, v in sec["params"].items() if k != "rotate"},
                rotate=sec.get("rotate", False),
                method=self.section_method,
            )
        return props_map

    def _group_names_per_element(self) -> List[str]:
        gid_to_name = {v[0]: k for k, v in self.mesh.field_data.items()}
        tags = self.mesh.cell_physical.get("line")
        if tags is None:
            raise ValueError("Line elements carry no physical tags.")
        return [gid_to_name.get(int(t)) for t in tags]

    def run(self, n_modes: Optional[int] = None) -> BeamResults:
        E, nu, rho = self.E, self.nu, self.rho
        G = E / (2.0 * (1.0 + nu))
        n_nodes = len(self.points)
        ndof = 6 * n_nodes

        props_map = self._element_props()
        group_names = self._group_names_per_element()
        for g in group_names:
            if g not in props_map:
                raise ValueError(f"Section properties not defined for physical group '{g}'.")

        props_arr = jnp.asarray(
            np.array([props_map[g].as_tuple() for g in group_names], dtype=np.float64)
        )
        p1 = jnp.asarray(self.points[self.conn[:, 0]])
        p2 = jnp.asarray(self.points[self.conn[:, 1]])

        ke, me, _L = beam_el.batched_element_matrices(p1, p2, E, G, props_arr, rho, self.mass)
        edofs = dof_map(jnp.asarray(self.conn, dtype=jnp.int32), 6)
        K = assemble_dense(ke, edofs, ndof)
        M = assemble_dense(me, edofs, ndof)

        cs, f = bc_mod.beam_group_constraints_and_loads(self.mesh, self.bc_data)
        u = partitioned_solve(K, f, cs.fixed_dofs)

        fe_local = bc_mod.distributed_fixed_end_local(self.mesh, self.bc_data)
        stresses = self._recover_stresses(np.asarray(u), props_map, group_names, E, G,
                                          fe_local=fe_local)
        modal = modal_dense(np.asarray(K), np.asarray(M), cs.fixed_dofs, n_modes=n_modes)

        self.results = BeamResults(
            u=np.asarray(u),
            smoothed_stresses=stresses,
            natural_frequencies=np.asarray(modal.omega),
            mode_shapes=np.asarray(modal.modes),
            props_map=props_map,
            K=np.asarray(K),
            M=np.asarray(M),
            fixed_dofs=cs.fixed_dofs,
            f=f,
        )
        return self.results

    # alias matching the reference method name
    run_simulation = run

    def _recover_stresses(self, u, props_map, group_names, E, G,
                          fe_local=None) -> np.ndarray:
        """Axial + extreme-fiber bending stress at element ends, averaged per
        node (reference: BeamSolver.py:420-438).

        For members carrying DistributedForce loads, the end forces are
        k_local (R u_e) MINUS the element's local fixed-end equivalent load
        vector (fe_local), so recovered end moments include the per-element
        w L^2/12 term — exact for uniform loads on prismatic members rather
        than correct only in the refinement limit."""
        n_nodes = len(self.points)
        props_arr = jnp.asarray(
            np.array([props_map[g].as_tuple() for g in group_names], dtype=np.float64)
        )
        p1 = jnp.asarray(self.points[self.conn[:, 0]])
        p2 = jnp.asarray(self.points[self.conn[:, 1]])
        u6 = u.reshape(n_nodes, 6)
        ue = jnp.asarray(
            np.concatenate([u6[self.conn[:, 0]], u6[self.conn[:, 1]]], axis=1)
        )  # (E, 12)

        f_local = jax.vmap(beam_el.local_end_forces, in_axes=(0, 0, None, None, 0, 0))(
            p1, p2, E, G, props_arr, ue
        )
        if fe_local is not None:
            f_local = f_local - jnp.asarray(fe_local, dtype=f_local.dtype)
        A = props_arr[:, 0]
        I_x = props_arr[:, 1]
        I_y = props_arr[:, 2]
        c_y = props_arr[:, 6]
        c_z = props_arr[:, 7]

        def safe(num, den):
            return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)

        sigma_axial = safe(f_local[:, 6], A)
        bend1 = jnp.abs(safe(f_local[:, 4] * c_z, I_x)) + jnp.abs(safe(f_local[:, 5] * c_y, I_y))
        bend2 = jnp.abs(safe(f_local[:, 10] * c_z, I_x)) + jnp.abs(safe(f_local[:, 11] * c_y, I_y))
        s1 = np.asarray(sigma_axial + bend1)
        s2 = np.asarray(sigma_axial + bend2)

        nodal = np.zeros(n_nodes)
        counts = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(nodal, self.conn[:, 0], s1)
        np.add.at(nodal, self.conn[:, 1], s2)
        np.add.at(counts, self.conn[:, 0], 1)
        np.add.at(counts, self.conn[:, 1], 1)
        return np.divide(nodal, counts, out=np.zeros_like(nodal), where=counts != 0)
