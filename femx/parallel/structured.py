"""Multi-chip structured operator: z-slab cell decomposition under shard_map.

Scaling strategy for the structured (box) flagship path: the cell grid is
split into contiguous z-slabs, one per device. Each device applies its
slab's cells — a local gather-free structured apply with STATIC shapes —
against the replicated displacement vector, and the per-device nodal force
contributions are summed with one `psum` over ICI. Cells on slab boundaries
share a lattice plane; the psum accumulates both devices' contributions to
it exactly (no ownership bookkeeping needed). Dot products in CG then see
bit-identical replicated vectors on every device.

Communication per apply: one all-reduce of the solution-sized vector — the
element-parallel pattern (SURVEY.md §2b DP-analog), here with the structured
operator's 0.1-1 ms/apply compute. A DOF-sharded halo variant (plane-only
exchange) is the documented next step for >8-chip scaling.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.assembly_structured import StructuredSolidOperator


@dataclasses.dataclass
class ShardedStructuredOperator:
    """K@u for a structured box mesh with cells z-slab-sharded over a mesh.

    Built from the single-device operator; requires nz % n_devices == 0.
    `apply`/`apply_constrained` take/return the full internal phase vector
    (replicated across the mesh).
    """

    op: StructuredSolidOperator  # full-problem operator (masks, layout)
    mesh: Mesh
    axis: str = "z"

    def __post_init__(self):
        nz = self.op.n_cells[2]
        ndev = self.mesh.shape[self.axis]
        if nz % ndev:
            raise ValueError(f"nz={nz} cells must divide the '{self.axis}' axis size {ndev}")
        if (self.op.z_weight is not None or self.op.x_weight is not None
                or self.op.y_weight is not None):
            # apply_phases (the slab kernel below) never applies per-layer
            # cell weights — carrying a ghost-padded operator through here
            # would silently compute the UNWEIGHTED stiffness. The weighted
            # (ghost-padded) distributed path is femx.parallel.driver/halo.
            raise ValueError(
                "ShardedStructuredOperator does not support per-layer cell "
                "weights (x/y/z_weight); use femx.parallel.driver for "
                "ghost-padded distributed solves")
        self.nzl = nz // ndev
        # local slab operator: identical cell matrix, nzl cells along z
        self.local = dataclasses.replace(
            self.op,
            n_cells=(self.op.n_cells[0], self.op.n_cells[1], self.nzl),
            grid_shape=(
                self.op.grid_shape[0],
                self.op.grid_shape[1],
                2 * self.nzl + 1,
            ),
            free_mask=None,
            z_weight=None,
        )

    # -- helpers -------------------------------------------------------------
    def _slab_phases(self, phases: List[jnp.ndarray], d):
        """Device d's slab (cells [d*nzl, (d+1)*nzl)) of each phase grid.

        Phase pz covers doubled-lattice z positions (2j + pz); the slab needs
        positions [2*k0, 2*k0 + 2*nzl], i.e. phase-z indices starting at k0,
        with nzl+1 entries for pz=0 and nzl for pz=1.
        """
        k0 = d * self.nzl
        out = []
        for i, g in enumerate(phases):
            pz = i % 2
            size = self.nzl + 1 - pz
            out.append(
                jax.lax.dynamic_slice_in_dim(g, k0, size, axis=3)
            )
        return out

    def _scatter_slab(self, full_zero: List[jnp.ndarray], slab: List[jnp.ndarray], d):
        k0 = d * self.nzl
        return [
            jax.lax.dynamic_update_slice_in_dim(fz, sl, k0, axis=3)
            for fz, sl in zip(full_zero, slab)
        ]

    # -- distributed apply ----------------------------------------------------
    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u (internal layout, replicated in and out)."""
        op = self.op
        local = self.local
        axis = self.axis

        def kernel(u_rep):
            d = jax.lax.axis_index(axis)
            phases = op._split_phases(u_rep)
            slab_u = self._slab_phases(phases, d)
            slab_f = local.apply_phases(slab_u)
            zeros = [jnp.zeros_like(g) for g in phases]
            contrib = self._scatter_slab(zeros, slab_f, d)
            flat = jnp.concatenate([g.reshape(-1) for g in contrib])
            return jax.lax.psum(flat, axis)

        fn = jax.shard_map(kernel, mesh=self.mesh, in_specs=P(), out_specs=P())
        return fn(u)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.op.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)
