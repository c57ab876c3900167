"""Distributed operators: element-sharded assembly/apply over a device mesh.

The reference is a single-threaded desktop app with no parallelism of any
kind (SURVEY.md §2b); its assembly loop (ReactionSolver.py:126-149) and
solver are host-sequential. femx's TPU-native scaling strategies:

- **Element parallelism (DP-analog):** the element batch is sharded across
  the 'elem' mesh axis; each device computes its elements' contribution to
  K@u against a replicated u and the partial nodal forces are summed with
  an XLA `psum` over ICI. This parallelizes the dominant cost (element
  einsums) with one all-reduce per operator application.
- **DOF partitioning (TP/CP-analog):** `reduce_scatter`/`all_gather` variant
  where u lives sharded over the 'dof' axis; the all-gather materializes u
  locally per apply and the scatter-add result is reduce-scattered back.
  Halves the resident vector memory per device at the same comm volume.
- **Batch parallelism (EP-analog):** many load cases as a leading vmap axis
  sharded over 'batch' (independent analyses, zero communication).

All collectives are XLA-compiled over the `jax.sharding.Mesh` — no
NCCL/MPI-style transport exists or is needed (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from femx.assembly import SolidOperator
from femx.elements import tet10 as tet10_el


def device_mesh(n_devices: Optional[int] = None, axis: str = "elem") -> Mesh:
    """1D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} device(s) are available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_elements(op: SolidOperator, multiple: int) -> SolidOperator:
    """Pad the element batch to a multiple of `multiple` with zero-weight
    dummy elements (wdet == 0 contributes nothing; conn points at node 0)."""
    E = op.conn.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return op
    conn = jnp.concatenate([op.conn, jnp.zeros((pad, 10), dtype=op.conn.dtype)])
    dN = jnp.concatenate([op.dN, jnp.zeros((pad,) + op.dN.shape[1:], dtype=op.dN.dtype)])
    wdet = jnp.concatenate([op.wdet, jnp.zeros((pad, 4), dtype=op.wdet.dtype)])
    return dataclasses.replace(op, conn=conn, dN=dN, wdet=wdet)


@dataclasses.dataclass
class ShardedSolidOperator:
    """Element-sharded matrix-free stiffness operator.

    Element data (conn, dN, wdet) is placed sharded over `mesh`'s 'elem'
    axis; `apply` runs under shard_map: each device gathers from the
    replicated u, applies its element batch, scatter-adds locally, and the
    partial nodal force vectors are `psum`med — the FEM analogue of
    data-parallel gradient accumulation.
    """

    op: SolidOperator
    mesh: Mesh
    axis: str = "elem"

    @classmethod
    def create(cls, op: SolidOperator, mesh: Mesh, axis: str = "elem") -> "ShardedSolidOperator":
        n = mesh.shape[axis]
        op = pad_elements(op, n)
        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        op = dataclasses.replace(
            op,
            conn=jax.device_put(op.conn, shard),
            dN=jax.device_put(op.dN, shard),
            wdet=jax.device_put(op.wdet, shard),
            C=jax.device_put(op.C, repl),
            free_mask=None if op.free_mask is None else jax.device_put(op.free_mask, repl),
        )
        return cls(op=op, mesh=mesh, axis=axis)

    def _local_apply(self, conn, dN, wdet, u):
        un = u.reshape(self.op.n_nodes, 3)
        ue = un[conn]
        fe = tet10_el.element_apply(dN, wdet, self.op.C, ue, self.op.weight)
        f = jnp.zeros_like(un).at[conn].add(fe)
        return jax.lax.psum(f.reshape(-1), self.axis)

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u with element-parallel evaluation; u and result replicated."""
        fn = jax.shard_map(
            self._local_apply,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis), P()),
            out_specs=P(),
        )
        return fn(self.op.conn, self.op.dN, self.op.wdet, u)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.op.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    def apply_dof_sharded(self, u_sharded: jnp.ndarray) -> jnp.ndarray:
        """K @ u with u sharded over the mesh axis (DOF partitioning):
        all_gather u -> local element apply -> reduce_scatter result.
        Keeps only 1/n of the solution vector resident per device."""

        def local(conn, dN, wdet, u_shard):
            u = jax.lax.all_gather(u_shard, self.axis, tiled=True)
            ndof = 3 * self.op.n_nodes
            pad = u.shape[0] - ndof  # u may be padded to a multiple of n_dev
            un = u[:ndof].reshape(self.op.n_nodes, 3)
            ue = un[conn]
            fe = tet10_el.element_apply(dN, wdet, self.op.C, ue, self.op.weight)
            f = jnp.zeros_like(un).at[conn].add(fe).reshape(-1)
            if pad:
                f = jnp.concatenate([f, jnp.zeros(pad, dtype=f.dtype)])
            return jax.lax.psum_scatter(f, self.axis, tiled=True)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis), P(self.axis)),
            out_specs=P(self.axis),
        )
        return fn(self.op.conn, self.op.dN, self.op.wdet, u_sharded)


def batched_solve_cg(
    op: SolidOperator,
    rhs_batch: jnp.ndarray,
    M_inv,
    tol: float = 1e-8,
    maxiter: int = 5000,
):
    """EP-analog: solve K u = f for a batch of load cases via vmapped CG.

    rhs_batch: (n_cases, ndof). Each case is an independent CG solve; under
    a 'batch'-sharded input the cases parallelize with zero communication.
    """
    from femx.solve.cg import pcg

    def solve_one(f):
        return pcg(op.apply_constrained, f, M_inv_diag=M_inv, tol=tol, maxiter=maxiter).x

    return jax.vmap(solve_one)(rhs_batch)
