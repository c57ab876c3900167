"""SoA (element-last) matrix-free solid operator.

Same interface as femx.assembly.SolidOperator (apply / apply_constrained /
diagonal / block_jacobi_preconditioner) but all hot arrays are element-last:
dNg (4,3,10,E), wdet (4,E), DOF table (30,E). See femx.elements.tet10_soa
for the layout rationale (~1000x faster than the einsum layout on TPU).

The production unstructured path is femx.assembly_tg.SolidOperatorTG, which
wraps this operator's element kernel but replaces the scalar gather +
scatter-add (73 + 86 ms @ 1.39M DOF on v5e) with row gathers and a
scatter-free degree-bucketed transpose gather (39 ms total per apply).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from femx.elements import tet10_soa as soa
from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT, material_matrix

# Module-level jit: one traced program shared by every from_mesh call (the
# per-E recompile is cached persistently; a fresh jit per call would retrace).
_geometry_jit = jax.jit(soa.geometry)


@dataclasses.dataclass
class SolidOperatorSoA:
    dofs: jnp.ndarray  # (30, E) int32 global DOF table
    dNg: jnp.ndarray  # (4, 3, 10, E)
    wdet: jnp.ndarray  # (4, E)
    C6: np.ndarray  # (6, 6) numpy (embedded as constants)
    n_nodes: int
    weight: float
    free_mask: Optional[jnp.ndarray] = None

    @classmethod
    def from_mesh(cls, points, conn, E_mod, nu, weight=GAUSS_WEIGHT_CORRECT, dtype=np.float32):
        """Build geometry factors from host mesh arrays.

        The geometry kernel runs ON DEVICE from a single (10, 3, E) coords
        transfer: at 331k elements on the axon-tunneled v5e that is a 40 MB
        upload + 3.3 s cold compile (persistently cached; 0.1 ms warm) vs
        the previous host-CPU evaluation (~18 s compute + a 165 MB factor
        transfer whose relay cost swings 2-400 s under contention)."""
        conn = np.asarray(conn)
        coords_np = soa.coords_soa(np.asarray(points), conn, dtype)
        dNg, wdet, detJ_d = _geometry_jit(jnp.asarray(coords_np))
        detJ = np.asarray(detJ_d)
        C6 = np.asarray(material_matrix(float(E_mod), float(nu), dtype=jnp.float64))
        op = cls(
            dofs=jnp.asarray(soa.dof_table(conn)),
            dNg=dNg,
            wdet=wdet,
            C6=C6.astype(dtype),
            n_nodes=len(points),
            weight=float(weight),
        )
        return op, detJ

    @property
    def ndof(self) -> int:
        return 3 * self.n_nodes

    @property
    def n_elements(self) -> int:
        return self.dofs.shape[1]

    def with_free_mask(self, free_mask) -> "SolidOperatorSoA":
        return dataclasses.replace(
            self, free_mask=jnp.asarray(free_mask, dtype=self.dNg.dtype)
        )

    def astype(self, dtype) -> "SolidOperatorSoA":
        """Same operator with geometry factors cast (for the f64 residual
        operator of mixed-precision iterative refinement)."""
        dt = jnp.dtype(dtype)
        return dataclasses.replace(
            self,
            dNg=self.dNg.astype(dt),
            wdet=self.wdet.astype(dt),
            C6=np.asarray(self.C6, dtype=dt),
            free_mask=None if self.free_mask is None else self.free_mask.astype(dt),
        )

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        ue = u[self.dofs]  # (30, E) gather
        fe = soa.apply_element_forces(self.dNg, self.wdet, self.C6, ue, self.weight)
        return jnp.zeros_like(u).at[self.dofs.reshape(-1)].add(fe.reshape(-1))

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    def _block_entries(self):
        chat = soa.chat_numpy(self.C6)
        return soa.block_diagonal_entries(self.dNg, self.wdet, chat, self.weight)

    def diagonal(self) -> jnp.ndarray:
        # One compiled program: evaluated eagerly, the stack + scatter-add
        # chain is ~40 per-op dispatches through the accelerator relay
        # (~30 ms each) plus per-op mini-compiles — pure setup-time waste.
        return _jit_diagonal(self)

    def _diagonal_impl(self) -> jnp.ndarray:
        bke = self._block_entries()  # (10, 3, 3, E)
        diag_e = jnp.stack([bke[n, c, c] for n in range(10) for c in range(3)])  # (30, E)
        return jnp.zeros(self.ndof, dtype=diag_e.dtype).at[self.dofs.reshape(-1)].add(
            diag_e.reshape(-1)
        )

    def block_jacobi_tensors(self) -> jnp.ndarray:
        """(3, 3, N) inverse constrained nodal blocks — data for
        `apply_block_jacobi`, pytree-friendly (pass as a jit argument; a
        closed-over copy becomes a compiled-program constant). Computed as
        ONE jitted program (the eager form was ~60 relay dispatches)."""
        return _jit_bj_cols(self)

    @staticmethod
    def apply_block_jacobi(binv_cols, r):
        """r -> M^-1 r given `block_jacobi_tensors` output."""
        rn = r.reshape(-1, 3)
        z0 = binv_cols[0][0] * rn[:, 0] + binv_cols[0][1] * rn[:, 1] + binv_cols[0][2] * rn[:, 2]
        z1 = binv_cols[1][0] * rn[:, 0] + binv_cols[1][1] * rn[:, 1] + binv_cols[1][2] * rn[:, 2]
        z2 = binv_cols[2][0] * rn[:, 0] + binv_cols[2][1] * rn[:, 1] + binv_cols[2][2] * rn[:, 2]
        return jnp.stack([z0, z1, z2], axis=1).reshape(-1)

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """r -> M^-1 r with M = constrained nodal 3x3 block diagonal."""
        binv_cols = self._block_jacobi_cols()
        return lambda r: self.apply_block_jacobi(binv_cols, r)

    def _block_jacobi_cols(self) -> jnp.ndarray:
        bke = self._block_entries()  # (10, 3, 3, E)
        node_of = self.dofs[::3] // 3  # (10, E) node index per local slot
        blocks = jnp.zeros((self.n_nodes, 3, 3), dtype=bke.dtype)
        for n in range(10):
            blocks = blocks.at[node_of[n]].add(jnp.transpose(bke[n], (2, 0, 1)))
        s = self.free_mask.reshape(self.n_nodes, 3)
        blocks = blocks * s[:, :, None] * s[:, None, :]
        blocks = blocks + (1.0 - s)[:, :, None] * jnp.eye(3, dtype=blocks.dtype)
        # closed-form 3x3 inverse, E-last style on (N,) component vectors
        a = [[blocks[:, i, j] for j in range(3)] for i in range(3)]
        det = (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )
        # Safe divide: a free node referenced by no element has a zero block;
        # map it to the identity instead of poisoning PCG with inf/NaN.
        valid = (jnp.abs(det) > 1e-30).astype(det.dtype)
        inv_det = valid / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        inv = [[None] * 3 for _ in range(3)]
        inv[0][0] = (a[1][1] * a[2][2] - a[1][2] * a[2][1]) * inv_det
        inv[0][1] = (a[0][2] * a[2][1] - a[0][1] * a[2][2]) * inv_det
        inv[0][2] = (a[0][1] * a[1][2] - a[0][2] * a[1][1]) * inv_det
        inv[1][0] = (a[1][2] * a[2][0] - a[1][0] * a[2][2]) * inv_det
        inv[1][1] = (a[0][0] * a[2][2] - a[0][2] * a[2][0]) * inv_det
        inv[1][2] = (a[0][2] * a[1][0] - a[0][0] * a[1][2]) * inv_det
        inv[2][0] = (a[1][0] * a[2][1] - a[1][1] * a[2][0]) * inv_det
        inv[2][1] = (a[0][1] * a[2][0] - a[0][0] * a[2][1]) * inv_det
        inv[2][2] = (a[0][0] * a[1][1] - a[0][1] * a[1][0]) * inv_det
        for i in range(3):  # identity blocks for degenerate (unused) nodes
            inv[i][i] = inv[i][i] + (1.0 - valid)
        return jnp.stack([jnp.stack(row) for row in inv])  # (3, 3, N)


def _soa_flatten(op: SolidOperatorSoA):
    children = (op.dofs, op.dNg, op.wdet, op.free_mask)
    aux = (tuple(map(tuple, np.asarray(op.C6, dtype=np.float64))),
           str(np.dtype(op.C6.dtype)), op.n_nodes, op.weight)
    return children, aux


def _soa_unflatten(aux, children):
    dofs, dNg, wdet, free_mask = children
    c6_rows, c6_dtype, n_nodes, weight = aux
    op = object.__new__(SolidOperatorSoA)
    op.dofs = dofs
    op.dNg = dNg
    op.wdet = wdet
    op.free_mask = free_mask
    op.C6 = np.array(c6_rows, dtype=np.dtype(c6_dtype))
    op.n_nodes = n_nodes
    op.weight = weight
    return op


jax.tree_util.register_pytree_node(SolidOperatorSoA, _soa_flatten, _soa_unflatten)

# Module-level jits (created once per process; the operator enters as a
# pytree ARGUMENT so its arrays don't become compiled-program constants).
_jit_diagonal = jax.jit(lambda op: op._diagonal_impl())
_jit_bj_cols = jax.jit(lambda op: op._block_jacobi_cols())


class BlockJacobiPrecond:
    """Callable pytree wrapper for the SoA block-Jacobi tensors, so the
    preconditioner can travel through jit as an ARGUMENT (pcg's M_inv_diag
    accepts callables; a bare closure can't be a pytree leaf)."""

    def __init__(self, tensors):
        self.tensors = tensors

    def __call__(self, r):
        return SolidOperatorSoA.apply_block_jacobi(self.tensors, r)


jax.tree_util.register_pytree_node(
    BlockJacobiPrecond,
    lambda p: ((p.tensors,), ()),
    lambda aux, ch: BlockJacobiPrecond(ch[0]),
)
