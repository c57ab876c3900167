"""Assembly: element batches -> global operators (dense, sparse, matrix-free).

The reference assembles with Python loops into scipy lil_matrix / dense numpy
(ReactionSolver.py:126-149, BeamSolver.py:364-393). femx assembles with
scatter-adds over static-shaped element batches:

- dense scatter assembly for small frame systems (TPU: one `.at[].add`),
- matrix-free operator for large solid systems: K@u gathers element DOFs,
  applies the batched element action (MXU einsums), and scatter-adds — no
  global sparse matrix is ever materialized, which is the TPU-native answer
  to scipy's CSR+SuperLU path,
- BCOO export for interop/debugging.

All functions are jit-compatible; element counts are static per mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from femx.elements import tet10 as tet10_el


def dof_map(conn: jnp.ndarray, dofs_per_node: int) -> jnp.ndarray:
    """(E, n_nodes) connectivity -> (E, n_nodes*dpn) global DOF indices,
    node-major / component-minor (the layout both reference solvers use)."""
    conn = jnp.asarray(conn)
    comp = jnp.arange(dofs_per_node, dtype=conn.dtype)
    return (conn[..., None] * dofs_per_node + comp).reshape(conn.shape[0], -1)


def assemble_dense(ke: jnp.ndarray, edofs: jnp.ndarray, ndof: int) -> jnp.ndarray:
    """Scatter-add element matrices (E, d, d) into a dense (ndof, ndof) K."""
    K = jnp.zeros((ndof, ndof), dtype=ke.dtype)
    return K.at[edofs[:, :, None], edofs[:, None, :]].add(ke)


def assemble_vector(fe: jnp.ndarray, edofs: jnp.ndarray, ndof: int) -> jnp.ndarray:
    f = jnp.zeros(ndof, dtype=fe.dtype)
    return f.at[edofs.reshape(-1)].add(fe.reshape(-1))


def assemble_bcoo(ke: jnp.ndarray, edofs: jnp.ndarray, ndof: int):
    """Element batch -> jax.experimental.sparse BCOO (duplicates summed)."""
    from jax.experimental import sparse as jsparse

    E, d, _ = ke.shape
    rows = jnp.broadcast_to(edofs[:, :, None], (E, d, d)).reshape(-1)
    cols = jnp.broadcast_to(edofs[:, None, :], (E, d, d)).reshape(-1)
    idx = jnp.stack([rows, cols], axis=1)
    mat = jsparse.BCOO((ke.reshape(-1), idx), shape=(ndof, ndof))
    return mat.sum_duplicates()


@dataclasses.dataclass
class SolidOperator:
    """Matrix-free global stiffness operator for a Tetra10 mesh.

    Precomputes per-element, per-gauss-point global shape gradients and
    masked Jacobian factors once (`tet10.jacobians`); each apply is then
    gather -> batched einsum -> scatter-add. Memory: ~ (E*4*30 + E*4) floats,
    ~1/7 of storing explicit (E,30,30) element matrices, and the apply is
    compute-shaped for the MXU.

    `free_mask` (n_nodes*3,) imposes Dirichlet BCs without dynamic shapes:
    apply_constrained(u) = S K S u + (I-S) u with S = diag(free_mask), which
    keeps the operator SPD and full-size (TPU-friendly alternative to the
    reference's submatrix extraction, ReactionSolver.py:199).
    """

    conn: jnp.ndarray  # (E, 10) int32
    dN: jnp.ndarray  # (E, 4, 3, 10)
    wdet: jnp.ndarray  # (E, 4)
    C: jnp.ndarray  # (6, 6)
    n_nodes: int
    weight: float
    free_mask: Optional[jnp.ndarray] = None  # (n_nodes*3,) 1.0 free / 0.0 fixed

    @classmethod
    def from_mesh(cls, points, conn, C, weight=tet10_el.GAUSS_WEIGHT_CORRECT, dtype=None):
        points = jnp.asarray(points, dtype=dtype)
        conn = jnp.asarray(conn, dtype=jnp.int32)
        coords = points[conn]  # (E, 10, 3)
        dN, wdet, detJ = tet10_el.jacobians(coords)
        op = cls(
            conn=conn,
            dN=dN,
            wdet=wdet,
            C=jnp.asarray(C, dtype=points.dtype),
            n_nodes=points.shape[0],
            weight=float(weight),
        )
        return op, detJ

    @property
    def ndof(self) -> int:
        return 3 * self.n_nodes

    def with_free_mask(self, free_mask) -> "SolidOperator":
        return dataclasses.replace(self, free_mask=jnp.asarray(free_mask, dtype=self.dN.dtype))

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u for u of shape (ndof,). Unconstrained (full K)."""
        un = u.reshape(self.n_nodes, 3)
        ue = un[self.conn]  # (E, 10, 3)
        fe = tet10_el.element_apply(self.dN, self.wdet, self.C, ue, self.weight)
        f = jnp.zeros_like(un).at[self.conn].add(fe)
        return f.reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        """(S K S + (I-S)) @ u — SPD operator with Dirichlet DOFs pinned."""
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    def diagonal(self) -> jnp.ndarray:
        """diag(K) for Jacobi preconditioning, assembled matrix-free."""
        chat = tet10_el.chat_tensor(self.C)
        dke = jnp.einsum(
            "egkn,ckcl,egln,eg->enc", self.dN, chat, self.dN, self.weight * self.wdet
        )
        d = jnp.zeros((self.n_nodes, 3), dtype=dke.dtype).at[self.conn].add(dke)
        return d.reshape(-1)

    def constrained_diagonal(self) -> jnp.ndarray:
        s = self.free_mask
        return self.diagonal() * s + (1.0 - s)

    def block_diagonal(self) -> jnp.ndarray:
        """Nodal 3x3 diagonal blocks of K, (n_nodes, 3, 3), matrix-free."""
        chat = tet10_el.chat_tensor(self.C)
        bke = jnp.einsum(
            "egkn,ckdl,egln,eg->encd", self.dN, chat, self.dN, self.weight * self.wdet
        )
        return jnp.zeros((self.n_nodes, 3, 3), dtype=bke.dtype).at[self.conn].add(bke)

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """r -> M^-1 r with M = constrained nodal 3x3 block diagonal.

        Noticeably stronger than scalar Jacobi for elasticity (couples the
        x/y/z components at each node) at the same O(N) apply cost.
        """
        from femx.elements.tet10 import _inv3x3

        blocks = self.block_diagonal()
        s = self.free_mask.reshape(self.n_nodes, 3)
        # Zero fixed rows/cols inside each block, 1.0 on fixed diagonals.
        blocks = blocks * s[:, :, None] * s[:, None, :]
        eye = jnp.eye(3, dtype=blocks.dtype)
        blocks = blocks + (1.0 - s)[:, :, None] * eye  # diag(1-s) on fixed DOFs
        binv, _det = _inv3x3(blocks)

        def apply_minv(r):
            rn = r.reshape(self.n_nodes, 3)
            return jnp.einsum("ncd,nd->nc", binv, rn).reshape(-1)

        return apply_minv

    def element_stiffness(self):
        """Materialize (E, 30, 30) element matrices (small-mesh path)."""
        chat = tet10_el.chat_tensor(self.C)
        ke = jnp.einsum(
            "egki,ckdl,eglj,eg->eicjd", self.dN, chat, self.dN, self.weight * self.wdet
        )
        E = self.conn.shape[0]
        return ke.reshape(E, 30, 30)
