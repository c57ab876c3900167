"""Matrix-free global operators for 2D Tri6 meshes (plane + axisymmetric).

Same architecture as the 3D solid path (femx/assembly.py:SolidOperator):
precompute per-element gauss data once; each K@u is gather -> batched MXU
einsum -> scatter-add; Dirichlet BCs as full-size masks (static shapes).
These serve the two menu products the reference app never implemented
("2D Static Analysis", "Pipe Thermal Stress Analysis" — empty placeholder
dialogs, FEM_main.py:412-431).

2D problem sizes are modest by the 3D path's standards, so there is no
structured/gather-free variant here; the generic operator + block-Jacobi
PCG (or dense Cholesky under the small-size limit) covers the product.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from femx.elements import tri6 as tri6_el

jax.tree_util  # noqa: B018  (imported for registration below)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PlaneOperator:
    """Matrix-free stiffness operator for a Tri6 plane-elasticity mesh.

    DOF layout: node-major / xy-minor, ndof = 2 * n_nodes.
    `free_mask` (ndof,) imposes Dirichlet BCs as S K S + (I-S) — SPD and
    full-size (no dynamic shapes), like the solid operators.
    """

    conn: jnp.ndarray  # (E, 6) int32
    dN: jnp.ndarray  # (E, 3, 2, 6)
    wdet: jnp.ndarray  # (E, 3) includes the gauss weight
    C: jnp.ndarray  # (3, 3)
    n_nodes: int
    thickness: float
    free_mask: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        leaves = (self.conn, self.dN, self.wdet, self.C, self.free_mask)
        aux = (self.n_nodes, self.thickness)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        conn, dN, wdet, C, free_mask = leaves
        return cls(conn=conn, dN=dN, wdet=wdet, C=C, n_nodes=aux[0],
                   thickness=aux[1], free_mask=free_mask)

    @classmethod
    def from_mesh(cls, points, conn, C, thickness=1.0, dtype=None):
        """points (N, >=2) — columns (0, 1) are used; conn (E, 6)."""
        pts = jnp.asarray(points, dtype=dtype)[:, :2]
        conn = jnp.asarray(conn, dtype=jnp.int32)
        dN, wdet, detJ = tri6_el.jacobians(pts[conn])
        op = cls(conn=conn, dN=dN, wdet=wdet,
                 C=jnp.asarray(C, dtype=pts.dtype),
                 n_nodes=points.shape[0], thickness=float(thickness))
        return op, detJ

    @property
    def ndof(self) -> int:
        return 2 * self.n_nodes

    @property
    def dtype(self):
        return self.dN.dtype

    def with_free_mask(self, free_mask) -> "PlaneOperator":
        return dataclasses.replace(
            self, free_mask=jnp.asarray(free_mask, dtype=self.dN.dtype))

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        un = u.reshape(self.n_nodes, 2)
        fe = tri6_el.element_apply_plane(
            self.dN, self.wdet, self.C, un[self.conn], self.thickness)
        f = jnp.zeros_like(un).at[self.conn].add(fe)
        return f.reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        return self.apply(u * s) * s + u * (1.0 - s)

    def block_diagonal(self) -> jnp.ndarray:
        """Nodal 2x2 diagonal blocks of K, (n_nodes, 2, 2), matrix-free."""
        chat = tri6_el.chat_tensor_plane(self.C)
        bke = jnp.einsum("egkn,ckdl,egln,eg->encd", self.dN, chat, self.dN,
                         self.thickness * self.wdet)
        return jnp.zeros((self.n_nodes, 2, 2), dtype=bke.dtype).at[
            self.conn].add(bke)

    def block_jacobi_inverse_blocks(self) -> jnp.ndarray:
        """Masked nodal 2x2 block inverses, (n_nodes, 2, 2)."""
        blocks = self.block_diagonal()
        s = self.free_mask.reshape(self.n_nodes, 2)
        blocks = blocks * s[:, :, None] * s[:, None, :]
        blocks = blocks + (1.0 - s)[:, :, None] * jnp.eye(2, dtype=blocks.dtype)
        binv, _ = tri6_el._inv2x2(blocks)
        return binv

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        binv = self.block_jacobi_inverse_blocks()

        def apply_minv(r):
            rn = r.reshape(self.n_nodes, 2)
            return jnp.einsum("ncd,nd->nc", binv, rn).reshape(-1)

        return apply_minv

    def dense(self) -> jnp.ndarray:
        """Materialize dense K (small-mesh path)."""
        chat = tri6_el.chat_tensor_plane(self.C)
        ke = jnp.einsum("egki,ckdl,eglj,eg->eicjd", self.dN, chat, self.dN,
                        self.thickness * self.wdet)
        E = self.conn.shape[0]
        ke = ke.reshape(E, 12, 12)
        comp = jnp.arange(2, dtype=self.conn.dtype)
        edofs = (self.conn[..., None] * 2 + comp).reshape(E, 12)
        K = jnp.zeros((self.ndof, self.ndof), dtype=ke.dtype)
        return K.at[edofs[:, :, None], edofs[:, None, :]].add(ke)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AxisymOperator:
    """Matrix-free stiffness operator for an axisymmetric Tri6 mesh.

    Coordinates (r, z); DOF layout node-major / (u_r, u_z)-minor. All
    integrals carry the 2*pi*r measure (full-revolution loads/reactions).
    """

    conn: jnp.ndarray  # (E, 6) int32
    dN: jnp.ndarray  # (E, 3, 2, 6)
    wdet_r: jnp.ndarray  # (E, 3) weight * detJ * 2*pi*r
    n_over_r: jnp.ndarray  # (E, 3, 6)
    C: jnp.ndarray  # (4, 4)
    n_nodes: int
    free_mask: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        leaves = (self.conn, self.dN, self.wdet_r, self.n_over_r, self.C,
                  self.free_mask)
        return leaves, (self.n_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        conn, dN, wdet_r, n_over_r, C, free_mask = leaves
        return cls(conn=conn, dN=dN, wdet_r=wdet_r, n_over_r=n_over_r, C=C,
                   n_nodes=aux[0], free_mask=free_mask)

    @classmethod
    def from_mesh(cls, points, conn, C, dtype=None):
        pts = jnp.asarray(points, dtype=dtype)[:, :2]
        conn = jnp.asarray(conn, dtype=jnp.int32)
        dN, wdet_r, n_over_r, detJ = tri6_el.axisym_gauss_data(pts[conn])
        op = cls(conn=conn, dN=dN, wdet_r=wdet_r, n_over_r=n_over_r,
                 C=jnp.asarray(C, dtype=pts.dtype), n_nodes=points.shape[0])
        return op, detJ

    @property
    def ndof(self) -> int:
        return 2 * self.n_nodes

    @property
    def dtype(self):
        return self.dN.dtype

    def with_free_mask(self, free_mask) -> "AxisymOperator":
        return dataclasses.replace(
            self, free_mask=jnp.asarray(free_mask, dtype=self.dN.dtype))

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        un = u.reshape(self.n_nodes, 2)
        fe = tri6_el.element_apply_axisym(
            self.dN, self.wdet_r, self.n_over_r, self.C, un[self.conn])
        f = jnp.zeros_like(un).at[self.conn].add(fe)
        return f.reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        return self.apply(u * s) * s + u * (1.0 - s)

    def block_jacobi_inverse_blocks(self) -> jnp.ndarray:
        """Masked nodal 2x2 block inverses assembled from element matrices
        (E is modest in axisymmetric models; the (E, 12, 12) batch is
        affordable here), (n_nodes, 2, 2)."""
        kee = self._element_stiffness().reshape(-1, 6, 2, 6, 2)
        # per-element nodal blocks ke[(n,c),(n,d)], gathered along the
        # shared node axis
        idx = jnp.arange(6)
        blk = jnp.swapaxes(kee[:, idx, :, idx, :], 0, 1)  # (E, 6, 2, 2)
        diag_blocks = jnp.zeros((self.n_nodes, 2, 2), dtype=kee.dtype).at[
            self.conn].add(blk)
        s = self.free_mask.reshape(self.n_nodes, 2)
        blocks = diag_blocks * s[:, :, None] * s[:, None, :]
        blocks = blocks + (1.0 - s)[:, :, None] * jnp.eye(2, dtype=blocks.dtype)
        binv, _ = tri6_el._inv2x2(blocks)
        return binv

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        binv = self.block_jacobi_inverse_blocks()

        def apply_minv(r):
            rn = r.reshape(self.n_nodes, 2)
            return jnp.einsum("ncd,nd->nc", binv, rn).reshape(-1)

        return apply_minv

    def _element_stiffness(self):
        E = self.conn.shape[0]
        eye = jnp.eye(12, dtype=self.dN.dtype).reshape(12, 6, 2)
        cols = jnp.stack([
            tri6_el.element_apply_axisym(
                self.dN, self.wdet_r, self.n_over_r, self.C,
                jnp.broadcast_to(eye[j], (E, 6, 2)))
            for j in range(12)
        ], axis=-1)
        return cols.reshape(E, 12, 12)

    def dense(self) -> jnp.ndarray:
        ke = self._element_stiffness()
        E = self.conn.shape[0]
        comp = jnp.arange(2, dtype=self.conn.dtype)
        edofs = (self.conn[..., None] * 2 + comp).reshape(E, 12)
        K = jnp.zeros((self.ndof, self.ndof), dtype=ke.dtype)
        return K.at[edofs[:, :, None], edofs[:, None, :]].add(ke)
