"""Transpose-gather (scatter-free) unstructured solid operator — the TPU
fast path for arbitrary tet meshes.

Why (measured on v5e @ 1.39M DOF, examples/bench_apply_variants.py,
2026-08-16): the natural K@u formulation costs per INDEX, not per byte —
  u[dofs] scalar gather (30E = 10M idx)      73.0 ms
  u3[conn] row gather   (10E = 3.3M idx)     17.3 ms   (4.2x: 3-wide rows)
  .at[dofs].add scalar scatter               86 ms
  .at[conn].add row scatter                 131 ms    (worse than scalar!)
  sorted segment_sum / cumsum-diff          231/321 ms
  node relabeling                            no effect (pure per-index cost)
Scatters cannot be made fast; gathers can be made 4x cheaper via rows.

This operator therefore eliminates the scatter:

  1. ue rows:   u3[connT]              (10, E, 3) row gather
  2. physics:   tet10_soa E-last kernel (1.9 ms, VPU)
  3. transpose: for each node, SUM the fe rows that reference it — a row
     GATHER from fe3 (10E, 3) using precomputed inverse indices. Nodes are
     RELABELED BY DEGREE at setup so equal-degree nodes are contiguous:
     the per-degree gathers are dense (n_d, d) index blocks with ZERO
     padding waste and the results concatenate back in node order with no
     scatter at all.

The operator runs in its internal degree-sorted node order (like the
structured operator's phase order); `to_internal` / `to_global` convert
once per solve on the host. Same math as femx.assembly.SolidOperator —
equality enforced by tests/test_assembly_tg.py.

Reference replaced: scipy lil/CSR assembly + SuperLU (ReactionSolver.py:
115-152, 196-205) for arbitrary gmsh meshes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from femx.assembly_soa import SolidOperatorSoA


@dataclasses.dataclass
class SolidOperatorTG:
    """Matrix-free K for unstructured Tet10 meshes, scatter-free apply."""

    soa: SolidOperatorSoA  # built on the relabeled mesh (internal order)
    connT: jnp.ndarray  # (10, E) int32 internal node ids
    bucket_idx: List[jnp.ndarray]  # per-degree (n_d, d) rows into fe3
    bucket_degrees: List[int]
    new_of_old: np.ndarray  # node relabel old -> internal
    free_mask: Optional[jnp.ndarray] = None  # internal DOF layout

    @classmethod
    def from_mesh(cls, points, conn, E_mod, nu, weight=None, dtype=np.float32):
        """Build from host mesh arrays. Returns (op, detJ) like the others."""
        from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT

        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        points = np.asarray(points)
        conn = np.asarray(conn)
        n_nodes = len(points)
        E = len(conn)

        # -- degree-sorted node relabeling (host, once) ---------------------
        degrees = np.bincount(conn.reshape(-1), minlength=n_nodes)
        new_of_old = np.argsort(np.argsort(degrees, kind="stable"), kind="stable")
        # (argsort of argsort = rank; stable keeps original order within a
        # degree class, preserving whatever locality the input had)
        old_of_new = np.argsort(new_of_old, kind="stable")
        points_int = points[old_of_new]
        conn_int = new_of_old[conn]

        soa, detJ = SolidOperatorSoA.from_mesh(
            points_int, conn_int, E_mod, nu, weight=weight, dtype=dtype
        )

        # -- inverse (transpose) indices, bucketed by degree ----------------
        # fe3 row index for (element e, local slot s) = s * E + e
        node_of_pos = conn_int.T.reshape(-1)  # (10E,), slot-major
        order = np.argsort(node_of_pos, kind="stable")
        deg_sorted = degrees[old_of_new]  # internal order: ascending degrees
        buckets: List[jnp.ndarray] = []
        bucket_degrees: List[int] = []
        pos = 0
        node0 = 0
        for d in np.unique(deg_sorted):
            n_d = int((deg_sorted == d).sum())
            d = int(d)
            if d == 0:
                # unreferenced nodes: contribute zero rows via an empty marker
                buckets.append(jnp.zeros((n_d, 0), dtype=jnp.int32))
                bucket_degrees.append(0)
            else:
                idx = order[pos : pos + n_d * d].reshape(n_d, d)
                # rows within a node sorted by position; each row's node ids
                # are node0..node0+n_d-1 in order because `order` is stable
                buckets.append(jnp.asarray(idx.astype(np.int32)))
                bucket_degrees.append(d)
                pos += n_d * d
            node0 += n_d
        assert pos == node_of_pos.size

        op = cls(
            soa=soa,
            connT=jnp.asarray(conn_int.T.astype(np.int32)),
            bucket_idx=buckets,
            bucket_degrees=bucket_degrees,
            new_of_old=new_of_old,
        )
        return op, detJ

    # -- layout ------------------------------------------------------------
    @property
    def ndof(self) -> int:
        return self.soa.ndof

    @property
    def n_nodes(self) -> int:
        return self.soa.n_nodes

    @property
    def n_elements(self) -> int:
        return self.soa.n_elements

    @property
    def dtype(self):
        return self.soa.dNg.dtype

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        """Global (3*node+comp) vector -> internal degree-sorted order."""
        x3 = np.asarray(x).reshape(self.n_nodes, 3)
        out = np.empty_like(x3)
        out[self.new_of_old] = x3
        return out.reshape(-1)

    def to_global(self, y: np.ndarray) -> np.ndarray:
        y3 = np.asarray(y).reshape(self.n_nodes, 3)
        return y3[self.new_of_old].reshape(-1)

    def with_free_mask(self, free_mask_internal) -> "SolidOperatorTG":
        m = jnp.asarray(free_mask_internal, dtype=self.dtype)
        return dataclasses.replace(
            self, free_mask=m, soa=self.soa.with_free_mask(m)
        )

    def astype(self, dtype) -> "SolidOperatorTG":
        """Cast geometry/mask (f64 residual operator for pcg_refined)."""
        dt = jnp.dtype(dtype)
        if dt == jnp.dtype(self.dtype):
            return self
        return dataclasses.replace(
            self,
            soa=self.soa.astype(dt),
            free_mask=None if self.free_mask is None else self.free_mask.astype(dt),
        )

    # -- core ----------------------------------------------------------------
    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u (internal layout), no scatters."""
        E = self.n_elements
        u3 = u.reshape(self.n_nodes, 3)
        ue3 = u3[self.connT]  # (10, E, 3) row gather
        ue = jnp.moveaxis(ue3, 2, 1).reshape(30, E)
        from femx.elements import tet10_soa as soa_k

        fe = soa_k.apply_element_forces(
            self.soa.dNg, self.soa.wdet, self.soa.C6, ue, self.soa.weight
        )  # (30, E)
        fe3 = jnp.moveaxis(fe.reshape(10, 3, E), 1, 2).reshape(10 * E, 3)
        parts = []
        for idx, d in zip(self.bucket_idx, self.bucket_degrees):
            if d == 0:
                parts.append(jnp.zeros((idx.shape[0], 3), dtype=fe3.dtype))
            else:
                parts.append(fe3[idx].sum(axis=1))  # (n_d, d, 3) -> (n_d, 3)
        return jnp.concatenate(parts).reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    # -- preconditioning ------------------------------------------------------
    def diagonal(self) -> jnp.ndarray:
        return self.soa.diagonal()

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        return self.soa.block_jacobi_preconditioner()


def _tg_flatten(op: SolidOperatorTG):
    children = (op.soa, op.connT, tuple(op.bucket_idx), op.free_mask)
    aux = (tuple(op.bucket_degrees), _HostArray(op.new_of_old))
    return children, aux


def _tg_unflatten(aux, children):
    soa, connT, bucket_idx, free_mask = children
    degrees, new_of_old = aux
    op = object.__new__(SolidOperatorTG)
    op.soa = soa
    op.connT = connT
    op.bucket_idx = list(bucket_idx)
    op.free_mask = free_mask
    op.bucket_degrees = list(degrees)
    op.new_of_old = new_of_old.a
    return op


class _HostArray:
    """Hashable wrapper so a host-only numpy array (node relabeling — used
    exclusively by to_internal/to_global outside jit) can live in pytree
    aux_data without becoming a traced leaf."""

    __slots__ = ("a", "_key")

    def __init__(self, a):
        self.a = np.asarray(a)
        self._key = (self.a.shape, self.a.dtype.str, hash(self.a.tobytes()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HostArray) and self._key == other._key


jax.tree_util.register_pytree_node(SolidOperatorTG, _tg_flatten, _tg_unflatten)
