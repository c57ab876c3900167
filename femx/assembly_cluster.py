"""Clustered dense-block unstructured operator — fewer gathers, more MXU.

Why: the transpose-gather operator's cost is PER GATHER ROW (~4.3 ns/row on
v5e, width- and locality-invariant — measured, examples/bench_apply_variants
lineage): 2 x 10E rows per apply = 43 ms at 1.39M DOF, and neither
preconditioner tuning nor Pallas-free XLA tricks move it. This operator
reduces the ROW COUNT instead:

  * elements are grouped into CLUSTERS of k tets, consecutive along a
    Morton (z-curve) centroid ordering so cluster members share nodes;
  * each cluster's stiffness is PRE-ASSEMBLED into one dense
    (3m, 3m) matrix over its m unique nodes (m ~ 5-6 per tet at k=16 vs
    10 slots per tet — the sharing is the win);
  * apply = gather the m unique node rows per cluster, one batched dense
    matvec per SIZE CLASS on the MXU, and a TG-style degree-bucketed
    transpose gather over (cluster, slot) incidences.

Clusters are bucketed into SIZE CLASSES (m quantized up to a multiple of
8): padding a cluster to its class size costs O(m) gather rows and O(m^2)
matrix storage, so classing keeps both near the ideal sum over actual m_c
(a single global M padded storage to max m was measured at 2x the memory
and a 400 s host assembly at 1.39M DOF).

Same math as femx.assembly.SolidOperator — equality enforced by
tests/test_assembly_cluster.py. Internal node order: cluster-degree-sorted
(like assembly_tg) so the transpose buckets are dense (n_d, d) blocks.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SolidOperatorCluster:
    """Per-size-class dense cluster blocks + bucketed transpose gather."""

    Kcl: List[jnp.ndarray]  # per class (n_c, 3M_c, 3M_c)
    cl_nodes: List[jnp.ndarray]  # per class (n_c, M_c) int32 internal ids
    class_M: List[int]
    bucket_idx: List[jnp.ndarray]  # per-degree (n_d, d) rows into fe flat
    bucket_degrees: List[int]
    new_of_old: np.ndarray  # node relabel old -> internal
    n_nodes: int
    weight: float
    free_mask: Optional[jnp.ndarray] = None  # internal DOF layout

    # ------------------------------------------------------------------
    @classmethod
    def from_mesh(cls, points, conn, E_mod, nu, weight=None,
                  dtype=np.float32, cluster_size: int = 16):
        """Build from host mesh arrays. Returns (op, detJ)."""
        from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT

        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        points = np.asarray(points, dtype=np.float64)
        conn = np.asarray(conn)
        N, E = len(points), len(conn)
        k = int(cluster_size)
        dt = np.dtype(dtype)

        # ---- cluster formation: Morton (z-curve) centroid order -------
        cent = points[conn[:, :4]].mean(axis=1)
        lo_c = cent.min(axis=0)
        ptp = cent.max(axis=0) - lo_c
        span_c = np.where(ptp > 0, ptp, 1.0)
        q = np.minimum((1023 * (cent - lo_c) / span_c).astype(np.int64), 1023)
        key = np.zeros(E, dtype=np.int64)
        for b in range(10):
            for a in range(3):
                key |= ((q[:, a] >> b) & 1) << (3 * b + a)
        order = np.argsort(key, kind="stable")
        n_cl = -(-E // k)
        elems = np.full(n_cl * k, -1, dtype=np.int64)
        elems[:E] = order
        elems = elems.reshape(n_cl, k)

        # ---- unique nodes + degree (vectorized over clusters) ---------
        # conn10 of padded elements -> sentinel N (sorts last, dropped)
        conn_pad = np.full((n_cl, k, 10), N, dtype=np.int64)
        valid_e = elems >= 0
        conn_pad[valid_e] = conn[elems[valid_e]]
        flat = np.sort(conn_pad.reshape(n_cl, 10 * k), axis=1)
        is_new = np.ones_like(flat, dtype=bool)
        is_new[:, 1:] = flat[:, 1:] != flat[:, :-1]
        is_new &= flat < N
        m_c = is_new.sum(axis=1)  # unique nodes per cluster

        deg = np.zeros(N + 1, dtype=np.int64)
        np.add.at(deg, flat[is_new], 1)
        deg = deg[:N]
        new_of_old = np.argsort(np.argsort(deg, kind="stable"), kind="stable")

        # ---- size classes (M quantized to multiples of 8) --------------
        M_of = np.maximum(8, ((m_c + 7) // 8) * 8)
        class_M = sorted(int(v) for v in np.unique(M_of))
        order_cl = np.argsort(M_of, kind="stable")  # class-grouped clusters

        # ---- element stiffness on host CPU (f64, chunked) --------------
        ke, detJ = _element_stiffness_host(points, conn, E_mod, nu,
                                           float(weight))

        conn_int = new_of_old[conn]
        Kcl_list, cl_nodes_list = [], []
        fe_offsets = []  # flat fe row offset of each class
        off = 0
        # per-cluster (sorted-unique) node lists in internal ids
        for M in class_M:
            cidx = order_cl[M_of[order_cl] == M]
            n_c = len(cidx)
            nodes_c = np.zeros((n_c, M), dtype=np.int64)
            sent = np.full((n_c, M), N + 1, dtype=np.int64)
            for row, c in enumerate(cidx):
                u = flat[c][is_new[c]]
                nodes_c[row, :len(u)] = new_of_old[u]
                sent[row, :len(u)] = new_of_old[u]
            sortperm = np.argsort(sent, axis=1, kind="stable")
            nodes_sorted = np.take_along_axis(sent, sortperm, axis=1)

            Kc = np.zeros((n_c, 3 * M, 3 * M), dtype=dt)
            rr = np.arange(n_c)
            base = N + 2
            for j in range(k):
                es = elems[cidx, j]
                ok = es >= 0
                ev = es[ok]
                rv = rr[ok]
                loc = _rows_searchsorted(nodes_sorted[rv], sortperm[rv],
                                         conn_int[ev], base)
                dof = (3 * loc[:, :, None] + np.arange(3)).reshape(len(ev), 30)
                # one element per cluster row per j -> index triples are
                # unique, so buffered fancy += is exact (and ~5x add.at)
                Kc[rv[:, None, None], dof[:, :, None],
                   dof[:, None, :]] += ke[ev].astype(dt)
            Kcl_list.append(jnp.asarray(Kc))
            cl_nodes_list.append(jnp.asarray(nodes_c.astype(np.int32)))
            fe_offsets.append(off)
            off += n_c * M

        # ---- transpose buckets over (cluster, slot) incidences --------
        # fe flat row of (class t, cluster row r, slot s) = off_t + r*M_t + s
        node_of_row = np.empty(off, dtype=np.int64)
        row_valid = np.zeros(off, dtype=bool)
        for t, (M, nodes) in enumerate(zip(class_M, cl_nodes_list)):
            nodes = np.asarray(nodes)
            n_c = nodes.shape[0]
            cidx = order_cl[M_of[order_cl] == M]
            sl = fe_offsets[t] + np.arange(n_c * M)
            node_of_row[sl] = nodes.reshape(-1)
            vmask = (np.arange(M)[None, :] < m_c[cidx][:, None])
            row_valid[sl] = vmask.reshape(-1)
        rows = np.where(row_valid)[0]
        nr = node_of_row[rows]
        order_r = np.argsort(nr, kind="stable")
        old_of_new = np.argsort(new_of_old, kind="stable")
        deg_int = deg[old_of_new]
        buckets: List[jnp.ndarray] = []
        bucket_degrees: List[int] = []
        pos = 0
        for d in np.unique(deg_int):
            n_d = int((deg_int == d).sum())
            d = int(d)
            if d == 0:
                buckets.append(jnp.zeros((n_d, 0), dtype=jnp.int32))
                bucket_degrees.append(0)
            else:
                idx = order_r[pos: pos + n_d * d].reshape(n_d, d)
                buckets.append(jnp.asarray(rows[idx].astype(np.int32)))
                bucket_degrees.append(d)
                pos += n_d * d
        assert pos == len(order_r)

        op = cls(
            Kcl=Kcl_list,
            cl_nodes=cl_nodes_list,
            class_M=[int(M) for M in class_M],
            bucket_idx=buckets,
            bucket_degrees=bucket_degrees,
            new_of_old=new_of_old,
            n_nodes=N,
            weight=float(weight),
        )
        return op, detJ

    # -- layout ---------------------------------------------------------
    @property
    def ndof(self) -> int:
        return 3 * self.n_nodes

    @property
    def dtype(self):
        return self.Kcl[0].dtype

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        x3 = np.asarray(x).reshape(self.n_nodes, 3)
        out = np.empty_like(x3)
        out[self.new_of_old] = x3
        return out.reshape(-1)

    def to_global(self, y: np.ndarray) -> np.ndarray:
        y3 = np.asarray(y).reshape(self.n_nodes, 3)
        return y3[self.new_of_old].reshape(-1)

    def with_free_mask(self, free_mask_internal) -> "SolidOperatorCluster":
        m = jnp.asarray(free_mask_internal, dtype=self.dtype)
        out = dataclasses.replace(self, free_mask=m)
        if isinstance(free_mask_internal, np.ndarray):
            out._free_mask_host = free_mask_internal
        return out

    def astype(self, dtype) -> "SolidOperatorCluster":
        dt = jnp.dtype(dtype)
        if dt == jnp.dtype(self.dtype):
            return self
        return dataclasses.replace(
            self, Kcl=[K.astype(dt) for K in self.Kcl],
            free_mask=None if self.free_mask is None
            else self.free_mask.astype(dt))

    # -- core -----------------------------------------------------------
    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u (internal layout)."""
        u3 = u.reshape(self.n_nodes, 3)
        fe_parts = []
        for K, nodes, M in zip(self.Kcl, self.cl_nodes, self.class_M):
            ue = u3[nodes]  # (n_c, M, 3) row gather
            fe = jnp.einsum("cij,cj->ci", K,
                            ue.reshape(K.shape[0], 3 * M),
                            precision=jax.lax.Precision.HIGHEST)
            fe_parts.append(fe.reshape(-1, 3))
        fe3 = jnp.concatenate(fe_parts)  # rows match fe_offsets layout
        parts = []
        for idx, d in zip(self.bucket_idx, self.bucket_degrees):
            if d == 0:
                parts.append(jnp.zeros((idx.shape[0], 3), dtype=fe3.dtype))
            else:
                parts.append(fe3[idx].sum(axis=1))
        return jnp.concatenate(parts).reshape(-1)

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    # -- preconditioning -------------------------------------------------
    def block_jacobi_tensors(self) -> jnp.ndarray:
        """(n_nodes, 3, 3) inverse nodal blocks (host, once), constrained
        by free_mask, internal node order — data for apply_block_jacobi."""
        from femx.assembly_structured import _inv3x3_np

        bd = np.zeros((self.n_nodes, 3, 3))
        for K, nodes, M in zip(self.Kcl, self.cl_nodes, self.class_M):
            Kh = np.asarray(K, dtype=np.float64)
            n_c = Kh.shape[0]
            diag = Kh.reshape(n_c, M, 3, M, 3)
            sl = np.arange(M)
            diag = diag[:, sl, :, sl, :]  # (M, n_c, 3, 3)
            np.add.at(bd, np.asarray(nodes).T, diag)
        mask = np.asarray(getattr(self, "_free_mask_host", None)
                          if getattr(self, "_free_mask_host", None) is not None
                          else self.free_mask).reshape(self.n_nodes, 3)
        bd *= mask[:, :, None] * mask[:, None, :]
        bd += (1.0 - mask)[:, :, None] * np.eye(3)
        return jnp.asarray(_inv3x3_np(bd).astype(np.dtype(self.dtype)))

    @staticmethod
    def apply_block_jacobi(binv, r):
        r3 = r.reshape(-1, 3)
        return jnp.einsum("ncd,nd->nc", binv, r3).reshape(-1)

    def gather_rows(self) -> int:
        """Total gather rows per apply (the quantity this operator
        minimizes; compare against the TG operator's 20E)."""
        ue = sum(int(n.shape[0]) * M for n, M in zip(self.cl_nodes,
                                                     self.class_M))
        tr = sum(b.shape[0] * max(d, 1)
                 for b, d in zip(self.bucket_idx, self.bucket_degrees))
        return ue + tr


def _element_stiffness_host(points, conn, E_mod, nu, weight):
    """(E, 30, 30) f64 element matrices + detJ, pure host numpy (the jax
    einsum kernel costs minutes of compile on large E; numpy runs the same
    contraction chunked in seconds)."""
    from femx.assembly_structured import _material_matrix_np
    from femx.elements.tet10 import DN_NATURAL, _SEL

    conn = np.asarray(conn)
    E = len(conn)
    C = _material_matrix_np(E_mod, nu)
    chat = np.einsum("ack,ab,bdl->ckdl", _SEL, C, _SEL)
    ke = np.empty((E, 30, 30))
    detJ = np.empty((E, 4))
    chunk = 131072
    for s in range(0, E, chunk):
        coords = points[conn[s:s + chunk]]  # (e, 10, 3)
        J = np.einsum("gkn,enc->egkc", DN_NATURAL, coords)
        Jinv = np.linalg.inv(J)
        dj = np.linalg.det(J)
        dN = np.einsum("egkc,gcn->egkn", Jinv, DN_NATURAL)
        wdet = np.where(dj > 1e-12, dj, 0.0)
        kk = np.einsum("egki,ckdl,eglj,eg->eicjd", dN, chat, dN,
                       weight * wdet, optimize=True)
        ke[s:s + chunk] = kk.reshape(-1, 30, 30)
        detJ[s:s + chunk] = dj
    return ke, detJ


def _rows_searchsorted(rows_sorted, sortperm, queries, base):
    """Per-row searchsorted, fully vectorized via row-offset keys.

    rows_sorted: (B, M) each row ascending with values < base; sortperm:
    (B, M) such that rows_sorted = row_original[sortperm]; queries: (B, Q)
    values known to be present in their row. Returns slot positions in the
    ORIGINAL (unsorted) row order."""
    B, M = rows_sorted.shape
    off = np.arange(B, dtype=np.int64)[:, None] * base
    flat = (rows_sorted.astype(np.int64) + off).reshape(-1)
    q = (queries.astype(np.int64) + off)
    p = np.searchsorted(flat, q.reshape(-1)).reshape(queries.shape)
    p_local = p - np.arange(B)[:, None] * M
    return np.take_along_axis(sortperm, p_local, axis=1)


def _cluster_flatten(op: SolidOperatorCluster):
    children = (tuple(op.Kcl), tuple(op.cl_nodes), tuple(op.bucket_idx),
                op.free_mask)
    aux = (tuple(op.class_M), tuple(op.bucket_degrees),
           _HostArr(op.new_of_old), op.n_nodes, op.weight)
    return children, aux


def _cluster_unflatten(aux, children):
    Kcl, cl_nodes, bucket_idx, free_mask = children
    class_M, degrees, hoa, n_nodes, weight = aux
    op = object.__new__(SolidOperatorCluster)
    op.Kcl = list(Kcl)
    op.cl_nodes = list(cl_nodes)
    op.bucket_idx = list(bucket_idx)
    op.free_mask = free_mask
    op.class_M = list(class_M)
    op.bucket_degrees = list(degrees)
    op.new_of_old = hoa.a
    op.n_nodes = n_nodes
    op.weight = weight
    return op


class _HostArr:
    __slots__ = ("a", "_key")

    def __init__(self, a):
        self.a = np.asarray(a)
        self._key = (self.a.shape, self.a.dtype.str, hash(self.a.tobytes()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HostArr) and self._key == other._key


jax.tree_util.register_pytree_node(
    SolidOperatorCluster, _cluster_flatten, _cluster_unflatten
)


class ClusterBJPrecond:
    """Callable pytree wrapper for the cluster block-Jacobi tensors
    ((N, 3, 3) layout) — the analog of assembly_soa.BlockJacobiPrecond, so
    the preconditioner can travel through jit as an ARGUMENT."""

    def __init__(self, tensors):
        self.tensors = tensors

    def __call__(self, r):
        return SolidOperatorCluster.apply_block_jacobi(self.tensors, r)


jax.tree_util.register_pytree_node(
    ClusterBJPrecond,
    lambda p: ((p.tensors,), ()),
    lambda aux, ch: ClusterBJPrecond(ch[0]),
)
