"""Element+DOF-sharded UNSTRUCTURED solid operator (z-slab ownership).

SURVEY.md §2b's DP-analog applied to the production unstructured path:
round 2 left the transpose-gather operator (assembly_tg) single-chip-bound.
Here the mesh's nodes are z-sorted and slab-partitioned across the device
mesh, each element is owned by the lowest slab it touches, and one operator
application communicates only the INTERFACE rows with slab neighbors:

  1. ghost-sync: each device ppermutes the owned boundary values its
     neighbors' elements reference (2 sends, one per direction);
  2. local physics + transpose-gather over the device's own elements
     (tet10_soa E-last kernel + ELL row gathers into the local node space);
  3. halo-reduce: contributions computed for GHOST rows are ppermuted back
     to their owners and added (2 sends).

Per-apply communication is 4 x (interface rows x 3) values — surface, not
volume (asserted by the HLO payload scan in tests/test_tg_sharded.py).
Requires every element to span at most two ADJACENT slabs (true for any
mesh whose element z-extent is below the slab thickness); setup raises
ValueError otherwise and callers fall back to the single-device path.

The full CG loop runs inside ONE shard_map (pcg_tg_sharded) with
ownership-disjoint psum dot products and a slab-local block-Jacobi
preconditioner built from the FULL operator's nodal blocks (so interface
blocks are complete, not slab-truncated). pcg_tg_sharded is the
minimal-preconditioning form; the PRODUCTION distributed unstructured
solve couples this operator with the distributed lattice-MG V-cycle in
femx.parallel.tg_lattice (~20x fewer iterations, reachable via
SolidReactionAnalysis(devices=N)).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.elements import tet10_soa as soa_k
from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT, material_matrix


@dataclasses.dataclass
class ShardedTGOperator:
    """Host-built sharded operator data (stacked along the device axis)."""

    mesh: Mesh
    axis: str
    ndev: int
    n_nodes: int  # physical mesh nodes
    Nl: int  # owned nodes per device (padded)
    G: int  # ghost slots per device (padded)
    S: int  # interface send slots per direction (padded)
    E_max: int  # elements per device (padded)
    dtype: np.dtype

    # stacked device data
    dNg_st: jnp.ndarray  # (ndev, 4, 3, 10, E_max)
    wdet_st: jnp.ndarray  # (ndev, 4, E_max)
    C6: np.ndarray  # (6, 6)
    weight: float
    conn_loc_st: jnp.ndarray  # (ndev, 10, E_max) local node ids
    ell_idx_st: jnp.ndarray  # (ndev, Nl + G, D) rows into fe3 (pad -> zero row)
    send_up_st: jnp.ndarray  # (ndev, S) owned local ids requested by d+1
    send_dn_st: jnp.ndarray  # (ndev, S) owned local ids requested by d-1
    g_dn: int  # ghost slots filled from d-1 (first g_dn of ghost block)
    mask_st: jnp.ndarray  # (ndev, Nl, 3) free mask on owned nodes
    binv_st: jnp.ndarray  # (ndev, Nl, 3, 3) block-Jacobi inverses (owned)

    # host-side layout
    zperm: np.ndarray  # rank -> original node id
    rank_of: np.ndarray  # original node id -> rank
    bounds: np.ndarray  # (ndev + 1,) rank interval owned by each device

    @classmethod
    def from_mesh(cls, points, conn, E_mod, nu, mesh: Mesh, axis: str = "z",
                  weight: float = None, dtype=np.float32,
                  free_mask_global: Optional[np.ndarray] = None,
                  rank_bounds: Optional[np.ndarray] = None):
        """rank_bounds: optional (ndev+1,) nondecreasing rank boundaries
        (bounds[0]=0, bounds[-1]=N): device d owns z-sorted ranks
        [bounds[d], bounds[d+1]). Default: equal-count slabs. A custom
        partition lets callers align mesh slabs with an auxiliary
        structured lattice (femx.parallel.tg_lattice)."""
        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        points = np.asarray(points, dtype=np.float64)
        conn = np.asarray(conn)
        N, E = len(points), len(conn)
        ndev = mesh.shape[axis]
        dt = np.dtype(dtype)

        # ---- z-sorted slab ownership ----------------------------------
        zperm = np.argsort(points[:, 2], kind="stable")  # rank -> node
        rank_of = np.argsort(zperm, kind="stable")  # node -> rank
        if rank_bounds is None:
            Nl = -(-N // ndev)  # ceil
            bounds = np.minimum(np.arange(ndev + 1) * Nl, N)
        else:
            bounds = np.asarray(rank_bounds, dtype=np.int64)
            # public-API validation must survive python -O (asserts vanish)
            if not (bounds.shape == (ndev + 1,) and bounds[0] == 0
                    and bounds[-1] == N and (np.diff(bounds) >= 0).all()):
                raise ValueError(
                    f"rank_bounds must be a nondecreasing ({ndev + 1},) "
                    f"array from 0 to {N}, got {bounds!r}")
            Nl = max(1, int(np.diff(bounds).max()))
        owner_node = np.clip(
            np.searchsorted(bounds, rank_of, side="right") - 1, 0, ndev - 1)
        ranks_e = rank_of[conn]  # (E, 10)
        owner_e = owner_node[conn].min(axis=1)
        span = owner_node[conn].max(axis=1) - owner_e
        if span.max() > 1:
            raise ValueError(
                f"{int((span > 1).sum())} elements span >2 z-slabs over "
                f"{ndev} devices — slab thickness below element z-extent")

        # ---- per-device element lists + ghosts ------------------------
        elems = [np.where(owner_e == d)[0] for d in range(ndev)]
        E_max = max(1, max(len(e) for e in elems))
        lo = bounds[:-1]
        hi = bounds[1:]
        ghosts: List[np.ndarray] = []
        for d in range(ndev):
            r = ranks_e[elems[d]].reshape(-1)
            gh = np.unique(r[(r < lo[d]) | (r >= hi[d])])
            nb_lo = lo[d - 1] if d > 0 else 0
            nb_hi = hi[d + 1] if d + 1 < ndev else N
            assert ((gh >= nb_lo) & (gh < nb_hi)).all()
            # order: [from d-1 (ascending) | from d+1 (ascending)] so a
            # neighbor's send concatenates straight into the slot block
            ghosts.append(np.concatenate([gh[gh < lo[d]], gh[gh >= hi[d]]]))
        g_dn_each = [int((g < lo[d]).sum()) for d, g in enumerate(ghosts)]
        g_dn = max([0] + g_dn_each)
        g_up = max([0] + [len(g) - gd for g, gd in zip(ghosts, g_dn_each)])
        G = g_dn + g_up
        S = max(1, g_dn, g_up)

        # local index of a global rank on device d
        def local_ids(d, r):
            out = np.where((r >= lo[d]) & (r < hi[d]), r - lo[d], 0)
            gh = ghosts[d]
            gd = g_dn_each[d]
            # ghost slots: down block packed at [Nl, Nl+gd), up block at
            # [Nl+g_dn, ...) so the down/up blocks are uniform across devices
            pos = np.searchsorted(gh, r)
            pos = np.clip(pos, 0, len(gh) - 1)
            is_ghost = (r < lo[d]) | (r >= hi[d])
            slot = np.where(pos < gd, Nl + pos, Nl + g_dn + (pos - gd))
            return np.where(is_ghost, slot, out)

        # ---- element geometry (SoA), sliced+stacked per device --------
        coords = soa_k.coords_soa(points, conn, dt)  # (10, 3, E) or similar
        from femx.config import host_compute

        with host_compute():
            dNg, wdet, _detJ = jax.jit(soa_k.geometry)(jnp.asarray(coords))
            dNg = np.asarray(dNg)
            wdet = np.asarray(wdet)
        dNg_st = np.zeros((ndev,) + dNg.shape[:-1] + (E_max,), dtype=dt)
        wdet_st = np.zeros((ndev,) + wdet.shape[:-1] + (E_max,), dtype=dt)
        conn_loc = np.zeros((ndev, 10, E_max), dtype=np.int32)
        for d in range(ndev):
            e = elems[d]
            dNg_st[d, ..., :len(e)] = dNg[..., e]
            wdet_st[d, ..., :len(e)] = wdet[..., e]  # padding wdet=0 => fe=0
            conn_loc[d, :, :len(e)] = local_ids(d, ranks_e[e].T)

        # ---- ELL transpose table (local node -> fe3 rows) -------------
        n_loc = Nl + G
        counts = np.zeros((ndev, n_loc), dtype=np.int64)
        for d in range(ndev):
            np.add.at(counts[d], conn_loc[d][:, :len(elems[d])].reshape(-1), 1)
        D = max(1, int(counts.max()))
        zero_row = 10 * E_max  # fe3 gets one appended zero row
        ell = np.full((ndev, n_loc, D), zero_row, dtype=np.int32)
        for d in range(ndev):
            e_cnt = len(elems[d])
            node_of_row = conn_loc[d].reshape(-1).copy()  # row = s*E_max + e
            rows = np.arange(10 * E_max)
            valid = (rows % E_max) < e_cnt
            node_of_row = node_of_row[valid]
            rows = rows[valid]
            order = np.argsort(node_of_row, kind="stable")
            starts = np.zeros(n_loc + 1, dtype=np.int64)
            np.cumsum(np.bincount(node_of_row, minlength=n_loc),
                      out=starts[1:])
            pos = np.arange(len(order)) - starts[node_of_row[order]]
            ell[d, node_of_row[order], pos] = rows[order]

        # ---- send lists (symmetric to the neighbors' ghost blocks) ----
        send_up = np.zeros((ndev, S), dtype=np.int32)
        send_dn = np.zeros((ndev, S), dtype=np.int32)
        n_up = np.zeros(ndev, dtype=np.int64)
        n_dn = np.zeros(ndev, dtype=np.int64)
        for d in range(ndev):
            if d + 1 < ndev:  # what does d+1 need from me (its down block)?
                need = ghosts[d + 1][:g_dn_each[d + 1]]
                assert ((need >= lo[d]) & (need < hi[d])).all()
                send_up[d, :len(need)] = need - lo[d]
                n_up[d] = len(need)
            if d - 1 >= 0:  # what does d-1 need from me (its up block)?
                gh = ghosts[d - 1]
                need = gh[g_dn_each[d - 1]:]
                assert ((need >= lo[d]) & (need < hi[d])).all()
                send_dn[d, :len(need)] = need - lo[d]
                n_dn[d] = len(need)

        # ---- mask + block-Jacobi (full-operator nodal blocks) ----------
        if free_mask_global is None:
            free_mask_global = np.ones(3 * N)
        mask3 = np.asarray(free_mask_global, dtype=np.float64).reshape(N, 3)
        mask_rank = mask3[zperm]  # (N, 3) in rank order
        mask_st = np.zeros((ndev, Nl, 3), dtype=dt)
        bd = cls._nodal_blocks(points, conn, dNg, wdet, float(E_mod),
                               float(nu), float(weight))  # (N,3,3) node order
        bd_rank = bd[zperm]
        from femx.assembly_structured import constrained_block_inverse

        binv_st = np.zeros((ndev, Nl, 3, 3), dtype=dt)
        for d in range(ndev):
            n_own = min(hi[d], N) - lo[d]
            if n_own <= 0:
                binv_st[d, :, :, :] = np.eye(3, dtype=dt)
                continue
            mask_st[d, :n_own] = mask_rank[lo[d]:lo[d] + n_own]
            m = mask_rank[lo[d]:lo[d] + n_own]
            binv_st[d, :n_own] = constrained_block_inverse(
                bd_rank[lo[d]:lo[d] + n_own], m)
            binv_st[d, n_own:] = np.eye(3, dtype=dt)  # phantom padding nodes

        C6 = np.asarray(material_matrix(float(E_mod), float(nu),
                                        dtype=jnp.float64)).astype(dt)
        return cls(
            mesh=mesh, axis=axis, ndev=ndev, n_nodes=N, Nl=Nl, G=G, S=S,
            E_max=E_max, dtype=dt,
            dNg_st=jnp.asarray(dNg_st), wdet_st=jnp.asarray(wdet_st),
            C6=C6, weight=float(weight),
            conn_loc_st=jnp.asarray(conn_loc),
            ell_idx_st=jnp.asarray(ell),
            send_up_st=jnp.asarray(send_up), send_dn_st=jnp.asarray(send_dn),
            g_dn=g_dn,
            mask_st=jnp.asarray(mask_st), binv_st=jnp.asarray(binv_st),
            zperm=zperm, rank_of=rank_of, bounds=np.asarray(bounds),
        )

    @staticmethod
    def _nodal_blocks(points, conn, dNg, wdet, E_mod, nu, weight):
        """(N, 3, 3) nodal diagonal blocks of K, host numpy."""
        C6 = np.asarray(material_matrix(E_mod, nu, dtype=jnp.float64))
        from femx.elements.tet10 import _SEL

        chat = np.einsum("ack,ab,bdl->ckdl", _SEL, C6, _SEL)
        # dNg is (4, 3, 10, E); bke[e,n,c,d] = sum_g w*wdet dNg[g,k,n,e] ...
        bke = np.einsum("gkne,ckdl,glne,ge->encd",
                        np.asarray(dNg, dtype=np.float64),
                        chat,
                        np.asarray(dNg, dtype=np.float64),
                        weight * np.asarray(wdet, dtype=np.float64))
        out = np.zeros((len(points), 3, 3))
        np.add.at(out, np.asarray(conn), bke)
        return out

    # ---- host layout conversion ---------------------------------------
    def scatter(self, v_global: np.ndarray) -> np.ndarray:
        """(3N,) mesh-order vector -> (ndev, Nl, 3) owned-stacked."""
        v3 = np.asarray(v_global).reshape(self.n_nodes, 3)[self.zperm]
        out = np.zeros((self.ndev, self.Nl, 3), dtype=v3.dtype)
        for d in range(self.ndev):
            n_own = self.bounds[d + 1] - self.bounds[d]
            out[d, :n_own] = v3[self.bounds[d]:self.bounds[d + 1]]
        return out

    def gather(self, v_st: np.ndarray) -> np.ndarray:
        v_st = np.asarray(v_st)
        v3 = np.empty((self.n_nodes, 3), dtype=v_st.dtype)
        for d in range(self.ndev):
            n_own = self.bounds[d + 1] - self.bounds[d]
            v3[self.bounds[d]:self.bounds[d + 1]] = v_st[d, :n_own]
        out = np.empty_like(v3)
        out[self.zperm] = v3
        return out.reshape(-1)

    # ---- kernel-side math (inside shard_map; *_loc args are per-device) --
    def _ghost_sync(self, u_own, send_up, send_dn):
        """(Nl, 3) owned -> (Nl + G, 3) with ghost slots filled."""
        if self.ndev == 1:
            return jnp.concatenate(
                [u_own, jnp.zeros((self.G, 3), u_own.dtype)])
        ax = self.axis
        up = u_own[send_up]  # (S, 3) for d+1's down block
        dn = u_own[send_dn]  # (S, 3) for d-1's up block
        rec_dn = jax.lax.ppermute(  # from d-1
            up, ax, [(d, d + 1) for d in range(self.ndev - 1)])
        rec_up = jax.lax.ppermute(  # from d+1
            dn, ax, [(d, d - 1) for d in range(1, self.ndev)])
        return jnp.concatenate([
            u_own,
            rec_dn[:self.g_dn],
            rec_up[:self.G - self.g_dn],
        ])

    def _apply_local(self, u_own, dNg, wdet, conn_loc, ell_idx,
                     send_up, send_dn):
        """Owned (Nl, 3) -> owned (Nl, 3) = (K u) rows I own."""
        u_loc = self._ghost_sync(u_own, send_up, send_dn)  # (Nl+G, 3)
        ue3 = u_loc[conn_loc]  # (10, E_max, 3)
        ue = jnp.moveaxis(ue3, 2, 1).reshape(30, self.E_max)
        fe = soa_k.apply_element_forces(dNg, wdet, self.C6, ue, self.weight)
        fe3 = jnp.moveaxis(fe.reshape(10, 3, self.E_max), 1, 2)
        fe3 = fe3.reshape(10 * self.E_max, 3)
        fe3 = jnp.concatenate(
            [fe3, jnp.zeros((1, 3), fe3.dtype)])  # ELL pad row
        y_loc = fe3[ell_idx].sum(axis=1)  # (Nl+G, 3)
        if self.ndev == 1:
            return y_loc[:self.Nl]
        # halo-reduce: ghost contributions back to their owners
        ax = self.axis
        pad = jnp.zeros((self.S, 3), y_loc.dtype)
        dn_block = jnp.concatenate(
            [y_loc[self.Nl:self.Nl + self.g_dn], pad])[:self.S]
        up_block = jnp.concatenate(
            [y_loc[self.Nl + self.g_dn:self.Nl + self.G], pad])[:self.S]
        rec_from_up = jax.lax.ppermute(  # d+1's down block -> me
            dn_block, ax, [(d, d - 1) for d in range(1, self.ndev)])
        rec_from_dn = jax.lax.ppermute(  # d-1's up block -> me
            up_block, ax, [(d, d + 1) for d in range(self.ndev - 1)])
        y = y_loc[:self.Nl]
        y = y.at[send_up].add(rec_from_up)
        y = y.at[send_dn].add(rec_from_dn)
        return y

    def _apply_constrained_local(self, u_own, mask, *data):
        v = self._apply_local(u_own * mask, *data) * mask
        return v + u_own * (1.0 - mask)


def pcg_tg_sharded(
    op: ShardedTGOperator,
    f_global: np.ndarray,
    tol: float = 1e-8,
    maxiter: int = 10000,
    x0_global: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int, float, bool]:
    """Block-Jacobi PCG on the sharded TG operator: full loop inside ONE
    shard_map; per iteration 4 interface-sized ppermutes + 3 scalar psums.

    Returns (x_global, iterations, residual_norm, converged)."""
    dt = op.dtype
    f_st = jnp.asarray(op.scatter(np.asarray(f_global)).astype(dt))
    x0_st = (jnp.zeros_like(f_st) if x0_global is None
             else jnp.asarray(op.scatter(np.asarray(x0_global)).astype(dt)))
    ax = op.axis

    def kernel(f_b, x0_b, mask_b, binv_b, dNg_b, wdet_b, conn_b, ell_b,
               su_b, sd_b):
        f, x, mask, binv = f_b[0], x0_b[0], mask_b[0], binv_b[0]
        data = (dNg_b[0], wdet_b[0], conn_b[0], ell_b[0], su_b[0], sd_b[0])

        def A(v):
            return op._apply_constrained_local(v, mask, *data)

        def minv(r):
            return jnp.einsum("ncd,nd->nc", binv, r)

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), ax)

        bnorm = jnp.sqrt(dot(f, f))
        bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
        atol2 = (tol * bnorm_safe) ** 2
        r = f - A(x)
        z = minv(r)
        p = z
        rz = dot(r, z)

        def cond(st):
            _x, r, _p, _z, rz, k = st
            rr = dot(r, r)
            return jnp.isfinite(rr) & (rz > 0) & (rr > atol2) & (k < maxiter)

        def body(st):
            x, r, p, z, rz, k = st
            Ap = A(p)
            pAp = dot(p, Ap)
            alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = minv(r)
            rz_new = dot(r, z)
            beta = jnp.where(rz > 0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, z, rz_new, k + 1)

        x, r, p, z, rz, k = jax.lax.while_loop(
            cond, body, (x, r, p, z, rz, jnp.array(0)))
        res = jnp.sqrt(dot(r, r)) / bnorm_safe
        return x[None], k, res

    spec = P(ax)
    fn = jax.shard_map(
        kernel, mesh=op.mesh,
        in_specs=(spec,) * 10, out_specs=(spec, P(), P()))
    x_st, k, res = jax.jit(fn)(
        f_st, x0_st, op.mask_st, op.binv_st, op.dNg_st, op.wdet_st,
        op.conn_loc_st, op.ell_idx_st, op.send_up_st, op.send_dn_st)
    return op.gather(np.asarray(x_st)), int(k), float(res), bool(res <= tol)
