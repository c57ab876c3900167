"""Structured-lattice multigrid preconditioning for UNSTRUCTURED meshes.

The TPU answer to algebraic multigrid: instead of building AMG hierarchies
(irregular gather/scatter at every level — exactly what TPU punishes), embed
the unstructured mesh in an auxiliary structured lattice, run femx's
gather-free geometric V-cycle there, and couple the two with trilinear
transfer operators:

    M^-1 = D^-1 + omega_c * P Mg P^T        (additive two-level, mode="add")

or, multiplicatively (mode="mult"/"mult_sym", the stronger coupling — the
additive sum lets the two corrections fight over the mid-frequency error
they both see, while the multiplicative form applies the smoother only to
the residual LEFT by the coarse correction):

    mode="mult"     z = C r;  z += omega * D^-1 (r - A z)
                    (one extra A-apply; mildly nonsymmetric -> use
                    femx.solve.cg.fcg, which is robust to it)
    mode="mult_sym" z = omega*D^-1 r; z += C (r - A z);
                    z += omega*D^-1 (r - A z)
                    (two extra A-applies; SPD whenever
                    rho(omega * D^-1 A) < 2, so plain CG applies)

  D^-1   nodal block-Jacobi of the unstructured operator (captures local
         stiffness / boundary detail the lattice cannot see)
  P      trilinear interpolation lattice -> mesh nodes (each mesh node sits
         in one half-grid cell; its 8 support corners are one node of EACH
         parity phase, so P decomposes into 8 per-phase row gathers)
  P^T    exact transpose (keeps M^-1 symmetric so plain CG applies),
         applied as a padded-ELL weighted transpose gather — no scatters
  Mg     femx.solve.multigrid.StructuredMultigrid on the lattice operator,
         with lattice nodes outside the mesh (and those carrying the
         problem's Dirichlet constraints) masked fixed

Both M^-1 terms are SPSD and D^-1 is SPD on free DOFs, so M^-1 is SPD and
CG convergence theory applies. Effectiveness depends on the lattice
resolving the mesh (node spacing ~ element size); the auto heuristic
matches the lattice CELL spacing to the median per-element MINIMUM corner
edge length (the doubled-lattice node pitch is then half of that — the
quadratic-node spacing, so on grid-like meshes lattice nodes coincide
with mesh nodes and the trilinear transfers degenerate to injection).

Reference context: the reference solves arbitrary gmsh meshes with SuperLU
(ReactionSolver.py:201) — impossible at 1M DOF. femx's block-Jacobi PCG
needs O(1000) iterations there; this preconditioner cuts that by roughly
an order of magnitude while every hot op stays gather-light (measured row
gathers only).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from femx.assembly_structured import StructuredSolidOperator
from femx.solve.multigrid import StructuredMultigrid


def _even_cells(n: float) -> int:
    """Round a cell-count estimate to an even count >= 2 (MG-friendly)."""
    return max(2, int(2 * round(float(n) / 2.0)))


def build_lattice_activity_mask(pts, mu, lo, half_h, gs) -> np.ndarray:
    """(Px, Py, Pz, 3) free-mask for the auxiliary lattice.

    Activate EXACTLY the support of P restricted to free mesh DOFs:
    component c of a lattice corner is active iff some free mesh DOF
    (n, c) interpolates from it with nonzero trilinear weight. A
    superset (an earlier revision dilated to the 27-neighborhood of
    every snapped mesh node) is actively HARMFUL, not just wasteful:
    unsupported lattice DOFs couple through the lattice stiffness and
    soften the coarse correction on range(P^T) — measured to DOUBLE
    outer PCG iterations (76 vs 35 on the 8k-DOF diagnostic, with an
    EXACT lattice inverse either way, i.e. the mask rule — not
    V-cycle accuracy — was the entire gap).

    Dirichlet: a mesh node with component c fixed fixes component c of
    the corners that actually support it (w > 0; boundary nodes lie
    exactly on lattice planes, so half their corners carry w = 0 and
    must NOT be fixed — fixing them kills the correction in the first
    half-cell layer above the boundary). Overrides support activation.
    """
    gs = tuple(int(g) for g in gs)
    mask_l = np.zeros((gs[0], gs[1], gs[2], 3))
    t = (np.asarray(pts) - np.asarray(lo)[None, :]) / np.asarray(half_h)[None, :]
    i0 = np.clip(np.floor(t).astype(np.int64), 0, np.asarray(gs) - 2)
    fr = np.clip(t - i0, 0.0, 1.0)
    for keep in (True, False):  # activate free support, then fix Dirichlet
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    q = i0 + np.array([dx, dy, dz])
                    w = ((fr[:, 0] if dx else 1.0 - fr[:, 0])
                         * (fr[:, 1] if dy else 1.0 - fr[:, 1])
                         * (fr[:, 2] if dz else 1.0 - fr[:, 2]))
                    sup = w > 1e-12
                    for c in range(3):
                        sel = sup & ((mu[:, c] > 0.5) if keep
                                     else (mu[:, c] < 0.5))
                        mask_l[q[sel, 0], q[sel, 1], q[sel, 2], c] = (
                            1.0 if keep else 0.0)
    return mask_l


@dataclasses.dataclass
class LatticeTransfer:
    """Trilinear P (lattice internal layout <-> mesh nodes) as gather data.

    Forward (interpolate): u3[i, c] = sum_p w[p, i] * latt_phase_p[c, idx[p, i]]
    Transpose: per phase, DEGREE-BUCKETED dense row gathers (the TG
    operator's transpose recipe, assembly_tg.py): lattice nodes grouped by
    incidence count d get one (n_d, d) gather + sum with ZERO padding
    waste, then one (cnt_p,)-row gather reorders bucket output back to
    phase order. The previous padded-ELL formulation gathered
    cnt_p * max_d rows — measured 50 ms of the 97 ms unstructured
    iteration at 1.39M DOF (vs ~13 ms bucketed: row-gather cost is
    per-index, and ELL padding was >4x the real entries).
    """

    idx: jnp.ndarray  # (8, N) int32 — per-phase flat node index within phase
    w: jnp.ndarray  # (8, N) weights
    bucket_idx: List[List[jnp.ndarray]]  # per phase: [(n_d, d) mesh rows]
    bucket_w: List[List[jnp.ndarray]]  # per phase: [(n_d, d) weights]
    perm_back: List[jnp.ndarray]  # per phase (cnt_p,) bucket-order -> phase
    phase_counts: Tuple[int, ...]  # nodes per phase (internal layout order)

    def interpolate(self, e_int: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
        """Lattice internal vector -> (3*n_nodes,) mesh-node vector."""
        pos = 0
        out = 0.0
        for p, cnt in enumerate(self.phase_counts):
            g = e_int[pos : pos + 3 * cnt].reshape(3, cnt).T  # (cnt, 3) rows
            vals = g[self.idx[p]]  # (N, 3) row gather
            out = out + self.w[p][:, None] * vals
            pos += 3 * cnt
        return out.reshape(-1)

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        """(3*n_nodes,) mesh vector -> lattice internal vector (exact P^T)."""
        r3 = r.reshape(-1, 3)
        parts = []
        for p, cnt in enumerate(self.phase_counts):
            chunks = []
            for bi, bw in zip(self.bucket_idx[p], self.bucket_w[p]):
                if bi.shape[1] == 0:
                    chunks.append(jnp.zeros((bi.shape[0], 3), dtype=r3.dtype))
                else:
                    # (n_d, d, 3) row gather, weighted sum over incidences
                    chunks.append(
                        (bw[..., None].astype(r3.dtype) * r3[bi]).sum(axis=1))
            sorted_out = jnp.concatenate(chunks)  # (cnt, 3) in bucket order
            parts.append(sorted_out[self.perm_back[p]].T.reshape(-1))
        return jnp.concatenate(parts)


@dataclasses.dataclass
class LatticeTransferPruned:
    """Zero-weight-pruned trilinear transfer (the grid-matched fast path).

    When the auto pitch heuristic grid-matches the mesh (the default, and
    exactly the case for Kuhn-subdivided boxes), mesh nodes COINCIDE with
    doubled-lattice nodes: one of the 8 trilinear weights is 1 and the rest
    are EXACT ZEROS (boundary nodes on lattice planes likewise zero half
    their corners). The dense LatticeTransfer still gathers all 8
    incidences both ways — 8N rows per direction, pure waste on coincident
    nodes, and XLA gather cost is per ROW (~4.3 ns, width-invariant). This
    variant keeps only w > eps incidences, degree-bucketed on BOTH sides
    (mesh nodes by kept-corner count for interpolate; lattice nodes by
    kept-incidence count for restrict), plus one rank-permutation row
    gather per direction to restore output order. Kept weights are
    renormalized per mesh node (constants interpolate exactly); the SAME
    kept set drives both directions, so restrict stays the exact adjoint
    of interpolate and the preconditioner stays SPD.

    Row counts per direction: sum(d) + N vs the dense 8N — 4.3x fewer at
    the 1.39M-DOF flagship (2.0N vs 8N asymptotically on fully coincident
    interiors, where only the perm gather remains next to the 1-wide
    bucket).
    """

    # interpolate side: mesh nodes bucketed by kept-corner count
    n_idx: List[jnp.ndarray]  # per degree (n_d, d) rows into the (L, 3) cat
    n_w: List[jnp.ndarray]  # per degree (n_d, d)
    node_rank: jnp.ndarray  # (N,) node -> bucket-concat position
    # restrict side: cat-lattice rows bucketed by kept-incidence count
    l_idx: List[jnp.ndarray]  # per degree (n_d, d) mesh-node rows
    l_w: List[jnp.ndarray]
    lat_rank: jnp.ndarray  # (L,) cat row -> bucket-concat position
    phase_counts: Tuple[int, ...]

    def _cat3(self, e_int: jnp.ndarray) -> jnp.ndarray:
        """Internal per-phase (3, cnt) blocks -> one (L, 3) row view."""
        pos, rows = 0, []
        for cnt in self.phase_counts:
            rows.append(e_int[pos:pos + 3 * cnt].reshape(3, cnt).T)
            pos += 3 * cnt
        return jnp.concatenate(rows)

    def interpolate(self, e_int: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
        cat = self._cat3(e_int)
        parts = []
        for bi, bw in zip(self.n_idx, self.n_w):
            if bi.shape[1] == 0:
                parts.append(jnp.zeros((bi.shape[0], 3), dtype=cat.dtype))
            else:
                parts.append(
                    (bw[..., None].astype(cat.dtype) * cat[bi]).sum(axis=1))
        out = jnp.concatenate(parts)  # (N, 3) bucket order
        return out[self.node_rank].reshape(-1)

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        r3 = r.reshape(-1, 3)
        parts = []
        for bi, bw in zip(self.l_idx, self.l_w):
            if bi.shape[1] == 0:
                parts.append(jnp.zeros((bi.shape[0], 3), dtype=r3.dtype))
            else:
                parts.append(
                    (bw[..., None].astype(r3.dtype) * r3[bi]).sum(axis=1))
        cat = jnp.concatenate(parts)[self.lat_rank]  # (L, 3) cat order
        out, pos = [], 0
        for cnt in self.phase_counts:
            out.append(cat[pos:pos + cnt].T.reshape(-1))
            pos += cnt
        return jnp.concatenate(out)

    def kept_incidences(self) -> int:
        return sum(int(b.shape[0]) * int(b.shape[1]) for b in self.n_idx)


def build_lattice_transfer_pruned(
    points: np.ndarray,
    origin: np.ndarray,
    half_h: np.ndarray,
    grid_shape: Tuple[int, int, int],
    dtype=np.float64,
    eps: float = 1e-6,
) -> LatticeTransferPruned:
    """Host-side pruned-transfer construction (see LatticeTransferPruned)."""
    pts = np.asarray(points, dtype=np.float64)
    P_ = np.asarray(grid_shape)
    t = (pts - origin[None, :]) / half_h[None, :]
    i0 = np.clip(np.floor(t).astype(np.int64), 0, P_[None, :] - 2)
    f = np.clip(t - i0, 0.0, 1.0)
    N = len(pts)

    n_phase_nodes = []
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                s = [(P_[a] + 1 - p) // 2 for a, p in enumerate((px, py, pz))]
                n_phase_nodes.append(s[0] * s[1] * s[2])
    off = np.concatenate([[0], np.cumsum(n_phase_nodes)])
    L = int(off[-1])

    # Node-major (N, 8) layout throughout: per-corner columns are written
    # contiguously (no (8, N) scatter), and every later sort/gather walks
    # contiguous rows — measured 17.2 s -> ~2 s at 464k nodes vs the
    # previous phase-major build (whose transposed take_along_axis views
    # alone cost 5.4 s).
    off8 = off[:8]
    G = np.empty((N, 8), dtype=np.int64)  # global row in the (L, 3) cat view
    w = np.empty((N, 8))
    s = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                gx, gy, gz = i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                p = (gx % 2) * 4 + (gy % 2) * 2 + (gz % 2)
                wx = f[:, 0] if dx else 1.0 - f[:, 0]
                wy = f[:, 1] if dy else 1.0 - f[:, 1]
                wz = f[:, 2] if dz else 1.0 - f[:, 2]
                py_ = (P_[1] + 1 - (gy % 2)) // 2
                pz_ = (P_[2] + 1 - (gz % 2)) // 2
                flat = ((gx // 2) * py_ + (gy // 2)) * pz_ + (gz // 2)
                G[:, s] = off8[p] + flat
                w[:, s] = wx * wy * wz
                s += 1

    dt = np.dtype(dtype)
    m = w > eps
    w_n = np.where(m, w, 0.0)
    w_n /= w_n.sum(axis=1)[:, None]  # renormalize kept weights per node

    # -- interpolate buckets: nodes by kept-corner count ------------------
    order8 = np.argsort(~m, axis=1, kind="stable")  # kept entries first
    rowsel = np.arange(N)[:, None] * 8 + order8
    g_c = G.reshape(-1)[rowsel]
    w_c = w_n.reshape(-1)[rowsel]
    d_node = m.sum(axis=1)
    order_nodes = np.argsort(d_node, kind="stable")
    node_rank = np.argsort(order_nodes, kind="stable")
    n_idx, n_w = [], []
    pos = 0
    for d in np.unique(d_node):
        n_d = int((d_node == d).sum())
        d = int(d)
        sel = order_nodes[pos:pos + n_d]
        n_idx.append(jnp.asarray(g_c[sel, :d].astype(np.int32)))
        n_w.append(jnp.asarray(w_c[sel, :d].astype(dt)))
        pos += n_d

    # -- restrict buckets: lattice cat rows by kept-incidence count -------
    n_inc = np.nonzero(m)[0]  # incidence list, node-major order (the
    # within-row incidence order only permutes float-sum rounding)
    dst = G[m]
    wgt = w_n[m]
    counts = np.bincount(dst, minlength=L)
    lat_rank = np.argsort(np.argsort(counts, kind="stable"), kind="stable")
    order_inc = np.argsort(lat_rank[dst], kind="stable")
    counts_sorted = np.sort(counts, kind="stable")
    l_idx, l_w = [], []
    pos = 0
    for d in np.unique(counts_sorted):
        n_d = int((counts_sorted == d).sum())
        d = int(d)
        if d == 0:
            l_idx.append(jnp.zeros((n_d, 0), dtype=jnp.int32))
            l_w.append(jnp.zeros((n_d, 0), dtype=dt))
        else:
            rows = order_inc[pos:pos + n_d * d].reshape(n_d, d)
            l_idx.append(jnp.asarray(n_inc[rows].astype(np.int32)))
            l_w.append(jnp.asarray(wgt[rows].astype(dt)))
            pos += n_d * d
    assert pos == len(order_inc)

    return LatticeTransferPruned(
        n_idx=n_idx, n_w=n_w,
        node_rank=jnp.asarray(node_rank.astype(np.int32)),
        l_idx=l_idx, l_w=l_w,
        lat_rank=jnp.asarray(lat_rank.astype(np.int32)),
        phase_counts=tuple(n_phase_nodes),
    )


def build_lattice_transfer(
    points: np.ndarray,
    origin: np.ndarray,
    half_h: np.ndarray,
    grid_shape: Tuple[int, int, int],
    dtype=np.float64,
) -> LatticeTransfer:
    """Host-side construction of the trilinear transfer.

    The lattice's node grid is `grid_shape` points at spacing `half_h`
    (the structured operator's doubled lattice). Each mesh point gets the
    8 surrounding half-grid nodes; corner (dx,dy,dz) of its cell has parity
    ((ix+dx)%2, ...) — all 8 parities occur exactly once, giving one
    (index, weight) pair per phase per point.
    """
    pts = np.asarray(points, dtype=np.float64)
    P_ = np.asarray(grid_shape)
    t = (pts - origin[None, :]) / half_h[None, :]
    i0 = np.clip(np.floor(t).astype(np.int64), 0, P_[None, :] - 2)
    f = np.clip(t - i0, 0.0, 1.0)
    N = len(pts)

    n_phase_nodes = []
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                s = [(P_[a] + 1 - p) // 2 for a, p in enumerate((px, py, pz))]
                n_phase_nodes.append(s[0] * s[1] * s[2])

    idx = np.zeros((8, N), dtype=np.int64)
    w = np.zeros((8, N))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                gx, gy, gz = i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                p = (gx % 2) * 4 + (gy % 2) * 2 + (gz % 2)
                wx = f[:, 0] if dx else 1.0 - f[:, 0]
                wy = f[:, 1] if dy else 1.0 - f[:, 1]
                wz = f[:, 2] if dz else 1.0 - f[:, 2]
                # flat index within the phase subgrid (x-major raster, the
                # internal layout of StructuredSolidOperator phases)
                py_ = (P_[1] + 1 - (gy % 2)) // 2
                pz_ = (P_[2] + 1 - (gz % 2)) // 2
                flat = ((gx // 2) * py_ + (gy // 2)) * pz_ + (gz // 2)
                # every point hits each parity exactly once
                idx[p, np.arange(N)] = flat
                w[p, np.arange(N)] = wx * wy * wz

    # transpose structure: per phase, lattice nodes bucketed by incidence
    # count (degree) -> dense (n_d, d) gathers with zero padding waste
    dt = np.dtype(dtype)
    bucket_idx, bucket_w, perm_back = [], [], []
    for p in range(8):
        cnt = n_phase_nodes[p]
        order = np.argsort(idx[p], kind="stable")
        dst = idx[p][order]  # ascending lattice-node ids
        counts = np.bincount(dst, minlength=cnt)
        node_rank = np.argsort(np.argsort(counts, kind="stable"),
                               kind="stable")  # phase node -> bucket position
        # reorder incidences so equal-degree destination nodes are contiguous
        order_b = order[np.argsort(node_rank[dst], kind="stable")]
        counts_sorted = np.sort(counts, kind="stable")
        b_idx, b_w = [], []
        pos = 0
        for d in np.unique(counts_sorted):
            n_d = int((counts_sorted == d).sum())
            d = int(d)
            if d == 0:
                b_idx.append(jnp.zeros((n_d, 0), dtype=jnp.int32))
                b_w.append(jnp.zeros((n_d, 0), dtype=dt))
            else:
                rows = order_b[pos : pos + n_d * d].reshape(n_d, d)
                b_idx.append(jnp.asarray(rows.astype(np.int32)))
                b_w.append(jnp.asarray(w[p][rows].astype(dt)))
                pos += n_d * d
        bucket_idx.append(b_idx)
        bucket_w.append(b_w)
        perm_back.append(jnp.asarray(node_rank.astype(np.int32)))
    return LatticeTransfer(
        idx=jnp.asarray(idx.astype(np.int32)),
        w=jnp.asarray(w.astype(dt)),
        bucket_idx=bucket_idx,
        bucket_w=bucket_w,
        perm_back=perm_back,
        phase_counts=tuple(n_phase_nodes),
    )


class LatticePreconditioner:
    """Additive two-level preconditioner for unstructured solid operators.

    Usage:
        lp = LatticePreconditioner(points, conn, E, nu, free_mask_global)
        z = lp(r)      # r, z in the UNSTRUCTURED operator's dof layout
                       # (pass a node-order converter for TG's internal order)

    Registered as a JAX PYTREE: the MG hierarchy, transfer arrays, masks,
    and block-Jacobi data are all leaves, so jitted solves can take the
    preconditioner as an ARGUMENT (closing over it embeds O(100 MB) of
    constants in the compiled program — the remote-compile payload limit
    rejects that outright at 1M DOF, HTTP 413).
    """

    def __init__(
        self,
        points: np.ndarray,
        conn: np.ndarray,
        E: float,
        nu: float,
        free_mask_global: np.ndarray,
        block_jacobi_apply=None,
        cells_per_axis: Optional[Tuple[int, int, int]] = None,
        dtype=np.float64,
        coarse_weight: float = 1.0,
        node_perm: Optional[np.ndarray] = None,
        bj_fn=None,
        bj_data=None,
        mode: str = "add",
        op=None,
        omega: Optional[float] = None,
        n_cycles: int = 2,
        n_caller: Optional[int] = None,
    ):
        """
        Args:
          free_mask_global: (3N,) 1/0 in MESH node order.
          block_jacobi_apply: r -> D^-1 r closure in the CALLER's dof layout
            (convenience form; its captured arrays become jit constants).
            For jit-as-argument use, pass `bj_fn` (a capture-free function
            (bj_data, r) -> z, e.g. SolidOperatorSoA.apply_block_jacobi)
            plus `bj_data` (a pytree of arrays) instead.
          node_perm: new_of_old mesh-node relabeling if the caller's vectors
            are in a permuted node order (e.g. SolidOperatorTG internal);
            identity if None.
          mode: "add" (default), "mult", or "mult_sym" — see module
            docstring. The multiplicative modes need `op`.
          op: the unstructured operator (a registered pytree, e.g.
            SolidOperatorTG) whose `apply_constrained` evaluates A inside
            the multiplicative residual updates. Stays a pytree leaf so
            jitted solves can take the preconditioner as an argument.
          omega: damping for the block-Jacobi smoothing steps in the
            multiplicative modes. Required for "mult_sym" (SPD needs
            rho(omega*D^-1 A) < 2; use 1/estimate_bj_lambda_max(...)),
            defaults to 1.0 for "mult" (fcg tolerates it).
          n_caller: node count of the CALLER's vector layout when it is
            PADDED beyond the mesh (e.g. SolidOperatorGroupELL.n_pad).
            Inferring it from node_perm fails when the highest internal
            slot is a dummy node (max(node_perm)+1 < n_pad) — pass the
            operator's padded count explicitly. Default: inferred.
          n_cycles: lattice V-cycles per coarse correction (>1 buys a
            stronger correction for pure lattice-side cost — no
            unstructured gathers). Default 2: measured 44 -> 38 iterations
            at 8k DOF and 25 vs 37 at 56k (with the grid-matched lattice);
            SPD-safe since the exact-support activity mask keeps
            lambda_max(Mg A_latt) ~ 1.06 (the k-cycle composition
            Mg_k = Mg (2I - A Mg) ... stays SPD for lambda_max < 2).
        """
        pts = np.asarray(points, dtype=np.float64)
        conn = np.asarray(conn)
        self.n_nodes = len(pts)
        if bj_fn is None:
            if block_jacobi_apply is None:
                raise ValueError("provide block_jacobi_apply or (bj_fn, bj_data)")
            bj_fn = _call_closure
            bj_data = _Closure(block_jacobi_apply)
        self.bj_fn = bj_fn
        self.bj_data = bj_data
        self.coarse_weight = float(coarse_weight)
        if mode not in ("add", "mult", "mult_sym"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode != "add" and op is None:
            raise ValueError(f"mode={mode!r} needs the unstructured operator (op=)")
        self.mode = mode
        self.op = op
        self.omega = None if omega is None else jnp.asarray(
            omega, dtype=jnp.dtype(dtype))
        self.n_cycles = int(n_cycles)

        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        span = np.where(hi - lo > 0, hi - lo, 1.0)
        if cells_per_axis is None:
            # Match lattice CELL SPACING to the median of each element's
            # SHORTEST corner edge (the doubled-lattice node pitch is then
            # h_el/2, i.e. the quadratic-node spacing). The shortest edge —
            # not an arbitrary one — is the right pitch estimate: on
            # Kuhn-subdivided grids the corner edges are {h, h*sqrt(2),
            # h*sqrt(3)} and only min-edge recovers h. Measured at 56k DOF
            # (randomized labels): the grid-matched lattice this yields cuts
            # outer PCG 37 -> 25 iterations vs the previous median(edge01)
            # rule, and 33 -> 18 (2.66 s -> 1.60 s) at the 1.39M flagship.
            c4 = pts[conn[:, :4]]  # (n_el, 4, 3) corner coordinates
            pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
            edges = np.stack([np.linalg.norm(c4[:, a] - c4[:, b], axis=1)
                              for a, b in pairs], axis=1)
            h_el = np.median(edges.min(axis=1))
            cells_per_axis = tuple(
                _even_cells(span[a] / max(h_el, 1e-30)) for a in range(3)
            )
        self.n_cells = tuple(int(c) for c in cells_per_axis)
        spacing = tuple(span[a] / self.n_cells[a] for a in range(3))
        self.spacing = spacing

        op = StructuredSolidOperator.from_lattice(
            self.n_cells, spacing, E, nu, dtype=dtype
        )
        gs = op.grid_shape
        half_h = np.asarray(spacing) / 2.0

        mu = np.asarray(free_mask_global).reshape(self.n_nodes, 3)
        mask_l = build_lattice_activity_mask(pts, mu, lo, half_h, gs)

        self.mg = StructuredMultigrid(
            None, self.n_cells, E, nu, mask_l.reshape(-1),
            spacing=spacing, dtype=dtype,
            fine_op=op.with_free_mask(op.to_internal(mask_l.reshape(-1))),
        )

        # --- transfers ------------------------------------------------------
        if node_perm is not None:
            # INJECTIVE mesh->caller map: the caller layout may be LARGER
            # than the mesh (padded internal layouts, e.g. the group-ELL
            # operator pads nodes to whole 16-node column groups). Unmapped
            # caller slots are dummies: zero mask, so they contribute
            # nothing through restrict and get zeros from interpolate.
            npm = np.asarray(node_perm)
            n_cal = max(int(npm.max()) + 1, self.n_nodes,
                        0 if n_caller is None else int(n_caller))
            inv = np.zeros(n_cal, dtype=np.int64)
            have = np.zeros(n_cal, dtype=bool)
            inv[npm] = np.arange(len(npm))
            have[npm] = True
            pts_cal = pts[inv]  # caller's node i is mesh node inv[i]
            mu_cal = np.where(have[:, None], mu[inv], 0.0)
        else:
            n_cal = self.n_nodes
            pts_cal = pts
            mu_cal = mu
        self.n_cal = n_cal
        # Pruned transfer when enough trilinear weights are exact zeros to
        # pay for its two rank-permutation gathers (grid-matched lattices —
        # the auto default — are ~1 kept corner per node; fully generic
        # interior nodes keep all 8 and the dense form is cheaper).
        tp = build_lattice_transfer_pruned(pts_cal, lo, half_h, gs,
                                           dtype=dtype)
        if tp.kept_incidences() <= 4 * len(pts_cal):
            self.transfer = tp
        else:
            self.transfer = build_lattice_transfer(pts_cal, lo, half_h, gs,
                                                   dtype=dtype)
        self._mask_cal = jnp.asarray(mu_cal.reshape(-1), dtype=jnp.dtype(dtype))
        self._lat_mask = self.mg.fine_op.free_mask

    # -- application ---------------------------------------------------------
    def coarse_correct(self, r: jnp.ndarray) -> jnp.ndarray:
        """P Mg P^T r (caller layout in and out, constrained both sides)."""
        rm = r * self._mask_cal
        rl = self.transfer.restrict(rm) * self._lat_mask
        el = self.mg(rl) * self._lat_mask
        if self.n_cycles > 1:
            # extra V-cycles on the lattice residual equation (all
            # structured ops — no unstructured gathers)
            Al = self.mg.fine_op.apply_constrained
            for _ in range(self.n_cycles - 1):
                el = el + self.mg((rl - Al(el)) * self._lat_mask) * self._lat_mask
        return self.transfer.interpolate(el, self.n_cal) * self._mask_cal

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "add":
            return (self.bj_fn(self.bj_data, r)
                    + self.coarse_weight * self.coarse_correct(r))
        A = self.op.apply_constrained
        om = self.omega if self.omega is not None else 1.0
        if self.mode == "mult":
            z = self.coarse_correct(r)
            return z + om * self.bj_fn(self.bj_data, r - A(z))
        # mult_sym: damped BJ pre-smooth, coarse correction, BJ post-smooth
        z = om * self.bj_fn(self.bj_data, r)
        z = z + self.coarse_correct(r - A(z))
        return z + om * self.bj_fn(self.bj_data, r - A(z))


def estimate_bj_lambda_max(op, bj_fn, bj_data, iters: int = 20,
                           safety: float = 1.05) -> float:
    """Power-iteration estimate of lambda_max(D^-1 A) for smoother damping.

    D^-1 A is similar to the SPSD D^-1/2 A D^-1/2, so the dominant
    eigenvalue is real/positive and plain power iteration converges; the
    Rayleigh quotient underestimates slightly at finite iters, hence the
    `safety` factor. One compiled program, op/bj as pytree arguments
    (compile-cache friendly); iters * one apply each — ~1 s at the
    1.39M-DOF flagship.

    mode="mult_sym" is SPD iff rho(omega * D^-1 A) < 2; omega =
    1/lambda_max gives rho = 1 with margin.
    """
    n = op.ndof
    v0 = jnp.sin(jnp.arange(1, n + 1, dtype=op.dtype) * 0.73)
    lam = _power_bj(bj_fn, bj_data, op, v0, int(iters))
    return float(lam) * safety


@partial(jax.jit, static_argnums=(0, 4))
def _power_bj(bj_fn, bj_data, op, v0, iters):
    def step(_, v):
        w = bj_fn(bj_data, op.apply_constrained(v))
        return w / jnp.sqrt(jnp.vdot(w, w))

    v = jax.lax.fori_loop(0, iters, step, v0 / jnp.sqrt(jnp.vdot(v0, v0)))
    w = bj_fn(bj_data, op.apply_constrained(v))
    return jnp.real(jnp.vdot(v, w) / jnp.vdot(v, v))


class _Closure:
    """Opaque pytree-leaf-free wrapper for a legacy preconditioner closure
    (kept OUT of the leaves; its captures become jit constants)."""

    def __init__(self, fn):
        self.fn = fn

    def __hash__(self):
        return id(self.fn)

    def __eq__(self, other):
        return isinstance(other, _Closure) and other.fn is self.fn


def _call_closure(data: _Closure, r):
    return data.fn(r)


def _lp_flatten(lp: LatticePreconditioner):
    legacy = isinstance(lp.bj_data, _Closure)
    children = (lp.mg, lp.transfer, lp._mask_cal, lp._lat_mask,
                None if legacy else lp.bj_data, lp.op, lp.omega)
    aux = (lp.bj_fn, lp.bj_data if legacy else None, lp.coarse_weight,
           lp.n_nodes, lp.n_cells, lp.spacing, lp.mode, lp.n_cycles,
           lp.n_cal)
    return children, aux


def _lp_unflatten(aux, children):
    out = object.__new__(LatticePreconditioner)
    (out.mg, out.transfer, out._mask_cal, out._lat_mask, bj_data,
     out.op, out.omega) = children
    (out.bj_fn, legacy_data, out.coarse_weight, out.n_nodes, out.n_cells,
     out.spacing, out.mode, out.n_cycles, out.n_cal) = aux
    out.bj_data = legacy_data if legacy_data is not None else bj_data
    return out


def _transfer_flatten(t: LatticeTransfer):
    children = (t.idx, t.w,
                tuple(tuple(b) for b in t.bucket_idx),
                tuple(tuple(b) for b in t.bucket_w),
                tuple(t.perm_back))
    return children, (t.phase_counts,)


def _transfer_unflatten(aux, children):
    idx, w, bucket_idx, bucket_w, perm_back = children
    return LatticeTransfer(idx=idx, w=w,
                           bucket_idx=[list(b) for b in bucket_idx],
                           bucket_w=[list(b) for b in bucket_w],
                           perm_back=list(perm_back),
                           phase_counts=aux[0])


def _transfer_pruned_flatten(t: LatticeTransferPruned):
    children = (tuple(t.n_idx), tuple(t.n_w), t.node_rank,
                tuple(t.l_idx), tuple(t.l_w), t.lat_rank)
    return children, (t.phase_counts,)


def _transfer_pruned_unflatten(aux, children):
    n_idx, n_w, node_rank, l_idx, l_w, lat_rank = children
    return LatticeTransferPruned(
        n_idx=list(n_idx), n_w=list(n_w), node_rank=node_rank,
        l_idx=list(l_idx), l_w=list(l_w), lat_rank=lat_rank,
        phase_counts=aux[0])


jax.tree_util.register_pytree_node(
    LatticeTransfer, _transfer_flatten, _transfer_unflatten
)
jax.tree_util.register_pytree_node(
    LatticeTransferPruned, _transfer_pruned_flatten, _transfer_pruned_unflatten
)
jax.tree_util.register_pytree_node(
    LatticePreconditioner, _lp_flatten, _lp_unflatten
)
