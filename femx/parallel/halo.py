"""DOF-sharded structured solve: z-slab halo exchange over ICI.

The scaling mechanism SURVEY.md §5 calls "domain-decomposed distributed PCG"
— the structured-mesh analogue of context/sequence parallelism. Each device
owns a contiguous z-slab of the lattice (cells [d*nzl, (d+1)*nzl)); the
iterated CG state (x, r, p, z) lives SLAB-LOCAL, and one operator
application exchanges exactly TWO lattice planes with each neighbor over
ICI (`lax.ppermute`):

  1. halo-reduce UP: boundary-plane force contributions from the cells
     below the shared plane are sent to the plane's owner and added;
  2. ghost-sync DOWN: the completed owner value is copied back into the
     sender's ghost plane so subsequent elementwise ops stay consistent.

Communication per apply therefore scales with the slab SURFACE
(~4 phase planes of 3*Px*Py values), not the volume — unlike
parallel.structured.ShardedStructuredOperator, whose psum all-reduces a
full solution-sized vector per apply. Dot products are ownership-weighted
(`w` zeros the ghost plane so every DOF counts once) and psum'd, so every
device sees bit-identical scalars and `lax.while_loop` control flow stays
uniform across the mesh.

Local state layout: each device's flat vector is EXACTLY the internal
phase-major layout of a (nx, ny, nzl)-cell StructuredSolidOperator whose
pz=0 phases carry one extra z-plane (the ghost = the neighbor-up's first
plane; on the last device it is the real global boundary plane). The local
slab apply is therefore the unmodified single-device gather-free apply.

DistributedMultigrid runs the V-cycle on the same local vectors: smoothing
uses halo applies, z-restriction adds one plane-ppermute pair,
z-prolongation is fully local (the coarse ghost plane carries exactly what
the interpolation needs), and below a handoff level the (small) residual is
all_gather'd and the remaining levels of the underlying StructuredMultigrid
run replicated — identical redundant work on every device, zero extra
communication until the correction is sliced back.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.assembly_structured import StructuredSolidOperator
from femx.solve.multigrid import (
    StructuredMultigrid,
    _interp_axis,
    _join_full,
    _restrict_axis,
    _split_full,
)


# pz=0 phase indices (phase index = px*4 + py*2 + pz)
_PZ0 = (0, 2, 4, 6)


@dataclasses.dataclass
class HaloStructuredOperator:
    """z-slab DOF-sharded structured operator with plane-only halo exchange."""

    op: StructuredSolidOperator  # full-problem operator (free_mask set)
    mesh: Mesh
    axis: str = "z"

    def __post_init__(self):
        nx, ny, nz = self.op.n_cells
        self.ndev = self.mesh.shape[self.axis]
        if nz % self.ndev:
            raise ValueError(f"nz={nz} must divide the '{self.axis}' axis ({self.ndev})")
        self.nzl = nz // self.ndev
        self.local = dataclasses.replace(
            self.op,
            n_cells=(nx, ny, self.nzl),
            grid_shape=(self.op.grid_shape[0], self.op.grid_shape[1], 2 * self.nzl + 1),
            free_mask=None,
            # per-device slab weights are threaded explicitly through
            # apply_local (a closed-over full-length z_weight would be the
            # wrong shape for the slab apply)
            z_weight=None,
        )
        # share the host cell-matrix mirror (avoids device readbacks at setup)
        object.__setattr__(self.local, "_Kcell_host", self.op.Kcell_host)

    # -- host-side layout conversion -----------------------------------------
    def _full_phases_np(self, u: np.ndarray) -> List[np.ndarray]:
        offs = self.op._phase_offsets()
        shapes = self.op._phase_shapes()
        return [
            np.asarray(u)[offs[i]: offs[i + 1]].reshape(3, *shapes[i])
            for i in range(8)
        ]

    def scatter(self, u: np.ndarray) -> np.ndarray:
        """Full internal vector -> (ndev, ndof_local) slab-local stack with
        consistent ghost planes. Host-side, once per solve."""
        phases = self._full_phases_np(u)
        rows = []
        for d in range(self.ndev):
            parts = []
            for i, g in enumerate(phases):
                pz = i % 2
                z0 = d * self.nzl
                parts.append(g[..., z0: z0 + self.nzl + 1 - pz].reshape(-1))
            rows.append(np.concatenate(parts))
        return np.stack(rows)

    def gather(self, u_stacked: np.ndarray) -> np.ndarray:
        """(ndev, ndof_local) -> full internal vector (owned entries)."""
        u_stacked = np.asarray(u_stacked)
        offs_l = self.local._phase_offsets()
        shapes_l = self.local._phase_shapes()
        shapes_f = self.op._phase_shapes()
        out_phases = [np.empty((3, *s), dtype=u_stacked.dtype) for s in shapes_f]
        for d in range(self.ndev):
            for i in range(8):
                pz = i % 2
                g = u_stacked[d, offs_l[i]: offs_l[i + 1]].reshape(3, *shapes_l[i])
                n_own = self.nzl + (1 - pz if d == self.ndev - 1 else 0)
                z0 = d * self.nzl
                out_phases[i][..., z0: z0 + n_own] = g[..., :n_own]
        return np.concatenate([g.reshape(-1) for g in out_phases])

    def ownership_weights(self) -> np.ndarray:
        """(ndev, ndof_local) 1/0 weights zeroing ghost-plane entries so a
        psum'd dot product counts every DOF exactly once."""
        shapes_l = self.local._phase_shapes()
        rows = []
        for d in range(self.ndev):
            parts = []
            for i in range(8):
                w = np.ones((3, *shapes_l[i]))
                if i % 2 == 0 and d < self.ndev - 1:
                    w[..., -1] = 0.0
                parts.append(w.reshape(-1))
            rows.append(np.concatenate(parts))
        return np.stack(rows)

    def mask_stacked(self) -> np.ndarray:
        return self.scatter(self.op.free_mask_host)

    # -- device-side plane plumbing (must run inside shard_map over `axis`) ---
    def _pack_planes(self, planes: List[jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate([p.reshape(-1) for p in planes])

    def _unpack_planes(self, flat: jnp.ndarray) -> List[jnp.ndarray]:
        out = []
        pos = 0
        for i in _PZ0:
            s = (3,) + self.local._phase_shapes()[i][:2]
            n = int(np.prod(s))
            out.append(flat[pos: pos + n].reshape(s))
            pos += n
        return out

    def _perm_up(self):
        return [(d, d + 1) for d in range(self.ndev - 1)]

    def _perm_down(self):
        return [(d, d - 1) for d in range(1, self.ndev)]

    def _halo_reduce_and_sync(self, phases: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """Complete the shared boundary planes of a per-cell-accumulated
        field and refresh ghosts: one ppermute up + one ppermute down."""
        if self.ndev == 1:
            return phases
        axis = self.axis
        up = self._pack_planes([phases[i][..., -1] for i in _PZ0])
        rec = self._unpack_planes(jax.lax.ppermute(up, axis, self._perm_up()))
        out = list(phases)
        for k, i in enumerate(_PZ0):
            out[i] = out[i].at[..., 0].add(rec[k])
        low = self._pack_planes([out[i][..., 0] for i in _PZ0])
        rec2 = self._unpack_planes(jax.lax.ppermute(low, axis, self._perm_down()))
        is_last = jax.lax.axis_index(axis) == self.ndev - 1
        for k, i in enumerate(_PZ0):
            ghost = jnp.where(is_last, out[i][..., -1], rec2[k])
            out[i] = out[i].at[..., -1].set(ghost)
        return out

    def apply_local(self, u_loc: jnp.ndarray, z_weight_loc=None) -> jnp.ndarray:
        """K @ u on a slab-local vector (ghost-consistent in and out).

        z_weight_loc: this device's (nzl,) slab slice of the operator's
        per-z-layer cell weights (ghost-padding support), or None."""
        f = self.local.apply(u_loc, z_weight=z_weight_loc)
        phases = self.local._split_phases(f)
        return self.local._join_phases(self._halo_reduce_and_sync(phases))

    def apply_constrained_local(self, u_loc, mask_loc, z_weight_loc=None) -> jnp.ndarray:
        v = self.apply_local(u_loc * mask_loc, z_weight_loc) * mask_loc
        return v + u_loc * (1.0 - mask_loc)

    def z_weight_stacked(self):
        """(ndev, nzl) per-device slab slices of op.z_weight, or None."""
        if self.op.z_weight is None:
            return None
        zw = np.asarray(self.op.z_weight)
        return np.stack([zw[d * self.nzl:(d + 1) * self.nzl]
                         for d in range(self.ndev)])

    # -- block-Jacobi on local vectors ----------------------------------------
    def block_jacobi_stacked(self) -> List[np.ndarray]:
        """Per-phase (ndev, 3, 3, cnt_local) inverse nodal blocks, sliced
        from the FULL operator's diagonal (so boundary and ghost blocks are
        complete, not slab-truncated). Host-side, once."""
        from femx.assembly_structured import constrained_block_inverse

        bd = self.op.block_diagonal_internal()  # (n_nodes, 3, 3) host
        mask = self.op.free_mask_host
        shapes_f = self.op._phase_shapes()
        offs = self.op._phase_offsets()
        mask3 = np.concatenate([
            mask[offs[i]: offs[i + 1]].reshape(3, -1).T for i in range(8)
        ])
        binv = constrained_block_inverse(bd, mask3)
        out = []
        pos = 0
        for i, s in enumerate(shapes_f):
            cnt = s[0] * s[1] * s[2]
            grid = np.transpose(binv[pos: pos + cnt], (1, 2, 0)).reshape(3, 3, *s)
            pos += cnt
            pz = i % 2
            rows = []
            for d in range(self.ndev):
                z0 = d * self.nzl
                rows.append(grid[..., z0: z0 + self.nzl + 1 - pz].reshape(3, 3, -1))
            out.append(np.stack(rows))
        return out

    def minv_local(self, binv_loc: List[jnp.ndarray]) -> Callable:
        """Block-Jacobi application on a local vector (pure local math)."""
        shapes_l = self.local._phase_shapes()
        offs_l = self.local._phase_offsets()

        def apply_minv(r):
            outs = []
            for i in range(8):
                cnt = shapes_l[i][0] * shapes_l[i][1] * shapes_l[i][2]
                rp = r[offs_l[i]: offs_l[i + 1]].reshape(3, cnt)
                B = binv_loc[i]
                z = jnp.stack([
                    B[0, 0] * rp[0] + B[0, 1] * rp[1] + B[0, 2] * rp[2],
                    B[1, 0] * rp[0] + B[1, 1] * rp[1] + B[1, 2] * rp[2],
                    B[2, 0] * rp[0] + B[2, 1] * rp[1] + B[2, 2] * rp[2],
                ])
                outs.append(z.reshape(-1))
            return jnp.concatenate(outs)

        return apply_minv


def pcg_halo(
    halo: HaloStructuredOperator,
    f_internal: np.ndarray,
    tol: float = 1e-8,
    maxiter: int = 10000,
    preconditioner="block_jacobi",
    x0_internal: Optional[np.ndarray] = None,
):
    """DOF-sharded PCG: the full CG loop runs inside ONE shard_map; per
    iteration the only communication is the apply's two plane-ppermutes,
    the preconditioner's (for DistributedMultigrid: a few more plane
    ppermutes + one small all_gather), and three scalar psums.

    `preconditioner`: "block_jacobi", or a factory
      (halo) -> (make_minv, extra_stacked_inputs)
    where make_minv(*extra_local) returns the kernel-side r_loc -> z_loc
    callable (used by DistributedMultigrid.preconditioner()).

    Returns (x_full_internal, iterations, residual_norm, converged).
    """
    mesh, axis = halo.mesh, halo.axis
    dt = halo.op.Kcell_host.dtype

    f_st = jnp.asarray(halo.scatter(np.asarray(f_internal)).astype(dt))
    w_st = jnp.asarray(halo.ownership_weights().astype(dt))
    m_st = jnp.asarray(halo.mask_stacked().astype(dt))
    zw = halo.z_weight_stacked()
    zw_st = jnp.asarray((np.ones((halo.ndev, halo.nzl)) if zw is None
                         else zw).astype(dt))
    if x0_internal is None:
        x0_st = jnp.zeros_like(f_st)
    else:
        x0_st = jnp.asarray(halo.scatter(np.asarray(x0_internal)).astype(dt))

    if preconditioner == "block_jacobi":
        binv_st = [jnp.asarray(b.astype(dt)) for b in halo.block_jacobi_stacked()]

        def make_minv(binv_loc):
            return halo.minv_local(binv_loc)

        extra, extra_repl = (binv_st,), ()
    elif callable(preconditioner):
        out = preconditioner(halo)
        # factories return (make_minv, stacked_extras) or, when they also
        # need REPLICATED runtime args (e.g. DistributedMultigrid threads
        # the whole StructuredMultigrid pytree through here so its dense
        # coarse inverse — up to ~230 MB under semi_stop_dof — rides as a
        # jit argument instead of a compiled-program constant, which the
        # remote TPU compiler rejects past ~100 MB),
        # (make_minv, stacked_extras, replicated_extras).
        make_minv, extra = out[0], out[1]
        extra_repl = out[2] if len(out) > 2 else ()
    else:
        raise ValueError(f"unknown preconditioner {preconditioner!r}")
    n_stacked = len(extra)

    def kernel(f_b, w_b, m_b, zw_b, x0_b, *extra_b):
        f_loc, w, mask, zw_loc, x = f_b[0], w_b[0], m_b[0], zw_b[0], x0_b[0]
        extra_loc = jax.tree.map(lambda a: a[0], extra_b[:n_stacked])
        minv = make_minv(*extra_loc, *extra_b[n_stacked:])

        def A(v):
            return halo.apply_constrained_local(v, mask, zw_loc)

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a * w, b), axis)

        bnorm = jnp.sqrt(dot(f_loc, f_loc))
        bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
        atol2 = (tol * bnorm_safe) ** 2

        r = f_loc - A(x)
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
            cond, body, (x, r, p, z, rz, jnp.array(0))
        )
        res = jnp.sqrt(dot(r, r)) / bnorm_safe
        return x[None], k, res

    # cache the traced+jitted solver per (halo, preconditioner, tol,
    # maxiter): the driver's iterative-refinement loop calls pcg_halo
    # several times with the same structure, and re-wrapping
    # shard_map+jit re-traces the whole program every call
    cache = getattr(halo, "_pcg_fn_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(halo, "_pcg_fn_cache", cache)
    key = (id(preconditioner), float(tol), int(maxiter))
    hit = cache.get(key)
    if hit is None:
        spec = P(axis)
        in_specs = (spec, spec, spec, spec, spec) + tuple(
            jax.tree.map(lambda _: spec, e) for e in extra
        ) + tuple(jax.tree.map(lambda _: P(), e) for e in extra_repl)
        fn_jit = jax.jit(jax.shard_map(kernel, mesh=mesh, in_specs=in_specs,
                                       out_specs=(spec, P(), P())))
        # pin the preconditioner object alongside the compiled fn: the key
        # uses id(), which CPython reuses after garbage collection — a
        # stale hit would run a kernel compiled against another factory's
        # make_minv
        cache[key] = (fn_jit, preconditioner)
    else:
        fn_jit = hit[0]
    x_st, k, res = fn_jit(f_st, w_st, m_st, zw_st, x0_st, *extra, *extra_repl)
    x_full = halo.gather(np.asarray(x_st))
    return x_full, int(k), float(res), bool(res <= tol)


# ---------------------------------------------------------------------------
# Distributed multigrid V-cycle on slab-local vectors
# ---------------------------------------------------------------------------
class DistributedMultigrid:
    """z-slab-distributed V-cycle preconditioner over StructuredMultigrid levels.

    Level l runs distributed when its z cell count divides 2*ndev (so the
    restriction target still slab-decomposes) and its coarsening gap is
    uniform; remaining levels run replicated after one small all_gather.

    Usage:
        mg  = StructuredMultigrid(...)
        dmg = DistributedMultigrid(mg, mesh)
        x, it, res, ok = pcg_halo(dmg.halo, f, preconditioner=dmg.preconditioner())
    """

    def __init__(self, mg: StructuredMultigrid, mesh: Mesh, axis: str = "z"):
        if getattr(mg, "smoother", "jacobi") != "jacobi" or \
                getattr(mg, "sweeps", None) is not None:
            # the slab-local smoother below is damped block-Jacobi with
            # mg.n_smooth sweeps; silently smoothing the distributed levels
            # differently from the replicated handoff levels would degrade
            # convergence with no error
            raise ValueError(
                "DistributedMultigrid implements damped block-Jacobi "
                "smoothing only (got smoother="
                f"{getattr(mg, 'smoother', 'jacobi')!r}, sweeps="
                f"{getattr(mg, 'sweeps', None)!r}); build the wrapped "
                "StructuredMultigrid with the defaults")
        self.mg = mg
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]

        self.halos: List[HaloStructuredOperator] = []
        for l, lvl in enumerate(mg.levels):
            nz = lvl.op.n_cells[2]
            # need: my slab restricts to the next level's slab -> nz % 2*ndev,
            # a next level to restrict INTO, and a uniform coarsening gap
            pads = getattr(mg, "_pad_nodes", ())
            if (
                l >= len(mg._coarsen_axes)
                or mg._coarsen_axes[l] != (1, 2, 3)
                # ghost-padded gaps (odd-axis coarsening) zero-embed in the
                # transfer, which the slab-local restriction does not model
                # — hand off to the replicated levels there
                or (l < len(pads) and pads[l] != (0, 0, 0))
                or nz % (2 * self.ndev)
            ):
                break
            self.halos.append(HaloStructuredOperator(lvl.op, mesh, axis))
        if not self.halos:
            raise ValueError(
                f"finest level {mg.levels[0].op.n_cells} cannot be z-slab "
                f"distributed over {self.ndev} devices (needs nz % {2 * self.ndev} == 0 "
                "and a uniform first coarsening)"
            )
        self.n_dist = len(self.halos)
        self.handoff = self.n_dist  # first replicated level (< len(levels))

    # -- kernel-side helpers ---------------------------------------------------
    def _restrict_z_halo(self, halo_f: HaloStructuredOperator, G: jnp.ndarray) -> jnp.ndarray:
        """z-restriction of a local joined grid (3,Px,Py,2nzl+1) ->
        (3,Px,Py,nzl+1): local transpose stencil + one ppermute pair."""
        out = _restrict_axis(G, 3)
        if self.ndev == 1:
            return out
        axis = self.axis
        # my coarse plane 0 is missing 0.5 * (neighbor-below's last odd plane)
        odd_last = 0.5 * G[..., -2]
        rec = jax.lax.ppermute(odd_last, axis, halo_f._perm_up())
        out = out.at[..., 0].add(rec)
        # ghost-sync: the owner's completed plane 0 replaces my last plane
        rec2 = jax.lax.ppermute(out[..., 0], axis, halo_f._perm_down())
        is_last = jax.lax.axis_index(axis) == self.ndev - 1
        ghost = jnp.where(is_last, out[..., -1], rec2)
        return out.at[..., -1].set(ghost)

    def _slice_local_from_full(self, k: int, v_full: jnp.ndarray) -> jnp.ndarray:
        """Device's slab (with ghost) of a full level-k internal vector."""
        halo = self.halos[k]
        full_op = self.mg.levels[k].op
        offs = full_op._phase_offsets()
        shapes = full_op._phase_shapes()
        d = jax.lax.axis_index(self.axis)
        parts = []
        for i in range(8):
            pz = i % 2
            g = v_full[offs[i]: offs[i + 1]].reshape(3, *shapes[i])
            sl = jax.lax.dynamic_slice_in_dim(g, d * halo.nzl,
                                              halo.nzl + 1 - pz, axis=3)
            parts.append(sl.reshape(-1))
        return jnp.concatenate(parts)

    def _vcycle_local(self, k: int, b_loc: jnp.ndarray, ctx) -> jnp.ndarray:
        # ctx carries the TRACED StructuredMultigrid (a jit argument of
        # pcg_halo): the handoff branch's replicated levels and the dense
        # coarse inverse must not be closed over — closure arrays become
        # compiled-program constants, and the coarse inverse can reach
        # ~230 MB under semi_stop_dof (the remote TPU compiler rejects
        # requests past ~100 MB). Static structure (omegas, level count)
        # is pytree aux and identical on the traced copy.
        masks, minvs, zws, mg = ctx
        halo = self.halos[k]
        om = mg.omegas[k]
        mask = masks[k]
        minv = minvs[k]

        def A(v):
            # zws[k] threads ghost-padding cell weights (level 0 only):
            # smoothing with the UNWEIGHTED apply against the WEIGHTED
            # block-Jacobi diagonal under-damps the shared boundary plane
            # and turns the V-cycle indefinite (measured: CG rz>0 guard
            # tripped at iteration 1 on a padded lattice)
            return halo.apply_constrained_local(v, mask, zws[k])

        def smooth(x, b, sweeps):
            for _ in range(sweeps):
                x = x + om * minv(b - A(x))
            return x

        x = smooth(jnp.zeros_like(b_loc), b_loc, mg.n_smooth)
        r = b_loc - A(x)

        G = _join_full(halo.local, r)
        G = _restrict_axis(_restrict_axis(G, 1), 2)
        Gc = self._restrict_z_halo(halo, G)

        if k + 1 < self.n_dist:
            nxt = self.halos[k + 1]
            r_c = _split_full(nxt.local, Gc) * masks[k + 1]
            e_c = self._vcycle_local(k + 1, r_c, ctx)
            Gce = _join_full(nxt.local, e_c)
        else:
            # handoff: assemble the full coarse grid (replicated) and run
            # the remaining replicated levels of the underlying V-cycle.
            owned = Gc[..., :-1]  # (3, Pxc, Pyc, 2*nzl_c) per device
            allg = jax.lax.all_gather(owned, self.axis)
            parts = [allg[d] for d in range(self.ndev)]
            # global last plane lives in the LAST device's ghost slot
            last = jnp.where(jax.lax.axis_index(self.axis) == self.ndev - 1,
                             Gc[..., -1], jnp.zeros_like(Gc[..., -1]))
            last = jax.lax.psum(last, self.axis)
            G_full = jnp.concatenate(parts + [last[..., None]], axis=3)
            cop = mg.levels[self.handoff].op
            r_c = _split_full(cop, G_full) * cop.free_mask
            e_c = mg._vcycle(self.handoff, r_c)
            Gce_full = _join_full(cop, e_c)
            # prolong on the full grid, slice my slab back (small level)
            Gf_full = _interp_axis(_interp_axis(_interp_axis(Gce_full, 3), 2), 1)
            e_full = _split_full(mg.levels[k].op, Gf_full)
            x = x + self._slice_local_from_full(k, e_full) * mask
            return smooth(x, b_loc, mg.n_smooth)

        Gf = _interp_axis(_interp_axis(_interp_axis(Gce, 3), 2), 1)
        x = x + _split_full(halo.local, Gf) * mask
        return smooth(x, b_loc, mg.n_smooth)

    # -- pcg_halo plug-in -------------------------------------------------------
    @property
    def halo(self) -> HaloStructuredOperator:
        return self.halos[0]

    def preconditioner(self):
        """Factory for pcg_halo's `preconditioner` argument."""
        dt = self.mg.levels[0].op.Kcell_host.dtype
        masks_st = [jnp.asarray(h.mask_stacked().astype(dt)) for h in self.halos]
        binv_st = [
            [jnp.asarray(b.astype(dt)) for b in h.block_jacobi_stacked()]
            for h in self.halos
        ]
        zw_st = [
            jnp.asarray((np.ones((h.ndev, h.nzl)) if h.z_weight_stacked() is None
                         else h.z_weight_stacked()).astype(dt))
            for h in self.halos
        ]

        def factory(_halo):
            def make_minv(masks_loc, binv_loc, zw_loc, mg_traced):
                minvs = [h.minv_local(bl) for h, bl in zip(self.halos, binv_loc)]
                ctx = (masks_loc, minvs, zw_loc, mg_traced)

                def apply_minv(r_loc):
                    return self._vcycle_local(0, r_loc, ctx)

                return apply_minv

            # the mg pytree rides as a REPLICATED runtime arg (third slot):
            # its leaves include the dense coarse inverse, which must not
            # become a compiled-program constant (see _vcycle_local)
            return make_minv, (masks_st, binv_st, zw_st), (self.mg,)

        return factory
