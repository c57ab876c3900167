"""Geometric multigrid preconditioner for the structured solid operator.

The structural analog of the reference's SuperLU direct factorization
(ReactionSolver.py:201) at scales where a direct solve is impossible:
a symmetric V-cycle (damped block-Jacobi smoothing, trilinear transfers on
the nested half-spaced lattices, dense-Cholesky coarsest solve) used as the
preconditioner of CG. Iteration counts drop from O(thousands) with
block-Jacobi alone to O(tens), independent of mesh size — which is what
makes the <2 s / 1M-DOF north star reachable in float32 on one chip.

Grid hierarchy: per level, every axis whose cell count is even and > 2
halves (semi-coarsening) — the exact rule, preferred because its coarse
operators are exact rediscretizations. When a level has no even axis left
AND is too large for the dense coarsest solve, odd axes are GHOST-PADDED up
to even (fractional-weight straddle cells + zero-embed/slice transfers) so
the hierarchy keeps coarsening instead of failing over to block-Jacobi —
see the level-spec comment in StructuredMultigrid. Uniform 2x steps
reuse the cell stiffness by exact rescaling (K(2h) = 2 K(h)); only
semi-coarsened steps re-assemble the (81,81) cell matrix (single cell,
cheap) — no level ever re-meshes the box. Transfers: fine lattice positions
at even doubled coordinates coincide with coarse nodes; odd positions
interpolate the two axis neighbors — composed per coarsened axis,
restriction is exactly the transpose (keeps the V-cycle SPD so standard CG
applies).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import tempfile
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from femx.assembly_structured import StructuredSolidOperator


# ---------------------------------------------------------------------------
# Persistent hierarchy cache. The expensive setup products — per-level
# block-Jacobi inverse tensors, per-level smoother damping, and the dense
# coarse inverse — are pure functions of (n_cells, spacing, E, nu, weight,
# dtype, smoother params, fine free-mask), so they are cached on disk next to
# the XLA compile cache and reloaded on repeat runs (the coarser masks and
# operators derive deterministically from the fine inputs and stay cheap to
# rebuild). Measured at the 1.39M-DOF flagship: 6.4 s cold -> ~1.5 s warm
# setup. Disable with FEMX_MG_CACHE=0.

_MG_CACHE_VERSION = 5  # v5: lane padding (real_cells) pads ONLY the fine
# level; the coarse chain lives on the real lattice and the gap-0 transfer
# crops (changes level_cells, omegas and binv payloads for padded
# hierarchies vs v4, which threaded ghost weights through every level)


def _mg_cache_dir() -> str | None:
    d = os.environ.get("FEMX_MG_CACHE", os.path.expanduser("~/.cache/femx_mg"))
    return None if d in ("0", "off", "") else d


def _mg_cache_key(n, sp, E, nu, weight, dtype, n_smooth, omega,
                  coarse_dof_limit, mask_grid, extra: str = "") -> str:
    h = hashlib.sha256()
    key = (
        _MG_CACHE_VERSION, tuple(n), tuple(sp), float(E), float(nu),
        None if weight is None else float(weight), np.dtype(dtype).name,
        int(n_smooth), float(omega), int(coarse_dof_limit),
    )
    # non-default smoother tags are appended so the default ("") keys stay
    # byte-identical to pre-chebyshev caches
    h.update(repr(key + ((extra,) if extra else ())).encode())
    h.update(np.packbits(
        np.ascontiguousarray(mask_grid > 0.5).reshape(-1)).tobytes())
    return h.hexdigest()[:32]


def _mg_cache_load(key: str):
    d = _mg_cache_dir()
    if d is None:
        return None
    path = os.path.join(d, f"hier_{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None  # corrupt/partial file: fall through to recompute


def _mg_cache_save(key: str, payload: dict) -> None:
    d = _mg_cache_dir()
    if d is None:
        return
    try:
        os.makedirs(d, exist_ok=True)
        # suffix must end in .npz or np.savez appends one (and the rename
        # would then move an empty file)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        np.savez(tmp, **payload)
        os.replace(tmp, os.path.join(d, f"hier_{key}.npz"))
        _mg_cache_trim(d)
    except OSError:
        pass  # cache is best-effort; solves proceed without it


def _mg_cache_trim(d: str, cap_bytes: int = 8 << 30) -> None:
    """Drop least-recently-used entries once the cache exceeds `cap_bytes`
    (large-grid hierarchies run hundreds of MB each; FEMX_MG_CACHE_GB
    overrides the 8 GB default)."""
    cap = int(float(os.environ.get("FEMX_MG_CACHE_GB", 0)) * 2**30) or cap_bytes
    entries = []
    total = 0
    for name in os.listdir(d):
        if not (name.startswith("hier_") and name.endswith(".npz")):
            continue
        p = os.path.join(d, name)
        try:
            st = os.stat(p)
        except OSError:
            continue
        entries.append((st.st_atime, st.st_size, p))
        total += st.st_size
    entries.sort()  # oldest access first
    for _, size, p in entries:
        if total <= cap:
            break
        try:
            os.remove(p)
            total -= size
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Contiguity helpers: every transfer/join/split op below is expressed as
# reshapes + middle-axis slices + concatenations — no strided slicing and no
# transposes, which on TPU cost 1-2 orders of magnitude more than the math.
# ---------------------------------------------------------------------------
def _axis_split(G: jnp.ndarray, axis: int):
    """(..., 2n+1, ...) -> even part (n+1) and odd part (n) along `axis`."""
    n = (G.shape[axis] - 1) // 2
    lead = int(np.prod(G.shape[:axis], dtype=np.int64))
    trail = int(np.prod(G.shape[axis + 1 :], dtype=np.int64))
    R = G.reshape(lead, G.shape[axis], trail)
    pairs = R[:, : 2 * n, :].reshape(lead, n, 2, trail)
    even = jnp.concatenate([pairs[:, :, 0, :], R[:, 2 * n :, :]], axis=1)
    odd = pairs[:, :, 1, :]
    sh = list(G.shape)
    sh[axis] = n + 1
    sh_o = list(G.shape)
    sh_o[axis] = n
    return even.reshape(sh), odd.reshape(sh_o)


def _axis_interleave(even: jnp.ndarray, odd: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of _axis_split: interleave (n+1) evens with (n) odds -> 2n+1."""
    n = odd.shape[axis]
    lead = int(np.prod(even.shape[:axis], dtype=np.int64))
    trail = int(np.prod(even.shape[axis + 1 :], dtype=np.int64))
    E = even.reshape(lead, n + 1, trail)
    O = odd.reshape(lead, n, trail)
    inter = jnp.stack([E[:, :n, :], O], axis=2).reshape(lead, 2 * n, trail)
    out = jnp.concatenate([inter, E[:, n:, :]], axis=1)
    sh = list(even.shape)
    sh[axis] = 2 * n + 1
    return out.reshape(sh)


def _join_full(op: StructuredSolidOperator, u: jnp.ndarray) -> jnp.ndarray:
    """Internal phase vector -> (3, Px, Py, Pz) doubled-lattice grid."""
    phases = op._split_phases(u)  # index px*4 + py*2 + pz

    def merge(a, b, axis):
        return _axis_interleave(a, b, axis)

    # merge z (axis 3), then y (axis 2), then x (axis 1)
    m_z = [merge(phases[i], phases[i + 1], 3) for i in (0, 2, 4, 6)]
    m_y = [merge(m_z[i], m_z[i + 1], 2) for i in (0, 2)]
    return merge(m_y[0], m_y[1], 1)


def _split_full(op: StructuredSolidOperator, G: jnp.ndarray) -> jnp.ndarray:
    x0, x1 = _axis_split(G, 1)
    parts = []
    for gx in (x0, x1):
        y0, y1 = _axis_split(gx, 2)
        for gy in (y0, y1):
            z0, z1 = _axis_split(gy, 3)
            parts.append(z0.reshape(-1))
            parts.append(z1.reshape(-1))
    return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# Trilinear transfers on nested doubled lattices
# ---------------------------------------------------------------------------
def _interp_axis(G: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Coarse grid (n points along axis) -> fine (2n-1): copy + midpoints."""
    n = G.shape[axis]
    lead = int(np.prod(G.shape[:axis], dtype=np.int64))
    trail = int(np.prod(G.shape[axis + 1 :], dtype=np.int64))
    R = G.reshape(lead, n, trail)
    mid = 0.5 * (R[:, :-1, :] + R[:, 1:, :])
    inter = jnp.stack([R[:, :-1, :], mid], axis=2).reshape(lead, 2 * (n - 1), trail)
    out = jnp.concatenate([inter, R[:, -1:, :]], axis=1)
    sh = list(G.shape)
    sh[axis] = 2 * n - 1
    return out.reshape(sh)


def _restrict_axis(G: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Transpose of _interp_axis: out[q] = F[2q] + 0.5*(F[2q-1] + F[2q+1])."""
    even, odd = _axis_split(G, axis)
    lead = int(np.prod(even.shape[:axis], dtype=np.int64))
    trail = int(np.prod(even.shape[axis + 1 :], dtype=np.int64))
    n = odd.shape[axis]
    E = even.reshape(lead, n + 1, trail)
    O = odd.reshape(lead, n, trail)
    zero = jnp.zeros((lead, 1, trail), dtype=G.dtype)
    left = jnp.concatenate([zero, O], axis=1)
    right = jnp.concatenate([O, zero], axis=1)
    out = E + 0.5 * (left + right)
    return out.reshape(even.shape)


def prolong(G_coarse: jnp.ndarray, axes=(1, 2, 3)) -> jnp.ndarray:
    for ax in axes:
        G_coarse = _interp_axis(G_coarse, ax)
    return G_coarse


def restrict(G_fine: jnp.ndarray, axes=(1, 2, 3)) -> jnp.ndarray:
    for ax in axes:
        G_fine = _restrict_axis(G_fine, ax)
    return G_fine


# ---------------------------------------------------------------------------
# The V-cycle preconditioner
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class _Level:
    op: StructuredSolidOperator
    binv: List  # per-phase (3, 3, cnt) block-Jacobi inverse tensors

    def minv(self, r):
        return self.op.apply_block_jacobi(self.binv, r)


def _axis_support(w, n: int) -> np.ndarray:
    """(2n+1,) 1.0 where a doubled-lattice node touches any cell of positive
    weight along this axis, else 0.0 (such nodes must stay fixed — their
    stiffness rows are exactly zero)."""
    if w is None:
        return np.ones(2 * n + 1)
    sup = np.zeros(2 * n + 1)
    for c in range(n):
        if w[c] > 1e-12:
            sup[2 * c : 2 * c + 3] = 1.0
    return sup


class StructuredMultigrid:
    """Symmetric V-cycle preconditioner M^-1 for CG on the structured mesh.

    Registered as a JAX PYTREE (leaves: every level's Kcell/free_mask/
    block-Jacobi tensors + the coarsest inverse) so jitted solves can take
    the whole preconditioner as an ARGUMENT:

        @jax.jit
        def solve(fv, mg):
            return pcg(mg.fine_op.apply_constrained, fv, M_inv_diag=mg, ...)

    Closing over `mg` instead works but embeds ~100 MB of arrays as
    compiled-program constants (measured: the remote-compile payload/time
    at 1.39M DOF is dominated by them).

    Args:
      dims: (X, Y, Z) box dimensions.
      n_cells: finest cell counts (nx, ny, nz).
      E, nu: material; weight: Tet10 quadrature weight.
      free_mask_global: (ndof,) 1/0 mask in mesh (lattice raster) DOF order.
      n_smooth: damped-Jacobi sweeps pre & post (same count keeps symmetry).
      omega: smoother damping.
      coarse_dof_limit: dense-Cholesky coarsest solve below this size.
    """

    def __init__(
        self,
        dims,
        n_cells,
        E,
        nu,
        free_mask_global,
        weight=None,
        dtype=np.float32,
        n_smooth: int = 2,
        omega: float = 0.7,
        # Keep the coarsest dense factor reasonably small: it is a pytree
        # LEAF (shipped as a runtime argument, NOT a compile constant —
        # closing over it was measured to overflow the remote compiler's
        # request limit at ~250 MB, hence the pytree registration), but it
        # still costs a host->device transfer, disk-cache space, and its
        # host inverse is the single most expensive setup step. Measured
        # on the 24x24x96 flagship:
        # limit 4000 -> 3675-DOF coarse, 13 CG iters, ~4 s torch inverse;
        # limit 2000 -> 1911-DOF coarse (one semi level), 14 iters, 0.7 s
        # numpy inverse; limit 1200 -> 1029-DOF coarse, 21 iters. 2000 is
        # the sweet spot: +1 iteration for a 3x cheaper setup without torch.
        coarse_dof_limit: int = 2000,
        min_levels: int = 1,
        fine_op: "StructuredSolidOperator | None" = None,
        spacing=None,
        # Hard cap on the coarsest dense factor: beyond this the Cholesky
        # (O(n^3) host work + a >100 MB jit-closure constant, which the
        # remote TPU compiler rejects) is worse than falling back to
        # block-Jacobi CG — raise so callers can fall back.
        coarse_dense_limit: int = 15000,
        # Ghost-pad odd axes when the hierarchy would otherwise bottom out
        # ABOVE coarse_dense_limit (see the level-spec comment). False
        # reproduces the pre-round-4 behavior (raise on stuck hierarchies).
        pad_odd_axes: bool = True,
        # Smoother family: "jacobi" (damped block-Jacobi, n_smooth sweeps)
        # or "chebyshev" (degree-n_smooth Chebyshev polynomial in M^-1 K on
        # [cheb_lower, cheb_upper] * lambda_max — same cost per degree as
        # one Jacobi sweep: 1 apply + 1 block-Jacobi solve).
        smoother: str = "jacobi",
        cheb_lower: float = 1.0 / 30.0,
        cheb_upper: float = 1.1,
        # Stop with a dense coarsest solve INSTEAD of semi-coarsening once
        # the level fits: every semi step doubles one axis's spacing, and
        # smoothing anisotropic coarse operators with block-Jacobi costs
        # iterations. Measured on (20,20,80), f32 to 1e-5: two z-semi
        # levels -> 19 iters; dense bottom at (5,5,10) (7623 DOF, one semi
        # step short) -> 13; dense at (5,5,20) (14883 DOF) -> 12 — vs 14
        # on the 2^k control (16,16,64). 8000 caps the inverse at ~230 MB
        # f32 (a pytree leaf, shipped as a runtime arg — not a compile
        # constant). 0 disables (pre-v4 behavior). Full 3-axis coarsening
        # is always preferred over stopping (exact, cheap, isotropic).
        semi_stop_dof: int = 8000,
        # Real (unpadded) cell counts when n_cells is a LANE-PADDED lattice
        # (assembly_structured.lane_friendly_nz): axes where
        # real_cells[i] < n_cells[i] get ghost-cell weights zeroing the
        # padding on EVERY level (fine included) and support-fixed masks,
        # so the padded solve equals the real one on the real lattice.
        real_cells=None,
    ):
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(f"smoother must be 'jacobi' or 'chebyshev', "
                             f"got {smoother!r}")
        self.smoother = smoother
        self.cheb_lower = float(cheb_lower)
        self.cheb_upper = float(cheb_upper)
        self.n_smooth = n_smooth
        self.sweeps = None  # optional per-level sweep counts (None: n_smooth)
        self.omega = omega
        self.levels: List[_Level] = []
        self._coarsen_axes: List[tuple] = []  # grid axes (1..3) per level gap

        n = tuple(int(v) for v in n_cells)
        if spacing is None:
            spacing = tuple(float(d) / c for d, c in zip(dims, n))
        sp = tuple(float(s) for s in spacing)
        mask_grid = np.asarray(free_mask_global, dtype=np.float64).reshape(
            2 * n[0] + 1, 2 * n[1] + 1, 2 * n[2] + 1, 3
        )

        # ---- level specs: semi-coarsening (halve every EVEN axis > 2, the
        # exact rule) so anisotropic boxes get a hierarchy; when a level has
        # NO even axis left and is still too big to invert densely, odd axes
        # are GHOST-PADDED up to even and coarsening continues (round 4).
        # Padding stays an escape hatch — measured: padding odd axes
        # eagerly costs iterations ((24,24,96): 25 -> 30; (5,5,10): 19 ->
        # 34 at 1e-10) because padded coarse operators are approximate,
        # while WITHOUT it stuck grids raised ValueError and fell back to
        # thousand-iteration block-Jacobi CG.
        #
        # Ghost padding mechanics: an odd axis c is conceptually padded to
        # c+1 cells before halving. The padding never materializes on the
        # level itself — the FINE level is always the caller's exact
        # operator — it lives in (a) the transfers (residuals are
        # zero-embedded into the padded extents before restriction;
        # prolongations are sliced back, exact adjoints of each other) and
        # (b) the COARSE levels, whose operators carry per-axis cell
        # weights zeroing fully-ghost cell layers and whose masks fix
        # zero-stiffness ghost nodes (identity rows) while keeping
        # supported ghost nodes FREE (fixing them imposes a spurious
        # Dirichlet plane next to real free surfaces — measured 81 vs ~35
        # iterations on a (10,10,40) all-padded experiment).
        # Cells straddling the real boundary get their REAL-VOLUME FRACTION
        # as weight (the Galerkin-consistent choice: restricting the
        # zero-embedded fine stiffness integrates only the real material in
        # the straddled region — weight-1 straddles overstiffen the
        # artificial boundary and measurably slow CG: 65 vs ~30 iterations
        # on a (5,5,10) test grid). Approximate coarse weights affect only
        # the RATE, never correctness (CG solves the exact fine system).
        # real_ext tracks the real extent in cells per axis (halved each
        # coarsening, fractional once a straddle exists); cell j has weight
        # clamp(real_ext - j, 0, 1).
        specs = []  # (n, sp, mask_grid, axis_weights)
        self._pad_nodes: List[tuple] = []  # per gap: node-padding per axis
        # Lane padding (real_cells < n_cells) pads ONLY the fine level:
        # the coarse chain is built from the REAL lattice (identical to the
        # unpadded hierarchy — measured: threading ghost weights through
        # every level cost 14 -> 23 iterations at 80x80x320->384), and the
        # gap-0 transfer CROPS the padded fine residual to the real lattice
        # (adjoint: the prolonged correction is zero-embedded back).
        pad_cells = (0, 0, 0)
        n_fine_padded = n
        mask_fine_padded = None
        if real_cells is not None:
            rc = tuple(int(v) for v in real_cells)
            pad_cells = tuple(c - r for c, r in zip(n, rc))
            if any(p < 0 for p in pad_cells):
                raise ValueError(
                    f"real_cells {rc} exceed n_cells {n} on some axis")
            if any(pad_cells):
                mask_fine_padded = mask_grid  # padded node extents
                mask_grid = np.ascontiguousarray(
                    mask_grid[: 2 * rc[0] + 1, : 2 * rc[1] + 1,
                              : 2 * rc[2] + 1])
                n = rc
        self._crop_nodes = tuple(2 * p for p in pad_cells)
        real_ext = [float(c) for c in n]
        weights = (None, None, None)
        while True:
            specs.append((n, sp, mask_grid, weights))
            ndof = 3 * (2 * n[0] + 1) * (2 * n[1] + 1) * (2 * n[2] + 1)
            if ndof <= coarse_dof_limit:
                break
            even_axes = tuple(i for i in range(3)
                              if n[i] % 2 == 0 and n[i] > 2)
            if (semi_stop_dof and len(even_axes) < 3
                    and ndof <= min(semi_stop_dof, coarse_dense_limit)):
                # Only PARTIAL (semi) coarsening is possible and the level
                # already fits a dense inverse: stop here. Semi steps make
                # the coarse operators anisotropic, which block-Jacobi
                # smooths poorly (see semi_stop_dof in __init__).
                break
            if even_axes:
                axes = even_axes  # exact (unpadded) coarsening — preferred:
                # measured BETTER than padding odd axes early (padded coarse
                # operators are approximate; flagship 25 vs 30 iterations)
            else:
                odd_axes = tuple(i for i in range(3) if n[i] > 2)
                if (not odd_axes or ndof <= coarse_dense_limit
                        or not pad_odd_axes):
                    break  # dense coarsest solve handles it exactly
                # ESCAPE HATCH: no even axis and the level is too big to
                # invert densely — ghost-pad the odd axes so the hierarchy
                # keeps coarsening instead of raising (which used to dump
                # such grids onto thousand-iteration block-Jacobi CG)
                axes = odd_axes
            pad = tuple(1 if (i in axes and n[i] % 2) else 0 for i in range(3))
            self._pad_nodes.append(tuple(2 * p for p in pad))
            self._coarsen_axes.append(tuple(1 + i for i in axes))
            mask_p = mask_grid
            if any(pad):
                # Ghost nodes are padded FREE (1), not fixed: fixing them
                # imposes a spurious Dirichlet plane right next to real free
                # surfaces, which clamps the coarse-grid correction there
                # (measured: 81 vs ~20 iterations on a (10,10,40) grid).
                # With free ghosts + fractional straddle weights the coarse
                # operator approximates the Galerkin R K P of the
                # zero-embedded fine system; only nodes with NO weighted
                # stiffness support are fixed below (their rows would be
                # singular).
                mask_p = np.pad(mask_grid, [(0, 2 * pad[0]), (0, 2 * pad[1]),
                                            (0, 2 * pad[2]), (0, 0)],
                                constant_values=1.0)
            sub = tuple(slice(None, None, 2) if i in axes else slice(None)
                        for i in range(3))
            mask_grid = mask_p[sub]
            n = tuple((c + p) // 2 if i in axes else c
                      for i, (c, p) in enumerate(zip(n, pad)))
            sp = tuple(s * 2.0 if i in axes else s for i, s in enumerate(sp))
            real_ext = [r / 2.0 if i in axes else r
                        for i, r in enumerate(real_ext)]
            weights = tuple(
                None if real_ext[i] >= n[i] - 1e-9
                else np.clip(real_ext[i] - np.arange(n[i]), 0.0, 1.0)
                for i in range(3)
            )
            if any(w is not None for w in weights):
                mask_grid = mask_grid * (
                    _axis_support(weights[0], n[0])[:, None, None, None]
                    * _axis_support(weights[1], n[1])[None, :, None, None]
                    * _axis_support(weights[2], n[2])[None, None, :, None]
                )

        coarse_ndof = 3 * np.prod([2 * c + 1 for c in specs[-1][0]])
        if coarse_ndof > coarse_dense_limit:
            raise ValueError(
                f"multigrid hierarchy bottoms out at {coarse_ndof} DOFs "
                f"(> coarse_dense_limit={coarse_dense_limit}); cell counts "
                f"{tuple(n_cells)} do not coarsen far enough"
            )

        extra = ("" if smoother == "jacobi"
                 else f"cheb:{self.cheb_lower}:{self.cheb_upper}")
        # semi_stop_dof changes the level chain, so non-default values must
        # key separately (the v4 default is covered by _MG_CACHE_VERSION)
        if semi_stop_dof != 8000:
            extra += f"|ss:{semi_stop_dof}"
        if any(pad_cells):
            extra += f"|fp:{pad_cells}"
        ck = _mg_cache_key(specs[0][0], specs[0][1], E, nu, weight, dtype,
                           n_smooth, omega, coarse_dof_limit,
                           specs[0][2] if mask_fine_padded is None
                           else mask_fine_padded,
                           extra=extra)
        cached = _mg_cache_load(ck)
        level_cells = np.asarray([s_[0] for s_ in specs], dtype=np.int64)
        if cached is not None and (
            int(cached["n_levels"]) != len(specs)
            or not np.array_equal(
                cached.get("level_cells", np.empty((0, 3), np.int64)),
                level_cells)
        ):
            cached = None  # stale layout (shouldn't happen at same version)
        self.setup_cache_hit = cached is not None  # for honest bench reporting

        # ---- per-level operators: reuse the caller's fine operator, derive
        # uniformly-coarsened cell matrices by exact 2x rescaling, rebuild
        # from_lattice (single-cell assembly, cheap) only on semi-coarsened
        # steps where the spacing ratio changes.
        prev_op = None
        binv_hosts = []  # host copies (the safe-omega power iteration must
        # NOT read the device arrays back: a device->host readback through
        # the axon relay blocks for minutes — measured 580 s setup)
        for i, (ni, spi, mgrid, wts) in enumerate(specs):
            if i == 0 and any(pad_cells):
                # lane-padded fine level: padded lattice, ghost-cell weights
                # zeroing the padding, support-fixed padded mask. The rest
                # of the chain (and specs[0] itself) stays the REAL lattice.
                ni = n_fine_padded
                mgrid = mask_fine_padded
                wts = tuple(
                    None if pad_cells[a] == 0
                    else np.clip(float(n_fine_padded[a] - pad_cells[a])
                                 - np.arange(ni[a]), 0.0, 1.0)
                    for a in range(3))
                mgrid = mgrid * (
                    _axis_support(wts[0], ni[0])[:, None, None, None]
                    * _axis_support(wts[1], ni[1])[None, :, None, None]
                    * _axis_support(wts[2], ni[2])[None, None, :, None])
            if i == 0 and fine_op is not None:
                if tuple(fine_op.n_cells) != ni:
                    raise ValueError(
                        f"fine_op has n_cells {fine_op.n_cells}, expected {ni}"
                    )
                op = fine_op
                if any(pad_cells):
                    wts = (None, None, None)  # caller already weighted it
            elif (
                prev_op is not None
                and self._coarsen_axes[i - 1] == (1, 2, 3)
                and self._pad_nodes[i - 1] == (0, 0, 0)
            ):
                op = prev_op.coarsened()
            else:
                op = StructuredSolidOperator.from_lattice(
                    ni, spi, E, nu, weight=weight, dtype=dtype
                )
            if any(w is not None for w in wts):
                import dataclasses

                kch = op.Kcell_host
                op = dataclasses.replace(
                    op,
                    x_weight=None if wts[0] is None
                    else jnp.asarray(wts[0], dtype=dtype),
                    y_weight=None if wts[1] is None
                    else jnp.asarray(wts[1], dtype=dtype),
                    z_weight=None if wts[2] is None
                    else jnp.asarray(wts[2], dtype=dtype),
                )
                object.__setattr__(op, "_Kcell_host", kch)
            # the lane-padded fine op must not seed coarsened() — level 1
            # lives on the REAL lattice (the gap-0 transfer crops)
            prev_op = None if (i == 0 and any(pad_cells)) else op
            m_int = op.to_internal(mgrid.reshape(-1))
            op = op.with_free_mask(m_int)  # numpy in: host mirror cached
            if cached is not None:
                bh = [cached[f"binv_{i}_{p}"] for p in range(8)]
            else:
                bh = [b.astype(dtype) for b in op.block_jacobi_tensors()]
            binv_hosts.append(bh)
            self.levels.append(_Level(op=op, binv=[jnp.asarray(b) for b in bh]))

        # Smoother damping. omega=0.7 is stable and tuned for isotropic
        # levels, but damped block-Jacobi DIVERGES on the ANISOTROPIC
        # operators a semi-coarsened hierarchy produces (measured: the
        # V-cycle turns indefinite and CG's rz>0 guard trips). For each
        # level whose cell spacing is anisotropic, estimate
        # lambda_max(M^-1 K) by power iteration and use the Chebyshev-style
        # safe choice 4/(3 lambda_max); isotropic levels keep the tuned
        # omega (the per-level rule keeps the host power iteration off the
        # big isotropic fine grids, where it costs seconds).
        if cached is not None:
            self.omegas = [float(w) for w in cached["omegas"]]
            self.lmaxs = ([float(v) for v in cached["lmaxs"]]
                          if "lmaxs" in cached else None)
        else:
            self.omegas = []
            self.lmaxs = [] if smoother == "chebyshev" else None
            for (ni, spi, _mg, wts), lvl, binv_h in zip(specs, self.levels,
                                                        binv_hosts):
                weighted = any(w is not None for w in wts)
                aniso = max(spi) / min(spi) > 1.01
                if smoother == "chebyshev":
                    # Chebyshev needs lambda_max(M^-1 K) on EVERY level. It
                    # is a local (stencil) quantity: unweighted levels use a
                    # small same-spacing-ratio proxy lattice (so 10M+-DOF
                    # fine levels skip the 15-apply host power iteration);
                    # ghost-weighted levels are coarse — iterate directly.
                    lm = (_power_lambda_max(lvl.op, binv_h) if weighted
                          else _proxy_lambda_max(spi, nu, dtype))
                    self.lmaxs.append(float(lm))
                    self.omegas.append(min(omega, 4.0 / (3.0 * lm)))
                elif aniso or weighted:
                    # anisotropic spacing AND ghost-weighted levels both
                    # shift lambda_max(M^-1 K) away from the isotropic
                    # tuning — run the (cheap, coarse-level-only) power
                    # iteration for either
                    self.omegas.append(
                        min(omega,
                            4.0 / (3.0 * _power_lambda_max(lvl.op, binv_h)))
                    )
                else:
                    self.omegas.append(omega)

        if cached is not None:
            self._coarse_inv = jnp.asarray(cached["coarse_kinv"])
            return

        # Coarsest: dense masked Cholesky in the coarse op's internal order.
        cn, csp, *_ = specs[-1]
        cop = self.levels[-1].op
        K = _dense_structured_K(cn, csp, E, nu, cop.weight,
                                cell_weights=cop._cell_weight_host())
        perm = cop._permutation()
        Kp = K[np.ix_(perm, perm)]
        m = cop.free_mask_host.astype(np.float64)
        Kp = Kp * m[:, None] * m[None, :] + np.diag(1.0 - m)
        # Explicit symmetric inverse instead of two triangular solves: a TPU
        # triangular solve serializes row-by-row (measured ~2-4 ms at 3.7k
        # DOF — comparable to the whole rest of the V-cycle), while the
        # inverse is one MXU matvec. Inverted in f64 on host, symmetrized,
        # cast; as the coarsest-level correction of a PRECONDITIONER the
        # inverse's extra rounding is inert, and symmetry (which CG does
        # need) is exact by construction. At <=1200 DOF plain numpy is
        # ~0.15 s; above that torch's dpotrf+dpotri is ~3x cheaper than
        # numpy's LU (1.3 s vs 4.4 s at 3675^2 measured) and worth its
        # ~2-4 s import.
        if Kp.shape[0] <= 2000:
            np.linalg.cholesky(Kp)  # definiteness check (raises on indefinite)
            Kinv = np.linalg.solve(Kp, np.eye(Kp.shape[0], dtype=Kp.dtype))
        else:
            try:
                import torch

                try:
                    L = torch.linalg.cholesky(torch.from_numpy(Kp))
                except Exception as e:  # keep numpy's error contract
                    raise np.linalg.LinAlgError(
                        f"coarse matrix not positive definite: {e}")
                Kinv = torch.cholesky_inverse(L).numpy()
            except ImportError:
                np.linalg.cholesky(Kp)  # definiteness check
                Kinv = np.linalg.solve(Kp, np.eye(Kp.shape[0], dtype=Kp.dtype))
        Kinv = 0.5 * (Kinv + Kinv.T)
        self._coarse_inv = jnp.asarray(Kinv.astype(dtype))

        payload = {"n_levels": np.int64(len(specs)),
                   "level_cells": level_cells,
                   "omegas": np.asarray(self.omegas, dtype=np.float64),
                   **({} if self.lmaxs is None
                      else {"lmaxs": np.asarray(self.lmaxs, np.float64)}),
                   "coarse_kinv": Kinv.astype(dtype)}
        for i, bh in enumerate(binv_hosts):
            for p, b in enumerate(bh):
                payload[f"binv_{i}_{p}"] = np.asarray(b)
        _mg_cache_save(ck, payload)

    def _coarse_solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.dot(self._coarse_inv, b,
                           precision=jax.lax.Precision.HIGHEST)

    def _smooth(self, k: int, x, b, sweeps: int):
        lvl = self.levels[k]
        om = self.omegas[k]
        for _ in range(sweeps):
            x = x + om * lvl.minv(b - lvl.op.apply_constrained(x))
        return x

    def _smooth_cheb(self, k: int, x, b, degree: int):
        """Chebyshev(degree) polynomial smoothing in M^-1 K on
        [cheb_lower, cheb_upper] * lambda_max (Saad, Iterative Methods,
        alg. 12.1, block-Jacobi preconditioned). Cost per degree == one
        damped-Jacobi sweep (1 operator apply + 1 block-Jacobi solve), but
        the optimal polynomial damps the whole smoothing band instead of a
        single-omega slice. x=None means zero initial guess (pre-smoothing:
        saves the initial apply, like the Jacobi path's zeros start).
        Fixed real polynomial + SPD M keeps the V-cycle SPD for CG. All
        recurrence scalars are Python floats (numpy f64 scalars silently
        promote f32 device math to emulated f64 on TPU)."""
        lvl = self.levels[k]
        lm = float(self.lmaxs[k])
        a = self.cheb_lower * lm
        bb = self.cheb_upper * lm
        theta = 0.5 * (bb + a)
        delta = 0.5 * (bb - a)
        sigma = theta / delta
        rho = 1.0 / sigma
        r = b if x is None else b - lvl.op.apply_constrained(x)
        d = (1.0 / theta) * lvl.minv(r)
        for _ in range(degree - 1):
            x = d if x is None else x + d
            r = r - lvl.op.apply_constrained(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * lvl.minv(r)
            rho = rho_new
        return d if x is None else x + d

    def _presmooth(self, k: int, b, sweeps: int):
        if self.smoother == "chebyshev":
            return self._smooth_cheb(k, None, b, sweeps)
        return self._smooth(k, jnp.zeros_like(b), b, sweeps)

    def _postsmooth(self, k: int, x, b, sweeps: int):
        if self.smoother == "chebyshev":
            return self._smooth_cheb(k, x, b, sweeps)
        return self._smooth(k, x, b, sweeps)

    def _vcycle(self, k: int, b: jnp.ndarray) -> jnp.ndarray:
        lvl = self.levels[k]
        if k == len(self.levels) - 1:
            return self._coarse_solve(b)
        sweeps = (self.sweeps[k] if getattr(self, "sweeps", None)
                  else self.n_smooth)
        x = self._presmooth(k, b, sweeps)
        r = b - lvl.op.apply_constrained(x)
        nxt = self.levels[k + 1]
        axes = self._coarsen_axes[k]
        # Ghost padding for odd-cell-count axes: zero-embed the residual
        # into the padded extents before restriction; slice the prolonged
        # correction back (exact adjoints; padded region carries only
        # ghost-masked values).
        pad = self._pad_nodes[k] if self._pad_nodes else (0, 0, 0)
        # Lane padding (gap 0 only): CROP the padded fine residual to the
        # real lattice before restriction; zero-embed the prolonged
        # correction back (exact adjoints — ghost DOFs are fixed and carry
        # no residual).
        crop = (self._crop_nodes if k == 0
                and any(getattr(self, "_crop_nodes", (0, 0, 0)))
                else (0, 0, 0))
        r_full = _join_full(lvl.op, r)
        Px, Py, Pz = lvl.op.grid_shape
        rx, ry, rz = Px - crop[0], Py - crop[1], Pz - crop[2]
        if any(crop):
            r_full = r_full[:, :rx, :ry, :rz]
        if any(pad):
            r_full = jnp.pad(r_full, ((0, 0), (0, pad[0]), (0, pad[1]),
                                      (0, pad[2])))
        r_coarse = _split_full(nxt.op, restrict(r_full, axes)) * nxt.op.free_mask
        e_coarse = self._vcycle(k + 1, r_coarse)
        e_full = prolong(_join_full(nxt.op, e_coarse), axes)
        if any(pad):
            e_full = e_full[:, :rx, :ry, :rz]
        if any(crop):
            e_full = jnp.pad(e_full, ((0, 0), (0, crop[0]), (0, crop[1]),
                                      (0, crop[2])))
        x = x + _split_full(lvl.op, e_full) * lvl.op.free_mask
        return self._postsmooth(k, x, b, sweeps)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        """Preconditioner application M^-1 r (internal layout of the finest
        operator) — pass as M_inv_diag to femx.solve.cg.pcg."""
        return self._vcycle(0, r)

    @property
    def fine_op(self) -> StructuredSolidOperator:
        return self.levels[0].op


def _power_lambda_max(op: StructuredSolidOperator, binv, iters: int = 15) -> float:
    """Power-iteration estimate of lambda_max(M^-1 K) for smoother damping.

    M^-1 K is similar to the symmetric M^-1/2 K M^-1/2 (both SPD), so power
    iteration converges to the top eigenvalue; a 5% pad covers the truncated
    iteration. Runs at setup ENTIRELY ON THE HOST CPU: eagerly dispatching
    ~100 ops per apply through the axon relay (~30 ms per dispatch) was
    measured at minutes of wall time per semi-coarsened hierarchy.

    `binv` must be HOST numpy arrays — reading a device binv back through
    the relay blocked for minutes per phase (measured 580 s setup)."""
    from femx.config import host_compute

    rng = np.random.default_rng(7)
    dt = op.Kcell_host.dtype
    with host_compute():
        hop = dataclasses.replace(op, Kcell=jnp.asarray(op.Kcell_host))
        hop = hop.with_free_mask(jnp.asarray(op.free_mask_host))
        hbinv = [jnp.asarray(np.asarray(b)) for b in binv]  # host -> CPU dev

        @jax.jit
        def step(v):
            w = hop.apply_block_jacobi(hbinv, hop.apply_constrained(v))
            lam = jnp.sqrt(jnp.vdot(w, w).real / jnp.vdot(v, v).real)
            return w / lam, lam

        v = jnp.asarray(rng.standard_normal(hop.ndof).astype(dt))
        lam = 1.0
        for _ in range(iters):
            v, lam_j = step(v)
        lam = float(lam_j)
    return 1.05 * lam


_PROXY_LMAX_CACHE: dict = {}


def _proxy_lambda_max(spacing, nu, dtype, cells: int = 4) -> float:
    """lambda_max(M^-1 K) of the block-Jacobi-preconditioned lattice
    operator, computed on a SMALL all-free proxy lattice with the same
    spacing RATIOS. Valid because the quantity is (a) invariant to global
    scaling of K — E, quadrature weight and uniform spacing scale the
    block-Jacobi M identically — and (b) local: the top of the spectrum
    lives on interior 8-cell node patches, so a 4^3-cell lattice already
    contains the extremal patch (asserted against the direct power
    iteration in tests/test_multigrid.py). Lets chebyshev hierarchies skip
    15 host applies of the full fine operator at 10M+ DOF."""
    smin = min(float(s) for s in spacing)
    ratios = tuple(round(float(s) / smin, 9) for s in spacing)
    key = (ratios, round(float(nu), 12), np.dtype(dtype).name, int(cells))
    if key not in _PROXY_LMAX_CACHE:
        op = StructuredSolidOperator.from_lattice(
            (cells,) * 3, ratios, 1.0, nu, dtype=dtype)
        op = op.with_free_mask(np.ones(op.ndof, dtype=np.float64))
        binv = [np.asarray(b) for b in op.block_jacobi_tensors()]
        _PROXY_LMAX_CACHE[key] = _power_lambda_max(op, binv)
    return _PROXY_LMAX_CACHE[key]


def _dense_structured_K(n_cells, spacing, E, nu, weight,
                        cell_weights=None) -> np.ndarray:
    """Dense f64 lattice stiffness in GLOBAL raster DOF order, assembled by
    overlap-adding the single (81,81) cell matrix with one bincount — pure
    host numpy, ~0.1 s at the 3.7k-DOF coarsest level (replaced a jax
    per-element assembly measured at ~2.3 s of setup).

    cell_weights: optional (nx, ny, nz) per-cell scale (ghost-padded coarse
    levels zero their fully-ghost cells; must match the level operator)."""
    from femx.assembly_structured import _SLOTS, _cell_stiffness

    Kc = _cell_stiffness(tuple(spacing), E, nu, weight, np.float64)
    nx, ny, nz = (int(v) for v in n_cells)
    gy, gz = 2 * ny + 1, 2 * nz + 1
    ndof = 3 * (2 * nx + 1) * gy * gz
    i, j, k = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    slots = np.asarray(_SLOTS)  # (27, 3)
    nodes = (
        (2 * i[..., None] + slots[:, 0]) * gy + (2 * j[..., None] + slots[:, 1])
    ) * gz + (2 * k[..., None] + slots[:, 2])  # (nx, ny, nz, 27) raster ids
    dofs = (3 * nodes[..., None] + np.arange(3)).reshape(-1, 81)  # (ncell, 81)
    lin = (dofs[:, :, None].astype(np.int64) * ndof + dofs[:, None, :]).ravel()
    w = np.broadcast_to(Kc.ravel(), (dofs.shape[0], 81 * 81))
    if cell_weights is not None:
        w = w * np.asarray(cell_weights, dtype=np.float64).reshape(-1, 1)
    return np.bincount(lin, weights=w.ravel(),
                       minlength=ndof * ndof).reshape(ndof, ndof)


def _level_flatten(l: _Level):
    return (l.op, l.binv), ()


def _level_unflatten(_aux, children):
    op, binv = children
    lvl = object.__new__(_Level)
    lvl.op = op
    lvl.binv = binv
    return lvl


jax.tree_util.register_pytree_node(_Level, _level_flatten, _level_unflatten)


def _mg_flatten(mg: StructuredMultigrid):
    children = (mg.levels, mg._coarse_inv)
    aux = (mg.n_smooth, mg.omega, tuple(mg.omegas), tuple(mg._coarsen_axes),
           tuple(getattr(mg, "_pad_nodes", ())),
           None if getattr(mg, "sweeps", None) is None else tuple(mg.sweeps),
           getattr(mg, "smoother", "jacobi"),
           None if getattr(mg, "lmaxs", None) is None else tuple(mg.lmaxs),
           getattr(mg, "cheb_lower", 1.0 / 30.0),
           getattr(mg, "cheb_upper", 1.1),
           tuple(getattr(mg, "_crop_nodes", (0, 0, 0))))
    return children, aux


def _mg_unflatten(aux, children):
    out = object.__new__(StructuredMultigrid)
    out.levels, out._coarse_inv = children
    (out.n_smooth, out.omega, omegas, coarsen, pads, sweeps,
     out.smoother, lmaxs, out.cheb_lower, out.cheb_upper, crop) = aux
    out.omegas = list(omegas)
    out._coarsen_axes = list(coarsen)
    out._pad_nodes = list(pads)
    out.sweeps = None if sweeps is None else list(sweeps)
    out.lmaxs = None if lmaxs is None else list(lmaxs)
    out._crop_nodes = crop
    return out


jax.tree_util.register_pytree_node(StructuredMultigrid, _mg_flatten, _mg_unflatten)
