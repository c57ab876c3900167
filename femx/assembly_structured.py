"""Gather-free structured-grid stiffness operator — the TPU speed-of-light path.

Motivation (measured on the target chip): XLA gather/scatter of the ~30E
element-DOF indices costs ~80 ms per operator application at 1M DOF — 1000x
the bandwidth roofline — making unstructured SpMV formulations hopeless on
TPU. But the solid product's generated geometry is always an axis-aligned
box (the reference's gmsh path creates nothing else, gmsh_creation.py:30),
and on femx's structured Kuhn mesh the Tetra10 node set is exactly the
half-spaced lattice (see StructuredBoxInfo). That turns K@u into:

  1. contiguous slices of 8 parity-phase subgrids (one per cell-local
     lattice slot) — no gathers, no strided access;
  2. ONE constant 81x81 cell-stiffness matmul against (81, n_cells) — MXU;
  3. contiguous slice-adds back (overlap-add) — no scatters.

Layout notes (why phases): a naive (Px,Py,Pz,3) grid puts tiny dims in the
TPU tile minor positions (measured 40x memory-traffic blowup from (8,128)
tile padding). Phase decomposition keeps every hot buffer shaped
(3, sx, sy, sz) or (81, n_cells) with large minor dims, and every slice
stride-1. The operator therefore runs in its own internal DOF ordering
(phase-major, component-major); `to_internal` / `to_global` convert once per
solve on the host.

The 81x81 cell matrix is assembled once from the 6 Tetra10 elements of a
single cell via the exact einsum path (femx.assembly.SolidOperator), so the
structured operator is numerically identical to the unstructured one —
enforced by tests/test_structured.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _material_matrix_np(E_mod, nu) -> np.ndarray:
    """Numpy mirror of elements.tet10.material_matrix (f64)."""
    E_, v_ = float(E_mod), float(nu)
    c1 = E_ / ((1 + v_) * (1 - 2 * v_))
    C = np.full((3, 3), v_)
    np.fill_diagonal(C, 1 - v_)
    out = np.zeros((6, 6))
    out[:3, :3] = C
    out[3, 3] = out[4, 4] = out[5, 5] = (1 - 2 * v_) / 2
    return c1 * out


def _cell_stiffness(spacing, E_mod, nu, weight, dtype) -> np.ndarray:
    """Exact (81, 81) stiffness of one structured cell (6 Tet10 elements),
    in raster order of the 27 cell-local lattice slots x 3 components.

    Pure host numpy (mirrors elements.tet10.element_stiffness in f64):
    routing this one-cell computation through jax triggered ~120 small
    setup-stage compiles, measured at ~4 s of the multigrid setup at
    1.39M DOF — for arrays this size numpy einsum is microseconds."""
    from femx.elements.tet10 import DN_NATURAL, _SEL
    from femx.mesh.generators import box_tet10

    hx, hy, hz = spacing
    cell = box_tet10(hx, hy, hz, mesh_size=max(spacing) * 1.01)
    assert cell.num_nodes == 27, cell.num_nodes
    pts = np.asarray(cell.points, dtype=np.float64)
    conn = np.asarray(cell.cells["tetra10"])  # (6, 10)
    C = _material_matrix_np(E_mod, nu)
    chat = np.einsum("ack,ab,bdl->ckdl", _SEL, C, _SEL)
    coords = pts[conn]  # (6, 10, 3)
    J = np.einsum("gkn,enc->egkc", DN_NATURAL, coords)
    Jinv = np.linalg.inv(J)
    detJ = np.linalg.det(J)
    dN = np.einsum("egkc,gcn->egkn", Jinv, DN_NATURAL)
    wdet = np.where(detJ > 1e-12, detJ, 0.0)
    ke = np.einsum("egki,ckdl,eglj,eg->eicjd", dN, chat, dN,
                   float(weight) * wdet).reshape(6, 30, 30)
    edof = (3 * conn[:, :, None] + np.arange(3)).reshape(6, 30)
    K = np.zeros((81, 81))
    np.add.at(K, (edof[:, :, None], edof[:, None, :]), ke)
    K = 0.5 * (K + K.T)  # enforce exact symmetry before low-precision cast
    return K.astype(dtype)


# The 27 cell-local slots in raster order (a-major), a,b,c in {0,1,2}:
# lattice position = cell*2 + (a,b,c). Slot s = 9a + 3b + c.
_SLOTS = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]


def _inv3x3_np(A: np.ndarray) -> np.ndarray:
    """Vectorized closed-form 3x3 inverse (cofactor columns) for (N, 3, 3).

    np.linalg.inv loops LAPACK per matrix — measured 3.2 s for the 463k
    nodal blocks of the 1.39M-DOF flagship vs ~20 ms for this."""
    a, b, c = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    cb = np.cross(b, c)
    ca = np.cross(c, a)
    ab = np.cross(a, b)
    det = np.einsum("...i,...i->...", a, cb)
    return np.stack([cb, ca, ab], axis=-1) / det[..., None, None]


def _cell_lumped_mass(spacing, rho) -> np.ndarray:
    """(27,) HRZ-lumped nodal masses of one structured cell (6 straight Tet10
    elements), raster slot order. Exact per-cell total: rho * hx*hy*hz.

    The reference has no solid mass at all (modal analysis is beam-only,
    BeamSolver.py:440-455); this feeds femx's large-scale solid modal path."""
    from femx.elements.tet10 import MASS_HAT
    from femx.mesh.generators import box_tet10

    hx, hy, hz = (float(s) for s in spacing)
    cell = box_tet10(hx, hy, hz, mesh_size=max(hx, hy, hz) * 1.01)
    assert cell.num_nodes == 27, cell.num_nodes
    conn = np.asarray(cell.cells["tetra10"])  # (6, 10)
    pts = np.asarray(cell.points)
    c0 = pts[conn[:, 0]]
    vol = np.abs(np.einsum(
        "ei,ei->e",
        pts[conn[:, 1]] - c0,
        np.cross(pts[conn[:, 2]] - c0, pts[conn[:, 3]] - c0),
    )) / 6.0  # (6,) straight-tet volumes
    frac = np.diag(MASS_HAT) / np.diag(MASS_HAT).sum()  # (10,) sums to 1
    lumped = float(rho) * vol[:, None] * frac[None, :]  # (6, 10)
    out = np.zeros(27)
    np.add.at(out, conn.reshape(-1), lumped.reshape(-1))
    return out


@dataclasses.dataclass
class StructuredSolidOperator:
    """Matrix-free K for a structured box Tetra10 mesh.

    Operates on an internal phase-major flat DOF vector; use
    `to_internal`/`to_global` (host-side, once per solve) to convert
    between mesh node order (lattice raster, femx.mesh.box_tet10) and the
    internal layout.

    Registered as a JAX PYTREE (leaves: Kcell, free_mask) so jitted solves
    can take the operator as an argument — closed-over copies become
    compiled-program constants that are re-serialized with every remote
    compile. Host-side caches (_Kcell_host, _perm, ...) do not survive
    flatten/unflatten; they belong to setup-stage code only.
    """

    Kcell: jnp.ndarray  # (81, 81)
    n_cells: Tuple[int, int, int]
    grid_shape: Tuple[int, int, int]
    weight: float
    free_mask: Optional[jnp.ndarray] = None  # internal layout
    spacing: Optional[Tuple[float, float, float]] = None  # cell spacing (mass)
    # Optional per-z-layer cell weight (nz,): cell layer k contributes
    # z_weight[k] * Kcell. Used by the ghost-padded distributed solve
    # (femx.parallel.driver) to make padded cell layers contribute ZERO
    # stiffness — masking padded NODES alone is not enough, because a padded
    # cell still couples the free nodes of the shared boundary plane to each
    # other. 0/1-valued in practice; None means all-ones.
    z_weight: Optional[jnp.ndarray] = None
    # Per-x/y-layer cell weights ((nx,)/(ny,)), same semantics as z_weight.
    # Used by the ghost-padded coarse levels of StructuredMultigrid (odd cell
    # counts are padded up to even before coarsening so the hierarchy never
    # bottoms out on an odd-extent grid; solve/multigrid.py).
    x_weight: Optional[jnp.ndarray] = None
    y_weight: Optional[jnp.ndarray] = None

    # -- construction -------------------------------------------------------
    @classmethod
    def from_mesh(cls, mesh, E_mod, nu, weight=None, dtype=np.float32):
        from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT

        info = mesh.structured
        if info is None:
            raise ValueError("Mesh has no structured-lattice metadata")
        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        Kc = _cell_stiffness(info.spacing, E_mod, nu, weight, dtype)
        out = cls(
            Kcell=jnp.asarray(Kc),
            n_cells=info.n_cells,
            grid_shape=info.grid_shape,
            weight=float(weight),
            spacing=tuple(float(s) for s in info.spacing),
        )
        object.__setattr__(out, "_Kcell_host", Kc)
        return out

    @classmethod
    def from_lattice(cls, n_cells, spacing, E_mod, nu, weight=None, dtype=np.float32):
        """Build directly from (n_cells, spacing) — no Mesh object needed.

        The operator is fully determined by the cell stiffness (a function of
        spacing/material only) and the lattice extents, so hierarchy levels
        (multigrid) can be constructed without re-meshing.
        """
        from femx.elements.tet10 import GAUSS_WEIGHT_CORRECT

        if weight is None:
            weight = GAUSS_WEIGHT_CORRECT
        n = tuple(int(v) for v in n_cells)
        sp = tuple(float(s) for s in spacing)
        Kc = _cell_stiffness(sp, E_mod, nu, weight, dtype)
        out = cls(
            Kcell=jnp.asarray(Kc),
            n_cells=n,
            grid_shape=tuple(2 * c + 1 for c in n),
            weight=float(weight),
            spacing=sp,
        )
        object.__setattr__(out, "_Kcell_host", Kc)
        return out

    def coarsened(self, factor: Sequence[int] = (2, 2, 2)) -> "StructuredSolidOperator":
        """The operator on a lattice coarsened by `factor` per axis.

        For uniform factor (2,2,2) the cell stiffness rescales EXACTLY:
        under x -> a x, B -> B/a and dV -> a^3 dV, so K -> a K. Anisotropic
        (semi-)coarsening changes the spacing ratio, so the cell matrix
        cannot be rescaled; callers must rebuild via from_lattice then
        (only the uniform case is used by StructuredMultigrid's fast path).
        """
        if tuple(factor) != (2, 2, 2):
            raise ValueError("exact rescaling only valid for uniform 2x coarsening")
        n = tuple(c // f for c, f in zip(self.n_cells, factor))
        if any(c * f != cf for c, f, cf in zip(n, factor, self.n_cells)):
            raise ValueError(f"cell counts {self.n_cells} not divisible by {factor}")
        Kc = 2.0 * self.Kcell_host
        out = StructuredSolidOperator(
            Kcell=jnp.asarray(Kc),
            n_cells=n,
            grid_shape=tuple(2 * c + 1 for c in n),
            weight=self.weight,
            spacing=None if self.spacing is None
            else tuple(s * f for s, f in zip(self.spacing, factor)),
        )
        object.__setattr__(out, "_Kcell_host", Kc)
        return out

    # -- layout bookkeeping --------------------------------------------------
    # Host-side mirrors: on the axon-tunneled TPU, EVERY device->host
    # readback (np.asarray of a device array) costs ~2 s through the relay —
    # measured 90 s of a 113 s multigrid setup. Setup-stage math therefore
    # runs exclusively on cached numpy copies.
    @property
    def Kcell_host(self) -> np.ndarray:
        if not hasattr(self, "_Kcell_host"):
            object.__setattr__(self, "_Kcell_host", np.asarray(self.Kcell))
        return self._Kcell_host

    @property
    def free_mask_host(self) -> np.ndarray:
        if not hasattr(self, "_free_mask_host"):
            object.__setattr__(self, "_free_mask_host", np.asarray(self.free_mask))
        return self._free_mask_host

    @property
    def ndof(self) -> int:
        P = self.grid_shape
        return 3 * P[0] * P[1] * P[2]

    @property
    def n_nodes(self) -> int:
        return self.ndof // 3

    def _phase_shapes(self) -> List[Tuple[int, int, int]]:
        nx, ny, nz = self.n_cells
        out = []
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    out.append((nx + 1 - px, ny + 1 - py, nz + 1 - pz))
        return out

    def _phase_offsets(self) -> List[int]:
        offs = [0]
        for s in self._phase_shapes():
            offs.append(offs[-1] + 3 * s[0] * s[1] * s[2])
        return offs

    def _permutation(self) -> np.ndarray:
        """perm[internal_idx] = global dof index (3*node + comp), where node
        ids are the mesher's lattice raster order."""
        Px, Py, Pz = self.grid_shape
        perm = np.empty(self.ndof, dtype=np.int64)
        pos = 0
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    p = np.arange(px, Px, 2)
                    q = np.arange(py, Py, 2)
                    r = np.arange(pz, Pz, 2)
                    P_, Q_, R_ = np.meshgrid(p, q, r, indexing="ij")
                    nodes = (P_ * Py + Q_) * Pz + R_  # lattice raster node id
                    count = nodes.size
                    for comp in range(3):
                        perm[pos : pos + count] = 3 * nodes.ravel() + comp
                        pos += count
        return perm

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        """Global (3*node+comp) vector -> internal phase-major vector (host)."""
        if not hasattr(self, "_perm"):
            object.__setattr__(self, "_perm", self._permutation())
        return np.asarray(x)[self._perm]

    def to_global(self, y: np.ndarray) -> np.ndarray:
        if not hasattr(self, "_perm"):
            object.__setattr__(self, "_perm", self._permutation())
        out = np.empty_like(np.asarray(y))
        out[self._perm] = np.asarray(y)
        return out

    def astype(self, dtype) -> "StructuredSolidOperator":
        """The same operator with Kcell/free_mask cast (host-side, no device
        readbacks). Used to build the float64 residual operator for
        mixed-precision iterative refinement (solve.cg.pcg_refined)."""
        dt = np.dtype(dtype)
        if dt == np.dtype(self.Kcell.dtype):
            return self
        Kc = self.Kcell_host.astype(dt)
        out = dataclasses.replace(self, Kcell=jnp.asarray(Kc))
        object.__setattr__(out, "_Kcell_host", Kc)
        if hasattr(self, "_perm"):
            object.__setattr__(out, "_perm", self._perm)
        if self.free_mask is not None:
            m = self.free_mask_host.astype(dt)
            object.__setattr__(out, "free_mask", jnp.asarray(m))
            object.__setattr__(out, "_free_mask_host", m)
        return out

    def with_free_mask(self, free_mask_internal) -> "StructuredSolidOperator":
        dt = np.dtype(self.Kcell.dtype)
        out = dataclasses.replace(
            self, free_mask=jnp.asarray(free_mask_internal, dtype=dt)
        )
        # carry host-side caches; stash the mask's host copy when given one
        for attr in ("_Kcell_host", "_perm"):
            if hasattr(self, attr):
                object.__setattr__(out, attr, getattr(self, attr))
        if isinstance(free_mask_internal, np.ndarray):
            object.__setattr__(out, "_free_mask_host",
                               free_mask_internal.astype(dt, copy=False))
        return out

    # -- core ---------------------------------------------------------------
    def _split_phases(self, u: jnp.ndarray) -> List[jnp.ndarray]:
        shapes = self._phase_shapes()
        offs = self._phase_offsets()
        return [
            u[offs[i] : offs[i + 1]].reshape(3, *shapes[i]) for i in range(8)
        ]

    def _join_phases(self, grids: List[jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate([g.reshape(-1) for g in grids])

    def apply(self, u: jnp.ndarray, z_weight=None) -> jnp.ndarray:
        """K @ u (internal layout).

        z_weight overrides self.z_weight (per-z-layer cell weights) — the
        halo path passes each device's slab slice explicitly.

        Set FEMX_PALLAS_APPLY=1 to route the gather+matmul stage through the
        fused Pallas kernel (femx.elements.pallas_structured; measured at
        parity with this XLA formulation on v5e — kept opt-in)."""
        import os

        zw = self.z_weight if z_weight is None else z_weight
        if (os.environ.get("FEMX_STRUCTURED_APPLY") == "conv" and zw is None
                and self.x_weight is None and self.y_weight is None):
            # Conv-form stencil (femx.assembly_conv): one 3x3x3 24-channel
            # correlation instead of the (81, C) slot stack — pending the
            # on-chip A/B (examples/bench_conv_apply.py). The 26 boundary
            # corrections cost ~50 extra tiny kernels per apply, so small
            # grids (coarse MG levels) keep slot form below the cell gate.
            # f64 convs don't lower on TPU, so the refinement residual op
            # keeps slot form there too.
            nxc, nyc, nzc = self.n_cells
            gate = int(os.environ.get("FEMX_CONV_MIN_CELLS", "16384"))
            if nxc * nyc * nzc >= gate and (
                    self.Kcell.dtype != jnp.float64
                    or jax.default_backend() == "cpu"):
                from femx.assembly_conv import apply_conv

                return apply_conv(self, u)
        if (os.environ.get("FEMX_PALLAS_APPLY") == "1" and zw is None
                and jax.default_backend() != "cpu"):
            from femx.elements.pallas_structured import (
                apply_structured_pallas,
                ensure_tpu_compile_env,
                pallas_applicable,
            )

            for cx in (4, 2, 1):
                if pallas_applicable(self.n_cells, cx):
                    ensure_tpu_compile_env()
                    return apply_structured_pallas(self, u, cx=cx)
        nx, ny, nz = self.n_cells
        C = nx * ny * nz
        phases = self._split_phases(u)
        slots = []
        for (a, b, c) in _SLOTS:
            pidx = (a % 2) * 4 + (b % 2) * 2 + (c % 2)
            ia, jb, kc = a // 2, b // 2, c // 2
            slots.append(phases[pidx][:, ia : ia + nx, jb : jb + ny, kc : kc + nz])
        ue = jnp.stack(slots).reshape(81, C)  # (27,3,nx,ny,nz) -> (81, C)
        # HIGHEST: TPU matmuls default to bf16 multiplication, whose 8-bit
        # mantissa breaks the operator's symmetry enough to diverge CG.
        fe = jax.lax.dot(
            self.Kcell, ue, precision=jax.lax.Precision.HIGHEST
        ).reshape(27, 3, nx, ny, nz)
        if self.x_weight is not None:
            fe = fe * jnp.asarray(self.x_weight, dtype=fe.dtype)[:, None, None]
        if self.y_weight is not None:
            fe = fe * jnp.asarray(self.y_weight, dtype=fe.dtype)[:, None]
        if zw is not None:
            fe = fe * jnp.asarray(zw, dtype=fe.dtype)
        return self._join_phases(self._overlap_add(fe, phases))

    def _overlap_add(self, fe: jnp.ndarray, phases: List[jnp.ndarray]):
        """Per-phase overlap-add of the 27 slot results as SUMS OF PADDED
        SLICES: each output phase is written exactly once (XLA fuses the
        pads+adds into one pass), instead of 27 sequential in-place
        .at[].add updates whose read-modify-write traffic (~27 full output
        buffers) dominated the apply (measured 0.88 ms vs the ~0.2 ms
        bandwidth roofline at 1.39M DOF)."""
        nx, ny, nz = self.n_cells
        out = []
        for pidx in range(8):
            px, py, pz = pidx // 4, (pidx // 2) % 2, pidx % 2
            sx, sy, sz = phases[pidx].shape[1:]
            acc = None
            for s, (a, b, c) in enumerate(_SLOTS):
                if ((a % 2), (b % 2), (c % 2)) != (px, py, pz):
                    continue
                ia, jb, kc = a // 2, b // 2, c // 2
                piece = jnp.pad(fe[s], (
                    (0, 0),
                    (ia, sx - nx - ia),
                    (jb, sy - ny - jb),
                    (kc, sz - nz - kc),
                ))
                acc = piece if acc is None else acc + piece
            out.append(acc)
        return out

    def apply_constrained(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.free_mask
        v = self.apply(u * s) * s
        return v + u * (1.0 - s)

    # -- pytree-of-phases interface (multi-chip / GSPMD path) ---------------
    # Each phase grid (3, sx, sy, sz) can carry its own NamedSharding (e.g.
    # sharded along z); the slot slices/overlap-adds below then partition
    # under jit into local slices + XLA-inserted halo exchanges over ICI —
    # the structured-mesh analogue of sequence/context parallelism.
    def mask_phases(self):
        return self._split_phases_list(self.free_mask)

    def _split_phases_list(self, u: jnp.ndarray):
        return self._split_phases(u)

    def apply_phases(self, phases):
        """K @ u on a list of 8 phase grids; returns the same structure."""
        nx, ny, nz = self.n_cells
        C = nx * ny * nz
        slots = []
        for (a, b, c) in _SLOTS:
            pidx = (a % 2) * 4 + (b % 2) * 2 + (c % 2)
            ia, jb, kc = a // 2, b // 2, c // 2
            slots.append(phases[pidx][:, ia : ia + nx, jb : jb + ny, kc : kc + nz])
        ue = jnp.stack(slots).reshape(81, C)
        fe = jax.lax.dot(
            self.Kcell, ue, precision=jax.lax.Precision.HIGHEST
        ).reshape(27, 3, nx, ny, nz)
        return self._overlap_add(fe, phases)

    def apply_constrained_phases(self, phases):
        m = self.mask_phases()
        masked = [p * s for p, s in zip(phases, m)]
        v = self.apply_phases(masked)
        return [vi * s + p * (1.0 - s) for vi, s, p in zip(v, m, phases)]

    def _cell_weight_host(self) -> Optional[np.ndarray]:
        """(nx, ny, nz) combined per-cell weight on host, or None if all-ones.

        Product of the optional per-axis layer weights (x_weight/y_weight/
        z_weight); setup-stage only (preconditioner/mass assembly)."""
        if self.x_weight is None and self.y_weight is None \
                and self.z_weight is None:
            return None
        nx, ny, nz = self.n_cells

        def ax(w, n):
            return (np.ones(n) if w is None
                    else np.asarray(w, dtype=np.float64))

        return (ax(self.x_weight, nx)[:, None, None]
                * ax(self.y_weight, ny)[None, :, None]
                * ax(self.z_weight, nz)[None, None, :])

    # -- preconditioning ----------------------------------------------------
    def block_diagonal_internal(self) -> np.ndarray:
        """(n_nodes, 3, 3) nodal diagonal blocks, nodes in internal order.

        Returned as a HOST numpy array: this is setup-stage data consumed by
        host-side preconditioner construction (a device round-trip here costs
        seconds through the axon relay)."""
        nx, ny, nz = self.n_cells
        Kc = self.Kcell_host.reshape(27, 3, 27, 3)
        cw = self._cell_weight_host()  # None or (nx, ny, nz)
        shapes = self._phase_shapes()
        grids = [np.zeros((s[0], s[1], s[2], 3, 3), dtype=Kc.dtype) for s in shapes]
        for s, (a, b, c) in enumerate(_SLOTS):
            pidx = (a % 2) * 4 + (b % 2) * 2 + (c % 2)
            ia, jb, kc = a // 2, b // 2, c // 2
            contrib = Kc[s, :, s, :]
            if cw is not None:
                contrib = cw[:, :, :, None, None] * contrib
            grids[pidx][ia : ia + nx, jb : jb + ny, kc : kc + nz] += contrib
        return np.concatenate([g.reshape(-1, 3, 3) for g in grids])

    def diagonal(self) -> jnp.ndarray:
        """diag(K) in internal layout (components grouped per phase)."""
        bd = self.block_diagonal_internal()
        shapes = self._phase_shapes()
        parts = []
        pos = 0
        for s in shapes:
            cnt = s[0] * s[1] * s[2]
            blk = bd[pos : pos + cnt]
            pos += cnt
            parts.append(np.stack([blk[:, c, c] for c in range(3)]).reshape(-1))
        return jnp.asarray(np.concatenate(parts))

    def constrained_diagonal(self) -> jnp.ndarray:
        s = self.free_mask
        return self.diagonal() * s + (1.0 - s)

    def lumped_mass_diagonal(self, rho: float) -> np.ndarray:
        """(ndof,) HRZ-lumped mass diagonal, INTERNAL layout, host numpy.

        Every cell contributes the same (27,) slot masses (uniform lattice),
        so assembly is a constant overlap-add per slot slice — no per-element
        work. Total mass is exactly rho * box volume per component."""
        if self.spacing is None:
            raise ValueError("operator has no spacing metadata (needed for mass)")
        nx, ny, nz = self.n_cells
        mcell = _cell_lumped_mass(self.spacing, rho)  # (27,)
        cw = self._cell_weight_host()
        cw = 1.0 if cw is None else cw
        shapes = self._phase_shapes()
        grids = [np.zeros(s) for s in shapes]
        for s_idx, (a, b, c) in enumerate(_SLOTS):
            pidx = (a % 2) * 4 + (b % 2) * 2 + (c % 2)
            ia, jb, kc = a // 2, b // 2, c // 2
            grids[pidx][ia : ia + nx, jb : jb + ny, kc : kc + nz] += mcell[s_idx] * cw
        parts = [np.broadcast_to(g, (3,) + g.shape).reshape(-1) for g in grids]
        return np.concatenate(parts)

    def block_jacobi_tensors(self) -> List[np.ndarray]:
        """Per-phase (3, 3, cnt) inverse nodal blocks (host numpy, once).

        Data for `apply_block_jacobi` — kept separate so callers can thread
        the tensors through jit as ARGUMENTS (a closed-over copy becomes a
        compiled-program constant that is serialized with every remote
        compile; ~16 MB at 1.4M DOF)."""
        bd = self.block_diagonal_internal()  # (n_nodes, 3, 3) host
        shapes = self._phase_shapes()
        offs = self._phase_offsets()
        # constrain blocks with the mask, then invert per node (host, once)
        mask = self.free_mask_host
        mask3 = np.concatenate([
            mask[offs[i] : offs[i + 1]].reshape(3, -1).T
            for i in range(8)
        ])  # (n_nodes, 3) in internal node order
        binv = constrained_block_inverse(bd, mask3)
        out = []
        node_pos = 0
        for s in shapes:
            cnt = s[0] * s[1] * s[2]
            out.append(np.ascontiguousarray(
                np.transpose(binv[node_pos : node_pos + cnt], (1, 2, 0))
            ))
            node_pos += cnt
        return out

    def apply_block_jacobi(self, binv_phases, r):
        """r -> M^-1 r given `block_jacobi_tensors` output (jit-friendly)."""
        shapes = self._phase_shapes()
        offs = self._phase_offsets()
        outs = []
        for i in range(8):
            cnt = shapes[i][0] * shapes[i][1] * shapes[i][2]
            rp = r[offs[i] : offs[i + 1]].reshape(3, cnt)
            B = binv_phases[i]
            z = jnp.stack([
                B[0, 0] * rp[0] + B[0, 1] * rp[1] + B[0, 2] * rp[2],
                B[1, 0] * rp[0] + B[1, 1] * rp[1] + B[1, 2] * rp[2],
                B[2, 0] * rp[0] + B[2, 1] * rp[1] + B[2, 2] * rp[2],
            ])
            outs.append(z.reshape(-1))
        return jnp.concatenate(outs)

    def block_jacobi_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """r -> M^-1 r; internal layout, phase-wise contiguous math.

        Closure form (tensors embedded as jit constants) — convenient for
        small problems; large jitted solves should pass
        `block_jacobi_tensors()` as arguments and call `apply_block_jacobi`.
        """
        binv_phases = [jnp.asarray(b) for b in self.block_jacobi_tensors()]
        return lambda r: self.apply_block_jacobi(binv_phases, r)


def constrained_block_inverse(bd: np.ndarray, mask3: np.ndarray) -> np.ndarray:
    """Invert per-node 3x3 diagonal blocks under a DOF mask (host, once).

    Masked rows/columns are zeroed and fixed diagonal entries replaced by
    identity before inversion, so fixed DOFs map r -> r and free DOFs get
    the constrained block inverse. The single implementation shared by the
    single-device, halo-distributed and DOF-sharded block-Jacobi builders
    (three divergent copies of this masking invited drift).

    Args: bd (n, 3, 3) nodal blocks; mask3 (n, 3) 1/0 free mask.
    """
    blk = bd.copy()
    blk *= mask3[:, :, None] * mask3[:, None, :]
    blk += (1.0 - mask3)[:, :, None] * np.eye(3, dtype=bd.dtype)
    return _inv3x3_np(blk)


def conv_routing_active(op: StructuredSolidOperator) -> bool:
    """Whether apply() would route `op` through the conv-form stencil.

    Mirrors the gate in apply() so callers (solve_info reporting) can
    record the EFFECTIVE apply form instead of the requested one: the env
    flag, no layer weights, the FEMX_CONV_MIN_CELLS size gate, and the
    f64-on-TPU fallback."""
    import os

    if os.environ.get("FEMX_STRUCTURED_APPLY") != "conv":
        return False
    if (op.z_weight is not None or op.x_weight is not None
            or op.y_weight is not None):
        return False
    nxc, nyc, nzc = op.n_cells
    if nxc * nyc * nzc < int(os.environ.get("FEMX_CONV_MIN_CELLS", "16384")):
        return False
    return (op.Kcell.dtype != jnp.float64
            or jax.default_backend() == "cpu")


def lane_friendly_nz(nz: int) -> int:
    """Next z cell count whose fine apply lane-tiles at full rate on TPU.

    Measured (examples/bench_apply_shapes.py, v5e): the slot apply runs
    ~11 ns/cell when nz <= 224 or nz % 128 == 0, and ~24 ns/cell otherwise
    (288/320/352/416/448 all slow; 224/256/384/512/640 fast; independent
    of nx/ny). Padding nz up to the next multiple of 128 costs at most a
    1.14x larger lattice (worst case 225 -> 256) for a 2.2x faster apply,
    so it always wins in the slow regime. Padded cells are ghost cells: zero z_weight
    (no stiffness) + fixed DOFs, so the solution on the real lattice is
    unchanged (tests/test_lane_pad.py).

    Env override FEMX_LANE_PAD: "off"/"0" disables; "force:<m>" pads nz to
    the next multiple of <m> on ANY backend (CPU tests drive the padded
    path this way); default "auto" applies the measured TPU rule on TPU
    only.
    """
    import os

    nz = int(nz)
    mode = os.environ.get("FEMX_LANE_PAD", "auto")
    if mode in ("0", "off"):
        return nz
    if mode.startswith("force:"):
        m = int(mode.split(":", 1)[1])
        return ((nz + m - 1) // m) * m
    if jax.default_backend() != "tpu":
        return nz
    if nz <= 224 or nz % 128 == 0:
        return nz
    return ((nz // 128) + 1) * 128


def pad_z_raster(v_global: np.ndarray, grid_old, grid_new) -> np.ndarray:
    """Embed a global raster DOF vector into a z-padded lattice (zeros in
    the padded planes). grid_* are NODE extents (2*cells+1)."""
    gx, gy, gz = grid_old
    g = np.asarray(v_global).reshape(gx, gy, gz, 3)
    out = np.zeros((gx, gy, grid_new[2], 3), dtype=g.dtype)
    out[:, :, :gz] = g
    return out.reshape(-1)


def unpad_z_raster(v_global_p: np.ndarray, grid_old, grid_new) -> np.ndarray:
    """Inverse of pad_z_raster: slice the real lattice back out."""
    gx, gy, gz = grid_old
    g = np.asarray(v_global_p).reshape(gx, gy, grid_new[2], 3)
    return np.ascontiguousarray(g[:, :, :gz]).reshape(-1)


def _structured_op_flatten(op: StructuredSolidOperator):
    children = (op.Kcell, op.free_mask, op.z_weight, op.x_weight, op.y_weight)
    aux = (op.n_cells, op.grid_shape, op.weight, op.spacing)
    return children, aux


def _structured_op_unflatten(aux, children):
    Kcell, free_mask, z_weight, x_weight, y_weight = children
    n_cells, grid_shape, weight, spacing = aux
    op = object.__new__(StructuredSolidOperator)
    object.__setattr__(op, "Kcell", Kcell)
    object.__setattr__(op, "free_mask", free_mask)
    object.__setattr__(op, "z_weight", z_weight)
    object.__setattr__(op, "x_weight", x_weight)
    object.__setattr__(op, "y_weight", y_weight)
    object.__setattr__(op, "n_cells", n_cells)
    object.__setattr__(op, "grid_shape", grid_shape)
    object.__setattr__(op, "weight", weight)
    object.__setattr__(op, "spacing", spacing)
    return op


jax.tree_util.register_pytree_node(
    StructuredSolidOperator, _structured_op_flatten, _structured_op_unflatten
)
