"""Conv-form structured apply: K @ u as ONE 3x3x3, 24-channel convolution.

The slot-form apply (`assembly_structured.StructuredSolidOperator.apply`)
materializes the (81, C) slot stack and the (27*3, C) per-cell result —
several times the minimum HBM traffic of "read u once, write out once"
(measured 0.17 ms/apply at 1.39M DOF vs a ~0.04 ms in/out roofline, and
falling further off its own roofline at 50M DOF). The same operator,
viewed on the CELL lattice, is a constant-coefficient 27-point BLOCK
stencil: space-to-depth the 8 parity phases into 24 channels (8 phases x
3 components) on the (nx+1, ny+1, nz+1) cell grid, and K @ u becomes a
single 3x3x3 cross-correlation with a constant (24, 24, 3, 3, 3) kernel
derived from the 81x81 cell matrix. One read of u, one write of out, and
the contraction runs on the MXU.

Boundary closure: the free-space conv sums over ALL integer cells; cells
outside [0, n-1] per axis ("phantom" layers q = -1 and q = n) overcount
exactly those terms whose reads AND writes both land on real boundary
nodes (everything else reads conv zero-padding / zero-filled phase tails
or writes outside the output grid). Phantom layer q = -1 survives only
with slot offsets (so, si) = (2, 2) on that axis (the low node plane);
q = n only with (0, 0) (the high node plane) — single-tap, phase-bit-0
channels. The union over the 6 phantom slabs is corrected by
inclusion-exclusion over the 26 nonempty face/edge/corner constraint
combinations, each a plane/line/point-restricted conv whose kernel is
enumerated by the same (so, si) -> (channel, tap) mapping.

The kernels are built IN-JIT from the Kcell pytree leaf (constant numpy
index tables + one flat gather + segment-sum), so jitted solves can keep
taking the operator as an argument (closed-over device arrays become
compiled-program constants — see assembly_structured docstring). The
build is loop-invariant and XLA hoists it: a compiled fori_loop of
applies has ZERO scatter/segment ops inside the while body (verified on
the optimized HLO; all 53 build ops sit in the entry computation).

Reference context: the reference assembles a scipy CSR matrix and calls
spsolve (ReactionSolver.py:196-205); this is the traffic-optimal TPU form
of the same K for the matrix-free MG-PCG replacement. Opt-in via
FEMX_STRUCTURED_APPLY=conv pending an on-chip A/B vs the slot form
(examples/tpu_revalidation.py job "conv_ab").

Distributed paths: UNWEIGHTED slab-local applies (the halo path when no
ghost padding is active) route conv like any other apply — the conv form
is the same matrix on the slab-local lattice and pure local lax ops, so
it is shard_map-safe (equality test:
test_distributed_pipeline.py::test_pipeline_devices_conv_apply_matches).
WEIGHTED applies (ghost-padded layers) stay slot-form: per-layer cell
weights make the stencil position-dependent, and under shard_map the
weight values differ per device while the traced program must be
uniform, so neither a truncated-lattice rewrite nor value-dependent
layer corrections can work. The slot form's elementwise fe scaling
handles this for free.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Slot offsets in half-lattice units, matching assembly_structured._SLOTS:
# slot index s = 9a + 3b + c, Kcell row/col index = 3*s + component.
_OFFSETS = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]

# Per-axis constraint modes: F = free (interior conv axis, 3 taps),
# L = phantom cell layer q = -1 (low node plane, slot offsets (2, 2)),
# H = phantom cell layer q = n (high node plane, slot offsets (0, 0)).
_AXIS_MODES = ("F", "L", "H")


def _conforms(mode: str, a: int, ap: int) -> bool:
    if mode == "F":
        return True
    if mode == "L":
        return a == 2 and ap == 2
    return a == 0 and ap == 0  # "H"


def _restricted_channels(mode3: Tuple[str, str, str]) -> List[int]:
    """Channels (3*phase + comp) whose phase bit is 0 on constrained axes."""
    chans = []
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                bits = (px, py, pz)
                if any(m != "F" and b != 0 for m, b in zip(mode3, bits)):
                    continue
                pidx = 4 * px + 2 * py + pz
                chans.extend(3 * pidx + c for c in range(3))
    return chans


@lru_cache(maxsize=None)
def _kernel_tables():
    """Constant tables mapping Kcell.flat entries into each mode's kernel.

    Returns {mode3: (cho, chi, kshape, src_flat, dst_flat, nseg)} where
    kernel_S.flat[dst] = segment_sum(Kcell.flat[src], dst) and kshape is
    (len(cho), len(chi), *3-per-free-axis).
    """
    tables = {}
    for mx in _AXIS_MODES:
        for my in _AXIS_MODES:
            for mz in _AXIS_MODES:
                mode3 = (mx, my, mz)
                cho = _restricted_channels(mode3)
                chi = cho  # same restriction on both sides
                cho_pos = {c: i for i, c in enumerate(cho)}
                free = [ax for ax, m in enumerate(mode3) if m == "F"]
                kshape = (len(cho), len(chi)) + (3,) * len(free)
                src, dst = [], []
                for so_i, so in enumerate(_OFFSETS):
                    for si_i, si in enumerate(_OFFSETS):
                        if not all(_conforms(m, so[ax], si[ax])
                                   for ax, m in enumerate(mode3)):
                            continue
                        po = 4 * (so[0] % 2) + 2 * (so[1] % 2) + (so[2] % 2)
                        pi = 4 * (si[0] % 2) + 2 * (si[1] % 2) + (si[2] % 2)
                        taps = tuple(si[ax] // 2 - so[ax] // 2 + 1
                                     for ax in free)
                        for co in range(3):
                            o = cho_pos.get(3 * po + co)
                            if o is None:
                                continue
                            for ci in range(3):
                                i = cho_pos.get(3 * pi + ci)
                                if i is None:
                                    continue
                                d = (o, i) + taps
                                dst.append(int(np.ravel_multi_index(d, kshape)))
                                src.append((3 * so_i + co) * 81 + 3 * si_i + ci)
                tables[mode3] = (
                    tuple(cho), tuple(chi), kshape,
                    np.asarray(src, dtype=np.int32),
                    np.asarray(dst, dtype=np.int32),
                    int(np.prod(kshape)),
                )
    return tables


def build_kernels(Kcell: jnp.ndarray) -> Dict[Tuple[str, str, str], jnp.ndarray]:
    """All 27 conv kernels from the (81, 81) cell matrix (traceable)."""
    flat = Kcell.reshape(-1)
    out = {}
    for mode3, (cho, chi, kshape, src, dst, nseg) in _kernel_tables().items():
        vals = flat[src]
        out[mode3] = jax.ops.segment_sum(
            vals, dst, num_segments=nseg
        ).reshape(kshape)
    return out


def _correlate(sub: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate (Ci, *spatial) with (Co, Ci, *3s), SAME padding."""
    nfree = sub.ndim - 1
    if nfree == 0:
        return W @ sub
    spatial = "DHW"[3 - nfree:]
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)
    return jax.lax.conv_general_dilated(
        sub[None], W, (1,) * nfree, [(1, 1)] * nfree,
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST,
    )[0]


def apply_conv(op, u: jnp.ndarray) -> jnp.ndarray:
    """K @ u (internal phase-major layout) via the conv-form stencil.

    Only valid for the unweighted operator (x/y/z_weight all None): the
    per-layer ghost weights make the stencil position-dependent, which is
    exactly what a convolution cannot express. Callers (apply) enforce it.
    """
    nx, ny, nz = op.n_cells
    X, Y, Z = nx + 1, ny + 1, nz + 1
    phases = op._split_phases(u)
    # Space-to-depth: 24 channels on the uniform (nx+1, ny+1, nz+1) cell
    # grid; phase-1 tails are ZERO-filled (the boundary closure relies on
    # reading exact zeros there).
    U = jnp.concatenate([
        jnp.pad(p, ((0, 0), (0, X - p.shape[1]), (0, Y - p.shape[2]),
                    (0, Z - p.shape[3])))
        for p in phases
    ])
    kernels = build_kernels(op.Kcell)
    Wf = kernels[("F", "F", "F")].astype(u.dtype)
    out = _correlate(U, Wf)
    # Inclusion-exclusion boundary closure: out_true = full
    # + sum_{S nonempty} (-1)^{|S|} E(S) over the 26 face/edge/corner
    # constraint combinations.
    extents = (X, Y, Z)
    for mode3, W in kernels.items():
        ncon = sum(m != "F" for m in mode3)
        if ncon == 0:
            continue
        cho = _kernel_tables()[mode3][0]
        idx = tuple(
            slice(None) if m == "F" else (0 if m == "L" else extents[ax] - 1)
            for ax, m in enumerate(mode3)
        )
        sub = U[np.asarray(cho, dtype=np.int32)][(slice(None),) + idx]
        corr = _correlate(sub, W.astype(u.dtype))
        sign = -1.0 if ncon % 2 else 1.0
        out = out.at[(np.asarray(cho, dtype=np.int32),) + idx].add(sign * corr)
    pieces = [
        out[3 * p : 3 * p + 3, : ph.shape[1], : ph.shape[2], : ph.shape[3]]
        for p, ph in enumerate(phases)
    ]
    return jnp.concatenate([g.reshape(-1) for g in pieces])
