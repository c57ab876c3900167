"""Pallas TPU kernel: fused slot-gather + cell-stiffness matmul.

The structured apply's inner loop (femx.assembly_structured) is
  ue = stack(27 phase-grid slices) -> (81, C);  fe = Kcell @ ue
which in XLA materializes the (81, C) gather buffer in HBM between the two
steps. This kernel fuses them: per x-chunk of cells the Pallas pipeline
streams the 8 phase slabs HBM->VMEM (double-buffered automatically), the 27
slot slices happen inside VMEM, and the MXU consumes them directly against
the VMEM-resident 81x81 cell matrix, writing only the (81, chunk) result
block back.

Chunking is along x because Mosaic requires the last two block dims to tile
(8, 128)-aligned or stay whole: y/z stay whole in VMEM, x is blocked. Chunk
windows overlap one lattice plane along x (cells [i0, i0+CX) read x-planes
[i0, i0+CX]); BlockSpec tiling cannot overlap, so each px=0 phase is passed
twice — a CX-plane body block plus a 1-plane boundary block whose block
index addresses the exact element plane (block size 1 => block index ==
element index) — and the kernel concatenates them.

`interpret=True` runs the kernel on CPU for tests; equality with the XLA
path is enforced by tests/test_pallas.py.

STATUS: interpret-mode validated (bit-exact vs the XLA apply). The Mosaic
compiler on this deployment rejects several otherwise-standard lowering
patterns the kernel needs (shape-casts merging lane dims, dynamic_slice on
values, and a residual `func.return` legalization failure on the strip-loop
variant), so the compiled-TPU path is not enabled in production; the XLA
formulation in femx.assembly_structured remains the default (and already
exceeds the performance target by >12x). Revisit when the runtime's
jax/mosaic version advances.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from femx.assembly_structured import _SLOTS


def pallas_applicable(n_cells: Tuple[int, int, int], cx: int) -> bool:
    nx, _ny, _nz = n_cells
    return nx % cx == 0


def structured_cell_matmul(
    phases: List[jnp.ndarray],
    kcell: jnp.ndarray,
    n_cells: Tuple[int, int, int],
    cx: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused slot-gather + (81,81)@(81,C) matmul over x-chunks of cells.

    Args:
      phases: 8 phase grids (3, sx_p, sy, sz), px-major order (as produced
        by StructuredSolidOperator._split_phases).
      kcell: (81, 81) cell stiffness.
      n_cells: (nx, ny, nz); nx must be divisible by cx, and cx*ny*nz must
        be 128-aligned (or cover all cells) for Mosaic lowering.
    Returns:
      fe with shape (n_chunks, 81, cx*ny*nz): per-chunk result blocks,
      cell index (x-within-chunk major, y, z minor).
    """
    nx, ny, nz = n_cells
    if nx % cx:
        raise ValueError(f"nx={nx} must be divisible by the chunk size cx={cx}")
    n_chunks = nx // cx
    c_chunk = cx * ny * nz

    body0 = [phases[i] for i in (0, 1, 2, 3)]  # px = 0 phases (sx = nx+1)
    body1 = [phases[i] for i in (4, 5, 6, 7)]  # px = 1 phases (sx = nx)

    def spec_body(g):
        sy, sz = g.shape[2], g.shape[3]
        return pl.BlockSpec((3, cx, sy, sz), index_map=lambda k: (0, k, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_plane(g):
        sy, sz = g.shape[2], g.shape[3]
        # block x-size 1 => block index == element plane index
        return pl.BlockSpec((3, 1, sy, sz), index_map=lambda k: (0, (k + 1) * cx, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [spec_body(g) for g in body0]
        + [spec_plane(g) for g in body0]
        + [spec_body(g) for g in body1]
        + [pl.BlockSpec((81, 81), index_map=lambda k: (0, 0), memory_space=pltpu.VMEM)]
    )
    out_spec = pl.BlockSpec((1, 81, cx, ny, nz), index_map=lambda k: (k, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        b0 = refs[0:4]
        p0 = refs[4:8]
        b1 = refs[8:12]
        kc_ref = refs[12]
        out = refs[13]
        out_scratch = refs[14]  # (81, cx, ny, nz) VMEM chunk accumulator
        ue_scratch = refs[15]  # (81, nz) VMEM

        # Mosaic cannot shape-cast (...,ny,nz) lane merges, so the MXU sees
        # one (81, nz) strip per local (x, y) cell column: 81 row reads
        # (directly from the block refs — Mosaic has no dynamic_slice on
        # values) into VMEM scratch, then a 2D dot. The px=0 phases' x-window
        # spans cx+1 planes split across body/plane refs; a select stitches
        # the boundary plane in.
        def strip(q, carry):
            q = q.astype(jnp.int32)  # Mosaic rejects 64-bit index math (x64 mode)
            x = q // jnp.int32(ny)
            y = q % jnp.int32(ny)
            row = 0
            for (a, b, c) in _SLOTS:
                px, py, pz = a % 2, b % 2, c % 2
                pidx = px * 4 + py * 2 + pz
                ia, jb, kc = a // 2, b // 2, c // 2
                for comp in range(3):
                    if px == 1:  # body covers the whole window (size cx)
                        val = b1[pidx - 4][comp, ia + x, jb + y, kc : kc + nz]
                    elif ia == 0:  # px=0, window start: always inside body
                        val = b0[pidx][comp, x, jb + y, kc : kc + nz]
                    else:  # px=0, ia=1: x+1 may land on the boundary plane
                        xb = jnp.minimum(x + 1, jnp.int32(cx - 1))
                        body = b0[pidx][comp, xb, jb + y, kc : kc + nz]
                        plane = p0[pidx][comp, 0, jb + y, kc : kc + nz]
                        val = jnp.where(x + 1 < cx, body, plane)
                    ue_scratch[row, :] = val
                    row += 1
            fe = jax.lax.dot(kc_ref[...], ue_scratch[...],
                             precision=jax.lax.Precision.HIGHEST)  # (81, nz)
            out_scratch[:, x, y, :] = fe
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cx * ny), strip, jnp.int32(0))
        out[0] = out_scratch[...]

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 81, cx, ny, nz), kcell.dtype),
        scratch_shapes=[
            pltpu.VMEM((81, cx, ny, nz), kcell.dtype),
            pltpu.VMEM((81, nz), kcell.dtype),
        ],
        interpret=interpret,
    )(*body0, *body0, *body1, kcell)


def apply_structured_pallas(op, u: jnp.ndarray, cx: int = 4,
                            interpret: bool = False) -> jnp.ndarray:
    """Full K@u using the fused Pallas kernel for the gather+matmul stage
    (overlap-add stays in XLA). Drop-in equal to op.apply(u)."""
    nx, ny, nz = op.n_cells
    phases = op._split_phases(u)
    fe_chunks = structured_cell_matmul(phases, op.Kcell, op.n_cells, cx=cx,
                                       interpret=interpret)
    # (n_chunks, 81, cx, ny, nz) -> (27, 3, nx, ny, nz)
    n_chunks = nx // cx
    fe = fe_chunks.reshape(n_chunks, 27, 3, cx, ny, nz)
    fe = jnp.moveaxis(fe, 0, 2).reshape(27, 3, nx, ny, nz)
    out = [jnp.zeros_like(g) for g in phases]
    for s, (a, b, c) in enumerate(_SLOTS):
        pidx = (a % 2) * 4 + (b % 2) * 2 + (c % 2)
        ia, jb, kc = a // 2, b // 2, c // 2
        out[pidx] = out[pidx].at[:, ia : ia + nx, jb : jb + ny, kc : kc + nz].add(fe[s])
    return jnp.concatenate([g.reshape(-1) for g in out])
