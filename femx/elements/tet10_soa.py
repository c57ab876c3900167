"""Tetra10 kernels in structure-of-arrays (element-last) layout — the TPU
hot path.

Why this exists: the natural (E, 4, 3, 10) einsum formulation (tet10.py)
puts tiny dims (3, 10) in the minor positions, which XLA tiles to (8,128)
lanes at ~1% utilization — measured ~1000x off this chip's roofline. The
TPU-native layout puts the huge element axis E minor-most ("E-last"):

- every per-quadrature-point geometry/physics op is an unrolled scalar
  formula over (E,)-wide vectors -> full 8x128 VPU lanes, perfect fusion;
- the only contractions against non-constant data are elementwise;
  constant shape-function tensors contract via explicit unrolled FMAs with
  zero-entry skipping (the Tet10 gradient table is ~45% zeros);
- gather/scatter run on a flat (30, E) DOF index table (measured fast).

Same math as tet10.py (reference: ReactionSolver.py:100-152); equality is
enforced by tests/test_soa.py to 1e-12.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from femx.elements.tet10 import DN_NATURAL, GAUSS_WEIGHT_CORRECT

def chat_numpy(C: np.ndarray) -> np.ndarray:
    """Chat[c,k,d,l] = Sel[a,c,k] C[a,b] Sel[b,d,l] as a numpy constant."""
    sel = np.zeros((6, 3, 3))
    sel[0, 0, 0] = sel[1, 1, 1] = sel[2, 2, 2] = 1.0
    sel[3, 0, 1] = sel[3, 1, 0] = 1.0
    sel[4, 1, 2] = sel[4, 2, 1] = 1.0
    sel[5, 0, 2] = sel[5, 2, 0] = 1.0
    return np.einsum("ack,ab,bdl->ckdl", sel, np.asarray(C), sel)


def coords_soa(points: np.ndarray, conn: np.ndarray, dtype) -> np.ndarray:
    """(10, 3, E) element coordinates, element axis last.

    Gathers from a transposed (3, N) copy so the output's minor (element)
    axis is written contiguously — gathering (E, 10, 3) and transposing
    costs ~8 s at 331k elements (strided 80 MB copy); this form is ~0.5 s.
    """
    ptsT = np.ascontiguousarray(points.T.astype(dtype))  # (3, N)
    return np.ascontiguousarray(np.transpose(ptsT[:, conn.T], (1, 0, 2)))


def dof_table(conn: np.ndarray) -> np.ndarray:
    """(30, E) int32 global DOF index per (local node-major/xyz-minor) slot."""
    connT = conn.T  # (10, E) view
    out = np.empty((30, conn.shape[0]), dtype=np.int32)
    for s in range(10):
        base = (3 * connT[s]).astype(np.int32)
        out[3 * s] = base
        out[3 * s + 1] = base + 1
        out[3 * s + 2] = base + 2
    return out


def geometry(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-gauss-point global shape gradients and Jacobian factors, E-last.

    Args:
      coords: (10, 3, E).
    Returns:
      dNg:  (4, 3, 10, E) global gradients, zeroed where detJ <= 1e-12.
      wdet: (4, E) masked detJ (weight NOT applied).
      detJ: (4, E) raw determinants.
    """
    dn = np.asarray(DN_NATURAL)  # (4, 3, 10) numpy constant
    dNg_rows = []
    wdet_rows = []
    det_rows = []
    for g in range(4):
        # J[k][c] = sum_n dn[g,k,n] * coords[n,c,:]  — unrolled, skip zeros
        J = [[None] * 3 for _ in range(3)]
        for k in range(3):
            for c in range(3):
                acc = None
                for n in range(10):
                    w = float(dn[g, k, n])  # python float: weak-typed, no f64 promotion
                    if w == 0.0:
                        continue
                    term = w * coords[n, c]
                    acc = term if acc is None else acc + term
                J[k][c] = acc
        det = (
            J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1])
            - J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0])
            + J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0])
        )
        ok = det > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        # Jinv[k][c] = cofactor(J)[c][k] / det  (standard adjugate transpose)
        Ji = [[None] * 3 for _ in range(3)]
        Ji[0][0] = (J[1][1] * J[2][2] - J[1][2] * J[2][1]) * inv_det
        Ji[0][1] = (J[0][2] * J[2][1] - J[0][1] * J[2][2]) * inv_det
        Ji[0][2] = (J[0][1] * J[1][2] - J[0][2] * J[1][1]) * inv_det
        Ji[1][0] = (J[1][2] * J[2][0] - J[1][0] * J[2][2]) * inv_det
        Ji[1][1] = (J[0][0] * J[2][2] - J[0][2] * J[2][0]) * inv_det
        Ji[1][2] = (J[0][2] * J[1][0] - J[0][0] * J[1][2]) * inv_det
        Ji[2][0] = (J[1][0] * J[2][1] - J[1][1] * J[2][0]) * inv_det
        Ji[2][1] = (J[0][1] * J[2][0] - J[0][0] * J[2][1]) * inv_det
        Ji[2][2] = (J[0][0] * J[1][1] - J[0][1] * J[1][0]) * inv_det
        # dNg[k][n] = sum_c Ji[k][c] * dn[g,c,n]
        rows_k = []
        for k in range(3):
            rows_n = []
            for n in range(10):
                acc = None
                for c in range(3):
                    w = float(dn[g, c, n])
                    if w == 0.0:
                        continue
                    term = Ji[k][c] * w
                    acc = term if acc is None else acc + term
                rows_n.append(acc if acc is not None else jnp.zeros_like(det))
            rows_k.append(jnp.stack(rows_n))
        dNg_rows.append(jnp.stack(rows_k))
        wdet_rows.append(jnp.where(ok, det, 0.0))
        det_rows.append(det)
    return jnp.stack(dNg_rows), jnp.stack(wdet_rows), jnp.stack(det_rows)


def apply_element_forces(dNg, wdet, C6, ue, weight=GAUSS_WEIGHT_CORRECT):
    """fe = Ke @ ue without forming Ke, fully unrolled over small dims.

    Args:
      dNg:  (4, 3, 10, E) global gradients.
      wdet: (4, E) masked Jacobian factors.
      C6:   (6, 6) numpy material matrix (embedded as scalar constants).
      ue:   (30, E) element displacements (node-major, xyz-minor).
    Returns:
      fe:   (30, E) element force contributions.
    """
    C6 = np.asarray(C6)
    fe = [None] * 30
    for g in range(4):
        w = weight * wdet[g]
        # grad[k][c] = sum_n dNg[g,k,n] * ue[3n+c]
        grad = [[None] * 3 for _ in range(3)]
        for k in range(3):
            for c in range(3):
                acc = None
                for n in range(10):
                    term = dNg[g, k, n] * ue[3 * n + c]
                    acc = term if acc is None else acc + term
                grad[k][c] = acc
        # engineering strains, Voigt [xx, yy, zz, xy, yz, zx]
        eps = [
            grad[0][0],
            grad[1][1],
            grad[2][2],
            grad[0][1] + grad[1][0],
            grad[1][2] + grad[2][1],
            grad[0][2] + grad[2][0],
        ]
        # stress = C @ eps with scalar constants, skipping zeros of C
        sig = [None] * 6
        for a in range(6):
            acc = None
            for b in range(6):
                cab = float(C6[a, b])  # python float keeps f32 weak typing
                if cab == 0.0:
                    continue
                term = cab * eps[b]
                acc = term if acc is None else acc + term
            sig[a] = acc if acc is not None else jnp.zeros_like(eps[0])
        # tau[k][c] — symmetric stress tensor entries
        tau = [
            [sig[0], sig[3], sig[5]],
            [sig[3], sig[1], sig[4]],
            [sig[5], sig[4], sig[2]],
        ]
        # fe[3n+c] += w * sum_k dNg[g,k,n] * tau[k][c]
        for n in range(10):
            for c in range(3):
                acc = dNg[g, 0, n] * tau[0][c] + dNg[g, 1, n] * tau[1][c] + dNg[g, 2, n] * tau[2][c]
                contrib = w * acc
                i = 3 * n + c
                fe[i] = contrib if fe[i] is None else fe[i] + contrib
    return jnp.stack(fe)


def block_diagonal_entries(dNg, wdet, chat, weight=GAUSS_WEIGHT_CORRECT):
    """Per-element nodal 3x3 block-diagonal entries, E-last.

    Returns bke: (10, 3, 3, E) where bke[n,c,d] = Ke[(n,c),(n,d)].
    chat: numpy (3,3,3,3) constant from `chat_numpy`.
    """
    chat = np.asarray(chat)
    out = [[[None] * 3 for _ in range(3)] for _ in range(10)]
    for g in range(4):
        w = weight * wdet[g]
        for n in range(10):
            dk = [dNg[g, k, n] for k in range(3)]
            for c in range(3):
                for d in range(c, 3):
                    acc = None
                    for k in range(3):
                        for l in range(3):
                            coeff = float(chat[c, k, d, l])
                            if coeff == 0.0:
                                continue
                            term = coeff * dk[k] * dk[l]
                            acc = term if acc is None else acc + term
                    contrib = w * (acc if acc is not None else 0.0)
                    cur = out[n][c][d]
                    out[n][c][d] = contrib if cur is None else cur + contrib
    for n in range(10):
        for c in range(3):
            for d in range(c):
                out[n][c][d] = out[n][d][c]
    return jnp.stack([jnp.stack([jnp.stack(r) for r in nrow]) for nrow in out])
