"""Tetra10 solid elasticity element — batched einsum kernels for TPU.

Re-derivation of the reference's element (ReactionSolver.py:87-152): 10-node
quadratic tetrahedron, isotropic elasticity in Voigt order
[xx, yy, zz, xy, yz, zx], 4-point Gauss quadrature. The reference builds the
6x30 B matrix with Python loops per element; femx instead contracts constant
selector tensors with the shape-gradient batch in single einsums, so the whole
element batch is a few large matmuls on the MXU:

  Ke[(i,c),(j,d)] = sum_g w*detJ_g * dN_g[k,i] * Chat[c,k,d,l] * dN_g[l,j]
  with Chat[c,k,d,l] = Sel[a,c,k] C[a,b] Sel[b,d,l]

Quadrature weight: the *correct* factor for the 4-point rule on the reference
tetrahedron is 1/24 per point; the reference uses 1/4 (ReactionSolver.py:124),
stiffening K exactly 6x (documented quirk — see femx.config.ReferenceCompat).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 4-point Gauss rule on the reference tetrahedron (same points as
# ReactionSolver.py:120-123).
_A, _B = 0.5854101966249685, 0.1381966011250105
GAUSS_POINTS = np.array(
    [[_A, _B, _B], [_B, _A, _B], [_B, _B, _A], [_B, _B, _B]], dtype=np.float64
)
GAUSS_WEIGHT_CORRECT = 1.0 / 24.0
GAUSS_WEIGHT_REFERENCE = 0.25  # reference's (buggy) weight


def _dshape_natural(xi, eta, zeta):
    """d(N_i)/d(xi,eta,zeta) for the 10 Tet10 shape functions (numpy, used
    only at module load to tabulate constants). Node order: 4 vertices then
    midsides on edges (0,1),(1,2),(0,2),(0,3),(1,3),(2,3) — gmsh order, the
    same layout as the reference's kernel (ReactionSolver.py:100-113)."""
    L1 = 1.0 - xi - eta - zeta
    L2, L3, L4 = xi, eta, zeta
    # dN/dL with L = (L1, L2, L3, L4); shape (4, 10)
    dN_L = np.zeros((4, 10))
    dN_L[0, 0] = 4 * L1 - 1
    dN_L[1, 1] = 4 * L2 - 1
    dN_L[2, 2] = 4 * L3 - 1
    dN_L[3, 3] = 4 * L4 - 1
    dN_L[0, 4], dN_L[1, 4] = 4 * L2, 4 * L1
    dN_L[1, 5], dN_L[2, 5] = 4 * L3, 4 * L2
    dN_L[0, 6], dN_L[2, 6] = 4 * L3, 4 * L1
    dN_L[0, 7], dN_L[3, 7] = 4 * L4, 4 * L1
    dN_L[1, 8], dN_L[3, 8] = 4 * L4, 4 * L2
    dN_L[2, 9], dN_L[3, 9] = 4 * L4, 4 * L3
    # chain rule: dL/d(xi,eta,zeta) rows for L1..L4
    dL = np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    return dL.T @ dN_L  # (3, 10)


# (4 gauss, 3, 10) natural-coordinate shape gradients — compile-time constant.
DN_NATURAL = np.stack([_dshape_natural(*p) for p in GAUSS_POINTS])

# Voigt selector Sel[a, c, k]: strain component a gets contribution
# dN[k, i] * u[(i, c)].  Rows: xx, yy, zz, xy, yz, zx.
_SEL = np.zeros((6, 3, 3))
_SEL[0, 0, 0] = 1.0
_SEL[1, 1, 1] = 1.0
_SEL[2, 2, 2] = 1.0
_SEL[3, 0, 1] = _SEL[3, 1, 0] = 1.0
_SEL[4, 1, 2] = _SEL[4, 2, 1] = 1.0
_SEL[5, 0, 2] = _SEL[5, 2, 0] = 1.0


def material_matrix(E, v, dtype=jnp.float64):
    """6x6 isotropic elasticity matrix, Voigt order [xx,yy,zz,xy,yz,zx]
    (reference: ReactionSolver.py:87-98)."""
    E = jnp.asarray(E, dtype=dtype)
    v = jnp.asarray(v, dtype=dtype)
    c1 = E / ((1 + v) * (1 - 2 * v))
    c2 = (1 - 2 * v) / 2
    C = jnp.zeros((6, 6), dtype=dtype)
    C = C.at[:3, :3].set(v)
    C = C.at[jnp.arange(3), jnp.arange(3)].set(1 - v)
    C = C.at[jnp.arange(3, 6), jnp.arange(3, 6)].set(c2)
    return c1 * C


def chat_tensor(C):
    """Chat[c,k,d,l] = Sel[a,c,k] C[a,b] Sel[b,d,l] (3,3,3,3)."""
    sel = jnp.asarray(_SEL, dtype=C.dtype)
    return jnp.einsum("ack,ab,bdl->ckdl", sel, C, sel)


def _inv3x3(J):
    """Closed-form batched 3x3 inverse + determinant via cofactors.

    TPU-friendly: no batched LU (XLA's LuDecomposition lacks f64 on TPU and
    is far slower than cofactors at this size).
    Returns (Jinv, detJ) for J of shape (..., 3, 3).
    """
    a, b, c = J[..., 0, :], J[..., 1, :], J[..., 2, :]
    cb = jnp.cross(b, c)
    ca = jnp.cross(c, a)
    ab = jnp.cross(a, b)
    det = jnp.sum(a * cb, axis=-1)
    inv_cols = jnp.stack([cb, ca, ab], axis=-1)  # (..., 3, 3): columns
    safe = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    return inv_cols / safe[..., None, None], det


def jacobians(coords, dtype=None):
    """Per-element, per-gauss-point Jacobian data.

    Args:
      coords: (E, 10, 3) element node coordinates.
    Returns:
      dN_glob: (E, 4, 3, 10) global shape-function gradients.
      wdet:    (E, 4) quadrature factor w * detJ, zeroed where detJ <= 1e-12
               (the reference skips such points and counts them,
               ReactionSolver.py:133-135). The weight w is NOT applied here.
      detJ:    (E, 4) raw determinants (for quality reporting).
    """
    dn = jnp.asarray(DN_NATURAL, dtype=coords.dtype if dtype is None else dtype)
    # J[e,g] = dN_natural[g] @ coords[e] : (E, 4, 3, 3)
    J = jnp.einsum("gkn,enc->egkc", dn, coords)
    Jinv, detJ = _inv3x3(J)
    dN_glob = jnp.einsum("egkc,gcn->egkn", Jinv, dn)
    ok = detJ > 1e-12
    wdet = jnp.where(ok, detJ, 0.0)
    dN_glob = jnp.where(ok[..., None, None], dN_glob, 0.0)
    return dN_glob, wdet, detJ


def element_stiffness(coords, C, weight=GAUSS_WEIGHT_CORRECT):
    """Batched Tet10 stiffness matrices.

    Args:
      coords: (E, 10, 3) node coordinates per element.
      C: (6, 6) material matrix.
      weight: Gauss weight per point (1/24 correct; 1/4 reference-compat).
    Returns:
      Ke: (E, 30, 30) with DOF order (node-major, xyz-minor).
      n_bad: scalar count of skipped integration points (detJ <= 1e-12).
    """
    dN, wdet, detJ = jacobians(coords)
    chat = chat_tensor(C)
    # Ke[e,(i,c),(j,d)] = sum_g weight*wdet * dN[e,g,k,i] Chat[c,k,d,l] dN[e,g,l,j]
    ke = jnp.einsum("egki,ckdl,eglj,eg->eicjd", dN, chat, dN, weight * wdet)
    E = coords.shape[0]
    n_bad = jnp.sum(detJ <= 1e-12)
    return ke.reshape(E, 30, 30), n_bad


def element_apply(dN, wdet, C, ue, weight=GAUSS_WEIGHT_CORRECT):
    """Matrix-free element action: fe = Ke @ ue without forming Ke.

    This is the hot op of the large-solve path: strains at gauss points,
    stress via C, and the transposed-B contraction — all MXU einsums.

    Args:
      dN: (E, 4, 3, 10) global gradients (from `jacobians`).
      wdet: (E, 4) masked detJ (from `jacobians`).
      C: (6, 6) material matrix.
      ue: (E, 10, 3) element displacements.
    Returns:
      fe: (E, 10, 3) element force contributions.
    """
    sel = jnp.asarray(_SEL, dtype=ue.dtype)
    # strain[e,g,a] = Sel[a,c,k] * grad[e,g,k,c],  grad = dN @ ue
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    stress = jnp.einsum("ab,egb->ega", C, strain)
    # fe[e,n,c] = sum_g w*wdet * dN[e,g,k,n] * Sel[a,c,k] * stress[e,g,a]
    fe = jnp.einsum("egkn,ack,ega,eg->enc", dN, sel, stress, weight * wdet)
    return fe


def _mass_matrix_hat() -> np.ndarray:
    """Mhat[i,j] = (1/V) * integral(N_i N_j dV) over a STRAIGHT-sided Tet10.

    Exact closed form (module-load constant): each shape function is a
    quadratic polynomial in the barycentric coordinates (N_corner_i =
    L_i(2L_i - 1), N_edge_ij = 4 L_i L_j), and barycentric monomials
    integrate exactly over any straight tet:

        integral(L1^a L2^b L3^c L4^d dV) = 6V * a! b! c! d! / (a+b+c+d+3)!

    so Mhat is dimensionless and geometry-independent. The reference has no
    solid mass matrix at all (modal analysis exists only for beams,
    BeamSolver.py:440-455); this supports femx's large-scale solid modal
    path, a rebuild extension named in BASELINE.json ("first-10-modes eig
    time")."""
    from math import factorial

    # Shape functions as {exponent-4-tuple: coeff} monomial dicts.
    def corner(i):
        e2 = [0, 0, 0, 0]
        e2[i] = 2
        e1 = [0, 0, 0, 0]
        e1[i] = 1
        return {tuple(e2): 2.0, tuple(e1): -1.0}

    def edge(i, j):
        e = [0, 0, 0, 0]
        e[i] += 1
        e[j] += 1
        return {tuple(e): 4.0}

    # gmsh Tet10 node order: 4 vertices then midsides on edges
    # (0,1),(1,2),(0,2),(0,3),(1,3),(2,3) — same as DN_NATURAL above.
    shapes = [corner(i) for i in range(4)] + [
        edge(0, 1), edge(1, 2), edge(0, 2), edge(0, 3), edge(1, 3), edge(2, 3)
    ]

    def integral(mono):  # integral(prod L^e dV) / V
        s = sum(mono)
        num = 6.0
        for e in mono:
            num *= factorial(e)
        return num / factorial(s + 3)

    M = np.zeros((10, 10))
    for i in range(10):
        for j in range(i, 10):
            acc = 0.0
            for ei, ci in shapes[i].items():
                for ej, cj in shapes[j].items():
                    acc += ci * cj * integral(tuple(a + b for a, b in zip(ei, ej)))
            M[i, j] = M[j, i] = acc
    return M


MASS_HAT = _mass_matrix_hat()  # (10, 10), exact, straight-sided tets


def element_volume(coords) -> jnp.ndarray:
    """Signed volumes of straight tets from their 4 corner nodes (E,)."""
    c = jnp.asarray(coords)
    v1 = c[:, 1, :] - c[:, 0, :]
    v2 = c[:, 2, :] - c[:, 0, :]
    v3 = c[:, 3, :] - c[:, 0, :]
    return jnp.sum(v1 * jnp.cross(v2, v3), axis=-1) / 6.0


def element_mass_consistent(coords, rho) -> jnp.ndarray:
    """Batched exact consistent mass for straight-sided Tet10 elements.

    Me[(i,c),(j,d)] = rho * V * Mhat[i,j] * delta_cd, DOF order node-major /
    xyz-minor (matching element_stiffness). Valid for straight tets (femx's
    structured lattice cells and gmsh's default un-curved tets)."""
    V = element_volume(coords)
    mhat = jnp.asarray(MASS_HAT, dtype=V.dtype)
    m_node = rho * V[:, None, None] * mhat  # (E, 10, 10)
    eye3 = jnp.eye(3, dtype=V.dtype)
    me = jnp.einsum("eij,cd->eicjd", m_node, eye3)
    return me.reshape(-1, 30, 30)


def element_mass_lumped(coords, rho) -> jnp.ndarray:
    """Batched HRZ-lumped nodal masses (E, 10): diagonal of the consistent
    mass scaled so each element's total mass is preserved (rho*V). All
    entries positive (row-sum lumping would go negative on Tet10 corners)."""
    V = element_volume(coords)
    d = np.diag(MASS_HAT)
    d = d / d.sum()  # fractions summing to 1
    return rho * V[:, None] * jnp.asarray(d, dtype=V.dtype)


def element_strain_stress(dN, C, ue):
    """Per-gauss-point strain and stress tensors (Voigt) for postprocessing."""
    sel = jnp.asarray(_SEL, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    stress = jnp.einsum("ab,egb->ega", C, strain)
    return strain, stress


def von_mises(stress):
    """Von Mises stress from Voigt [xx,yy,zz,xy,yz,zx] stresses (..., 6)."""
    sxx, syy, szz = stress[..., 0], stress[..., 1], stress[..., 2]
    sxy, syz, szx = stress[..., 3], stress[..., 4], stress[..., 5]
    return jnp.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * (sxy**2 + syz**2 + szx**2)
    )
