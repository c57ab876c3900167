"""Tri6 2D elasticity element — batched einsum kernels for TPU.

Quadratic 6-node triangle in PLANE STRESS / PLANE STRAIN and AXISYMMETRIC
formulations. This powers the two reference menu products that ship as empty
placeholder dialogs in the reference app ("2D Static Analysis" and "Pipe
Thermal Stress Analysis", FEM_main.py:412-431, modal.ui/static.ui — 19-line
stubs): femx implements them for real on the same TPU-first architecture as
the Tetra10 solid path (femx/elements/tet10.py): constant selector tensors
contracted with the shape-gradient batch in single einsums, so the whole
element batch is a few large MXU matmuls.

Voigt orders:
  plane:        [xx, yy, xy]                      C is 3x3
  axisymmetric: [rr, zz, tt, rz]  (tt = hoop)     C is 4x4

Node order: gmsh "triangle6" — 3 vertices then midsides on edges
(0,1), (1,2), (2,0).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 3-point Gauss rule on the reference triangle (degree-2 exact — the exact
# degree of the stiffness integrand for straight-sided quadratic triangles).
GAUSS_POINTS = np.array(
    [[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]], dtype=np.float64
)
GAUSS_WEIGHT = 1.0 / 6.0  # per point; sum = 1/2 = area of reference triangle


def _shape(xi, eta):
    """The 6 Tri6 shape functions at (xi, eta)."""
    L1 = 1.0 - xi - eta
    L2, L3 = xi, eta
    return np.array([
        L1 * (2 * L1 - 1), L2 * (2 * L2 - 1), L3 * (2 * L3 - 1),
        4 * L1 * L2, 4 * L2 * L3, 4 * L3 * L1,
    ])


def _dshape_natural(xi, eta):
    """d(N_i)/d(xi,eta) for the 6 shape functions, shape (2, 6)."""
    L1 = 1.0 - xi - eta
    L2, L3 = xi, eta
    # dN/dL with L = (L1, L2, L3), then chain rule dL/d(xi,eta).
    dN_L = np.zeros((3, 6))
    dN_L[0, 0] = 4 * L1 - 1
    dN_L[1, 1] = 4 * L2 - 1
    dN_L[2, 2] = 4 * L3 - 1
    dN_L[0, 3], dN_L[1, 3] = 4 * L2, 4 * L1
    dN_L[1, 4], dN_L[2, 4] = 4 * L3, 4 * L2
    dN_L[2, 5], dN_L[0, 5] = 4 * L1, 4 * L3
    dL = np.array([[-1, -1], [1, 0], [0, 1]], dtype=np.float64)  # (3, 2)
    return dL.T @ dN_L  # (2, 6)


# Compile-time constants: (3 gauss, 2, 6) gradients and (3 gauss, 6) values.
DN_NATURAL = np.stack([_dshape_natural(*p) for p in GAUSS_POINTS])
N_AT_GAUSS = np.stack([_shape(*p) for p in GAUSS_POINTS])

# Natural coordinates of the 6 nodes (gmsh order) and the shape gradients
# there — used for NODAL stress recovery (evaluating strains at the nodes
# themselves is O(h^2) accurate where gauss-mean averaging is only O(h),
# which matters at surfaces with steep gradients, e.g. the 1/r^2 hoop
# stress at a pipe bore).
NODE_NATURAL = np.array([
    [0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
    [0.5, 0.0], [0.5, 0.5], [0.0, 0.5],
])
DN_AT_NODES = np.stack([_dshape_natural(*p) for p in NODE_NATURAL])

# Voigt selector Sel[a, c, k]: plane strain component a gets contribution
# dN[k, i] * u[(i, c)].  Rows: xx, yy, xy.
_SEL2 = np.zeros((3, 2, 2))
_SEL2[0, 0, 0] = 1.0
_SEL2[1, 1, 1] = 1.0
_SEL2[2, 0, 1] = _SEL2[2, 1, 0] = 1.0

# Axisymmetric selector for the GRADIENT part (rr, zz, rz rows; the hoop row
# tt = u_r / r is handled separately since it needs N, not dN).
# Coordinates: (r, z) = components (0, 1); displacement (u_r, u_z).
_SEL_AX = np.zeros((4, 2, 2))
_SEL_AX[0, 0, 0] = 1.0  # rr = du_r/dr
_SEL_AX[1, 1, 1] = 1.0  # zz = du_z/dz
_SEL_AX[3, 0, 1] = _SEL_AX[3, 1, 0] = 1.0  # rz = du_r/dz + du_z/dr


def material_matrix_plane(E, v, mode="stress", dtype=jnp.float64):
    """3x3 isotropic elasticity matrix in Voigt order [xx, yy, xy].

    mode="stress": plane stress (sigma_zz = 0, thin plates).
    mode="strain": plane strain (eps_zz = 0, long prismatic bodies).
    """
    E = jnp.asarray(E, dtype=dtype)
    v = jnp.asarray(v, dtype=dtype)
    if mode == "stress":
        c = E / (1 - v * v)
        C = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]],
                      dtype=dtype)
        C = C.at[0, 1].set(v).at[1, 0].set(v).at[2, 2].set((1 - v) / 2)
        return c * C
    if mode == "strain":
        c = E / ((1 + v) * (1 - 2 * v))
        C = jnp.zeros((3, 3), dtype=dtype)
        C = C.at[0, 0].set(1 - v).at[1, 1].set(1 - v)
        C = C.at[0, 1].set(v).at[1, 0].set(v)
        C = C.at[2, 2].set((1 - 2 * v) / 2)
        return c * C
    raise ValueError(f"mode must be 'stress' or 'strain', got {mode!r}")


def material_matrix_axisym(E, v, dtype=jnp.float64):
    """4x4 isotropic elasticity matrix, Voigt order [rr, zz, tt, rz]."""
    E = jnp.asarray(E, dtype=dtype)
    v = jnp.asarray(v, dtype=dtype)
    c = E / ((1 + v) * (1 - 2 * v))
    C = jnp.full((3, 3), 1.0, dtype=dtype) * v
    C = C.at[jnp.arange(3), jnp.arange(3)].set(1 - v)
    out = jnp.zeros((4, 4), dtype=dtype)
    out = out.at[:3, :3].set(C).at[3, 3].set((1 - 2 * v) / 2)
    return c * out


def _inv2x2(J):
    """Closed-form batched 2x2 inverse + determinant for J (..., 2, 2)."""
    a = J[..., 0, 0]
    b = J[..., 0, 1]
    c = J[..., 1, 0]
    d = J[..., 1, 1]
    det = a * d - b * c
    safe = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    inv = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2) / safe[..., None, None]
    return inv, det


def jacobians(coords):
    """Per-element, per-gauss-point Jacobian data for Tri6.

    Args:
      coords: (E, 6, 2) element node coordinates.
    Returns:
      dN_glob: (E, 3, 2, 6) global shape gradients.
      wdet:    (E, 3) GAUSS_WEIGHT * detJ, zeroed where detJ <= 1e-14
               (mirroring the solid path's distorted-element skip+count,
               ReactionSolver.py:133-135).
      detJ:    (E, 3) raw determinants (quality reporting).
    """
    dn = jnp.asarray(DN_NATURAL, dtype=coords.dtype)
    J = jnp.einsum("gkn,enc->egkc", dn, coords)  # (E, 3, 2, 2)
    Jinv, detJ = _inv2x2(J)
    dN_glob = jnp.einsum("egkc,gcn->egkn", Jinv, dn)
    ok = detJ > 1e-14
    wdet = jnp.where(ok, GAUSS_WEIGHT * detJ, 0.0)
    dN_glob = jnp.where(ok[..., None, None], dN_glob, 0.0)
    return dN_glob, wdet, detJ


def chat_tensor_plane(C):
    """Chat[c,k,d,l] = Sel[a,c,k] C[a,b] Sel[b,d,l] (2,2,2,2)."""
    sel = jnp.asarray(_SEL2, dtype=C.dtype)
    return jnp.einsum("ack,ab,bdl->ckdl", sel, C, sel)


def element_stiffness_plane(coords, C, thickness=1.0):
    """Batched Tri6 plane stiffness matrices.

    Args:
      coords: (E, 6, 2) node coordinates.
      C: (3, 3) plane material matrix.
      thickness: out-of-plane thickness t (K scales linearly).
    Returns:
      Ke: (E, 12, 12), DOF order node-major / xy-minor.
      n_bad: count of skipped integration points (detJ <= 1e-14).
    """
    dN, wdet, detJ = jacobians(coords)
    chat = chat_tensor_plane(C)
    ke = jnp.einsum("egki,ckdl,eglj,eg->eicjd", dN, chat, dN,
                    thickness * wdet)
    E = coords.shape[0]
    return ke.reshape(E, 12, 12), jnp.sum(detJ <= 1e-14)


def element_apply_plane(dN, wdet, C, ue, thickness=1.0):
    """Matrix-free plane element action fe = Ke @ ue (hot op, MXU einsums)."""
    sel = jnp.asarray(_SEL2, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    stress = jnp.einsum("ab,egb->ega", C, strain)
    return jnp.einsum("egkn,ack,ega,eg->enc", dN, sel, stress,
                      thickness * wdet)


def element_strain_stress_plane(dN, C, ue):
    """Per-gauss-point plane strain and stress (Voigt [xx, yy, xy])."""
    sel = jnp.asarray(_SEL2, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    stress = jnp.einsum("ab,egb->ega", C, strain)
    return strain, stress


def element_thermal_load_plane(coords, C, alpha_eff, dT_nodes, thickness=1.0):
    """2D thermoelastic load: fe = integral Bt C (alpha_eff dT [1,1,0]) t dA.

    alpha_eff carries the formulation: alpha for plane STRESS, (1+nu)*alpha
    for plane STRAIN (the in-plane thermal strain a constrained-z body sees;
    C_2d @ (1+nu) alpha dT [1,1,0] reproduces the exact 3D
    -E alpha dT/(1-2nu) fully-constrained stress).

    Args:
      coords: (E, 6, 2); C: (3, 3); dT_nodes: (E, 6) nodal temperature rise.
    Returns: (E, 6, 2) consistent nodal loads.
    """
    dN, wdet, _ = jacobians(coords)
    n_g = jnp.asarray(N_AT_GAUSS, dtype=coords.dtype)
    dT_g = jnp.einsum("gn,en->eg", n_g, dT_nodes)  # (E, 3)
    eps_th = alpha_eff * dT_g[..., None] * jnp.asarray(
        [1.0, 1.0, 0.0], dtype=coords.dtype)  # (E, 3, 3)
    stress = jnp.einsum("ab,egb->ega", C, eps_th)
    sel = jnp.asarray(_SEL2, dtype=coords.dtype)
    return jnp.einsum("egkn,ack,ega,eg->enc", dN, sel, stress,
                      thickness * wdet)


# Degree-4 (Dunavant) 6-point rule — EXACT for the P2 mass integrand
# N_i N_j (degree 4) on straight-sided triangles; weights sum to the
# reference area 1/2 (same convention as GAUSS_WEIGHT).
_MASS_PTS = np.array([
    [0.445948490915965, 0.445948490915965],
    [0.445948490915965, 0.108103018168070],
    [0.108103018168070, 0.445948490915965],
    [0.091576213509771, 0.091576213509771],
    [0.091576213509771, 0.816847572980459],
    [0.816847572980459, 0.091576213509771],
])
_MASS_W = 0.5 * np.array([0.223381589678011] * 3 + [0.109951743655322] * 3)
_N_AT_MASS = np.stack([_shape(*p) for p in _MASS_PTS])
_DN_AT_MASS = np.stack([_dshape_natural(*p) for p in _MASS_PTS])


def element_mass_plane(coords, rho, thickness=1.0):
    """Consistent Tri6 plane mass matrices, (E, 12, 12), exact quadrature.

    M[(i,c),(j,d)] = delta_cd * integral rho t N_i N_j dA; DOF order
    node-major / xy-minor (matches element_stiffness_plane)."""
    dn = jnp.asarray(_DN_AT_MASS, dtype=coords.dtype)
    J = jnp.einsum("gkn,enc->egkc", dn, coords)
    _, detJ = _inv2x2(J)
    w = jnp.asarray(_MASS_W, dtype=coords.dtype)
    n_g = jnp.asarray(_N_AT_MASS, dtype=coords.dtype)  # (6, 6)
    mn = rho * thickness * jnp.einsum("g,gi,gj,eg->eij", w, n_g, n_g,
                                      jnp.maximum(detJ, 0.0))  # (E, 6, 6)
    eye = jnp.eye(2, dtype=coords.dtype)
    E = coords.shape[0]
    return jnp.einsum("eij,cd->eicjd", mn, eye).reshape(E, 12, 12)


def _node_gradients(coords):
    """Global shape gradients at the 6 NODE positions, (E, 6, 2, 6).

    Index 1 is the evaluation node, index 3 the shape function."""
    dn = jnp.asarray(DN_AT_NODES, dtype=coords.dtype)
    J = jnp.einsum("gkn,enc->egkc", dn, coords)
    Jinv, detJ = _inv2x2(J)
    return jnp.einsum("egkc,gcn->egkn", Jinv, dn), detJ


def element_stress_at_nodes_plane(coords, C, ue, alpha_eff=0.0,
                                  dT_nodes=None):
    """Plane stress tensors evaluated AT the element nodes, (E, 6, 3).

    Average across the elements sharing each node for a smoothed nodal
    field (the O(h^2) recovery). With dT_nodes, the mechanical stress
    C (eps - alpha_eff dT [1,1,0]) is returned (alpha_eff as in
    element_thermal_load_plane)."""
    dN, _ = _node_gradients(coords)
    sel = jnp.asarray(_SEL2, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    if dT_nodes is not None:
        strain = strain - (alpha_eff * dT_nodes[..., None] * jnp.asarray(
            [1.0, 1.0, 0.0], dtype=ue.dtype))
    return jnp.einsum("ab,egb->ega", C, strain)


def element_stress_at_nodes_axisym(coords, C, ue, alpha=0.0, dT_nodes=None):
    """Axisymmetric stress tensors AT the element nodes, (E, 6, 4).

    The hoop strain at node n is exactly u_r[n] / r[n]; thermal correction
    uses the nodal temperatures directly. On the axis (r = 0) the hoop
    strain limit eps_tt -> du_r/dr is substituted."""
    dN, _ = _node_gradients(coords)
    sel = jnp.asarray(_SEL_AX, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    r = coords[:, :, 0]  # (E, 6): radius at each node
    on_axis = r <= 1e-300
    hoop = jnp.where(on_axis,
                     strain[:, :, 0],  # L'Hopital: u_r/r -> du_r/dr at r=0
                     ue[:, :, 0] / jnp.where(on_axis, 1.0, r))
    strain = strain.at[:, :, 2].add(hoop)
    if dT_nodes is not None:
        eps_th = alpha * dT_nodes[..., None] * jnp.asarray(
            [1.0, 1.0, 1.0, 0.0], dtype=coords.dtype)
        mech = strain - eps_th
    else:
        mech = strain
    return jnp.einsum("ab,egb->ega", C, mech)


def von_mises_plane(stress, v=None):
    """Von Mises from plane Voigt [xx, yy, xy] stresses (..., 3).

    Plane stress (v=None): sigma_zz = 0. Plane strain: pass Poisson's ratio
    so sigma_zz = v*(sigma_xx + sigma_yy) enters the deviator.
    """
    sxx, syy, sxy = stress[..., 0], stress[..., 1], stress[..., 2]
    szz = 0.0 if v is None else v * (sxx + syy)
    return jnp.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * sxy**2
    )


# ---------------------------------------------------------------------------
# Axisymmetric formulation (r, z) — coordinates are (r, z), displacement
# (u_r, u_z); all volume integrals carry the 2*pi*r measure. Hoop strain
# tt = u_r / r needs shape VALUES at gauss points, not just gradients.
# ---------------------------------------------------------------------------


def axisym_gauss_data(coords):
    """Per-element, per-gauss-point data for axisymmetric Tri6.

    Args:
      coords: (E, 6, 2) node coordinates, columns (r, z); requires r >= 0.
    Returns:
      dN_glob: (E, 3, 2, 6) global gradients.
      wdet_r:  (E, 3) GAUSS_WEIGHT * detJ * 2*pi*r_g (the full measure).
      n_over_r:(E, 3, 6) N_k(g) / r_g, the hoop-row factors.
      detJ:    (E, 3).
    """
    dN_glob, wdet, detJ = jacobians(coords)
    n_g = jnp.asarray(N_AT_GAUSS, dtype=coords.dtype)  # (3, 6)
    r_g = jnp.einsum("gn,en->eg", n_g, coords[:, :, 0])  # (E, 3)
    # Interior gauss points of the 3-pt rule keep r_g > 0 whenever all node
    # radii are >= 0 and the element isn't degenerate; guard anyway.
    r_safe = jnp.where(r_g > 1e-300, r_g, 1.0)
    wdet_r = wdet * 2.0 * jnp.pi * r_g
    n_over_r = n_g[None, :, :] / r_safe[:, :, None]
    return dN_glob, wdet_r, n_over_r, detJ


def _axisym_strain(dN, n_over_r, ue):
    """Voigt [rr, zz, tt, rz] strains at gauss points, (E, 3, 4)."""
    sel = jnp.asarray(_SEL_AX, dtype=ue.dtype)
    grad = jnp.einsum("egkn,enc->egkc", dN, ue)
    strain = jnp.einsum("ack,egkc->ega", sel, grad)
    hoop = jnp.einsum("egn,en->eg", n_over_r, ue[:, :, 0])
    return strain.at[:, :, 2].add(hoop)


def element_apply_axisym(dN, wdet_r, n_over_r, C, ue):
    """Matrix-free axisymmetric element action fe = Ke @ ue.

    Args from `axisym_gauss_data`; C (4, 4); ue (E, 6, 2). Returns (E, 6, 2).
    """
    sel = jnp.asarray(_SEL_AX, dtype=ue.dtype)
    strain = _axisym_strain(dN, n_over_r, ue)
    stress = jnp.einsum("ab,egb->ega", C, strain)  # (E, 3, 4)
    fe = jnp.einsum("egkn,ack,ega,eg->enc", dN, sel, stress, wdet_r)
    # hoop row transpose: f_r[n] += N_n/r * sigma_tt
    fe_hoop = jnp.einsum("egn,eg,eg->en", n_over_r, stress[:, :, 2], wdet_r)
    return fe.at[:, :, 0].add(fe_hoop)


def element_stiffness_axisym(coords, C):
    """Batched axisymmetric Tri6 stiffness (E, 12, 12), node-major/rz-minor.

    Built by applying the matrix-free action to the 12 unit element
    displacement patterns in one batched einsum (12 is small; this keeps
    one code path — the apply — authoritative for the matrix form)."""
    dN, wdet_r, n_over_r, detJ = axisym_gauss_data(coords)
    E = coords.shape[0]
    eye = jnp.eye(12, dtype=coords.dtype).reshape(12, 6, 2)
    cols = jnp.stack([
        element_apply_axisym(dN, wdet_r, n_over_r, C,
                             jnp.broadcast_to(eye[j], (E, 6, 2)))
        for j in range(12)
    ], axis=-1)  # (E, 6, 2, 12): [e, n, c, j] = Ke[(n,c), j]
    return cols.reshape(E, 12, 12), jnp.sum(detJ <= 1e-14)


def element_thermal_load_axisym(coords, C, alpha, dT_nodes):
    """Thermal expansion load: fe = integral Bt C (alpha*dT*[1,1,1,0]) dV.

    Args:
      coords: (E, 6, 2); C: (4, 4); alpha: scalar expansion coefficient;
      dT_nodes: (E, 6) temperature rise at element nodes (interpolated
        quadratically to gauss points).
    Returns: (E, 6, 2) consistent nodal thermal loads.
    """
    dN, wdet_r, n_over_r, detJ = axisym_gauss_data(coords)
    n_g = jnp.asarray(N_AT_GAUSS, dtype=coords.dtype)
    dT_g = jnp.einsum("gn,en->eg", n_g, dT_nodes)  # (E, 3)
    eps_th = alpha * dT_g[..., None] * jnp.asarray(
        [1.0, 1.0, 1.0, 0.0], dtype=coords.dtype)  # (E, 3, 4)
    stress = jnp.einsum("ab,egb->ega", C, eps_th)
    sel = jnp.asarray(_SEL_AX, dtype=coords.dtype)
    fe = jnp.einsum("egkn,ack,ega,eg->enc", dN, sel, stress, wdet_r)
    fe_hoop = jnp.einsum("egn,eg,eg->en", n_over_r, stress[:, :, 2], wdet_r)
    return fe.at[:, :, 0].add(fe_hoop)


def element_centrifugal_load_axisym(coords, rho_omega2):
    """Spin body-force load: fe = integral N rho w^2 r e_r dV, (E, 6, 2).

    rho_omega2 = rho * omega^2 [kg/m^3 * (rad/s)^2]; the radial body force
    of a solid of revolution rotating about its own axis (rotor/pipe spin).
    """
    _, wdet_r, _, _ = axisym_gauss_data(coords)
    n_g = jnp.asarray(N_AT_GAUSS, dtype=coords.dtype)  # (3, 6)
    r_g = jnp.einsum("gn,en->eg", n_g, coords[:, :, 0])  # (E, 3)
    fe_r = rho_omega2 * jnp.einsum("gn,eg,eg->en", n_g, r_g, wdet_r)
    return jnp.stack([fe_r, jnp.zeros_like(fe_r)], axis=-1)


def element_strain_stress_axisym(coords, C, ue, alpha=0.0, dT_nodes=None):
    """Per-gauss-point axisymmetric strain/stress, thermal-corrected.

    stress = C (strain_total - strain_thermal). Returns (strain, stress),
    each (E, 3, 4) in Voigt [rr, zz, tt, rz].
    """
    dN, wdet_r, n_over_r, detJ = axisym_gauss_data(coords)
    strain = _axisym_strain(dN, n_over_r, jnp.asarray(ue))
    if dT_nodes is not None:
        n_g = jnp.asarray(N_AT_GAUSS, dtype=coords.dtype)
        dT_g = jnp.einsum("gn,en->eg", n_g, dT_nodes)
        eps_th = alpha * dT_g[..., None] * jnp.asarray(
            [1.0, 1.0, 1.0, 0.0], dtype=coords.dtype)
        mech = strain - eps_th
    else:
        mech = strain
    stress = jnp.einsum("ab,egb->ega", C, mech)
    return strain, stress


def von_mises_axisym(stress):
    """Von Mises from Voigt [rr, zz, tt, rz] stresses (..., 4)."""
    srr, szz, stt, srz = (stress[..., 0], stress[..., 1],
                          stress[..., 2], stress[..., 3])
    return jnp.sqrt(
        0.5 * ((srr - szz) ** 2 + (szz - stt) ** 2 + (stt - srr) ** 2)
        + 3.0 * srz**2
    )


# Exact consistent-mass constant: Mhat[i,j] = (1/A) integral(N_i N_j dA)
# over a straight-sided Tri6, via integral(L1^a L2^b L3^c dA) =
# 2A a! b! c! / (a+b+c+2)!.
def _mass_matrix_hat() -> np.ndarray:
    from math import factorial

    def corner(i):
        e2 = [0, 0, 0]
        e2[i] = 2
        e1 = [0, 0, 0]
        e1[i] = 1
        return {tuple(e2): 2.0, tuple(e1): -1.0}

    def edge(i, j):
        e = [0, 0, 0]
        e[i] += 1
        e[j] += 1
        return {tuple(e): 4.0}

    shapes = [corner(i) for i in range(3)] + [edge(0, 1), edge(1, 2), edge(2, 0)]

    def integral(mono):
        s = sum(mono)
        num = 2.0
        for e in mono:
            num *= factorial(e)
        return num / factorial(s + 2)

    M = np.zeros((6, 6))
    for i in range(6):
        for j in range(i, 6):
            acc = 0.0
            for ei, ci in shapes[i].items():
                for ej, cj in shapes[j].items():
                    acc += ci * cj * integral(tuple(a + b for a, b in zip(ei, ej)))
            M[i, j] = M[j, i] = acc
    return M


MASS_HAT = _mass_matrix_hat()  # (6, 6)


def element_area(coords) -> jnp.ndarray:
    """Signed areas of straight triangles from their 3 corner nodes (E,)."""
    c = jnp.asarray(coords)
    v1 = c[:, 1, :] - c[:, 0, :]
    v2 = c[:, 2, :] - c[:, 0, :]
    return 0.5 * (v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
