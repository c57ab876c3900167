"""3D Timoshenko frame element kernels — batched, jittable, TPU-first.

Functional re-derivation of the reference's beam element
(BeamSolver.py:646-675: `get_timoshenko_stiffness_matrix`,
`get_lumped_mass_matrix`) plus a consistent mass matrix the reference lacks.
All kernels are pure functions of per-element scalars, designed to be `vmap`ed
over an element batch; the 12x12 matrices are produced by one einsum against
constant sparsity tensors so the batched path lowers to MXU-friendly matmuls
instead of scatter loops.

Local DOF order per element (matching the reference):
  [ux1, uy1, uz1, rx1, ry1, rz1, ux2, uy2, uz2, rx2, ry2, rz2]
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Stiffness: 12x12 from 10 scalar components via a constant placement tensor.
# Component order:
#   0: EA/L       1: GJ/L
#   2: k11_z  3: k12_z  4: k22_z  5: k23_z      (bending, local xy-plane)
#   6: k11_y  7: k12_y  8: k22_y  9: k23_y      (bending, local xz-plane)
# Placement entries (i, j, comp, sign) transcribe the standard 3D Timoshenko
# stiffness (same layout as BeamSolver.py:654-660).
# ---------------------------------------------------------------------------
_K_ENTRIES = [
    (0, 0, 0, +1), (0, 6, 0, -1), (6, 0, 0, -1), (6, 6, 0, +1),           # axial
    (3, 3, 1, +1), (3, 9, 1, -1), (9, 3, 1, -1), (9, 9, 1, +1),           # torsion
    # xy-plane bending: DOFs (uy1=1, rz1=5, uy2=7, rz2=11)
    (1, 1, 2, +1), (1, 5, 3, +1), (1, 7, 2, -1), (1, 11, 3, +1),
    (5, 1, 3, +1), (5, 5, 4, +1), (5, 7, 3, -1), (5, 11, 5, +1),
    (7, 1, 2, -1), (7, 5, 3, -1), (7, 7, 2, +1), (7, 11, 3, -1),
    (11, 1, 3, +1), (11, 5, 5, +1), (11, 7, 3, -1), (11, 11, 4, +1),
    # xz-plane bending: DOFs (uz1=2, ry1=4, uz2=8, ry2=10); rotation sign flipped
    (2, 2, 6, +1), (2, 4, 7, -1), (2, 8, 6, -1), (2, 10, 7, -1),
    (4, 2, 7, -1), (4, 4, 8, +1), (4, 8, 7, +1), (4, 10, 9, +1),
    (8, 2, 6, -1), (8, 4, 7, +1), (8, 8, 6, +1), (8, 10, 7, +1),
    (10, 2, 7, -1), (10, 4, 9, +1), (10, 8, 7, +1), (10, 10, 8, +1),
]

# Kept as numpy at module scope: materializing a device array at import time
# would initialize a JAX backend before callers can select a platform.
_K_PLACE = np.zeros((144, 10))
for _i, _j, _c, _s in _K_ENTRIES:
    _K_PLACE[_i * 12 + _j, _c] = _s


def _safe_div(num, den):
    ok = den > 0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def timoshenko_stiffness(L, E, G, A, I_x, I_y, J, kappa_y, kappa_z):
    """12x12 local Timoshenko stiffness.

    Same math and zero-guards as the reference kernel (BeamSolver.py:646-660):
    shear factors phi = 12EI/(G kappa A L^2), every term guarded to 0 when its
    denominator is non-positive, so degenerate inputs (L=0, A=0, ...) produce
    a zero matrix instead of NaNs — which also makes the kernel safe to vmap
    over padded element batches.
    """
    L, E, G, A = (jnp.asarray(v) for v in (L, E, G, A))
    phi_z = _safe_div(12.0 * E * I_y, G * kappa_y * A * L**2)
    phi_y = _safe_div(12.0 * E * I_x, G * kappa_z * A * L**2)

    def bend(I, phi):
        k11 = _safe_div(12.0 * E * I, L**3 * (1.0 + phi))
        k12 = _safe_div(6.0 * E * I, L**2 * (1.0 + phi))
        k22 = _safe_div((4.0 + phi) * E * I, L * (1.0 + phi))
        k23 = _safe_div((2.0 - phi) * E * I, L * (1.0 + phi))
        return k11, k12, k22, k23

    kz = bend(I_y, phi_z)  # local xy-plane carries I_y (reference convention)
    ky = bend(I_x, phi_y)  # local xz-plane carries I_x
    comps = jnp.stack(
        [_safe_div(A * E, L), _safe_div(G * J, L), *kz, *ky]
    )
    return (jnp.asarray(_K_PLACE, dtype=comps.dtype) @ comps).reshape(12, 12)


def lumped_mass(L, A, I_x, I_y, J, rho):
    """Diagonal 12x12 lumped mass (reference: BeamSolver.py:662-675).

    Half the element translational mass rho*A*L at each node; rotary terms
    rho*J*L/2 (torsion), rho*I_x*L/2, rho*I_y*L/2.
    """
    tm = rho * A * L / 2.0
    rx = rho * J * L / 2.0
    ry = rho * I_x * L / 2.0
    rz = rho * I_y * L / 2.0
    diag = jnp.stack([tm, tm, tm, rx, ry, rz, tm, tm, tm, rx, ry, rz])
    return jnp.diag(diag)


# Consistent mass building blocks (constant coefficient matrices; classic
# Euler-Bernoulli consistent mass, Przemieniecki Ch. 11). Bending block is in
# (v1, th1, v2, th2) order with the xy-plane sign convention; the xz-plane
# block is obtained by conjugating with diag(1,-1,1,-1).
_M_AX = np.array([[1 / 3, 1 / 6], [1 / 6, 1 / 3]])
_MB_T = np.array(
    [
        [13 / 35, 11 / 210, 9 / 70, -13 / 420],
        [11 / 210, 1 / 105, 13 / 420, -1 / 140],
        [9 / 70, 13 / 420, 13 / 35, -11 / 210],
        [-13 / 420, -1 / 140, -11 / 210, 1 / 105],
    ]
)
_MB_R = np.array(
    [
        [6 / 5, 1 / 10, -6 / 5, 1 / 10],
        [1 / 10, 2 / 15, -1 / 10, -1 / 30],
        [-6 / 5, -1 / 10, 6 / 5, -1 / 10],
        [1 / 10, -1 / 30, -1 / 10, 2 / 15],
    ]
)
_BEND_XY = (1, 5, 7, 11)  # (uy1, rz1, uy2, rz2)
_BEND_XZ = (2, 4, 8, 10)  # (uz1, ry1, uz2, ry2)
_SIGN_XZ = np.array([1.0, -1.0, 1.0, -1.0])


def consistent_mass(L, A, I_x, I_y, J, rho):
    """12x12 consistent mass with rotary inertia (not present in the
    reference; exposed because modal configs call for consistent vs lumped).

    Torsional kinetic energy is rho*Ip*(dtheta/dt)^2/2 with the POLAR moment
    Ip = I_x + I_y — not the St-Venant torsion constant J, which belongs in
    the stiffness only (using J here is a classic modeling error; for open
    thin-walled sections Ip/J ~ 40, i.e. torsional frequencies off by ~6x).
    The J argument is kept for signature parity with the stiffness kernel
    and the lumped-mass kernel (which mirrors the reference's rho*J*L/2,
    BeamSolver.py:662-675)."""
    m = jnp.zeros((12, 12))
    # Axial & torsion (polar moment)
    ax = rho * A * L * jnp.asarray(_M_AX)
    tr = rho * (I_x + I_y) * L * jnp.asarray(_M_AX)
    for (a, b), blk in (((0, 6), ax), ((3, 9), tr)):
        idx = jnp.array([a, b])
        m = m.at[jnp.ix_(idx, idx)].add(blk)

    def bend_block(I, sign):
        one_l = jnp.ones_like(L)
        Ls = jnp.stack([one_l, L, one_l, L])
        scale = jnp.outer(Ls, Ls)
        blk = rho * A * L * jnp.asarray(_MB_T) * scale + rho * I / L * jnp.asarray(_MB_R) * scale
        s = jnp.asarray(sign)
        return blk * jnp.outer(s, s)

    one = np.ones(4)
    for idx, I, sign in ((_BEND_XY, I_y, one), (_BEND_XZ, I_x, _SIGN_XZ)):
        ii = jnp.array(idx)
        m = m.at[jnp.ix_(ii, ii)].add(bend_block(I, sign))
    return m


def direction_cosine_matrix(p1, p2, eps: float = 1e-6):
    """3x3 direction-cosine matrix for a member p1->p2.

    Branch-free (jnp.where) version of the reference's transform including its
    vertical-member special case (BeamSolver.py:378-384): when the member axis
    is within eps of global Z, lambda = [[0,0,s],[0,1,0],[-s,0,0]], s=sign(Czx).
    """
    p1 = jnp.asarray(p1)
    p2 = jnp.asarray(p2)
    d = p2 - p1
    L = jnp.linalg.norm(d)
    dirv = jnp.where(L > 0, d / jnp.where(L > 0, L, 1.0), 0.0)
    Cxx, Cyx, Czx = dirv[0], dirv[1], dirv[2]
    vert = Cxx**2 + Cyx**2 < eps**2
    D = jnp.sqrt(jnp.maximum(Cxx**2 + Cyx**2, 1e-300))
    lam_gen = jnp.array(
        [
            [Cxx, Cyx, Czx],
            [-Cyx / D, Cxx / D, jnp.zeros_like(D)],
            [-Cxx * Czx / D, -Cyx * Czx / D, D],
        ]
    )
    s = jnp.where(Czx > 0, 1.0, -1.0)
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    lam_vert = jnp.array([[zero, zero, s], [zero, one, zero], [-s, zero, zero]])
    return jnp.where(vert, lam_vert, lam_gen)


def rotation_12(lam):
    """R = kron(I4, lambda): block-diagonal 12x12 rotation (BeamSolver.py:386)."""
    return jnp.kron(jnp.eye(4, dtype=lam.dtype), lam)


def element_matrices(p1, p2, E, G, props, rho, mass: str = "lumped"):
    """Global-frame element (ke, me, L) for a member p1->p2.

    props = (A, I_x, I_y, J, kappa_y, kappa_z, c_y_max, c_z_max), the 8-tuple
    contract of the section engine (reference: BeamSolver.py:79,371).
    """
    A, I_x, I_y, J, kappa_y, kappa_z = props[0], props[1], props[2], props[3], props[4], props[5]
    L = jnp.linalg.norm(jnp.asarray(p2) - jnp.asarray(p1))
    k_local = timoshenko_stiffness(L, E, G, A, I_x, I_y, J, kappa_y, kappa_z)
    mfun = lumped_mass if mass == "lumped" else consistent_mass
    m_local = mfun(L, A, I_x, I_y, J, rho)
    lam = direction_cosine_matrix(p1, p2)
    R = rotation_12(lam)
    ke = R.T @ k_local @ R
    me = R.T @ m_local @ R
    return ke, me, L


def batched_element_matrices(p1, p2, E, G, props, rho, mass: str = "lumped"):
    """vmap of `element_matrices` over the element batch axis (mass model is
    a static kwarg, not a batched operand)."""
    return jax.vmap(lambda a, b, p: element_matrices(a, b, E, G, p, rho, mass=mass))(
        p1, p2, props
    )


def local_end_forces(p1, p2, E, G, props, u_element):
    """Local end-force vector f_local = k_local @ (R @ u_e) for stress
    recovery (reference: BeamSolver.py:425-431)."""
    A, I_x, I_y, J, kappa_y, kappa_z = props[0], props[1], props[2], props[3], props[4], props[5]
    L = jnp.linalg.norm(jnp.asarray(p2) - jnp.asarray(p1))
    k_local = timoshenko_stiffness(L, E, G, A, I_x, I_y, J, kappa_y, kappa_z)
    R = rotation_12(direction_cosine_matrix(p1, p2))
    return k_local @ (R @ u_element)
