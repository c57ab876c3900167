"""Tri6 element kernel tests: plane + axisymmetric formulations.

Property tests in the style the solid path uses (SURVEY.md §4): symmetry,
rigid-body null space, constant-strain patch exactness, and closed-form
axisymmetric checks (uniform radial expansion of a ring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from femx.elements import tri6


def _two_triangle_square():
    """Unit square split into two straight Tri6 elements."""
    pts4 = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    return _promote(pts4, tris)


def _promote(pts, tri3):
    """Minimal tri3 -> tri6 promotion for tests (shared midside nodes)."""
    edges = {}
    conn6 = []
    pts = list(map(np.asarray, pts))
    for tri in tri3:
        mids = []
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(a, b), max(a, b))
            if key not in edges:
                edges[key] = len(pts)
                pts.append(0.5 * (pts[a] + pts[b]))
            mids.append(edges[key])
        conn6.append(list(tri) + mids)
    return np.asarray(pts, dtype=np.float64), np.asarray(conn6, dtype=np.int32)


def test_shape_functions_partition_of_unity():
    assert np.allclose(tri6.N_AT_GAUSS.sum(axis=1), 1.0)
    assert np.allclose(tri6.DN_NATURAL.sum(axis=2), 0.0)


def test_plane_stiffness_symmetry_and_rigid_body():
    pts, conn = _two_triangle_square()
    # distort interior-free nodes a bit (straight edges kept)
    coords = jnp.asarray(pts[conn])
    C = tri6.material_matrix_plane(2e11, 0.3, mode="stress")
    ke, n_bad = tri6.element_stiffness_plane(coords, C, thickness=0.01)
    ke = np.asarray(ke)
    assert int(n_bad) == 0
    assert np.allclose(ke, np.swapaxes(ke, 1, 2), atol=1e-3)
    # rigid-body null space: two translations + one rotation
    for e in range(len(conn)):
        xy = pts[conn[e]]
        modes = np.zeros((3, 12))
        modes[0, 0::2] = 1.0  # ux
        modes[1, 1::2] = 1.0  # uy
        modes[2, 0::2] = -xy[:, 1]  # rotation
        modes[2, 1::2] = xy[:, 0]
        r = ke[e] @ modes.T
        assert np.abs(r).max() < 1e-4 * np.abs(ke[e]).max()


@pytest.mark.parametrize("mode", ["stress", "strain"])
def test_plane_patch_constant_strain(mode):
    """A linear displacement field is reproduced exactly: K u = f implies the
    internal forces of a constant-strain state sum to zero on interior DOFs."""
    # 3x3-node patch: irregular interior node placement
    pts4 = np.array([
        [0.0, 0.0], [0.5, 0.0], [1.0, 0.0],
        [0.0, 0.45], [0.57, 0.52], [1.0, 0.5],
        [0.0, 1.0], [0.5, 1.0], [1.0, 1.0],
    ])
    tris = np.array([
        [0, 1, 4], [0, 4, 3], [1, 2, 5], [1, 5, 4],
        [3, 4, 7], [3, 7, 6], [4, 5, 8], [4, 8, 7],
    ])
    pts, conn = _promote(pts4, tris)
    C = tri6.material_matrix_plane(1000.0, 0.25, mode=mode)
    coords = jnp.asarray(pts[conn])
    dN, wdet, detJ = tri6.jacobians(coords)
    assert float(np.min(np.asarray(detJ))) > 0
    # u = A x + b (linear) -> constant strain
    A = np.array([[2e-3, 1e-3], [-5e-4, 3e-3]])
    u = pts @ A.T  # (N, 2)
    ue = jnp.asarray(u[conn])
    fe = tri6.element_apply_plane(dN, wdet, C, ue)
    f = np.zeros_like(u)
    np.add.at(f, conn.reshape(-1), np.asarray(fe).reshape(-1, 2))
    # interior nodes (not on the patch boundary) carry zero net force
    interior = [
        i for i, p in enumerate(pts)
        if 1e-9 < p[0] < 1 - 1e-9 and 1e-9 < p[1] < 1 - 1e-9
    ]
    assert len(interior) >= 5
    scale = np.abs(f).max()
    assert np.abs(f[interior]).max() < 1e-10 * scale
    # strains at every gauss point equal the imposed constant strain
    strain, _ = tri6.element_strain_stress_plane(dN, C, ue)
    want = np.array([A[0, 0], A[1, 1], A[0, 1] + A[1, 0]])
    assert np.allclose(np.asarray(strain), want, rtol=1e-9, atol=1e-12)


def test_plane_apply_matches_stiffness():
    pts, conn = _two_triangle_square()
    C = tri6.material_matrix_plane(70e9, 0.33, mode="strain")
    coords = jnp.asarray(pts[conn])
    ke, _ = tri6.element_stiffness_plane(coords, C, thickness=2.5)
    rng = np.random.default_rng(3)
    ue = rng.standard_normal((len(conn), 6, 2))
    dN, wdet, _ = tri6.jacobians(coords)
    fe = tri6.element_apply_plane(dN, wdet, C, jnp.asarray(ue), thickness=2.5)
    want = np.einsum("eij,ej->ei", np.asarray(ke), ue.reshape(len(conn), 12))
    assert np.allclose(np.asarray(fe).reshape(len(conn), 12), want,
                       rtol=1e-9, atol=1e-6)


def test_material_matrices():
    E, v = 210e9, 0.3
    Cs = np.asarray(tri6.material_matrix_plane(E, v, "stress"))
    assert np.isclose(Cs[0, 0], E / (1 - v * v))
    assert np.isclose(Cs[2, 2], E / (2 * (1 + v)))  # = G
    Cn = np.asarray(tri6.material_matrix_plane(E, v, "strain"))
    lam = E * v / ((1 + v) * (1 - 2 * v))
    mu = E / (2 * (1 + v))
    assert np.isclose(Cn[0, 0], lam + 2 * mu)
    assert np.isclose(Cn[0, 1], lam)
    Ca = np.asarray(tri6.material_matrix_axisym(E, v))
    assert np.allclose(Ca[:3, :3] - lam, 2 * mu * np.eye(3))
    assert np.isclose(Ca[3, 3], mu)
    with pytest.raises(ValueError):
        tri6.material_matrix_plane(E, v, "bogus")


def test_mass_hat_rows_sum_to_area_fraction():
    # sum_j integral(Ni Nj) = integral(Ni); fractions of total area sum to 1
    assert np.isclose(tri6.MASS_HAT.sum(), 1.0)
    pts, conn = _two_triangle_square()
    A = np.asarray(tri6.element_area(jnp.asarray(pts[conn])))
    assert np.allclose(A, 0.5)


def _ring_mesh(r_i, r_o, nz, nr, length):
    """Structured (r, z) rectangle: the axisymmetric model of a cylinder."""
    r = np.linspace(r_i, r_o, 2 * nr + 1)
    z = np.linspace(0.0, length, 2 * nz + 1)
    pts4, tris = [], []
    nid = {}
    for i in range(0, 2 * nr + 1, 2):
        for j in range(0, 2 * nz + 1, 2):
            nid[(i, j)] = len(pts4)
            pts4.append((r[i], z[j]))
    for i in range(0, 2 * nr - 1, 2):
        for j in range(0, 2 * nz - 1, 2):
            a = nid[(i, j)]
            b = nid[(i + 2, j)]
            c = nid[(i + 2, j + 2)]
            d = nid[(i, j + 2)]
            tris.append([a, b, c])
            tris.append([a, c, d])
    return _promote(np.asarray(pts4, dtype=np.float64), np.asarray(tris))


def test_axisym_uniform_expansion_of_free_ring():
    """u_r = c*r, u_z = 0 on a ring: eps_rr = eps_tt = c, eps_zz = 0.

    The resulting stress is uniform; internal forces must vanish on interior
    nodes, and the strain recovery must be exact (the axisymmetric patch
    test including the hoop N/r row).
    """
    pts, conn = _ring_mesh(0.5, 1.0, nz=2, nr=3, length=0.4)
    C = tri6.material_matrix_axisym(200.0, 0.3)
    coords = jnp.asarray(pts[conn])
    c = 1e-3
    u = np.stack([c * pts[:, 0], np.zeros(len(pts))], axis=1)
    dN, wdet_r, n_over_r, detJ = tri6.axisym_gauss_data(coords)
    assert float(np.min(np.asarray(detJ))) > 0
    strain = np.asarray(tri6._axisym_strain(dN, n_over_r, jnp.asarray(u[conn])))
    assert np.allclose(strain[..., 0], c, rtol=1e-9)  # rr
    assert np.allclose(strain[..., 2], c, rtol=1e-9)  # tt (hoop via N/r)
    assert np.abs(strain[..., 1]).max() < 1e-12  # zz
    assert np.abs(strain[..., 3]).max() < 1e-12  # rz


def test_axisym_stiffness_symmetric_and_matches_apply():
    pts, conn = _ring_mesh(1.0, 2.0, nz=1, nr=2, length=0.5)
    C = tri6.material_matrix_axisym(100.0, 0.25)
    coords = jnp.asarray(pts[conn])
    ke, n_bad = tri6.element_stiffness_axisym(coords, C)
    ke = np.asarray(ke)
    assert int(n_bad) == 0
    assert np.allclose(ke, np.swapaxes(ke, 1, 2), rtol=1e-8, atol=1e-10)
    rng = np.random.default_rng(7)
    ue = rng.standard_normal((len(conn), 6, 2))
    dN, wdet_r, n_over_r, _ = tri6.axisym_gauss_data(coords)
    fe = tri6.element_apply_axisym(dN, wdet_r, n_over_r, C, jnp.asarray(ue))
    want = np.einsum("eij,ej->ei", ke, ue.reshape(len(conn), 12))
    assert np.allclose(np.asarray(fe).reshape(len(conn), 12), want,
                       rtol=1e-8, atol=1e-8)
    # axial rigid translation is a zero-energy mode; radial translation is NOT
    # (hoop strain u_r/r resists it)
    uz = np.zeros((len(conn), 12))
    uz[:, 1::2] = 1.0
    assert np.abs(np.einsum("eij,ej->ei", ke, uz)).max() < 1e-8 * np.abs(ke).max()


def test_axisym_thermal_load_self_equilibrated_uniform():
    """Uniform dT on an unconstrained ring: thermal loads must be the exact
    K @ u_thermal for the free-expansion field u_r = alpha*dT*r, u_z =
    alpha*dT*z (which is stress-free), so solving K u = f_th recovers it."""
    pts, conn = _ring_mesh(0.6, 1.4, nz=2, nr=2, length=0.8)
    E_mod, v, alpha, dT = 50.0, 0.3, 1e-5, 40.0
    C = tri6.material_matrix_axisym(E_mod, v)
    coords = jnp.asarray(pts[conn])
    f_th = tri6.element_thermal_load_axisym(
        coords, C, alpha, jnp.full((len(conn), 6), dT))
    ke, _ = tri6.element_stiffness_axisym(coords, C)
    u_free = alpha * dT * pts  # (N, 2): u_r = a*dT*r, u_z = a*dT*z
    fe = np.einsum("eij,ej->ei", np.asarray(ke),
                   u_free[conn].reshape(len(conn), 12))
    assert np.allclose(np.asarray(f_th).reshape(len(conn), 12), fe,
                       rtol=1e-8, atol=1e-8)
    # and the recovered stress of the free-expansion field is zero
    _, stress = tri6.element_strain_stress_axisym(
        coords, C, jnp.asarray(u_free[conn]), alpha=alpha,
        dT_nodes=jnp.full((len(conn), 6), dT))
    assert np.abs(np.asarray(stress)).max() < 1e-10 * E_mod * alpha * dT
