"""Element-kernel property tests: symmetry, rigid-body modes, transforms,
and parity with an independent textbook implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.elements import beam as beam_el

PROPS = dict(L=2.0, E=2e11, G=7.7e10, A=5e-3, I_x=4.17e-6, I_y=1.04e-6, J=2.9e-6,
             kappa_y=0.85, kappa_z=0.85)


def textbook_timoshenko(L, E, G, A, I_x, I_y, J, kappa_y, kappa_z):
    """Independent dense construction of the standard 3D Timoshenko stiffness
    (Przemieniecki), with the reference's I/phi pairing (BeamSolver.py:646-660)."""
    k = np.zeros((12, 12))
    phi_z = 12 * E * I_y / (G * kappa_y * A * L**2)
    phi_y = 12 * E * I_x / (G * kappa_z * A * L**2)
    ax = E * A / L
    t = G * J / L
    for (i, j, v) in [(0, 0, ax), (0, 6, -ax), (6, 6, ax), (3, 3, t), (3, 9, -t), (9, 9, t)]:
        k[i, j] = v
        k[j, i] = v

    def fill(dofs, I, phi, sgn):
        k11 = 12 * E * I / (L**3 * (1 + phi))
        k12 = sgn * 6 * E * I / (L**2 * (1 + phi))
        k22 = (4 + phi) * E * I / (L * (1 + phi))
        k23 = (2 - phi) * E * I / (L * (1 + phi))
        v1, r1, v2, r2 = dofs
        blk = {
            (v1, v1): k11, (v1, r1): k12, (v1, v2): -k11, (v1, r2): k12,
            (r1, r1): k22, (r1, v2): -k12, (r1, r2): k23,
            (v2, v2): k11, (v2, r2): -k12,
            (r2, r2): k22,
        }
        for (i, j), v in blk.items():
            k[i, j] = v
            k[j, i] = v

    fill((1, 5, 7, 11), I_y, phi_z, +1)
    fill((2, 4, 8, 10), I_x, phi_y, -1)
    return k


def test_stiffness_matches_textbook():
    got = np.asarray(beam_el.timoshenko_stiffness(
        PROPS["L"], PROPS["E"], PROPS["G"], PROPS["A"], PROPS["I_x"], PROPS["I_y"],
        PROPS["J"], PROPS["kappa_y"], PROPS["kappa_z"]))
    want = textbook_timoshenko(**PROPS)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-3)


def test_stiffness_symmetry_and_rigid_body_modes():
    ke = np.asarray(beam_el.timoshenko_stiffness(
        PROPS["L"], PROPS["E"], PROPS["G"], PROPS["A"], PROPS["I_x"], PROPS["I_y"],
        PROPS["J"], PROPS["kappa_y"], PROPS["kappa_z"]))
    np.testing.assert_allclose(ke, ke.T, rtol=1e-12)
    L = PROPS["L"]
    # 6 rigid-body modes: 3 translations + 3 (linearized) rotations about node1
    rigid = np.zeros((6, 12))
    for c in range(3):  # translations
        rigid[c, c] = rigid[c, 6 + c] = 1.0
    # rotation about x: both nodes rotate rx (beam along local x -> no displacement)
    rigid[3, 3] = rigid[3, 9] = 1.0
    # rotation about y: node2 moves -L in z?? convention: uz2 = -ry*L... use
    # uz2 = -L * ry with ry at both nodes
    rigid[4, 4] = rigid[4, 10] = 1.0
    rigid[4, 8] = -L
    # rotation about z: uy2 = +L * rz
    rigid[5, 5] = rigid[5, 11] = 1.0
    rigid[5, 7] = L
    scale = np.abs(ke).max()
    for r in rigid:
        np.testing.assert_allclose(ke @ r / scale, 0.0, atol=1e-12)
    # and exactly 6 near-zero eigenvalues
    w = np.linalg.eigvalsh(ke)
    assert np.sum(np.abs(w) < scale * 1e-10) == 6


def test_degenerate_inputs_give_zero_matrix():
    ke = np.asarray(beam_el.timoshenko_stiffness(0.0, 2e11, 7.7e10, 1e-3, 1e-6, 1e-6, 1e-6, 0.8, 0.8))
    np.testing.assert_array_equal(ke, np.zeros((12, 12)))


def test_lumped_mass():
    L, A, I_x, I_y, J, rho = 2.0, 5e-3, 4.17e-6, 1.04e-6, 2.9e-6, 7850.0
    m = np.asarray(beam_el.lumped_mass(L, A, I_x, I_y, J, rho))
    assert np.allclose(m, np.diag(np.diag(m)))
    assert m[0, 0] == pytest.approx(rho * A * L / 2)
    assert m[3, 3] == pytest.approx(rho * J * L / 2)
    assert m[4, 4] == pytest.approx(rho * I_x * L / 2)
    assert m[5, 5] == pytest.approx(rho * I_y * L / 2)
    # total translational mass = rho A L
    assert m[0, 0] + m[6, 6] == pytest.approx(rho * A * L)


def test_consistent_mass_properties():
    L, A, I_x, I_y, J, rho = 2.0, 5e-3, 4.17e-6, 1.04e-6, 2.9e-6, 7850.0
    m = np.asarray(beam_el.consistent_mass(L, A, I_x, I_y, J, rho))
    np.testing.assert_allclose(m, m.T, rtol=1e-12)
    w = np.linalg.eigvalsh(m)
    assert np.all(w > 0)
    # translation-invariance: total mass recovered by unit translation
    for c in range(3):
        u = np.zeros(12)
        u[c] = u[6 + c] = 1.0
        assert u @ m @ u == pytest.approx(rho * A * L, rel=1e-12)


def test_direction_cosines_general_and_vertical():
    # along +x -> identity
    lam = np.asarray(beam_el.direction_cosine_matrix(jnp.zeros(3), jnp.array([2.0, 0, 0])))
    np.testing.assert_allclose(lam, np.eye(3), atol=1e-12)
    # vertical member +z (reference special case BeamSolver.py:380-381)
    lam = np.asarray(beam_el.direction_cosine_matrix(jnp.zeros(3), jnp.array([0, 0, 3.0])))
    np.testing.assert_allclose(lam, [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], atol=1e-12)
    lam = np.asarray(beam_el.direction_cosine_matrix(jnp.zeros(3), jnp.array([0, 0, -3.0])))
    np.testing.assert_allclose(lam, [[0, 0, -1], [0, 1, 0], [1, 0, 0]], atol=1e-12)
    # arbitrary direction: orthonormal, first row = unit direction
    d = np.array([1.0, 2.0, -0.5])
    lam = np.asarray(beam_el.direction_cosine_matrix(jnp.zeros(3), jnp.asarray(d)))
    np.testing.assert_allclose(lam @ lam.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(lam[0], d / np.linalg.norm(d), atol=1e-12)
    assert np.linalg.det(lam) == pytest.approx(1.0)


def test_global_stiffness_invariants_under_rotation():
    """Element energy is frame-invariant: rotating the member must preserve
    the eigenvalues of ke."""
    props = jnp.asarray([5e-3, 4.17e-6, 1.04e-6, 2.9e-6, 0.85, 0.85, 0.05, 0.025])
    p1 = jnp.zeros(3)
    ke_x, _, _ = beam_el.element_matrices(p1, jnp.array([2.0, 0, 0]), 2e11, 7.7e10, props, 7850.0)
    d = np.array([1.0, 1.0, 1.0]) * (2.0 / np.sqrt(3))
    ke_d, _, _ = beam_el.element_matrices(p1, jnp.asarray(d), 2e11, 7.7e10, props, 7850.0)
    wx = np.linalg.eigvalsh(np.asarray(ke_x))
    wd = np.linalg.eigvalsh(np.asarray(ke_d))
    np.testing.assert_allclose(wx, wd, rtol=1e-9, atol=np.abs(wx).max() * 1e-12)
