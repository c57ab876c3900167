"""2D Static Analysis product tests (PlaneAnalysis + rect_tri6).

The reference lists "2D Static Analysis" as a launcher option but ships only
an empty placeholder dialog (FEM_main.py:412-431); femx implements it. These
tests validate against exact solutions: uniform uniaxial tension (exact for
any mesh with consistent edge loads) and a cantilever vs Timoshenko beam
theory, plus equilibrium self-checks on both the dense and PCG solve paths.
"""

import numpy as np
import pytest

from femx.analysis.plane import PlaneAnalysis
from femx.mesh.generators2d import rect_tri6, tri3_to_tri6


def test_rect_tri6_mesh_structure():
    mesh = rect_tri6(1.0, 0.5, 0.25)
    # 4x2 cells -> 9x5 lattice
    assert mesh.num_nodes == 9 * 5
    assert mesh.cells["triangle6"].shape == (16, 6)
    for g in ("left", "right", "bottom", "top", "surface"):
        assert g in mesh.field_data
    # all z = 0, edge groups span the full side
    assert np.all(mesh.points[:, 2] == 0.0)
    from femx.mesh.core import nodes_in_physical_group

    left = nodes_in_physical_group(mesh, "left")
    assert np.allclose(mesh.points[left, 0], 0.0)
    assert len(left) == 5  # 2*ny+1 nodes on the left edge


def test_uniaxial_tension_exact():
    """sigma_xx = P/(t*H) uniform: exact at ANY mesh size with consistent
    edge tractions; displacements linear => FEM reproduces them exactly."""
    L, H, t, E, v, P = 2.0, 0.5, 0.01, 70e9, 0.33, 1000.0
    mesh = rect_tri6(L, H, 0.25)
    pa = PlaneAnalysis(
        mesh,
        [{"group": "right", "force_x": P, "force_y": 0.0}],
        [{"group": "left", "fix_x": 0},  # roller: u_x = 0, u_y free
         {"pos_x": 0.0, "pos_y": 0.0, "fix_y": 0}],  # pin one corner
        E=E, v=v, thickness=t, mode="stress", verbose=False,
    ).run_simulation()
    sigma = P / (t * H)
    u = pa.u.reshape(-1, 2)
    ux_want = sigma / E * mesh.points[:, 0]
    # Poisson contraction about the pinned corner (y = 0)
    uy_want = -v * sigma / E * mesh.points[:, 1]
    assert np.allclose(u[:, 0], ux_want, rtol=1e-8, atol=1e-12)
    assert np.allclose(u[:, 1], uy_want, rtol=1e-8, atol=1e-12)
    s_node, vm = pa.compute_stresses()
    assert np.allclose(s_node[:, 0], sigma, rtol=1e-8)
    assert np.abs(s_node[:, 1]).max() < 1e-6 * sigma
    assert np.allclose(vm, sigma, rtol=1e-6)
    assert np.abs(pa.equilibrium_residual()).max() < 1e-8 * P


def test_cantilever_vs_timoshenko_beam():
    """Deep-mesh cantilever plate: tip deflection matches beam theory
    delta = PL^3/(3EI) + P L/(kappa G A) within the 2D-vs-1D model gap."""
    L, H, t, E, v, P = 2.0, 0.2, 0.01, 200e9, 0.3, -500.0
    mesh = rect_tri6(L, H, 0.025)  # 80x8 cells
    pa = PlaneAnalysis(
        mesh,
        [{"group": "right", "force_x": 0.0, "force_y": P}],
        [{"group": "left", "fix_x": 0, "fix_y": 0}],
        E=E, v=v, thickness=t, mode="stress", verbose=False,
    ).run_simulation()
    I = t * H**3 / 12.0
    A = t * H
    G = E / (2 * (1 + v))
    kappa = 5.0 / 6.0
    delta_beam = abs(P) * L**3 / (3 * E * I) + abs(P) * L / (kappa * G * A)
    tip = np.where((np.abs(mesh.points[:, 0] - L) < 1e-12)
                   & (np.abs(mesh.points[:, 1] - H / 2) < 1e-12))[0][0]
    delta_fem = abs(pa.u.reshape(-1, 2)[tip, 1])
    assert delta_fem == pytest.approx(delta_beam, rel=0.03)
    # equilibrium: reactions balance the tip load
    assert np.abs(pa.equilibrium_residual()).max() < 1e-7 * abs(P)
    # bending stress at the root ~ M c / I (within nodal-averaging error)
    s_node, vm = pa.compute_stresses()
    sigma_root = abs(P) * L * (H / 2) / I
    root_top = np.where((mesh.points[:, 0] < 0.03)
                        & (np.abs(mesh.points[:, 1] - H) < 1e-12))[0]
    assert vm[root_top].max() == pytest.approx(sigma_root, rel=0.2)


def test_pcg_path_matches_exact_solution():
    """Above DENSE_DOF_LIMIT the pipeline takes MG-PCG on lattice meshes
    and block-Jacobi PCG on arbitrary ones; the uniaxial exact solution
    must come back either way (and solve_info says which)."""
    L, H, t, E, v, P = 1.0, 1.0, 0.02, 10e9, 0.2, 400.0

    def run(mesh):
        return PlaneAnalysis(
            mesh,
            [{"group": "right", "force_x": P, "force_y": 0.0}],
            [{"group": "left", "fix_x": 0},
             {"pos_x": 0.0, "pos_y": 0.0, "fix_y": 0}],
            E=E, v=v, thickness=t, mode="stress", verbose=False,
            cg_tol=1e-12,
        ).run_simulation()

    mesh = rect_tri6(L, H, 1.0 / 40)  # 81x81 nodes -> 13122 DOF
    sigma = P / (t * H)
    pa = run(mesh)
    assert pa.solve_info["method"] == "mg_pcg_2d"
    assert pa.solve_info["converged"]
    assert np.allclose(pa.u.reshape(-1, 2)[:, 0],
                       sigma / E * mesh.points[:, 0], rtol=1e-6, atol=1e-12)
    assert np.abs(pa.equilibrium_residual()).max() < 1e-6 * P

    # same mesh with the lattice provenance stripped = the arbitrary-.msh
    # ingest path -> block-Jacobi fallback, same answer
    del mesh.lattice2d
    pa = run(mesh)
    assert pa.solve_info["method"] == "block_jacobi_pcg"
    assert pa.solve_info["converged"]
    assert np.allclose(pa.u.reshape(-1, 2)[:, 0],
                       sigma / E * mesh.points[:, 0], rtol=1e-6, atol=1e-12)


def test_plane_strain_mode_and_point_load():
    """Plane strain + point load + point fixes (the solid-product BC idiom)."""
    mesh = rect_tri6(1.0, 1.0, 0.1,
                     force_points=[(0.5, 1.0)],
                     fix_points=[(0.0, 0.0), (1.0, 0.0)])
    pa = PlaneAnalysis(
        mesh,
        [{"force_x": 0.0, "force_y": -100.0,
          "force_x_pstn": 0.5, "force_y_pstn": 1.0}],
        [{"pos_x": 0.0, "pos_y": 0.0, "fix_x": 0, "fix_y": 0},
         {"pos_x": 1.0, "pos_y": 0.0, "fix_x": 0, "fix_y": 0}],
        E=30e9, v=0.2, mode="strain", verbose=False,
    ).run_simulation()
    assert np.abs(pa.equilibrium_residual()).max() < 1e-8 * 100.0
    # symmetry: the two support reactions share the vertical load equally
    r = pa.reaction_forces
    n0 = pa.fixed_nodes_info[0]["node_idx"]
    n1 = pa.fixed_nodes_info[1]["node_idx"]
    assert r[2 * n0 + 1] == pytest.approx(r[2 * n1 + 1], rel=1e-9)
    assert r[2 * n0 + 1] == pytest.approx(50.0, rel=1e-9)


def test_tri3_promotion_path():
    """A linear-triangle mesh is auto-promoted to Tri6 inside the pipeline."""
    from femx.mesh.core import Mesh

    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=float)
    tris = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    mesh = Mesh(points=pts, cells={"triangle": tris},
                cell_physical={"triangle": np.ones(2, dtype=np.int32)},
                field_data={"surface": (1, 2)})
    pa = PlaneAnalysis(
        mesh,
        [{"force_x": 50.0, "force_y": 0.0,
          "force_x_pstn": 1.0, "force_y_pstn": 1.0}],
        [{"pos_x": 0.0, "pos_y": 0.0, "fix_x": 0, "fix_y": 0},
         {"pos_x": 0.0, "pos_y": 1.0, "fix_x": 0, "fix_y": 0}],
        E=1e9, v=0.3, verbose=False,
    ).run_simulation()
    assert pa.num_nodes == 4 + 5  # 5 shared midside nodes
    assert np.abs(pa.equilibrium_residual()).max() < 1e-9 * 50.0


def test_bad_inputs():
    mesh = rect_tri6(1.0, 1.0, 0.5)
    with pytest.raises(ValueError, match="mode"):
        PlaneAnalysis(mesh, [], [], E=1e9, v=0.3, mode="bogus", verbose=False)
    pa = PlaneAnalysis(mesh, [{"group": "nope", "force_x": 1.0}],
                       [{"group": "left", "fix_x": 0, "fix_y": 0}],
                       E=1e9, v=0.3, verbose=False)
    pa.assemble()
    with pytest.raises(ValueError, match="Force group"):
        pa.apply_boundary_conditions()
    from femx.mesh.core import Mesh

    bad = Mesh(points=np.zeros((3, 3)), cells={},
               cell_physical={}, field_data={})
    with pytest.raises(ValueError, match="triangle"):
        PlaneAnalysis(bad, [], [], E=1e9, v=0.3, verbose=False)


def test_thermal_free_expansion_is_stress_free():
    """Uniform dT with minimal (statically determinate) supports: exact
    linear expansion displacements and ~zero stress everywhere."""
    E, v, al, dT = 70e9, 0.33, 2.3e-5, 80.0
    mesh = rect_tri6(0.4, 0.2, 0.05)
    pa = PlaneAnalysis(
        mesh, [],
        [{"pos_x": 0.0, "pos_y": 0.0, "fix_x": 0, "fix_y": 0},
         {"pos_x": 0.4, "pos_y": 0.0, "fix_y": 0}],
        E=E, v=v, mode="stress", alpha=al, temperature=dT,
        verbose=False).run_simulation()
    s, vm = pa.compute_stresses()
    scale = E * al * dT
    assert np.abs(s).max() < 1e-8 * scale
    u = pa.u.reshape(-1, 2)
    want = al * dT * (mesh.points[:, :2] - [0.0, 0.0])
    assert np.allclose(u, want, rtol=1e-8, atol=1e-10 * al * dT)


@pytest.mark.parametrize("mode,denominator", [
    ("strain", lambda v: 1 - 2 * v),  # sigma = -E alpha dT / (1-2v)
    ("stress", lambda v: 1 - v),      # sigma = -E alpha dT / (1-v)
])
def test_thermal_fully_constrained_exact_stress(mode, denominator):
    """All edges fixed, uniform dT: the classical constrained thermal
    stress, exact in both plane formulations."""
    E, v, al, dT = 200e9, 0.3, 1.2e-5, 100.0
    mesh = rect_tri6(0.3, 0.3, 0.05)
    pa = PlaneAnalysis(
        mesh, [],
        [{"group": g, "fix_x": 0, "fix_y": 0}
         for g in ("left", "right", "bottom", "top")],
        E=E, v=v, mode=mode, alpha=al, temperature=dT,
        verbose=False).run_simulation()
    s, _ = pa.compute_stresses()
    want = -E * al * dT / denominator(v)
    assert np.abs(pa.u).max() < 1e-12
    assert s[:, 0] == pytest.approx(want, rel=1e-9)
    assert s[:, 1] == pytest.approx(want, rel=1e-9)
    assert np.abs(s[:, 2]).max() < 1e-6 * abs(want)


def test_thermal_callable_field_and_validation():
    mesh = rect_tri6(0.2, 0.1, 0.05)
    pa = PlaneAnalysis(mesh, [], [{"group": "left", "fix_x": 0, "fix_y": 0}],
                       E=1e9, v=0.3, alpha=1e-5,
                       temperature=lambda x, y: 100.0 * x,
                       verbose=False)
    assert pa.dT_nodes is not None
    assert pa.dT_nodes.max() == pytest.approx(100.0 * 0.2)
    with pytest.raises(ValueError, match="alpha"):
        PlaneAnalysis(mesh, [], [], E=1e9, v=0.3, temperature=50.0,
                      verbose=False)


def test_plane_mass_matrix_properties():
    """Consistent Tri6 mass: exact total mass and rigid-translation action
    (degree-4 quadrature is exact for the P2 mass integrand)."""
    import jax.numpy as jnp

    from femx.elements import tri6 as tri6_el

    rho, t, W, H = 7850.0, 0.02, 0.4, 0.3
    mesh = rect_tri6(W, H, 0.1)
    coords = jnp.asarray(mesh.points[:, :2])[jnp.asarray(
        mesh.cells["triangle6"])]
    me = tri6_el.element_mass_plane(coords, rho, thickness=t)
    # symmetric, and each element's entries sum to 2 * rho t A_e
    assert np.abs(np.asarray(me) - np.swapaxes(np.asarray(me), 1, 2)).max() < 1e-9
    assert float(me.sum()) == pytest.approx(2 * rho * t * W * H, rel=1e-12)
    # rigid x-translation: (M u)_total = total mass in x, zero in y
    ue = np.zeros((len(coords), 12))
    ue[:, 0::2] = 1.0
    f = np.einsum("eij,ej->ei", np.asarray(me), ue)
    assert f[:, 0::2].sum() == pytest.approx(rho * t * W * H, rel=1e-12)
    assert abs(f[:, 1::2].sum()) < 1e-9


def test_plane_modal_cantilever_matches_beam_theory():
    """Slender cantilever plate (L/H = 20): first two bending frequencies
    within ~2% of Euler-Bernoulli, first axial mode within 1% of the exact
    fixed-free bar."""
    L, H, t, E, v, rho = 1.0, 0.05, 0.01, 2e11, 0.3, 7850.0
    mesh = rect_tri6(L, H, 1.0 / 80)
    pa = PlaneAnalysis(mesh, [],
                       [{"group": "left", "fix_x": 0, "fix_y": 0}],
                       E=E, v=v, thickness=t, mode="stress",
                       verbose=False).run_simulation()
    res = pa.modal(n_modes=6, rho=rho)
    f = np.asarray(res.omega) / (2 * np.pi)
    I, A = t * H**3 / 12, t * H
    eb = lambda beta: beta**2 / (2 * np.pi) * np.sqrt(E * I / (rho * A * L**4))
    assert f[0] == pytest.approx(eb(1.8751), rel=0.02)
    assert f[1] == pytest.approx(eb(4.69409), rel=0.02)
    f_axial = np.sqrt(E / rho) / (4 * L)
    assert np.abs(f / f_axial - 1).min() < 0.01  # the axial mode is in there
    assert res.modes.shape[0] == pa.ndof
    # mode shapes vanish on the clamped edge
    left = np.where(np.abs(mesh.points[:, 0]) < 1e-12)[0]
    dofs = np.concatenate([2 * left, 2 * left + 1])
    assert np.abs(res.modes[dofs, :]).max() < 1e-12
    with pytest.raises(ValueError, match="dense 2D modal"):
        big = PlaneAnalysis(mesh, [], [{"group": "left", "fix_x": 0,
                                        "fix_y": 0}],
                            E=E, v=v, verbose=False)
        big.MODAL_DOF_LIMIT = 10
        big.run_simulation()
        big.modal(2)
