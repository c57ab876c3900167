"""Beam pipeline golden tests: analytic cantilever statics + modal."""

import numpy as np
import pytest

from femx.analysis import BeamAnalysis
from femx.mesh import FrameBuilder, cantilever_line_mesh

E, NU = 2e11, 0.3
G = E / (2 * (1 + NU))
RHO = 7850.0
B, D = 0.05, 0.1
L = 2.0

# femx follows the reference's axis convention (BeamSolver.py:646-660):
# deflection in local y bends with I_y = iyy (the section's vertical-axis
# inertia), so a y-load on an x-beam engages iyy = d*b^3/12.
IYY = D * B**3 / 12
A = B * D
KAPPA = 10.0 / 12.0  # rectangle, nu_section = 0 (reference's default material)


def _cantilever(n_elems, mass="lumped"):
    mesh = cantilever_line_mesh(length=L, n_elems=n_elems)
    section_data = [
        {"group": "beam", "type": "rectangular section", "params": {"d": D, "b": B}}
    ]
    bc_data = [
        {"group": "fix", "type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True,
         "fix_rx": True, "fix_ry": True, "fix_rz": True},
        {"group": "load_y", "type": "Force", "force_x": 0.0, "force_y": -1000.0, "force_z": 0.0},
    ]
    return BeamAnalysis(mesh, section_data, bc_data, E=E, nu=NU, rho=RHO, mass=mass)


def test_cantilever_tip_deflection_analytic():
    """Timoshenko cantilever tip deflection PL^3/3EI + PL/kappa*A*G — the
    cubic Timoshenko element is nodally exact for a tip load, so agreement
    must be to solver precision (SURVEY.md §4 golden strategy)."""
    res = _cantilever(2).run()
    P = -1000.0
    analytic = P * L**3 / (3 * E * IYY) + P * L / (KAPPA * A * G)
    uy_tip = res.u[6 * 1 + 1]  # node 1 is the tip in cantilever_line_mesh
    assert uy_tip == pytest.approx(analytic, rel=1e-10)


def test_cantilever_mesh_invariance():
    """Nodal exactness: answers identical for 1, 4, 16 elements."""
    tips = []
    for n in (1, 4, 16):
        res = _cantilever(n).run()
        tips.append(res.u[6 * 1 + 1])
    np.testing.assert_allclose(tips, tips[0], rtol=1e-10)


def test_cantilever_root_reactions():
    res = _cantilever(4).run()
    r = res.reactions()
    # Root carries +1000 N in y and the tip moment P*L about local z
    assert r[6 * 0 + 1] == pytest.approx(1000.0, rel=1e-9)
    assert abs(r[6 * 0 + 5]) == pytest.approx(1000.0 * L, rel=1e-9)
    # r = K u contains reactions at fixed DOFs and the applied loads at free
    # DOFs; the global sum must vanish (equilibrium)
    assert r[1::6].sum() == pytest.approx(0.0, abs=1e-7)


def test_cantilever_root_stress():
    """Extreme-fiber bending stress at the root: M*c/I."""
    res = _cantilever(8).run()
    M_root = 1000.0 * L
    sigma = M_root * (B / 2) / IYY
    # root node stress is the element-end value (node 0 belongs to 1 element)
    assert res.smoothed_stresses[0] == pytest.approx(sigma, rel=1e-9)


def test_modal_frequencies_euler_bernoulli():
    """First bending frequencies vs analytic EB cantilever (consistent mass,
    fine mesh; tolerance covers shear/rotary effects of the Timoshenko model)."""
    res = _cantilever(32, mass="consistent").run()
    lam1, lam2 = 1.8751040687, 4.6940911330
    freqs_hz = res.natural_frequencies_hz
    for lam, expect_scale in ((lam1, 1.0), (lam2, 1.0)):
        f_eb = lam**2 / (2 * np.pi * L**2) * np.sqrt(E * IYY / (RHO * A))
        # nearest computed frequency within 1%
        rel = np.min(np.abs(freqs_hz - f_eb) / f_eb)
        assert rel < 0.01, (lam, f_eb, freqs_hz[:6])


def test_modal_lumped_vs_consistent_close():
    f_l = _cantilever(32, mass="lumped").run().natural_frequencies_hz
    f_c = _cantilever(32, mass="consistent").run().natural_frequencies_hz
    np.testing.assert_allclose(f_l[:4], f_c[:4], rtol=0.02)


def test_portal_frame_with_vertical_members():
    """Statically-indeterminate portal frame: vertical-member transform path
    + reaction equilibrium (multi-span config of BASELINE.json)."""
    fb = FrameBuilder()
    b0 = fb.add_node((0, 0, 0))
    b1 = fb.add_node((4, 0, 0))
    t0 = fb.add_node((0, 0, 3))
    t1 = fb.add_node((4, 0, 3))
    fb.add_vertex_group("base", [b0, b1])
    fb.add_vertex_group("top", [t0])
    fb.add_member(b0, t0, "cols", n_elems=2)  # vertical
    fb.add_member(b1, t1, "cols", n_elems=2)  # vertical
    fb.add_member(t0, t1, "girder", n_elems=2)
    mesh = fb.build()
    section = {"type": "rectangular section", "params": {"d": 0.1, "b": 0.1}}
    section_data = [dict(group="cols", **section), dict(group="girder", **section)]
    bc_data = [
        {"group": "base", "type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True,
         "fix_rx": True, "fix_ry": True, "fix_rz": True},
        {"group": "top", "type": "Force", "force_x": 5000.0, "force_y": 0.0, "force_z": -10000.0},
    ]
    res = BeamAnalysis(mesh, section_data, bc_data, E=E, nu=NU, rho=RHO).run()
    r = res.reactions()
    # global equilibrium: r = K u sums to zero; reactions at the fixed base
    # balance the applied loads
    assert r[0::6].sum() == pytest.approx(0.0, abs=1e-6)
    base_dofs_x = [6 * b0 + 0, 6 * b1 + 0]
    base_dofs_z = [6 * b0 + 2, 6 * b1 + 2]
    assert sum(r[i] for i in base_dofs_x) == pytest.approx(-5000.0, rel=1e-8)
    assert sum(r[i] for i in base_dofs_z) == pytest.approx(10000.0, rel=1e-8)
    # displacements finite and the loaded node moved in +x
    assert np.isfinite(res.u).all()
    assert res.u[6 * t0 + 0] > 0
    # modal returns a spectrum
    assert len(res.natural_frequencies) > 6
    assert np.all(res.natural_frequencies > 0)


def test_missing_section_raises():
    mesh = cantilever_line_mesh(n_elems=2)
    with pytest.raises(ValueError, match="not defined for physical group"):
        BeamAnalysis(mesh, [], [], E=E, nu=NU).run()
