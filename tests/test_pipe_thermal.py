"""Pipe Thermal Stress product tests (PipeThermalAnalysis, axisymmetric Tri6).

Validation against two independent references:
  - pressure-only: the exact Lame thick-cylinder solution;
  - thermal: a 2000-point finite-difference solve of the 1D radial ODE
      (lam+2mu) [u'' + u'/r - u/r^2] = beta T'(r),  beta = alpha E/(1-2 nu)
    with sigma_rr(r_i) = -p_i, sigma_rr(r_o) = -p_o (plane strain).
"""

import numpy as np
import pytest

from femx.analysis.pipe import PipeThermalAnalysis, log_temperature_profile


def _radial_fd_reference(a, b, E, v, alpha, Ti, To, pi=0.0, po=0.0, N=2001):
    """Plane-strain axisymmetric radial BVP by 2nd-order finite differences.

    Returns (r, u, sigma_rr, sigma_tt, sigma_zz)."""
    lam = E * v / ((1 + v) * (1 - 2 * v))
    mu = E / (2 * (1 + v))
    beta = alpha * E / (1 - 2 * v)
    r = np.linspace(a, b, N)
    h = r[1] - r[0]
    T = log_temperature_profile(r, a, b, Ti, To) if Ti or To else np.zeros(N)
    dT = ((To - Ti) / np.log(b / a)) / r if Ti or To else np.zeros(N)

    A = np.zeros((N, N))
    rhs = np.zeros(N)
    c = lam + 2 * mu
    for i in range(1, N - 1):
        A[i, i - 1] = c * (1 / h**2 - 1 / (2 * h * r[i]))
        A[i, i] = c * (-2 / h**2 - 1 / r[i] ** 2)
        A[i, i + 1] = c * (1 / h**2 + 1 / (2 * h * r[i]))
        rhs[i] = beta * dT[i]
    # sigma_rr(a) = -pi : c u'(a) + lam u(a)/a = beta T(a) - pi
    A[0, 0] = c * (-3 / (2 * h)) + lam / a
    A[0, 1] = c * (4 / (2 * h))
    A[0, 2] = c * (-1 / (2 * h))
    rhs[0] = beta * T[0] - pi
    A[-1, -1] = c * (3 / (2 * h)) + lam / b
    A[-1, -2] = c * (-4 / (2 * h))
    A[-1, -3] = c * (1 / (2 * h))
    rhs[-1] = beta * T[-1] - po
    u = np.linalg.solve(A, rhs)
    du = np.gradient(u, r, edge_order=2)
    s_rr = c * du + lam * u / r - beta * T
    s_tt = lam * du + c * u / r - beta * T
    s_zz = lam * (du + u / r) - beta * T
    return r, u, s_rr, s_tt, s_zz


def _lame(a, b, pi, po, r):
    A = (pi * a**2 - po * b**2) / (b**2 - a**2)
    B = (pi - po) * a**2 * b**2 / (b**2 - a**2)
    return A - B / r**2, A + B / r**2  # sigma_rr, sigma_tt


def test_pressure_only_matches_lame():
    a, b, E, v, p = 0.1, 0.16, 200e9, 0.3, 50e6
    pa = PipeThermalAnalysis(a, b, length=0.05, E=E, v=v, alpha=1.2e-5,
                             pressure_inner=p, end_condition="plane_strain",
                             n_r=24, n_z=4, verbose=False).run_simulation()
    radii, s_rr = pa.radial_profile(pa.stress_nodes[:, 0])
    _, s_tt = pa.radial_profile(pa.stress_nodes[:, 2])
    _, s_zz = pa.radial_profile(pa.stress_nodes[:, 1])
    _, u_r = pa.radial_profile(pa.u[0::2])
    rr_want, tt_want = _lame(a, b, p, 0.0, radii)
    # interior nodes: element-mean nodal averaging is clean away from the
    # surfaces; surfaces get a looser engineering tolerance below
    interior = slice(2, -2)
    scale = p
    assert np.abs(s_rr[interior] - rr_want[interior]).max() < 4e-3 * scale
    assert np.abs(s_tt[interior] - tt_want[interior]).max() < 4e-3 * scale
    # plane strain, isothermal: sigma_zz = v (sigma_rr + sigma_tt)
    assert np.abs(s_zz[interior]
                  - v * (s_rr + s_tt)[interior]).max() < 1e-3 * scale
    # hoop stress at the bore (the design number) within 1%
    assert s_tt[0] == pytest.approx(tt_want[0], rel=0.01)
    # radial displacement: exact plane-strain Lame formula
    A = p * a**2 / (b**2 - a**2)
    B = p * a**2 * b**2 / (b**2 - a**2)
    u_want = (1 + v) / E * ((1 - 2 * v) * A * radii + B / radii)
    assert np.allclose(u_r, u_want, rtol=1e-4)


def test_thermal_matches_radial_fd_reference():
    a, b, E, v, al = 0.05, 0.09, 210e9, 0.3, 1.1e-5
    Ti, To = 180.0, 40.0
    pa = PipeThermalAnalysis(a, b, length=0.04, E=E, v=v, alpha=al,
                             T_inner=Ti, T_outer=To,
                             end_condition="plane_strain",
                             n_r=32, n_z=4, verbose=False).run_simulation()
    r_fd, u_fd, rr_fd, tt_fd, zz_fd = _radial_fd_reference(
        a, b, E, v, al, Ti, To)
    radii, u_r = pa.radial_profile(pa.u[0::2])
    _, s_rr = pa.radial_profile(pa.stress_nodes[:, 0])
    _, s_tt = pa.radial_profile(pa.stress_nodes[:, 2])
    _, s_zz = pa.radial_profile(pa.stress_nodes[:, 1])
    u_want = np.interp(radii, r_fd, u_fd)
    rr_want = np.interp(radii, r_fd, rr_fd)
    tt_want = np.interp(radii, r_fd, tt_fd)
    zz_want = np.interp(radii, r_fd, zz_fd)
    scale = np.abs(tt_fd).max()  # ~ peak thermal stress
    assert np.allclose(u_r, u_want, rtol=2e-4)
    interior = slice(2, -2)
    assert np.abs(s_rr[interior] - rr_want[interior]).max() < 5e-3 * scale
    assert np.abs(s_tt[interior] - tt_want[interior]).max() < 5e-3 * scale
    assert np.abs(s_zz[interior] - zz_want[interior]).max() < 5e-3 * scale
    # hot bore: compression at the inner surface, peak von Mises there
    assert s_tt[0] < 0
    assert pa.von_mises.max() == pytest.approx(
        pa.von_mises[np.argmin(np.abs(pa.points[:, 0] - a))], rel=0.05)
    # bore hoop stress within 2% of the FD reference
    assert s_tt[0] == pytest.approx(tt_want[0], rel=0.02)


def test_free_end_axial_equilibrium_and_relief():
    """Free far end: consistent thermal loads have zero axial resultant, so
    the z-reactions at the anchored end sum to ~0; and freeing the end
    relieves axial stress near it vs the fully anchored pipe."""
    kw = dict(E=100e9, v=0.3, alpha=1e-5, T_inner=120.0, T_outer=20.0,
              n_r=12, n_z=12, verbose=False)
    free = PipeThermalAnalysis(0.06, 0.1, length=0.3,
                               end_condition="free", **kw).run_simulation()
    anchored = PipeThermalAnalysis(0.06, 0.1, length=0.3,
                                   end_condition="plane_strain",
                                   **kw).run_simulation()
    # axial reactions at z=0: r = K u - f on the fixed DOFs
    import jax.numpy as jnp

    r_full = np.asarray(free.operator.apply(jnp.asarray(free.u))) - free.f
    rz = r_full[free.fixed_dofs]
    total_axial = rz.sum()
    scale = np.abs(free.f).sum() + 1e-30
    assert abs(total_axial) < 1e-8 * scale
    # near the free end, |sigma_zz| drops vs the anchored configuration
    top_nodes = np.where(np.abs(free.points[:, 1] - 0.3) < 1e-12)[0]
    assert (np.abs(free.stress_nodes[top_nodes, 1]).max()
            < 0.5 * np.abs(anchored.stress_nodes[top_nodes, 1]).max())


def test_pcg_path_and_input_validation():
    pa = PipeThermalAnalysis(0.05, 0.08, length=0.5, E=200e9, v=0.3,
                             alpha=1e-5, T_inner=100.0,
                             n_r=16, n_z=96, verbose=False)
    assert pa.ndof > pa.DENSE_DOF_LIMIT
    pa.run_simulation()
    # rect lattices route through the 2D geometric multigrid
    assert pa.solve_info["method"] == "mg_pcg_2d"
    assert pa.solve_info["converged"]
    assert pa.solve_info["iterations"] < 60
    assert len(pa.solve_info["mg_levels"]) >= 2
    with pytest.raises(ValueError, match="r_inner"):
        PipeThermalAnalysis(0.1, 0.05, 1.0, 1e9, 0.3, 1e-5)
    with pytest.raises(ValueError, match="end_condition"):
        PipeThermalAnalysis(0.05, 0.1, 1.0, 1e9, 0.3, 1e-5,
                            end_condition="bogus")


def test_spinning_pipe_matches_exact_rotating_cylinder():
    """Centrifugal load only: the exact plane-strain rotating-annulus
    solution  sigma_r = k (a^2+b^2 - a^2 b^2/r^2 - r^2),
    sigma_t = k (a^2+b^2 + a^2 b^2/r^2) - (1+2v)/(8(1-v)) rho w^2 r^2,
    with k = (3-2v)/(8(1-v)) rho w^2 and traction-free surfaces."""
    a, b, E, v, rho, rpm = 0.06, 0.12, 2e11, 0.3, 7850.0, 20000.0
    pa = PipeThermalAnalysis(a, b, length=0.05, E=E, v=v, alpha=1e-5,
                             rho=rho, spin_rpm=rpm,
                             end_condition="plane_strain",
                             n_r=32, n_z=4, verbose=False).run_simulation()
    w = rpm * 2 * np.pi / 60.0
    k = (3 - 2 * v) / (8 * (1 - v)) * rho * w**2
    radii, s_rr = pa.radial_profile(pa.stress_nodes[:, 0])
    _, s_tt = pa.radial_profile(pa.stress_nodes[:, 2])
    rr_want = k * (a**2 + b**2 - a**2 * b**2 / radii**2 - radii**2)
    tt_want = (k * (a**2 + b**2 + a**2 * b**2 / radii**2)
               - (1 + 2 * v) / (8 * (1 - v)) * rho * w**2 * radii**2)
    scale = np.abs(tt_want).max()
    assert np.abs(s_rr - rr_want).max() < 5e-3 * scale
    assert np.abs(s_tt - tt_want).max() < 5e-3 * scale
    # traction-free surfaces and peak hoop at the bore
    assert abs(s_rr[0]) < 5e-3 * scale and abs(s_rr[-1]) < 5e-3 * scale
    assert s_tt[0] == pytest.approx(tt_want[0], rel=0.01)
    with pytest.raises(ValueError, match="rho"):
        PipeThermalAnalysis(a, b, 0.05, E, v, 1e-5, spin_rpm=1000.0)
