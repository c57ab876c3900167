"""Shaft modal product tests (ShaftModalAnalysis).

Validation against closed-form references:
  - pinned-pinned uniform shaft: Euler-Bernoulli lateral frequencies
    f_n = (n pi / L)^2 sqrt(E I / (rho A)) / (2 pi), whirl pairs degenerate;
  - torsional fundamental: fixed-free circular bar f = sqrt(G/rho) / (4 L);
  - axial fundamental: fixed-free bar f = sqrt(E/rho) / (4 L);
  - hollow vs solid at equal outer diameter: f scales by sqrt(1 + k^2),
    k = d_inner / d (I/A ratio);
  - adding a mid-span bearing quadruples the first critical speed
    (two pinned spans of L/2).
"""

import numpy as np
import pytest

from femx.analysis.shaft import ShaftModalAnalysis

E, NU, RHO = 2.0e11, 0.3, 7850.0
G = E / (2 * (1 + NU))


def _eb_lateral_hz(n, L, d):
    I = np.pi * d**4 / 64.0
    A = np.pi * d**2 / 4.0
    return (n * np.pi / L) ** 2 * np.sqrt(E * I / (RHO * A)) / (2 * np.pi)


@pytest.fixture(scope="module")
def pinned_pinned():
    sm = ShaftModalAnalysis(
        segments=[{"length": 2.0, "d": 0.04}], bearings=[0.0, 2.0],
        E=E, nu=NU, rho=RHO, n_elems=60, verbose=False)
    sm.run(n_modes=12)
    return sm


def test_pinned_pinned_matches_euler_bernoulli(pinned_pinned):
    lat = pinned_pinned.lateral_frequencies_hz()
    # whirl pairs: y/z bending of a circular shaft is degenerate
    assert lat[0] == pytest.approx(lat[1], rel=1e-9)
    assert lat[2] == pytest.approx(lat[3], rel=1e-9)
    # Euler-Bernoulli within 1% for the slender (L/d = 50) first two pairs
    # (Timoshenko shear/rotary softening is O((n d / L)^2))
    assert lat[0] == pytest.approx(_eb_lateral_hz(1, 2.0, 0.04), rel=0.01)
    assert lat[2] == pytest.approx(_eb_lateral_hz(2, 2.0, 0.04), rel=0.01)
    # critical speeds are exactly 60x the lateral frequencies
    assert pinned_pinned.critical_speeds_rpm == pytest.approx(60.0 * lat)


def test_torsional_and_axial_families(pinned_pinned):
    tor = [m.frequency_hz for m in pinned_pinned.modes
           if m.family == "torsional"]
    ax = [m.frequency_hz for m in pinned_pinned.modes if m.family == "axial"]
    # fixed-free quarter-wave fundamentals (thrust bearing at x = 0)
    assert tor and tor[0] == pytest.approx(
        np.sqrt(G / RHO) / (4 * 2.0), rel=0.005)
    assert ax and ax[0] == pytest.approx(
        np.sqrt(E / RHO) / (4 * 2.0), rel=0.005)
    for m in pinned_pinned.modes:
        assert m.family in ("lateral", "torsional", "axial")
        assert (m.critical_speed_rpm is None) == (m.family != "lateral")


def test_hollow_raises_lateral_frequencies():
    kw = dict(bearings=[0.0, 2.0], E=E, nu=NU, rho=RHO, n_elems=40,
              verbose=False)
    solid = ShaftModalAnalysis([{"length": 2.0, "d": 0.04}], **kw)
    hollow = ShaftModalAnalysis(
        [{"length": 2.0, "d": 0.04, "d_inner": 0.024}], **kw)
    f_s = solid.run(6)[0].frequency_hz
    f_h = hollow.run(6)[0].frequency_hz
    k = 0.024 / 0.04
    assert f_h > f_s
    assert f_h / f_s == pytest.approx(np.sqrt(1 + k * k), rel=0.01)


def test_mid_bearing_quadruples_first_critical():
    kw = dict(E=E, nu=NU, rho=RHO, n_elems=64, verbose=False)
    two = ShaftModalAnalysis([{"length": 2.0, "d": 0.04}],
                             bearings=[0.0, 2.0], **kw)
    three = ShaftModalAnalysis([{"length": 2.0, "d": 0.04}],
                               bearings=[0.0, 1.0, 2.0], **kw)
    two.run(4)
    three.run(4)
    r = (three.lateral_frequencies_hz()[0] / two.lateral_frequencies_hz()[0])
    assert r == pytest.approx(4.0, rel=0.02)


def test_stepped_shaft_and_bearing_nodes():
    """Stepped shaft: bearings and steps land exactly on mesh nodes; the
    spectrum sits between the all-thin and all-thick uniform bounds."""
    sm = ShaftModalAnalysis(
        segments=[{"length": 0.8, "d": 0.05}, {"length": 0.6, "d": 0.08},
                  {"length": 0.8, "d": 0.05}],
        bearings=[0.1, 2.1], E=E, nu=NU, rho=RHO,
        target_elem_length=0.05, verbose=False)
    for x in (0.1, 0.8, 1.4, 2.1):
        assert np.min(np.abs(sm.mesh.points[:, 0] - x)) < 1e-12
    sm.run(4)
    f1 = sm.lateral_frequencies_hz()[0]
    lo = ShaftModalAnalysis([{"length": 2.2, "d": 0.05}], bearings=[0.1, 2.1],
                            E=E, nu=NU, rho=RHO, verbose=False).run(2)
    hi = ShaftModalAnalysis([{"length": 2.2, "d": 0.08}], bearings=[0.1, 2.1],
                            E=E, nu=NU, rho=RHO, verbose=False).run(2)
    assert lo[0].frequency_hz < f1 < hi[0].frequency_hz


def test_free_torsion_drops_rigid_mode():
    sm = ShaftModalAnalysis([{"length": 1.0, "d": 0.03}], bearings=[0.0, 1.0],
                            E=E, nu=NU, rho=RHO, free_torsion=True,
                            n_elems=30, verbose=False)
    sm.run(14)
    tor = [m.frequency_hz for m in sm.modes if m.family == "torsional"]
    # free-free torsional branch: rigid mode filtered, fundamental is the
    # half-wave  f = c / (2 L)
    if tor:  # the half-wave may sit above the requested mode count
        assert tor[0] == pytest.approx(np.sqrt(G / RHO) / (2 * 1.0), rel=0.01)
    assert all(m.frequency_hz > 1e-3 for m in sm.modes)


def test_input_validation():
    with pytest.raises(ValueError, match="segment"):
        ShaftModalAnalysis([], [0.0], E, NU, RHO)
    with pytest.raises(ValueError, match="bearing"):
        ShaftModalAnalysis([{"length": 1.0, "d": 0.03}], [], E, NU, RHO)
    with pytest.raises(ValueError, match="outside"):
        ShaftModalAnalysis([{"length": 1.0, "d": 0.03}], [2.0], E, NU, RHO)
    with pytest.raises(ValueError, match="d_inner"):
        ShaftModalAnalysis([{"length": 1.0, "d": 0.03, "d_inner": 0.03}],
                           [0.0, 1.0], E, NU, RHO)
