"""Section-property tests: exact polygon moments, J/kappa sanity, contract."""

import numpy as np
import pytest

from femx.sections import (
    build_geometry,
    calculate_section_properties,
    compute_properties,
    polygon_moments,
    torsion_rectangle,
)


def test_rectangle_exact():
    p = compute_properties("rectangular section", {"d": 0.1, "b": 0.05}, method="closed_form")
    assert p.A == pytest.approx(0.005, rel=1e-14)
    assert p.I_x == pytest.approx(0.05 * 0.1**3 / 12, rel=1e-12)  # ixx
    assert p.I_y == pytest.approx(0.1 * 0.05**3 / 12, rel=1e-12)  # iyy
    assert p.c_y_max == pytest.approx(0.025, rel=1e-12)
    assert p.c_z_max == pytest.approx(0.05, rel=1e-12)
    assert p.kappa_y == pytest.approx(10 / 12, rel=1e-12)  # nu=0 rectangle


def test_rectangle_torsion_series():
    # Square: J = 0.140577 a^4 (classical value)
    assert torsion_rectangle(1.0, 1.0) == pytest.approx(0.14057, rel=1e-3)
    # Thin strip: J -> a t^3 / 3
    assert torsion_rectangle(1.0, 0.01) == pytest.approx(1.0 * 0.01**3 / 3, rel=0.02)


def test_circle_polygon_discretization():
    # n=64 polygon area (matches the reference's sectionproperties call with
    # n=64): A = (n/2) r^2 sin(2 pi/n)
    d = 0.1
    p = compute_properties("circular section", {"d": d}, method="closed_form")
    r = d / 2
    n = 64
    assert p.A == pytest.approx(0.5 * n * r**2 * np.sin(2 * np.pi / n), rel=1e-12)
    assert p.A == pytest.approx(np.pi * r**2, rel=2e-3)  # close to the disc
    assert p.I_x == pytest.approx(np.pi * d**4 / 64, rel=4e-3)
    assert p.J == pytest.approx(np.pi * d**4 / 32, rel=1e-12)  # closed form


def test_hollow_circular():
    d, t = 0.1, 0.01
    p = compute_properties("hollow circular section", {"d": d, "t": t}, method="closed_form")
    di = d - 2 * t
    area_ngon = lambda dd: 0.5 * 64 * (dd / 2) ** 2 * np.sin(2 * np.pi / 64)
    assert p.A == pytest.approx(area_ngon(d) - area_ngon(di), rel=1e-12)
    assert p.J == pytest.approx(np.pi * (d**4 - di**4) / 32, rel=1e-12)


def test_i_section_moments():
    # I-beam without fillets: decompose into 3 rectangles
    d, b, tf, tw = 0.2, 0.1, 0.01, 0.006
    p = compute_properties(
        "I section", {"d": d, "b": b, "t_f": tf, "t_w": tw, "r": 0.0}, method="closed_form"
    )
    A_ref = 2 * b * tf + (d - 2 * tf) * tw
    ixx_ref = (
        2 * (b * tf**3 / 12 + b * tf * ((d - tf) / 2) ** 2) + tw * (d - 2 * tf) ** 3 / 12
    )
    iyy_ref = 2 * tf * b**3 / 12 + (d - 2 * tf) * tw**3 / 12
    assert p.A == pytest.approx(A_ref, rel=1e-12)
    assert p.I_x == pytest.approx(ixx_ref, rel=1e-12)
    assert p.I_y == pytest.approx(iyy_ref, rel=1e-12)
    assert p.c_y_max == pytest.approx(b / 2, rel=1e-12)
    assert p.c_z_max == pytest.approx(d / 2, rel=1e-12)


def test_channel_moments():
    d, b, tf, tw = 0.15, 0.075, 0.01, 0.006
    p = compute_properties(
        "C section", {"d": d, "b": b, "t_f": tf, "t_w": tw, "r": 0.0}, method="closed_form"
    )
    A_ref = 2 * b * tf + (d - 2 * tf) * tw
    assert p.A == pytest.approx(A_ref, rel=1e-12)
    ixx_ref = (
        2 * (b * tf**3 / 12 + b * tf * ((d - tf) / 2) ** 2) + tw * (d - 2 * tf) ** 3 / 12
    )
    assert p.I_x == pytest.approx(ixx_ref, rel=1e-12)


def test_hollow_box_moments():
    d, b, t = 0.1, 0.06, 0.005
    p = compute_properties(
        "hollow box section", {"d": d, "b": b, "t": t, "r_out": 0.0}, method="closed_form"
    )
    A_ref = b * d - (b - 2 * t) * (d - 2 * t)
    ixx_ref = (b * d**3 - (b - 2 * t) * (d - 2 * t) ** 3) / 12
    assert p.A == pytest.approx(A_ref, rel=1e-12)
    assert p.I_x == pytest.approx(ixx_ref, rel=1e-12)


def test_angle_moments():
    d, b, t = 0.1, 0.075, 0.008
    p = compute_properties(
        "L section", {"d": d, "b": b, "t": t, "r_r": 0.0, "r_t": 0.0}, method="closed_form"
    )
    assert p.A == pytest.approx(b * t + (d - t) * t, rel=1e-12)


def test_rotate_swaps_pairs():
    params = {"d": 0.1, "b": 0.05}
    p = compute_properties("rectangular section", params, method="closed_form")
    pr = compute_properties("rectangular section", params, rotate=True, method="closed_form")
    assert pr.I_x == p.I_y and pr.I_y == p.I_x
    assert pr.kappa_y == p.kappa_z and pr.kappa_z == p.kappa_y
    assert pr.c_y_max == p.c_z_max and pr.c_z_max == p.c_y_max
    assert pr.A == p.A and pr.J == p.J


def test_reference_contract_zero_tuple_on_failure():
    # Unknown type -> zeros 8-tuple, no raise (reference BeamSolver.py:80-82)
    out = calculate_section_properties("bogus section", {"d": 1.0})
    assert out == (0.0,) * 8


def test_fillet_area_increases():
    base = compute_properties(
        "I section", {"d": 0.05, "b": 0.025, "t_f": 0.005, "t_w": 0.005, "r": 0.0},
        method="closed_form",
    )
    filleted = compute_properties(
        "I section", {"d": 0.05, "b": 0.025, "t_f": 0.005, "t_w": 0.005, "r": 0.002},
        method="closed_form",
    )
    # fillets add material at the web-flange junctions
    assert filleted.A > base.A
