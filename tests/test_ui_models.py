"""Headless GUI view-model tests: CRUD, display strings, end-to-end runs."""

import numpy as np
import pytest

from femx.ui.models import (
    IMPLEMENTED_PRODUCTS,
    PRODUCT_OPTIONS,
    BeamAnalysisModel,
    ReactionCalculatorModel,
)


def test_launcher_options_match_reference():
    assert PRODUCT_OPTIONS == [
        "Reaction Force Calculator",
        "Beam analysis",
        "Shaft modal",
        "2D Static Analysis",
        "Pipe Thermal Stress Analysis",
    ]
    # femx implements all five launcher entries (the reference only the
    # first two; its last three are empty placeholders, FEM_main.py:412-431)
    assert IMPLEMENTED_PRODUCTS == PRODUCT_OPTIONS


def test_reaction_model_defaults():
    """Pre-seeded defaults mirror the reference (FEM_main.py:115-130)."""
    m = ReactionCalculatorModel()
    assert m.system_data == {"x": 0.8, "y": 0.2, "z": 0.8, "mesh": 0.05}
    assert len(m.force_data_list) == 1 and m.force_data_list[0]["force_y"] == 3000.0
    assert len(m.fix_data_list) == 4
    assert m.youngs_modul == 2e11 and m.poisson_ratio == 0.3
    items = m.list_items()
    assert items[0] == "System Size: (0.8, 0.2, 0.8), Mesh Size: 0.05"
    assert items[1].startswith("Force 1: (0.0, 3000.0, 0.0) @ Pos: (0.4, 0.2, 0.4)")
    assert items[2].endswith("- Fixed Dof: [X, Y, Z]")
    assert len(items) == 1 + 1 + 4


def test_reaction_model_crud():
    m = ReactionCalculatorModel()
    m.add_force((1.0, 2.0, 3.0), (0.1, 0.2, 0.3))
    assert len(m.force_data_list) == 2
    m.add_fix((0.5, 0.0, 0.5), True, False, True)
    f = m.fix_data_list[-1]
    assert f["fix_x"] == 0 and f["fix_y"] is None and f["fix_z"] == 0
    # remove the force just added (row 2 = second force)
    assert m.remove_item(2)
    assert len(m.force_data_list) == 1
    assert not m.remove_item(0)  # system row not removable


def test_reaction_model_end_to_end(tmp_path):
    m = ReactionCalculatorModel()
    m.system_data = {"x": 0.4, "y": 0.2, "z": 0.4, "mesh": 0.2}
    m.force_data_list = [{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
                          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}]
    m.fix_data_list = [
        {"pos_x": x, "pos_y": 0.0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
        for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]
    ]
    m.mesh_file = str(tmp_path / "generated_mesh.msh")
    mesh = m.generate_mesh()
    assert (tmp_path / "generated_mesh.msh").exists()
    fa = m.run_analysis(verbose=False)
    assert np.abs(fa.equilibrium_residual()).max() < 1e-7
    out = m.plot_results(filename=str(tmp_path / "result.png"))
    assert (tmp_path / "result.png").exists()


def test_beam_model_end_to_end(tmp_path):
    m = BeamAnalysisModel()
    groups = m.load_mesh("/root/reference/cantilever_beam")
    assert set(groups) == {"fix", "load_y", "beam"}
    assert m.assign_section("beam", "rectangular section", {"d": 0.1, "b": 0.05})
    assert m.assign_bc("fix", {"type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True,
                               "fix_rx": True, "fix_ry": True, "fix_rz": True})
    assert m.assign_bc("load_y", {"type": "Force", "force_x": 0.0,
                                  "force_y": -1000.0, "force_z": 0.0})
    items = m.list_items()
    assert items[0].startswith("[Section] beam: rectangular section,")
    assert "[BC] fix: Fix (X, Y, Z, RX, RY, RZ)" in items
    assert "[BC] load_y: Force F=(0.0, -1000.0, 0.0)" in items

    res = m.run_simulation(E=2e11, nu=0.3, rho=7850)
    # nodally-exact Timoshenko cantilever deflection (weak axis convention)
    iyy = 0.1 * 0.05**3 / 12
    G = 2e11 / 2.6
    analytic = -1000.0 * 8 / (3 * 2e11 * iyy) + -1000.0 * 2 / ((10 / 12) * 0.005 * G)
    assert res.u[6 * 1 + 1] == pytest.approx(analytic, rel=1e-9)

    # overwrite semantics
    assert m.assign_section("beam", "circular section", {"d": 0.1})
    assert len(m.section_data) == 1 and m.section_data[0]["type"] == "circular section"
    assert not m.assign_section("beam", "circular section", {"d": 0.2}, overwrite=False)

    # report + plots + preview
    rep = m.create_report(str(tmp_path / "beam_report.md"))
    assert rep.endswith(".md") and (tmp_path / "beam_report.md").exists()
    m.plot_static(str(tmp_path / "static.png"))
    m.plot_modal(1, str(tmp_path / "mode1.png"))
    m.preview_sections(str(tmp_path / "sections.png"))
    for f in ("static.png", "mode1.png", "sections.png"):
        assert (tmp_path / f).exists()


def test_beam_model_requires_line_mesh():
    from femx.mesh import box_tet10

    m = BeamAnalysisModel()
    with pytest.raises(ValueError, match="line"):
        m.load_mesh(box_tet10(0.2, 0.2, 0.2, 0.2))


def test_qt_gated_cleanly():
    from femx.ui import qt

    assert qt.QT_AVAILABLE is False  # this environment has no PyQt5
    with pytest.raises(RuntimeError, match="PyQt5"):
        qt.launch()


def test_beam_edit_item_semantics():
    """edit_item mirrors the reference dialog-accept semantics
    (BeamSolver.py:252-271): section rows keep group/type and take new
    params+rotate; BC rows are replaced wholesale but keep their group."""
    from femx.ui.models import BeamAnalysisModel

    m = BeamAnalysisModel()
    m.assign_section("beam", "I section",
                     {"d": 0.05, "b": 0.025, "t_w": 0.005, "t_f": 0.005, "r": 0.001})
    m.assign_bc("fix", {"type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True})

    # section row: params replaced, rotate popped out of the param dict
    assert m.edit_item(0, new_params={"d": 0.06, "b": 0.03, "t_w": 0.004,
                                      "t_f": 0.004, "r": 0.001, "rotate": True})
    sec = m.section_data[0]
    assert sec["group"] == "beam" and sec["type"] == "I section"
    assert sec["params"]["d"] == 0.06 and "rotate" not in sec["params"]
    assert sec["rotate"] is True

    # BC row: new data, group preserved even if the caller supplies one
    assert m.edit_item(1, new_bc={"group": "IGNORED", "type": "Force",
                                  "force_y": -500.0})
    bc = m.bc_data[0]
    assert bc["group"] == "fix" and bc["type"] == "Force"
    assert bc["force_y"] == -500.0

    # out-of-range rows report failure
    assert not m.edit_item(5, new_params={})


def test_shaft_model_crud_and_run():
    from femx.ui.models import ShaftModalModel

    m = ShaftModalModel()
    assert any("Segment 1" in s for s in m.list_items())
    m.add_segment(0.5, 0.06, d_inner=0.03)
    m.add_bearing(2.5)
    assert len(m.list_items()) == 5  # 2 segments + 3 bearings
    assert m.remove_item(1)          # drop the added segment
    assert m.remove_item(3)          # drop the added bearing (now row 3)
    m.n_modes = 4
    m.run_analysis(verbose=False)
    assert len(m.results_text()) == 4
    assert "critical speed" in m.results_text()[0]


def test_plane_model_crud_and_run():
    from femx.ui.models import PlaneAnalysisModel

    m = PlaneAnalysisModel()
    m.set_system(0.4, 0.2, 0.05)
    m.add_force((100.0, 0.0), pos_xy=(0.4, 0.1))
    m.add_fix(True, False, group="bottom")
    assert len(m.list_items()) == 5  # system + 2 forces + 2 fixes
    assert not m.remove_item(0)      # system row not removable
    assert m.remove_item(2)          # the point force
    assert m.remove_item(3)          # the bottom fix
    a = m.run_analysis(verbose=False)
    assert a.solve_info["method"] == "dense_cholesky"
    assert np.abs(a.equilibrium_residual()).max() < 1e-6


def test_pipe_model_run():
    from femx.ui.models import PipeThermalModel

    m = PipeThermalModel()
    assert len(m.list_items()) == 4
    m.n_r, m.n_z = 8, 4
    m.run_analysis(verbose=False)
    txt = m.results_text()
    assert any("von Mises" in s for s in txt)
    assert any("bore hoop" in s for s in txt)
