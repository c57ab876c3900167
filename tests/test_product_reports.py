"""Plots + reports for the three new products (shaft / plane / pipe),
driven through the public analysis methods and the CLI flags."""

import numpy as np
import pytest

from femx.analysis.pipe import PipeThermalAnalysis
from femx.analysis.plane import PlaneAnalysis
from femx.analysis.shaft import ShaftModalAnalysis
from femx.mesh.generators2d import rect_tri6


@pytest.fixture(scope="module")
def plane(tmp_path_factory):
    pa = PlaneAnalysis(
        rect_tri6(0.4, 0.2, 0.05),
        [{"group": "right", "force_x": 0.0, "force_y": -500.0}],
        [{"group": "left", "fix_x": 0, "fix_y": 0}],
        E=2e11, v=0.3, thickness=0.01, verbose=False)
    pa.run_simulation()
    pa.compute_stresses()
    return pa


def test_plane_plot_and_report(plane, tmp_path):
    for field in ("von_mises", "disp", "sxx"):
        out = plane.plot(str(tmp_path / f"{field}.png"), field=field)
        assert (tmp_path / f"{field}.png").stat().st_size > 0, out
    rep = plane.generate_report(str(tmp_path / "plane.md"))
    text = (tmp_path / "plane.md").read_text()
    assert "2D Static Analysis Report" in text
    assert "Max von Mises stress" in text
    assert "plane stress" in text
    assert (tmp_path / "plane_von_mises.png").exists()
    # docx flavor goes through the vendored writer
    plane.generate_report(str(tmp_path / "plane.docx"))
    assert (tmp_path / "plane.docx").stat().st_size > 0


def test_pipe_plot_and_report(tmp_path):
    pa = PipeThermalAnalysis(0.05, 0.08, length=0.1, E=2e11, v=0.3,
                             alpha=1.2e-5, T_inner=150.0, T_outer=30.0,
                             pressure_inner=2e6, n_r=12, n_z=6,
                             verbose=False).run_simulation()
    pa.plot(str(tmp_path / "pipe.png"))
    assert (tmp_path / "pipe.png").stat().st_size > 0
    pa.generate_report(str(tmp_path / "pipe.md"))
    text = (tmp_path / "pipe.md").read_text()
    assert "Pipe Thermal Stress Analysis Report" in text
    assert "Bore (inner)" in text and "sigma_theta" in text
    assert (tmp_path / "pipe_stresses.png").exists()


def test_shaft_mode_plot_and_report(tmp_path):
    sm = ShaftModalAnalysis([{"length": 1.0, "d": 0.03}], [0.0, 1.0],
                            E=2e11, nu=0.3, rho=7850, n_elems=20,
                            verbose=False)
    with pytest.raises(RuntimeError, match="Run"):
        sm.generate_report(str(tmp_path / "never.md"))
    sm.run(6)
    sm.plot_mode(1, str(tmp_path / "mode1.png"))
    assert (tmp_path / "mode1.png").stat().st_size > 0
    sm.generate_report(str(tmp_path / "shaft.md"))
    text = (tmp_path / "shaft.md").read_text()
    assert "Shaft Modal Analysis Report" in text
    assert "First critical speed" in text
    assert "| Mode | Frequency (Hz) | Family |" in text
    # lateral mode-shape images referenced and written next to the report
    assert (tmp_path / "shaft_mode1.png").exists()


def test_cli_plot_report_flags(tmp_path, capsys):
    from femx.cli import main

    rc = main(["pipe", "--ri", "0.05", "--ro", "0.08", "--E", "2e11",
               "--nu", "0.3", "--Ti", "100", "--nr", "8", "--nz", "4",
               "--report", str(tmp_path / "p.md"),
               "--plot", str(tmp_path / "p.png"), "--json"])
    assert rc == 0
    assert (tmp_path / "p.md").exists() and (tmp_path / "p.png").exists()
    rc = main(["shaft", "--segment", "1.0,0.03", "--bearing", "0",
               "--bearing", "1", "--E", "2e11", "--nu", "0.3",
               "--report", str(tmp_path / "s.md"), "--plot-mode", "1",
               "--plot", str(tmp_path / "s.png"), "--json"])
    assert rc == 0
    assert (tmp_path / "s.md").exists() and (tmp_path / "s.png").exists()
    rc = main(["plane", "--plate", "0.4", "0.2", "--mesh-size", "0.05",
               "--E", "2e11", "--nu", "0.3",
               "--force-edge", "right=0,-500", "--fix-edge", "left",
               "--report", str(tmp_path / "pl.md"),
               "--plot", str(tmp_path / "pl.png"), "--json"])
    assert rc == 0
    assert (tmp_path / "pl.md").exists() and (tmp_path / "pl.png").exists()
