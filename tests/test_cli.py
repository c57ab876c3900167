"""CLI end-to-end: the headless `femx` command surface.

The reference's whole-app contract is "press run" (FEM_main.py:355-382);
femx's CLI must give the same one-call reachability for every capability —
including stress recovery (new: --stress / --plot-color von_mises)."""

import numpy as np
import pytest

from femx.cli import main


def test_cli_solid_box_stress_report_plot(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rep = tmp_path / "out.md"
    png = tmp_path / "vm.png"
    rc = main([
        "solid", "--box", "0.4", "0.2", "0.4", "--mesh-size", "0.2",
        "--E", "2e11", "--nu", "0.3",
        "--force", "0,3000,0@0.2,0.2,0.2",
        "--fix", "0,0,0:xyz", "--fix", "0,0,0.4:xyz",
        "--fix", "0.4,0,0:xyz", "--fix", "0.4,0,0.4:xyz",
        "--stress", "--report", str(rep), "--plot", str(png),
        "--plot-color", "von_mises",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Max von Mises stress:" in out
    assert "MPa at node" in out
    text = rep.read_text()
    assert "Stress Results (von Mises, nodal-averaged)" in text
    assert "Max von Mises stress" in text
    assert png.exists() and png.stat().st_size > 0


def test_cli_beam_json(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "beam", "--msh", "/root/reference/cantilever_beam",
        "--E", "2e11", "--nu", "0.3", "--rho", "7800",
        "--section", "beam=I section:d=0.05,b=0.025,t_w=0.005,t_f=0.005,r=0.001",
        "--fix-group", "fix:xyzXYZ",
        "--force-group", "load_y=0,-3000,0",
        "--json",
    ])
    assert rc == 0
    import json

    payload = json.loads(capsys.readouterr().out)
    assert np.isfinite(payload["max_displacement"])


def test_cli_shaft_json(capsys):
    rc = main([
        "shaft", "--segment", "2.0,0.04", "--bearing", "0", "--bearing", "2",
        "--E", "2e11", "--nu", "0.3", "--json",
    ])
    assert rc == 0
    import json

    payload = json.loads(capsys.readouterr().out)
    families = {m["family"] for m in payload["modes"]}
    assert "lateral" in families
    # first critical speed of the pinned-pinned demo shaft ~ 1188 RPM
    assert payload["critical_speeds_rpm"][0] == pytest.approx(1187.8, rel=1e-3)


def test_cli_plane_json(capsys):
    rc = main([
        "plane", "--plate", "1.0", "0.2", "--mesh-size", "0.05",
        "--E", "2e11", "--nu", "0.3", "--thickness", "0.01",
        "--force-edge", "right=0,-1000", "--fix-edge", "left", "--json",
    ])
    assert rc == 0
    import json

    payload = json.loads(capsys.readouterr().out)
    assert payload["solve_info"]["method"] == "dense_cholesky"
    assert abs(payload["equilibrium_residual"][1]) < 1e-6
    assert payload["max_von_mises_mpa"] > 0


def test_cli_pipe_json(capsys):
    rc = main([
        "pipe", "--ri", "0.1", "--ro", "0.16", "--E", "2e11", "--nu", "0.3",
        "--pi", "50e6", "--nr", "16", "--nz", "4", "--json",
    ])
    assert rc == 0
    import json

    payload = json.loads(capsys.readouterr().out)
    # Lame bore hoop for p=50 MPa, b/a=1.6: p (a^2+b^2)/(b^2-a^2) = 114.1 MPa
    assert payload["bore_hoop_stress_mpa"] == pytest.approx(114.1, rel=0.02)


def test_cli_plane_requires_geometry(capsys):
    rc = main(["plane", "--E", "2e11", "--nu", "0.3"])
    assert rc == 2
