"""CLI end-to-end: the headless `femx` command surface.

The reference's whole-app contract is "press run" (FEM_main.py:355-382);
femx's CLI must give the same one-call reachability for every capability —
including stress recovery (new: --stress / --plot-color von_mises)."""

import numpy as np

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
