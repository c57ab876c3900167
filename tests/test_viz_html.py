"""Standalone WebGL viewer export (femx.viz_html).

No browser/node exists in this environment, so validation is structural:
the embedded data block must be valid JSON whose geometry is consistent
(index bounds, field lengths), and every DOM id the script references must
exist in the document.
"""

import json
import re

import numpy as np
import pytest

from femx.analysis import SolidReactionAnalysis
from femx.mesh import box_tet10


@pytest.fixture(scope="module")
def solved():
    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0),
                                 (0.4, 0, 0.4)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0, "force_y": 3000.0, "force_z": 0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}],
        [{"pos_x": x, "pos_y": 0, "pos_z": z, "fix_x": 0, "fix_y": 0,
          "fix_z": 0}
         for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False)
    return fa.run_simulation()


def _extract_data(html: str) -> dict:
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    assert m, "embedded data block not found"
    return json.loads(m.group(1))


def test_export_html_geometry_consistent(solved, tmp_path):
    out = solved.export_html(str(tmp_path / "view.html"))
    html = open(out).read()
    D = _extract_data(html)

    n_vert = len(D["positions"]) // 3
    assert len(D["positions"]) % 3 == 0
    assert len(D["disps"]) == 3 * n_vert
    idx = np.asarray(D["indices"])
    assert len(idx) % 3 == 0 and len(idx) > 0
    assert idx.min() >= 0 and idx.max() < n_vert
    for name, f in D["fields"].items():
        assert len(f) == n_vert, name
    assert "|u| (m)" in D["fields"]
    assert "von Mises (Pa)" in D["fields"]  # computed on demand
    # 4 fixes + 1 load marker, each labeled with its reaction/force
    assert len(D["markers"]) == 5
    assert sum("Fix" in m["label"] for m in D["markers"]) == 4
    assert sum("Force" in m["label"] for m in D["markers"]) == 1
    assert D["radius"] > 0


def test_export_html_script_structure(solved, tmp_path):
    out = solved.export_html(str(tmp_path / "view.html"))
    html = open(out).read()
    # self-contained: no external resources
    assert "http://" not in html.split("<body>")[1].replace(
        "http://schemas", "")  # only XML-namespace-like strings allowed
    assert "src=" not in html  # no external scripts/images
    # every getElementById target exists as an id attribute
    ids_used = set(re.findall(r"getElementById\('([^']+)'\)", html))
    ids_defined = set(re.findall(r"id=\"([^\"]+)\"", html))
    assert ids_used <= ids_defined, ids_used - ids_defined
    # shader/program boilerplate present and script tags balanced
    for token in ("createShader", "drawElements", "TRIANGLES", "uWarp"):
        assert token in html, token
    assert html.count("<script>") == html.count("</script>") == 1


def test_cli_html_flag(tmp_path, monkeypatch, capsys):
    from femx.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main([
        "solid", "--box", "0.4", "0.2", "0.4", "--mesh-size", "0.2",
        "--E", "2e11", "--nu", "0.3",
        "--force", "0,3000,0@0.2,0.2,0.2",
        "--fix", "0,0,0:xyz", "--fix", "0,0,0.4:xyz",
        "--fix", "0.4,0,0:xyz", "--fix", "0.4,0,0.4:xyz",
        "--html", str(tmp_path / "v.html"),
    ])
    assert rc == 0
    assert "Saved interactive viewer" in capsys.readouterr().out
    D = _extract_data(open(tmp_path / "v.html").read())
    assert len(D["indices"]) > 0


def test_mesh_preview_export(tmp_path):
    """Pre-solve mesh inspector (reference: gmsh FLTK popup,
    gmsh_creation.py:95-97): wireframe + group coloring + BC markers,
    no analysis required."""
    from femx.viz_html import export_mesh_html

    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0.4, 0, 0.4)])
    path = export_mesh_html(mesh, str(tmp_path / "preview.html"))
    html = open(path).read()
    D = _extract_data(html)
    n_vert = len(D["positions"]) // 3
    assert D["fields"] == {}                     # preview mode: no solve
    assert len(D["colors"]) == 3 * n_vert
    assert len(D["lineIndices"]) > 0 and len(D["lineIndices"]) % 2 == 0
    assert max(D["lineIndices"]) < n_vert
    assert len(D["indices"]) % 3 == 0 and max(D["indices"]) < n_vert
    # every 0-D physical group shows markers + a legend row
    marker_labels = " ".join(m["label"] for m in D["markers"])
    assert "Neumann_BCs" in marker_labels
    assert "Diri_BCs" in marker_labels
    assert any("tetra10" in row for row in D["legend"])
    assert "LINES" in html                       # wireframe draw call


def test_mesh_preview_line_mesh(tmp_path):
    from femx.mesh.generators import cantilever_line_mesh
    from femx.viz_html import export_mesh_html

    path = export_mesh_html(cantilever_line_mesh(),
                            str(tmp_path / "beam_preview.html"))
    D = _extract_data(open(path).read())
    assert len(D["indices"]) == 0                # no surface triangles
    assert len(D["lineIndices"]) > 0
    labels = " ".join(m["label"] for m in D["markers"])
    assert "fix" in labels and "load_y" in labels


def test_cli_mesh_box_html(tmp_path, monkeypatch, capsys):
    from femx.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main([
        "mesh-box", "--dims", "0.4", "0.2", "0.4", "--mesh-size", "0.2",
        "--force", "0,3000,0@0.2,0.2,0.2", "--fix", "0,0,0:xyz",
        "-o", str(tmp_path / "m.msh"),
        "--html", str(tmp_path / "m.html"),
    ])
    assert rc == 0
    assert "Mesh preview" in capsys.readouterr().out
    D = _extract_data(open(tmp_path / "m.html").read())
    assert len(D["lineIndices"]) > 0
