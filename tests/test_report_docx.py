"""Real .docx emission for both report layouts.

The reference's golden artifacts ARE .docx files (ReactionSolver.py:309-431,
BeamSolver.py:483-560). python-docx is absent in this environment, so femx
vendors a minimal OOXML writer (femx.docx_writer); these tests drive the
full pipelines to .docx output and validate the produced package: zip
structure, XML well-formedness, and that the reference's section inventory
and result numbers landed in word/document.xml.
"""

import sys
import types
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from femx.analysis import SolidReactionAnalysis
from femx.mesh import box_tet10


W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _docx_text(path):
    """Concatenated document text + parsed tree from a .docx package."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "_rels/.rels" in names
        assert "word/document.xml" in names
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)  # raises on malformed XML
    text = " ".join(t.text or "" for t in root.iter(f"{W_NS}t"))
    return text, root, names


@pytest.fixture(scope="module")
def solid_analysis():
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


def test_solid_report_emits_real_docx(solid_analysis, tmp_path):
    from femx.report import solid_report

    out = str(tmp_path / "FEM_Report.docx")
    got = solid_report(solid_analysis, out, image=False)
    assert got == out
    text, root, _ = _docx_text(out)
    # reference report section inventory (ReactionSolver.py:315-330)
    for heading in ("Finite Element Analysis Report", "Analysis Parameters",
                    "Mesh Information", "Boundary Conditions",
                    "Mesh Quality Check", "Reaction Force Results"):
        assert heading in text, heading
    # the reaction table landed as a real w:tbl with the totals row
    tables = root.findall(f".//{W_NS}tbl")
    assert tables, "no table in document.xml"
    assert "Total Reaction" in text
    # reaction values: total Ry ~ -3000 N appears in the table
    assert "-3.0000e+03" in text


def test_beam_report_emits_real_docx(tmp_path, monkeypatch):
    from femx.analysis import BeamAnalysis
    from femx.mesh.msh_io import read_msh
    from femx.report import beam_report

    monkeypatch.chdir(tmp_path)  # plot PNGs land next to the report
    mesh = read_msh("/root/reference/cantilever_beam")
    ba = BeamAnalysis(
        mesh,
        [{"group": "beam", "type": "I section",
          "params": {"d": 0.05, "b": 0.025, "t_w": 0.005, "t_f": 0.005,
                     "r": 0.001}}],
        [{"group": "fix", "type": "Fix", "fix_x": True, "fix_y": True,
          "fix_z": True, "fix_rx": True, "fix_ry": True, "fix_rz": True},
         {"group": "load_y", "type": "Force", "force_x": 0,
          "force_y": -3000.0, "force_z": 0}],
        E=2e11, nu=0.3, rho=7800)
    res = ba.run()
    out = str(tmp_path / "beam_analysis_report.docx")
    beam_report(ba, res, out)
    text, root, names = _docx_text(out)
    for heading in ("3D Beam Analysis Report", "Model Information",
                    "Static Analysis Results", "Modal Analysis Results"):
        assert heading in text, heading
    assert root.findall(f".//{W_NS}tbl")
    # plots were embedded as PNG media with image relationships
    media = [n for n in names if n.startswith("word/media/")]
    assert media, "no embedded images"
    with zipfile.ZipFile(out) as z:
        rels = z.read("word/_rels/document.xml.rels").decode()
        for i in range(len(media)):
            assert f"rIdImg{i}" in rels
        # embedded media are valid PNGs
        assert z.read(media[0])[:8] == b"\x89PNG\r\n\x1a\n"


def test_docx_via_python_docx_stub(solid_analysis, tmp_path, monkeypatch):
    """The python-docx branch of _markdown_ish_to_docx, driven under a stub
    module (python-docx is absent here) — same recipe as the Qt stub."""
    import femx.report as report
    from femx import docx_writer

    calls = {"saved": []}

    class StubDocument(docx_writer.Document):
        def save(self, filename):
            calls["saved"].append(filename)
            super().save(filename)

    docx_mod = types.ModuleType("docx")
    docx_mod.Document = StubDocument
    shared_mod = types.ModuleType("docx.shared")
    shared_mod.Inches = docx_writer.Inches
    docx_mod.shared = shared_mod
    monkeypatch.setitem(sys.modules, "docx", docx_mod)
    monkeypatch.setitem(sys.modules, "docx.shared", shared_mod)
    monkeypatch.setattr(report, "DOCX_AVAILABLE", True)

    out = str(tmp_path / "stub.docx")
    report.solid_report(solid_analysis, out, image=False)
    assert calls["saved"] == [out]
    text, _, _ = _docx_text(out)
    assert "Reaction Force Results" in text
