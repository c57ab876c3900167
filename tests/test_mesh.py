"""Mesh layer tests: .msh parsing (2.2/4.1), generators, group indexing."""

import io

import numpy as np
import pytest

from femx.mesh import (
    FrameBuilder,
    Mesh,
    box_tet10,
    cantilever_line_mesh,
    nearest_node,
    nodes_in_physical_group,
    read_msh,
    write_msh,
)

REFERENCE_CANTILEVER = "/root/reference/cantilever_beam"


def test_read_reference_cantilever_msh41():
    mesh = read_msh(REFERENCE_CANTILEVER)
    assert mesh.num_nodes == 3
    assert "line" in mesh.cells and len(mesh.cells["line"]) == 2
    assert "vertex" in mesh.cells and len(mesh.cells["vertex"]) == 2
    assert set(mesh.field_data) == {"fix", "load_y", "beam"}
    assert mesh.field_data["fix"] == (2, 0)
    assert mesh.field_data["beam"] == (4, 1)
    # Node coordinates from the file: (0,0,0), (2,0,0), (~1,0,0)
    np.testing.assert_allclose(mesh.points[0], [0, 0, 0])
    np.testing.assert_allclose(mesh.points[1], [2, 0, 0])
    np.testing.assert_allclose(mesh.points[2], [1, 0, 0], atol=1e-8)
    # Physical-group node indexing (reference semantics)
    assert nodes_in_physical_group(mesh, "fix", "vertex").tolist() == [0]
    assert nodes_in_physical_group(mesh, "load_y", "vertex").tolist() == [1]
    assert sorted(nodes_in_physical_group(mesh, "beam", "line").tolist()) == [0, 1, 2]
    # Missing group returns empty, not raise
    assert nodes_in_physical_group(mesh, "nope", "vertex").size == 0


def test_msh22_roundtrip():
    mesh = cantilever_line_mesh(length=2.0, n_elems=4)
    buf = io.StringIO()
    write_msh(buf, mesh)
    mesh2 = read_msh(buf.getvalue())
    np.testing.assert_allclose(mesh2.points, mesh.points)
    np.testing.assert_array_equal(mesh2.cells["line"], mesh.cells["line"])
    assert mesh2.field_data == mesh.field_data
    np.testing.assert_array_equal(
        mesh2.cell_physical["line"], mesh.cell_physical["line"]
    )


def test_box_tet10_geometry():
    mesh = box_tet10(1.0, 0.5, 0.5, 0.25)
    conn = mesh.cells["tetra10"]
    assert conn.shape[1] == 10
    # volumes of corner tets sum to the box volume
    pts = mesh.points
    corners = conn[:, :4]
    v = np.linalg.det(pts[corners][:, 1:] - pts[corners][:, :1]) / 6.0
    assert np.all(v > 0), "all tets must be positively oriented"
    np.testing.assert_allclose(v.sum(), 1.0 * 0.5 * 0.5, rtol=1e-12)
    # midside nodes exactly between their edge endpoints
    from femx.mesh import TET10_EDGES

    for k, (a, b) in enumerate(TET10_EDGES):
        np.testing.assert_allclose(
            pts[conn[:, 4 + k]], 0.5 * (pts[conn[:, a]] + pts[conn[:, b]]), atol=1e-14
        )


def test_box_tet10_bc_groups():
    mesh = box_tet10(
        0.8, 0.2, 0.8, 0.1,
        force_points=[(0.4, 0.2, 0.4)],
        fix_points=[(0, 0, 0), (0, 0, 0.8), (0.8, 0, 0), (0.8, 0, 0.8)],
    )
    neumann = nodes_in_physical_group(mesh, "Neumann_BCs", "vertex")
    diri = nodes_in_physical_group(mesh, "Diri_BCs", "vertex")
    assert len(neumann) == 1 and len(diri) == 4
    np.testing.assert_allclose(mesh.points[neumann[0]], [0.4, 0.2, 0.4], atol=1e-12)
    fix_coords = np.sort(mesh.points[diri], axis=0)
    assert np.all(fix_coords[:, 1] == 0.0)


def test_frame_builder():
    fb = FrameBuilder()
    n0 = fb.add_node((0, 0, 0))
    n1 = fb.add_node((0, 0, 3.0))  # vertical member
    n2 = fb.add_node((4.0, 0, 3.0))
    fb.add_vertex_group("base", [n0])
    fb.add_vertex_group("tip", [n2])
    fb.add_member(n0, n1, "columns", n_elems=3)
    fb.add_member(n1, n2, "girders", n_elems=4)
    mesh = fb.build()
    assert len(mesh.cells["line"]) == 7
    assert mesh.num_nodes == 3 + 2 + 3
    assert nodes_in_physical_group(mesh, "base", "vertex").tolist() == [n0]
    girders = nodes_in_physical_group(mesh, "girders", "line")
    assert n1 in girders and n2 in girders


def test_nearest_node_with_candidates():
    pts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=float)
    assert nearest_node(pts, (0.9, 0, 0)) == 1
    # restricted to candidates -> snaps within the group only
    assert nearest_node(pts, (0.9, 0, 0), candidates=np.array([0, 2])) == 0


def test_binary_msh22_roundtrip(tmp_path):
    """Binary 2.2 write -> read reproduces points, cells, groups exactly
    (parity with the reference's meshio binary ingest)."""
    from femx.mesh import box_tet10, read_msh, write_msh

    mesh = box_tet10(0.2, 0.1, 0.1, 0.05,
                     force_points=[(0.2, 0.05, 0.05)], fix_points=[(0, 0, 0)])
    p = tmp_path / "bin22.msh"
    write_msh(str(p), mesh, binary=True)
    assert open(p, "rb").read(40).split(b"\n")[1] == b"2.2 1 8"
    m2 = read_msh(str(p))
    np.testing.assert_allclose(m2.points, mesh.points, rtol=0, atol=0)
    for k in mesh.cells:
        np.testing.assert_array_equal(m2.cells[k], mesh.cells[k])
        np.testing.assert_array_equal(m2.cell_physical[k], mesh.cell_physical[k])
    assert m2.field_data == mesh.field_data


def test_binary_msh41_reference_asset_reencoded(tmp_path):
    """Binary 4.1: re-encode the reference's shipped cantilever_beam asset
    into binary bytes and check the reader reproduces the ASCII parse."""
    import struct

    from femx.mesh import read_msh

    ref = read_msh("/root/reference/cantilever_beam")

    out = bytearray()
    out += b"$MeshFormat\n4.1 1 8\n"
    out += struct.pack("<i", 1)
    out += b"\n$EndMeshFormat\n"
    out += b"$PhysicalNames\n%d\n" % len(ref.field_data)
    for name, (tag, dim) in sorted(ref.field_data.items(), key=lambda kv: kv[1][0]):
        out += f'{dim} {tag} "{name}"\n'.encode()
    out += b"$EndPhysicalNames\n"
    # Entities: one point entity per vertex cell + one curve for the lines
    vc = ref.cells["vertex"].ravel()
    vp = ref.cell_physical["vertex"]
    lp = int(ref.cell_physical["line"][0])
    out += b"$Entities\n"
    out += struct.pack("<4q", len(vc), 1, 0, 0)
    for i, (node, ptag) in enumerate(zip(vc, vp), start=1):
        out += struct.pack("<i", i)
        out += struct.pack("<3d", *ref.points[node])
        out += struct.pack("<q", 1) + struct.pack("<i", int(ptag))
    out += struct.pack("<i", 1) + struct.pack("<6d", *([0.0] * 6))
    out += struct.pack("<q", 1) + struct.pack("<i", lp)
    out += struct.pack("<q", 0)
    out += b"$EndEntities\n"
    # Nodes: single block
    n = ref.num_nodes
    out += b"$Nodes\n"
    out += struct.pack("<4q", 1, n, 1, n)
    out += struct.pack("<3i", 1, 1, 0) + struct.pack("<q", n)
    out += np.arange(1, n + 1, dtype="<i8").tobytes()
    out += np.asarray(ref.points, dtype="<f8").tobytes()
    out += b"\n$EndNodes\n"
    # Elements: one block per vertex + one for the lines
    n_blocks = len(vc) + 1
    n_elems = len(vc) + len(ref.cells["line"])
    out += b"$Elements\n"
    out += struct.pack("<4q", n_blocks, n_elems, 1, n_elems)
    eid = 1
    for i, node in enumerate(vc, start=1):
        out += struct.pack("<3i", 0, i, 15) + struct.pack("<q", 1)
        out += struct.pack("<2q", eid, int(node) + 1)
        eid += 1
    lines = ref.cells["line"]
    out += struct.pack("<3i", 1, 1, 1) + struct.pack("<q", len(lines))
    for row in lines:
        out += struct.pack("<3q", eid, int(row[0]) + 1, int(row[1]) + 1)
        eid += 1
    out += b"\n$EndElements\n"

    m2 = read_msh(bytes(out))
    np.testing.assert_allclose(m2.points, ref.points)
    np.testing.assert_array_equal(m2.cells["line"], ref.cells["line"])
    np.testing.assert_array_equal(np.sort(m2.cells["vertex"].ravel()),
                                  np.sort(vc))
    assert m2.field_data == ref.field_data


def test_box_tet10_from_cells_anisotropic_spacing():
    """The constant-offset connectivity build must stay valid for per-axis
    spacings (orientation is checked on one representative tet per Kuhn
    path; the sign is spacing-independent for positive spacings)."""
    from femx.mesh.generators import box_tet10_from_cells

    mesh = box_tet10_from_cells((2, 3, 4), (0.1, 0.2, 0.05),
                                fix_points=[(0.0, 0.0, 0.0)],
                                force_points=[(0.2, 0.6, 0.2)])
    pts = mesh.points
    conn = mesh.cells["tetra10"]
    corners = conn[:, :4]
    v = np.linalg.det(pts[corners][:, 1:] - pts[corners][:, :1]) / 6.0
    assert np.all(v > 0)
    np.testing.assert_allclose(v.sum(), 0.2 * 0.6 * 0.2, rtol=1e-12)
    from femx.mesh import TET10_EDGES

    for k, (a, b) in enumerate(TET10_EDGES):
        np.testing.assert_allclose(
            pts[conn[:, 4 + k]],
            0.5 * (pts[conn[:, a]] + pts[conn[:, b]]), atol=1e-14)
    # every node is referenced exactly as the lattice predicts
    assert conn.min() == 0 and conn.max() == mesh.num_nodes - 1


def test_box_bc_point_embedding_exact_node():
    """Off-lattice force/fix points are embedded as REAL mesh nodes at the
    exact requested coordinate (the reference's OCC fragment semantics,
    gmsh_creation.py:38-61), with every element Jacobian still positive;
    the mesh loses its structured metadata (relocated node != uniform
    lattice) and solves take the unstructured path. embed_points=False
    preserves the legacy nearest-node snap + structured fast path."""
    import numpy as np

    from femx.elements.tet10 import DN_NATURAL
    from femx.mesh import box_tet10

    p_exact = (0.213, 0.147, 0.353)  # far off every lattice position
    mesh = box_tet10(0.4, 0.4, 0.4, 0.1,
                     force_points=[p_exact],
                     fix_points=[(0, 0, 0), (0.4, 0, 0), (0, 0, 0.4),
                                 (0.4, 0, 0.4)])
    # the Neumann vertex group points at a node with the EXACT coordinate
    vtx = mesh.cells["vertex"][mesh.cell_physical["vertex"] == 2].ravel()
    assert len(vtx) == 1
    np.testing.assert_allclose(mesh.points[vtx[0]], p_exact, atol=1e-12)
    info = [r for r in mesh.bc_embed_info if r["group"] == "Neumann_BCs"][0]
    assert info["embedded"] and info["snap_distance"] == 0.0
    # on-lattice fix points are untouched (no pointless distortion)
    for r in mesh.bc_embed_info:
        if r["group"] == "Diri_BCs":
            assert not r["embedded"] and r["snap_distance"] < 1e-12
    # every Jacobian stays positive after the local distortion
    coords = np.asarray(mesh.points)[np.asarray(mesh.cells["tetra10"])]
    J = np.einsum("gkn,enc->egkc", DN_NATURAL, coords)
    assert float(np.linalg.det(J).min()) > 0
    assert mesh.structured is None  # relocated node != uniform lattice

    # legacy behavior on request: snap, keep the structured fast path
    mesh_s = box_tet10(0.4, 0.4, 0.4, 0.1, force_points=[p_exact],
                       fix_points=[(0, 0, 0)], embed_points=False)
    assert mesh_s.structured is not None
    rec = [r for r in mesh_s.bc_embed_info if r["group"] == "Neumann_BCs"][0]
    assert not rec["embedded"] and rec["snap_distance"] > 1e-3


def test_box_bc_point_embedding_solve_equilibrium():
    """A solve on an embedded-point mesh applies the load at the EXACT
    coordinate and still satisfies global equilibrium."""
    import numpy as np

    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10

    p_exact = (0.213, 0.147, 0.353)
    mesh = box_tet10(0.4, 0.4, 0.4, 0.1,
                     force_points=[p_exact],
                     fix_points=[(0, 0, 0), (0.4, 0, 0), (0, 0, 0.4),
                                 (0.4, 0, 0.4)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0, "force_y": -700.0, "force_z": 0,
          "force_x_pstn": p_exact[0], "force_y_pstn": p_exact[1],
          "force_z_pstn": p_exact[2]}],
        [{"pos_x": x, "pos_y": 0.0, "pos_z": z,
          "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0.4, 0), (0, 0.4), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False, cg_tol=1e-10)
    fa.run_simulation()
    # load applied at the embedded node == exact coordinate
    node = fa.applied_forces_info[0]["node_idx"]
    np.testing.assert_allclose(np.asarray(mesh.points)[node], p_exact,
                               atol=1e-12)
    np.testing.assert_allclose(fa.equilibrium_residual(), 0.0, atol=1e-7)


def test_meshio_fallback_for_foreign_formats(tmp_path, monkeypatch):
    """Files femx's own parser rejects fall back to meshio when installed
    (the reference ingests everything through meshio,
    ReactionSolver.py:62). meshio is absent in this image, so a stub
    stands in; without it the native error propagates."""
    import sys
    import types

    import numpy as np

    from femx.mesh import read_msh
    from femx.mesh.generators import cantilever_line_mesh

    src = cantilever_line_mesh()
    bogus = tmp_path / "mesh.vtk"          # not a .msh at all
    bogus.write_text("# vtk DataFile Version 3.0\n")

    # without meshio: the native parser's error propagates
    sys.modules.pop("meshio", None)
    with pytest.raises(ValueError):
        read_msh(str(bogus))

    class _Block:
        def __init__(self, t, d):
            self.type, self.data = t, d

    fake_mesh = types.SimpleNamespace(
        points=np.asarray(src.points),
        cells=[_Block("line", np.asarray(src.cells["line"]))],
        cell_data_dict={"gmsh:physical":
                        {"line": np.asarray(src.cell_physical["line"])}},
        field_data={k: np.asarray(v) for k, v in src.field_data.items()},
    )
    fake = types.ModuleType("meshio")
    fake.read = lambda path: fake_mesh
    monkeypatch.setitem(sys.modules, "meshio", fake)
    m = read_msh(str(bogus))
    assert "line" in m.cells
    assert set(m.field_data) == set(src.field_data)
    np.testing.assert_array_equal(m.cells["line"], src.cells["line"])
