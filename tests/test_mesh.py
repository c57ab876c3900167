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
