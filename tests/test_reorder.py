"""Locality reordering: permutation validity, solution invariance, and span
reduction on a representative mesh."""

import numpy as np
import jax.numpy as jnp

from femx.mesh import box_tet10
from femx.mesh.reorder import (
    element_node_spans,
    first_touch_relabel,
    reorder_for_locality,
)


def _scrambled_box():
    mesh = box_tet10(0.3, 0.2, 0.4, mesh_size=0.05)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    return pts_s, relabel[conn]


def test_reorder_is_valid_permutation():
    pts, conn = _scrambled_box()
    pts_n, conn_n, new_of_old, eorder = reorder_for_locality(pts, conn)
    assert sorted(new_of_old) == list(range(len(pts)))
    assert sorted(eorder) == list(range(len(conn)))
    # geometry preserved element-wise
    np.testing.assert_array_equal(pts_n[conn_n], pts[conn[eorder]])


def test_reorder_shrinks_spans():
    pts, conn = _scrambled_box()
    _, conn_n, _, _ = reorder_for_locality(pts, conn)
    before = element_node_spans(conn).mean()
    after = element_node_spans(conn_n).mean()
    # random labels give ~N/3 mean spans; Morton+first-touch recovers
    # raster-grade locality (measured: 1635 -> 341 on this mesh, equal to
    # the mesher's native raster order)
    assert after < before / 4


def test_first_touch_covers_untouched_nodes():
    conn = np.array([[2, 5, 7]])
    m = first_touch_relabel(conn, 10)
    assert sorted(m) == list(range(10))
    assert m[2] == 0 and m[5] == 1 and m[7] == 2


def test_operator_invariant_under_reorder():
    """K@u must be identical (up to permutation) after reordering."""
    from femx.assembly_soa import SolidOperatorSoA

    pts, conn = _scrambled_box()
    pts_n, conn_n, new_of_old, _ = reorder_for_locality(pts, conn)
    op_a, _ = SolidOperatorSoA.from_mesh(pts, conn, 2e11, 0.3, dtype=np.float64)
    op_b, _ = SolidOperatorSoA.from_mesh(pts_n, conn_n, 2e11, 0.3, dtype=np.float64)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(op_a.ndof)
    u3 = u.reshape(-1, 3)
    u_new = np.empty_like(u3)
    u_new[new_of_old] = u3
    ya = np.asarray(op_a.apply(jnp.asarray(u))).reshape(-1, 3)
    yb = np.asarray(op_b.apply(jnp.asarray(u_new.reshape(-1)))).reshape(-1, 3)
    np.testing.assert_allclose(yb[new_of_old], ya, rtol=1e-10, atol=1e-8 * np.abs(ya).max())
