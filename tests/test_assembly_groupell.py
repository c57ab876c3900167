"""Group-ELL operator (femx.assembly_groupell): exact equality with the
reference-validated einsum operator, layout roundtrip, constrained apply,
block-Jacobi/diagonal, f64 shadow, and the pipeline route.

The operator replaces the reference's scipy lil/CSR assembly + SuperLU for
arbitrary gmsh meshes (ReactionSolver.py:115-152, 196-205) with wide-row
gathers + dense (6, 48) block contractions (see module docstring)."""

import numpy as np
import jax.numpy as jnp

from femx.assembly import SolidOperator
from femx.assembly_groupell import GROUP, SolidOperatorGroupELL
from femx.elements.tet10 import material_matrix
from femx.mesh import box_tet10
from femx.solve.cg import pcg


def _scrambled_box(mesh_size=0.05):
    mesh = box_tet10(0.3, 0.2, 0.4, mesh_size=mesh_size)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    rng = np.random.default_rng(0)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    return pts_s, relabel[conn]


def test_apply_matches_einsum_operator():
    pts, conn = _scrambled_box()
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_ge, detJ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                                  dtype=np.float64)
    assert np.all(np.asarray(detJ) > 0)
    assert op_ge.n_pad % GROUP == 0
    assert op_ge.n_pad >= len(pts)

    rng = np.random.default_rng(1)
    u = rng.standard_normal(3 * len(pts))
    want = np.asarray(op_ref.apply(jnp.asarray(u)))
    got = op_ge.to_global(np.asarray(op_ge.apply(
        jnp.asarray(op_ge.to_internal(u)))))
    np.testing.assert_allclose(got, want, rtol=1e-10,
                               atol=1e-9 * np.abs(want).max())


def test_roundtrip_layout_and_dummy_slots():
    pts, conn = _scrambled_box(mesh_size=0.1)
    op, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                            dtype=np.float64)
    x = np.arange(3 * len(pts), dtype=np.float64)
    xi = op.to_internal(x)
    assert xi.shape == (3 * op.n_pad,)
    np.testing.assert_array_equal(op.to_global(xi), x)
    # dummy (padded) internal slots are zero after to_internal
    filled = np.zeros(op.n_pad, dtype=bool)
    filled[op.new_of_old] = True
    assert np.all(xi.reshape(-1, 3)[~filled] == 0)


def test_constrained_apply_diagonal_block_jacobi():
    pts, conn = _scrambled_box(mesh_size=0.1)
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_ge, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                               dtype=np.float64)

    rng = np.random.default_rng(2)
    mask = (rng.random(3 * len(pts)) > 0.1).astype(np.float64)
    op_ref = op_ref.with_free_mask(jnp.asarray(mask))
    op_ge = op_ge.with_free_mask(op_ge.to_internal(mask))

    u = rng.standard_normal(3 * len(pts))
    want = np.asarray(op_ref.apply_constrained(jnp.asarray(u)))
    got = op_ge.to_global(np.asarray(op_ge.apply_constrained(
        jnp.asarray(op_ge.to_internal(u)))))
    np.testing.assert_allclose(got, want, rtol=1e-10,
                               atol=1e-9 * np.abs(want).max())

    d_ref = np.asarray(op_ref.diagonal())
    d_ge = op_ge.to_global(np.asarray(op_ge.diagonal()))
    np.testing.assert_allclose(d_ge, d_ref, rtol=1e-10)

    # block-Jacobi inverse blocks applied to a vector match the einsum
    # operator's preconditioner on free DOFs
    binv = op_ge.block_jacobi_tensors()
    r = rng.standard_normal(3 * len(pts)) * mask
    z_ge = op_ge.to_global(np.asarray(op_ge.apply_block_jacobi(
        binv, jnp.asarray(op_ge.to_internal(r)))))
    z_ref = np.asarray(op_ref.block_jacobi_preconditioner()(jnp.asarray(r)))
    np.testing.assert_allclose(z_ge * mask, z_ref * mask, rtol=1e-9,
                               atol=1e-12 * np.abs(z_ref).max())


def test_f64_shadow_matches():
    """astype(f64) of an f32 operator yields an exact f64 residual operator
    on the same internal layout (the mixed-precision refinement contract)."""
    pts, conn = _scrambled_box(mesh_size=0.1)
    op32, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float32)
    mask = np.ones(3 * len(pts))
    mask[: 30] = 0.0
    op32 = op32.with_free_mask(op32.to_internal(mask).astype(np.float32))
    sh = op32.astype(np.float64)
    assert sh is not op32
    assert np.dtype(sh.dtype) == np.float64

    op64, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float64)
    op64 = op64.with_free_mask(op64.to_internal(mask))
    rng = np.random.default_rng(4)
    u = rng.standard_normal(3 * len(pts))
    want = op64.to_global(np.asarray(op64.apply_constrained(
        jnp.asarray(op64.to_internal(u)))))
    got = sh.to_global(np.asarray(sh.apply_constrained(
        jnp.asarray(sh.to_internal(u)))))
    np.testing.assert_allclose(got, want, rtol=1e-12,
                               atol=1e-12 * np.abs(want).max())


def test_kb_bfloat16_storage():
    """kb_dtype='bfloat16' halves block storage; the apply stays in the io
    dtype (f32) and matches the f32-block apply to bf16 rounding."""
    import jax.numpy as jnp_

    pts, conn = _scrambled_box(mesh_size=0.1)
    op32, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float32)
    opbf, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float32,
                                              kb_dtype="bfloat16")
    assert np.dtype(opbf.dtype) == np.float32
    assert opbf.Kb[-1].dtype == jnp_.bfloat16
    rng = np.random.default_rng(5)
    u = rng.standard_normal(3 * len(pts)).astype(np.float32)
    want = op32.to_global(np.asarray(op32.apply(
        jnp.asarray(op32.to_internal(u)))))
    got = opbf.to_global(np.asarray(opbf.apply(
        jnp.asarray(opbf.to_internal(u)))))
    assert got.dtype == np.float32
    scale = np.abs(want).max()
    # bf16 has ~8 mantissa bits: elementwise products err ~4e-3 rel
    np.testing.assert_allclose(got, want, atol=2e-2 * scale)
    err = np.abs(got - want).max() / scale
    assert err > 1e-7, "bf16 path suspiciously exact - not exercised?"


def test_device_build_matches_host_build():
    """The default device build (element einsum + flat scatter-add on
    device) reproduces the exact-f64 host aggregation build: identical
    structure, blocks to summation-order rounding."""
    pts, conn = _scrambled_box(mesh_size=0.1)
    op_h, dj_h = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                                 dtype=np.float64,
                                                 build="host")
    op_d, dj_d = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                                 dtype=np.float64,
                                                 build="device")
    assert op_h.bucket_g == op_d.bucket_g
    assert np.array_equal(op_h.new_of_old, op_d.new_of_old)
    assert np.array_equal(np.asarray(op_h.pairperm),
                          np.asarray(op_d.pairperm))
    np.testing.assert_allclose(np.asarray(dj_d), dj_h, rtol=1e-12)
    for a, b in zip(op_h.idx, op_d.idx):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(op_h.Kb, op_d.Kb):
        if a.size:
            scale = float(jnp.max(jnp.abs(a)))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-13 * scale)
    scale = np.abs(op_h._bd_host).max()
    np.testing.assert_allclose(op_d._bd_host, op_h._bd_host,
                               atol=1e-13 * scale)

    rng = np.random.default_rng(7)
    u = rng.standard_normal(3 * len(pts))
    yh = op_h.to_global(np.asarray(op_h.apply(
        jnp.asarray(op_h.to_internal(u)))))
    yd = op_d.to_global(np.asarray(op_d.apply(
        jnp.asarray(op_d.to_internal(u)))))
    np.testing.assert_allclose(yd, yh, atol=1e-12 * np.abs(yh).max())


def test_symmetric_storage_matches_full():
    """symmetric=True stores ~half the blocks (each morton r <= c tile
    once) and reproduces the full operator's apply exactly via the
    transpose side + diagonal correction; composes with free masks,
    block-Jacobi and jit-as-pytree."""
    import jax

    pts, conn = _scrambled_box(mesh_size=0.1)
    op_f, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                              dtype=np.float64,
                                              symmetric=False)
    op_s, dj = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                               dtype=np.float64,
                                               symmetric=True)
    assert np.all(np.asarray(dj) > 0)
    nb_f = sum(int(i.shape[0]) * g for i, g in zip(op_f.idx, op_f.bucket_g))
    nb_s = sum(int(i.shape[0]) * g for i, g in zip(op_s.idx, op_s.bucket_g))
    assert nb_s < 0.62 * nb_f, (nb_s, nb_f)

    rng = np.random.default_rng(11)
    u = rng.standard_normal(3 * len(pts))
    yf = op_f.to_global(np.asarray(op_f.apply(
        jnp.asarray(op_f.to_internal(u)))))
    ys = op_s.to_global(np.asarray(op_s.apply(
        jnp.asarray(op_s.to_internal(u)))))
    np.testing.assert_allclose(ys, yf, atol=1e-12 * np.abs(yf).max())

    # constrained + jit-as-pytree-argument (the pipeline's usage)
    mask = (rng.random(3 * len(pts)) > 0.1).astype(np.float64)
    op_fm = op_f.with_free_mask(op_f.to_internal(mask))
    op_sm = op_s.with_free_mask(op_s.to_internal(mask))
    fn = jax.jit(lambda o, x: o.apply_constrained(x))
    yf = op_fm.to_global(np.asarray(fn(op_fm, jnp.asarray(
        op_fm.to_internal(u)))))
    ys = op_sm.to_global(np.asarray(fn(op_sm, jnp.asarray(
        op_sm.to_internal(u)))))
    np.testing.assert_allclose(ys, yf, atol=1e-12 * np.abs(yf).max())

    # block-Jacobi tensors agree (both from the full diagonal) — compare
    # in MESH node order: the two variants assign different internal
    # orders (bucket counts differ under symmetric storage)
    bf = np.asarray(op_fm.block_jacobi_tensors())[op_f.new_of_old]
    bs = np.asarray(op_sm.block_jacobi_tensors())[op_s.new_of_old]
    np.testing.assert_allclose(bs, bf, rtol=1e-9, atol=1e-9)


def test_pcg_solve_matches():
    pts, conn = _scrambled_box(mesh_size=0.1)
    C = material_matrix(2e11, 0.3)
    op_ref, _ = SolidOperator.from_mesh(pts, conn, C)
    op_ge, _ = SolidOperatorGroupELL.from_mesh(pts, conn, 2e11, 0.3,
                                               dtype=np.float64)

    n = 3 * len(pts)
    mask = np.ones(n)
    for nd in np.where(pts[:, 1] < 1e-9)[0]:
        mask[3 * nd : 3 * nd + 3] = 0.0
    rng = np.random.default_rng(3)
    f = rng.standard_normal(n) * mask * 1e3

    op_ref = op_ref.with_free_mask(jnp.asarray(mask))
    res_ref = pcg(op_ref.apply_constrained, jnp.asarray(f),
                  M_inv_diag=op_ref.block_jacobi_preconditioner(),
                  tol=1e-12, maxiter=4000)
    assert bool(res_ref.converged)

    op_ge = op_ge.with_free_mask(op_ge.to_internal(mask))
    binv = op_ge.block_jacobi_tensors()
    res_ge = pcg(op_ge.apply_constrained,
                 jnp.asarray(op_ge.to_internal(f)),
                 M_inv_diag=lambda r: op_ge.apply_block_jacobi(binv, r),
                 tol=1e-12, maxiter=4000)
    assert bool(res_ge.converged)

    u_ref = np.asarray(res_ref.x)
    u_ge = op_ge.to_global(np.asarray(res_ge.x))
    np.testing.assert_allclose(u_ge, u_ref, rtol=1e-8,
                               atol=1e-10 * np.abs(u_ref).max())


def test_pipeline_route_groupell():
    """unstructured_operator='groupell' drives the full pipeline (lattice-MG
    PCG + reactions) and matches the TG route bit-for-tolerance."""
    from femx.analysis import SolidReactionAnalysis
    from femx.mesh.core import Mesh as FMesh

    pts, conn = _scrambled_box(mesh_size=0.04)  # > DENSE_DOF_LIMIT
    mesh = FMesh(points=pts, cells={"tetra10": conn},
                 cell_physical={"tetra10": np.ones(len(conn), np.int32)},
                 field_data={"box": (1, 3)})
    ymax = float(pts[:, 1].max())
    xmax = float(pts[:, 0].max())
    zmax = float(pts[:, 2].max())
    fixes = [{"pos_x": x, "pos_y": 0.0, "pos_z": z,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for x, z in [(0, 0), (xmax, 0), (0, zmax), (xmax, zmax)]]
    forces = [{"force_x": 0, "force_y": -3000.0, "force_z": 0,
               "force_x_pstn": xmax / 2, "force_y_pstn": ymax,
               "force_z_pstn": zmax / 2}]

    kw = dict(E=2e11, v=0.3, verbose=False, cg_tol=1e-8)
    fa_tg = SolidReactionAnalysis(mesh, forces, fixes,
                                  unstructured_operator="tg", **kw)
    fa_tg.run_simulation()
    fa_ge = SolidReactionAnalysis(mesh, forces, fixes,
                                  unstructured_operator="groupell", **kw)
    fa_ge.run_simulation()
    assert fa_ge.solve_info["method"].startswith("groupell_")
    assert fa_ge.solve_info["converged"]

    scale = np.abs(fa_tg.u).max()
    np.testing.assert_allclose(fa_ge.u, fa_tg.u, atol=1e-8 * scale)
    np.testing.assert_allclose(fa_ge.equilibrium_residual(), 0, atol=1e-6)
