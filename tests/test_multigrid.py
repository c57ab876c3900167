"""Geometric multigrid preconditioner tests (structured lattice)."""

import numpy as np
import pytest

import jax.numpy as jnp

from femx.mesh import box_tet10
from femx.solve.cg import pcg
from femx.assembly_structured import StructuredSolidOperator
from femx.solve.multigrid import StructuredMultigrid, prolong, restrict


def _cantilever(dims, ms):
    mesh = box_tet10(*dims, mesh_size=ms)
    mask = np.ones(3 * mesh.num_nodes)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(3 * mesh.num_nodes)
    tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)
    return mesh, mask, f


def test_transfer_transpose_consistency():
    """restrict == prolong^T: <R f, c> == <f, P c> for random fields."""
    rng = np.random.default_rng(0)
    cshape = (3, 5, 4, 6)
    fshape = (3, 9, 7, 11)
    c = jnp.asarray(rng.normal(size=cshape))
    f = jnp.asarray(rng.normal(size=fshape))
    lhs = float(jnp.vdot(restrict(f), c))
    rhs = float(jnp.vdot(f, prolong(c)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_prolong_exact_on_linear_fields():
    """Trilinear interpolation reproduces linear coordinate fields exactly."""
    qx, qy, qz = 5, 4, 6
    X, Y, Z = np.meshgrid(np.arange(qx), np.arange(qy), np.arange(qz), indexing="ij")
    lin = 2.0 * X + 3.0 * Y - Z + 1.0
    c = jnp.asarray(np.broadcast_to(lin, (3, qx, qy, qz)))
    fine = np.asarray(prolong(c))
    Xf, Yf, Zf = np.meshgrid(
        np.arange(2 * qx - 1) / 2, np.arange(2 * qy - 1) / 2, np.arange(2 * qz - 1) / 2,
        indexing="ij",
    )
    expect = 2.0 * Xf + 3.0 * Yf - Zf + 1.0
    np.testing.assert_allclose(fine[0], expect, rtol=1e-12)


def test_mg_cg_converges_fast_and_matches_bj():
    dims = (0.4, 0.4, 2.0)
    mesh, mask, f = _cantilever(dims, 0.1)
    mg = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask,
                             dtype=np.float64, coarse_dof_limit=3000)
    assert len(mg.levels) >= 2
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask))
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-8, maxiter=200)
    assert bool(res.converged)
    assert int(res.iterations) < 40  # mesh-independent convergence
    res_bj = pcg(op.apply_constrained, fj,
                 M_inv_diag=op.block_jacobi_preconditioner(), tol=1e-8, maxiter=20000)
    x = op.to_global(np.asarray(res.x))
    y = op.to_global(np.asarray(res_bj.x))
    np.testing.assert_allclose(x, y, atol=np.abs(y).max() * 1e-6)


def test_mg_f32_converges():
    """float32 end-to-end (the TPU configuration): MG-CG still converges to
    a tight relative residual in few iterations."""
    dims = (0.4, 0.4, 1.6)
    mesh, mask, f = _cantilever(dims, 0.1)
    mg = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask, dtype=np.float32)
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask), dtype=jnp.float32)
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-5, maxiter=100)
    assert bool(res.converged)
    assert int(res.iterations) < 40

def test_box_tet10_from_cells_exact_counts():
    """Anisotropic cell counts realize exactly (no mesh_size rounding)."""
    from femx.mesh import box_tet10_from_cells

    mesh = box_tet10_from_cells((11, 3, 3), (1.0 / 11, 0.09, 0.09))
    assert mesh.structured.n_cells == (11, 3, 3)
    np.testing.assert_allclose(mesh.points[:, 0].max(), 1.0, rtol=1e-12)


def test_inv3x3_np_matches_lapack():
    """Closed-form batched 3x3 inverse (setup hot path) == np.linalg.inv."""
    from femx.assembly_structured import _inv3x3_np

    rng = np.random.default_rng(3)
    A = rng.normal(size=(200, 3, 3))
    A = A @ np.transpose(A, (0, 2, 1)) + 3.0 * np.eye(3)  # SPD like the blocks
    np.testing.assert_allclose(_inv3x3_np(A), np.linalg.inv(A),
                               rtol=1e-11, atol=1e-13)


def test_dense_structured_K_matches_element_assembly():
    """Bincount overlap-add of the cell matrix == per-element assembly."""
    import jax.numpy as jnp

    from femx.assembly import SolidOperator, assemble_dense, dof_map
    from femx.elements.tet10 import material_matrix
    from femx.mesh import box_tet10_from_cells
    from femx.solve.multigrid import _dense_structured_K

    n_cells, spacing = (3, 2, 4), (0.11, 0.13, 0.09)
    mesh = box_tet10_from_cells(n_cells, spacing)
    C = material_matrix(2e11, 0.3, dtype=jnp.float64)
    op, _ = SolidOperator.from_mesh(mesh.points, mesh.cells["tetra10"], C)
    K_ref = np.asarray(assemble_dense(op.element_stiffness(),
                                      dof_map(op.conn, 3), 3 * mesh.num_nodes))
    K = _dense_structured_K(n_cells, spacing, 2e11, 0.3, op.weight)
    np.testing.assert_allclose(K, K_ref, rtol=1e-10,
                               atol=np.abs(K_ref).max() * 1e-12)


def test_coarsened_kcell_exact_rescale():
    """K(2h) == 2 K(h) for uniform coarsening (affine-element scaling law)."""
    from femx.assembly_structured import StructuredSolidOperator

    fine = StructuredSolidOperator.from_lattice((4, 4, 4), (0.05, 0.07, 0.06),
                                                2e11, 0.3, dtype=np.float64)
    coarse = fine.coarsened()
    rebuilt = StructuredSolidOperator.from_lattice((2, 2, 2), (0.1, 0.14, 0.12),
                                                   2e11, 0.3, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(coarse.Kcell), np.asarray(rebuilt.Kcell),
                               rtol=1e-12, atol=np.abs(rebuilt.Kcell).max() * 1e-12)
    assert coarse.n_cells == (2, 2, 2)


def test_mg_anisotropic_semicoarsening_converges():
    """Anisotropic/odd cell counts (ADVICE round-1 crash repro) now build a
    semi-coarsened hierarchy and MG-CG converges to the block-Jacobi answer."""
    from femx.assembly_structured import StructuredSolidOperator
    from femx.mesh import box_tet10_from_cells

    mesh = box_tet10_from_cells((20, 3, 12), (0.05, 0.09, 0.05))
    st = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float64)
    mask = np.ones(st.ndof)
    for node in np.where(mesh.points[:, 0] < 1e-9)[0]:
        mask[3 * node : 3 * node + 3] = 0.0
    f = np.zeros(st.ndof)
    tip = np.where(mesh.points[:, 0] > mesh.points[:, 0].max() - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)
    st = st.with_free_mask(jnp.asarray(st.to_internal(mask)))
    fj = jnp.asarray(st.to_internal(f * mask))

    mg = StructuredMultigrid(None, mesh.structured.n_cells, 2e11, 0.3, mask,
                             spacing=mesh.structured.spacing,
                             dtype=np.float64, fine_op=st)
    # v4 semi_stop_dof: after one (x, z) semi step the (10, 3, 6) level
    # (5733 DOF) fits the dense bottom, so the chain stops there instead
    # of semi-coarsening further.
    assert len(mg.levels) == 2
    assert any(g != (1, 2, 3) for g in mg._coarsen_axes)
    res = pcg(st.apply_constrained, fj, M_inv_diag=mg, tol=1e-10, maxiter=200)
    assert bool(res.converged)
    res_bj = pcg(st.apply_constrained, fj,
                 M_inv_diag=st.block_jacobi_preconditioner(), tol=1e-10, maxiter=5000)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_bj.x),
                               atol=float(np.abs(res_bj.x).max()) * 1e-7)


def test_mg_auto_path_anisotropic_box_no_crash():
    """SolidReactionAnalysis solver='mg' on an anisotropic box (the round-1
    ADVICE medium: used to raise 'cannot realize cell counts')."""
    from femx.analysis.solid import SolidReactionAnalysis

    mesh = box_tet10(1.0, 0.27, 0.27, 0.1,
                     fix_points=[(0, 0, 0), (0, 0.27, 0), (0, 0, 0.27), (0, 0.27, 0.27)],
                     force_points=[(1.0, 0.135, 0.135)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0, "force_y": -100.0, "force_z": 0,
          "force_x_pstn": 1.0, "force_y_pstn": 0.135, "force_z_pstn": 0.135}],
        [{"pos_x": 0, "pos_y": y, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for y, z in [(0, 0), (0.27, 0), (0, 0.27), (0.27, 0.27)]],
        E=2e11, v=0.3, solver="mg", verbose=False)
    fa.run_simulation()
    assert fa.solve_info["method"] in ("structured_multigrid_pcg",
                                       "structured_block_jacobi_pcg")
    np.testing.assert_allclose(fa.equilibrium_residual(), 0.0, atol=1e-8)


def test_mg_pytree_argument_equals_closure():
    """The multigrid pytree passed as a jit ARGUMENT must give the identical
    solve (same iterations, same bits) as the closure form — the
    compile-payload optimization must be semantics-free."""
    import jax

    from femx.mesh import box_tet10
    from femx.solve.cg import pcg

    mesh = box_tet10(0.2, 0.2, 0.4, mesh_size=0.05)
    op = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float64)
    mask = np.ones(op.ndof)
    for n in np.where(mesh.points[:, 2] < 1e-9)[0]:
        mask[3 * n : 3 * n + 3] = 0
    op = op.with_free_mask(op.to_internal(mask))
    mg = StructuredMultigrid(None, mesh.structured.n_cells, 2e11, 0.3, mask,
                             spacing=mesh.structured.spacing,
                             dtype=np.float64, fine_op=op)
    f = np.zeros(op.ndof)
    f[-4] = 123.0
    fj = jnp.asarray(op.to_internal(f * mask))

    r_closure = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-10,
                    maxiter=100)

    @jax.jit
    def solve(fv, mg_):
        return pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                   tol=1e-10, maxiter=100)

    r_args = solve(fj, mg)
    assert int(r_closure.iterations) == int(r_args.iterations)
    # eager (closure) vs fused (one jit) differ only in rounding order
    np.testing.assert_allclose(np.asarray(r_closure.x), np.asarray(r_args.x),
                               rtol=1e-9, atol=0)

    # flatten/unflatten round-trip preserves the preconditioner action
    leaves, td = jax.tree.flatten(mg)
    mg2 = jax.tree.unflatten(td, leaves)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(op.ndof))
    np.testing.assert_array_equal(np.asarray(mg(r)), np.asarray(mg2(r)))  # same objects -> same bits


def test_mg_hierarchy_disk_cache_roundtrip(tmp_path, monkeypatch):
    """A cache-hit rebuild is bit-identical to the cold build, and the key
    distinguishes masks (femx.solve.multigrid._mg_cache_*)."""
    monkeypatch.setenv("FEMX_MG_CACHE", str(tmp_path))
    dims = (0.4, 0.4, 0.8)
    mesh, mask, f = _cantilever(dims, 0.1)
    kw = dict(dtype=np.float32, coarse_dof_limit=3000)
    mg1 = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask, **kw)
    entries = [p for p in tmp_path.iterdir() if p.name.startswith("hier_")]
    assert len(entries) == 1 and entries[0].stat().st_size > 0
    mg2 = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask, **kw)
    assert mg1.omegas == mg2.omegas
    r = jnp.asarray(np.random.default_rng(0).standard_normal(
        mg1.fine_op.ndof).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(mg1(r)), np.asarray(mg2(r)))
    # a different mask must not hit the same entry
    mask2 = mask.copy()
    mask2[3] = 1.0 - mask2[3]
    StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask2, **kw)
    assert len([p for p in tmp_path.iterdir()
                if p.name.startswith("hier_")]) == 2
    # disabled cache leaves the directory untouched
    monkeypatch.setenv("FEMX_MG_CACHE", "0")
    StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3, mask, **kw)
    assert len(list(tmp_path.iterdir())) == 2


def test_mg_ghost_padding_rescues_stuck_hierarchies():
    """Ghost padding is an ESCAPE HATCH: a grid whose hierarchy gets stuck on
    all-odd cell counts ABOVE the dense-coarsest limit used to raise
    ValueError (dumping the solve onto thousand-iteration block-Jacobi CG);
    it must now pad odd axes, keep coarsening, converge in few iterations,
    and agree with a block-Jacobi reference solution."""
    dims = (0.9, 0.9, 1.8)
    mesh, mask, f = _cantilever(dims, 0.1)
    assert mesh.structured.n_cells == (9, 9, 18)
    # the old rule bottoms out at (9, 9, 9) = 20577 DOF > coarse_dense_limit
    with pytest.raises(ValueError):
        StructuredMultigrid(dims, (9, 9, 18), 2e11, 0.3, mask,
                            dtype=np.float64, coarse_dense_limit=15000,
                            pad_odd_axes=False)
    mg = StructuredMultigrid(dims, (9, 9, 18), 2e11, 0.3, mask,
                             dtype=np.float64, coarse_dense_limit=15000)
    assert [l.op.n_cells for l in mg.levels] == [(9, 9, 18), (9, 9, 9),
                                                 (5, 5, 5)]
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask))
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-10, maxiter=100)
    assert bool(res.converged), float(res.residual_norm)
    assert int(res.iterations) <= 45, int(res.iterations)
    ref = pcg(op.apply_constrained, fj,
              M_inv_diag=op.block_jacobi_preconditioner(),
              tol=1e-12, maxiter=20000)
    scale = float(np.abs(np.asarray(ref.x)).max())
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7 * scale)


def test_mg_ghost_padded_vcycle_is_symmetric():
    """CG requires a symmetric preconditioner: <M^-1 a, b> == <a, M^-1 b>
    must survive the zero-embed/slice transfer pair and the ghost-weighted
    coarse operators of a padded hierarchy."""
    dims = (0.9, 0.9, 0.9)
    mesh, mask, f = _cantilever(dims, 0.1)
    assert mesh.structured.n_cells == (9, 9, 9)
    mg = StructuredMultigrid(dims, (9, 9, 9), 2e11, 0.3, mask,
                             dtype=np.float64, coarse_dense_limit=2000)
    assert len(mg._pad_nodes) >= 1 and any(
        p != (0, 0, 0) for p in mg._pad_nodes)
    op = mg.fine_op
    rng = np.random.default_rng(3)
    m_int = np.asarray(op.free_mask)
    a = jnp.asarray(rng.normal(size=op.ndof) * m_int)
    b = jnp.asarray(rng.normal(size=op.ndof) * m_int)
    lhs = float(jnp.vdot(mg(a), b))
    rhs = float(jnp.vdot(a, mg(b)))
    assert lhs == pytest.approx(rhs, rel=1e-10)


def test_mg_even_grids_never_pad():
    """Regression guard: grids the old (even-axis) rule handled must build
    the EXACT same hierarchy — no ghost padding, no axis weights (measured:
    padding them early costs iterations, e.g. flagship 25 -> 30)."""
    dims = (0.5, 0.5, 2.0)
    mesh, mask, f = _cantilever(dims, 0.05)
    assert mesh.structured.n_cells == (10, 10, 40)
    mg = StructuredMultigrid(dims, (10, 10, 40), 2e11, 0.3, mask,
                             dtype=np.float64)
    # v4 semi_stop_dof: the chain stops with a dense bottom at (5, 5, 10)
    # (7623 DOF) instead of z-semi-coarsening to the anisotropic (5, 5, 5)
    # (measured on (20,20,80): 19 -> 13 iterations).
    assert [l.op.n_cells for l in mg.levels] == [
        (10, 10, 40), (5, 5, 20), (5, 5, 10)]
    assert all(p == (0, 0, 0) for p in mg._pad_nodes)
    for lvl in mg.levels:
        assert lvl.op.x_weight is None and lvl.op.y_weight is None \
            and lvl.op.z_weight is None
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask))
    res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-8, maxiter=60)
    assert bool(res.converged)
    assert int(res.iterations) <= 35, int(res.iterations)


def test_chebyshev_smoother_converges_and_matches():
    """smoother="chebyshev": same per-degree cost as damped Jacobi, SPD
    (CG's rz>0 guard would trip otherwise), same solution, and no more
    iterations than the Jacobi smoother on this grid."""
    dims = (0.4, 0.4, 2.0)
    mesh, mask, f = _cantilever(dims, 0.1)
    kw = dict(dtype=np.float64, coarse_dof_limit=3000)
    mg_j = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3,
                               mask, **kw)
    mg_c = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3,
                               mask, smoother="chebyshev", cheb_lower=1 / 8,
                               **kw)
    assert mg_c.lmaxs is not None and len(mg_c.lmaxs) == len(mg_c.levels)
    op = mg_j.fine_op
    fj = jnp.asarray(op.to_internal(f * mask))
    r_j = pcg(op.apply_constrained, fj, M_inv_diag=mg_j, tol=1e-10,
              maxiter=200)
    r_c = pcg(mg_c.fine_op.apply_constrained, fj, M_inv_diag=mg_c,
              tol=1e-10, maxiter=200)
    assert bool(r_c.converged)
    assert int(r_c.iterations) <= int(r_j.iterations)
    np.testing.assert_allclose(np.asarray(r_c.x), np.asarray(r_j.x),
                               atol=1e-8 * np.abs(np.asarray(r_j.x)).max())


def test_proxy_lambda_max_matches_direct():
    """The small-lattice proxy estimate of lambda_max(M^-1 K) must agree
    with the direct power iteration on a real masked level (the Chebyshev
    interval rests on it)."""
    from femx.solve.multigrid import _power_lambda_max, _proxy_lambda_max
    from femx.assembly_structured import StructuredSolidOperator

    for spacing in [(0.1, 0.1, 0.1), (0.05, 0.1, 0.2)]:
        op = StructuredSolidOperator.from_lattice((6, 6, 6), spacing,
                                                  2e11, 0.3,
                                                  dtype=np.float64)
        mask = np.ones(op.ndof)
        mask[:3 * 13 * 13] = 0.0  # a fixed z=0 plane, raster order
        op = op.with_free_mask(op.to_internal(mask))
        binv = [np.asarray(b) for b in op.block_jacobi_tensors()]
        direct = _power_lambda_max(op, binv)
        proxy = _proxy_lambda_max(spacing, 0.3, np.float64)
        # proxy is all-free: it may sit slightly above the masked direct
        # value (safe side for the upper Chebyshev bound) but not below it
        # by more than the power-iteration slack
        assert proxy > 0.93 * direct, (proxy, direct)
        assert proxy < 1.35 * direct, (proxy, direct)
