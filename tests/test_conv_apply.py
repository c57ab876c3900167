"""Conv-form structured apply (femx.assembly_conv) parity and routing.

The conv stencil is the SAME matrix as the slot-form apply (one 3x3x3
24-channel correlation + inclusion-exclusion boundary closure), so parity
holds to summation-reordering roundoff. Grids are chosen to exercise every
closure term: single-cell (all 26 corrections touch the same nodes), mixed
odd/even extents, and anisotropic spacing.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from femx.assembly_conv import apply_conv, build_kernels, _kernel_tables
from femx.assembly_structured import StructuredSolidOperator

# Three grids cover the closure cases (single-cell: every correction term
# overlaps; mixed odd/even; non-monotone extents) — each parametrization
# pays a full conv-graph compile (~20-30 s CPU), so the list stays tight
# to keep the fast lane under its 5-minute budget.
GRIDS = [(1, 1, 1), (1, 2, 3), (5, 3, 2)]


def _op(n_cells, dtype):
    return StructuredSolidOperator.from_lattice(
        n_cells, (0.1, 0.13, 0.08), 2e11, 0.3, dtype=dtype)


@pytest.mark.parametrize("n_cells", GRIDS)
def test_parity_f64(n_cells):
    op = _op(n_cells, np.float64)
    u = np.random.default_rng(1).standard_normal(op.ndof)
    ref = np.asarray(op.apply(jnp.asarray(u)))
    got = np.asarray(apply_conv(op, jnp.asarray(u)))
    assert np.max(np.abs(got - ref)) <= 1e-12 * np.max(np.abs(ref))


def test_parity_f32():
    op = _op((4, 3, 5), np.float32)
    u = np.random.default_rng(2).standard_normal(op.ndof).astype(np.float32)
    ref = np.asarray(op.apply(jnp.asarray(u)))
    got = np.asarray(apply_conv(op, jnp.asarray(u)))
    assert np.max(np.abs(got - ref)) <= 2e-5 * np.max(np.abs(ref))


def test_symmetric():
    op = _op((3, 3, 3), np.float64)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(op.ndof))
    w = jnp.asarray(rng.standard_normal(op.ndof))
    a = float(v @ apply_conv(op, w))
    b = float(w @ apply_conv(op, v))
    assert abs(a - b) <= 1e-10 * abs(a)


def test_env_routing_constrained(monkeypatch):
    """FEMX_STRUCTURED_APPLY=conv routes apply_constrained identically."""
    op = _op((2, 3, 2), np.float64)
    mask = np.ones(op.ndof)
    mask[: op.ndof // 7] = 0.0
    op = op.with_free_mask(mask)
    u = np.random.default_rng(4).standard_normal(op.ndof)
    ref = np.asarray(op.apply_constrained(jnp.asarray(u)))
    monkeypatch.setenv("FEMX_STRUCTURED_APPLY", "conv")
    monkeypatch.setenv("FEMX_CONV_MIN_CELLS", "0")
    got = np.asarray(op.apply_constrained(jnp.asarray(u)))
    assert np.max(np.abs(got - ref)) <= 1e-12 * np.max(np.abs(ref))


def test_env_routing_respects_layer_weights(monkeypatch):
    """Ghost-weighted operators (position-dependent stencil) keep slot form."""
    import dataclasses

    op = _op((2, 2, 4), np.float64)
    zw = np.ones(4)
    zw[-1] = 0.0
    op_w = dataclasses.replace(op, z_weight=jnp.asarray(zw))
    object.__setattr__(op_w, "_Kcell_host", op.Kcell_host)
    u = np.random.default_rng(5).standard_normal(op.ndof)
    ref = np.asarray(op_w.apply(jnp.asarray(u)))
    monkeypatch.setenv("FEMX_STRUCTURED_APPLY", "conv")
    monkeypatch.setenv("FEMX_CONV_MIN_CELLS", "0")
    got = np.asarray(op_w.apply(jnp.asarray(u)))
    assert np.array_equal(got, ref)


def test_full_kernel_block_symmetry():
    """W[cho, chi, e] == W[chi, cho, -e] (the operator matrix is symmetric)."""
    op = _op((2, 2, 2), np.float64)
    W = np.asarray(build_kernels(op.Kcell)[("F", "F", "F")])
    Wt = np.transpose(W[:, :, ::-1, ::-1, ::-1], (1, 0, 2, 3, 4))
    assert np.allclose(W, Wt, atol=1e-9 * np.max(np.abs(W)))


def test_mg_pcg_solve_with_conv_routing(monkeypatch):
    """Full MG-PCG solve with FEMX_STRUCTURED_APPLY=conv matches default:
    same solution and same iteration count (the smoothers and the CG body
    all route through op.apply, so this covers the whole solve surface)."""
    from femx.mesh import box_tet10
    from femx.solve.cg import pcg
    from femx.solve.multigrid import StructuredMultigrid

    dims = (0.4, 0.4, 1.2)
    mesh = box_tet10(*dims, mesh_size=0.1)
    mask = np.ones(3 * mesh.num_nodes)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(3 * mesh.num_nodes)
    tip = np.where(mesh.points[:, 2] > dims[2] - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)

    def solve():
        mg = StructuredMultigrid(dims, mesh.structured.n_cells, 2e11, 0.3,
                                 mask, dtype=np.float64, coarse_dof_limit=3000)
        op = mg.fine_op
        fj = jnp.asarray(op.to_internal(f * mask))
        res = pcg(op.apply_constrained, fj, M_inv_diag=mg, tol=1e-8,
                  maxiter=200)
        return op.to_global(np.asarray(res.x)), int(res.iterations), \
            bool(res.converged)

    monkeypatch.delenv("FEMX_STRUCTURED_APPLY", raising=False)
    x_ref, it_ref, ok_ref = solve()
    monkeypatch.setenv("FEMX_STRUCTURED_APPLY", "conv")
    monkeypatch.setenv("FEMX_CONV_MIN_CELLS", "0")
    # The flag is read at TRACE time: a same-shape second solve would hit
    # the jit cache and silently reuse the slot-form program.
    import jax

    jax.clear_caches()
    x_conv, it_conv, ok_conv = solve()
    assert ok_ref and ok_conv
    # The two forms agree to summation-reordering roundoff, so a residual
    # landing within roundoff of tol can legitimately shift convergence by
    # one iteration — equality would be a latent flake.
    assert abs(it_conv - it_ref) <= 1, (it_conv, it_ref)
    np.testing.assert_allclose(x_conv, x_ref, atol=np.abs(x_ref).max() * 1e-9)


def test_pipeline_structured_apply_arg(monkeypatch):
    """SolidReactionAnalysis(structured_apply='conv') routes the MG solve
    through the conv form and matches the default pipeline answer."""
    import jax

    from femx.analysis.solid import SolidReactionAnalysis
    from femx.mesh import box_tet10

    mesh = box_tet10(0.4, 0.4, 1.2, 0.1,
                     force_points=[(0.2, 0.4, 0.6)],
                     fix_points=[(0, 0, 0), (0.4, 0, 0),
                                 (0, 0, 1.2), (0.4, 0, 1.2)])
    forces = [{"force_x": 0, "force_y": 500.0, "force_z": 0,
               "force_x_pstn": 0.2, "force_y_pstn": 0.4, "force_z_pstn": 0.6}]
    fixes = [{"pos_x": x, "pos_y": 0.0, "pos_z": z,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for x, z in [(0, 0), (0.4, 0), (0, 1.2), (0.4, 1.2)]]

    def run(**kw):
        fa = SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                                   solver="mg", verbose=False, **kw)
        fa.run_simulation(report=False)
        return fa

    # setenv first so monkeypatch teardown restores the pre-test value even
    # though the conv-run constructor overwrites it process-wide.
    monkeypatch.setenv("FEMX_STRUCTURED_APPLY", "slot")
    ref = run()
    assert ref.solve_info["structured_apply"] == "slot"
    monkeypatch.setenv("FEMX_CONV_MIN_CELLS", "0")
    jax.clear_caches()  # the routing flag is read at trace time
    got = run(structured_apply="conv")
    jax.clear_caches()
    assert got.solve_info["structured_apply"] == "conv"
    np.testing.assert_allclose(got.u, ref.u,
                               atol=np.abs(ref.u).max() * 1e-8)
    with pytest.raises(ValueError):
        SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                              structured_apply="bogus")


def test_tables_cover_all_kcell_entries():
    """The full-kernel table maps every (81, 81) entry exactly once."""
    src = _kernel_tables()[("F", "F", "F")][3]
    assert len(src) == 81 * 81
    assert len(set(src.tolist())) == 81 * 81
