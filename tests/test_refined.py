"""Mixed-precision iterative refinement: f32 inner solves + f64 residuals.

BASELINE.json north star: 1e-8 rel parity on deflections while the TPU hot
path runs float32. Validated here on CPU at ~180k DOF against a float64
MG-PCG reference solve.
"""

import numpy as np
import jax
import jax.numpy as jnp

from femx.mesh import box_tet10_from_cells
from femx.solve.cg import pcg, pcg_mixed, pcg_refined
from femx.solve.multigrid import StructuredMultigrid
from femx.assembly_structured import StructuredSolidOperator


def _cantilever_problem(cells):
    h = 1.6 / 48
    mesh = box_tet10_from_cells(cells, (h, h, h))
    st32 = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float32)
    mask = np.ones(st32.ndof)
    for node in np.where(mesh.points[:, 2] < 1e-9)[0]:
        mask[3 * node : 3 * node + 3] = 0.0
    f = np.zeros(st32.ndof)
    tip = np.where(mesh.points[:, 2] > mesh.points[:, 2].max() - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)
    m_int = st32.to_internal(mask)
    st32 = st32.with_free_mask(m_int.astype(np.float32))
    st64 = st32.astype(np.float64)
    f_int = st32.to_internal(f * mask)
    mg32 = StructuredMultigrid(None, mesh.structured.n_cells, 2e11, 0.3, mask,
                               spacing=mesh.structured.spacing,
                               dtype=np.float32, fine_op=st32)
    return st32, st64, f_int, mg32, mask, mesh


def test_adaptive_refinement_reaches_outer_tol_and_stops():
    """outer_tol early exit: refinement runs only as many passes as needed
    and reports the true residual; converged reflects the OUTER target."""
    st32, st64, f_int, mg32, _, _ = _cantilever_problem((8, 8, 24))

    res = pcg_refined(st32.apply_constrained,
                      jnp.asarray(f_int, dtype=jnp.float32),
                      M_inv_diag=mg32, tol=1e-5, maxiter=100,
                      refine_steps=8, outer_tol=1e-9,
                      A_residual=st64.apply_constrained,
                      b_residual=jnp.asarray(f_int))
    assert res.x.dtype == jnp.float64
    assert bool(res.converged)
    assert float(res.residual_norm) <= 1e-9
    # adaptive exit: nowhere near 8 full passes' worth of inner iterations
    first = pcg(st32.apply_constrained, jnp.asarray(f_int, dtype=jnp.float32),
                M_inv_diag=mg32, tol=1e-5, maxiter=100)
    assert int(res.iterations) < 9 * int(first.iterations) + 9

    # the same call is jittable as ONE program with pytree args
    @jax.jit
    def solve(fv, fv64, mg_, op64_):
        r = pcg_refined(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                        tol=1e-5, maxiter=100, refine_steps=8, outer_tol=1e-9,
                        A_residual=op64_.apply_constrained, b_residual=fv64)
        return r.x, r.residual_norm

    xj, rnj = solve(jnp.asarray(f_int, dtype=jnp.float32),
                    jnp.asarray(f_int), mg32, st64)
    assert float(rnj) <= 1e-9
    np.testing.assert_allclose(np.asarray(xj), np.asarray(res.x), rtol=0,
                               atol=1e-9 * float(np.abs(np.asarray(res.x)).max()))


def test_mixed_outer_f64_with_f32_vcycle_preconditioner():
    """pcg_mixed: f64 outer CG + f32 MG V-cycle preconditioner reaches
    1e-8 true residual (the structured flagship's accuracy fallback)."""
    st32, st64, f_int, mg32, _, _ = _cantilever_problem((8, 8, 24))
    f64 = jnp.asarray(f_int)

    res = pcg_mixed(st64.apply_constrained, f64, mg32, tol=1e-10, maxiter=200)
    assert res.x.dtype == jnp.float64
    assert bool(res.converged)
    r = f64 - st64.apply_constrained(res.x)
    true_rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(f64))
    assert true_rel < 1e-8, true_rel

    # iteration count stays in the MG-preconditioned regime (tens, not
    # hundreds): the f32 V-cycle loses none of its effectiveness as an
    # f64-outer preconditioner
    assert int(res.iterations) < 60


def test_f32_refined_matches_f64_to_1e8():
    h = 1.6 / 48
    mesh = box_tet10_from_cells((12, 12, 48), (h, h, h))  # 181,875 DOF
    st32 = StructuredSolidOperator.from_mesh(mesh, 2e11, 0.3, dtype=np.float32)
    mask = np.ones(st32.ndof)
    for node in np.where(mesh.points[:, 2] < 1e-9)[0]:
        mask[3 * node : 3 * node + 3] = 0.0
    f = np.zeros(st32.ndof)
    tip = np.where(mesh.points[:, 2] > mesh.points[:, 2].max() - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)

    m_int = st32.to_internal(mask)
    st32 = st32.with_free_mask(m_int.astype(np.float32))
    st64 = st32.astype(np.float64)
    f_int = st32.to_internal(f * mask)

    mg32 = StructuredMultigrid(None, mesh.structured.n_cells, 2e11, 0.3, mask,
                               spacing=mesh.structured.spacing,
                               dtype=np.float32, fine_op=st32)
    mg64 = StructuredMultigrid(None, mesh.structured.n_cells, 2e11, 0.3, mask,
                               spacing=mesh.structured.spacing,
                               dtype=np.float64, fine_op=st64)

    # float64 reference solve
    ref = pcg(st64.apply_constrained, jnp.asarray(f_int), M_inv_diag=mg64,
              tol=1e-12, maxiter=100)
    assert bool(ref.converged)

    # f32 inner + f64 refinement
    res = pcg_refined(st32.apply_constrained, jnp.asarray(f_int, dtype=jnp.float32),
                      M_inv_diag=mg32, tol=1e-5, maxiter=100, refine_steps=3,
                      A_residual=st64.apply_constrained,
                      b_residual=jnp.asarray(f_int))
    assert res.x.dtype == jnp.float64
    true_res = float(res.residual_norm)
    assert true_res < 1e-9, true_res

    scale = float(jnp.max(jnp.abs(ref.x)))
    err = float(jnp.max(jnp.abs(res.x - ref.x))) / scale
    assert err < 1e-8, err

    # and: a pure-f32 solve CANNOT reach this (documents why refinement
    # must evaluate residuals in f64)
    res32 = pcg(st32.apply_constrained, jnp.asarray(f_int, dtype=jnp.float32),
                M_inv_diag=mg32, tol=1e-5, maxiter=100)
    err32 = float(jnp.max(jnp.abs(jnp.asarray(res32.x, jnp.float64) - ref.x))) / scale
    assert err32 > err * 100
