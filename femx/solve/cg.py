"""Preconditioned conjugate gradients — matrix-free, jittable, TPU-first.

The large-system replacement for SuperLU's sparse direct solve
(ReactionSolver.py:201). Works against any SPD linear operator callable
(typically femx.assembly.SolidOperator.apply_constrained), with Jacobi
preconditioning from the operator's matrix-free diagonal. The loop is a
`lax.while_loop` so the entire solve is one compiled program with no host
round-trips per iteration.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray  # solution (same pytree structure as b)
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray  # ||b - A x|| / ||b||
    converged: jnp.ndarray


# -- pytree vector algebra: pcg works on arbitrary pytrees of arrays (e.g.
#    the structured operator's phase-grid lists under GSPMD sharding) -------
def _tvdot(a, b):
    parts = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(parts[1:], parts[0])


def _taxpy(alpha, x, y):  # y + alpha * x
    return jax.tree.map(lambda xi, yi: yi + alpha * xi, x, y)


def _tscale_add(z, beta, p):  # z + beta * p
    return jax.tree.map(lambda zi, pi: zi + beta * pi, z, p)


def _as_precond(M_inv) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if M_inv is None:
        return lambda r: r
    if callable(M_inv):
        return M_inv
    minv = jax.tree.map(jnp.asarray, M_inv)
    return lambda r: jax.tree.map(lambda m, ri: m * ri, minv, r)


def pcg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    M_inv_diag=None,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    maxiter: int = 10000,
) -> CGResult:
    """Preconditioned CG for SPD A.

    Args:
      A: linear operator (ndof,) -> (ndof,).
      b: right-hand side.
      M_inv_diag: preconditioner — either an inverse diagonal array (Jacobi,
        e.g. 1/diag(K)) or a callable r -> M^-1 r (e.g. nodal block-Jacobi);
        identity if None.
      tol: relative residual target ||r|| <= tol * ||b||.
    """
    b = jax.tree.map(jnp.asarray, b)
    x = jax.tree.map(jnp.zeros_like, b) if x0 is None else jax.tree.map(jnp.asarray, x0)
    Minv = _as_precond(M_inv_diag)

    bnorm = jnp.sqrt(_tvdot(b, b))
    bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
    atol2 = (tol * bnorm_safe) ** 2

    r = jax.tree.map(lambda bi, ai: bi - ai, b, A(x))
    z = Minv(r)
    p = z
    rz = _tvdot(r, z)

    def cond(state):
        _x, r, _p, _z, rz, k = state
        rr = _tvdot(r, r)
        ok = jnp.isfinite(rr) & (rz > 0)  # breakdown guard (fp32 robustness)
        return ok & (rr > atol2) & (k < maxiter)

    def body(state):
        x, r, p, z, rz, k = state
        Ap = A(p)
        pAp = _tvdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = _taxpy(alpha, p, x)
        r = _taxpy(-alpha, Ap, r)
        z = Minv(r)
        rz_new = _tvdot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = _tscale_add(z, beta, p)
        return (x, r, p, z, rz_new, k + 1)

    x, r, p, z, rz, k = jax.lax.while_loop(cond, body, (x, r, p, z, rz, jnp.array(0)))
    res = jnp.sqrt(_tvdot(r, r)) / bnorm_safe
    return CGResult(x=x, iterations=k, residual_norm=res, converged=res <= tol)


def fcg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    M_inv=None,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    maxiter: int = 10000,
) -> CGResult:
    """Flexible preconditioned CG (Notay's FCG(1) / IPCG).

    Identical to :func:`pcg` except the Polak-Ribiere form
    ``beta = (z, r - r_prev) / (z_prev, r_prev)`` replaces the
    Fletcher-Reeves ``beta = (z, r)/(z_prev, r_prev)``. The two are
    algebraically equal for a FIXED SPD preconditioner ((z, r_prev) = 0 in
    exact arithmetic) but the PR form stays convergent when M^-1 varies
    between iterations or is mildly nonsymmetric — which is exactly the
    situation for the one-sided multiplicative lattice preconditioner
    (coarse correction + post-smoothing only; femx.solve.lattice_precond
    mode="mult"): symmetrizing it would cost an extra operator apply per
    iteration (~43 ms at the 1.39M-DOF flagship), while FCG gets the
    same effect for one extra dot product.

    Cost vs pcg: stores r_prev (one extra vector) and computes one extra
    tree-dot per iteration; the operator/preconditioner call count is
    unchanged.
    """
    b = jax.tree.map(jnp.asarray, b)
    x = jax.tree.map(jnp.zeros_like, b) if x0 is None else jax.tree.map(jnp.asarray, x0)
    Minv = _as_precond(M_inv)

    bnorm = jnp.sqrt(_tvdot(b, b))
    bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
    atol2 = (tol * bnorm_safe) ** 2

    r = jax.tree.map(lambda bi, ai: bi - ai, b, A(x))
    z = Minv(r)
    p = z
    rz = _tvdot(r, z)

    def cond(state):
        _x, r, _p, rz, _r_prev, k = state
        rr = _tvdot(r, r)
        ok = jnp.isfinite(rr) & (rz > 0)
        return ok & (rr > atol2) & (k < maxiter)

    def body(state):
        x, r, p, rz, _r_prev, k = state
        Ap = A(p)
        pAp = _tvdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = _taxpy(alpha, p, x)
        r_new = _taxpy(-alpha, Ap, r)
        z = Minv(r_new)
        # Polak-Ribiere: (z, r_new - r_old) — self-stabilizing under a
        # varying preconditioner
        rz_new = _tvdot(r_new, z) - _tvdot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = _tscale_add(z, beta, p)
        return (x, r_new, p, _tvdot(r_new, z), r, k + 1)

    x, r, p, rz, _rp, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, r, jnp.array(0)))
    res = jnp.sqrt(_tvdot(r, r)) / bnorm_safe
    return CGResult(x=x, iterations=k, residual_norm=res, converged=res <= tol)


def pcg_refined(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    M_inv_diag: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    maxiter: int = 10000,
    refine_steps: int = 2,
    A_residual: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    residual_dtype=None,
    b_residual=None,
    outer_tol: float = 0.0,
) -> CGResult:
    """Mixed-precision PCG: low-precision inner solves + high-precision
    outer iterative refinement, with adaptive early exit and a divergence
    guard.

    The f32-on-TPU answer to the reference's f64 SuperLU solve. A pure-f32
    refinement is USELESS here: with K entries ~E*h (~1e9) and b ~O(1), the
    f32 evaluation of b - A x carries ~1e-2 relative noise from cancellation
    (measured on the 1.39M-DOF bench), so the true residual never improves.
    The residual must be evaluated in high precision:

      r_k = b - A x_k        in residual_dtype (float64 by default)
      d_k = A^-1 r_k         inner PCG in b's (low) precision
      x_{k+1} = x_k + d_k    accumulated in residual_dtype

    Measured contraction on the 1.39M-DOF structured flagship (v5e, f32
    MG-PCG inner solves at tol 1e-5): ~86x true-residual reduction per pass
    — 3.8e-2, 4.3e-4, 5.6e-6, 6.9e-8, 1.0e-9 after passes 0..4. There is NO
    f32 noise floor above the f64 evaluation floor (identical per-pass
    numbers under jax.default_matmul_precision('highest'); the operator
    applies already run at Precision.HIGHEST). Two failure modes this
    function guards against, both measured on-chip:
      * stopping too early — round 2 ran a FIXED refine_steps=2 and reported
        5.6e-6 as a "floor"; it was just pass 2. The loop now iterates until
        ``outer_tol`` is met (up to refine_steps passes).
      * refining past the f64 floor — once the true residual reaches the
        rounding noise of evaluating b - A x in f64 (~1e-9 rel at this
        scale/conditioning), the "residual" is an incoherent noise vector;
        the inner CG on it can DIVERGE (measured: pass 5 took the residual
        1.0e-9 -> 4.4e-3). Every candidate update is therefore accepted only
        if it reduces the true residual, else reverted and the loop stops.

    Args:
      A_residual: high-precision version of the operator used for the
        residual evaluations (e.g. the structured operator rebuilt with a
        float64 cell matrix). Defaults to A (then refinement only helps if
        A/b are already high-precision).
      residual_dtype: accumulation dtype (default float64 when x64 enabled).
      b_residual: the UNROUNDED right-hand side for residual evaluation.
        If b was already cast to the low precision, refinement converges to
        the solution of the perturbed system (a ~2^-26 relative error
        floor, measured); pass the original high-precision b here to remove
        it. Defaults to b cast up.
      refine_steps: MAXIMUM number of refinement passes.
      outer_tol: true-residual target; passes stop early once
        ||b - A x|| <= outer_tol * ||b||. 0.0 reproduces the fixed-pass
        behavior (modulo the divergence guard).

    Returns x in residual_dtype with residual_norm the TRUE relative
    residual ||b - A x|| / ||b|| evaluated in high precision. `converged`
    reports the outer_tol target when one was given, else the inner tol.
    """
    if A_residual is None:
        A_residual = A
    if residual_dtype is None:
        residual_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    low_dtype = jax.tree.leaves(jax.tree.map(jnp.asarray, b))[0].dtype

    def to_high(v):
        return jax.tree.map(lambda vi: jnp.asarray(vi, dtype=residual_dtype), v)

    def to_low(v):
        return jax.tree.map(lambda vi: jnp.asarray(vi, dtype=low_dtype), v)

    def tsub(a, c):
        return jax.tree.map(lambda ai, ci: ai - ci, a, c)

    result = pcg(A, b, M_inv_diag, tol=tol, maxiter=maxiter)
    b_h = to_high(b if b_residual is None else b_residual)
    bnorm = jnp.sqrt(_tvdot(b_h, b_h))
    bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)

    x0 = to_high(result.x)
    r0 = tsub(b_h, A_residual(x0))
    rn0 = jnp.sqrt(_tvdot(r0, r0)) / bnorm_safe

    def cond(state):
        _x, _r, rn, _it, k, stop = state
        return (~stop) & (rn > outer_tol) & (k < refine_steps)

    def body(state):
        x, r, rn, it, k, _ = state
        corr = pcg(A, to_low(r), M_inv_diag, tol=tol, maxiter=maxiter)
        x_new = jax.tree.map(
            lambda xi, di: xi + jnp.asarray(di, dtype=residual_dtype), x, corr.x
        )
        r_new = tsub(b_h, A_residual(x_new))
        rn_new = jnp.sqrt(_tvdot(r_new, r_new)) / bnorm_safe
        better = rn_new < rn
        x = jax.tree.map(lambda a, c: jnp.where(better, c, a), x, x_new)
        r = jax.tree.map(lambda a, c: jnp.where(better, c, a), r, r_new)
        rn = jnp.where(better, rn_new, rn)
        return (x, r, rn, it + corr.iterations, k + 1, ~better)

    x_h, _r, res, total_it, _k, _stop = jax.lax.while_loop(
        cond, body, (x0, r0, rn0, result.iterations, jnp.array(0), jnp.array(False))
    )
    target = jnp.where(jnp.asarray(outer_tol) > 0, outer_tol, tol)
    return CGResult(x=x_h, iterations=total_it, residual_norm=res,
                    converged=res <= target)


def pcg_mixed(
    A_high: Callable[[jnp.ndarray], jnp.ndarray],
    b_high: jnp.ndarray,
    M_inv_low,
    tol: float = 1e-8,
    maxiter: int = 10000,
    low_dtype=jnp.float32,
) -> CGResult:
    """High-precision PCG with a low-precision preconditioner.

    The outer CG loop (operator applies, vectors, dot products) runs in
    b_high's precision — typically float64 — while the preconditioner (e.g.
    the f32 multigrid V-cycle) is applied in ``low_dtype``: the residual is
    cast down, preconditioned, and the result cast back up. Since the f32
    V-cycle is a FIXED linear operator up to rounding (~2^-24 relative),
    standard PCG converges at the f32 preconditioner's rate while the
    recursion/true residual tracks f64 accuracy.

    Measured on the 1.39M-DOF structured flagship (v5e): 22 iterations,
    0.92 s, true f64 residual 2.2e-9 — vs 0.096 s / 1e-5 for the pure-f32
    solve and 2.5 s for the all-f64 solve. pcg_refined (f32 inner solves,
    adaptive) reaches the same accuracy cheaper; this variant is the
    fallback when a full low-precision SOLVE of the correction equation is
    itself unreliable (ill-conditioning beyond f32's range) because only
    the PRECONDITIONER runs in f32 here.
    """
    def minv(r):
        z = M_inv_low(jax.tree.map(lambda ri: jnp.asarray(ri, low_dtype), r))
        hi = jax.tree.leaves(jax.tree.map(jnp.asarray, b_high))[0].dtype
        return jax.tree.map(lambda zi: jnp.asarray(zi, hi), z)

    return pcg(A_high, b_high, M_inv_diag=minv, tol=tol, maxiter=maxiter)
