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
) -> CGResult:
    """Mixed-precision PCG: low-precision inner solves + high-precision
    outer iterative refinement.

    The f32-on-TPU answer to the reference's f64 SuperLU solve. A pure-f32
    refinement is USELESS here: with K entries ~E*h (~1e9) and b ~O(1), the
    f32 evaluation of b - A x carries ~1e-2 relative noise from cancellation
    (measured on the 1.39M-DOF bench), so the true residual never improves.
    The residual must be evaluated in high precision:

      r_k = b - A x_k        in residual_dtype (float64 by default)
      d_k = A^-1 r_k         inner PCG in b's (low) precision
      x_{k+1} = x_k + d_k    accumulated in residual_dtype

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

    Returns x in residual_dtype with residual_norm the TRUE relative
    residual ||b - A x|| / ||b|| evaluated in high precision.
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

    result = pcg(A, b, M_inv_diag, tol=tol, maxiter=maxiter)
    b_h = to_high(b if b_residual is None else b_residual)
    x_h = to_high(result.x)
    total_it = result.iterations
    for _ in range(refine_steps):
        r_h = jax.tree.map(lambda bi, ai: bi - ai, b_h, A_residual(x_h))
        corr = pcg(A, to_low(r_h), M_inv_diag, tol=tol, maxiter=maxiter)
        x_h = jax.tree.map(lambda xi, di: xi + jnp.asarray(di, dtype=residual_dtype),
                           x_h, corr.x)
        total_it = total_it + corr.iterations
    r_h = jax.tree.map(lambda bi, ai: bi - ai, b_h, A_residual(x_h))
    bnorm = jnp.sqrt(_tvdot(b_h, b_h))
    bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
    res = jnp.sqrt(_tvdot(r_h, r_h)) / bnorm_safe
    return CGResult(x=x_h, iterations=total_it, residual_norm=res, converged=res <= tol)
