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
) -> CGResult:
    """PCG with outer iterative refinement.

    On TPU the inner solve typically runs in float32; recomputing the true
    residual and re-solving for the correction recovers accuracy lost to
    accumulated rounding (the f32-on-TPU answer to the reference's f64
    SuperLU solve). With refine_steps=0 this is plain `pcg`.
    """
    result = pcg(A, b, M_inv_diag, tol=tol, maxiter=maxiter)
    x, total_it = result.x, result.iterations
    for _ in range(refine_steps):
        r = jax.tree.map(lambda bi, ai: bi - ai, b, A(x))
        corr = pcg(A, r, M_inv_diag, tol=tol, maxiter=maxiter)
        x = _taxpy(1.0, corr.x, x)
        total_it = total_it + corr.iterations
    r = jax.tree.map(lambda bi, ai: bi - ai, b, A(x))
    bnorm = jnp.sqrt(_tvdot(b, b))
    bnorm_safe = jnp.where(bnorm > 0, bnorm, 1.0)
    res = jnp.sqrt(_tvdot(r, r)) / bnorm_safe
    return CGResult(x=x, iterations=total_it, residual_norm=res, converged=res <= tol)
