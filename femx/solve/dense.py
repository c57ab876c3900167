"""Dense direct solves (small systems) — Cholesky on-device.

Replaces numpy's `np.linalg.solve` on the beam path (BeamSolver.py:417) and
SuperLU's `spsolve` on small solid systems (ReactionSolver.py:201) with a
masked, static-shape Cholesky factorization that runs under jit on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from femx.bc import apply_dirichlet_dense


def solve_dense(K, f, free_mask=None, assume_spd: bool = True):
    """Solve K u = f (optionally with Dirichlet mask; 1.0 free / 0.0 fixed).

    With a mask, solves (S K S + I-S) u = S f so fixed DOFs come back exactly
    zero. SPD systems use Cholesky (cho_factor/cho_solve); otherwise LU.
    """
    K = jnp.asarray(K)
    f = jnp.asarray(f, dtype=K.dtype)
    if free_mask is not None:
        K, f = apply_dirichlet_dense(K, f, free_mask)
    if assume_spd:
        c, lower = jax.scipy.linalg.cho_factor(K, lower=True)
        return jax.scipy.linalg.cho_solve((c, lower), f)
    return jnp.linalg.solve(K, f)


def partitioned_solve(K, f, fixed_dofs, prescribed=None):
    """Host-partitioned exact-parity solve (mirrors BeamSolver.py:409-418).

    Reduces to the free-free block with numpy indexing (host, dynamic shapes)
    then solves on device. Returns the full displacement vector. Used by the
    small beam pipeline where bit-level agreement with the reference's
    partitioned formulation matters more than jit-ability.
    """
    import numpy as np

    K = np.asarray(K)
    f = np.asarray(f)
    ndof = K.shape[0]
    fixed = np.asarray(fixed_dofs, dtype=np.int64)
    free = np.setdiff1d(np.arange(ndof), fixed)
    u = np.zeros(ndof)
    if prescribed is not None:
        u[fixed] = np.asarray(prescribed)
    k_ff = K[np.ix_(free, free)]
    k_fs = K[np.ix_(free, fixed)]
    rhs = f[free] - k_fs @ u[fixed]
    u_f = solve_dense(jnp.asarray(k_ff), jnp.asarray(rhs))
    u[free] = np.asarray(u_f)
    return u
