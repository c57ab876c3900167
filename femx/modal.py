"""Modal analysis: generalized symmetric eigensolves on (K, M).

The reference runs an unshifted QR iteration on the non-symmetric
inv(M_ff) @ K_ff (BeamSolver.py:442-481) — O(n^3) per iteration and its
"eigenvectors" are Schur vectors. femx solves the symmetric generalized
problem properly (SURVEY.md §6 quirk 2):

- dense path: Cholesky reduction M = L L^T, eigh(L^-1 K L^-T) — one fused
  on-device eigendecomposition, exact eigenvectors;
- diagonal-mass fast path: eigh(M^-1/2 K M^-1/2) (lumped mass is diagonal);
- large sparse path: LOBPCG against the matrix-free operator.

Output semantics match the reference: eigenvalues filtered to > 1e-6,
omega = sqrt(lambda) rad/s, mode shapes scattered to full DOF vectors
(BeamSolver.py:446-455).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class ModalResult(NamedTuple):
    omega: jnp.ndarray  # natural frequencies, rad/s, ascending
    modes: jnp.ndarray  # (ndof, n_modes) mass-orthonormal mode shapes


def generalized_eigh_dense(K, M):
    """All eigenpairs of K v = lambda M v for dense SPD M (Cholesky reduce)."""
    K = jnp.asarray(K)
    M = jnp.asarray(M)
    L = jnp.linalg.cholesky(M)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(K.shape[0], dtype=K.dtype), lower=True)
    Ktil = Linv @ K @ Linv.T
    Ktil = 0.5 * (Ktil + Ktil.T)
    lam, y = jnp.linalg.eigh(Ktil)
    v = Linv.T @ y
    return lam, v


def generalized_eigh_diag_mass(K, m_diag):
    """Eigenpairs for diagonal M (lumped mass): eigh(M^-1/2 K M^-1/2)."""
    K = jnp.asarray(K)
    d = jnp.asarray(m_diag)
    s = 1.0 / jnp.sqrt(d)
    Ktil = K * s[:, None] * s[None, :]
    Ktil = 0.5 * (Ktil + Ktil.T)
    lam, y = jnp.linalg.eigh(Ktil)
    return lam, y * s[:, None]


def modal_dense(
    K: np.ndarray,
    M: np.ndarray,
    fixed_dofs: np.ndarray,
    n_modes: Optional[int] = None,
    lam_min: float = 1e-6,
) -> ModalResult:
    """Host-partitioned modal solve on the free-free blocks.

    Mirrors the reference's pipeline semantics (BeamSolver.py:440-455):
    reduce to free DOFs, solve, filter lambda > 1e-6, omega = sqrt(lambda),
    scatter eigenvectors back to full DOF vectors — but with a symmetric
    solver and true eigenvectors. Raises if M_ff is singular (the reference
    aborts with a dialog, BeamSolver.py:441-444).
    """
    K = np.asarray(K)
    M = np.asarray(M)
    ndof = K.shape[0]
    fixed = np.asarray(fixed_dofs, dtype=np.int64)
    free = np.setdiff1d(np.arange(ndof), fixed)
    K_ff = K[np.ix_(free, free)]
    M_ff = M[np.ix_(free, free)]
    diag = np.diag(M_ff)
    if np.all(np.abs(M_ff - np.diag(diag)) < 1e-300):
        if np.any(diag <= 0):
            raise np.linalg.LinAlgError("Mass matrix is singular (zero lumped mass on a free DOF)")
        lam, v = generalized_eigh_diag_mass(jnp.asarray(K_ff), jnp.asarray(diag))
    else:
        lam, v = generalized_eigh_dense(jnp.asarray(K_ff), jnp.asarray(M_ff))
    lam = np.asarray(lam)
    v = np.asarray(v)
    valid = lam > lam_min
    lam, v = lam[valid], v[:, valid]
    if n_modes is not None:
        lam, v = lam[:n_modes], v[:, :n_modes]
    omega = np.sqrt(lam)
    full = np.zeros((ndof, v.shape[1]))
    full[free, :] = v
    return ModalResult(omega=jnp.asarray(omega), modes=jnp.asarray(full))


def modal_lobpcg(
    K_apply: Callable[[jnp.ndarray], jnp.ndarray],
    m_diag: jnp.ndarray,
    free_mask: jnp.ndarray,
    n_modes: int = 10,
    maxiter: int = 300,
    tol: Optional[float] = None,
    key=None,
) -> ModalResult:
    """Smallest modes of the large (matrix-free) generalized problem.

    Transforms with the diagonal mass, M^-1/2 K M^-1/2, and runs JAX's
    LOBPCG on the inverted spectrum via a shift: we instead seek the
    smallest eigenvalues directly using lobpcg on (sigma*I - A) ... JAX's
    lobpcg_standard finds the LARGEST eigenvalues, so we apply it to
    (sigma*I - A) with sigma an upper spectral bound estimated by power
    iteration, recovering the smallest lambda of A.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    s = jnp.asarray(free_mask)
    d = jnp.asarray(m_diag)
    dm = jnp.where(s > 0, 1.0 / jnp.sqrt(jnp.where(d > 0, d, 1.0)), 0.0)

    def A_free(x):  # masked, mass-scaled operator; x: (ndof, k)
        y = jax.vmap(lambda col: K_apply(col * dm) * dm, in_axes=1, out_axes=1)(x * s[:, None])
        return y * s[:, None]

    ndof = d.shape[0]
    key = jax.random.PRNGKey(0) if key is None else key
    # Spectral upper bound of the free-free block via power iteration.
    v = jax.random.normal(key, (ndof, 1), dtype=d.dtype) * s[:, None]
    for _ in range(20):
        v = A_free(v)
        v = v / jnp.linalg.norm(v)
    sigma = jnp.vdot(v, A_free(v)).real * 1.05 + 1.0

    # Pin fixed DOFs at eigenvalue sigma so they sit at the BOTTOM of the
    # inverted spectrum B = sigma*I - A (lobpcg_standard finds the largest
    # eigenvalues of B, i.e. the smallest physical modes).
    def B(x):
        Ax = A_free(x) + sigma * (1.0 - s)[:, None] * x
        return sigma * x - Ax

    X0 = jax.random.normal(key, (ndof, n_modes), dtype=d.dtype) * s[:, None]
    theta, y, iters = lobpcg_standard(B, X0, m=maxiter)
    lam = sigma - theta
    order = jnp.argsort(lam)
    lam = lam[order]
    y = y[:, order]
    modes = y * dm[:, None]
    valid = lam > 1e-6
    omega = jnp.sqrt(jnp.where(valid, lam, 1.0)) * valid
    return ModalResult(omega=omega, modes=modes)


def reference_qr_eigensolve(A: np.ndarray, max_iter: int = 1000, tol: float = 1e-9):
    """Reference-compat eigensolver: unshifted QR iteration with diagonal
    stagnation test, returning (sorted eigenvalues, accumulated Q columns)
    exactly as the reference's `qr_algorithm` does (BeamSolver.py:467-481).
    Kept for cross-validation only — femx's pipelines use the symmetric
    solvers above."""
    A_k = np.asarray(A).copy()
    n = A_k.shape[0]
    V = np.eye(n)
    A_k_new = A_k
    for _ in range(max_iter):
        Q, R = np.linalg.qr(A_k)
        A_k_new = R @ Q
        V = V @ Q
        if np.allclose(np.diag(A_k), np.diag(A_k_new), atol=tol):
            break
        A_k = A_k_new
    lam = np.diag(A_k_new)
    order = np.argsort(lam)
    return lam[order], V[:, order]
