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

from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class ModalResult(NamedTuple):
    omega: jnp.ndarray  # natural frequencies, rad/s, ascending
    modes: jnp.ndarray  # (ndof, n_modes) mass-orthonormal mode shapes
    iterations: Optional[int] = None  # solver iterations (None: direct)


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
    theta, y, iters = lobpcg_standard(B, X0, m=maxiter, tol=tol)
    lam = sigma - theta
    order = jnp.argsort(lam)
    lam = lam[order]
    y = y[:, order]
    modes = y * dm[:, None]
    valid = lam > 1e-6
    omega = jnp.sqrt(jnp.where(valid, lam, 1.0)) * valid
    return ModalResult(omega=omega, modes=modes, iterations=int(iters))


def modal_shift_invert(
    K_solve: Callable[[jnp.ndarray], jnp.ndarray],
    m_diag,
    free_mask,
    n_modes: int = 10,
    tol: float = 1e-8,
    maxiter: int = 100,
    key=None,
    dtype=None,
    solver_state=None,
    jit_inner: bool = True,
) -> ModalResult:
    """Shift-invert Lanczos for the smallest modes of K v = lambda M v.

    The production large-scale modal solver (BASELINE.json "first-10-modes
    eig time"; replaces the reference's O(n^3)-per-iteration unshifted QR on
    inv(M)K, BeamSolver.py:440-481). With diagonal (lumped) mass M = D^2 the
    generalized problem symmetrizes to A = D^-1 K D^-1; Lanczos runs on the
    INVERTED operator

        T = A^-1 = D K^-1 D      (each apply = one inner K-solve)

    whose LARGEST eigenvalues mu = 1/lambda are the smallest physical modes
    — exactly where Lanczos converges first, typically in ~(2-4)x n_modes
    iterations regardless of problem size. The inner solve (`K_solve`) is a
    caller-jitted preconditioned CG — multigrid-preconditioned on the
    structured operator — so the whole solver is O(n_iters) MG-PCG solves.

    Full reorthogonalization (two classical Gram-Schmidt passes against the
    whole basis) keeps the basis orthonormal in float32; the basis buffer is
    (maxiter, ndof) on device (~0.5 GB at 1.4M DOF, maxiter 80).

    Args:
      K_solve: b -> approx K^-1 b on free DOFs (constrained operator solve;
        fixed DOFs pass through, but D zeroes them so any behavior there is
        inert). Accuracy of the inner solve bounds the eigenvalue accuracy.
      m_diag: (ndof,) lumped mass diagonal (same DOF layout as K_solve).
      free_mask: (ndof,) 1.0 free / 0.0 fixed.
      tol: Lanczos convergence — residual bound beta_k |s_k| <= tol * mu for
        each of the first n_modes Ritz pairs.
      solver_state: optional (op, precond, inner_tol, inner_maxiter) with op
        and precond registered PYTREES. When given, the whole Lanczos
        iteration (inner PCG + reorthogonalization + append) runs as ONE
        module-level jitted program with the state as arguments — cached
        ACROSS calls (a per-call closure jit re-traces and re-loads the big
        executable every call, measured at tens of seconds), and only two
        scalar readbacks per iteration. K_solve is then only used for
        restarts/probes.
    Returns:
      ModalResult: omega (rad/s, ascending) and mass-orthonormal mode shapes
      (v^T M v = I), fixed DOFs exactly zero.
    """
    s_host = np.asarray(free_mask, dtype=np.float64)
    m_host = np.asarray(m_diag, dtype=np.float64)
    d_host = np.sqrt(np.where(m_host > 0, m_host, 0.0)) * s_host
    dinv_host = np.where(d_host > 0, 1.0 / np.where(d_host > 0, d_host, 1.0), 0.0)

    ndof = m_host.shape[0]
    if dtype is None:
        dtype = K_solve(jnp.zeros(ndof)).dtype
    d = jnp.asarray(d_host, dtype=dtype)

    # ONE jitted program per Lanczos iteration (inner solve + two-pass
    # reorthogonalization + normalized append), with the basis buffer
    # donated. The naive formulation dispatched ~8 separate device programs
    # per iteration (each relay round trip ~30 ms). With solver_state the
    # program is MODULE-LEVEL (cached across calls); otherwise it closes
    # over K_solve and pays a per-call retrace.
    if solver_state is not None:
        s_op, s_pre, s_tol, s_maxit = solver_state

        def lanczos_iter(V, j, d_):
            return _lanczos_iter_pcg(V, j, d_, s_op, s_pre,
                                     inner_tol=s_tol, inner_maxiter=s_maxit)
    elif jit_inner:
        @partial(jax.jit, donate_argnums=0)
        def lanczos_iter(V, j, d_):
            w = d_ * K_solve(d_ * V[j])
            w, alpha, beta = _lanczos_orth_step(V, w, j)
            safe = jnp.where(beta > 0, beta, 1.0)
            V = V.at[j + 1].set(w / safe)
            return V, alpha, beta
    else:
        # eager iteration for HOST-ORCHESTRATED inner solvers (e.g. the
        # distributed pcg_halo wrapper, femx.parallel.modal) — K_solve is
        # not traceable; the recurrence/orthogonalization steps still run
        # as jitted helpers
        _orth_j = jax.jit(_lanczos_orth_step)

        def lanczos_iter(V, j, d_):
            w = d_ * K_solve(d_ * V[j])
            w, alpha, beta = _orth_j(V, w, j)
            safe = jnp.where(beta > 0, beta, 1.0)
            V = V.at[j + 1].set(w / safe)
            return V, alpha, beta

    orth = jax.jit(_lanczos_orth_step)
    set_row = jax.jit(
        lambda V, j, v: V.at[j].set(v), donate_argnums=0
    )

    key = jax.random.PRNGKey(0) if key is None else key
    V = jnp.zeros((maxiter, ndof), dtype=dtype)
    key, sub = jax.random.split(key)
    v0 = jax.random.normal(sub, (ndof,), dtype=dtype) * jnp.asarray(
        s_host, dtype=dtype
    )
    v0 = v0 / jnp.linalg.norm(v0)
    V = set_row(V, 0, v0)

    alphas: list = []
    betas: list = []  # betas[j] links v_j -> v_{j+1}
    k_done = 0
    restarts = 0
    for j in range(maxiter):
        V, alpha, beta = lanczos_iter(V, j, d)
        alphas.append(float(alpha))
        betas.append(float(beta))
        k_done = j + 1

        # Ritz decomposition of the k x k tridiagonal (host, tiny).
        Tk = np.diag(np.array(alphas))
        if k_done > 1:
            off = np.array(betas[: k_done - 1])
            Tk += np.diag(off, 1) + np.diag(off, -1)
        mu, S = np.linalg.eigh(Tk)
        mu, S = mu[::-1], S[:, ::-1]  # descending: smallest lambda first
        if k_done >= n_modes:
            res = betas[-1] * np.abs(S[-1, :n_modes])
            if np.all(res <= tol * np.maximum(np.abs(mu[:n_modes]), 1e-300)):
                break

        scale = max(abs(a) for a in alphas) + 1e-300
        if beta <= 1e-12 * scale:
            # happy breakdown: restart with a fresh vector orthogonal to V
            restarts += 1
            if restarts > 3 or k_done + 1 >= maxiter:
                break
            key, sub = jax.random.split(key)
            vnew = jax.random.normal(sub, (ndof,), dtype=dtype) * jnp.asarray(
                s_host, dtype=dtype
            )
            vnew, _, nrm = orth(V, vnew, j)
            V = set_row(V, j + 1, vnew / nrm)
            betas[-1] = 0.0
        else:
            if j + 1 >= maxiter:
                break
            # normalized row j+1 already written inside lanczos_iter

    n_keep = min(n_modes, k_done)
    S_top = jnp.asarray(S[:, :n_keep], dtype=dtype)  # (k, n_keep)
    W = V[:k_done].T @ S_top  # (ndof, n_keep) Ritz vectors of T
    modes = W * jnp.asarray(dinv_host, dtype=dtype)[:, None]
    lam = 1.0 / np.maximum(mu[:n_keep], 1e-300)
    # reference filter semantics (BeamSolver.py:448) — but ALSO require
    # mu > 0: inexact inner K-solves can produce a non-positive Ritz value,
    # whose 1/mu would otherwise pass the lam filter as a garbage
    # astronomically-large frequency (advisor finding, round 2).
    valid = (mu[:n_keep] > 0) & (lam > 1e-6)
    omega = np.sqrt(np.where(valid, lam, 1.0)) * valid
    return ModalResult(
        omega=jnp.asarray(omega, dtype=dtype), modes=modes, iterations=k_done
    )


@partial(jax.jit, donate_argnums=0,
         static_argnames=("inner_tol", "inner_maxiter"))
def _lanczos_iter_pcg(V, j, d, op, precond, *, inner_tol, inner_maxiter):
    """One shift-invert Lanczos iteration with an inner PCG solve.

    Module-level jit: op/precond enter as pytree ARGUMENTS, so the compiled
    executable is shared across modal calls with the same structures."""
    from femx.solve.cg import pcg

    w = d * pcg(op.apply_constrained, d * V[j], M_inv_diag=precond,
                tol=inner_tol, maxiter=inner_maxiter).x
    w, alpha, beta = _lanczos_orth_step(V, w, j)
    safe = jnp.where(beta > 0, beta, 1.0)
    V = V.at[j + 1].set(w / safe)
    return V, alpha, beta


def _lanczos_orth_step(V, w, j):
    """Two-pass classical Gram-Schmidt of w against all rows of V (rows past
    the current iterate are zero, so they project to nothing). Returns the
    orthogonalized w, alpha = <v_j, w_in> (with second-pass correction), and
    beta = ||w_out||."""
    p1 = V @ w
    w = w - V.T @ p1
    p2 = V @ w
    w = w - V.T @ p2
    alpha = p1[j] + p2[j]
    beta = jnp.linalg.norm(w)
    return w, alpha, beta


def eig_residuals(k_apply, m_diag, omega, modes) -> jnp.ndarray:
    """Per-mode relative algebraic eigen-residuals for the pencil (K, M).

    eta_i = ||K v_i - lam_i M v_i||_{M^-1} / (lam_i ||v_i||_M) with
    lam_i = omega_i^2 and M the (SPD diagonal) lumped mass. For a symmetric
    pencil this is a backward-error bound: some exact eigenvalue lam* has
    |lam_i - lam*| / lam_i <= eta_i, so the relative FREQUENCY error is
    bounded by ~eta_i / 2 (f = sqrt(lam) / 2pi). This is the error bar the
    large-scale Lanczos frequencies ship with (BENCH modal_f1_err_est) —
    dense cross-validation is only possible at small n
    (tests/test_modal_structured.py), the residual bound holds at ANY n.

    Evaluate k_apply in float64 (pass the f64 operator) so the bound
    reflects the eigensolve, not the residual evaluation's own rounding.

    CAVEAT (measured at 1.39M DOF): this bound is FIRST-ORDER in the
    mode-shape error — a shape perturbation epsilon along a high eigenvalue
    lam_big contributes ~epsilon * lam_big / lam to eta, so with f32 inner
    K-solves (true-residual ~1e-2 at scale) and a pencil spectral range of
    ~1e6 the bound saturates at O(1e3+) even though the eigenVALUES are
    accurate to ~1e-3 (the Rayleigh quotient is SECOND-order in shape
    error). Use rayleigh_error_estimates for a practical error bar; eta is
    the rigorous certificate when inner solves are tight (see
    tests/test_modal_structured.py where eta < 1e-5 bounds the true error).
    """
    m = jnp.asarray(m_diag)
    m_safe = jnp.where(m > 0, m, 1.0)
    sq = jnp.sqrt(m_safe)
    lam = jnp.asarray(omega, dtype=m.dtype) ** 2
    etas = []
    for i in range(modes.shape[1]):
        v = jnp.asarray(modes[:, i], dtype=m.dtype)
        r = k_apply(v) - lam[i] * m * v
        num = jnp.linalg.norm(r / sq)
        den = lam[i] * jnp.linalg.norm(sq * v)
        etas.append(num / jnp.where(den > 0, den, 1.0))
    return jnp.stack(etas)


def rayleigh_error_estimates(k_apply, m_diag, omega, modes):
    """(rho, rel_err): f64 Rayleigh quotients of the modes and their
    relative deviation from the solver's eigenvalues.

    rho_i = (v_i^T K v_i) / (v_i^T M v_i) evaluated through the f64
    operator is a SECOND-order-accurate eigenvalue estimate in the
    mode-shape error, so |rho_i - lam_i| / lam_i is a practical error bar
    for the reported eigenvalue (and ~half that for the frequency) even
    when f32 inner solves leave first-order noise in the shapes — the
    regime where eig_residuals' rigorous bound saturates (see its caveat).
    """
    m = jnp.asarray(m_diag)
    lam = jnp.asarray(omega, dtype=m.dtype) ** 2
    rhos, errs = [], []
    for i in range(modes.shape[1]):
        v = jnp.asarray(modes[:, i], dtype=m.dtype)
        num = jnp.vdot(v, k_apply(v))
        den = jnp.vdot(v, m * v)
        rho = num / jnp.where(den > 0, den, 1.0)
        rhos.append(rho)
        errs.append(jnp.abs(rho - lam[i]) / jnp.where(lam[i] > 0, lam[i], 1.0))
    return jnp.stack(rhos), jnp.stack(errs)


def shift_invert_residuals(k_solve_accurate, m_diag, omega, modes):
    """Relative eigenvalue error bounds via the INVERSE-operator residual.

    Work in the symmetric similarity B = D K^-1 D with D = sqrt(M): the
    Lanczos modes satisfy B y ~ mu y with y = D v, mu = 1/lam. The Ritz
    bound |mu - mu*| <= ||B y - mu y|| / ||y|| then gives
    |lam - lam*| / lam ~ |mu - mu*| / mu = eta_inv.

    Unlike the direct (K, M) residual (eig_residuals), high-frequency
    mode-shape noise is DAMPED by K^-1 here instead of amplified by K, so
    the bound stays sharp for modes computed with inexact f32 inner solves
    (measured at 1.39M DOF: direct bound ~1e3, this one ~1e-4).

    k_solve_accurate must solve K x = b to a true residual far below the
    target bound (e.g. the adaptive-refined MG-PCG at outer_tol 1e-9);
    cost is one accurate solve per mode.

    Returns (eta_inv, mu): per-mode relative eigenvalue error bounds and
    the inverse Ritz values.
    """
    m = jnp.asarray(m_diag, dtype=jnp.float64)
    d = jnp.sqrt(jnp.where(m > 0, m, 0.0))
    lam = jnp.asarray(omega, dtype=jnp.float64) ** 2
    etas, mus = [], []
    for i in range(modes.shape[1]):
        v = jnp.asarray(modes[:, i], dtype=jnp.float64)
        y = d * v
        ynorm = jnp.linalg.norm(y)
        mu = 1.0 / jnp.where(lam[i] > 0, lam[i], 1.0)
        By = d * jnp.asarray(k_solve_accurate(m * v), dtype=jnp.float64)
        r = By - mu * y
        eta_abs = jnp.linalg.norm(r) / jnp.where(ynorm > 0, ynorm, 1.0)
        etas.append(eta_abs / mu)
        mus.append(mu)
    return jnp.stack(etas), jnp.stack(mus)


def shift_invert_refine(k_solve_accurate, m_diag, modes):
    """Subspace refinement of computed modes through the inverse operator:
    one inverse-iteration step + Rayleigh-Ritz, with per-mode Ritz bounds.

    Why this beats per-mode residual checks (shift_invert_residuals): the
    f32-Lanczos mode shapes carry ~1e-3 noise, which caps the per-mode
    Ritz bound near 1e-2 even though the eigenvalues themselves are far
    better. Two standard fixes compose here:

      * inverse iteration  W = K^-1 M V  damps the noise component at
        eigenvalue lam_j by lam_i/lam_j — high-frequency junk (the bulk of
        the f32 noise, lam_j up to ~6e6x lam_1) is crushed;
      * Rayleigh-Ritz on span(W) in the symmetric similarity
        B = D K^-1 D (D = sqrt(lumped M)) optimally rotates WITHIN the
        subspace, which is what per-mode quotients cannot do for clustered
        modes (the flagship's modes 1/2 are 0.07% apart).

    Cost: 2k accurate solves (K^-1 applied to M V and to M W) — the same
    compiled adaptive-refined MG-PCG program throughout.

    Returns (omega_ref, eta, modes_ref): refined angular frequencies
    (descending-mu Ritz order = ascending frequency), first-order relative
    eigenvalue error BOUNDS eta_i = ||B y_i - th_i y_i|| / (||y_i|| th_i)
    (the actual eigenvalue error is quadratic in the subspace angle, so
    typically far below eta), and the refined mode shapes.
    """
    m = jnp.asarray(m_diag, dtype=jnp.float64)
    d = jnp.sqrt(jnp.where(m > 0, m, 0.0))
    V = jnp.asarray(modes, dtype=jnp.float64)
    k = V.shape[1]

    def solve_normed(b):
        # Normalize the RHS before the solve (K^-1 is homogeneous). The
        # un-normalized RHS m*W ~ m*V/lambda_1 has entries ~1e-8, and the
        # inner CG's squared dot products then cross the ~1e-38 underflow
        # floor of the TPU's double-double f64 emulation (f32 EXPONENT
        # range): measured on-chip, the solve stagnated at 2.4e-3 relative
        # residual after 4000 iterations while the identical f64 solve on
        # CPU converged in 217. Unit-norm RHS keeps every CG intermediate
        # in range on both backends.
        nb = jnp.linalg.norm(b)
        s = jnp.where(nb > 0, nb, 1.0)
        return s * jnp.asarray(k_solve_accurate(b / s), jnp.float64)

    # inverse-iteration step (k solves)
    W = jnp.stack([solve_normed(m * V[:, i]) for i in range(k)], axis=1)
    # B-space basis and its image under B (k more solves)
    Y = d[:, None] * W
    BY = jnp.stack([d * solve_normed(m * W[:, i]) for i in range(k)], axis=1)
    # k x k Ritz algebra on HOST numpy: the axon TPU backend computes f64
    # eigh internally in f32 (measured: 40% eigenvalue error on a 10x10 SPD
    # matrix with entries ~1e-20 — exactly the scale of G here, since
    # Y ~ K^-1 M V ~ 1/lambda), which silently destroyed the whitening and
    # returned garbage refined frequencies. The tall (ndof x k) matmuls
    # stay on device — at Precision.HIGHEST: the TPU's default bf16
    # multiplication passes put ~4e-3 relative noise into the Gram
    # matrices, and with cond(G) ~ (lam_k/lam_1)^2 ~ 1e5 the whitening
    # amplifies that into order-unity Ritz garbage (measured on the 1.39M
    # flagship: refined f1 came out 28x low with default precision).
    hi = jax.lax.Precision.HIGHEST
    G = np.asarray(jnp.matmul(Y.T, Y, precision=hi), dtype=np.float64)
    H = np.asarray(jnp.matmul(Y.T, BY, precision=hi), dtype=np.float64)
    H = 0.5 * (H + H.T)  # exact-arithmetic symmetric; kill solve-tol skew
    # generalized symmetric Ritz: H c = th G c via G^-1/2 whitening
    gw, gv = np.linalg.eigh(G)
    gw = np.maximum(gw, gw[-1] * 1e-14)
    Gih = gv @ np.diag(gw ** -0.5) @ gv.T
    th, C = np.linalg.eigh(Gih @ H @ Gih)
    order = np.argsort(-th)  # descending mu = ascending frequency
    th = th[order]
    C = (Gih @ C)[:, order]  # G-orthonormal coefficients
    Cd = jnp.asarray(C, dtype=jnp.float64)
    # residuals of the refined Ritz pairs, evaluated with the ALREADY
    # computed images (no further solves): r = BY c - th * Y c
    Yc = jnp.matmul(Y, Cd, precision=hi)
    Rc = jnp.matmul(BY, Cd, precision=hi) - Yc * jnp.asarray(th)[None, :]
    eta = (np.asarray(jnp.linalg.norm(Rc, axis=0))
           / np.maximum(np.asarray(jnp.linalg.norm(Yc, axis=0)), 1e-300)
           ) / np.abs(th)
    omega_ref = np.sqrt(1.0 / np.maximum(th, 1e-300))
    modes_ref = jnp.matmul(W, Cd, precision=hi)
    return jnp.asarray(omega_ref), jnp.asarray(eta), modes_ref


def solid_modal_structured(
    op,
    preconditioner,
    rho: float,
    n_modes: int = 10,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 200,
    tol: float = 1e-6,
    maxiter: int = 100,
) -> ModalResult:
    """First n_modes natural frequencies/shapes of a structured solid box.

    Ties together the structured operator's HRZ-lumped mass
    (StructuredSolidOperator.lumped_mass_diagonal), a jitted MG-PCG inner
    solve, and shift-invert Lanczos. Everything is in the operator's
    INTERNAL DOF layout; use op.to_global on the returned modes.
    """
    from femx.solve.cg import pcg
    from femx.solve.multigrid import StructuredMultigrid

    m_diag = op.lumped_mass_diagonal(rho)

    if isinstance(preconditioner, StructuredMultigrid):
        # pytree-argument form: keeps the MG arrays out of the compiled
        # program's constants AND lets the per-iteration Lanczos program be
        # a module-level jit cached across calls
        @jax.jit
        def _ks(b, op_, mg_):
            return pcg(op_.apply_constrained, b, M_inv_diag=mg_,
                       tol=inner_tol, maxiter=inner_maxiter).x

        def k_solve(b):
            return _ks(b, op, preconditioner)

        state = (op, preconditioner, float(inner_tol), int(inner_maxiter))
    else:
        @jax.jit
        def k_solve(b):
            return pcg(
                op.apply_constrained, b, M_inv_diag=preconditioner,
                tol=inner_tol, maxiter=inner_maxiter,
            ).x

        state = None

    return modal_shift_invert(
        k_solve, m_diag, op.free_mask_host, n_modes=n_modes, tol=tol,
        maxiter=maxiter, dtype=op.Kcell.dtype, solver_state=state,
    )


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
