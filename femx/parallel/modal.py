"""Distributed solid modal analysis: shift-invert Lanczos whose inner
K-solves run z-slab-distributed (femx.parallel.halo's MG-PCG).

Composes femx.modal.modal_shift_invert (the production large-scale modal
solver) with pcg_halo + DistributedMultigrid: each Lanczos iteration's
inner solve is one distributed MG-PCG call (plane-only communication; the
traced-solver cache inside pcg_halo keeps repeated calls compile-free),
and the Lanczos recurrence/reorthogonalization stays host-orchestrated in
the full internal layout — identical math to the single-device path, so
frequencies match to inner-solve accuracy (tests/test_parallel_modal.py).

Reference context: the reference has no solid modal at all (beam-only QR,
BeamSolver.py:440-481); femx's single-device shift-invert is a round-2
extension and this removes its last single-chip bound.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from femx.modal import ModalResult, modal_shift_invert
from femx.parallel.halo import DistributedMultigrid, pcg_halo


def modal_shift_invert_halo(
    dmg: DistributedMultigrid,
    m_diag_internal,
    free_mask_internal,
    n_modes: int = 10,
    tol: float = 1e-4,
    maxiter: int = 100,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 4000,
    preconditioner=None,
) -> ModalResult:
    """First n_modes of K v = lambda M v with distributed inner solves.

    Args:
      dmg: DistributedMultigrid over the constrained structured operator
        (its fine level IS the K being inverted).
      m_diag_internal: (ndof,) lumped-mass diagonal, internal layout.
      free_mask_internal: (ndof,) 1/0 free mask, internal layout.
      preconditioner: a dmg.preconditioner() factory to share with other
        pcg_halo callers (its identity keys the traced-solver cache, so
        sharing one avoids a second compile); built here when None.
    Returns femx.modal.ModalResult in the INTERNAL DOF layout (callers
    convert with op.to_global per mode, as with modal_shift_invert).
    """
    # built once; reused by every inner solve
    prec = dmg.preconditioner() if preconditioner is None else preconditioner

    def k_solve(b):
        x, _it, res, ok = pcg_halo(
            dmg.halo, np.asarray(b), tol=inner_tol,
            maxiter=inner_maxiter, preconditioner=prec)
        if not ok:
            # A finite-but-large residual is just as poisonous to the
            # Lanczos recurrence as a NaN: an inner solve that stalled at
            # maxiter (or tripped the rz>0 guard) is NOT K^-1 b, and
            # accepting it yields wrong frequencies with no warning.
            # ~10x tol of slack tolerates harmless last-iteration jitter.
            if not np.isfinite(res) or res > 10 * inner_tol:
                raise RuntimeError(
                    f"distributed inner solve did not converge "
                    f"(residual {res:.3e}, tol {inner_tol:.1e}); raise "
                    f"inner_maxiter or loosen inner_tol")
        return jnp.asarray(x)

    return modal_shift_invert(
        k_solve, m_diag_internal, free_mask_internal,
        n_modes=n_modes, tol=tol, maxiter=maxiter,
        dtype=dmg.mg.levels[0].op.Kcell_host.dtype, jit_inner=False)
