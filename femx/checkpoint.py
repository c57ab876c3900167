"""Checkpoint / resume for long-running iterative solves.

The reference has no checkpointing of any kind (SURVEY.md §5 — persistence
is a .msh file and .docx reports). For production-scale runs femx adds
solver-state checkpointing: the chunked CG driver periodically persists
(x, iteration count, residual history) and transparently resumes after a
crash or preemption — the single-host analog of elastic training recovery.
Long while_loops are also what watchdogs kill on shared TPU runtimes, so
chunking doubles as a liveness mechanism (observed: >10k-iteration loops can
fault the device worker; 500-iteration chunks are safe).

Format: .npz (arrays) + sidecar JSON metadata; atomic via rename.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from femx.solve.cg import CGResult, pcg


def save_state(path: str, arrays: dict, meta: Optional[dict] = None) -> None:
    """Atomically persist arrays (+ JSON-able metadata) to `path`.npz/.json."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")  # .npz so savez writes in place
    os.close(fd)
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, path + ".npz")
    if meta is not None:
        with open(path + ".json.tmp", "w") as f:
            json.dump(meta, f)
        os.replace(path + ".json.tmp", path + ".json")


def load_state(path: str):
    """Returns (arrays dict, meta dict) or (None, None) if absent."""
    if not os.path.exists(path + ".npz"):
        return None, None
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return arrays, meta


def pcg_checkpointed(
    A: Callable,
    b,
    M_inv=None,
    tol: float = 1e-8,
    maxiter: int = 50000,
    chunk: int = 500,
    checkpoint_path: Optional[str] = None,
    verbose: bool = False,
    solve_chunk: Optional[Callable] = None,
) -> CGResult:
    """Chunked, checkpointable CG.

    Runs `chunk`-iteration jitted CG segments with warm restarts, persisting
    (x, total_iterations) to `checkpoint_path` between segments and resuming
    from it when present. Restart-on-chunk also resets CG's recurrences,
    which in float32 doubles as a stagnation recovery.

    `solve_chunk(b, x0) -> CGResult` may be supplied (e.g. a pre-jitted
    closure); otherwise one is built from (A, M_inv).
    """
    import jax

    b = jnp.asarray(b)
    x = jnp.zeros_like(b)
    done = 0
    if checkpoint_path:
        arrays, meta = load_state(checkpoint_path)
        if arrays is not None and arrays["x"].shape == b.shape:
            x = jnp.asarray(arrays["x"], dtype=b.dtype)
            done = int(meta.get("iterations", 0))
            if verbose:
                print(f"[femx.checkpoint] resumed at iteration {done}")

    if solve_chunk is None:
        solve_chunk = jax.jit(
            lambda fv, x0: pcg(A, fv, M_inv_diag=M_inv, x0=x0, tol=tol, maxiter=chunk)
        )

    res = None
    while done < maxiter:
        res = solve_chunk(b, x)
        x = res.x
        done += int(res.iterations)
        if checkpoint_path:
            save_state(
                checkpoint_path,
                {"x": np.asarray(x)},
                {"iterations": done, "residual": float(res.residual_norm)},
            )
        if verbose:
            print(f"[femx.checkpoint] {done} iters, residual {float(res.residual_norm):.3e}")
        if bool(res.converged) or int(res.iterations) == 0:
            break
    return CGResult(
        x=x,
        iterations=jnp.asarray(done),
        residual_norm=res.residual_norm if res else jnp.asarray(np.inf),
        converged=res.converged if res else jnp.asarray(False),
    )
