"""Tracing & profiling utilities.

The reference's only observability is numbered stage prints
(ReactionSolver.py:61,117,156,198,237,303). femx keeps those (pipeline
`verbose` logs + stage_times dicts) and adds:

- `stage(name)`: wall-time context manager accumulating into a registry;
- `profile_trace(dir)`: jax.profiler trace wrapper (TensorBoard-viewable)
  for device-level kernel timing;
- `timeit(fn, *args)`: compile-aware timing helper that separates first-call
  (trace+compile) cost from steady-state cost — essential on this target,
  where remote-compile latency is minutes while steady-state is sub-ms.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax

_STAGE_TIMES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def stage(name: str, registry: Optional[Dict[str, list]] = None, verbose: bool = False):
    """Accumulating wall-time stage timer."""
    reg = _STAGE_TIMES if registry is None else registry
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        reg[name].append(dt)
        if verbose:
            print(f"[femx] {name}: {dt:.3f}s")


def stage_report(registry: Optional[Dict[str, list]] = None) -> Dict[str, dict]:
    reg = _STAGE_TIMES if registry is None else registry
    return {
        k: {"calls": len(v), "total_s": sum(v), "mean_s": sum(v) / len(v)}
        for k, v in reg.items()
        if v
    }


def reset_stages(registry: Optional[Dict[str, list]] = None) -> None:
    (_STAGE_TIMES if registry is None else registry).clear()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/femx_trace"):
    """Device-level profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, reps: int = 5, **kwargs) -> dict:
    """Compile-aware timing: {'first_s': trace+compile+run, 'steady_s': best
    of `reps` warm runs}. Blocks on results (handles async dispatch)."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return {"first_s": first, "steady_s": best, "output": out}
