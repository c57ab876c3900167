"""Global configuration: precision policy and reference-compatibility flags.

The reference app (euler8511/FEM-calculator) runs entirely in numpy float64.
femx enables ``jax_enable_x64`` at import so host/CPU test runs reproduce the
reference numerics bit-closely; TPU execution paths may opt into float32 (with
iterative refinement in the solvers) by passing an explicit ``dtype``.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# Must happen before any jnp array is created anywhere in femx.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: on this deployment a single solver program
# costs minutes of (remote) compilation; caching makes repeat runs start in
# seconds. Opt out with FEMX_COMPILE_CACHE=0 or point it elsewhere.
_cache_dir = os.environ.get("FEMX_COMPILE_CACHE", os.path.expanduser("~/.cache/femx_jax"))
if _cache_dir not in ("0", "off", ""):
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs

_DEFAULT_DTYPE = jnp.float64 if os.environ.get("FEMX_DTYPE", "float64") == "float64" else jnp.float32


def host_compute():
    """Context manager placing jax computations on the host CPU device.

    Setup-stage math (single-cell stiffness, small dense coarse factors)
    is tiny but, run on the default backend, costs minutes of *remote*
    compilation on the axon-tunneled TPU — and f64 is emulated there.
    Wrapping it in `with host_compute():` keeps it a local sub-second CPU
    compile. No-op (null context) when no separate CPU device exists.
    """
    import contextlib

    try:
        if jax.default_backend() != "cpu":
            return jax.default_device(jax.devices("cpu")[0])
    except Exception:
        pass
    return contextlib.nullcontext()


def default_dtype():
    """The framework-wide default floating dtype (float64 unless overridden)."""
    return _DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = jnp.dtype(dtype)


@dataclasses.dataclass(frozen=True)
class ReferenceCompat:
    """Opt-in switches reproducing documented quirks of the reference app.

    Attributes:
      tet10_quadrature_weight_bug: the reference integrates the Tet10 stiffness
        with Gauss weight w=1/4 per point instead of the correct 1/24
        (ReactionSolver.py:124,146), stiffening K by exactly 6x. Displacements
        scale by 1/6; reactions are unaffected (R = K u). femx defaults to the
        correct w=1/24; set True to bit-match the reference displacement field.
      hardcoded_beam_density: the reference ignores its density input widget and
        uses rho=7850 for the lumped mass matrix (BeamSolver.py:376). femx
        honors the user-provided density; set True to force 7850.
    """

    tet10_quadrature_weight_bug: bool = False
    hardcoded_beam_density: bool = False

    @property
    def tet10_gauss_weight(self) -> float:
        # Correct weight for the 4-point rule on the reference tetrahedron
        # (volume 1/6) is 1/24 per point; the reference uses 1/4.
        return 0.25 if self.tet10_quadrature_weight_bug else 1.0 / 24.0


DEFAULT_COMPAT = ReferenceCompat()
