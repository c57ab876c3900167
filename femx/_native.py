"""Loader for the femx native runtime library (ctypes; no pybind11).

Builds native/libfemx_native.so on first use when a toolchain is present,
and degrades silently to the pure-Python/numpy paths when it isn't. Exposes:

  parse_numbers(text) -> np.ndarray[float64]
    whitespace-separated ASCII numbers, C++ strtod fast path; numpy
    `fromstring` mid-fallback; Python split() last resort.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfemx_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.femx_count_tokens.restype = ctypes.c_long
        lib.femx_count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.femx_parse_doubles.restype = ctypes.c_long
        lib.femx_parse_doubles.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ]
        _lib = lib
    except OSError as e:  # built for another arch, corrupt, ...
        warnings.warn(f"femx native library failed to load: {e}")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_numbers(text: str) -> np.ndarray:
    """All whitespace-separated numbers in `text` as float64."""
    lib = _load()
    if lib is not None:
        raw = text.encode()
        n = lib.femx_count_tokens(raw, len(raw))
        out = np.empty(n, dtype=np.float64)
        got = lib.femx_parse_doubles(
            raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
        )
        if got >= 0:
            return out[:got]
        # fall through on malformed token
    # np.array(split()) raises on malformed tokens — unlike the legacy
    # np.fromstring(sep=" ") path, which silently truncated at the first bad
    # token and surfaced later as a confusing IndexError downstream.
    return np.array(text.split(), dtype=np.float64)
