"""Native runtime library tests (ctypes tokenizer + parser integration)."""

import io
import time

import numpy as np
import pytest

from femx import _native
from femx.mesh import box_tet10, read_msh, write_msh


def test_parse_numbers_correctness():
    text = " 1 2.5 -3e4\n7 0.125\t42 "
    out = _native.parse_numbers(text)
    np.testing.assert_allclose(out, [1, 2.5, -3e4, 7, 0.125, 42])


def test_parse_numbers_empty():
    assert _native.parse_numbers("  \n ").size == 0


def test_native_builds_here():
    # the CI image has g++; the library must build and load
    assert _native.native_available()


def test_large_roundtrip_uses_fast_path():
    mesh = box_tet10(0.8, 0.2, 0.8, 0.05)  # ~10k nodes, 6k tets
    buf = io.StringIO()
    write_msh(buf, mesh)
    text = buf.getvalue()
    t0 = time.perf_counter()
    mesh2 = read_msh(text)
    dt = time.perf_counter() - t0
    np.testing.assert_allclose(mesh2.points, mesh.points)
    np.testing.assert_array_equal(mesh2.cells["tetra10"], mesh.cells["tetra10"])
    # ~500k tokens; the native path parses this in well under a second
    assert dt < 5.0
