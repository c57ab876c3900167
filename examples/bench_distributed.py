"""Distributed scaling artifact: the public devices=N path at 1/2/4/8 devices.

Runs the exact user-facing call — ``SolidReactionAnalysis(mesh, ...,
devices=N).run_simulation()`` — on a FIXED problem over an increasing device
count and records per-point: iterations, solve wall time, solution agreement
vs the single-device answer, and the global equilibrium residual. One JSONL
line per point to ``examples/distributed_results.jsonl`` and stdout. (The
surface-sized-collective contract — the halo apply communicates slab
SURFACES, never volumes — is HLO-scan-asserted in tests/test_tg_lattice.py
and tests/test_halo.py.)

This is multi-chip evidence a reviewer can reproduce WITHOUT hardware: on a
CPU-only host it provisions an 8-device virtual mesh in-process (the same
recipe as tests/conftest.py). On a real multi-chip TPU slice it runs on the
actual devices and the wall times become meaningful scaling numbers; on the
virtual mesh the iteration-count invariance and payload scans are the
signal (wall times of 8 virtual devices on one core measure nothing).

Equality/iteration-parity tests live in tests/test_distributed_pipeline.py
and tests/test_halo.py; this artifact records the NUMBERS so comm
regressions (e.g. a collective ballooning to volume size) show up in review.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # Self-provision an 8-device virtual CPU mesh in a subprocess by default
    # (same recipe as tests/conftest.py). NEVER probe jax.devices() on the
    # decision path — initializing the axon TPU backend hangs indefinitely
    # when the relay tunnel is down. On a real multi-chip slice, run with
    # FEMX_DIST_BACKEND=native to use the in-process backend's devices.
    if (os.environ.get("FEMX_DIST_BACKEND", "virtual") == "virtual"
            and os.environ.get("_FEMX_DIST_CHILD") != "1"):
        import subprocess

        env = dict(os.environ)
        env["_FEMX_DIST_CHILD"] = "1"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
                "import runpy; runpy.run_path(%r, run_name='__main__')"
                % os.path.abspath(__file__))
        raise SystemExit(subprocess.run(
            [sys.executable, "-c", code], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ).returncode)

    import numpy as np
    import jax

    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10_from_cells

    cells = tuple(int(v) for v in os.environ.get(
        "FEMX_DIST_CELLS", "8,8,32").split(","))
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    X, Y = cells[0] * h, cells[1] * h
    fixes = [{"pos_x": x, "pos_y": y, "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for x, y in [(0, 0), (0, Y), (X, 0), (X, Y)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": X / 2, "force_y_pstn": Y / 2,
               "force_z_pstn": zmax}]

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "distributed_results.jsonl")
    results = []
    u_ref = None
    backend = jax.default_backend()
    virtual = backend == "cpu"
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        t0 = time.perf_counter()
        fa = SolidReactionAnalysis(
            mesh, forces, fixes, E=2e11, v=0.3, verbose=False,
            cg_tol=1e-8, devices=None if ndev == 1 else ndev)
        fa.run_simulation()
        wall = time.perf_counter() - t0
        if u_ref is None:
            u_ref = fa.u
        scale = float(np.abs(u_ref).max()) + 1e-30
        rec = {
            "devices": ndev,
            "backend": backend,
            "virtual_mesh": virtual,
            "cells": list(cells),
            "ndof": 3 * mesh.num_nodes,
            "method": fa.solve_info.get("method"),
            "iterations": fa.solve_info.get("iterations"),
            "residual": fa.solve_info.get("residual"),
            "wall_s": round(wall, 3),
            "rel_err_vs_1dev": float(np.abs(fa.u - u_ref).max()) / scale,
            "equilibrium_inf": float(np.abs(fa.equilibrium_residual()).max()),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # invariance checks a reviewer can rely on
    its = [r["iterations"] for r in results if r["devices"] > 1]
    assert its, "no distributed points ran"
    assert max(its) - min(its) <= 2, f"iteration count varies with devices: {its}"
    assert all(r["rel_err_vs_1dev"] < 1e-6 for r in results), results
    with open(out_path, "w") as fh:
        for r in results:
            fh.write(json.dumps(r) + "\n")
    log(f"wrote {out_path} ({len(results)} points); distributed iterations "
        f"{its} (device-count invariant), max rel err vs single device "
        f"{max(r['rel_err_vs_1dev'] for r in results):.2e}")


if __name__ == "__main__":
    main()
