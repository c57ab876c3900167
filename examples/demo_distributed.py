"""Multi-chip femx in one page: statics + modal on both mesh classes.

Runs the PUBLIC pipeline calls a user makes (`devices=8`) against their
single-device equivalents and prints iteration counts and parity errors.
Self-provisions an 8-device virtual CPU mesh when fewer real devices
exist (same recipe as tests/conftest.py), so it runs anywhere:

    python examples/demo_distributed.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if len(jax.devices()) < 8:
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        pp = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
        code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
                "import importlib, examples.demo_distributed as d; d.body()")
        raise SystemExit(subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=repo).returncode)
    body()


def body():
    import numpy as np

    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10_from_cells
    from femx.mesh.core import Mesh as FMesh

    cells, h = (4, 4, 16), 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": cells[0] * h / 2,
               "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]

    def run(m, devices=None):
        fa = SolidReactionAnalysis(m, forces, fixes, E=2e11, v=0.3,
                                   verbose=False, devices=devices,
                                   cg_tol=1e-8)
        fa.run_simulation()
        return fa

    # --- structured mesh -------------------------------------------------
    one = run(mesh)
    eight = run(mesh, devices=8)
    err = np.abs(eight.u - one.u).max() / (np.abs(one.u).max() + 1e-30)
    print(f"structured  statics: {eight.solve_info['method']} on "
          f"{eight.solve_info['devices']} devices, "
          f"{eight.solve_info['iterations']} iters, parity {err:.1e}")
    md = eight.modal(n_modes=3, tol=1e-6, inner_tol=1e-8)
    m1 = one.modal(n_modes=3, tol=1e-6, inner_tol=1e-8)
    df = np.abs(np.asarray(md.omega) - np.asarray(m1.omega)).max() / (
        np.abs(np.asarray(m1.omega)).max())
    print(f"structured  modal:   f1 = "
          f"{float(md.omega[0]) / (2 * np.pi):.3f} Hz, parity {df:.1e}")

    # --- unstructured (randomized node labels) ---------------------------
    rng = np.random.default_rng(0)
    relabel = rng.permutation(mesh.num_nodes)
    pts = np.empty_like(mesh.points)
    pts[relabel] = mesh.points
    conn = relabel[np.asarray(mesh.cells["tetra10"])]
    umesh = FMesh(points=pts, cells={"tetra10": conn},
                  cell_physical={"tetra10": np.ones(len(conn), np.int32)},
                  field_data={"box": (1, 3)})
    uone = run(umesh)
    ueight = run(umesh, devices=8)
    uerr = np.abs(ueight.u - uone.u).max() / (np.abs(uone.u).max() + 1e-30)
    print(f"unstructured statics: {ueight.solve_info['method']} on "
          f"{ueight.solve_info['devices']} devices, "
          f"{ueight.solve_info['iterations']} iters, parity {uerr:.1e}")


if __name__ == "__main__":
    main()
