"""Beam demo: the reference's canonical cantilever case, end to end.

Mirrors the workflow of the reference's shipped `cantilever_beam` asset
(3 nodes / 2 line elements, groups fix / load_y / beam) driven through the
femx BeamAnalysis pipeline with an I-section, producing console results,
plots, and a report.

Run:  python examples/cantilever_beam_demo.py
"""

import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
    jax.config.update("jax_platforms", "cpu")  # beam systems are host-latency-bound

import numpy as np

import femx

OUT = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT, exist_ok=True)

# The same mesh the reference ships — regenerate it with femx primitives.
mesh = femx.cantilever_line_mesh(length=2.0, n_elems=2)
femx.write_msh(os.path.join(OUT, "cantilever_beam.msh"), mesh)

ba = femx.BeamAnalysis(
    mesh,
    section_data=[{
        "group": "beam", "type": "I section",
        "params": {"d": 0.05, "b": 0.025, "t_w": 0.005, "t_f": 0.005, "r": 0.001},
    }],
    bc_data=[
        {"group": "fix", "type": "Fix", "fix_x": True, "fix_y": True, "fix_z": True,
         "fix_rx": True, "fix_ry": True, "fix_rz": True},
        {"group": "load_y", "type": "Force", "force_x": 0.0, "force_y": -3000.0,
         "force_z": 0.0},
    ],
    E=2e11, nu=0.3, rho=7800.0,
)
res = ba.run()

disp = res.u.reshape(-1, 6)[:, :3]
mags = np.linalg.norm(disp, axis=1)
print(f"Max displacement: {mags.max():.4e} m at node {int(np.argmax(mags))}")
print(f"Max stress: {res.smoothed_stresses.max() / 1e6:.4f} MPa")
print("Natural frequencies (Hz):",
      ", ".join(f"{f:.4f}" for f in res.natural_frequencies_hz[:10]))

from femx.report import beam_report

path = beam_report(ba, res, os.path.join(OUT, "beam_analysis_report.md"))
print(f"Report: {path}")
