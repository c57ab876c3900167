"""Solid demo: the reference app's pre-seeded default case, end to end.

0.8 x 0.2 x 0.8 m box, mesh size 0.05, E = 2e11 Pa, nu = 0.3, +3000 N at
(0.4, 0.2, 0.4), four fully-fixed bottom corners (FEM_main.py:115-130) —
meshed with femx's structured Tetra10 generator, solved with the
gather-free structured operator + block-Jacobi PCG, reactions and the
equilibrium check printed, report + isometric view written.

Run:  python examples/solid_reaction_demo.py
"""

import os

import numpy as np

import femx

OUT = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT, exist_ok=True)

mesh = femx.box_tet10(
    0.8, 0.2, 0.8, 0.05,
    force_points=[(0.4, 0.2, 0.4)],
    fix_points=[(0, 0, 0), (0, 0, 0.8), (0.8, 0, 0), (0.8, 0, 0.8)],
)
femx.write_msh(os.path.join(OUT, "generated_mesh.msh"), mesh)

fa = femx.ForceAnalysis(
    mesh,
    force_data=[{"force_x": 0.0, "force_y": 3000.0, "force_z": 0.0,
                 "force_x_pstn": 0.4, "force_y_pstn": 0.2, "force_z_pstn": 0.4}],
    fix_data=[{"pos_x": x, "pos_y": 0.0, "pos_z": z,
               "fix_x": 0, "fix_y": 0, "fix_z": 0}
              for x, z in [(0, 0), (0, 0.8), (0.8, 0), (0.8, 0.8)]],
    E=2e11, v=0.3,
)
fa.run_simulation(report=True, report_path=os.path.join(OUT, "FEM_Report.md"))
print("equilibrium residual:", np.abs(fa.equilibrium_residual()).max())
