"""Auxiliary subsystem tests: profiling, checkpoint/resume, report files."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from femx.checkpoint import load_state, pcg_checkpointed, save_state
from femx.profiling import reset_stages, stage, stage_report, timeit


def test_stage_timers():
    reg = {}
    import collections

    reg = collections.defaultdict(list)
    with stage("work", registry=reg):
        sum(range(1000))
    with stage("work", registry=reg):
        sum(range(1000))
    rep = stage_report(reg)
    assert rep["work"]["calls"] == 2
    assert rep["work"]["total_s"] > 0


def test_timeit_blocks():
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    out = timeit(f, jnp.ones(16), reps=2)
    assert out["first_s"] >= out["steady_s"] > 0
    np.testing.assert_allclose(np.asarray(out["output"]), 3.0)


def test_save_load_state(tmp_path):
    p = str(tmp_path / "ckpt")
    save_state(p, {"x": np.arange(5.0)}, {"iterations": 7})
    arrays, meta = load_state(p)
    np.testing.assert_array_equal(arrays["x"], np.arange(5.0))
    assert meta["iterations"] == 7
    assert load_state(str(tmp_path / "missing")) == (None, None)


def test_pcg_checkpointed_resume(tmp_path):
    """Chunked CG converges, writes checkpoints, and resumes mid-solve."""
    rng = np.random.default_rng(0)
    n = 200
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A_mat = Q @ np.diag(np.linspace(1.0, 500.0, n)) @ Q.T
    A_j = jnp.asarray(A_mat)
    b = jnp.asarray(rng.normal(size=n))
    A = lambda v: A_j @ v

    p = str(tmp_path / "cg")
    res = pcg_checkpointed(A, b, tol=1e-10, maxiter=2000, chunk=25, checkpoint_path=p)
    assert bool(res.converged)
    x_direct = np.linalg.solve(A_mat, np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-6)
    arrays, meta = load_state(p)
    assert meta["iterations"] == int(res.iterations)

    # simulate a crash mid-solve: seed a partial checkpoint, resume to finish
    partial = pcg_checkpointed(A, b, tol=1e-10, maxiter=30, chunk=25, checkpoint_path=p + "2")
    assert not bool(partial.converged)
    resumed = pcg_checkpointed(A, b, tol=1e-10, maxiter=2000, chunk=25, checkpoint_path=p + "2")
    assert bool(resumed.converged)
    np.testing.assert_allclose(np.asarray(resumed.x), x_direct, rtol=1e-6)


def test_solid_report_file(tmp_path):
    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10

    mesh = box_tet10(0.4, 0.2, 0.4, 0.2,
                     force_points=[(0.2, 0.2, 0.2)],
                     fix_points=[(0, 0, 0), (0, 0, 0.4), (0.4, 0, 0), (0.4, 0, 0.4)])
    fa = SolidReactionAnalysis(
        mesh,
        [{"force_x": 0, "force_y": 3000.0, "force_z": 0,
          "force_x_pstn": 0.2, "force_y_pstn": 0.2, "force_z_pstn": 0.2}],
        [{"pos_x": x, "pos_y": 0, "pos_z": z, "fix_x": 0, "fix_y": 0, "fix_z": 0}
         for x, z in [(0, 0), (0, 0.4), (0.4, 0), (0.4, 0.4)]],
        E=2e11, v=0.3, verbose=False)
    fa.run_simulation(report=True, report_path=str(tmp_path / "FEM_Report.md"))
    text = (tmp_path / "FEM_Report.md").read_text()
    # the reference report's section inventory (ReactionSolver.py:315-330)
    for heading in ("Analysis Parameters", "Mesh Information", "Boundary Conditions",
                    "Mesh Quality Check", "Reaction Force Results"):
        assert heading in text
    assert "Total Reaction" in text
    assert (tmp_path / "FEM_Report_iso_view.png").exists()


def test_pcg_refined_improves_residual():
    from femx.solve.cg import pcg, pcg_refined

    rng = np.random.default_rng(2)
    n = 300
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A_mat = jnp.asarray(Q @ np.diag(np.linspace(1.0, 1e4, n)) @ Q.T)
    b = jnp.asarray(rng.normal(size=n))
    A = lambda v: A_mat @ v
    loose = pcg(A, b, tol=1e-3, maxiter=5000)
    refined = pcg_refined(A, b, tol=1e-3, maxiter=5000, refine_steps=2)
    assert float(refined.residual_norm) < float(loose.residual_norm)
    assert float(refined.residual_norm) < 1e-6


def test_solid_report_includes_modal_when_present(tmp_path):
    """Solid report gains a Modal Analysis section when modal() was run
    (femx extension; the reference's solid report has no modal output)."""
    import numpy as np

    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10
    from femx.report import solid_report

    mesh = box_tet10(0.2, 0.2, 0.3, mesh_size=0.1,
                     fix_points=[(0, 0, 0), (0.2, 0, 0), (0, 0, 0.3),
                                 (0.2, 0, 0.3)])
    fixes = [{"pos_x": x, "pos_y": 0.0, "pos_z": z,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for x, z in [(0, 0), (0.2, 0), (0, 0.3), (0.2, 0.3)]]
    fa = SolidReactionAnalysis(mesh, [], fixes, E=2e11, v=0.3, verbose=False)
    fa.f = np.zeros(3 * fa.num_nodes)
    fa.assemble_stiffness_matrix()
    fa.apply_boundary_conditions()
    fa.solve()
    fa.modal(n_modes=3, rho=7850.0)
    p = str(tmp_path / "report.md")
    solid_report(fa, p, image=False)
    text = open(p).read()
    assert "Modal Analysis Results" in text
    assert "Frequency (Hz)" in text


def test_analysis_checkpoint_resume_after_kill(tmp_path):
    """--checkpoint PATH end-to-end: a solve 'preempted' mid-CG (save_state
    raising after the first persisted segment) leaves a resumable state file;
    re-running the SAME analysis resumes from it (solve_info records the
    resumed iteration count) and converges to the no-checkpoint answer."""
    import femx.checkpoint as ckpt
    from femx.analysis import SolidReactionAnalysis
    from femx.mesh import box_tet10_from_cells

    cells = (3, 3, 6)
    h = 0.05
    mesh = box_tet10_from_cells(cells, (h, h, h))
    zmax = float(mesh.points[:, 2].max())
    fixes = [{"pos_x": p[0], "pos_y": p[1], "pos_z": 0.0,
              "fix_x": 0, "fix_y": 0, "fix_z": 0}
             for p in [(0, 0), (0, cells[1] * h), (cells[0] * h, 0),
                       (cells[0] * h, cells[1] * h)]]
    forces = [{"force_x": 0, "force_y": -500.0, "force_z": 0,
               "force_x_pstn": cells[0] * h / 2,
               "force_y_pstn": cells[1] * h / 2, "force_z_pstn": zmax}]
    path = str(tmp_path / "solve_state")

    def make(chunk=250):
        # chunk must stay a reasonable fraction of the unchunked iteration
        # count: each warm restart resets CG's recurrences, and restarting
        # plain block-Jacobi CG every few iterations measurably stalls it
        # (chunk=8 pushed this 1911-DOF solve past the 50k-iteration cap).
        return SolidReactionAnalysis(
            mesh, forces, fixes, E=2e11, v=0.3, verbose=False,
            cg_tol=1e-10, checkpoint=path, checkpoint_chunk=chunk)

    # reference: no checkpointing at all
    fa_ref = SolidReactionAnalysis(mesh, forces, fixes, E=2e11, v=0.3,
                                   verbose=False, cg_tol=1e-10)
    fa_ref.run_simulation()

    # "preempt" the first checkpointed run after one persisted segment
    real_save = ckpt.save_state
    calls = {"n": 0}

    def killing_save(path_, arrays, meta=None):
        real_save(path_, arrays, meta)
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated preemption")

    fa_kill = make()
    fa_kill.assemble_stiffness_matrix()
    fa_kill.apply_boundary_conditions()
    ckpt.save_state = killing_save
    try:
        import pytest

        with pytest.raises(KeyboardInterrupt):
            fa_kill.solve()
    finally:
        ckpt.save_state = real_save
    arrays, meta = ckpt.load_state(path)
    assert arrays is not None and meta["iterations"] > 0

    # resume: a fresh analysis on the same path picks the state up
    fa_res = make()
    fa_res.run_simulation()
    assert fa_res.solve_info["resumed_iterations"] == meta["iterations"]
    assert fa_res.solve_info["converged"]
    scale = np.abs(fa_ref.u).max()
    np.testing.assert_allclose(fa_res.u, fa_ref.u, atol=scale * 1e-7)
