"""femx headline benchmark: ~1M-DOF 3D solid cantilever, assemble + solve.

North-star target (BASELINE.json): 1M-DOF static solve (assemble + PCG) in
< 2 s wall on TPU. The reference app has no benchmarks (SURVEY.md §6); its
pipeline on this problem class is a Python per-element assembly loop plus
SuperLU — minutes at this scale on CPU. vs_baseline = target_seconds / ours
(>1.0 means beating the 2 s target).

Pipeline benchmarked (the femx production path for generated box geometry):
structured gather-free lattice operator (femx.assembly_structured) +
geometric-multigrid-preconditioned CG (femx.solve.multigrid) in float32.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

Failure handling (round-4 hardening): ``main()`` never runs jax in-process.
It (1) probes the backend in a SUBPROCESS with a hard timeout — the axon TPU
plugin has been observed to either raise (BENCH_r03 rc=1) or hang forever
(MULTICHIP_r03 rc=124) on ``jax.devices()`` when the relay tunnel is down —
then (2) runs the bench body in a subprocess with a timeout and relays its
JSON line, and (3) on any TPU failure falls back to a small-grid CPU
correctness run, emitting a JSON line with an explicit ``"error"`` field.
Every path ends in exactly one machine-readable JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_bench():
    import jax
    import jax.numpy as jnp

    from femx.mesh import box_tet10
    from femx.solve.cg import pcg, pcg_refined
    from femx.solve.multigrid import StructuredMultigrid

    on_cpu = jax.default_backend() == "cpu"
    dtype = np.float64 if on_cpu else np.float32
    # MG-friendly grid (cells halve cleanly): 24x24x96 -> 1.39M DOF.
    grid = os.environ.get("FEMX_BENCH_GRID", "24,24,96")
    nx, ny, nz = (int(v) for v in grid.split(","))
    h = 1.6 / 96  # uniform cell size
    dims = (nx * h, ny * h, nz * h)  # cantilever along z (longest axis minor-most)
    L, H, W = dims

    t0 = time.perf_counter()
    mesh = box_tet10(*dims, mesh_size=h)
    assert mesh.structured.n_cells == (nx, ny, nz), mesh.structured.n_cells
    ndof = 3 * mesh.num_nodes
    log(f"mesh: {mesh.num_nodes} nodes / {ndof} DOF, cells {mesh.structured.n_cells} "
        f"({time.perf_counter() - t0:.2f}s host)")

    mask = np.ones(ndof)
    fixed = np.where(mesh.points[:, 2] < 1e-9)[0]
    mask[(3 * fixed[:, None] + np.arange(3)).ravel()] = 0
    f = np.zeros(ndof)
    tip = np.where(mesh.points[:, 2] > W - 1e-9)[0]
    f[3 * tip + 1] = -1000.0 / len(tip)

    t0 = time.perf_counter()
    mg = StructuredMultigrid(dims, (nx, ny, nz), 2e11, 0.3, mask, dtype=dtype)
    op = mg.fine_op
    fj = jnp.asarray(op.to_internal(f * mask), dtype=op.Kcell.dtype)
    t_setup = time.perf_counter() - t0
    log(f"MG setup (operators + cell matrices + coarse factor): {t_setup:.2f}s; "
        f"levels {[l.op.n_cells for l in mg.levels]}; "
        f"hierarchy cache {'hit' if mg.setup_cache_hit else 'miss'}")

    tol = 1e-5 if dtype == np.float32 else 1e-8

    # mg/op enter the jitted solves as PYTREE ARGUMENTS — closing over them
    # embeds ~100 MB of preconditioner arrays as compiled-program constants,
    # which dominate the remote-compile payload/time.
    @jax.jit
    def solve_args(fv, mg_):
        res = pcg(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                  tol=tol, maxiter=200)
        return res.x, res.iterations, res.residual_norm

    def solve(fv):
        return solve_args(fv, mg)

    # Accurate variant (the headline): f32 inner solves + adaptive f64
    # iterative refinement to a TRUE residual <= 1e-8 (the f32-on-TPU answer
    # to the reference's f64 SuperLU; BASELINE.json asks 1e-8-rel parity on
    # deflections). Refinement contracts the true residual ~86x per pass
    # (measured; see solve.cg.pcg_refined) — 4 passes reach ~1e-9. The f64
    # operator only evaluates residuals — one apply per refinement pass.
    op64 = op.astype(np.float64)

    f64j = jnp.asarray(op.to_internal(f * mask), dtype=np.float64)

    @jax.jit
    def solve_refined_args(fv, fv64, mg_, op64_):
        res = pcg_refined(mg_.fine_op.apply_constrained, fv, M_inv_diag=mg_,
                          tol=tol, maxiter=200, refine_steps=6,
                          A_residual=op64_.apply_constrained, b_residual=fv64,
                          outer_tol=1e-8)
        return res.x, res.iterations, res.residual_norm

    def solve_refined(fv, fv64):
        return solve_refined_args(fv, fv64, mg, op64)

    t0 = time.perf_counter()
    u, it, rn = solve(fj)
    jax.block_until_ready(u)
    t_compile = time.perf_counter() - t0
    log(f"compile+first solve: {t_compile:.1f}s, iters={int(it)}, "
        f"residual={float(rn):.2e}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, it, rn = solve(fj)
        u = jax.block_until_ready(u)
        _ = float(rn)  # force full sync through the dispatch tunnel
        times.append(time.perf_counter() - t0)
    t_best = min(times)
    iters = int(it)
    log(f"steady-state solve: {t_best:.3f}s (runs {[round(t, 3) for t in times]}), "
        f"iters={iters}, residual={float(rn):.2e}, dtype={np.dtype(dtype).name}")
    log(f"sanity: max|u| = {float(jnp.max(jnp.abs(u))):.3e} m; "
        f"tip load 1 kN on {len(tip)} nodes")

    ur, itr, rnr = solve_refined(fj, f64j)  # compile
    jax.block_until_ready(ur)
    t0 = time.perf_counter()
    ur, itr, rnr = solve_refined(fj, f64j)
    jax.block_until_ready(ur)
    _ = float(rnr)
    t_refined = time.perf_counter() - t0
    log(f"accurate solve (adaptive refinement to true residual <= 1e-8): "
        f"{t_refined:.3f}s, total inner iters={int(itr)}, "
        f"true residual={float(rnr):.2e}")

    # Modal north star (BASELINE.json "first-10-modes eig time"): shift-invert
    # Lanczos with MG-PCG inner solves on the same flagship operator. The
    # inner solve is already compiled (same pcg/operator closure shape), so
    # this times the full first-10-modes pipeline including its own compile
    # of the orthogonalization steps — report compile-inclusive and steady.
    from femx.modal import solid_modal_structured

    t0 = time.perf_counter()
    mres = solid_modal_structured(
        op, mg, rho=7850.0, n_modes=10,
        inner_tol=tol, inner_maxiter=200, tol=1e-4, maxiter=60,
    )
    jax.block_until_ready(mres.modes)
    t_modal_cold = time.perf_counter() - t0
    # steady-state: the Lanczos step functions are compiled now
    t0 = time.perf_counter()
    mres = solid_modal_structured(
        op, mg, rho=7850.0, n_modes=10,
        inner_tol=tol, inner_maxiter=200, tol=1e-4, maxiter=60,
    )
    jax.block_until_ready(mres.modes)
    t_modal = time.perf_counter() - t0
    f_hz = np.asarray(mres.omega) / (2 * np.pi)
    log(f"modal first-10 (shift-invert Lanczos, {mres.iterations} inner "
        f"MG-PCG solves): {t_modal:.2f}s steady / {t_modal_cold:.2f}s with "
        f"compile; f = {np.round(f_hz, 2).tolist()} Hz")

    # Error bars + refinement for the fast modal numbers through the
    # INVERSE operator (femx.modal.shift_invert_refine): direct (K, M)
    # residual/Rayleigh checks saturate for f32-computed modes (~1e-3
    # mode-shape noise amplified by the pencil's ~6e6 spectral range —
    # measured rho/lam up to ~9 while eigenvalues reproduce to 4e-4), but
    # K^-1 DAMPS that noise; one inverse-iteration step + Rayleigh-Ritz
    # then recovers eigenvalues quadratically (small-scale test vs dense
    # eigh: 1e-3-noisy modes -> <1e-8 eigenvalue error) and ships a
    # per-mode Ritz BOUND. Two adaptive-refined solves (true residual
    # 1e-9) per mode, all through one compiled program.
    from femx.modal import shift_invert_refine
    from femx.solve.cg import pcg_refined

    m64 = jnp.asarray(op.lumped_mass_diagonal(7850.0))

    @jax.jit
    def _ks_tight(b, mg_, op64_):
        return pcg_refined(
            mg_.fine_op.apply_constrained, jnp.asarray(b, dtype),
            M_inv_diag=mg_, tol=tol, maxiter=200, refine_steps=6,
            A_residual=op64_.apply_constrained,
            b_residual=jnp.asarray(b, jnp.float64), outer_tol=1e-9).x

    t0 = time.perf_counter()
    om_ref, rel_errs, _modes_ref = shift_invert_refine(
        lambda b: _ks_tight(b, mg, op64), np.asarray(m64),
        jnp.asarray(mres.modes, dtype=jnp.float64))
    rel_errs = np.asarray(rel_errs)
    f_ref = np.asarray(om_ref) / (2 * np.pi)
    t_validate = time.perf_counter() - t0
    log(f"modal refine+validate (inverse-iteration + Rayleigh-Ritz w/ "
        f"1e-9-refined solves, {t_validate:.1f}s): refined f1 "
        f"{f_ref[0]:.6f} Hz (Lanczos {f_hz[0]:.6f}); rel-eigenvalue bound "
        f"max {rel_errs.max():.2e}, f1 {rel_errs[0]:.2e}; "
        f"|f_ref - f_lanczos|/f rel max "
        f"{np.max(np.abs(f_ref - f_hz) / f_ref):.2e}")

    # Unstructured path at the same scale (the reference's arbitrary-gmsh
    # capability, ReactionSolver.py:59-73): node labels randomized so no
    # structured metadata survives; transpose-gather operator + lattice-MG
    # preconditioner. Disable with FEMX_BENCH_UNSTRUCTURED=0 (adds ~4 min:
    # SoA geometry + lattice setup + one large compile).
    t_unstructured = None
    unstructured_iters = None
    # group-ELL is the bench default (the recommended fast f32 config:
    # 0.68 s vs 1.16 s TG solve at 1.39M DOF, measured 2026-08-19); the
    # LIBRARY default stays "tg" (group-ELL's pre-assembled blocks are
    # 3.4 GB f32 / 6.8 GB f64 at this scale).
    uop_kind = os.environ.get("FEMX_UNSTRUCTURED_OP", "groupell")
    if os.environ.get("FEMX_BENCH_UNSTRUCTURED", "1") == "1":
        from femx.solve.lattice_precond import LatticePreconditioner

        conn_u = np.asarray(mesh.cells["tetra10"])
        pts_u = np.asarray(mesh.points)
        rng = np.random.default_rng(0)
        relabel = rng.permutation(len(pts_u))
        pts_s = np.empty_like(pts_u)
        pts_s[relabel] = pts_u
        conn_s = relabel[conn_u]
        mask_s = np.empty_like(mask)
        mask_s.reshape(-1, 3)[relabel] = mask.reshape(-1, 3)
        f_s = np.empty_like(f)
        f_s.reshape(-1, 3)[relabel] = f.reshape(-1, 3)

        t0 = time.perf_counter()
        if uop_kind == "groupell":
            from femx.assembly_groupell import SolidOperatorGroupELL

            uop, _ = SolidOperatorGroupELL.from_mesh(pts_s, conn_s, 2e11,
                                                     0.3, dtype=dtype)
            jax.block_until_ready(uop.Kb)
            t_uassemble = time.perf_counter() - t0
            uop = uop.with_free_mask(
                uop.to_internal(mask_s).astype(dtype))
            bj_data = uop.block_jacobi_tensors()
            bj_fn = type(uop).apply_block_jacobi
        elif uop_kind == "cluster":
            from femx.assembly_cluster import SolidOperatorCluster

            uop, _ = SolidOperatorCluster.from_mesh(pts_s, conn_s, 2e11,
                                                    0.3, dtype=dtype)
            jax.block_until_ready(uop.Kcl)
            t_uassemble = time.perf_counter() - t0
            uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask_s),
                                                 dtype=uop.dtype))
            bj_data = uop.block_jacobi_tensors()
            bj_fn = type(uop).apply_block_jacobi
        elif uop_kind == "tg":
            from femx.assembly_tg import SolidOperatorTG

            uop, _ = SolidOperatorTG.from_mesh(pts_s, conn_s, 2e11, 0.3,
                                               dtype=dtype)
            jax.block_until_ready(uop.connT)
            t_uassemble = time.perf_counter() - t0
            uop = uop.with_free_mask(jnp.asarray(uop.to_internal(mask_s),
                                                 dtype=uop.dtype))
            bj_data = uop.soa.block_jacobi_tensors()
            bj_fn = type(uop.soa).apply_block_jacobi
        else:
            # fail fast: a typo'd/unsupported value silently benchmarking a
            # DIFFERENT operator while the JSON reports the requested name
            # corrupts A/B records (advisor round-4)
            raise ValueError(
                f"FEMX_UNSTRUCTURED_OP={uop_kind!r} not in "
                "('tg', 'cluster', 'groupell')")
        lp = LatticePreconditioner(pts_s, conn_s, 2e11, 0.3, mask_s,
                                   dtype=dtype, node_perm=uop.new_of_old,
                                   bj_fn=bj_fn, bj_data=bj_data,
                                   n_caller=getattr(uop, "n_pad", None))
        t_usetup = time.perf_counter() - t0
        # BASELINE.md row 32's north-star metric, for the ARBITRARY-mesh
        # path: operator assembly throughput (mesh arrays in, applyable
        # device operator out — excludes the preconditioner build).
        u_mdof_s = (ndof / 1e6) / t_uassemble
        log(f"unstructured setup ({uop_kind} + lattice precond): "
            f"{t_usetup:.1f}s (operator assembly {t_uassemble:.1f}s = "
            f"{u_mdof_s:.2f} MDOF/s)")
        fu = jnp.asarray(uop.to_internal(f_s * mask_s), dtype=uop.dtype)

        @jax.jit
        def solve_u(fv, op_, lp_):
            r = pcg(op_.apply_constrained, fv, M_inv_diag=lp_, tol=tol,
                    maxiter=2000)
            return r.x, r.iterations, r.residual_norm

        xu, itu, rnu = solve_u(fu, uop, lp)
        jax.block_until_ready(xu)  # compile
        t0 = time.perf_counter()
        xu, itu, rnu = solve_u(fu, uop, lp)
        jax.block_until_ready(xu)
        _ = float(rnu)
        t_unstructured = time.perf_counter() - t0
        unstructured_iters = int(itu)
        log(f"unstructured lattice-MG PCG: {t_unstructured:.2f}s "
            f"({unstructured_iters} iters, res {float(rnu):.2e})")

    target = 2.0  # BASELINE.json north star: < 2 s at 1M DOF
    # Set by main() when this body runs as a CPU correctness fallback after a
    # TPU-backend failure: record the error, and report vs_baseline=0 (a CPU
    # run proves correctness, not the TPU perf claim).
    err = os.environ.get("FEMX_BENCH_ERROR")
    print(json.dumps({
        **({} if not err else {
            "error": err,
            "fallback": f"cpu correctness run @ grid {grid} (f64)",
        }),
        # Headline = the solve that meets BOTH north stars at once: < 2 s
        # wall AND true f64 residual <= 1e-8 (f32 MG-PCG inner solves +
        # adaptive f64 refinement). The pure-f32 warm solve (1e-5) is
        # reported as f32_solve_s.
        "metric": "solid_cantilever_accurate_solve_wall",
        "value": round(t_refined, 4),
        "unit": (f"s @ {ndof} DOF (true residual {float(rnr):.1e}, "
                 f"{int(itr)} inner f32 MG-PCG iters)"),
        "vs_baseline": 0.0 if err else round(target / t_refined, 3),
        # honest cold/warm split: one-time host setup and one-time XLA
        # compilation amortize across solves; 'value' is the warm solve.
        "setup_s": round(t_setup, 2),
        "mg_cache": "hit" if mg.setup_cache_hit else "miss",
        "compile_s": round(t_compile, 2),
        "f32_solve_s": round(t_best, 4),
        "f32_iters": iters,
        "true_residual": float(rnr),
        "modal10_s": round(t_modal, 2),
        "modal10_compile_s": round(t_modal_cold, 2),
        "modal10_inner_solves": int(mres.iterations),
        # Rayleigh-Ritz-refined through the inverse operator (two
        # 1e-9-refined solves per mode); rel_errs are per-mode Ritz
        # BOUNDS on the relative eigenvalue error — frequency error is
        # ~half (f = sqrt(lam)). femx.modal.shift_invert_refine.
        "modal_f1_hz": round(float(f_ref[0]), 4),
        "modal_f1_lanczos_hz": round(float(f_hz[0]), 4),
        "modal_f1_err_est": float(rel_errs[0] / 2),
        "modal_max_err_est": float(rel_errs.max() / 2),
        "modal_validation_s": round(t_validate, 2),
        **({} if t_unstructured is None else {
            "unstructured_solve_s": round(t_unstructured, 3),
            "unstructured_iters": unstructured_iters,
            # end-to-end honesty (round-4 VERDICT): host+device setup wall
            # for the arbitrary-mesh path, and the BASELINE.md row-32
            # assembly-throughput north star (operator build only)
            "unstructured_setup_s": round(t_usetup, 2),
            "unstructured_assembly_s": round(t_uassemble, 2),
            "assembly_mdof_per_s": round(u_mdof_s, 2),
        }),
        # Variant metadata so A/B sweep records are self-describing
        # (examples/tpu_revalidation.py runs bench.py under these flags).
        "structured_apply": os.environ.get("FEMX_STRUCTURED_APPLY", "slot"),
        "mg_smoother": os.environ.get("FEMX_MG_SMOOTHER", "jacobi"),
        "unstructured_op": uop_kind,
    }))


def _last_json_line(text: str):
    """Last stdout line that parses as a JSON object, or None."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    """Hang-proof orchestrator: probe backend, run body, always emit JSON.

    The axon TPU plugin can hang indefinitely inside backend init when the
    relay tunnel is down (observed: MULTICHIP_r03 rc=124), so nothing here
    touches jax in-process — every jax call lives in a time-limited
    subprocess.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")

    def run(code, timeout, extra_env=None):
        e = dict(env)
        if extra_env:
            e.update(extra_env)
        try:
            p = subprocess.run(
                [sys.executable, "-c", code], cwd=here, env=e,
                stdout=subprocess.PIPE, timeout=timeout, text=True)
            return p.returncode, p.stdout
        except subprocess.TimeoutExpired:
            return -9, ""

    # 1) Backend probe (the step that hangs when the TPU tunnel is down).
    probe_t = float(os.environ.get("FEMX_BENCH_PROBE_TIMEOUT", "120"))
    t0 = time.perf_counter()
    rc, out = run("import jax; print(jax.default_backend())", probe_t)
    backend = out.strip().splitlines()[-1] if out.strip() else ""
    log(f"backend probe: rc={rc} backend={backend!r} "
        f"({time.perf_counter() - t0:.1f}s)")

    error = None
    if rc == 0 and backend and backend != "cpu":
        # 2) Real TPU bench, itself time-limited in case the relay drops
        # mid-run.
        bench_t = float(os.environ.get("FEMX_BENCH_TIMEOUT", "3000"))
        rc, out = run("import bench; bench.run_bench()", bench_t)
        parsed = _last_json_line(out)
        if rc == 0 and parsed is not None:
            print(json.dumps(parsed))
            return
        error = (f"tpu bench subprocess failed (rc={rc}, "
                 f"json={'yes' if parsed else 'no'})")
    else:
        error = (f"tpu backend unavailable (probe rc={rc}, "
                 f"backend={backend!r}, timeout={probe_t:.0f}s)")
    log(f"falling back to CPU correctness run: {error}")

    # 3) CPU correctness fallback: small grid, f64, explicit error record.
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import bench; bench.run_bench()")
    rc, out = run(code, float(os.environ.get("FEMX_BENCH_CPU_TIMEOUT", "900")),
                  extra_env={"FEMX_BENCH_ERROR": error,
                             "FEMX_BENCH_GRID": os.environ.get(
                                 "FEMX_BENCH_CPU_GRID", "8,8,32"),
                             "FEMX_BENCH_UNSTRUCTURED": "0"})
    parsed = _last_json_line(out)
    if rc == 0 and parsed is not None:
        print(json.dumps(parsed))
        return

    # 4) Last resort: a bare machine-readable error record.
    print(json.dumps({
        "metric": "solid_cantilever_accurate_solve_wall",
        "value": -1.0,
        "unit": "s (bench did not run)",
        "vs_baseline": 0.0,
        "error": f"{error}; cpu fallback also failed (rc={rc})",
    }))


if __name__ == "__main__":
    main()
