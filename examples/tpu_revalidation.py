"""One-command TPU revalidation sweep (run when the chip/relay is back).

The round-3/4 TPU relay outage (jax backend init hangs forever in-process)
means every TPU number in README/COMPONENTS decays until re-measured. This
orchestrator converts the re-measurement checklist into one serialized,
hang-proof command:

    python examples/tpu_revalidation.py            # full sweep
    python examples/tpu_revalidation.py bench cheb # named jobs only

Behavior:
  * probes the TPU backend in a SUBPROCESS with a hard timeout (the axon
    plugin hangs in-process when the relay tunnel is down — never probe
    in-process);
  * runs each job as its own time-limited subprocess, SERIALIZED (this box
    has one core; concurrent heavy jobs contend ~1.7x);
  * appends one JSON record per job to examples/revalidation_results.jsonl
    as it goes — a partial sweep still leaves machine-readable evidence;
  * never raises: a failed/timed-out job is recorded and the sweep moves on.

Job list mirrors the round-4 re-measurement plan (memory/VERDICT r3 #8):
bench.py, scaling sweep, unstructured solve, cluster-vs-TG A/B, Chebyshev
smoother A/B on the flagship, Pallas canary, conv-form-apply A/B
(bench_conv_apply.py + a conv-routed flagship bench), and the 50M-cliff
grid profiles (80x80x320 vs 64x64x512 plus axis-order variants).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "examples", "revalidation_results.jsonl")

PALLAS_CANARY = (
    "import numpy as np, jax, jax.numpy as jnp, time, os;"
    "import sys; sys.path.insert(0, %r);"
    "from femx.solve.multigrid import StructuredMultigrid;"
    "grid=(16,16,64);"
    # Fix the z=0 node plane: an all-free mask leaves rigid modes in K and
    # the coarsest dense Cholesky correctly raises 'not positive definite'
    # (first on-chip run of this canary, 2026-08-19). Mask layout is the
    # (2nx+1, 2ny+1, 2nz+1, 3) node lattice (see StructuredMultigrid).
    "mask=np.ones((2*grid[0]+1, 2*grid[1]+1, 2*grid[2]+1, 3));"
    "mask[:, :, 0, :]=0; mask=mask.ravel();"
    "mg=StructuredMultigrid(None, grid, 2e11, 0.3, mask,"
    " spacing=(0.025,0.025,0.025), dtype=np.float32);"
    "op=mg.fine_op;"
    "x=jnp.asarray(np.random.default_rng(0).standard_normal(op.ndof),"
    " dtype=jnp.float32);"
    "os.environ.pop('FEMX_PALLAS_APPLY', None);"
    "ref=np.asarray(op.apply(x));"
    "os.environ['FEMX_PALLAS_APPLY']='1';"
    "got=np.asarray(op.apply(x));"
    "err=float(np.max(np.abs(got-ref))/np.max(np.abs(ref)));"
    "import json; print(json.dumps({'pallas_rel_err': err}));"
    "assert err < 1e-6, err"
) % (REPO,)


def jobs():
    py = sys.executable
    ex = os.path.join(REPO, "examples")
    return [
        # (name, argv, extra_env, timeout_s)
        ("bench", [py, os.path.join(REPO, "bench.py")], {}, 3600),
        ("cheb_flagship",
         [py, os.path.join(REPO, "bench.py")],
         {"FEMX_MG_SMOOTHER": "chebyshev", "FEMX_BENCH_UNSTRUCTURED": "0"},
         2400),
        ("scaling", [py, os.path.join(ex, "bench_scaling.py")], {}, 4800),
        ("unstructured", [py, os.path.join(ex, "bench_unstructured.py")],
         {}, 3000),
        ("cluster_ab", [py, os.path.join(ex, "bench_cluster.py")], {}, 3000),
        ("pallas_canary", [py, "-c", PALLAS_CANARY], {}, 1200),
        # Conv-form apply A/B (femx.assembly_conv): flagship, cliff grid,
        # and its 2^k-friendly control. CPU-parity-tested; the chip decides
        # whether it becomes the default structured apply.
        ("conv_ab", [py, os.path.join(ex, "bench_conv_apply.py")], {}, 2400),
        ("conv_flagship",
         [py, os.path.join(REPO, "bench.py")],
         {"FEMX_STRUCTURED_APPLY": "conv", "FEMX_BENCH_UNSTRUCTURED": "0"},
         2400),
        # Stretch: does the conv apply's smaller working set (no (81,C)
        # slot stack) raise the single-chip ceiling past ~50M DOF? An OOM
        # here is recorded and the sweep moves on.
        ("scaling_xl",
         [py, os.path.join(ex, "bench_scaling.py")],
         {"FEMX_STRUCTURED_APPLY": "conv",
          "FEMX_SCALING_GRIDS": "80,80,320;96,96,384"},
         4800),
        # 50M-cliff attribution: the pathological grid, its 2^k-friendly
        # equal-size control, and axis-order variants of the pathological
        # one (the operator is axis-symmetric at uniform spacing, so an
        # internal axis permutation is a free optimization if any wins).
        ("cliff_80_80_320",
         [py, os.path.join(ex, "profile_big_grid.py"), "80,80,320"], {}, 1800),
        ("cliff_64_64_512",
         [py, os.path.join(ex, "profile_big_grid.py"), "64,64,512"], {}, 1800),
        ("cliff_320_80_80",
         [py, os.path.join(ex, "profile_big_grid.py"), "320,80,80"], {}, 1800),
        ("cliff_80_320_80",
         [py, os.path.join(ex, "profile_big_grid.py"), "80,320,80"], {}, 1800),
    ]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(timeout=120.0):
    """TPU backend probe in a subprocess (in-process init can hang forever)."""
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); "
             "print(jax.default_backend(), len(d))"],
            capture_output=True, text=True, timeout=timeout)
        out = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        return p.returncode == 0 and not out.startswith("cpu"), out
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {time.perf_counter()-t0:.0f}s"


def record(rec):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    log(f"[recorded] {rec['job']}: rc={rec['rc']} {rec['seconds']:.0f}s")


def main():
    only = set(sys.argv[1:])
    ok, info = probe()
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    if not ok:
        log(f"TPU unavailable ({info}); nothing to revalidate.")
        record({"job": "_probe", "ts": stamp, "rc": 1, "seconds": 0.0,
                "note": f"tpu unavailable: {info}"})
        return 1
    log(f"TPU up: {info}")
    record({"job": "_probe", "ts": stamp, "rc": 0, "seconds": 0.0,
            "note": f"tpu up: {info}"})

    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO + (
        os.pathsep + env_base["PYTHONPATH"]
        if env_base.get("PYTHONPATH") else "")
    for name, argv, extra, tmo in jobs():
        if only and not any(name.startswith(o) or o in name for o in only):
            continue
        env = dict(env_base)
        env.update(extra)
        log(f"=== {name} (timeout {tmo}s) ===")
        t0 = time.perf_counter()
        try:
            p = subprocess.run(argv, env=env, cwd=REPO, text=True,
                               capture_output=True, timeout=tmo)
            rc, so, se = p.returncode, p.stdout, p.stderr
        except subprocess.TimeoutExpired as e:
            rc = -9
            so = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            se = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
                else (e.stderr or "")
        dt = time.perf_counter() - t0
        parsed = []
        for line in so.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        record({
            "job": name, "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "rc": rc, "seconds": round(dt, 1), "env": extra,
            "json": parsed,
            "stdout_tail": so[-2000:], "stderr_tail": se[-2500:],
        })
    log(f"sweep done -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
