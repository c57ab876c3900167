"""Measure unstructured K@u apply variants on the real TPU chip.

Goal (VERDICT r1 missing #6 / next #7): the general gather/scatter apply is
~160 ms @ 1.39M DOF in f32; find the fastest TPU formulation for arbitrary
tet meshes (reference ingests any gmsh file, ReactionSolver.py:59-73).

Measured on TPU v5e (this script, 2026-08-16), 1.39M DOF / 331k elements:
  compute          1.78 ms   element physics alone (VPU-bound, fine)
  gather           72.9 ms   + u[dofs] (30E = 10M scalar indices)
  gather_scatter  159.4 ms   + .at[dofs].add (the production apply)
-> both index ops are ~350x off the ~0.2 ms bandwidth roofline; cost is
   per-index, so the fix must REDUCE INDEX COUNT or avoid gathers entirely
   (see femx/assembly_tiled.py for the MXU one-hot formulation).

Variants here (all numerically identical, asserted on a small case):
  compute          element physics only — lower bound
  gather           + (30, E) scalar gather
  row_gather       + u3[conn] row gather (10E row indices, 3-wide rows)
  gather_scatter   production apply
  row_both         row gather + row scatter-add (10E each way)
  segsum_sorted    gather + dof-sorted permute-gather + sorted segment_sum
  cumsum_diff      gather + sorted permute + cumsum + CSR row-diff
  *_perm           same under a random node relabeling (locality probe)

Measurement per the femx verify notes: random data, in-jit lax.fori_loop
chaining, cost = (t(N+K) - t(N))/K to cancel the ~30 ms dispatch round-trip.
Index arrays are passed as jit ARGUMENTS (closed-over device constants get
serialized into the remote-compile payload -> HTTP 413 above ~50 MB).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from femx.assembly_soa import SolidOperatorSoA
from femx.elements import tet10_soa as soa
from femx.mesh import box_tet10


def log(*a):
    print(*a, flush=True)


def timed_loop(step, x0, aux, base=5, extra=50):
    @jax.jit
    def run(x, n, aux):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v, aux), x)

    def synced(n):
        r = run(x0, n, aux)
        float(r.ravel()[0])  # block_until_ready does not sync through the relay

    synced(base)  # compile + warm
    t0 = time.perf_counter()
    synced(base)
    tb = time.perf_counter() - t0
    t0 = time.perf_counter()
    synced(base + extra)
    te = time.perf_counter() - t0
    return (te - tb) / extra


def build(n=(24, 24, 96), permute=False, seed=0):
    mesh = box_tet10(n[0] * 1.0 / 96, n[1] * 1.0 / 96, n[2] * 1.0 / 96,
                     mesh_size=1.0 / 96)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    if permute:
        rng = np.random.default_rng(seed)
        relabel = rng.permutation(len(pts))
        pts = pts[np.argsort(relabel)]
        conn = relabel[conn]
    return pts, conn


def make_variants(pts, conn, dtype=np.float32):
    op, _ = SolidOperatorSoA.from_mesh(pts, conn, 2e11, 0.3, dtype=dtype)
    ndof = op.ndof
    n_nodes = op.n_nodes
    E = op.n_elements
    flat = np.asarray(op.dofs).reshape(-1)

    # sorted-permutation metadata (host, once)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    seg_sorted = flat[perm].astype(np.int32)
    counts = np.bincount(flat, minlength=ndof)
    rowptr = np.zeros(ndof + 1, dtype=np.int64)
    np.cumsum(counts, out=rowptr[1:])

    aux = {
        "dofs": op.dofs,  # (30, E) int32
        "conn": jnp.asarray(conn.T.astype(np.int32)),  # (10, E) node ids
        "perm": jnp.asarray(perm),
        "seg": jnp.asarray(seg_sorted),
        "start": jnp.asarray(rowptr[:-1].astype(np.int32)),
        "end": jnp.asarray(rowptr[1:].astype(np.int32)),
    }

    def compute_fe_from_ue(ue):
        return soa.apply_element_forces(op.dNg, op.wdet, op.C6, ue, op.weight)

    def fe_of(u, a):
        return compute_fe_from_ue(u[a["dofs"]])

    def fe_of_rows(u, a):
        u3 = u.reshape(n_nodes, 3)
        ue3 = u3[a["conn"]]  # (10, E, 3) row gather
        ue = jnp.moveaxis(ue3, 2, 1).reshape(30, E)
        return ue

    def v_compute(state, a):  # state: (30, E)
        fe = compute_fe_from_ue(state)
        return fe * (1.0 / 3e11)

    def chain(u, y):
        return u + y * 1e-12

    def v_gather(u, a):
        fe = fe_of(u, a)
        return chain(u, jax.lax.slice(fe.reshape(-1), (0,), (ndof,)))

    def v_row_gather(u, a):
        ue = fe_of_rows(u, a)
        fe = compute_fe_from_ue(ue)
        return chain(u, jax.lax.slice(fe.reshape(-1), (0,), (ndof,)))

    def v_gather_scatter(u, a):
        fe = fe_of(u, a)
        y = jnp.zeros_like(u).at[a["dofs"].reshape(-1)].add(fe.reshape(-1))
        return chain(u, y)

    def v_row_both(u, a):
        ue = fe_of_rows(u, a)
        fe = compute_fe_from_ue(ue)  # (30, E)
        fe3 = jnp.moveaxis(fe.reshape(10, 3, E), 1, 2)  # (10, E, 3)
        y3 = jnp.zeros((n_nodes, 3), u.dtype).at[a["conn"]].add(fe3)
        return chain(u, y3.reshape(-1))

    def v_segsum_sorted(u, a):
        fe = fe_of(u, a).reshape(-1)
        fs = fe[a["perm"]]
        y = jax.ops.segment_sum(fs, a["seg"], num_segments=ndof,
                                indices_are_sorted=True)
        return chain(u, y)

    def v_cumsum_diff(u, a):
        fe = fe_of(u, a).reshape(-1)
        fs = fe[a["perm"]]
        c = jnp.concatenate([jnp.zeros((1,), fs.dtype), jnp.cumsum(fs)])
        y = c[a["end"]] - c[a["start"]]
        return chain(u, y)

    return op, aux, {
        "compute": (v_compute, jnp.zeros((30, E), dtype)),
        "gather": (v_gather, None),
        "row_gather": (v_row_gather, None),
        "gather_scatter": (v_gather_scatter, None),
        "row_both": (v_row_both, None),
        "segsum_sorted": (v_segsum_sorted, None),
        "cumsum_diff": (v_cumsum_diff, None),
    }


def check_equal(pts, conn):
    op, aux, variants = make_variants(pts, conn)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(op.ndof).astype(np.float32))
    ref = np.asarray(op.apply(u))
    scale = np.abs(ref).max()
    for name in ("row_both", "segsum_sorted", "cumsum_diff"):
        fn, _ = variants[name]
        got = (np.asarray(fn(u, aux)) - np.asarray(u)) / 1e-12
        err = np.abs(got - ref).max() / scale
        assert err < 1e-4, (name, err)
        log(f"  equal[{name}]: rel err {err:.2e}")


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    log(f"devices: {jax.devices()}")
    log("— equality check (small mesh) —")
    check_equal(*build(n=(4, 4, 8)))

    for permute in (False, True):
        pts, conn = build(permute=permute)
        op, aux, variants = make_variants(pts, conn)
        ndof, E = op.ndof, op.n_elements
        tag = "random-relabel" if permute else "raster-order"
        log(f"\n— {tag}: ndof={ndof}, E={E} (30E = {30*E}) —")
        rng = np.random.default_rng(2)
        u0 = jnp.asarray(rng.standard_normal(ndof).astype(np.float32))
        for name, (fn, x0) in variants.items():
            if only and name not in only:
                continue
            x = u0 if x0 is None else x0
            try:
                t = timed_loop(fn, x, aux)
                log(f"  {name:16s}: {t*1e3:8.3f} ms/apply")
            except Exception as e:
                log(f"  {name:16s}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
