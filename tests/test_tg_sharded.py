"""Sharded unstructured TG operator (femx.parallel.tg_sharded).

The 8-virtual-device solve must match the single-device transpose-gather
solve (same block-Jacobi preconditioner -> same iteration trajectory), and
the compiled collectives must move INTERFACE-sized payloads, never
volume-sized ones.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from femx.assembly_tg import SolidOperatorTG
from femx.mesh import box_tet10
from femx.parallel.tg_sharded import ShardedTGOperator, pcg_tg_sharded
from femx.solve.cg import pcg


@pytest.fixture(scope="module")
def problem():
    h = 0.1
    mesh = box_tet10(0.4, 0.4, 1.6, h)
    conn = np.asarray(mesh.cells["tetra10"])
    pts = np.asarray(mesh.points)
    # randomize node labels so nothing structured survives
    rng = np.random.default_rng(3)
    relabel = rng.permutation(len(pts))
    pts_s = np.empty_like(pts)
    pts_s[relabel] = pts
    conn_s = relabel[conn]
    ndof = 3 * len(pts_s)
    mask = np.ones(ndof)
    for n in np.where(pts_s[:, 2] < 1e-9)[0]:
        mask[3 * n:3 * n + 3] = 0
    f = np.zeros(ndof)
    tip = np.where(pts_s[:, 2] > 1.6 - 1e-9)[0]
    f[3 * tip + 1] = -100.0 / len(tip)
    return pts_s, conn_s, mask, f


def test_sharded_apply_matches_single_device(problem):
    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = ShardedTGOperator.from_mesh(pts, conn, 2e11, 0.3, dmesh,
                                      dtype=np.float64,
                                      free_mask_global=mask)
    ref_op, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3,
                                          dtype=np.float64)
    ref_op = ref_op.with_free_mask(jnp.asarray(ref_op.to_internal(mask)))

    rng = np.random.default_rng(0)
    u = rng.standard_normal(3 * len(pts))

    spec = P("z")
    fn = jax.jit(jax.shard_map(
        lambda ub, mb, bv, a, b, c, d, e, g: sop._apply_constrained_local(
            ub[0], mb[0], a[0], b[0], c[0], d[0], e[0], g[0])[None],
        mesh=dmesh, in_specs=(spec,) * 9, out_specs=spec))
    y_st = fn(jnp.asarray(sop.scatter(u)), sop.mask_st, sop.binv_st,
              sop.dNg_st, sop.wdet_st, sop.conn_loc_st, sop.ell_idx_st,
              sop.send_up_st, sop.send_dn_st)
    y = sop.gather(np.asarray(y_st))

    y_ref = ref_op.to_global(np.asarray(ref_op.apply_constrained(
        jnp.asarray(ref_op.to_internal(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=1e-10,
                               atol=np.abs(y_ref).max() * 1e-12)


def test_sharded_pcg_matches_single_device(problem):
    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = ShardedTGOperator.from_mesh(pts, conn, 2e11, 0.3, dmesh,
                                      dtype=np.float64,
                                      free_mask_global=mask)
    x, it, res, ok = pcg_tg_sharded(sop, f * mask, tol=1e-8, maxiter=3000)
    assert ok, res

    ref_op, _ = SolidOperatorTG.from_mesh(pts, conn, 2e11, 0.3,
                                          dtype=np.float64)
    ref_op = ref_op.with_free_mask(jnp.asarray(ref_op.to_internal(mask)))
    bj = ref_op.soa.block_jacobi_tensors()
    ref = pcg(ref_op.apply_constrained,
              jnp.asarray(ref_op.to_internal(f * mask)),
              M_inv_diag=lambda r: ref_op.soa.apply_block_jacobi(bj, r),
              tol=1e-8, maxiter=3000)
    assert abs(it - int(ref.iterations)) <= 2, (it, int(ref.iterations))
    u_ref = ref_op.to_global(np.asarray(ref.x))
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(x, u_ref, atol=scale * 1e-7)


def test_sharded_comm_is_interface_sized(problem):
    pts, conn, mask, f = problem
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = ShardedTGOperator.from_mesh(pts, conn, 2e11, 0.3, dmesh,
                                      dtype=np.float64,
                                      free_mask_global=mask)
    # interface payload: S rows x 3 comps < owned volume Nl x 3 (on this
    # small test mesh each slab is only ~2 node-planes thick, so the ratio
    # is ~2x; it scales as surface/volume with mesh size)
    assert sop.S < sop.Nl, (sop.S, sop.Nl)

    spec = P("z")
    fn = jax.jit(jax.shard_map(
        lambda ub, mb, a, b, c, d, e, g: sop._apply_constrained_local(
            ub[0], mb[0], a[0], b[0], c[0], d[0], e[0], g[0])[None],
        mesh=dmesh, in_specs=(spec,) * 8, out_specs=spec))
    hlo = fn.lower(jnp.asarray(sop.scatter(f)), sop.mask_st, sop.dNg_st,
                   sop.wdet_st, sop.conn_loc_st, sop.ell_idx_st,
                   sop.send_up_st, sop.send_dn_st).compile().as_text()
    pat = re.compile(r"=\s*\(?\s*[a-z0-9]+\[([\d,]*)\][^=\n]*"
                     r"\b(collective-permute|all-gather|all-reduce)")
    matches = list(pat.finditer(hlo))
    assert matches, "no collectives found — scan is stale"
    limit = sop.S * 3 * 2  # one direction's rows (slack 2x for fusion)
    for m in matches:
        dims = [int(v) for v in m.group(1).split(",") if v]
        n = int(np.prod(dims)) if dims else 1
        assert n <= limit, (m.group(0)[:120], n, limit)


def test_sharded_rejects_thin_slabs():
    h = 0.1
    mesh = box_tet10(0.4, 0.4, 0.4, h)  # only ~4 elements deep in z
    pts = np.asarray(mesh.points)
    conn = np.asarray(mesh.cells["tetra10"])
    dmesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    with pytest.raises(ValueError, match="span"):
        ShardedTGOperator.from_mesh(pts, conn, 2e11, 0.3, dmesh,
                                    dtype=np.float64)
