"""Mosaic repros: vectorized gather from a VMEM-resident table.

The unstructured SpMV's floor in XLA is per-INDEX gather cost (~5.25/2.1
ns/row narrow/wide, examples/bench_gather_width.py). An ELL kernel with u
resident in VMEM would instead stream only K (≈0.9 GB → ~1.1 ms/apply) IF
Mosaic can gather u[idx] for a (8, 128) vector of indices inside the
kernel. Each repro isolates one formulation; PASS/FAIL recorded on the
real chip like examples/pallas_mosaic_repros.py.

Run: python examples/pallas_gather_repros.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from femx.elements.pallas_structured import ensure_tpu_compile_env


def run(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"PASS  {name}: {np.asarray(out).ravel()[:3]}")
        return True
    except Exception as e:
        msg = str(e)
        for marker in ("Mosaic failed", "failed to legalize", "Unsupported",
                       "NotImplemented", "not implemented"):
            i = msg.find(marker)
            if i >= 0:
                msg = msg[i : i + 260]
                break
        else:
            msg = msg[:260]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


N_TAB = 16 * 1024  # table rows (VMEM resident: 64 KB f32)


def _table_and_idx():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal(N_TAB).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N_TAB, size=(8, 128)).astype(np.int32))
    return tab, idx


# 1. jnp.take on VALUES (table loaded into registers first)
def repro_take_values():
    tab, idx = _table_and_idx()

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


# 2. 2D table (rows, 128) + take along sublanes with row indices
def repro_take_rows_2d():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((N_TAB // 128, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N_TAB // 128, size=(8,)).astype(np.int32))

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


# 3. take_along_axis on the LANE axis (within-row permutation)
def repro_take_along_lanes():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, size=(8, 128)).astype(np.int32))

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


# 4. take_along_axis on the SUBLANE axis
def repro_take_along_sublanes():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, size=(8, 128)).astype(np.int32))

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


# 5. PrefetchScalarGridSpec-style: dynamic ref READ rows in a fori_loop
# (known-good pattern in pallas_structured, here with data-dependent index
# read from SMEM)
def repro_dynamic_ref_rows():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, size=(8,)).astype(np.int32))

    def kernel(t_ref, i_ref, o_ref):
        def body(q, c):
            o_ref[q, :] = t_ref[i_ref[q], :]
            return c

        jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


if __name__ == "__main__":
    print("devices:", jax.devices())
    ensure_tpu_compile_env()
    run("take_values_1d", repro_take_values)
    run("take_rows_2d", repro_take_rows_2d)
    run("take_along_lanes", repro_take_along_lanes)
    run("take_along_sublanes", repro_take_along_sublanes)
    run("dynamic_ref_rows_loop", repro_dynamic_ref_rows)
