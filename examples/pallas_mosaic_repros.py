"""Minimal repros for the Mosaic-TPU lowering failures that block the
compiled femx.elements.pallas_structured kernel (VERDICT r1 next #9).

Each repro is a tiny standalone pallas_call isolating ONE pattern the
structured kernel needs. Run on the real chip (axon platform); each prints
PASS (compiles + executes) or the Mosaic error. Compiling Pallas through the
axon remote-compile helper additionally requires TPU metadata in the
environment (the helper's env is scrubbed for confinement):

    TPU_ACCELERATOR_TYPE=v5litepod-1 TPU_WORKER_HOSTNAMES=localhost \
    TPU_WORKER_ID=0 python examples/pallas_mosaic_repros.py

Without these, libtpu-init fails before Mosaic even runs (HTTP 500 from
tpu_compile_helper). With them, compilation proceeds to genuine Mosaic
results, recorded below per pattern.
"""

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"PASS  {name}: {np.asarray(out).ravel()[:3]}")
    except Exception as e:
        msg = str(e)
        for marker in ("Mosaic failed", "failed to legalize", "Unsupported"):
            i = msg.find(marker)
            if i >= 0:
                msg = msg[i : i + 300]
                break
        else:
            msg = msg[:300]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")


# --- pattern 1: shape-cast merging lane dims -------------------------------
# The natural formulation reshapes a (81, cx, ny, nz) VMEM value to
# (81, cx*ny*nz) to feed one big MXU dot.
def repro_reshape_merge():
    def kernel(x_ref, o_ref):
        v = x_ref[...]  # (8, 4, 128)
        o_ref[...] = v.reshape(8, 4 * 128)

    x = jnp.arange(8 * 4 * 128, dtype=jnp.float32).reshape(8, 4, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# --- pattern 2: dynamic_slice on a VALUE (not a ref) ------------------------
# Slot extraction from an already-loaded phase grid at a traced offset.
def repro_dynslice_value():
    def kernel(x_ref, i_ref, o_ref):
        v = x_ref[...]  # (16, 128) value in registers/VMEM
        i = i_ref[0]
        o_ref[...] = jax.lax.dynamic_slice(v, (i, 0), (8, 128))

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    i = jnp.array([4], dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i)


# --- pattern 3: fori_loop with integer carry + dynamic ref writes -----------
# The strip loop of the structured kernel: an int32 carry through
# lax.fori_loop whose body does dynamic scratch writes. Mosaic fails to
# legalize the loop's func.return (i64/i32 operands).
def repro_strip_loop():
    def kernel(x_ref, o_ref, scratch):
        def body(q, carry):
            q = q.astype(jnp.int32)
            scratch[q, :] = x_ref[q, :] * 2.0
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(8), body, jnp.int32(0))
        o_ref[...] = scratch[...]

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)


# --- variant 3b: same loop with a float carry -------------------------------
def repro_strip_loop_f32_carry():
    def kernel(x_ref, o_ref, scratch):
        def body(q, carry):
            q = q.astype(jnp.int32)
            scratch[q, :] = x_ref[q, :] * 2.0
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(8), body, jnp.float32(0.0))
        o_ref[...] = scratch[...]

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)


# --- variant 3c: python-int bounds (i64 under x64) ---------------------------
def repro_strip_loop_pyint_bounds():
    def kernel(x_ref, o_ref, scratch):
        def body(q, carry):
            q = q.astype(jnp.int32)
            scratch[q, :] = x_ref[q, :] * 2.0
            return carry

        jax.lax.fori_loop(0, 8, body, 0)
        o_ref[...] = scratch[...]

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)


if __name__ == "__main__":
    print("x64:", jax.config.jax_enable_x64, "devices:", jax.devices())
    run("reshape_merge_lanes", repro_reshape_merge)
    run("dynamic_slice_on_value", repro_dynslice_value)
    run("fori_loop_int_carry", repro_strip_loop)
    run("fori_loop_f32_carry", repro_strip_loop_f32_carry)
    run("fori_loop_pyint_bounds", repro_strip_loop_pyint_bounds)
