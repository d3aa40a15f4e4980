"""Experiment: can Mosaic do vectorized dynamic gathers from a VMEM table?

Tests jnp.take / indexing with a traced index vector inside a TPU Pallas
kernel, at hash-grid-like shapes (table [T,4], many random indices).
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 2**19
F = 4
NIDX = 8192


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # force device->host read (tunnel returns at enqueue)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jax.random.randint(key, (NIDX,), 0, T, jnp.int32)

    # --- variant 1: jnp.take along axis 0 of full-VMEM table
    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    f1 = pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((NIDX, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(f1)(table, idx)
        ref = table[idx]
        ok = jnp.allclose(out, ref)
        ms = timeit(jax.jit(f1), table, idx)
        print(f"take_axis0: OK allclose={ok} {ms:.3f} ms for {NIDX} rows")
    except Exception as e:
        print(f"take_axis0: FAIL {type(e).__name__}: {str(e)[:300]}")

    # --- variant 2: table transposed [F, T], gather along last axis
    tableT = table.T.copy()

    def k_take_last(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=1)

    f2 = pl.pallas_call(
        k_take_last,
        out_shape=jax.ShapeDtypeStruct((F, NIDX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(f2)(tableT, idx)
        ref = tableT[:, idx]
        ok = jnp.allclose(out, ref)
        ms = timeit(jax.jit(f2), tableT, idx)
        print(f"take_axis_last: OK allclose={ok} {ms:.3f} ms for {NIDX} cols")
    except Exception as e:
        print(f"take_axis_last: FAIL {type(e).__name__}: {str(e)[:300]}")

    # --- variant 3: one-element-at-a-time fori_loop gather (baseline)
    def k_loop(tab_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tab_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, NIDX, body, 0)

    f3 = pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((NIDX, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(f3)(table, idx)
        ref = table[idx]
        ok = jnp.allclose(out, ref)
        ms = timeit(jax.jit(f3), table, idx, n=5)
        print(f"loop_gather: OK allclose={ok} {ms:.3f} ms for {NIDX} rows")
    except Exception as e:
        print(f"loop_gather: FAIL {type(e).__name__}: {str(e)[:300]}")

    # --- XLA reference timing at same shape
    fx = jax.jit(lambda t, i: t[i])
    ms = timeit(fx, table, idx)
    print(f"xla_gather:  {ms:.3f} ms for {NIDX} rows")

    # XLA at full hash-grid scale: 1.6M rows
    idx_big = jax.random.randint(key, (1600000,), 0, T, jnp.int32)
    ms = timeit(fx, table, idx_big, n=5)
    print(f"xla_gather_1.6M: {ms:.3f} ms")


if __name__ == "__main__":
    main()
