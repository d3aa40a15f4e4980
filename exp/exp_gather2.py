"""Hash-encode gather variants: can anything beat XLA's ~6.4 ns/row?

  G1: flat[keys] baseline (== exp_hashfwd B)
  G2: sorted keys + indices_are_sorted + unique=False + PROMISE_IN_BOUNDS
  G3: 16 separate per-level gathers (1.6M rows each)
  G4: wide rows: [S/2, 8] table (half the rows, double width)
  G5: one-feature 1-D gather [S] x1 (row-width dependence)
  G6: Pallas dynamic_gather LUT microbench: [8, 128] lanes-axis LUT
      lookups at vector rate (is the primitive available + fast?)
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianprediction_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

M = 25_600_000
S = 8_400_000
REPS = 4
ITERS = 4


def timed(tag, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    try:
        _ = float(f(*args))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        _ = float(f(*args))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def chain(fn):
    def run(x):
        def body(i, carry):
            xx, acc = carry
            out = fn(xx)
            return xx + (1e-38 * out).astype(xx.dtype), acc + out
        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0.0)))
        return acc
    return run


def main():
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (S, 4), jnp.float32)
    keys = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, S)
    keys_srt = jnp.sort(keys)

    timed("G1 flat[keys]", chain(lambda k: jnp.sum(flat[k][::97])), keys)

    def g2(k):
        out = jax.lax.gather(
            flat, k[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            slice_sizes=(1, 4),
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return jnp.sum(out[::97])

    timed("G2 sorted+hints", chain(g2), keys_srt)

    kl = keys.reshape(16, M // 16)

    def g3(k):
        outs = [jnp.sum(flat[k[i]][::97]) for i in range(16)]
        return sum(outs)

    timed("G3 16 per-level gathers", chain(g3), kl)

    flat8 = flat.reshape(S // 2, 8)
    keys_h = keys[: M // 2] % (S // 2)

    def g4(k):
        return jnp.sum(flat8[k][::97])

    timed("G4 12.8M x [*,8] rows", chain(g4), keys_h)

    f1 = flat[:, 0]

    def g5(k):
        return jnp.sum(f1[k][::97])

    timed("G5 25.6M 1-D gather", chain(g5), keys)

    # G6: dynamic_gather LUT rate. x: [R, 128] broadcast LUT rows, idx
    # [R, 128] arbitrary lane indices -> out[i, j] = x[i, idx[i, j]].
    R = 512
    NLUT = 2048  # grid steps

    def lut_kernel(idx_ref, tbl_ref, out_ref):
        tbl = tbl_ref[...]
        idx = idx_ref[...]
        out_ref[...] = jnp.take_along_axis(tbl, idx, axis=1)

    def g6(idx):
        tbl = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(2), (1, 128), jnp.float32),
            (R, 128),
        ) + jnp.zeros((R, 128))
        out = pl.pallas_call(
            lut_kernel,
            grid=(NLUT,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda b: (b, 0)),
                pl.BlockSpec((R, 128), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((NLUT * R, 128), jnp.float32),
            interpret=False,
        )(idx, tbl)
        return jnp.sum(out[::513])

    idx6 = jax.random.randint(jax.random.PRNGKey(3), (NLUT * R, 128), 0, 128,
                              dtype=jnp.int32)
    n6 = NLUT * R * 128
    t = timed(f"G6 dynamic_gather LUT ({n6/1e6:.0f}M elems)", chain(g6), idx6)
    if t:
        print(f"   -> {t * 1e6 / n6:.3f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
