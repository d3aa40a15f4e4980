"""Validate scatter_add_sorted on real TPU: compile, correctness, timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.ops.hashgrid_pallas import scatter_add_sorted

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

# 1. correctness at moderate size, F=4
for (M, S, F) in ((100_000, 50_000, 4), (500_000, 204_800, 10)):
    keys = np.sort(rng.integers(0, S, M).astype(np.int32))
    vals = rng.normal(size=(F, M)).astype(np.float32)
    out = np.asarray(
        jax.jit(lambda k, v: scatter_add_sorted(k, v, S))(
            jnp.asarray(keys), jnp.asarray(vals))
    )
    ref = np.zeros((F, S), np.float32)
    np.add.at(ref, (slice(None), keys), vals)
    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"M={M} S={S} F={F}: rel err {err:.2e}", flush=True)
    assert err < 1e-5

# 2. production-shape timing: hash-grid bwd (26.2M contribs, F=4)
M = 204_800 * 16 * 8
S = 4_500_000
keys = jnp.sort(jnp.asarray(rng.integers(0, S, M).astype(np.int32)))
vals = jnp.asarray(rng.normal(size=(4, M)).astype(np.float32))

f = jax.jit(lambda k, v: scatter_add_sorted(k, v, S))


def rep(k, v):
    def body(i, acc):
        o = f(k, v + acc * 1e-38)
        return acc + o[0, 0]
    return jax.lax.fori_loop(0, 5, body, jnp.float32(0))


g = jax.jit(rep)
_ = float(g(keys, vals))
t0 = time.time()
_ = float(g(keys, vals))
print(f"scatter_add_sorted 26.2M->4.5M F=4: {(time.time()-t0)/5*1000:.1f} ms",
      flush=True)
