"""Can one 11/12-operand lax.sort replace the paired 8+3 sorts?

Round-1 notes say >~10 operands compile for minutes; sorts are nearly flat
in operand count at runtime (exp_sortcost), so ONE fused sort would save
~9 ms per sort pair in the instance stream fwd AND bwd. Measure compile
time + runtime for 10/11/12 operands at the production length.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exp.exp_sortcost import timeit

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
n = 3_332_096  # capacity_multiplier=10 bench shape + TC
keys = jnp.asarray(rng.integers(0, 10001, n).astype(np.int32))
vals = [jnp.asarray(rng.normal(size=n).astype(np.float32)) for _ in range(12)]

for nops in (10, 11, 12):
    f = jax.jit(
        lambda k, *v: jax.lax.sort((k,) + v, num_keys=1, is_stable=True)
    )
    t0 = time.time()
    r = jax.block_until_ready(f(keys, *vals[: nops - 1]))
    compile_s = time.time() - t0
    ms = timeit(f, keys, *vals[: nops - 1])
    print(f"sort n={n} ops={nops}: compile {compile_s:.1f}s run {ms:.2f} ms",
          flush=True)
