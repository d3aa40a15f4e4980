"""Benchmark the sort+Pallas hash-grid VJP vs plain AD at production shapes."""
import time

import jax
import jax.numpy as jnp

for _attempt in range(10):  # the axon tunnel's init is flaky; retry
    try:
        jax.devices()
        break
    except RuntimeError as e:
        print("init retry:", e)
        time.sleep(30)

from gaussianprediction_tpu.ops import hashgrid as hg

N = 200_000
key = jax.random.PRNGKey(0)
tables = hg.init_hashgrid(key, n_levels=16, n_features=4, log2_T=19,
                          n_min=16, max_res=2048)
xyz = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), jnp.float32,
                         -1.5, 1.5)
cot_shape = (N, 16 * 4)
cot = jax.random.normal(jax.random.PRNGKey(2), cot_shape)


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    # force a host read (tunnel returns at enqueue)
    s = float(jax.tree.leaves(out)[0].ravel()[0])
    compile_s = time.time() - t0
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    s += float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms (compile {compile_s:.0f}s) [{s:.2e}]")


@jax.jit
def fwd_old(t):
    return jnp.sum(hg.hashgrid_encode(t, xyz) * cot)


@jax.jit
def fwd_new(t):
    return jnp.sum(hg.hashgrid_encode_fast(t, xyz) * cot)


grad_old = jax.jit(jax.grad(lambda t: jnp.sum(hg.hashgrid_encode(t, xyz) * cot)))
grad_new = jax.jit(jax.grad(lambda t: jnp.sum(hg.hashgrid_encode_fast(t, xyz) * cot)))

timed("fwd old", fwd_old, tables)
timed("fwd new", fwd_new, tables)
timed("grad new (sort+pallas)", grad_new, tables)
timed("grad old (AD scatter)", grad_old, tables)

# correctness spot check at a smaller N on device
N2 = 20_000
xyz2 = xyz[:N2]
cot2 = cot[:N2]
g_old = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode(t, xyz2) * cot2))(tables)
g_new = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode_fast(t, xyz2) * cot2))(tables)
import numpy as np
for l in (0, 7, 15):
    k = f"level_{l}"
    a, b = np.asarray(g_old[k]), np.asarray(g_new[k])
    print(k, "allclose:", np.allclose(a, b, atol=1e-5),
          "maxdiff:", float(np.abs(a - b).max()))
