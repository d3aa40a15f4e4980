"""Decide the hash-grid ENCODE-FWD redesign (r1: one 25.6M-row random
gather ~150 ms dominates the stage-2 step after the bwd fix).

Candidate: sort contributions by table key per level (BATCHED [L, N*8]
sort along axis 1 — pass latency amortizes across levels), windowed
table reads, batched sort-back by position. Measures:

  A. current fwd encode (hashgrid_encode_fast impl) @200k
  B. raw XLA gather of 25.6M random keys from [8.4M, 4]
  C. the same gather with per-level-SORTED keys (cache locality probe)
  D. batched 2-op sort [16, 1.6M] axis=1 (key+pos)
  E. batched 6-op sort [16, 1.6M] axis=1 (pos + 4 vals + key)
  F. flat 2-op sort [25.6M]  (baseline vs batched)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from gaussianprediction_tpu.ops import hashgrid as HG

N = 200_000
L, C, F = 16, 8, 4
REPS = 4
ITERS = 4


def timed(tag, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    r = f(*args)
    _ = float(jnp.sum(r) if not isinstance(r, tuple) else jnp.sum(r[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        r = f(*args)
        _ = float(jnp.sum(r) if not isinstance(r, tuple) else jnp.sum(r[0]))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def chain(fn):
    def run(x):
        def body(i, carry):
            xx, acc = carry
            l = fn(xx)
            if jnp.issubdtype(x.dtype, jnp.integer):
                # runtime-zero feedback (defeats hoisting; exact for ints)
                fb = (l * 1e-38).astype(x.dtype)
            else:
                fb = (1e-38 * l).astype(x.dtype)
            return xx + fb, acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0.0)))
        return acc
    return run


def main():
    key = jax.random.PRNGKey(0)
    tables = HG.init_hashgrid(key, n_levels=L, n_features=F, log2_T=19)
    specs, total = HG.hashgrid_specs(tables, 16, 2048)
    xyz = jax.random.uniform(key, (N, 3), jnp.float32, -1.5, 1.5)
    flat = HG._flat_tables(tables)
    keys, w = HG.hashgrid_keys_weights(xyz, specs, 1.6)   # [L, N, 8]

    def enc(x):
        return jnp.sum(HG.hashgrid_encode_fast(tables, x)[::31])

    timed("A. current fwd encode", chain(enc), xyz)

    keys_f = keys.reshape(-1)                              # [N*L*8]
    keys_srt = jnp.sort(keys_f)

    def gath(kf):
        return jnp.sum(flat[kf][::97])

    timed("B. random gather 25.6M x4", chain(gath), keys_f)
    timed("C. sorted-key gather 25.6M x4", chain(gath), keys_srt)

    # per-level local keys [L, N*8]
    kloc = keys.reshape(L, N * C)
    pos = jnp.broadcast_to(
        jnp.arange(N * C, dtype=jnp.int32)[None, :], (L, N * C)
    )

    def sortD(k):
        s = jax.lax.sort((k, pos), dimension=1, num_keys=1, is_stable=False)
        return jnp.sum(s[1][:, ::101].astype(jnp.float32))

    timed("D. batched 2-op sort [16,1.6M]", chain(sortD), kloc)

    vals = jax.random.normal(key, (4, L, N * C), jnp.float32)

    def sortE(k):
        s = jax.lax.sort(
            (k, pos, vals[0], vals[1], vals[2], vals[3]),
            dimension=1, num_keys=1, is_stable=False,
        )
        return jnp.sum(s[2][:, ::101])

    timed("E. batched 6-op sort [16,1.6M]", chain(sortE), kloc)

    def sortF(k):
        s = jax.lax.sort((k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                         num_keys=1, is_stable=False)
        return jnp.sum(s[1][::101].astype(jnp.float32))

    timed("F. flat 2-op sort 25.6M", chain(sortF), keys_f)


if __name__ == "__main__":
    main()
