"""Dissect build_instances_bwd (52 ms measured, exp_bwdbreak S2-S1) at the
production shape (Pp ~ 2.37M sorted cotangent lanes, N = 200k).

  B1: the 11-operand gid sort alone
  B2: + counts_id scatter + starts/ends
  B3: + 10 per-channel cumsums + boundary gathers  (== current bwd)
  B4: batched variant: ONE [16, Pp] cumsum along lanes + row-wise
      boundary gathers (6 zero rows ride along for sublane tiling)
  B5: cumsums only (10 x 1-D, isolate their share)
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

N = 200_000
Pp = 72 * 32768        # ~2.36M, multiple of the interleave block
REPS = 8
ITERS = 4


def timed(tag, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(f(*args))
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
    d_inst = jax.random.normal(key, (16, Pp), jnp.float32)
    # plausible gid channel: ~12 instances per gaussian, rest -1
    gidnp = np.random.default_rng(0).integers(0, N, Pp).astype(np.int32)
    gidnp[np.random.default_rng(1).uniform(size=Pp) < 0.4] = -1
    gid = jnp.asarray(gidnp)
    kept = jnp.asarray(np.bincount(gidnp[gidnp >= 0], minlength=N)
                       .astype(np.int32))
    gid_s = jnp.arange(N, dtype=jnp.int32)  # identity depth order

    def b1(d):
        dch = tuple(d[c] for c in range(10))
        b = jax.lax.sort((gid,) + dch, num_keys=1, is_stable=True)
        return sum(jnp.sum(x[::37]) for x in b[1:4])

    timed("B1 11-op gid sort", chain(b1), d_inst)

    def b3(d):
        dch = tuple(d[c] for c in range(10))
        b = jax.lax.sort((gid,) + dch, num_keys=1, is_stable=True)
        counts_id = jnp.zeros((N,), jnp.int32).at[gid_s].set(kept)
        n_neg = Pp - jnp.sum(counts_id)
        ends = n_neg + jnp.cumsum(counts_id)
        starts = ends - counts_id
        zero1 = jnp.zeros((1,), jnp.float32)
        cols = []
        for c in range(10):
            cs = jnp.concatenate([zero1, jnp.cumsum(b[1 + c])])
            cols.append(cs[ends] - cs[starts])
        dfeat = jnp.stack(cols, axis=1)
        return jnp.sum(dfeat[::31])

    timed("B3 full current bwd", chain(b3), d_inst)

    from gaussianprediction_tpu.ops import expand_pallas as EXP

    def b4(d):
        dch = tuple(d[c] for c in range(10))
        b = jax.lax.sort((gid,) + dch, num_keys=1, is_stable=True)
        counts_id = jnp.zeros((N,), jnp.int32).at[gid_s].set(kept)
        n_neg = Pp - jnp.sum(counts_id)
        ends = n_neg + jnp.cumsum(counts_id)
        starts = ends - counts_id
        # one batched cumsum over a [16, Pp] stack (pallas interleave
        # assembles the stack; rows 10-15 are zeros/aux and ride along)
        mat = EXP.interleave_rows(b[1:] + (b[0].astype(jnp.float32),),
                                  interpret=False)
        cs = jnp.cumsum(mat, axis=1)
        cols = []
        for c in range(10):
            row = jnp.concatenate([jnp.zeros((1,), jnp.float32), cs[c]])
            cols.append(row[ends] - row[starts])
        dfeat = jnp.stack(cols, axis=1)
        return jnp.sum(dfeat[::31])

    timed("B4 batched [16,Pp] cumsum", chain(b4), d_inst)

    def b5(d):
        acc = jnp.float32(0.0)
        for c in range(10):
            cs = jnp.cumsum(d[c])
            acc = acc + jnp.sum(cs[::53])
        return acc

    timed("B5 10x 1-D cumsum only", chain(b5), d_inst)


if __name__ == "__main__":
    main()
