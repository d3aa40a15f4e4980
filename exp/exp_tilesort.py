"""Dissect T5 (tile sort + stack = 30 ms, exp_streambreak2): where do the
21 non-sort ms go, and is a cheaper structure available?

  S1: 12-op stable sort alone (pre-concatenated operands)
  S2: + the 11 dummy concats before it (== T5 minus stack/valid)
  S3: + validch + [16, Pp] stack (== T5)
  S4: 12-op UNSTABLE sort with (key, slot-iota) as 2 keys (total order ==
      stable semantics since the pair is unique) — stability-machinery A/B
  S5: stack alone on presorted channels
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

CAP = 2_000_000
TC = 2500 * 128
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
    Pp = CAP + TC
    soa = jax.random.normal(key, (16, CAP), jnp.float32)
    keys_full = jax.random.randint(jax.random.PRNGKey(1), (Pp,), 0, 2501)
    d_key = jax.random.randint(jax.random.PRNGKey(2), (TC,), 0, 2501)
    d_zero = jnp.zeros((TC,), jnp.float32)
    chans_full = tuple(
        jax.random.normal(jax.random.PRNGKey(3 + c), (Pp,), jnp.float32)
        for c in range(11)
    )

    def s1(k):
        s = jax.lax.sort((k,) + chans_full, num_keys=1, is_stable=True)
        return sum(jnp.sum(x[::37]) for x in s[1:4])

    timed("S1 12-op stable sort alone", chain(s1), keys_full)

    def s2(x):
        key_i = (x[11].astype(jnp.int32) % 2501)
        all_key = jnp.concatenate([key_i, d_key])
        chans = tuple(
            jnp.concatenate([x[c], d_zero]) for c in range(10)
        ) + (jnp.concatenate([x[10], d_zero - 1.0]),)
        s = jax.lax.sort((all_key,) + chans, num_keys=1, is_stable=True)
        return sum(jnp.sum(v[::37]) for v in s[1:4])

    timed("S2 concats + sort", chain(s2), soa)

    def s3(x):
        key_i = (x[11].astype(jnp.int32) % 2501)
        all_key = jnp.concatenate([key_i, d_key])
        chans = tuple(
            jnp.concatenate([x[c], d_zero]) for c in range(10)
        ) + (jnp.concatenate([x[10], d_zero - 1.0]),)
        s = jax.lax.sort((all_key,) + chans, num_keys=1, is_stable=True)
        gid_sorted = s[-1]
        validch = (gid_sorted >= 0.0).astype(jnp.float32)
        inst = jnp.stack(
            s[1:] + (validch, jnp.zeros_like(validch),
                     jnp.zeros_like(validch), jnp.zeros_like(validch),
                     jnp.zeros_like(validch)), axis=0)
        return jnp.sum(inst[:, ::31])

    timed("S3 concats+sort+stack (==T5)", chain(s3), soa)

    iota = jnp.arange(Pp, dtype=jnp.int32)

    def s4(k):
        s = jax.lax.sort((k, iota) + chans_full[:10], num_keys=2,
                         is_stable=False)
        return sum(jnp.sum(x[::37]) for x in s[2:5])

    timed("S4 2-key unstable 12-op sort", chain(s4), keys_full)

    def s5(x):
        gid_sorted = x[10]
        validch = (gid_sorted >= 0.0).astype(jnp.float32)
        pad = jnp.concatenate([x[:CAP // TC * 0 + 11], ], axis=0)  # no-op
        chans = tuple(x[c] for c in range(11))
        inst = jnp.stack(
            chans + (validch, jnp.zeros_like(validch),
                     jnp.zeros_like(validch), jnp.zeros_like(validch),
                     jnp.zeros_like(validch)), axis=0)
        return jnp.sum(inst[:, ::31])

    timed("S5 stack alone", chain(s5), soa)


if __name__ == "__main__":
    main()
