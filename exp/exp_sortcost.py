"""Measure lax.sort cost vs length and operand count + stream breakdown.

Grounds the round-2 binning redesign: the instance-stream fwd runs two
9-operand stable sorts over Pp = capacity + num_tiles*CHUNK (~3.7M);
the bwd two more plus a [Pp,10] cumsum. Questions:
  1. sort ms vs n (2.4M vs 3.7M) — is dropping the 1.28M dummy rows worth
     a monotone re-layout gather?
  2. sort ms vs operand count (2..9) — is bf16-packing channels worth it?
  3. cumsum [n,10] axis=0 cost vs Pallas scatter_add_sorted.
  4. monotone row-gather [3.7M,16] cost (for the dummy-free re-layout).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def timeit(f, *args, iters=2):
    """Repeat the op REPS times INSIDE one jit (tunnel RTT is ~20-50 ms per
    dispatch, swamping per-call timing) and sync on a device-side scalar.
    The first arg is perturbed with the loop counter so XLA can't hoist."""

    def rep(*a):
        def body(i, carry):
            acc, x0 = carry
            if jnp.issubdtype(x0.dtype, jnp.integer):
                x = x0 ^ (i & 1)
            else:
                x = x0 + (i & 1).astype(x0.dtype) * 1e-12
            r = f(x, *a[1:])
            leaf = jax.tree.leaves(r)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32), x0

        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), a[0]))
        return acc

    g = jax.jit(rep)
    _ = float(g(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        _ = float(g(*args))
    return (time.time() - t0) / (iters * REPS) * 1000


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    part2 = "--part2" in sys.argv
    rng = np.random.default_rng(0)
    for n in () if part2 else (2_457_600, 3_737_600):
        keys = jnp.asarray(rng.integers(0, 10001, n).astype(np.int32))
        vals = [jnp.asarray(rng.normal(size=n).astype(np.float32))
                for _ in range(9)]
        for nops in (2, 5, 6, 9):
            f = jax.jit(
                lambda k, *v: jax.lax.sort((k,) + v, num_keys=1,
                                           is_stable=True)
            )
            ms = timeit(f, keys, *vals[: nops - 1])
            print(f"sort n={n} ops={nops}: {ms:.2f} ms", flush=True)

    n = 3_737_600
    x = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
    if not part2:
        ms = timeit(jax.jit(lambda a: jnp.cumsum(a, axis=0)), x)
        print(f"cumsum [n,10] axis=0: {ms:.2f} ms", flush=True)
        xt = jnp.asarray(np.ascontiguousarray(x.T))
        ms = timeit(jax.jit(lambda a: jnp.cumsum(a, axis=1)), xt)
        print(f"cumsum [10,n] axis=1: {ms:.2f} ms", flush=True)

        # monotone row gather [n,16] from sorted indices
        mat = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
        idx = jnp.sort(jnp.asarray(rng.integers(0, n, n).astype(np.int32)))
        ms = timeit(jax.jit(lambda m, i: m[i]), mat, idx)
        print(f"monotone row gather [n,16]: {ms:.2f} ms", flush=True)
        matT = jnp.asarray(np.ascontiguousarray(mat.T))
        ms = timeit(jax.jit(lambda m, i: m[:, i]), matT, idx)
        print(f"monotone col gather [16,n]: {ms:.2f} ms", flush=True)
        # small-table gathers (the shapes build_instances actually uses)
        Nsm = 204_800
        sm = jnp.asarray(rng.normal(size=(Nsm, 16)).astype(np.float32))
        idx_mono = jnp.sort(
            jnp.asarray(rng.integers(0, Nsm, n).astype(np.int32))
        )
        ms = timeit(jax.jit(lambda m, i: m[i]), sm, idx_mono)
        print(f"monotone gather [205k,16] at 3.7M idx: {ms:.2f} ms",
              flush=True)
        idx_rand = jnp.asarray(rng.integers(0, Nsm, Nsm).astype(np.int32))
        ms = timeit(jax.jit(lambda m, i: m[i]), sm, idx_rand)
        print(f"random gather [205k,16] at 205k idx: {ms:.2f} ms",
              flush=True)

    # Pallas segment-reduce of sorted keys vs cumsum trick
    from gaussianprediction_tpu.ops.hashgrid_pallas import scatter_add_sorted

    N_slots = 204800
    gid = jnp.sort(jnp.asarray(rng.integers(0, N_slots, n).astype(np.int32)))
    valsT = jnp.asarray(np.ascontiguousarray(x.T))
    ms = timeit(
        jax.jit(lambda k, v: scatter_add_sorted(k, v, N_slots)), gid, valsT
    )
    print(f"pallas scatter_add_sorted [10,n]->[10,204800]: {ms:.2f} ms",
          flush=True)

    def cumsum_reduce(k, v):  # current bwd trick
        cs = jnp.concatenate(
            [jnp.zeros((1, 10), jnp.float32), jnp.cumsum(v, axis=0)], axis=0
        )
        counts = jnp.zeros((N_slots,), jnp.int32).at[k].add(1)
        ends = jnp.cumsum(counts)
        starts = ends - counts
        return cs[ends] - cs[starts]

    ms = timeit(jax.jit(cumsum_reduce), gid, x)
    print(f"cumsum-boundary reduce [n,10]->[204800,10]: {ms:.2f} ms",
          flush=True)

    # full stream fwd/bwd at production shapes
    from gaussianprediction_tpu.ops import instance_stream as IS

    N = 204800
    feat = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.2, 8, N).astype(np.float32))
    tmin = jnp.asarray(
        np.stack([rng.integers(0, 95, N), rng.integers(0, 95, N)], 1)
        .astype(np.int32))
    ext = rng.integers(1, 6, (N, 2)).astype(np.int32)
    tmax = tmin + jnp.asarray(ext)
    vis = jnp.asarray(np.ones(N, bool))
    cap = 12 * N

    f_fwd = jax.jit(
        lambda *a: IS.build_instances(*a, 100, 100, cap, 64).inst
    )
    ms = timeit(f_fwd, feat, depth, tmin, tmax, vis)
    print(f"build_instances fwd: {ms:.2f} ms", flush=True)

    def loss(feat):
        s = IS.build_instances(feat, depth, tmin, tmax, vis, 100, 100,
                               cap, 64)
        return jnp.sum(s.inst[:10] ** 2)

    f_both = jax.jit(jax.grad(loss))
    ms = timeit(f_both, feat)
    print(f"build_instances fwd+bwd: {ms:.2f} ms", flush=True)
