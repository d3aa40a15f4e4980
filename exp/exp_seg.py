"""Final bwd-design measurements: sorted segment_sum, big 5-op sort,
big cumsum, unique-sorted scatter, monotone gathers."""
import time

import jax
import jax.numpy as jnp

M = 25_600_000   # all-level contributions
TT = 6_430_000   # total table entries across levels (approx)


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    keys = jnp.sort(jax.random.randint(k1, (M,), 0, TT, jnp.int32))
    vals = jax.random.normal(k2, (M, 4), jnp.float32)

    # sorted segment_sum
    f = jax.jit(lambda i, v: jax.ops.segment_sum(
        v, i, num_segments=TT, indices_are_sorted=True))
    try:
        ms = timeit(f, keys, vals, n=3)
        print(f"segment_sum sorted 25.6M->6.4M: {ms:.1f} ms")
    except Exception as e:
        print(f"segment_sum: FAIL {str(e)[:150]}")

    # unique sorted scatter .set (placement of distinct runsums)
    uidx = jnp.unique(jax.random.randint(k1, (TT,), 0, TT, jnp.int32),
                      size=4_000_000, fill_value=TT - 1)
    uvals = jax.random.normal(k2, (4_000_000, 4), jnp.float32)
    fu = jax.jit(lambda i, v: jnp.zeros((TT, 4), jnp.float32).at[i].set(
        v, indices_are_sorted=True, unique_indices=True))
    ms = timeit(fu, uidx, uvals, n=3)
    print(f"scatter.set unique+sorted 4M rows: {ms:.1f} ms")

    # big 5-op sort
    rkeys = jax.random.randint(k1, (M,), 0, TT, jnp.int32)
    f5 = jax.jit(lambda k, v: jax.lax.sort(
        (k, v[:, 0], v[:, 1], v[:, 2], v[:, 3]), num_keys=1,
        is_stable=True))
    t0 = time.perf_counter()
    out = f5(rkeys, vals)
    _ = jax.device_get(out[0].ravel()[0])
    print(f"  (sort compile {time.perf_counter()-t0:.1f}s)")
    ms = timeit(f5, rkeys, vals, n=3)
    print(f"sort 25.6M 5op: {ms:.1f} ms")

    # big cumsum
    fc = jax.jit(lambda v: jnp.cumsum(v, axis=0))
    ms = timeit(fc, vals, n=3)
    print(f"cumsum [25.6M,4]: {ms:.1f} ms")

    # monotone gather of [6.4M, 4] rows
    pos = jnp.sort(jax.random.randint(k1, (TT,), 0, M, jnp.int32))
    fg = jax.jit(lambda v, p: v[p])
    ms = timeit(fg, vals, pos, n=3)
    print(f"monotone gather [6.4M,4]: {ms:.1f} ms")


if __name__ == "__main__":
    main()
