"""Is XLA TPU gather/scatter cost per-row or per-element?"""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
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
    for rows, width, T in [
        (1_600_000, 4, 2**19),
        (200_000, 4, 2**19),
        (200_000, 32, 2**18),
        (200_000, 128, 2**16),
        (25_600_000, 4, 2**19),   # all-level fused single gather
        (3_200_000, 32, 2**18),   # all-level fused cell gather
    ]:
        table = jax.random.normal(k1, (T, width), jnp.float32)
        idx = jax.random.randint(k2, (rows,), 0, T, jnp.int32)
        g = jax.jit(lambda t, i: t[i])
        ms = timeit(g, table, idx, n=5)
        print(f"gather rows={rows:>9} w={width:>3}: {ms:7.2f} ms "
              f"({rows/ms/1e3:8.0f} krows/ms... /s*1e3)")
        if rows <= 1_600_000:
            vals = jax.random.normal(k2, (rows, width), jnp.float32)
            s = jax.jit(lambda i, v: jnp.zeros((T, width), jnp.float32)
                        .at[i].add(v))
            ms = timeit(s, idx, vals, n=3)
            print(f"scatter rows={rows:>8} w={width:>3}: {ms:7.2f} ms")
        # sort at this row count (key + 2 payload)
        r = jnp.arange(rows, dtype=jnp.int32)
        so = jax.jit(lambda k, r: jax.lax.sort((k, r), num_keys=1,
                                               is_stable=True))
        ms = timeit(so, idx, r, n=5)
        print(f"sort   rows={rows:>9}      : {ms:7.2f} ms")


if __name__ == "__main__":
    main()
