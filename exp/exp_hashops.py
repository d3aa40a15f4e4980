"""Measure XLA gather/scatter/sort variants at hash-grid shapes.

Hash-grid problem per level: 1.6M contributions (200k pts x 8 corners),
table [2^19, 4]. 16 levels. fwd = gather rows; bwd = scatter-add rows.
"""
import time

import jax
import jax.numpy as jnp

T = 2**19
M = 1_600_000
F = 4


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
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (T, F), jnp.float32)
    idx = jax.random.randint(k2, (M,), 0, T, jnp.int32)
    idx_sorted = jnp.sort(idx)
    vals = jax.random.normal(k3, (M, F), jnp.float32)

    # --- forward gather variants
    f_row = jax.jit(lambda t, i: t[i])
    print(f"gather_rows [M,4] random:  {timeit(f_row, table, idx):.2f} ms")
    print(f"gather_rows [M,4] sorted:  {timeit(f_row, table, idx_sorted):.2f} ms")

    # 8 separate gathers of 200k (current impl structure)
    def f_8x(t, i):
        outs = [t[i[j * 200000:(j + 1) * 200000]] for j in range(8)]
        return jnp.concatenate(outs, 0)
    print(f"gather 8x[200k,4] random:  {timeit(jax.jit(f_8x), table, idx):.2f} ms")

    # f64-packed rows: [T,2] f64 view, gather, view back
    table64 = jax.lax.bitcast_convert_type(
        table.reshape(T, 2, 2), jnp.float64)

    def f_64(t64, i):
        return jax.lax.bitcast_convert_type(t64[i], jnp.float32).reshape(-1, F)
    out = jax.jit(f_64)(table64, idx)
    ok = bool(jnp.allclose(out, table[idx]))
    print(f"gather_rows f64-packed:    {timeit(jax.jit(f_64), table64, idx):.2f} ms allclose={ok}")

    # gather with take_along_axis batched feature-major [F,T] -> cols
    tableT = table.T.copy()
    f_cols = jax.jit(lambda t, i: t[:, i])
    print(f"gather_cols [4,M] random:  {timeit(f_cols, tableT, idx):.2f} ms")

    # --- backward scatter variants
    def s_add(i, v):
        return jnp.zeros((T, F), jnp.float32).at[i].add(v)
    print(f"scatter_add [M,4] random:  {timeit(jax.jit(s_add), idx, vals, n=3):.2f} ms")

    def s_add_sorted(i, v):
        return jnp.zeros((T, F), jnp.float32).at[i].add(
            v, indices_are_sorted=True)
    print(f"scatter_add [M,4] sortflag:{timeit(jax.jit(s_add_sorted), idx_sorted, vals, n=3):.2f} ms")

    def s_add_ones(i):
        return jnp.zeros((T,), jnp.int32).at[i].add(1)
    print(f"scatter_add ones [M]:      {timeit(jax.jit(s_add_ones), idx, n=3):.2f} ms")

    # --- sort variants
    rank = jnp.arange(M, dtype=jnp.int32)

    def so2(k, r):
        return jax.lax.sort((k, r), num_keys=1, is_stable=True)
    print(f"sort flat 1.6M 2op:        {timeit(jax.jit(so2), idx, rank, n=5):.2f} ms")

    def so3(k, r, v64):
        return jax.lax.sort((k, r, v64), num_keys=1, is_stable=True)
    vals64 = jax.lax.bitcast_convert_type(vals.reshape(M, 2, 2), jnp.float64)
    try:
        f = jax.jit(lambda k, r, v: jax.lax.sort(
            (k, r, v[:, 0], v[:, 1]), num_keys=1, is_stable=True))
        ms = timeit(f, idx, rank, vals64, n=5)
        print(f"sort flat 1.6M 4op(f64x2): {ms:.2f} ms")
    except Exception as e:
        print(f"sort f64 payload: FAIL {type(e).__name__} {str(e)[:150]}")

    def so6(k, v):
        return jax.lax.sort((k, v[:, 0], v[:, 1], v[:, 2], v[:, 3]),
                            num_keys=1, is_stable=True)
    print(f"sort flat 1.6M 5op f32:    {timeit(jax.jit(so6), idx, vals, n=5):.2f} ms")

    # segment-reduce after sort: cumsum + boundary gather
    def seg(i_s, v_s):
        cs = jnp.concatenate([jnp.zeros((1, F)), jnp.cumsum(v_s, 0)], 0)
        # boundary positions via searchsorted
        pos = jnp.searchsorted(i_s, jnp.arange(T + 1, dtype=jnp.int32))
        return cs[pos[1:]] - cs[pos[:-1]]
    d1 = jax.jit(seg)(idx_sorted, vals)
    d0 = jax.jit(s_add)(idx_sorted, vals)
    ok = bool(jnp.allclose(d1, d0, atol=1e-3, rtol=1e-4))
    print(f"cumsum+searchsorted reduce:{timeit(jax.jit(seg), idx_sorted, vals, n=5):.2f} ms allclose={ok}")


if __name__ == "__main__":
    main()
