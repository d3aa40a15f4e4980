"""Furthest point sampling as a JAX scan.

TPU-native twin of pointops `furthestsampling` (reference submodule N4,
/root/reference/submodules/lib/pointops/src/sampling/sampling_cuda_kernel.cu
via utils/fps.py:71-88): the CUDA kernel is itself a serial loop of parallel
distance reductions, which maps directly onto lax.fori_loop + masked argmax
(SURVEY.md §2.2). Used for adaptive keypoint growth
(/root/reference/scene/gaussian_model.py:196-212).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sampling(points, n_samples: int, valid=None,
                            start_idx: int = 0):
    """Select n_samples indices by iterative furthest-point sampling.

    points: [N, D]; valid: [N] bool mask (invalid points never selected and
    don't influence distances). Returns idx [n_samples] int32. If fewer than
    n_samples valid points exist, extra slots repeat the furthest point
    (callers mask by count). Matches the CUDA kernel's seeding (index 0).
    """
    N = points.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    big = jnp.float32(1e10)
    # seed: first valid point at/after start_idx (CUDA uses index 0)
    first = jnp.argmax(
        valid & (jnp.arange(N) >= start_idx)
    ).astype(jnp.int32)

    def body(i, carry):
        min_d, idx = carry
        last = idx[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        cand = jnp.where(valid, min_d, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        return min_d, idx.at[i].set(nxt)

    idx0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(first)
    _, idx = jax.lax.fori_loop(
        1, n_samples, body, (jnp.full((N,), big), idx0)
    )
    return idx
