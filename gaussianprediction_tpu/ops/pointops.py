"""pointops secondary ops as XLA compositions (SURVEY.md §2.2 N4).

The reference vendors the PointTransformer CUDA library
(/root/reference/submodules/lib/pointops/src/pointops_api.cpp:13-25); its
training path uses only `furthestsampling` (ops/fps.py). These are the
remaining kernels — grouping, queryandgroup, subtraction, aggregation,
IDW interpolation (/root/reference/utils/fps.py:108-274) — expressed as
jnp gather/reduce compositions: each CUDA kernel is a pure indexed
map-reduce, which XLA fuses on TPU, and JAX AD reproduces the hand-written
backward passes (the atomicAdd gradient scatters become deterministic
segment reductions) for free. Kept for API completeness so downstream
PointTransformer-style models can run unmodified.
"""
from __future__ import annotations

import jax.numpy as jnp

from gaussianprediction_tpu.ops.knn import knn


def grouping(input, idx):
    """input [n, c], idx [m, k] -> [m, k, c] gathered rows
    (grouping_forward_cuda twin; AD gives the scatter-add backward)."""
    return input[idx]


def queryandgroup(nsample: int, xyz, new_xyz, feat, idx=None,
                  use_xyz: bool = True):
    """KNN-group features around query points (utils/fps.py:139-160).

    xyz [n,3], new_xyz [m,3] (None -> xyz), feat [n,c] ->
    [m, k, 3+c] (use_xyz) or [m, k, c]; grouped xyz are query-centered.
    """
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        _, idx = knn(new_xyz, xyz, nsample)
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]        # [m, k, 3]
    grouped_feat = feat[idx]                            # [m, k, c]
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    return grouped_feat


def subtraction(input1, input2, idx):
    """input1 [n,c], input2 [n,c], idx [n,k] -> [n,k,c] with
    out[i,j] = input1[i] - input2[idx[i,j]]
    (subtraction_cuda_kernel.cu semantics)."""
    return input1[:, None, :] - input2[idx]


def aggregation(input, position, weight, idx):
    """out[i,c] = Σ_j (input[idx[i,j],c] + position[i,j,c]) · w[i,j,c%w_c]
    (aggregation_cuda_kernel.cu semantics; the weight's w_c channels are
    shared cyclically across the c feature channels)."""
    n, k, c = position.shape
    w_c = weight.shape[-1]
    reps = -(-c // w_c)
    w_full = jnp.tile(weight, (1, 1, reps))[:, :, :c]   # [n, k, c]
    return jnp.sum((input[idx] + position) * w_full, axis=1)


def interpolation(xyz, new_xyz, feat, k: int = 3, eps: float = 1e-8):
    """Inverse-distance-weighted feature interpolation
    (utils/fps.py:224-239): xyz [m,3] source positions, new_xyz [n,3]
    targets, feat [m,c] -> [n,c]."""
    d, idx = knn(new_xyz, xyz, k)
    # the CUDA wrapper weights by 1/(euclidean distance + eps)
    recip = 1.0 / (jnp.sqrt(d) + eps)                   # [n, k]
    w = recip / jnp.sum(recip, axis=1, keepdims=True)
    return jnp.sum(feat[idx] * w[:, :, None], axis=1)
