"""Feature k-means for keypoint initialization (segment-sum based).

TPU-native twin of `feature_kmeans`
(/root/reference/utils/visualizer_utils.py:84-93): Lloyd's k-means over the
[xyz, motion_feature] concat (kmeans_pytorch, N7/N8 in SURVEY.md §2.2),
followed by a torch_scatter mean of member xyz per cluster. Assignment
distances ride the MXU ([N, K] matrix); centroid updates are
jax.ops.segment_sum. Fixed iteration count keeps shapes/trace static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.ops.knn import _sq_dists


def kmeans(features, k: int, key, n_iters: int = 50, valid=None):
    """Lloyd's k-means. Returns (centroids [k, D], assignment [N]).

    Seeding is furthest-point sampling from a random valid start (a
    deterministic k-means++-style spread; kmeans_pytorch uses plain random
    sampling, which is strictly worse at avoiding merged clusters). Empty
    clusters keep their previous centroid.
    """
    from gaussianprediction_tpu.ops.fps import furthest_point_sampling

    N, D = features.shape
    if valid is None:
        valid = jnp.ones((N,), bool)
    start = jax.random.randint(key, (), 0, N)
    init_idx = furthest_point_sampling(
        features, k, valid=valid, start_idx=start
    )
    centroids = features[init_idx]

    def step(centroids, _):
        d = _sq_dists(features, centroids)            # [N, k]
        d = jnp.where(valid[:, None], d, jnp.inf)
        assign = jnp.argmin(d, axis=-1)
        seg = jnp.where(valid, assign, k)             # dump invalid in slot k
        sums = jax.ops.segment_sum(
            jnp.where(valid[:, None], features, 0.0), seg, num_segments=k + 1
        )[:k]
        counts = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=k + 1
        )[:k]
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
            centroids,
        )
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    d = jnp.where(
        valid[:, None], _sq_dists(features, centroids), jnp.inf
    )
    assign = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return centroids, assign


def feature_kmeans(xyz, features, k: int, key, n_iters: int = 50, valid=None):
    """Reference `feature_kmeans` semantics (visualizer_utils.py:84-93):
    cluster `features` (= [xyz, motion_feature]), then return per-cluster
    MEAN XYZ of members as the keypoint position plus the feature centroid.

    Returns (super_xyz [k, 3], super_features [k, D]).
    """
    centroids, assign = kmeans(features, k, key, n_iters=n_iters, valid=valid)
    if valid is None:
        valid = jnp.ones((xyz.shape[0],), bool)
    seg = jnp.where(valid, assign, k)
    xyz_sum = jax.ops.segment_sum(
        jnp.where(valid[:, None], xyz, 0.0), seg, num_segments=k + 1
    )[:k]
    counts = jax.ops.segment_sum(
        valid.astype(jnp.float32), seg, num_segments=k + 1
    )[:k]
    super_xyz = jnp.where(
        counts[:, None] > 0,
        xyz_sum / jnp.maximum(counts[:, None], 1.0),
        centroids[:, :3],
    )
    return super_xyz, centroids
