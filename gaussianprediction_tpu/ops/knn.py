"""K-nearest-neighbor ops: blocked brute-force distances through the MXU.

TPU-native replacement for three CUDA components (SURVEY.md §2.2):
  N2 simple-knn `distCUDA2` -> mean_knn_sq_dist (K=3 mean squared distance,
     used once for initial scales, /root/reference/scene/gaussian_model.py:341)
  N3 FRNN `frnn_grid_points`  -> knn (K=6, 3-d "3D" mode and 35-d "hybird"
     xyz ⊕ amplified-motion-feature mode, gaussian_model.py:111-125). The
     reference's grid acceleration doesn't extend to 35-d; on TPU an
     N x M distance matrix through the MXU is faster anyway (M = #keypoints
     <= 350, so the matrix is tiny; for N x N we block over rows).
  N6 pytorch3d `knn_points` (K=1 lookup on keypoint growth,
     gaussian_model.py:208) -> knn with K=1.

All distances are squared-L2 computed as ||x||^2 + ||y||^2 - 2 x.y so the
inner product rides the MXU; top-K via jax.lax.top_k on negated distances.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sq_dists(q, p):
    """[Nq, D] x [Np, D] -> [Nq, Np] squared distances (MXU inner product)."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    pn = jnp.sum(p * p, axis=-1, keepdims=True)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32)
    return jnp.maximum(qn + pn.T - 2.0 * cross, 0.0)


def knn(queries, points, k: int, query_valid=None, point_valid=None,
        block: int = 4096):
    """Exact K-nearest neighbors: returns (sq_dists [Nq,k], idx [Nq,k]).

    Invalid points get +inf distance (masked out); invalid queries return
    index 0 / dist inf. Blocked over query rows to bound the [block, Np]
    distance tile in VMEM/HBM.
    """
    Np = points.shape[0]
    inf = jnp.float32(jnp.inf)
    pmask = (
        jnp.zeros((Np,), bool) if point_valid is None else ~point_valid
    )

    def one_block(qb):
        d = _sq_dists(qb, points)
        d = jnp.where(pmask[None, :], inf, d)
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx.astype(jnp.int32)

    Nq = queries.shape[0]
    if Nq <= block:
        d, i = one_block(queries)
    else:
        pad = (-Nq) % block
        qp = jnp.pad(queries, ((0, pad), (0, 0)))
        qb = qp.reshape(-1, block, queries.shape[-1])
        d, i = jax.lax.map(one_block, qb)
        d = d.reshape(-1, k)[:Nq]
        i = i.reshape(-1, k)[:Nq]
    if query_valid is not None:
        d = jnp.where(query_valid[:, None], d, inf)
        i = jnp.where(query_valid[:, None], i, 0)
    return d, i


def mean_knn_sq_dist(points, k: int = 3, valid=None, block: int = 4096):
    """distCUDA2 twin: mean squared distance to the k nearest OTHER points.

    Matches simple-knn semantics at the gaussian_model.py:341 call site:
    the per-point mean of the 3 nearest neighbors' squared distances.
    """
    d, _ = knn(points, points, k + 1, query_valid=valid, point_valid=valid,
               block=block)
    # drop self (distance 0, always first among valid)
    return jnp.mean(d[:, 1:], axis=-1)


def hybrid_knn(xyz, feat, kpt_xyz, kpt_feat, k: int, feature_amplify: float,
               point_valid=None, query_valid=None):
    """The reference's "hybird" KNN (gaussian_model.py:114-117): K nearest
    keypoints in the 35-d concat space [xyz, motion_feature * amplify]."""
    q = jnp.concatenate([xyz, feat * feature_amplify], axis=-1)
    p = jnp.concatenate([kpt_xyz, kpt_feat * feature_amplify], axis=-1)
    return knn(q, p, k, query_valid=query_valid, point_valid=point_valid)
