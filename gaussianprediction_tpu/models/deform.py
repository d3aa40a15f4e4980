"""Deformation pipeline: the three training stages as pure functions.

Re-derivation of `GaussianModel.forward` and its helpers
(/root/reference/scene/gaussian_model.py:180-315) in functional JAX:

  warm-up  (iter <  jointly_iteration): canonical Gaussians, no deformation
  stage 1  (iter <= second_stage_iteration): per-Gaussian deformation —
           MLP([motion_feature, PE(xyz + annealed noise), PE(t)])
           -> (Δxyz, Δq[, Δo])            (gaussian_model.py:240-244,265)
  stage2/3 (iter >  second_stage_iteration): the MLP runs ONLY on keypoints;
           per-Gaussian motion is a softmax-weighted blend of the K=6
           nearest keypoints' deltas, with blend logits from the hash-grid
           weight model                      (gaussian_model.py:252-273)

Instead of materializing the reference's [N, n_kpts] scatter matrix
(fill_nearest, :214-229) we keep the KNN-sparse form and blend by gather:
delta[n] = Σ_k softmax(w)[n,k] · delta_kpts[nn[n,k]] — identical math
(scattered entries are zero elsewhere), O(N·K) instead of O(N·n_kpts).

Stage transitions (k-means keypoint init at second_stage_iteration+1,
optimizer swap) are HOST-side events in train/loop.py; each stage has its
own jitted step (SURVEY.md §7.1).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models.gaussians import (
    GaussianState,
    deform_input_dims,
    opacity_act,
    rotation_act,
    scaling_act,
)
from gaussianprediction_tpu.ops import hashgrid
from gaussianprediction_tpu.ops.knn import hybrid_knn, knn
from gaussianprediction_tpu.utils.math import (
    positional_encoding,
    quat_mul,
    sharp_sigmoid,
    step_opacity_fn,
)
from gaussianprediction_tpu.utils.schedules import linear_anneal


class DeformOut(NamedTuple):
    xyz: jnp.ndarray
    rotation: jnp.ndarray     # normalized quats
    scaling: jnp.ndarray      # activated
    opacity: jnp.ndarray      # activated [C, 1]
    # auxiliary (GCN dataset, keypoint growth, densify_kpts)
    kpts_xyz_motion: Optional[jnp.ndarray] = None
    kpts_rotation_motion: Optional[jnp.ndarray] = None
    nn_idx: Optional[jnp.ndarray] = None        # [C, K]
    weights_xyz: Optional[jnp.ndarray] = None   # [C, K] softmaxed
    weights_r: Optional[jnp.ndarray] = None
    delta_xyz: Optional[jnp.ndarray] = None     # blended per-gaussian


def motion_delta(params, cfg: Config, xyz_embed, motion_feature, t_pe):
    """Deform-MLP evaluation (get_motion_delta, gaussian_model.py:180-189)."""
    n = motion_feature.shape[0]
    t_rep = jnp.broadcast_to(t_pe[None, :], (n, t_pe.shape[-1]))
    inp = jnp.concatenate([motion_feature, xyz_embed, t_rep], axis=-1)
    delta = hashgrid.mlp_apply(params["df_mlp"], inp)
    delta_xyz = delta[..., 0:3]
    delta_q = delta[..., 3:7]
    delta_o = delta[..., 7:8] if cfg.model.step_opacity else None
    return delta_xyz, delta_q, delta_o


def time_encode(cfg: Config, t):
    time_dim, _ = deform_input_dims(cfg)
    return positional_encoding(jnp.reshape(t, (1,)), time_dim // 2)


def xyz_encode(cfg: Config, xyz):
    _, xyz_dim = deform_input_dims(cfg)
    return positional_encoding(xyz, xyz_dim // 6)


def blend_weights(params, cfg: Config, state: GaussianState):
    """Weight-encoder model + hybrid KNN + per-neighbor softmax.

    Twin of weights_model + get_nearest_mask + fill_nearest
    (gaussian_model.py:257-261,111-125,214-229) in KNN-sparse form.
    Returns (nn_idx [C,K], weights_xyz [C,K], weights_r [C,K]).
    """
    K = cfg.model.nearest_num
    m = cfg.model
    xyz = jax.lax.stop_gradient(params["xyz"])
    if m.weight_encoder == "fourier":
        from gaussianprediction_tpu.ops import fourier_enc

        B = fourier_enc.fourier_dirs(
            m.hash_levels, m.fourier_per_level, m.hash_min_res,
            m.hash_max_res, m.hash_bound,
        )
        enc = fourier_enc.fourier_encode(B, xyz, bound=m.hash_bound)
    elif m.weight_encoder == "brick":
        enc = hashgrid.brickgrid_encode_fast(
            params["hash_tables"], xyz, m.hash_bound,
            m.hash_min_res, m.hash_max_res,
        )
    else:
        enc = hashgrid.hashgrid_encode_fast(
            params["hash_tables"], xyz, m.hash_bound,
            m.hash_min_res, m.hash_max_res,
        )
    logits = hashgrid.mlp_apply(params["weight_mlp"], enc)  # [C, 2K]

    if cfg.model.knn_type == "3D":
        _, nn_idx = knn(
            xyz, params["super_xyz"], K,
            point_valid=state.kpt_alive,
        )
    else:  # "hybird"
        _, nn_idx = hybrid_knn(
            xyz, params["motion_feature"],
            params["super_xyz"], params["super_feature"],
            K, cfg.model.feature_amplify,
            point_valid=state.kpt_alive,
        )
    nn_idx = jax.lax.stop_gradient(nn_idx)
    weights_xyz = jax.nn.softmax(logits[..., 0:K], axis=-1)
    weights_r = jax.nn.softmax(logits[..., K:2 * K], axis=-1)
    return nn_idx, weights_xyz, weights_r


def _apply_deltas(params, delta_xyz, delta_q):
    xyz = params["xyz"] + delta_xyz
    q = rotation_act(quat_mul(rotation_act(delta_q), params["rotation"]))
    return xyz, q


def _lifecycle_opacity(params, cfg: Config, t, t_pe, iteration: int):
    """Step-opacity lifecycle (gaussian_model.py:291-298): re-evaluates the
    MLP on canonical per-Gaussian inputs for Δo."""
    base = opacity_act(params["opacity"])
    if not cfg.model.step_opacity or iteration <= cfg.model.step_opacity_iteration:
        return base
    xyz_embed = xyz_encode(cfg, params["xyz"])
    _, _, delta_o = motion_delta(
        params, cfg, xyz_embed, params["motion_feature"], t_pe
    )
    if cfg.model.opacity_type == "explicit":
        return base * step_opacity_fn(t, params["opacity_thres"],
                                      cfg.model.beta)
    return base * sharp_sigmoid(delta_o, cfg.model.beta)


def deform_warmup(params, cfg: Config) -> DeformOut:
    """Warm-up: static 3DGS (gaussian_model.py:237-238)."""
    return DeformOut(
        xyz=params["xyz"],
        rotation=rotation_act(params["rotation"]),
        scaling=scaling_act(params["scaling"]),
        opacity=opacity_act(params["opacity"]),
    )


def deform_stage1(params, cfg: Config, state: GaussianState, t, iteration,
                  key, noise=None) -> DeformOut:
    """Stage 1: per-Gaussian deformation (gaussian_model.py:240-244,265,285-304).

    noise: optional pre-drawn N(0,1) [C, 3] (BEFORE the sigma anneal).
    Sharded callers (parallel/shard.py) draw it at FULL capacity and pass
    each device its slice so the sharded trajectory reproduces the
    single-device RNG draw exactly."""
    t_pe = time_encode(cfg, t)
    sigma = linear_anneal(iteration, 0.1, cfg.train.xyz_noise_iteration)
    if noise is None:
        noise = jax.random.normal(key, params["xyz"].shape)
    xyz_in = jax.lax.stop_gradient(params["xyz"]) + sigma * noise
    xyz_embed = xyz_encode(cfg, xyz_in)
    delta_xyz, delta_q, _ = motion_delta(
        params, cfg, xyz_embed, params["motion_feature"], t_pe
    )
    if cfg.model.norm_rotation:
        delta_q = rotation_act(delta_q)
    xyz, q = _apply_deltas(params, delta_xyz, delta_q)
    return DeformOut(
        xyz=xyz, rotation=q, scaling=scaling_act(params["scaling"]),
        opacity=_lifecycle_opacity(params, cfg, t, t_pe, iteration),
        kpts_xyz_motion=delta_xyz, kpts_rotation_motion=delta_q,
        delta_xyz=delta_xyz,
    )


def deform_stage23(params, cfg: Config, state: GaussianState, t, iteration,
                   key, stage2_start: Optional[int] = None) -> DeformOut:
    """Stages 2/3: keypoint-blended deformation (gaussian_model.py:252-304)."""
    t_pe = time_encode(cfg, t)
    s2 = (stage2_start if stage2_start is not None
          else cfg.train.second_stage_iteration)
    sigma = linear_anneal(iteration - s2, 0.1, cfg.train.xyz_noise_iteration)
    noise = sigma * jax.random.normal(key, params["super_xyz"].shape)
    xyz_embed = xyz_encode(cfg, params["super_xyz"] + noise)

    kpt_dxyz, kpt_dq, _ = motion_delta(
        params, cfg, xyz_embed, params["super_feature"], t_pe
    )
    if cfg.model.norm_rotation:
        kpt_dq = rotation_act(kpt_dq)
    # dead keypoint slots must not pollute blends reached via clamped idx
    kpt_dxyz = jnp.where(state.kpt_alive[:, None], kpt_dxyz, 0.0)
    kpt_dq_safe = jnp.where(
        state.kpt_alive[:, None], kpt_dq,
        jnp.asarray([1.0, 0, 0, 0]),
    )

    nn_idx, w_xyz, w_r = blend_weights(params, cfg, state)
    delta_xyz = jnp.einsum("nk,nkc->nc", w_xyz, kpt_dxyz[nn_idx])
    delta_q = jnp.einsum("nk,nkc->nc", w_r, kpt_dq_safe[nn_idx])

    xyz, q = _apply_deltas(params, delta_xyz, delta_q)
    return DeformOut(
        xyz=xyz, rotation=q, scaling=scaling_act(params["scaling"]),
        opacity=_lifecycle_opacity(params, cfg, t, t_pe, iteration),
        kpts_xyz_motion=kpt_dxyz, kpts_rotation_motion=kpt_dq,
        nn_idx=nn_idx, weights_xyz=w_xyz, weights_r=w_r,
        delta_xyz=delta_xyz,
    )


def teacher_motion_residual(params, cfg: Config, t_pe, delta_xyz_blended):
    """Teacher-guided keypoint-growth statistic (get_teach_motion,
    gaussian_model.py:306-312): ||blended delta - stage-1 teacher delta||."""
    xyz_embed = xyz_encode(cfg, params["xyz"])
    teach_dxyz, _, _ = motion_delta(
        params, cfg, xyz_embed, params["motion_feature"], t_pe
    )
    return jnp.linalg.norm(delta_xyz_blended - teach_dxyz, axis=-1)


def motion_feature_reg(params, cfg: Config, iteration: int, stage: int):
    """1e-5 * mean|motion_feature| regularizer (get_loss,
    gaussian_model.py:174-178); uses keypoint features after stage 2."""
    feat = (params["super_feature"] if stage >= 2
            else params["motion_feature"])
    return 1e-5 * jnp.mean(jnp.abs(feat))
