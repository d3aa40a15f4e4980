"""Densification & pruning as masked recompaction over static capacity.

Functional twin of the reference's adaptive density control
(/root/reference/scene/gaussian_model.py:526-754, driven by
train.py:163-192). The reference reallocates tensors and performs optimizer
-state surgery (_prune_optimizer / cat_tensors_to_optimizer, :547-611);
under XLA shapes are static, so here:

  clone  -> copy selected rows into free slots (adam m/v zeroed there)
  split  -> write 2 resampled children into free slots, kill the parent
  prune  -> clear `alive` (slots become reusable; moments untouched, exactly
            like the reference which drops those rows entirely)
  reset_opacity -> clamp opacity logits, zero the WHOLE opacity moment
            (replace_tensor_to_optimizer semantics, :532-545)
  keypoint growth -> FPS over high-gradient gaussians into free keypoint
            slots (get_new_kpts/densify_kpts/densification_motion_postfix,
            :196-212,613-631,720-744)

Free-slot assignment is a rank->slot scatter (cumsum enumeration), fully
deterministic. All functions are jit-compatible; the HOST decides *when* to
call them (every densification_interval, iteration windows, capacity gates)
exactly as train.py does.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models.gaussians import GaussianState, scaling_act, opacity_act
from gaussianprediction_tpu.ops.fps import furthest_point_sampling
from gaussianprediction_tpu.utils.math import inverse_sigmoid, quat_to_rotmat

PER_GAUSSIAN = (
    "xyz", "features_dc", "features_rest", "opacity", "scaling",
    "rotation", "motion_feature", "opacity_thres",
)
PER_KPT = ("super_xyz", "super_feature")


def _rank_to_slot(free: jnp.ndarray) -> jnp.ndarray:
    """[C] bool -> [C] int32: slot index of the r-th free slot (else C)."""
    C = free.shape[0]
    rank = jnp.cumsum(free) - 1
    out = jnp.full((C,), C, jnp.int32)
    return out.at[jnp.where(free, rank, C)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )


def _copy_rows(params, opt_state, src_idx, dst_idx, valid, keys=PER_GAUSSIAN):
    """Copy param rows src->dst (masked) and zero adam moments at dst."""
    dst = jnp.where(valid, dst_idx, params[keys[0]].shape[0])
    for k in keys:
        if k not in params:
            continue
        params = dict(params)
        params[k] = params[k].at[dst].set(params[k][src_idx], mode="drop")
        for mom in ("m", "v"):
            opt_state = dict(opt_state)
            opt_state[mom] = dict(opt_state[mom])
            opt_state[mom][k] = opt_state[mom][k].at[dst].set(
                jnp.zeros_like(opt_state[mom][k][src_idx]), mode="drop"
            )
    return params, opt_state


def _grads_from_stats(state: GaussianState):
    g = state.xyz_gradient_accum / jnp.maximum(state.denom, 1e-12)
    return jnp.where(state.denom > 0, g, 0.0)


def densify_and_prune_clone_split(
    state: GaussianState, opt_state, cfg: Config, extent: float, key,
):
    """densify_and_clone + densify_and_split (gaussian_model.py:663-717).

    Free-slot exhaustion silently drops extra clones/children, mirroring
    the reference's max_gaussian_size gate (train.py:169-170).
    """
    params = state.params
    C = state.capacity
    grads = _grads_from_stats(state)
    scaling = scaling_act(params["scaling"])
    max_scale = jnp.max(scaling, axis=-1)
    dense_thr = cfg.opt.percent_dense * extent
    grad_ok = grads >= cfg.opt.densify_grad_threshold

    # --- clone: small gaussians
    clone_mask = state.alive & grad_ok & (max_scale <= dense_thr)
    free = ~state.alive
    rank2slot = _rank_to_slot(free)
    clone_rank = jnp.cumsum(clone_mask) - 1
    src = jnp.arange(C, dtype=jnp.int32)
    dst = rank2slot[jnp.clip(clone_rank, 0, C - 1)]
    valid = clone_mask & (clone_rank < jnp.sum(free)) & (dst < C)
    params, opt_state = _copy_rows(params, opt_state, src, dst, valid)
    alive = state.alive.at[jnp.where(valid, dst, C)].set(True, mode="drop")

    # --- split: large gaussians -> 2 children, parent pruned
    split_mask = state.alive & grad_ok & (max_scale > dense_thr)
    free2 = ~alive  # slots still free after clones landed
    rank2slot2 = _rank_to_slot(free2)
    n_free2 = jnp.sum(free2)
    split_rank = jnp.cumsum(split_mask) - 1
    child_ok = split_mask & (2 * split_rank + 1 < n_free2)
    noise = jax.random.normal(key, (2, C, 3)) * scaling[None]
    R = quat_to_rotmat(params["rotation"])
    offsets = jnp.einsum("nij,cnj->cni", R, noise)  # [2, C, 3]
    new_scaling = jnp.log(scaling / (0.8 * 2.0))
    for child in range(2):
        dst2 = rank2slot2[jnp.clip(2 * split_rank + child, 0, C - 1)]
        v2 = child_ok & (dst2 < C)
        params, opt_state = _copy_rows(params, opt_state, src, dst2, v2)
        d = jnp.where(v2, dst2, C)
        params["xyz"] = params["xyz"].at[d].set(
            params["xyz"][src] + offsets[child], mode="drop"
        )
        params["scaling"] = params["scaling"].at[d].set(
            new_scaling, mode="drop"
        )
        alive = alive.at[d].set(True, mode="drop")
    alive = alive & ~child_ok  # prune split parents

    # densification_postfix resets all stats (gaussian_model.py:658-661)
    return (
        state.replace(
            params=params, alive=alive,
            xyz_gradient_accum=jnp.zeros((C,), jnp.float32),
            xyz_gradient_accum_max=jnp.zeros((C,), jnp.float32),
            denom=jnp.zeros((C,), jnp.float32),
            max_radii2D=jnp.zeros((C,), jnp.int32),
        ),
        opt_state,
    )


def prune(state: GaussianState, cfg: Config, extent: float,
          max_screen_size) -> GaussianState:
    """Opacity/size pruning (gaussian_model.py:746-754). max_screen_size is
    None or an int (static)."""
    opac = opacity_act(state.params["opacity"])[:, 0]
    mask = opac < 0.005
    if max_screen_size:
        big_vs = state.max_radii2D > max_screen_size
        big_ws = jnp.max(
            scaling_act(state.params["scaling"]), axis=-1
        ) > 0.1 * extent
        mask = mask | big_vs | big_ws
    return state.replace(alive=state.alive & ~mask)


def reset_opacity(state: GaussianState, opt_state):
    """Clamp opacity to <=0.01 and zero its adam moments
    (reset_opacity + replace_tensor_to_optimizer, gaussian_model.py:526-545)."""
    opac = opacity_act(state.params["opacity"])
    new = inverse_sigmoid(jnp.minimum(opac, 0.01))
    params = dict(state.params)
    params["opacity"] = jnp.where(state.alive[:, None], new,
                                  state.params["opacity"])
    opt_state = dict(opt_state)
    for mom in ("m", "v"):
        opt_state[mom] = dict(opt_state[mom])
        opt_state[mom]["opacity"] = jnp.zeros_like(opt_state[mom]["opacity"])
    return state.replace(params=params), opt_state


def grow_keypoints_from_grads(
    state: GaussianState, opt_state, cfg: Config, max_new: int,
    ratio: int = 100,
):
    """densify_kpts(mode="down_sampling") (gaussian_model.py:720-725 ->
    get_new_kpts :196-212): FPS over high-gradient gaussians; the new
    keypoint inherits the motion feature of its source gaussian (the
    reference's 1-NN lookup resolves to the sampled point itself).

    max_new: static FPS sample budget (>= any select_num that can occur).
    """
    grads = _grads_from_stats(state)
    mask = state.alive & (grads > cfg.opt.densify_grad_threshold)
    return _grow_keypoints(state, opt_state, cfg, max_new, mask, ratio)


def grow_keypoints_from_teaching(
    state: GaussianState, opt_state, cfg: Config, max_new: int,
    ratio: int = 100,
):
    """Teacher-guided keypoint growth (gaussian_model.py:277-283 ->
    get_new_kpts :196-212): FPS over Gaussians whose blended motion
    diverges from their stage-1 per-Gaussian ("teacher") motion by more
    than teaching_threshold — the residual max is accumulated per step in
    train/step.py as xyz_motion_accum_max."""
    mask = state.alive & (
        state.xyz_motion_accum_max >= cfg.train.teaching_threshold
    )
    return _grow_keypoints(state, opt_state, cfg, max_new, mask, ratio)


def _grow_keypoints(
    state: GaussianState, opt_state, cfg: Config, max_new: int, mask,
    ratio: int,
):
    params = state.params
    count = jnp.sum(mask)
    select = jnp.where(count > ratio, count // ratio, 1)
    kpt_free = ~state.kpt_alive
    clip = jnp.sum(kpt_free)
    select = jnp.minimum(jnp.minimum(select, clip), max_new)
    select = jnp.where(count >= 1, select, 0)

    fps_idx = furthest_point_sampling(params["xyz"], max_new, valid=mask)
    take = jnp.arange(max_new) < select

    rank2slot = _rank_to_slot(kpt_free)
    Ck = state.kpt_capacity
    dst = rank2slot[jnp.clip(jnp.arange(max_new), 0, Ck - 1)]
    dstw = jnp.where(take & (dst < Ck), dst, Ck)
    params = dict(params)
    params["super_xyz"] = params["super_xyz"].at[dstw].set(
        params["xyz"][fps_idx], mode="drop"
    )
    params["super_feature"] = params["super_feature"].at[dstw].set(
        params["motion_feature"][fps_idx], mode="drop"
    )
    opt_state = dict(opt_state)
    for mom in ("m", "v"):
        opt_state[mom] = dict(opt_state[mom])
        for k in PER_KPT:
            opt_state[mom][k] = opt_state[mom][k].at[dstw].set(
                0.0, mode="drop"
            )
    kpt_alive = state.kpt_alive.at[dstw].set(True, mode="drop")

    # densification_motion_postfix resets all stats (gaussian_model.py:621-631)
    C = state.capacity
    return (
        state.replace(
            params=params, kpt_alive=kpt_alive,
            xyz_gradient_accum=jnp.zeros((C,), jnp.float32),
            xyz_gradient_accum_max=jnp.zeros((C,), jnp.float32),
            denom=jnp.zeros((C,), jnp.float32),
            xyz_motion_accum_max=jnp.zeros((C,), jnp.float32),
            motion_denom=jnp.zeros((C,), jnp.float32),
            max_radii2D=jnp.zeros((C,), jnp.int32),
        ),
        opt_state,
    )
