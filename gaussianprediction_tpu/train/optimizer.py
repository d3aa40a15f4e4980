"""Stage-aware per-group Adam with schedule-driven learning rates.

Functional twin of the reference's three optimizer setups
(/root/reference/scene/gaussian_model.py:394-491):

  stage 1  training_setup      — gaussian params + deform MLP + motion feats
  stage 2  training2stage_setup — ONLY keypoints + weight model + deform MLP
  stage 3  training3stage_setup — everything except per-gaussian motion feats

Matching torch semantics: Adam(betas=(0.9, 0.999), eps=1e-15)
(gaussian_model.py:410,428,452); each stage creates a FRESH optimizer, so
moment/step state resets at stage boundaries; LR schedules are evaluated on
the GLOBAL iteration (update_learning_rate, :474-491) while bias correction
uses the per-stage step. The reference's name-matching quirk is preserved:
"s_motion_feature" matches the "motion_feature" branch of the scheduler, so
keypoint features follow the mfeature schedule.

Frozen groups are compile-time dead branches (stage is a static Python int),
so each stage's jitted step touches only its trainable leaves.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.utils.schedules import expon_lr

BETA1, BETA2, EPS = 0.9, 0.999, 1e-15

# param-tree key -> reference optimizer group name
GROUP_OF_PARAM = {
    "xyz": "xyz",
    "features_dc": "f_dc",
    "features_rest": "f_rest",
    "opacity": "opacity",
    "scaling": "scaling",
    "rotation": "rotation",
    "motion_feature": "motion_feature",
    "opacity_thres": "opacity_thres",
    "super_xyz": "s_xyz",
    "super_feature": "s_motion_feature",
    "df_mlp": "df_mlp",
    "hash_tables": "weight_mlp",
    "weight_mlp": "weight_mlp",
}

# groups optimized per stage (gaussian_model.py:439-451, 422-427, 397-409)
STAGE_GROUPS = {
    1: (
        "xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
        "df_mlp", "motion_feature", "opacity_thres",
    ),
    2: ("s_xyz", "s_motion_feature", "weight_mlp", "df_mlp"),
    3: (
        "xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
        "s_xyz", "s_motion_feature", "weight_mlp", "df_mlp",
        "opacity_thres",
    ),
}


def group_lr(group: str, cfg: Config, spatial_scale: float, iteration):
    """LR for a group at a (traced) iteration; update_learning_rate twin."""
    o = cfg.opt
    if group == "xyz":
        return expon_lr(
            iteration, o.position_lr_init * spatial_scale,
            o.position_lr_final * spatial_scale,
            lr_delay_mult=o.position_lr_delay_mult,
            max_steps=o.position_lr_max_steps,
        )
    if group == "df_mlp":
        return expon_lr(
            iteration, o.mlp_lr, o.position_lr_final,
            lr_delay_mult=o.position_lr_delay_mult,
            max_steps=o.position_lr_max_steps,
        )
    if group == "s_xyz":
        return expon_lr(
            iteration, o.kpts_lr, o.kpts_lr_final,
            lr_delay_steps=o.position_lr_max_steps, max_steps=o.iterations,
        )
    if group == "weight_mlp":
        return expon_lr(
            iteration, o.hash_lr, o.hash_lr_final,
            lr_delay_steps=o.position_lr_max_steps, max_steps=o.iterations,
        )
    if group in ("motion_feature", "s_motion_feature"):
        return expon_lr(
            iteration, o.mfeature_lr, o.mfeature_lr_final,
            lr_delay_steps=o.position_lr_max_steps,
            max_steps=o.position_lr_max_steps,
        )
    const = {
        "f_dc": o.feature_lr,
        "f_rest": o.feature_lr / 20.0,
        "opacity": o.opacity_lr,
        "opacity_thres": o.opacity_lr,
        "scaling": o.scaling_lr,
        "rotation": o.rotation_lr,
    }
    return jnp.float32(const[group])


def init_adam(params) -> Dict[str, Any]:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
            "step": jnp.int32(0)}


def stage_start(cfg: Config, stage: int) -> int:
    if stage <= 1:
        return 0
    if stage == 2:
        return cfg.train.second_stage_iteration
    return cfg.train.third_stage_iteration


def adam_step(params, grads, opt_state, cfg: Config, stage: int,
              spatial_scale: float, iteration):
    """One masked-Adam update. stage/spatial_scale are static; iteration is
    traced (LR schedules evaluated in-graph)."""
    active = STAGE_GROUPS[stage]
    if not cfg.model.step_opacity:
        active = tuple(g for g in active if g != "opacity_thres")
    step = opt_state["step"] + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)
    lrs = {
        g: group_lr(g, cfg, spatial_scale, iteration) for g in active
    }

    new_params, new_m, new_v = {}, {}, {}
    for key in params:
        group = GROUP_OF_PARAM[key]
        p, g_ = params[key], grads[key]
        m, v = opt_state["m"][key], opt_state["v"][key]
        if group in active:
            lr = lrs[group]

            def upd(p, g, m, v, lr=lr):
                m2 = BETA1 * m + (1 - BETA1) * g
                v2 = BETA2 * v + (1 - BETA2) * g * g
                mh = m2 / bc1
                vh = v2 / bc2
                return p - lr * mh / (jnp.sqrt(vh) + EPS), m2, v2

            out = jax.tree.map(
                lambda p_, g2, m_, v_: upd(p_, g2, m_, v_), p, g_, m, v,
                is_leaf=lambda x: isinstance(x, jnp.ndarray),
            )
            # tree of tuples -> three trees
            new_params[key] = jax.tree.map(
                lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_m[key] = jax.tree.map(
                lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_v[key] = jax.tree.map(
                lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple)
            )
        else:
            new_params[key], new_m[key], new_v[key] = p, m, v
    return new_params, {"m": new_m, "v": new_v, "step": step}
