"""Jitted training steps, one per stage (SURVEY.md §7.1).

Functional re-design of the reference training iteration
(/root/reference/train.py:76-197 + GaussianModel.forward): per stage a pure
(state, opt_state, camera, gt, iteration, rng) -> (state', opt_state',
metrics) function, compiled once. Stage transitions (k-means keypoint init,
fresh optimizer) are rare host events handled by train/loop.py.

What happens inside one step (matching train.py exactly):
  1. time noise: N(0,1) * time_noise_ratio / total_frame * anneal
     (train.py:92-99; stage>=2 uses a 2x-longer anneal when use_time_decay)
  2. deform (stage-specific), render, loss = (1-λ)L1 + λ(1-SSIM) + motion reg
  3. backward; screen-space NDC gradient norm of the means2D carrier feeds
     the densification statistics (train.py:124-126,166-167,
     gaussian_model.py:756-760), masked by visibility and gated on the
     densify/adaptive iteration windows
  4. masked per-group Adam update (train/optimizer.py)

Gradient accumulation over `batch` renders (train.py:112-133) is expressed
by vmapping the loss over a leading camera batch; radii/visibility combine
with max/any exactly like the reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models import deform as D
from gaussianprediction_tpu.models.gaussians import GaussianState, get_shs
from gaussianprediction_tpu.ops import rasterize
from gaussianprediction_tpu.train import optimizer as opt_mod
from gaussianprediction_tpu.utils.image import dssim_l1_loss, l1_loss, psnr
from gaussianprediction_tpu.utils.schedules import linear_anneal


def deform_for_stage(params, cfg, state, t, iteration, key, stage: int,
                     noise=None):
    if stage == 0:
        assert noise is None, "pre-drawn noise only applies to stage 1"
        return D.deform_warmup(params, cfg)
    if stage == 1:
        return D.deform_stage1(params, cfg, state, t, iteration, key,
                               noise=noise)
    # stage 2/3 noise perturbs KEYPOINT positions, which are replicated
    # (never sharded) — pre-drawn per-Gaussian noise has no meaning here
    assert noise is None, "pre-drawn noise only applies to stage 1"
    return D.deform_stage23(params, cfg, state, t, iteration, key)


def time_with_noise(cfg: Config, t, iteration, key, stage: int, total_frame):
    """train.py:92-99."""
    if not cfg.train.use_time_decay:
        return t
    if stage >= 2:
        anneal = linear_anneal(
            iteration - cfg.train.second_stage_iteration, 1.0,
            cfg.train.time_noise_iteration * 2,
        )
    else:
        anneal = linear_anneal(iteration, 1.0, cfg.train.time_noise_iteration)
    noise = (
        jax.random.normal(key, ())
        * cfg.train.time_noise_ratio / total_frame * anneal
    )
    return t + noise


def render_at_time(params, cfg: Config, state: GaussianState, cam, t,
                   iteration, key, stage: int, width: int, height: int,
                   bg, sh_degree: int, means2d_dummy=None,
                   interpret=None, need_tidx: bool = False,
                   active_sh_degree=None):
    """Deform + render; the single entry used by train/eval/bench.

    need_tidx defaults False (training never reads the per-pixel argmax
    Gaussian id, and skipping it removes that tracking from the forward
    kernel); eval callers that consume pkg["tidx"] pass True.

    active_sh_degree (traced int32, optional): when set, the SH warm-up is
    applied by ZEROING coefficients beyond (deg+1)^2 under the STATIC
    max-degree basis instead of shrinking the basis — the same image up to
    summation associativity (<= 1 ulp: the zeroed terms contribute exact
    zeros, but the full-basis einsum may reassociate) and the same
    training trajectory (inactive coefficients get zero grads, keeping
    their Adam moments zero), with ONE compiled step per stage instead of
    one per (stage, degree)."""
    out = deform_for_stage(params, cfg, state, t, iteration, key, stage)
    shs = get_shs(params)          # [C, 3, K] — coefficient axis LAST
    if active_sh_degree is not None:
        kidx = jnp.arange(shs.shape[-1])
        shs = jnp.where(
            kidx[None, None, :] < (active_sh_degree + 1) ** 2, shs, 0.0
        )
    pkg = rasterize.render(
        out.xyz, out.scaling, out.rotation, out.opacity, shs,
        cam, width, height, bg, sh_degree=sh_degree, alive=state.alive,
        means2d_dummy=means2d_dummy, interpret=interpret,
        capacity_multiplier=cfg.model.capacity_multiplier,
        need_tidx=need_tidx,
    )
    return pkg, out


def make_train_step(cfg: Config, stage: int, width: int, height: int,
                    spatial_scale: float, sh_degree: int, total_frame: int,
                    bg, interpret: Optional[bool] = None):
    """Build the jitted step for one stage at one active SH degree."""
    bg = jnp.asarray(bg, jnp.float32)

    def loss_fn(params, means2d_dummy, state, cam, gt, t, iteration, key,
                active_deg=None):
        pkg, dout = render_at_time(
            params, cfg, state, cam, t, iteration, key, stage, width,
            height, bg, sh_degree, means2d_dummy=means2d_dummy,
            interpret=interpret, active_sh_degree=active_deg,
        )
        img = pkg["render"]
        loss = dssim_l1_loss(img, gt, cfg.opt.lambda_dssim)
        loss = loss + D.motion_feature_reg(
            params, cfg, iteration, 2 if stage >= 2 else stage
        )
        aux = {
            "image": img,
            "l1": l1_loss(img, gt),
            "psnr": psnr(img, gt),
            "radii": pkg["radii"],
            "visibility": pkg["visibility_filter"],
            "n_dropped": pkg["n_dropped"],
            "delta_xyz": dout.delta_xyz,
            "kpts_xyz_motion": dout.kpts_xyz_motion,
        }
        return loss, aux

    def step(state: GaussianState, opt_state, cam, gt, t, iteration, key,
             active_deg=None):
        k_noise, k_time = jax.random.split(key)
        t = time_with_noise(cfg, t, iteration, k_time, stage, total_frame)
        dummy = jnp.zeros((state.capacity, 2), jnp.float32)
        (loss, aux), (grads, vs_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, dummy, state, cam, gt, t, iteration, k_noise,
          active_deg)

        # densification statistics (train.py:163-192)
        vis = aux["visibility"]
        vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
        in_densify = iteration < cfg.opt.densify_until_iter
        if stage >= 2:
            in_adaptive = (
                (iteration < cfg.train.adaptive_end_iter
                 + cfg.train.second_stage_iteration)
                & (state.n_kpts() < cfg.model.kpt_capacity())
            )
        else:
            in_adaptive = jnp.asarray(False)
        do_stats = (in_densify | in_adaptive) & vis
        state = state.replace(
            max_radii2D=jnp.where(
                do_stats, jnp.maximum(state.max_radii2D, aux["radii"]),
                state.max_radii2D,
            ),
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.where(do_stats, vs_norm, 0.0),
            xyz_gradient_accum_max=jnp.where(
                do_stats & (vs_norm > state.xyz_gradient_accum_max),
                vs_norm, state.xyz_gradient_accum_max,
            ),
            denom=state.denom + do_stats.astype(jnp.float32),
        )

        # teacher-guided keypoint-growth stats (gaussian_model.py:275-283)
        if stage >= 2 and cfg.train.densify_from_teaching:
            t_pe = D.time_encode(cfg, t)
            resid = D.teacher_motion_residual(
                state.params, cfg, t_pe, aux["delta_xyz"]
            )
            in_window = (
                (iteration >= cfg.train.adaptive_from_iter
                 + cfg.train.second_stage_iteration)
                & (iteration < cfg.train.adaptive_end_iter
                   + cfg.train.second_stage_iteration)
            )
            state = state.replace(
                xyz_motion_accum_max=jnp.where(
                    in_window & (resid > state.xyz_motion_accum_max),
                    resid, state.xyz_motion_accum_max,
                ),
                motion_denom=state.motion_denom
                + in_window.astype(jnp.float32),
            )

        new_params, opt_state = opt_mod.adam_step(
            state.params, grads, opt_state, cfg, max(stage, 1),
            spatial_scale, iteration,
        )
        state = state.replace(params=new_params)
        metrics = {
            "loss": loss,
            "l1": aux["l1"],
            "psnr": aux["psnr"],
            "n_dropped": aux["n_dropped"],
        }
        return state, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1)), step, loss_fn


def make_train_step_batched(cfg: Config, stage: int, width: int, height: int,
                            spatial_scale: float, sh_degree: int,
                            total_frame: int, bg, batch: int,
                            interpret: Optional[bool] = None):
    """Gradient accumulation over `batch` renders, ONE optimizer step
    (/root/reference/train.py:112-133): losses summed, radii combined by
    max, visibility by any, screen-space gradients by sum; densification
    statistics and the Adam update execute once per completed batch at the
    batch's last iteration index — exactly the reference's `continue`-gated
    flow. Renders run sequentially under lax.scan (the rasterizer is a
    Pallas custom_vjp, not vmappable), which matches the reference's
    sequential accumulation."""
    _, _, loss_fn = make_train_step(
        cfg, stage, width, height, spatial_scale, sh_degree, total_frame,
        bg, interpret=interpret,
    )

    def step(state: GaussianState, opt_state, cams, gts, times, iteration0,
             key, active_deg=None):
        keys = jax.random.split(key, 2 * batch).reshape(batch, 2, -1)
        dummy = jnp.zeros((state.capacity, 2), jnp.float32)
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)

        def body(carry, xs):
            grads_acc, vsg_acc, radii_acc, vis_acc, loss_acc = carry
            cam, gt, t, j, ks = xs
            it = iteration0 + j
            t = time_with_noise(cfg, t, it, ks[1], stage, total_frame)
            (loss, aux), (g, vsg) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, dummy, state, cam, gt, t, it, ks[0],
              active_deg)
            carry = (
                jax.tree.map(jnp.add, grads_acc, g),
                vsg_acc + vsg,
                jnp.maximum(radii_acc, aux["radii"]),
                vis_acc | aux["visibility"],
                loss_acc + loss,
            )
            m = {"l1": aux["l1"], "psnr": aux["psnr"],
                 "n_dropped": aux["n_dropped"],
                 "delta_xyz": aux["delta_xyz"]}
            return carry, m

        init = (
            zero_grads,
            jnp.zeros((state.capacity, 2), jnp.float32),
            jnp.zeros_like(state.max_radii2D),
            jnp.zeros((state.capacity,), bool),
            jnp.float32(0.0),
        )
        (grads, vs_grads, radii, vis, loss), ms = jax.lax.scan(
            body, init,
            (cams, gts, times, jnp.arange(batch, dtype=jnp.int32), keys),
        )
        iteration = iteration0 + batch - 1

        vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
        in_densify = iteration < cfg.opt.densify_until_iter
        if stage >= 2:
            in_adaptive = (
                (iteration < cfg.train.adaptive_end_iter
                 + cfg.train.second_stage_iteration)
                & (state.n_kpts() < cfg.model.kpt_capacity())
            )
        else:
            in_adaptive = jnp.asarray(False)
        do_stats = (in_densify | in_adaptive) & vis
        state = state.replace(
            max_radii2D=jnp.where(
                do_stats, jnp.maximum(state.max_radii2D, radii),
                state.max_radii2D,
            ),
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.where(do_stats, vs_norm, 0.0),
            xyz_gradient_accum_max=jnp.where(
                do_stats & (vs_norm > state.xyz_gradient_accum_max),
                vs_norm, state.xyz_gradient_accum_max,
            ),
            denom=state.denom + do_stats.astype(jnp.float32),
        )
        if stage >= 2 and cfg.train.densify_from_teaching:
            t_pe = D.time_encode(cfg, times[-1])
            resid = D.teacher_motion_residual(
                state.params, cfg, t_pe,
                jax.tree.map(lambda x: x[-1], ms["delta_xyz"]),
            )
            in_window = (
                (iteration >= cfg.train.adaptive_from_iter
                 + cfg.train.second_stage_iteration)
                & (iteration < cfg.train.adaptive_end_iter
                   + cfg.train.second_stage_iteration)
            )
            state = state.replace(
                xyz_motion_accum_max=jnp.where(
                    in_window & (resid > state.xyz_motion_accum_max),
                    resid, state.xyz_motion_accum_max,
                ),
                motion_denom=state.motion_denom
                + in_window.astype(jnp.float32),
            )

        new_params, opt_state = opt_mod.adam_step(
            state.params, grads, opt_state, cfg, max(stage, 1),
            spatial_scale, iteration,
        )
        state = state.replace(params=new_params)
        metrics = {
            "loss": loss,
            "l1": jnp.mean(ms["l1"]),
            "psnr": jnp.mean(ms["psnr"]),
            "n_dropped": jnp.max(ms["n_dropped"]),
        }
        return state, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_train_step_multi(cfg: Config, stage: int, width: int, height: int,
                          spatial_scale: float, sh_degree: int,
                          total_frame: int, bg, k_steps: int,
                          interpret: Optional[bool] = None):
    """K iterations per device invocation (lax.scan over the inner step).

    Amortizes the per-call host round-trip (~35 ms through the tunneled TPU
    plugin, comparable to a full 800x800 fwd+bwd) over k_steps iterations.
    Cameras/gts/times come pre-stacked with a leading [K] axis; the host
    aligns chunk boundaries with its events (densify cadence, stage
    transitions, SH bumps) in train/loop.py.
    """
    _, inner, _ = make_train_step(
        cfg, stage, width, height, spatial_scale, sh_degree, total_frame,
        bg, interpret=interpret,
    )

    def multi(state, opt_state, cams, gts, times, iteration0, key,
              active_deg=None):
        keys = jax.random.split(key, k_steps)

        def body(carry, xs):
            state, opt_state = carry
            cam, gt, t, i, k = xs
            state, opt_state, metrics = inner(
                state, opt_state, cam, gt, t, iteration0 + i, k, active_deg
            )
            return (state, opt_state), metrics

        (state, opt_state), metrics = jax.lax.scan(
            body, (state, opt_state),
            (cams, gts, times, jnp.arange(k_steps, dtype=jnp.int32), keys),
        )
        last = jax.tree.map(lambda m: m[-1], metrics)
        return state, opt_state, last

    return jax.jit(multi, donate_argnums=(0, 1))
