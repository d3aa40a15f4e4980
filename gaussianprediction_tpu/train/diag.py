"""Stage-2 transition diagnostics (VERDICT r3 weak #2).

At `second_stage_iteration` the reference re-parameterizes per-Gaussian
motion onto k-means keypoints with a FRESH random weight model
(/root/reference/scene/gaussian_model.py:128-136,252-273): blended motion
at init is a ~uniform softmax over each Gaussian's K nearest keypoints'
deltas, i.e. a spatially smoothed version of the stage-1 motion. This
module measures exactly how much of the observed post-transition PSNR
cliff is (a) that inherent smoothing, (b) the restarted keypoint-position
noise (gaussian_model.py:252-253), and (c) everything else — so a cliff
can be attributed to reference-faithful behavior vs an implementation bug.

All measurements are pure functions of the post-transition state; nothing
here mutates training.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models import deform as D
from gaussianprediction_tpu.train.step import render_at_time
from gaussianprediction_tpu.utils.image import psnr as psnr_fn


def _masked_rms(x, mask):
    num = jnp.sum(jnp.where(mask[:, None], x, 0.0) ** 2)
    den = x.shape[-1] * jnp.maximum(jnp.sum(mask), 1)
    return jnp.sqrt(num / den)


def transition_diagnostics(trainer, n_times: int = 5,
                           n_views: int = 3) -> Dict:
    """Decompose the stage-2 transition error on the CURRENT state (must be
    post-keypoint-init). Returns a JSON-ready dict:

      teacher_rms        — RMS magnitude of the stage-1 motion field
      err_blend          — RMS(blended delta − teacher), noise off: the
                           re-parameterization's inherent approximation error
      err_blend_noise    — same with the restarted keypoint noise at its
                           initial sigma (what training actually sees at s2+1)
      err_uniform_nn     — RMS(uniform K-NN average of kpt deltas − teacher):
                           the floor any fresh softmax starts from
      kpt_spacing        — mean nearest-neighbor distance among keypoints
      weight_entropy     — mean softmax entropy (log K = fully uniform)
      views              — per test view: PSNR under stage-1 deform vs
                           blended (noise off) vs blended (noisy)
    """
    cfg: Config = trainer.cfg
    state = trainer.state
    s2 = cfg.train.second_stage_iteration
    key = jax.random.PRNGKey(0)
    it_teacher = jnp.int32(10**8)                 # stage-1 noise fully decayed
    it_nonoise = jnp.int32(s2 + cfg.train.xyz_noise_iteration + 10)
    it_noisy = jnp.int32(s2 + 1)

    @jax.jit
    def delta_stats(params, state, t):
        teach = D.deform_stage1(
            params, cfg, state, t, it_teacher, key
        ).delta_xyz
        o_nn = D.deform_stage23(
            params, cfg, state, t, it_nonoise, key, stage2_start=s2
        )
        o_noisy = D.deform_stage23(
            params, cfg, state, t, it_noisy, key, stage2_start=s2
        )
        alive = state.alive
        unif = jnp.mean(o_nn.kpts_xyz_motion[o_nn.nn_idx], axis=1)
        w = o_nn.weights_xyz
        entropy = -jnp.sum(w * jnp.log(jnp.maximum(w, 1e-12)), axis=-1)
        return {
            "teacher_rms": _masked_rms(teach, alive),
            "err_blend": _masked_rms(o_nn.delta_xyz - teach, alive),
            "err_blend_noise": _masked_rms(o_noisy.delta_xyz - teach, alive),
            "err_uniform_nn": _masked_rms(unif - teach, alive),
            "weight_entropy": jnp.sum(jnp.where(alive, entropy, 0.0))
            / jnp.maximum(jnp.sum(alive), 1),
        }

    times = np.linspace(0.0, 1.0, n_times)
    per_t = [
        {k: float(v) for k, v in
         delta_stats(state.params, state, jnp.float32(t)).items()}
        for t in times
    ]
    agg = {
        k: float(np.mean([e[k] for e in per_t]))
        for k in per_t[0]
    }

    # keypoint spacing (3-D): mean NN distance among alive keypoints
    kxyz = np.asarray(state.params["super_xyz"])
    ka = np.asarray(state.kpt_alive)
    kk = kxyz[ka]
    if len(kk) >= 2:
        d2 = np.sum((kk[:, None] - kk[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        agg["kpt_spacing"] = float(np.mean(np.sqrt(d2.min(1))))
    agg["n_kpts"] = int(ka.sum())

    # per-view renders: stage-1 vs blended (no noise) vs blended (noisy)
    bg = jnp.asarray(trainer.bg)
    sh_deg = cfg.model.sh_degree

    def mk_render(stage, it):
        def f(params, state, cam, t):
            pkg, _ = render_at_time(
                params, cfg, state, cam, t, it, key, stage,
                trainer.width, trainer.height, bg, sh_deg,
                interpret=trainer.interpret,
            )
            return jnp.clip(pkg["render"], 0.0, 1.0)
        return jax.jit(f)

    r_stage1 = mk_render(1, it_teacher)
    r_blend = mk_render(2, it_nonoise)
    r_noisy = mk_render(2, it_noisy)
    views = []
    for cam in trainer.scene.test_cameras[:n_views]:
        gt = jnp.asarray(cam.load_image())
        cd = cam.to_device_dict()
        t = jnp.float32(cam.time)
        views.append({
            "time": float(cam.time),
            "psnr_stage1": float(psnr_fn(
                r_stage1(state.params, state, cd, t), gt)),
            "psnr_blend": float(psnr_fn(
                r_blend(state.params, state, cd, t), gt)),
            "psnr_blend_noise": float(psnr_fn(
                r_noisy(state.params, state, cd, t), gt)),
        })
    agg["views"] = views
    agg["per_time"] = per_t
    return agg
