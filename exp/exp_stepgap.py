"""Bisect the stage-0 full-step mystery: scan-x8 step = ~183 ms/iter but
render fwd+bwd (bench, raw arrays) = ~59 ms and loss/adam/stats measured
~18 ms combined; exp_stepablate knocked out SSIM / means2d-dummy / adam /
stats / SH masking individually with NO effect. Remaining hypotheses:

  (a) grad-wrt-params (activations + get_shs chain) is somehow expensive
      vs grad-wrt-raw-arrays;
  (b) the lax.scan + carried (state, opt_state) structure itself;
  (c) the loss/aux composition only costs when ALL pieces are present
      (fusion/scheduling pathology).

Variants (all scan x8 bursts at the SAME probe-sized capacity):
  G0: full make_train_step step (reference point, ~183 expected)
  G1: scan body = value_and_grad wrt PARAMS of render-only loss
      (mean|img-0.5|), params updated p -= 1e-20*g (carry dependency);
      no dssim/psnr/stats/adam/motion-reg/means2d-dummy
  G2: same scan but grad wrt RAW ARRAYS (activations applied OUTSIDE the
      grad), raw arrays carried through the scan
  G4: G1 + dssim_l1 + psnr + motion reg (the real loss_fn, still no
      stats/adam)

Readout: G2 fast & G1 slow -> (a). All slow -> (b). G1 fast & G4 slow ->
loss composition. G1/G2/G4 fast & G0 slow -> stats+adam interaction.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="G0,G1,G2,G4")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    args = p.parse_args()

    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprediction_tpu.config import Config
    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians,
    )
    from gaussianprediction_tpu.models import gaussians as G
    from gaussianprediction_tpu.models import deform as D
    from gaussianprediction_tpu.models.gaussians import (
        get_shs, opacity_act, scaling_act,
    )
    from gaussianprediction_tpu.ops import instance_stream as IS
    from gaussianprediction_tpu.ops import projection as PJ
    from gaussianprediction_tpu.ops import rasterize as R
    from gaussianprediction_tpu.train import optimizer as opt_mod
    from gaussianprediction_tpu.train.step import (
        make_train_step, render_at_time,
    )
    from gaussianprediction_tpu.utils.image import (
        dssim_l1_loss, l1_loss, psnr,
    )

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    cfg.model.max_gaussian_size = args.n
    W = H = args.wh
    SCAN = 8
    stage = 0
    it0 = 500

    g = random_gaussians(args.n, seed=42, scale_range=(-5.2, -3.8))
    state = G.create_from_pcd(
        jax.random.PRNGKey(0), cfg, g["xyz"],
        np.random.default_rng(0).uniform(0, 1, (args.n, 3)).astype(
            np.float32),
    )
    opt_state = opt_mod.init_adam(state.params)
    cam = jax.tree.map(jnp.asarray,
                       orbit_camera(0.5, width=W, height=H,
                                    uid=0).to_device_dict())
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    # probe-size capacity exactly like exp_fullstep/production
    def probe(params, alive):
        rot = params["rotation"]
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        proj = PJ.project_from_params(
            params["xyz"], scaling_act(params["scaling"]), rot, cam, W, H,
            alive=alive, opacity=opacity_act(params["opacity"]),
        )
        x0, y0, rw, rh = IS._capped_rect(
            proj.tiles_min, proj.tiles_max, proj.mean2d, 1024
        )
        rw = jnp.where(proj.visible, rw, 0)
        rh = jnp.where(proj.visible, rh, 0)
        return jnp.sum(jnp.maximum(rw * rh, 1))

    need = int(jax.jit(probe)(state.params, state.alive))
    import math
    cfg.model.capacity_multiplier = max(
        2.0, math.ceil(1.3 * need / max(state.capacity, 1) * 2.0) / 2.0
    )
    print(f"probe: {need} slots -> mult {cfg.model.capacity_multiplier}",
          flush=True)

    def timed(tag, burst, carry0):
        t0 = time.time()
        carry, out = burst(carry0, jnp.int32(it0), jax.random.PRNGKey(7))
        _ = float(out)
        comp = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            carry, out = burst(carry, jnp.int32(it0 + 10 + SCAN * i),
                               jax.random.PRNGKey(8 + i))
            _ = float(out)
        dt = (time.time() - t0) / (args.iters * SCAN) * 1000
        print(f"{tag}: {dt:.1f} ms/iter (scan x{SCAN}, compile {comp:.0f}s)",
              flush=True)

    variants = args.variants.split(",")

    if "G0" in variants:
        _, step_raw, _ = make_train_step(
            cfg, stage, W, H, 1.0, cfg.model.sh_degree, 100, bg,
        )

        @jax.jit
        def g0(carry, base_it, key):
            def body(c, i):
                s_, o_ = c
                s_, o_, m = step_raw(
                    s_, o_, cam, gt, jnp.float32(0.37), base_it + i,
                    jax.random.fold_in(key, i),
                )
                return (s_, o_), m["loss"]
            (s_, o_), ls = jax.lax.scan(
                body, carry, jnp.arange(SCAN, dtype=jnp.int32))
            return (s_, o_), ls[-1]

        timed("G0 full step", g0, (state, opt_state))

    def render_loss_params(params, t, iteration, key, with_full_loss):
        pkg, dout = render_at_time(
            params, cfg, state, cam, t, iteration, key, stage, W, H,
            bg, cfg.model.sh_degree, active_sh_degree=jnp.int32(3),
        )
        img = pkg["render"]
        if with_full_loss:
            loss = dssim_l1_loss(img, gt, cfg.opt.lambda_dssim)
            loss = loss + D.motion_feature_reg(params, cfg, iteration, stage)
            return loss, psnr(img, gt)
        return jnp.mean(jnp.abs(img - 0.5)), jnp.float32(0.0)

    def make_g_params(with_full_loss):
        @jax.jit
        def burst(params, base_it, key):
            def body(p, i):
                (loss, aux), grads = jax.value_and_grad(
                    render_loss_params, has_aux=True
                )(p, jnp.float32(0.37), base_it + i,
                  jax.random.fold_in(key, i), with_full_loss)
                p = jax.tree.map(lambda a, b: a - 1e-20 * b, p, grads)
                return p, loss + 0.0 * aux
            p, ls = jax.lax.scan(
                body, params, jnp.arange(SCAN, dtype=jnp.int32))
            return p, ls[-1]
        return burst

    if "G1" in variants:
        timed("G1 grad-wrt-params render-only", make_g_params(False),
              state.params)

    if "G4" in variants:
        timed("G4 grad-wrt-params full loss", make_g_params(True),
              state.params)

    if "G2" in variants:
        mult = cfg.model.capacity_multiplier

        def raw_loss(xyz, scal, rotn, op, shs):
            out = R.render(
                xyz, scal, rotn, op, shs, cam, W, H, bg, sh_degree=3,
                capacity_multiplier=mult, need_tidx=False,
                alive=state.alive,
            )
            return jnp.mean(jnp.abs(out["render"] - 0.5))

        @jax.jit
        def g2(arrs, base_it, key):
            def body(a, i):
                loss, grads = jax.value_and_grad(
                    raw_loss, argnums=(0, 1, 2, 3, 4)
                )(*a)
                a = tuple(x - 1e-20 * gg for x, gg in zip(a, grads))
                return a, loss
            a, ls = jax.lax.scan(
                body, arrs, jnp.arange(SCAN, dtype=jnp.int32))
            return a, ls[-1]

        params = state.params
        rotn = params["rotation"] / jnp.linalg.norm(
            params["rotation"], axis=-1, keepdims=True)
        arrs0 = (
            params["xyz"], scaling_act(params["scaling"]), rotn,
            opacity_act(params["opacity"]).reshape(-1), get_shs(params),
        )
        timed("G2 grad-wrt-raw-arrays", g2, arrs0)


if __name__ == "__main__":
    main()
