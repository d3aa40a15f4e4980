"""Knockout ablation of the stage-0 train step: full device time is
196.9 ms/iter (scan x8, exp_fullstep) but measured components sum to
~103 ms (render fwd+bwd 86 + loss 6 + adam 4 + stats 4 + psnr 4).
Each variant runs as a scanned x8 burst (pure device time):

  V0: full step (reference point == make_train_step)
  V1: l1-only loss (no SSIM)
  V2: no means2d_dummy gradient (grads wrt params only, stats fed zeros)
  V3: no adam (params untouched; grads still materialized)
  V4: no densify-stats block
  V5: capacity_multiplier=10 (vs cfg 12)
  V6: static SH degree (no active-degree masking)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="0,1,2,3,4,5,6")
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
    from gaussianprediction_tpu.train import optimizer as opt_mod
    from gaussianprediction_tpu.train.step import (
        render_at_time, time_with_noise,
    )
    from gaussianprediction_tpu.utils.image import (
        dssim_l1_loss, l1_loss, psnr,
    )

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    cfg.model.max_gaussian_size = args.n
    W = H = args.wh
    SCAN = 8

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
    stage = 0
    it0 = 500

    def make_step(variant: int):
        capm = 10 if variant == 5 else cfg.model.capacity_multiplier

        def loss_fn(params, dummy, cam, gt, t, iteration, key, active_deg):
            pkg, dout = render_at_time(
                params, cfg, state, cam, t, iteration, key, stage, W, H,
                bg, cfg.model.sh_degree,
                means2d_dummy=None if variant == 2 else dummy,
                active_sh_degree=None if variant == 6 else active_deg,
            )
            img = pkg["render"]
            if variant == 1:
                loss = l1_loss(img, gt)
            else:
                loss = dssim_l1_loss(img, gt, cfg.opt.lambda_dssim)
            loss = loss + D.motion_feature_reg(params, cfg, iteration, stage)
            aux = {
                "l1": l1_loss(img, gt), "psnr": psnr(img, gt),
                "radii": pkg["radii"],
                "visibility": pkg["visibility_filter"],
                "n_dropped": pkg["n_dropped"],
            }
            return loss, aux

        def step(st, os_, t, iteration, key):
            k_noise, k_time = jax.random.split(key)
            t = time_with_noise(cfg, t, iteration, k_time, stage, 100)
            dummy = jnp.zeros((st.capacity, 2), jnp.float32)
            (loss, aux), (grads, vs_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(st.params, dummy, cam, gt, t, iteration, k_noise,
              jnp.int32(3))
            if variant != 4:
                vis = aux["visibility"]
                vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
                do = (iteration < cfg.opt.densify_until_iter) & vis
                st = st.replace(
                    max_radii2D=jnp.where(
                        do, jnp.maximum(st.max_radii2D, aux["radii"]),
                        st.max_radii2D),
                    xyz_gradient_accum=st.xyz_gradient_accum
                    + jnp.where(do, vs_norm, 0.0),
                    denom=st.denom + do.astype(jnp.float32),
                )
            if variant != 3:
                newp, os_ = opt_mod.adam_step(
                    st.params, grads, os_, cfg, 1, 1.0, iteration)
                st = st.replace(params=newp)
            else:
                st = st.replace(params=jax.tree.map(
                    lambda p_, g_: p_ - 0.0 * g_, st.params, grads))
            return st, os_, loss

        # NOTE: capm is currently only honored via cfg mutation below
        return step, capm

    for v in [int(x) for x in args.variants.split(",")]:
        step, capm = make_step(v)
        old_capm = cfg.model.capacity_multiplier
        cfg.model.capacity_multiplier = capm

        @jax.jit
        def burst(st, os_, base_it, key, step=step):
            def body(c, i):
                s_, o_ = c
                s_, o_, l = step(s_, o_, jnp.float32(0.37), base_it + i,
                                 jax.random.fold_in(key, i))
                return (s_, o_), l
            (s_, o_), ls = jax.lax.scan(
                body, (st, os_), jnp.arange(SCAN, dtype=jnp.int32))
            return s_, o_, ls

        t0 = time.time()
        st2, os2, ls = burst(state, opt_state, jnp.int32(it0),
                             jax.random.PRNGKey(7))
        _ = float(ls[-1])
        comp = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            st2, os2, ls = burst(st2, os2, jnp.int32(it0 + 10 + SCAN * i),
                                 jax.random.PRNGKey(8 + i))
            _ = float(ls[-1])
        dt = (time.time() - t0) / (args.iters * SCAN) * 1000
        print(f"V{v}: {dt:.1f} ms/iter (scan x{SCAN}, compile {comp:.0f}s)",
              flush=True)
        cfg.model.capacity_multiplier = old_capm


if __name__ == "__main__":
    main()
