"""Time the FULL train step per stage at production scale (200k, 800x800).

Round-1 NOTES table: stage 0/1 ~300/326 ms, stage 2/3 ~1272/1259 ms with
the hash-table gradient scatter-adds at ~800 ms. Re-measure after the
sort-based hash-grid VJP (hashgrid_encode_fast) to validate the fix.

Usage: python exp/exp_fullstep.py [--stages 0,1,2,3] [--iters 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="0,1,2")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--encoder", default="hashgrid",
                   choices=("hashgrid", "fourier"))
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
    from gaussianprediction_tpu.train import optimizer as opt_mod
    from gaussianprediction_tpu.train.loop import set_super_keypoints
    from gaussianprediction_tpu.train.step import make_train_step

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    cfg.model.max_gaussian_size = args.n
    cfg.model.weight_encoder = args.encoder
    W = H = args.wh

    g = random_gaussians(args.n, seed=42, scale_range=(-5.2, -3.8))
    key = jax.random.PRNGKey(0)
    state = G.create_from_pcd(
        key, cfg, g["xyz"], np.random.default_rng(0).uniform(
            0, 1, (args.n, 3)).astype(np.float32),
    )
    opt_state = opt_mod.init_adam(state.params)
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    cam = jax.tree.map(jnp.asarray, cam)
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = np.zeros(3, np.float32)

    # probe-size the instance capacity like production (Trainer
    # capacity_auto) instead of the static worst-case multiplier
    from gaussianprediction_tpu.models.gaussians import (
        opacity_act, scaling_act,
    )
    from gaussianprediction_tpu.ops import instance_stream as IS
    from gaussianprediction_tpu.ops import projection as PJ

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

    stages = [int(s) for s in args.stages.split(",")]
    if any(s >= 2 for s in stages):
        state = jax.jit(lambda s, k: set_super_keypoints(s, cfg, k))(
            state, jax.random.PRNGKey(1)
        )
    results = {}
    for stage in stages:
        step, _, _ = make_train_step(
            cfg, stage, W, H, 1.0, cfg.model.sh_degree, 100, bg,
        )
        it0 = {0: 500, 1: 3500, 2: 31000, 3: 61000}[stage]
        t0 = time.time()
        state, opt_state, m = step(
            state, opt_state, cam, gt, jnp.float32(0.37),
            jnp.int32(it0), jax.random.PRNGKey(2),
        )
        print(f"stage {stage}: compile+1st {time.time()-t0:.1f}s "
              f"loss={float(m['loss']):.4f} "
              f"n_dropped={int(m['n_dropped'])}", flush=True)
        # timed loop: force host sync per iter (tunnel enqueues async)
        t0 = time.time()
        for i in range(args.iters):
            state, opt_state, m = step(
                state, opt_state, cam, gt, jnp.float32(0.37),
                jnp.int32(it0 + 1 + i), jax.random.PRNGKey(3 + i),
            )
            _ = float(m["loss"])
        dt = (time.time() - t0) / args.iters
        results[stage] = dt
        print(f"stage {stage}: {dt*1000:.1f} ms/iter (per-iter sync)",
              flush=True)
        # amortized: enqueue a burst, sync once (hides the tunnel RTT the
        # way train/loop's steps_per_call chunks do on real hosts)
        burst = 4 * args.iters
        t0 = time.time()
        for i in range(burst):
            state, opt_state, m = step(
                state, opt_state, cam, gt, jnp.float32(0.37),
                jnp.int32(it0 + 9 + i), jax.random.PRNGKey(31 + i),
            )
        _ = float(m["loss"])
        dt2 = (time.time() - t0) / burst
        print(f"stage {stage}: {dt2*1000:.1f} ms/iter (amortized x{burst})",
              flush=True)

        # scan burst: 8 steps fused in ONE device program — pure device
        # time per iter, no dispatch/transfer at all
        _, step_raw, _ = make_train_step(
            cfg, stage, W, H, 1.0, cfg.model.sh_degree, 100, bg,
        )
        SCAN = 8

        @jax.jit
        def scan_burst(st, os_, base_it, key):
            def body(c, i):
                s_, o_ = c
                s_, o_, m = step_raw(
                    s_, o_, cam, gt, jnp.float32(0.37), base_it + i,
                    jax.random.fold_in(key, i),
                )
                return (s_, o_), m["loss"]
            (s_, o_), losses = jax.lax.scan(
                body, (st, os_), jnp.arange(SCAN, dtype=jnp.int32)
            )
            return s_, o_, losses

        t0 = time.time()
        state, opt_state, losses = scan_burst(
            state, opt_state, jnp.int32(it0 + 100), jax.random.PRNGKey(99)
        )
        _ = float(losses[-1])
        print(f"stage {stage}: scan compile+1st {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        for i in range(args.iters):
            state, opt_state, losses = scan_burst(
                state, opt_state, jnp.int32(it0 + 200 + SCAN * i),
                jax.random.PRNGKey(100 + i),
            )
            _ = float(losses[-1])
        dt3 = (time.time() - t0) / (args.iters * SCAN)
        print(f"stage {stage}: {dt3*1000:.1f} ms/iter (scan x{SCAN})",
              flush=True)

    print({k: f"{v*1000:.1f} ms" for k, v in results.items()})


if __name__ == "__main__":
    main()
