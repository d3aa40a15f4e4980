#!/usr/bin/env python
"""Full train-step benchmark -> committed per-round artifact (VERDICT r3 #3).

Times the COMPLETE jitted training step (deform + render + loss + backward
+ masked Adam + stats) per stage at the bench-standard workload (200k
Gaussians, 800x800, probe-sized instance capacity), reporting scan-burst
ms/iter (8 steps fused in one device program — pure device time, no
dispatch/tunnel RTT) plus the per-call synced number for context. Stage 2
runs under both weight encoders so the encoder decision keeps a cost trail.

The render-only bench (bench.py) is the headline; this artifact tracks the
TRAINING-step multiple of it round over round (r3 finding: stage-0 trained
3.9x slower than the bench purely from a stale capacity multiplier).

Usage: python tools/fullstep_bench.py [--out FULLSTEP_r04.json]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="FULLSTEP_r04.json")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--scan", type=int, default=8)
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
    from gaussianprediction_tpu.models.gaussians import (
        opacity_act, scaling_act,
    )
    from gaussianprediction_tpu.ops.instance_stream import probe_slot_need
    from gaussianprediction_tpu.train import optimizer as opt_mod
    from gaussianprediction_tpu.train.loop import set_super_keypoints
    from gaussianprediction_tpu.train.step import make_train_step

    W = H = args.wh
    cfg = Config()
    cfg.model.max_gaussian_size = args.n

    g = random_gaussians(args.n, seed=42, scale_range=(-5.2, -3.8))
    state0 = G.create_from_pcd(
        jax.random.PRNGKey(0), cfg, g["xyz"],
        np.random.default_rng(0).uniform(0, 1, (args.n, 3)).astype(
            np.float32),
    )
    cam = jax.tree.map(
        jnp.asarray, orbit_camera(0.5, width=W, height=H, uid=0)
        .to_device_dict()
    )
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = np.zeros(3, np.float32)

    def probe(params, alive):
        return probe_slot_need(
            params["xyz"], scaling_act(params["scaling"]),
            params["rotation"], opacity_act(params["opacity"]), cam, W, H,
            alive=alive,
        )

    need = int(jax.jit(probe)(state0.params, state0.alive))
    mult = max(2.0, math.ceil(1.3 * need / max(state0.capacity, 1) * 2.0)
               / 2.0)
    cfg.model.capacity_multiplier = mult
    print(f"probe: {need} slots -> mult {mult}", flush=True)

    # Host-side (numpy) state snapshots: at mult ~12 the stage-2 step plus
    # several resident device states exhausts HBM — materialize one device
    # state per run and free it afterwards.
    def to_host(s):
        return jax.tree.map(np.asarray, s)

    host = {}
    host["base"] = to_host(state0)
    host["kpts"] = to_host(jax.jit(
        lambda s, k: set_super_keypoints(s, cfg, k)
    )(state0, jax.random.PRNGKey(1)))
    del state0
    # separate fourier-encoder state: the weight MLP input width differs
    # (fourier feature dim vs hash_levels*hash_features)
    cfg.model.weight_encoder = "fourier"
    host["fourier"] = to_host(jax.jit(
        lambda s, k: set_super_keypoints(s, cfg, k)
    )(
        G.create_from_pcd(
            jax.random.PRNGKey(0), cfg, g["xyz"],
            np.random.default_rng(0).uniform(
                0, 1, (args.n, 3)).astype(np.float32),
        ),
        jax.random.PRNGKey(1),
    ))
    # brick-encoder state (round 5): overlapping-brick hash tables — the
    # TPU-native fast hash encoder (ops/hashgrid.py brickgrid_encode_fast)
    cfg.model.weight_encoder = "brick"
    host["brick"] = to_host(jax.jit(
        lambda s, k: set_super_keypoints(s, cfg, k)
    )(
        G.create_from_pcd(
            jax.random.PRNGKey(0), cfg, g["xyz"],
            np.random.default_rng(0).uniform(
                0, 1, (args.n, 3)).astype(np.float32),
        ),
        jax.random.PRNGKey(1),
    ))
    cfg.model.weight_encoder = "hashgrid"

    results = {}
    runs = [("stage0", 0, "hashgrid"), ("stage1", 1, "hashgrid"),
            ("stage2_hashgrid", 2, "hashgrid"),
            ("stage2_fourier", 2, "fourier"),
            ("stage2_brick", 2, "brick"), ("stage3", 3, "hashgrid")]
    for name, stage, encoder in runs:
        cfg.model.weight_encoder = encoder
        if encoder in ("fourier", "brick"):
            src = host[encoder]
        else:
            src = host["kpts"] if stage >= 2 else host["base"]
        st = jax.tree.map(jnp.asarray, src)
        opt_state = opt_mod.init_adam(st.params)
        it0 = {0: 500, 1: 3500, 2: 31000, 3: 61000}[stage]
        _, step_raw, _ = make_train_step(
            cfg, stage, W, H, 1.0, cfg.model.sh_degree, 100, bg,
        )
        SCAN = args.scan

        @jax.jit
        def scan_burst(st_, os_, base_it, key):
            def body(c, i):
                s_, o_ = c
                s_, o_, m = step_raw(
                    s_, o_, cam, gt, jnp.float32(0.37), base_it + i,
                    jax.random.fold_in(key, i),
                )
                return (s_, o_), (m["loss"], m["n_dropped"])

            (s_, o_), (losses, nd) = jax.lax.scan(
                body, (st_, os_), jnp.arange(SCAN, dtype=jnp.int32)
            )
            return s_, o_, losses, jnp.max(nd)

        t0 = time.time()
        st, opt_state, losses, nd = scan_burst(
            st, opt_state, jnp.int32(it0), jax.random.PRNGKey(2)
        )
        _ = float(losses[-1])
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            st, opt_state, losses, nd = scan_burst(
                st, opt_state, jnp.int32(it0 + SCAN * (i + 1)),
                jax.random.PRNGKey(3 + i),
            )
            _ = float(losses[-1])
        ms = (time.time() - t0) / (args.iters * SCAN) * 1000
        row = {
            "ms_per_iter_scan": round(ms, 2),
            "n_dropped": int(nd),
            "compile_s": round(compile_s, 1),
        }
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)
        del st, opt_state

    out = {
        "workload": {
            "n_gaussians": args.n, "width": W, "height": H,
            "capacity_multiplier": mult,
            "what": f"full train step (deform+render+loss+bwd+adam+stats), "
                    f"scan x{args.scan} fused device time",
        },
        "platform": jax.devices()[0].platform,
        "stages": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
