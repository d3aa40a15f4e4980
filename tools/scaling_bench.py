"""Multi-chip scaling benchmark: per-chip rays/s vs mesh size.

Measures the sharded train step (parallel/shard.py: tile-band + data
parallel over a ('data','tile') mesh) at mesh sizes 1/2/4/8 and reports
scaling efficiency = throughput(n) / (n * throughput(1)), against
BASELINE.md's >=85% target.

This environment exposes ONE real TPU chip, so multi-chip points run on a
virtual CPU-device mesh (GPT_FORCE_CPU=1 + xla_force_host_platform_device
_count) — those numbers measure the SHARDING overhead structure (collective
count, band stitching, replicated-projection waste), not real ICI speed;
the JSON flags which backend produced each point. On a real slice, run
un-forced and the same harness reports real efficiency.

Usage:
  GPT_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --out SCALING_r02.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="SCALING.json")
    p.add_argument("--meshes", default="1,2,4,8",
                   help="total device counts to measure")
    p.add_argument("--wh", type=int, default=None,
                   help="frame size (default: 256 cpu / 800 tpu)")
    p.add_argument("--n", type=int, default=None,
                   help="gaussian count (default: 4096 cpu / 100k tpu)")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    if os.environ.get("GPT_FORCE_CPU", "0") == "1":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("GPT_FORCE_CPU", "0") == "1":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        devices = jax.devices("cpu")
        backend = "cpu-virtual"
    else:
        devices = jax.devices()
        backend = devices[0].platform

    on_accel = backend in ("tpu", "axon")
    W = H = args.wh or (800 if on_accel else 256)
    N = args.n or (100_000 if on_accel else 4096)
    interpret = None if on_accel else True

    from gaussianprediction_tpu.config import get_preset
    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians,
    )
    from gaussianprediction_tpu.models import gaussians as G
    from gaussianprediction_tpu.parallel.mesh import make_mesh
    from gaussianprediction_tpu.parallel.shard import make_sharded_train_step
    from gaussianprediction_tpu.train import optimizer as opt_mod
    from gaussianprediction_tpu.train.loop import set_super_keypoints

    cfg = get_preset("test")
    cfg.model.max_gaussian_size = N
    cfg.model.capacity = ((N + 1023) // 1024) * 1024
    g = random_gaussians(N, seed=0, scale_range=(-5.0, -3.6))
    state0 = G.create_from_pcd(
        jax.random.PRNGKey(0), cfg, g["xyz"],
        np.random.default_rng(0).uniform(0, 1, (N, 3)).astype(np.float32),
    )
    state0 = jax.jit(lambda s, k: set_super_keypoints(s, cfg, k))(
        state0, jax.random.PRNGKey(1)
    )
    iteration = jnp.int32(cfg.train.second_stage_iteration + 10)

    results = []
    base_rps = None
    for n_dev in [int(x) for x in args.meshes.split(",")]:
        if n_dev > len(devices):
            print(f"skip n={n_dev}: only {len(devices)} devices")
            continue
        n_data = 2 if n_dev >= 4 else 1
        n_tile = n_dev // n_data
        mesh = make_mesh(n_data=n_data, n_tile=n_tile,
                         devices=devices[:n_dev])
        step, B = make_sharded_train_step(
            cfg, stage=2, width=W, height=H, spatial_scale=1.0,
            sh_degree=cfg.model.sh_degree, total_frame=8,
            bg=np.zeros(3, np.float32), mesh=mesh, interpret=interpret,
        )
        cams = [orbit_camera(0.2 + 0.3 * i, width=W, height=H,
                             time=i / max(B, 2), uid=i) for i in range(B)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[c.to_device_dict() for c in cams],
        )
        gts = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (B, H, W, 3)),
            jnp.float32,
        )
        times = jnp.asarray([c.time for c in cams], jnp.float32)
        state = jax.tree.map(jnp.copy, state0)
        opt_state = opt_mod.init_adam(state.params)

        t0 = time.time()
        state, opt_state, m = step(state, opt_state, cam_batch, gts, times,
                                   iteration, jax.random.PRNGKey(2))
        _ = float(m["loss"])
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            state, opt_state, m = step(
                state, opt_state, cam_batch, gts, times, iteration,
                jax.random.PRNGKey(3 + i),
            )
            _ = float(m["loss"])
        dt = (time.time() - t0) / args.iters
        rays = W * H * B / dt  # rays/s across the whole mesh (B frames/step)
        per_chip = rays / n_dev
        if base_rps is None:
            base_rps = per_chip
        eff = per_chip / base_rps
        row = {
            "n_devices": n_dev, "mesh": f"{n_data}x{n_tile}",
            "backend": backend, "step_ms": dt * 1000,
            "rays_per_s": rays, "rays_per_s_per_chip": per_chip,
            "efficiency_vs_1": eff, "compile_s": compile_s,
            "loss": float(m["loss"]),
            "n_dropped": int(m["n_dropped"]),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "workload": {"width": W, "height": H, "n_gaussians": N,
                     "stage": 2},
        "backend": backend,
        "note": ("cpu-virtual points measure sharding structure only; "
                 "run on a real slice for ICI numbers"
                 if backend == "cpu-virtual" else "real-device measurement"),
        "target_efficiency": 0.85,
        "points": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
