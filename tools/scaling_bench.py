#!/usr/bin/env python
"""SCALING artifact: data-axis + tile-axis structure numbers (VERDICT r3 #4).

Two scaling axes for the ('data','tile') mesh (parallel/shard.py):

- DATA axis (cameras): each device steps its OWN camera and psums
  gradients. Per-device compute is exactly the single-camera step —
  measured here — so the structure number is t_step/(t_step + t_psum).
  t_psum is modeled from the measured gradient-tree bytes at ICI
  all-reduce bandwidth (no multi-chip hardware in this environment; the
  model is stated in the artifact). The sharded==single trajectory
  equality on the virtual mesh (tests/test_parallel.py,
  __graft_entry__.dryrun_multichip) carries the correctness evidence.
- TILE axis (bands of one frame): delegated to tools/band_cost_bench.py —
  real-chip measured cost of a 1/n band with band-proportional capacity,
  projected efficiency t_full/(n * t_band).

Usage: python tools/scaling_bench.py [--out SCALING_r04.json]
"""
import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ICI: 4 links x ~45 GB/s usable per direction in a 2D torus; a ring
# all-reduce moves 2*(n-1)/n * bytes per chip. Conservative single-link
# figure keeps the model honest.
ICI_GBPS = 45.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="SCALING_r04.json")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--skip-tile", action="store_true")
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
    from gaussianprediction_tpu.train.step import make_train_step

    W = H = args.wh
    cfg = Config()
    cfg.model.max_gaussian_size = args.n

    g = random_gaussians(args.n, seed=42, scale_range=(-5.2, -3.8))
    state = G.create_from_pcd(
        jax.random.PRNGKey(0), cfg, g["xyz"],
        np.random.default_rng(0).uniform(0, 1, (args.n, 3)).astype(
            np.float32),
    )
    cam = jax.tree.map(
        jnp.asarray,
        orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict(),
    )
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = np.zeros(3, np.float32)

    def probe(params, alive):
        return probe_slot_need(
            params["xyz"], scaling_act(params["scaling"]),
            params["rotation"], opacity_act(params["opacity"]), cam, W, H,
            alive=alive,
        )

    need = int(jax.jit(probe)(state.params, state.alive))
    cfg.model.capacity_multiplier = max(
        2.0, math.ceil(1.3 * need / max(state.capacity, 1) * 2.0) / 2.0
    )
    print(f"probe -> mult {cfg.model.capacity_multiplier}", flush=True)

    # --- data axis: the per-device step IS the single-camera step --------
    opt_state = opt_mod.init_adam(state.params)
    _, step_raw, _ = make_train_step(
        cfg, 1, W, H, 1.0, cfg.model.sh_degree, 100, bg,
    )
    SCAN = 8

    @jax.jit
    def burst(st_, os_, base_it, key):
        def body(c, i):
            s_, o_ = c
            s_, o_, m = step_raw(
                s_, o_, cam, gt, jnp.float32(0.37), base_it + i,
                jax.random.fold_in(key, i),
            )
            return (s_, o_), m["loss"]

        (s_, o_), losses = jax.lax.scan(
            body, (st_, os_), jnp.arange(SCAN, dtype=jnp.int32)
        )
        return s_, o_, losses

    t0 = time.time()
    state, opt_state, losses = burst(
        state, opt_state, jnp.int32(3500), jax.random.PRNGKey(2)
    )
    _ = float(losses[-1])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(args.iters):
        state, opt_state, losses = burst(
            state, opt_state, jnp.int32(3500 + SCAN * (i + 1)),
            jax.random.PRNGKey(3 + i),
        )
        _ = float(losses[-1])
    t_step_ms = (time.time() - t0) / (args.iters * SCAN) * 1000

    # gradient-tree bytes = the all-reduce payload of the data axis
    grad_bytes = sum(
        int(np.prod(x.shape)) * 4
        for x in jax.tree.leaves(state.params)
    )
    data_rows = []
    for n in (2, 4, 8, 16):
        ar_ms = (2 * (n - 1) / n) * grad_bytes / (ICI_GBPS * 1e9) * 1e3
        eff = t_step_ms / (t_step_ms + ar_ms)
        data_rows.append({
            "n_devices": n,
            "allreduce_model_ms": round(ar_ms, 2),
            "projected_efficiency": round(eff, 3),
        })
    data_axis = {
        "t_step_ms_measured": round(t_step_ms, 2),
        "compile_s": round(compile_s, 1),
        "grad_bytes": grad_bytes,
        "ici_gbps_assumed": ICI_GBPS,
        "note": "per-device work of n-way camera DP == the measured "
                "single-camera step; psum cost modeled (one chip here); "
                "correctness: sharded==single trajectory tests",
        "points": data_rows,
    }
    print(json.dumps(data_axis, indent=1), flush=True)

    # --- tile axis: delegate to band_cost_bench --------------------------
    tile_axis = None
    if not args.skip_tile:
        tile_out = "/tmp/BANDCOST_scaling.json"
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "band_cost_bench.py"),
             "--out", tile_out, "--n", str(args.n), "--wh", str(args.wh)],
            capture_output=True, text=True, timeout=3600,
        )
        print(r.stdout[-2000:], flush=True)
        if r.returncode == 0 and os.path.exists(tile_out):
            with open(tile_out) as f:
                tile_axis = json.load(f)
        else:
            tile_axis = {"error": r.stderr[-1000:]}

    out = {
        "workload": {"n_gaussians": args.n, "width": W, "height": H},
        "platform": jax.devices()[0].platform,
        "default_mesh": "data-major (train.py --n_devices N defaults to "
                        "n_data=N, tile=1)",
        "data_axis": data_axis,
        "tile_axis": tile_axis,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
