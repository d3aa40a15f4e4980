#!/usr/bin/env python
"""Distillation arm for the quality proxy: resume a keypoint arm from its
saved phase-1 (pre-transition) checkpoint with cfg.train.distill_init_steps
enabled, re-run the transition + stages 2/3, and append the result to the
existing QUALITY.json (arm name "<encoder>+distill").

The r4 transition diagnostics showed the PSNR cliff is entirely the
reference-faithful random-weight re-parameterization (err_blend ==
err_uniform_nn, noise contribution nil); this arm measures how much the
TPU-era distillation init (train/loop.py distill_weight_init) recovers,
on the SAME phase-1 state as the faithful arm.

Usage:
  python tools/distill_arm.py --out exp/logs/quality_r04 --arm hashgrid \
      [--steps 6000] [--distill 500]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_proxy import build_proxy_cfg, grade_arms  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exp/logs/quality_r04")
    p.add_argument("--arm", default="hashgrid")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=55)
    p.add_argument("--n_test", type=int, default=5)
    p.add_argument("--n_points", type=int, default=2000)
    p.add_argument("--distill", type=int, default=500)
    p.add_argument("--reseed", type=int, default=0,
                   help="fold this into the restored RNG key: with "
                        "--distill 0 this reruns the FAITHFUL phase 2 on "
                        "a fresh trajectory from the same checkpoint — "
                        "seed-noise evidence for the pass margin")
    p.add_argument("--steps_per_call", type=int, default=10)
    args = p.parse_args()

    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from gaussianprediction_tpu.data.scene import (
        Scene, synthetic_scene_info,
    )
    from gaussianprediction_tpu.train.diag import transition_diagnostics
    from gaussianprediction_tpu.train.loop import Trainer

    S = args.steps
    cfg = build_proxy_cfg(args.arm, S, args.n_points,
                          distill_steps=args.distill)
    s2 = cfg.train.second_stage_iteration
    ckpt = os.path.join(args.out, args.arm, f"chkpnt{s2}.npz")
    assert os.path.exists(ckpt), f"phase-1 checkpoint missing: {ckpt}"

    print(f"building scene + trainer, resuming {ckpt}", flush=True)
    info = synthetic_scene_info(
        n_points=args.n_points, n_cams=args.frames, n_test=args.n_test,
        width=args.size, height=args.size, dynamic=True,
    )
    t0 = time.time()
    tr = Trainer(cfg, Scene(info, seed=1), quiet=False,
                 log_every=max(S // 20, 1),
                 steps_per_call=args.steps_per_call)
    tr.load_checkpoint(ckpt)
    assert tr.iteration == s2, tr.iteration
    if args.reseed:
        import jax

        tr.key = jax.random.fold_in(tr.key, args.reseed)

    arm_name = f"{args.arm}+distill" if args.distill else (
        f"{args.arm}+seed{args.reseed}")
    mp = os.path.join(args.out, arm_name)
    os.makedirs(mp, exist_ok=True)
    tr._maybe_stage_transition(s2 + 1)  # kpts + distill (idempotent)
    diag = transition_diagnostics(tr)
    print("post-distill transition diag:",
          json.dumps({k: v for k, v in diag.items() if k != "per_time"}),
          flush=True)
    tr.run(iterations=S, model_path=mp)
    report = tr.training_report(S)
    wall = time.time() - t0

    qpath = os.path.join(args.out, "QUALITY.json")
    with open(qpath) as f:
        results = json.load(f)
    results["arms"][arm_name] = {
        "resumed_from": ckpt,
        "distill_init_steps": args.distill,
        "transition_diag": diag,
        "test_psnr": report.get("test_psnr"),
        "test_l1": report.get("test_l1"),
        "train_psnr": report.get("train_psnr"),
        "n_gaussians": int(tr.state.n_alive()),
        "n_kpts": int(tr.state.n_kpts()),
        "wall_s": round(wall, 1),
    }
    grade_arms(results["arms"])
    with open(qpath, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["arms"][arm_name], indent=1, default=str))


if __name__ == "__main__":
    main()
