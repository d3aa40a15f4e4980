#!/usr/bin/env python
"""Training CLI: dynamic Gaussian splatting (reference train.py twin).

Usage:
  python train.py -s <scene_dir> -m <model_dir> [--preset bouncingballs]
                  [--max_time 0.8] [--iterations 60000] ...

Dataset type is auto-detected (COLMAP sparse/, Blender transforms_train.json,
HyperNeRF dataset.json). Per-scene presets reproduce the reference's shell
scripts (/root/reference/scripts/train/); any flag overrides the preset.
The resolved config is saved as cfg.json in the model dir (replacing the
reference's eval()-based cfg_args round-trip).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--preset", default=None,
                   help="per-scene preset name (see config.PRESETS)")
    p.add_argument("--max_time", type=float, default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--max_points", type=int, default=None)
    p.add_argument("--adaptive_points_num", type=int, default=None)
    p.add_argument("--time_freq", type=int, default=None)
    p.add_argument("--nearest_num", type=int, default=None)
    p.add_argument("--feature_amplify", type=float, default=None)
    p.add_argument("--norm_rotation", action="store_true", default=None)
    p.add_argument("--step_opacity", action="store_true", default=None)
    p.add_argument("--use_time_decay", action="store_true", default=None)
    p.add_argument("--white_background", action="store_true", default=None)
    p.add_argument("--second_stage_iteration", type=int, default=None)
    p.add_argument("--third_stage_iteration", type=int, default=None)
    p.add_argument("--jointly_iteration", type=int, default=None)
    p.add_argument("--densify_from_iter", type=int, default=None)
    p.add_argument("--densify_until_iter", type=int, default=None)
    p.add_argument("--position_lr_max_steps", type=int, default=None)
    p.add_argument("--adaptive_from_iter", type=int, default=None)
    p.add_argument("--adaptive_interval", type=int, default=None)
    p.add_argument("--ratio", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--save_iterations", nargs="+", type=int, default=None)
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=None)
    p.add_argument("--test_iterations", nargs="+", type=int, default=None)
    p.add_argument("--weight_encoder", default=None,
                   choices=("hashgrid", "fourier", "brick"),
                   help="stage-2/3 blend-weight encoder: 'hashgrid' is the "
                        "tcnn-parity default; 'brick' is the overlapping-"
                        "brick hash grid (one row gather per point-level, "
                        "~8x fewer gather rows); 'fourier' is the "
                        "MXU-native fast path (identical convergence in "
                        "the synthetic "
                        "A/B, ~2.7x faster stage-2 steps on TPU)")
    p.add_argument("--distill_init_steps", type=int, default=None,
                   help=">0: pre-fit the blend-weight model to the stage-1 "
                        "motion field at the stage-2 transition (shrinks "
                        "the transition PSNR cliff; 0 = reference-faithful "
                        "random init)")
    p.add_argument("--batch", type=int, default=None,
                   help="gradient accumulation: renders per optimizer step "
                        "(reference train.py:112-133; HyperNeRF recipes "
                        "use --batch 2)")
    p.add_argument("--n_devices", type=int, default=1,
                   help=">1 enables the sharded multi-chip train path "
                        "(('data','tile') mesh, parallel/shard.py)")
    p.add_argument("--n_data", type=int, default=None,
                   help="data-parallel camera groups within --n_devices "
                        "(must divide it); the rest is tile-band sharding. "
                        "Default: n_devices (data-major — the near-perfect "
                        "scaling axis, one gradient psum per step); pass a "
                        "smaller value to add tile-band sharding")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help=">1 scans K iterations per device invocation, "
                        "amortizing the per-call host round-trip (single-"
                        "device path only)")
    p.add_argument("--profile_steps", type=int, default=None,
                   help="trace this many steps with jax.profiler into "
                        "<model_path>/profile")
    p.add_argument("--profile_from", type=int, default=None,
                   help="first iteration of the profiler trace window")
    return p


def resolve_config(args):
    from gaussianprediction_tpu.config import Config, get_preset

    preset = args.preset
    if preset is None:  # guess from path
        base = os.path.basename(os.path.normpath(args.source_path)).lower()
        from gaussianprediction_tpu.config import PRESETS

        preset = base if base in PRESETS else (
            "dnerf" if "nerf" in args.source_path.lower() else "dnerf"
        )
    cfg = get_preset(preset)
    cfg.source_path = args.source_path
    cfg.model_path = args.model_path
    over_model = ["max_time", "max_points", "adaptive_points_num",
                  "nearest_num", "feature_amplify", "norm_rotation",
                  "step_opacity", "white_background", "weight_encoder"]
    over_opt = ["iterations", "time_freq", "densify_from_iter",
                "densify_until_iter", "position_lr_max_steps"]
    over_train = ["second_stage_iteration", "third_stage_iteration",
                  "jointly_iteration", "adaptive_from_iter",
                  "adaptive_interval", "seed", "save_iterations",
                  "checkpoint_iterations", "test_iterations",
                  "use_time_decay", "profile_steps", "profile_from",
                  "batch", "distill_init_steps"]
    for name in over_model:
        v = getattr(args, name)
        if v is not None:
            setattr(cfg.model, name, v)
    for name in over_opt:
        v = getattr(args, name)
        if v is not None:
            setattr(cfg.opt, name, v)
    for name in over_train:
        v = getattr(args, name)
        if v is not None:
            setattr(cfg.train, name,
                    tuple(v) if isinstance(v, list) else v)
    if args.ratio is not None:
        cfg.ratio = args.ratio
    return cfg


def _maybe_force_cpu():
    # the axon TPU plugin ignores JAX_PLATFORMS; honor our own env switch
    if os.environ.get("GPT_FORCE_CPU", "0") == "1":
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])


def main():
    _maybe_force_cpu()
    from gaussianprediction_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )
    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    maybe_initialize_distributed()
    enable_compilation_cache()
    args = build_parser().parse_args()
    cfg = resolve_config(args)

    from gaussianprediction_tpu.data.scene import Scene, load_scene_info
    from gaussianprediction_tpu.train.loop import Trainer

    os.makedirs(cfg.model_path, exist_ok=True)
    with open(os.path.join(cfg.model_path, "cfg.json"), "w") as f:
        f.write(cfg.to_json())

    print(f"Loading scene from {cfg.source_path}")
    info = load_scene_info(cfg, lazy=True)
    scene = Scene(info, seed=cfg.train.seed)
    print(
        f"{len(scene.train_cameras)} train / {len(scene.test_cameras)} test "
        f"cameras, extent {scene.cameras_extent:.3f}"
    )
    n_data = args.n_data if args.n_data is not None else args.n_devices
    trainer = Trainer(
        cfg, scene, n_devices=args.n_devices, n_data=n_data,
        steps_per_call=args.steps_per_call,
    )
    if args.n_devices > 1:
        print(f"multi-chip: {args.n_devices} devices "
              f"({n_data} data x {args.n_devices // n_data} tile)")
    if args.start_checkpoint:
        trainer.load_checkpoint(args.start_checkpoint)
        print(f"resumed from {args.start_checkpoint} @ {trainer.iteration}")
    trainer.run(model_path=cfg.model_path)
    trainer.save_checkpoint(
        os.path.join(cfg.model_path, f"chkpnt{trainer.iteration}.npz")
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
