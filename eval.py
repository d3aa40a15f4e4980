#!/usr/bin/env python
"""Evaluation / rendering CLI (reference eval.py twin).

Usage:
  python eval.py -m <model_dir> [--ckpt_iteration 60000]
                 [--render_video] [--render_train] [--skip_metrics]

Loads cfg.json + the checkpoint from the model dir, renders the test set
(with FPS timing), computes the metric suite into results.json, and
optionally renders a pose/time-interpolated video or frozen-view training
sequences (eval.py:75-258 behaviors).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _maybe_force_cpu():
    # the axon TPU plugin ignores JAX_PLATFORMS; honor our own env switch
    if os.environ.get("GPT_FORCE_CPU", "0") == "1":
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])


def main():
    _maybe_force_cpu()
    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", default=None)
    p.add_argument("--ckpt_iteration", type=int, default=None)
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--render_train", action="store_true")
    p.add_argument("--train_view", type=int, default=5)
    p.add_argument("--interpolation", type=int, default=5)
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--resize", type=float, default=1.0)
    args = p.parse_args()

    import numpy as np

    from gaussianprediction_tpu.config import Config
    from gaussianprediction_tpu.data.scene import Scene, load_scene_info
    from gaussianprediction_tpu.eval import metrics as M
    from gaussianprediction_tpu.eval import render as R
    from gaussianprediction_tpu.train.loop import Trainer

    with open(os.path.join(args.model_path, "cfg.json")) as f:
        cfg = Config.from_json(f.read())
    if args.source_path:
        cfg.source_path = args.source_path

    it = args.ckpt_iteration
    if it is None:  # newest checkpoint
        cks = [f for f in os.listdir(args.model_path)
               if f.startswith("chkpnt") and f.endswith(".npz")]
        assert cks, f"no checkpoints in {args.model_path}"
        it = max(int(f[6:-4]) for f in cks)
    ckpt_path = os.path.join(args.model_path, f"chkpnt{it}.npz")

    info = load_scene_info(cfg, lazy=True)
    scene = Scene(info)
    trainer = Trainer(cfg, scene, quiet=True)
    trainer.load_checkpoint(ckpt_path)
    print(f"loaded {ckpt_path} (iteration {trainer.iteration})")

    bg = (np.ones(3, np.float32) if cfg.model.white_background
          else np.zeros(3, np.float32))
    out_dir = os.path.join(
        args.model_path + "eval", "test", f"ours_{trainer.iteration}"
    )
    renders, gts, fps = R.render_set(
        trainer.state, cfg, trainer.iteration, scene.test_cameras, bg,
        out_dir=out_dir,
    )
    print(f"Rendering AVG FPS: {fps:.3f}")

    if not args.skip_metrics and gts:
        res = M.evaluate_pairs(renders, gts)
        import json

        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump(res["mean"], f, indent=2)
        with open(os.path.join(out_dir, "per_view.json"), "w") as f:
            json.dump(res["per_view"], f, indent=2)
        print("metrics:", {k: v for k, v in res["mean"].items()})

    if args.render_video:
        R.render_video(
            trainer.state, cfg, trainer.iteration, scene.render_cameras, bg,
            out_path=os.path.join(out_dir, "renders_video", "video.mp4"),
            interpolation=args.interpolation,
            # vrig paired-rig captures alternate cameras frame-to-frame:
            # stride 2 like the reference (eval.py:81)
            step=2 if "vrig" in (cfg.source_path or "").lower() else 1,
        )
        print("video written")

    if args.render_train:
        freeze = scene.test_cameras[
            min(args.train_view, len(scene.test_cameras) - 1)
        ]
        R.render_train_sequence(
            trainer.state, cfg, trainer.iteration, scene.train_cameras,
            freeze, bg,
            out_dir=os.path.join(out_dir, f"view_{args.train_view:03d}"),
        )
        print("train sequence written")


if __name__ == "__main__":
    main()
