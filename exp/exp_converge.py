"""Deep synthetic convergence prototype (VERDICT r1 next #9).

Multi-view dynamic synthetic scene trained through all three stage
transitions; goal: test PSNR > 25 dB and stage-2/3 not regressing quality.
Tunes the recipe that tests/test_training.py's slow test freezes.
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PALLAS_INTERPRET", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])
import numpy as np

from gaussianprediction_tpu.config import get_preset
from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info
from gaussianprediction_tpu.train.loop import Trainer


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    cfg = get_preset("test")
    # quality A/B of the weight encoders (GPT_ENCODER=fourier|hashgrid)
    cfg.model.weight_encoder = os.environ.get("GPT_ENCODER", "hashgrid")
    print("weight_encoder:", cfg.model.weight_encoder)
    cfg.train.jointly_iteration = 150
    cfg.train.second_stage_iteration = 1200
    cfg.train.third_stage_iteration = 1800
    cfg.train.adaptive_from_iter = 100
    cfg.train.adaptive_end_iter = 500
    cfg.train.adaptive_interval = 100
    cfg.train.time_noise_iteration = 600
    cfg.train.xyz_noise_iteration = 600
    cfg.opt.iterations = iters
    cfg.opt.position_lr_max_steps = iters
    cfg.opt.densify_from_iter = 200
    cfg.opt.densify_until_iter = 1000
    cfg.opt.densification_interval = 100
    cfg.opt.opacity_reset_interval = 10 ** 6
    cfg.train.test_iterations = tuple(range(200, iters + 1, 200))

    info = synthetic_scene_info(
        n_points=256, n_cams=24, n_test=3, width=64, height=64,
        dynamic=True, interpret=True,
    )
    scene = Scene(info)
    tr = Trainer(cfg, scene, interpret=True, quiet=False, log_every=100)
    t0 = time.time()
    tr.run(iterations=iters, model_path=None)
    evals = [e["eval"] for e in tr._history if "eval" in e]
    for e in evals:
        print(e)
    print(f"wall: {time.time()-t0:.0f}s")
    final = evals[-1]["test_psnr"]
    s1 = [e for e in evals if e["iter"] <= 500]
    print(f"final test PSNR {final:.2f}; stage-1 best "
          f"{max(e['test_psnr'] for e in s1):.2f}")


if __name__ == "__main__":
    main()
