"""Probe: pure static 3DGS fit (stage 0 only) on a synthetic scene.

Separates the core optimizer/render fit quality from the deform stages:
if this stalls below ~25 dB the static pipeline has a bug; if it
converges, the convergence gap is in the dynamic stages.
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    densify = "--densify" in sys.argv
    cfg = get_preset("test")
    cfg.train.jointly_iteration = 10 ** 6   # stay in stage 0 (no deform)
    cfg.train.second_stage_iteration = 10 ** 6
    cfg.train.third_stage_iteration = 10 ** 6 + 1
    cfg.opt.iterations = iters
    cfg.opt.position_lr_max_steps = iters
    if densify:
        cfg.opt.densify_from_iter = 100
        cfg.opt.densify_until_iter = iters // 2
        cfg.opt.densification_interval = 100
    else:
        cfg.opt.densify_from_iter = 10 ** 6
        cfg.opt.densify_until_iter = 0
    cfg.opt.opacity_reset_interval = 10 ** 6
    cfg.train.test_iterations = tuple(range(100, iters + 1, 100))

    info = synthetic_scene_info(
        n_points=256, n_cams=16, n_test=3, width=64, height=64,
        dynamic=False, interpret=True,
    )
    scene = Scene(info)
    tr = Trainer(cfg, scene, interpret=True, quiet=True, log_every=100)
    t0 = time.time()
    tr.run(iterations=iters, model_path=None)
    for e in (e["eval"] for e in tr._history if "eval" in e):
        print({k: round(v, 3) for k, v in e.items()})
    print(f"wall: {time.time()-t0:.0f}s densify={densify}")


if __name__ == "__main__":
    main()
