from gaussianprediction_tpu.utils import camera, image, math, ply, schedules, sh  # noqa: F401
