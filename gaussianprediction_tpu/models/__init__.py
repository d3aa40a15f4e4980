from gaussianprediction_tpu.models import deform, gaussians, gcn  # noqa: F401
