from gaussianprediction_tpu.eval import metrics, render  # noqa: F401
