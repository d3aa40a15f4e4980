from gaussianprediction_tpu.motion import dataset, gcn_train  # noqa: F401
