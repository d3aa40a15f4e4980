from gaussianprediction_tpu.parallel import mesh, shard  # noqa: F401
