from gaussianprediction_tpu.train import (  # noqa: F401
    checkpoint, densify, loop, optimizer, step,
)
