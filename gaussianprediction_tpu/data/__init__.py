from gaussianprediction_tpu.data import (  # noqa: F401
    blender, colmap, hypernerf, image_io, scene, scene_types, synthetic,
)
