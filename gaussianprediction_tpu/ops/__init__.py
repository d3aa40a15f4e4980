from gaussianprediction_tpu.ops import (  # noqa: F401
    binning, fps, hashgrid, kmeans, knn, projection, rasterize,
    rasterize_pallas, rasterize_reference,
)
