"""GaussianPrediction-TPU: a TPU-native dynamic 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BoMingZhao/GaussianPrediction (SIGGRAPH 2024): dynamic novel-view synthesis
with canonical 3D Gaussians + keypoint-driven deformation, and GCN-based
motion extrapolation — built TPU-first:

- the differentiable rasterizer is a Pallas tile kernel pair (fwd/bwd) over a
  statically-shaped, sort-binned instance list (no atomics: deterministic
  segmented reductions),
- all neighbor/sampling ops (KNN, FPS, k-means, hash-grid encoding) are
  XLA-native with MXU-friendly blocked distance matmuls,
- training steps are jit/pjit-compiled with static capacity buffers and alive
  masks (densify/prune are masked recompactions, never reallocations),
- multi-chip scaling shards the framebuffer tile grid and the frame batch
  over a `jax.sharding.Mesh`, with per-Gaussian gradient psum.

Package layout:
  utils/     math, SH, cameras, schedules, image metrics, PLY I/O
  ops/       projection, tile binning, Pallas rasterizer, knn/fps/kmeans/hashgrid
  models/    Gaussian state pytrees, deformation field, weight model, GCN
  data/      D-NeRF/Blender, COLMAP, HyperNeRF loaders; synthetic test scenes
  train/     optimizers, densification, stage-wise train steps, training loop
  parallel/  device mesh + shard_map'd multi-chip train step
  eval/      metric suite and render drivers
  motion/    keypoint trajectory extraction, GCN training, rollout
"""

__version__ = "0.1.0"
