"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.3); this layer is the
additive TPU-native scaling design (§5.7-5.8): a ('data', 'tile') mesh where
- 'data'  shards the frame batch (each group trains on its own camera),
- 'tile'  shards the framebuffer tile-row bands of each frame,
with Gaussian parameters replicated (N<=200k ≈ 50MB fp32) and per-Gaussian
gradients psum'd across the whole mesh — collectives ride ICI within a
slice. Multi-host meshes come from jax.distributed + the same axis names.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_tile: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'tile') mesh over `devices` (default: all)."""
    if devices is None:
        devices = jax.devices()
        if not any(d.platform in ("tpu", "axon") for d in devices):
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
    devices = list(devices)
    if n_tile is None:
        n_tile = len(devices) // n_data
    assert n_data * n_tile <= len(devices), (
        f"need {n_data * n_tile} devices, have {len(devices)}"
    )
    arr = np.array(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(arr, ("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, *trailing) -> NamedSharding:
    return NamedSharding(mesh, P("data", *trailing))
