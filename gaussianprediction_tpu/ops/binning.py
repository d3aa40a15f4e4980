"""Tile binning: build depth-ordered per-tile Gaussian instance lists.

TPU-native replacement for the duplicate-key radix sort + identifyTileRanges
stage of the CUDA rasterizer (reference submodule N1). Design (SURVEY.md
§7.3 item 2): everything is static-shape —

1. Sort Gaussians globally by view depth ONCE ([N] keys, cheap).
2. In depth order, each visible Gaussian owns `tiles_touched` consecutive
   instance slots (exclusive cumsum of rect areas). Instances are scattered
   into a fixed-capacity buffer of P slots with an unrolled loop over the
   (static) per-Gaussian tile-footprint bound — each k-th footprint slot is
   one vectorized scatter.
3. A single STABLE sort of the P instances by tile id then preserves depth
   order within each tile (this replaces the CUDA 64-bit tile|depth key).
4. Per-tile [start, end) ranges come from a searchsorted over tile ids.

Overflow policy: instances beyond capacity P, and footprint slots beyond
MAX_TILES_PER_GAUSSIAN, are dropped (tile id = SENTINEL sorts last). The
returned `n_dropped` lets callers size P so results are exact on target
scenes (BASELINE scenes fit comfortably; see tests/test_binning.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussianprediction_tpu.ops.projection import TILE, Projected


class Binning(NamedTuple):
    gauss_id: jnp.ndarray     # [P] int32 gaussian index per instance (capped)
    tile_id: jnp.ndarray      # [P] int32 owning tile (SENTINEL = unused slot)
    tile_start: jnp.ndarray   # [T] int32 first instance of each tile
    tile_end: jnp.ndarray     # [T] int32 one-past-last instance
    n_instances: jnp.ndarray  # [] int32 valid instances (pre-drop count)
    n_dropped: jnp.ndarray    # [] int32 instances lost to capacity/footprint


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    capacity: int,
    max_tiles_per_gaussian: int = 128,
    align: int = 1,
) -> Binning:
    """Build the per-tile instance list. All shape params are static.

    align > 1 pads each tile's segment to a multiple of `align` slots
    (padding rows have gauss_id = -1 / tile_id = SENTINEL); required by the
    Pallas kernels whose chunked DMA reads/writes assume aligned segments.
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    num_tiles = grid_x * grid_y
    sentinel = jnp.int32(num_tiles)

    # 1. global depth order
    order = jnp.argsort(proj.depth, stable=True).astype(jnp.int32)
    tmin = proj.tiles_min[order]
    tmax = proj.tiles_max[order]
    vis = proj.visible[order]

    rect_w = tmax[:, 0] - tmin[:, 0]
    rect_h = tmax[:, 1] - tmin[:, 1]
    count_full = jnp.where(vis, rect_w * rect_h, 0)
    count = jnp.minimum(count_full, max_tiles_per_gaussian)
    offsets = jnp.cumsum(count) - count          # exclusive cumsum
    total = offsets[-1] + count[-1]

    tile_id = jnp.full((capacity,), sentinel, jnp.int32)
    gauss_id = jnp.zeros((capacity,), jnp.int32)

    # 2. footprint expansion as ONE flattened scatter: slot k of gaussian i
    # is the k-th tile of its rect (row-major). Invalid/overflow slots are
    # routed to index `capacity`, which mode="drop" discards.
    K = max_tiles_per_gaussian
    k = jnp.arange(K, dtype=jnp.int32)[None, :]              # [1, K]
    valid = (k < count[:, None]) & ((offsets[:, None] + k) < capacity)
    rw = jnp.maximum(rect_w, 1)[:, None]
    ty = tmin[:, 1:2] + k // rw
    tx = tmin[:, 0:1] + k % rw
    tid = (ty * grid_x + tx).reshape(-1)
    idx = jnp.where(valid, offsets[:, None] + k, capacity).reshape(-1)
    gids = jnp.broadcast_to(order[:, None], valid.shape).reshape(-1)
    tile_id = tile_id.at[idx].set(tid, mode="drop")
    gauss_id = gauss_id.at[idx].set(gids, mode="drop")

    # 3. stable sort by tile id keeps depth order within tiles
    perm = jnp.argsort(tile_id, stable=True)
    tile_id = tile_id[perm]
    gauss_id = gauss_id[perm]

    # 4. per-tile ranges
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_id, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_id, tids, side="right").astype(jnp.int32)

    n_valid = jnp.sum(tile_id < sentinel)
    n_dropped = jnp.sum(count_full) - n_valid

    if align > 1:
        # 5. re-layout so every tile's segment starts on an `align` boundary:
        # the Pallas backward writes per-instance gradients in fixed `align`-
        # sized chunks, and alignment guarantees a chunk never crosses into
        # another tile's rows (deterministic, race-free by construction).
        counts = tile_end - tile_start
        padded_counts = ((counts + align - 1) // align) * align
        padded_start = (jnp.cumsum(padded_counts) - padded_counts).astype(
            jnp.int32
        )
        # new position of instance j of tile t: padded_start[t] + (j - start[t])
        owner = tile_id  # sorted; sentinel rows map nowhere
        in_tile_pos = jnp.arange(capacity, dtype=jnp.int32) - tile_start[
            jnp.clip(owner, 0, num_tiles - 1)
        ]
        new_pos = padded_start[jnp.clip(owner, 0, num_tiles - 1)] + in_tile_pos
        new_pos = jnp.where(owner < sentinel, new_pos, capacity)
        new_tile = jnp.full((capacity,), sentinel, jnp.int32)
        new_gid = jnp.full((capacity,), -1, jnp.int32)
        new_tile = new_tile.at[new_pos].set(tile_id, mode="drop")
        new_gid = new_gid.at[new_pos].set(gauss_id, mode="drop")
        over = jnp.sum((owner < sentinel) & (new_pos >= capacity))
        tile_id, gauss_id = new_tile, new_gid
        tile_start = padded_start
        tile_end = padded_start + counts
        n_dropped = n_dropped + over

    return Binning(
        gauss_id=gauss_id,
        tile_id=tile_id,
        tile_start=tile_start,
        tile_end=tile_end,
        n_instances=total,
        n_dropped=n_dropped,
    )
