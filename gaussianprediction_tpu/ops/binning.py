"""Tile binning: build depth-ordered per-tile Gaussian instance lists.

TPU-native replacement for the duplicate-key radix sort + identifyTileRanges
stage of the CUDA rasterizer (reference submodule N1). Design (SURVEY.md
§7.3 item 2): everything is static-shape and — crucially — SCATTER-FREE:
XLA scatters are semi-serialized on TPU (~65 ms for the 12.8M-element
footprint scatter of a production scene) while sorts and gathers are fast,
so every layout step is expressed as a gather:

1. Sort Gaussians globally by view depth ONCE ([N] keys, cheap).
2. In depth order, Gaussian g owns `count[g]` consecutive instance slots
   (exclusive cumsum of clamped rect areas). The compact instance list is
   materialized by the inverse map: slot j belongs to gaussian
   g(j) = searchsorted(offsets, j, 'right')-1 with in-rect index
   k(j) = j - offsets[g(j)] — a vectorized binary search + gathers.
3. One STABLE sort of the P instances by tile id preserves depth order
   within each tile (replacing the CUDA 64-bit tile|depth key).
4. Per-tile [start, end) ranges via searchsorted over tile ids.
5. (align > 1) The chunk-aligned layout — required so the Pallas backward's
   fixed-size chunk writes never cross tile boundaries — is ALSO a gather:
   padded slot j holds source instance ts[t(j)] + (j - padded_start[t(j)])
   where t(j) = searchsorted(padded_start, j, 'right')-1.

Overflow policy: instances beyond capacity P, and footprint slots beyond
max_tiles_per_gaussian, are dropped; `n_dropped` reports the loss so
configs can size P for exactness on target scenes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussianprediction_tpu.ops.projection import TILE, Projected


class Binning(NamedTuple):
    gauss_id: jnp.ndarray     # [P] int32 gaussian index (-1 = padding slot)
    tile_id: jnp.ndarray      # [P] int32 owning tile (SENTINEL = unused)
    tile_start: jnp.ndarray   # [T] int32 first instance of each tile
    tile_end: jnp.ndarray     # [T] int32 one-past-last instance
    n_instances: jnp.ndarray  # [] int32 valid instances (pre-drop count)
    n_dropped: jnp.ndarray    # [] int32 instances lost to capacity/footprint


def _inverse_ranges(starts, queries, n_upper):
    """For monotonically nondecreasing `starts` [M], map each query position
    to the range index it falls in: searchsorted(starts, q, 'right') - 1."""
    return (
        jnp.searchsorted(starts, queries, side="right").astype(jnp.int32) - 1
    )


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    capacity: int,
    max_tiles_per_gaussian: int = 1024,
    align: int = 1,
) -> Binning:
    """Build the per-tile instance list. All shape params are static.

    align > 1 pads each tile's segment to a multiple of `align` slots
    (padding rows have gauss_id = -1 / tile_id = SENTINEL).
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

    rect_w = jnp.maximum(tmax[:, 0] - tmin[:, 0], 0)
    rect_h = jnp.maximum(tmax[:, 1] - tmin[:, 1], 0)
    count_full = jnp.where(vis, rect_w * rect_h, 0)
    # footprint cap: sub-rect of <= max_tiles tiles CENTERED on the mean
    # pixel (same policy as instance_stream._capped_rect; uncapped rects
    # are unchanged — the clip bounds collapse to tmin)
    rw_c = jnp.minimum(rect_w, max_tiles_per_gaussian)
    rh_c = jnp.minimum(
        rect_h,
        jnp.maximum(max_tiles_per_gaussian // jnp.maximum(rw_c, 1), 1),
    )
    rh_c = jnp.where(rect_w > 0, rh_c, 0)
    ctx = (proj.mean2d[order, 0] / TILE).astype(jnp.int32)
    cty = (proj.mean2d[order, 1] / TILE).astype(jnp.int32)
    x0 = jnp.clip(ctx - rw_c // 2, tmin[:, 0], tmax[:, 0] - rw_c)
    y0 = jnp.clip(cty - rh_c // 2, tmin[:, 1], tmax[:, 1] - rh_c)
    count = jnp.where(vis, rw_c * rh_c, 0)
    offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
    total = offsets[-1] + count[-1]

    # 2. compact expansion by inverse lookup (gathers only)
    j = jnp.arange(capacity, dtype=jnp.int32)
    g = _inverse_ranges(offsets, jnp.minimum(j, total - 1), capacity)
    g = jnp.clip(g, 0, count.shape[0] - 1)
    k = j - offsets[g]
    # row-major k-th tile of g's capped rect
    rw = jnp.maximum(rw_c[g], 1)
    ty = y0[g] + k // rw
    tx = x0[g] + k % rw
    valid = j < jnp.minimum(total, capacity)
    tile_id = jnp.where(valid, ty * grid_x + tx, sentinel)
    gauss_id = jnp.where(valid, order[g], 0)

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
        # 5. chunk-aligned re-layout, as a gather: padded slot j of tile t
        # holds source instance tile_start[t] + (j - padded_start[t]).
        counts = tile_end - tile_start
        padded_counts = ((counts + align - 1) // align) * align
        padded_start = (jnp.cumsum(padded_counts) - padded_counts).astype(
            jnp.int32
        )
        padded_total = padded_start[-1] + padded_counts[-1]
        t_of = _inverse_ranges(padded_start, jnp.minimum(
            j, padded_total - 1), capacity)
        t_of = jnp.clip(t_of, 0, num_tiles - 1)
        in_tile = j - padded_start[t_of]
        src = tile_start[t_of] + in_tile
        real = (in_tile < counts[t_of]) & (j < padded_total)
        src = jnp.clip(src, 0, capacity - 1)
        new_tile = jnp.where(real, tile_id[src], sentinel)
        new_gid = jnp.where(real, gauss_id[src], -1)
        # instances whose padded position falls beyond capacity are lost
        lost = jnp.sum(
            jnp.where(padded_start + counts > capacity,
                      jnp.minimum(counts, padded_start + counts - capacity),
                      0)
        )
        tile_id, gauss_id = new_tile, new_gid
        # clamp ranges into the buffer (capacity is CHUNK-aligned upstream,
        # so clamped starts stay aligned)
        tile_start = jnp.minimum(padded_start, capacity)
        tile_end = jnp.minimum(padded_start + counts, capacity)
        n_dropped = n_dropped + lost

    return Binning(
        gauss_id=gauss_id,
        tile_id=tile_id,
        tile_start=tile_start,
        tile_end=tile_end,
        n_instances=total,
        n_dropped=n_dropped,
    )
