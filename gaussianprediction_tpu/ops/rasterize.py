"""Public render API: full differentiable Gaussian-splat rendering.

The jnp glue around the Pallas blending stage: projection + covariance
(ops/projection.py), SH color (utils/sh.py), tile binning (ops/binning.py),
instance packing (a differentiable gather whose VJP performs the
deterministic per-Gaussian gradient reduction), and tile->image assembly.

API mirrors the reference renderer's contract
(/root/reference/gaussian_renderer/__init__.py:18-115): returns a dict with
render / depth / alpha / tidx / radii / visibility plus the NDC-scale
screen-space gradient carrier used by densification (the reference's
`viewspace_points`, train.py:124-126): pass `means2d_dummy` (zeros [N, 2])
and take d(loss)/d(means2d_dummy).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.ops import binning, instance_stream, projection
from gaussianprediction_tpu.ops import rasterize_pallas as rp
from gaussianprediction_tpu.ops.projection import TILE
from gaussianprediction_tpu.utils import sh as shlib


def _assemble(per_tile, grid_x, grid_y, height, width):
    """[T, 256, C] tile buffers -> [H, W, C] image (crop off tile padding)."""
    C = per_tile.shape[-1]
    img = per_tile.reshape(grid_y, grid_x, 16, 16, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * 16, grid_x * 16, C)
    return img[:height, :width]


def render(
    xyz,
    scaling,           # already activated (exp'd) scales [N, 3]
    rotation,          # unnormalized quats [N, 4] (normalized in projection)
    opacity,           # already activated (sigmoid'd) [N] or [N, 1]
    shs,               # [N, 3, K] SH coefficients, or None
    cam: dict,
    width: int,
    height: int,
    bg,
    sh_degree: int = 3,
    colors_precomp=None,
    alive=None,
    means2d_dummy=None,
    scaling_modifier: float = 1.0,
    capacity_multiplier: int = 24,
    interpret: Optional[bool] = None,
    tile_band=None,
    fast_binning: bool = True,
    max_tiles: int = 1024,
    need_tidx: bool = True,
    cov3d_precomp=None,    # [N, 6] packed covariance, bypasses scale/rot
    tight_rects: bool = True,
):
    """Differentiable render of one view. Static: width/height/sh_degree.

    capacity_multiplier * N bounds the instance buffer (P); binning reports
    drops in aux["n_dropped"] so configs can be sized for exactness.

    tile_band=(ty0, n_band_tiles): render ONLY the horizontal band of tile
    rows [ty0, ty0+n_band_tiles) — the framebuffer-sharding primitive for
    multi-chip rendering (SURVEY.md §5.7: each device rasterizes its band of
    the tile grid against the replicated Gaussian set). ty0 may be traced
    (e.g. a shard_map axis index); n_band_tiles is static. The returned
    "render"/"depth"/... cover only the band's rows (n_band_tiles*16 tall,
    possibly extending past `height` for the last band — callers crop);
    "radii"/"visibility_filter" stay GLOBAL so densification statistics are
    band-independent.
    """
    N = xyz.shape[0]
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE

    if N == 0:  # empty scene: background only
        zeros = jnp.zeros((height, width))
        return {
            "render": jnp.broadcast_to(bg, (height, width, 3)),
            "depth": zeros,
            "alpha": zeros,
            "tidx": jnp.full((height, width), -1, jnp.int32),
            "radii": jnp.zeros((0,), jnp.int32),
            "visibility_filter": jnp.zeros((0,), bool),
            "n_dropped": jnp.int32(0),
            "n_instances": jnp.int32(0),
            "proj": None,
        }

    rotation = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    # tight_rects: exact-support binning (projection.project_gaussians
    # docstring) — the opacity drives INTEGER rects only, so gradients
    # must not flow through it here
    op_sg = (
        jax.lax.stop_gradient(opacity) if tight_rects else None
    )
    if cov3d_precomp is not None:
        # pipe.compute_cov3D_python path (gaussian_renderer/__init__.py:67-68)
        proj = projection.project_gaussians(
            xyz, cov3d_precomp, cam["world_view"], cam["full_proj"],
            cam["tanfovx"], cam["tanfovy"], width, height, alive=alive,
            opacity=op_sg,
        )
    else:
        proj = projection.project_from_params(
            xyz, scaling, rotation, cam, width, height,
            scaling_modifier=scaling_modifier, alive=alive,
            opacity=op_sg,
        )
    mean2d = proj.mean2d
    if means2d_dummy is not None:
        # NDC-scale gradient carrier: the CUDA backward reports mean2D grads
        # in NDC units (ddelx_dx = 0.5*W); densification thresholds assume
        # that scale, so the dummy couples with the 2/W pixel->NDC factor.
        mean2d = mean2d + means2d_dummy * jnp.asarray(
            [width * 0.5, height * 0.5], jnp.float32
        )

    if colors_precomp is None:
        dirs = xyz - cam["camera_center"][None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        colors, _ = shlib.sh_to_rgb_clamped(sh_degree, shs, dirs)
    else:
        colors = colors_precomp

    # Band restriction: clamp rects to the band's tile rows, shift tile/pixel
    # coordinates so the band is a standalone (grid_x x n_band) sub-grid.
    full_proj_for_stats = proj
    band_height = height
    if tile_band is not None:
        ty0, n_band = tile_band
        ty0 = jnp.asarray(ty0, jnp.int32)
        bmin_y = jnp.clip(proj.tiles_min[:, 1], ty0, ty0 + n_band) - ty0
        bmax_y = jnp.clip(proj.tiles_max[:, 1], ty0, ty0 + n_band) - ty0
        visible_b = proj.visible & (bmax_y > bmin_y)
        mean2d = mean2d - jnp.stack(
            [jnp.zeros((), jnp.float32), (ty0 * TILE).astype(jnp.float32)]
        )
        proj = projection.Projected(
            mean2d=mean2d,
            conic=proj.conic,
            depth=proj.depth,
            radius=jnp.where(visible_b, proj.radius, 0),
            tiles_min=jnp.stack([proj.tiles_min[:, 0], bmin_y], axis=-1),
            tiles_max=jnp.stack([proj.tiles_max[:, 0], bmax_y], axis=-1),
            visible=visible_b,
        )
        grid_y = n_band
        band_height = n_band * TILE
    else:
        proj = proj._replace(mean2d=mean2d)

    # float multipliers are allowed: band-sharded callers scale the per-
    # scene multiplier by their band's fraction of the tile rows so every
    # instance-proportional stream cost shrinks with the shard
    capacity = max(int(capacity_multiplier * max(N, 1)), rp.CHUNK)
    capacity = ((capacity + rp.CHUNK - 1) // rp.CHUNK) * rp.CHUNK
    opacity = opacity.reshape(-1)
    feat = jnp.concatenate(
        [
            mean2d, proj.conic,
            (opacity * 1.0)[:, None],
            colors,
            proj.depth[:, None],
        ],
        axis=-1,
    )  # [N, 10]

    if fast_binning:
        # fused scatter-free pack+bin (ops/instance_stream.py)
        sg = jax.lax.stop_gradient
        stream = instance_stream.build_instances(
            feat, sg(proj.depth), sg(proj.tiles_min), sg(proj.tiles_max),
            sg(proj.visible), grid_x, grid_y, capacity, max_tiles,
            interpret,
        )
        inst = stream.inst
        tile_start, tile_end = stream.tile_start, stream.tile_end
        n_dropped = stream.n_dropped
        n_instances = stream.n_total
    else:
        bins = bin_stopgrad(proj, width, band_height, capacity)
        gid = jnp.maximum(bins.gauss_id, 0)
        pad_valid = (bins.gauss_id >= 0).astype(jnp.float32)
        inst_feat = feat[gid] * pad_valid[:, None]
        inst = jnp.concatenate(
            [
                inst_feat,
                (bins.gauss_id.astype(jnp.float32))[:, None],
                pad_valid[:, None],
                jnp.zeros((capacity, rp.NCH - 12), jnp.float32),
            ],
            axis=-1,
        ).T  # -> [16, P] SoA
        tile_start = jax.lax.stop_gradient(bins.tile_start)
        tile_end = jax.lax.stop_gradient(bins.tile_end)
        n_dropped = bins.n_dropped
        n_instances = jnp.sum(tile_end - tile_start) + bins.n_dropped
    # need_tidx=False skips the per-chunk argmax-gaussian tracking in the
    # forward kernel — tidx is an eval-only output (train never reads it)
    out_f = rp.rasterize_binned(inst, tile_start, tile_end, grid_x, grid_y,
                                interpret, need_tidx)

    crop_h = height if tile_band is None else band_height
    img = _assemble(out_f, grid_x, grid_y, crop_h, width)  # [crop_h, W, 8]
    T_final = img[..., rp.O_T]
    rgb = img[..., rp.O_R:rp.O_R + 3] + T_final[..., None] * bg[None, None, :]
    depth = img[..., rp.O_Z]
    tidx = jnp.where(
        img[..., rp.O_WMAX] > 0.0, img[..., rp.O_GID], -1.0
    ).astype(jnp.int32)

    return {
        "render": rgb,
        "depth": depth,
        "alpha": 1.0 - T_final,
        "tidx": tidx,
        "radii": full_proj_for_stats.radius,
        "visibility_filter": full_proj_for_stats.radius > 0,
        "n_dropped": n_dropped,
        "n_instances": n_instances,
        "proj": full_proj_for_stats,
    }


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def bin_stopgrad(proj, width, height, capacity):
    """Binning with gradients severed (integer plumbing only)."""
    return binning.bin_gaussians(
        proj, width, height, capacity, align=rp.CHUNK
    )


@bin_stopgrad.defjvp
def _bin_jvp(width, height, capacity, primals, tangents):
    out = bin_stopgrad(primals[0], width, height, capacity)
    zeros = jax.tree.map(
        lambda x: jnp.zeros_like(x, dtype=jax.dtypes.float0)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == bool
        else jnp.zeros_like(x),
        out,
    )
    return out, zeros
