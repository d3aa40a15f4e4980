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

from gaussianprediction_tpu.ops import binning, projection
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
):
    """Differentiable render of one view. Static: width/height/sh_degree.

    capacity_multiplier * N bounds the instance buffer (P); binning reports
    drops in aux["n_dropped"] so configs can be sized for exactness.
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
            "proj": None,
        }

    rotation = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    proj = projection.project_from_params(
        xyz, scaling, rotation, cam, width, height,
        scaling_modifier=scaling_modifier, alive=alive,
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

    capacity = int(capacity_multiplier) * max(N, 1)
    capacity = ((capacity + rp.CHUNK - 1) // rp.CHUNK) * rp.CHUNK
    bins = bin_stopgrad(proj, width, height, capacity)

    gid = jnp.maximum(bins.gauss_id, 0)
    pad_valid = (bins.gauss_id >= 0).astype(jnp.float32)
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
    inst_feat = feat[gid] * pad_valid[:, None]
    inst = jnp.concatenate(
        [
            inst_feat,
            (bins.gauss_id.astype(jnp.float32))[:, None],
            pad_valid[:, None],
            jnp.zeros((capacity, rp.NCH - 12), jnp.float32),
        ],
        axis=-1,
    )

    tile_start = jax.lax.stop_gradient(bins.tile_start)
    tile_end = jax.lax.stop_gradient(bins.tile_end)
    out_f = rp.rasterize_binned(inst, tile_start, tile_end, grid_x, grid_y,
                                interpret)

    img = _assemble(out_f, grid_x, grid_y, height, width)  # [H, W, 8]
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
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
        "n_dropped": bins.n_dropped,
        "proj": proj,
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
