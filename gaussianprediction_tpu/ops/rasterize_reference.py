"""Slow, exact, fully-differentiable jnp rasterizer (the correctness oracle).

Re-derives the per-pixel math of renderCUDA (diff-gaussian-rasterization-w-
depth forward; reference submodule N1): per-tile rect test, power/alpha
computation with the 0.99 clamp and 1/255 cutoff, front-to-back alpha
blending with the exact `done`-latch 1e-4 transmittance termination,
background composite, expected depth and most-contributing-gaussian index
(tidx) — the two extra outputs of the w-depth fork consumed at
/root/reference/eval.py:39-46.

Implemented as a lax.scan over depth-sorted Gaussians carrying per-pixel
(T, done, accumulators), which reproduces the CUDA loop semantics exactly
and stays differentiable. O(N·H·W) work — used for unit tests and tiny
scenes only; the production path is ops/rasterize_pallas.py, validated
against this oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.ops.projection import TILE, Projected

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def rasterize_pixels_reference(
    proj: Projected,
    colors,      # [N, 3] precomputed RGB (SH already evaluated)
    opacity,     # [N] or [N, 1]
    bg,          # [3]
    width: int,
    height: int,
):
    """Blend all Gaussians into an image; returns (rgb, depth, alpha, tidx).

    rgb: [H, W, 3]; depth: [H, W] expected depth Σ w_i z_i; alpha: [H, W]
    total opacity (1 - T_final); tidx: [H, W] int32 id of the Gaussian with
    the largest blend weight (-1 where nothing rendered).
    """
    opacity = opacity.reshape(-1)

    order = jnp.argsort(proj.depth, stable=True)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    color_s = colors[order]
    opac = opacity[order]
    tmin = proj.tiles_min[order]
    tmax = proj.tiles_max[order]
    vis = proj.visible[order]

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(px, py)          # [H, W]
    tile_x = (gx / TILE).astype(jnp.int32)
    tile_y = (gy / TILE).astype(jnp.int32)

    def step(carry, g):
        T, done, rgb_acc, d_acc, w_max, best, i = carry
        m2d, con, z, col, op, tn, tx_, v, oid = g
        dx = gx - m2d[0]
        dy = gy - m2d[1]
        power = (
            -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(power))
        in_rect = (
            (tile_x >= tn[0]) & (tile_x < tx_[0])
            & (tile_y >= tn[1]) & (tile_y < tx_[1])
        )
        valid = v & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        test_T = T * (1.0 - alpha)
        # CUDA: if test_T < 1e-4 -> done latched, gaussian NOT contributed.
        newly_done = valid & (test_T < T_EPS)
        contrib = valid & ~newly_done
        w = jnp.where(contrib, alpha * T, 0.0)
        rgb_acc = rgb_acc + w[..., None] * col[None, None, :]
        d_acc = d_acc + w * z
        T = jnp.where(contrib, test_T, T)
        done = done | newly_done
        better = w > w_max
        w_max = jnp.where(better, w, w_max)
        best = jnp.where(better, oid, best)
        return (T, done, rgb_acc, d_acc, w_max, best, i + 1), None

    H, W = height, width
    init = (
        jnp.ones((H, W)),
        jnp.zeros((H, W), bool),
        jnp.zeros((H, W, 3)),
        jnp.zeros((H, W)),
        jnp.zeros((H, W)),
        jnp.full((H, W), -1, jnp.int32),
        jnp.int32(0),
    )
    xs = (mean2d, conic, depth, color_s, opac, tmin, tmax, vis,
          order.astype(jnp.int32))
    (T, done, rgb_acc, d_acc, w_max, best, _), _ = jax.lax.scan(step, init, xs)

    rgb = rgb_acc + T[..., None] * bg[None, None, :]
    return rgb, d_acc, 1.0 - T, best
