"""Gaussian projection: 3D -> 2D screen-space (EWA splatting preprocess).

Behavioral reference: the `preprocessCUDA` stage of
diff-gaussian-rasterization (reference submodule N1, see SURVEY.md §2.2;
call sites /root/reference/gaussian_renderer/__init__.py:37-106). This is a
faithful jnp re-derivation of its math — view transform, z-cull at 0.2,
clamped-frustum EWA Jacobian, Σ2D = J W Σ Wᵀ Jᵀ with +0.3 low-pass on the
diagonal, conic inversion, 3σ radius from the max eigenvalue, ndc2pix — so
rendered images and pixel gradients can match the CUDA pipeline to allclose.

Everything is batched over N Gaussians and differentiable by JAX AD; the
non-differentiable outputs (radii, tile rects) are integers used only for
binning. Matrices follow the row-vector convention documented in
utils/camera.py (stored transposed; points multiply on the left).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussianprediction_tpu.utils.math import cov6_to_mat, covariance_from_scaling_rotation

TILE = 16          # pixels per tile side (matches the CUDA BLOCK_X/Y)
NEAR_CULL = 0.2    # z threshold of preprocessCUDA's in_frustum


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""

    mean2d: jnp.ndarray     # [N, 2] pixel coords (ndc2pix)
    conic: jnp.ndarray      # [N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray      # [N] view-space z
    radius: jnp.ndarray     # [N] int32 pixel radius (0 => culled)
    tiles_min: jnp.ndarray  # [N, 2] int32 inclusive tile rect min (x, y)
    tiles_max: jnp.ndarray  # [N, 2] int32 exclusive tile rect max (x, y)
    visible: jnp.ndarray    # [N] bool


def transform_point(M_rowvec, p):
    """p @ M for homogeneous 4x4 stored row-vector style. p: [N,3]."""
    return p @ M_rowvec[:3, :] + M_rowvec[3, :]


def compute_cov2d(xyz, cov6, view_rowvec, tanfovx, tanfovy, focal_x, focal_y):
    """EWA 2D covariance, matching computeCov2D of the CUDA preprocess.

    Returns [N, 3] (cov.xx, cov.xy, cov.yy) with the +0.3 blur already added.
    """
    t = transform_point(view_rowvec, xyz)  # view-space position
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = t[:, 2]
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # J rows (only the first two matter; third row of CUDA's J is zero)
    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz, zero, -(focal_x * tx) / (tz * tz)], -1),
            jnp.stack([zero, focal_y / tz, -(focal_y * ty) / (tz * tz)], -1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    W = view_rowvec[:3, :3].T  # math-convention rotation (world->view)
    Sigma = cov6_to_mat(cov6)  # [N, 3, 3]
    M = J @ W  # [N, 2, 3]
    cov = M @ Sigma @ jnp.swapaxes(M, -1, -2)  # [N, 2, 2]
    return jnp.stack(
        [cov[:, 0, 0] + 0.3, cov[:, 0, 1], cov[:, 1, 1] + 0.3], axis=-1
    )


def ndc2pix(v, size):
    """((v + 1) * size - 1) * 0.5 — CUDA's ndc2Pix."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    xyz,
    cov6,
    view_rowvec,
    full_proj_rowvec,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    alive=None,
    opacity=None,
) -> Projected:
    """Project Gaussians into screen space and compute tile footprints.

    `alive` is the static-capacity validity mask (SURVEY.md §5.8): dead slots
    get radius 0 and are never binned. width/height are static Python ints.

    `opacity` (activated, [N] or [N,1]; pass stop_gradient'd values) enables
    EXACT-SUPPORT tile rects: the blend kernel zeroes every contribution
    with alpha = op*exp(power) < 1/255 (rasterize_pallas.ALPHA_MIN, matching
    renderCUDA), so any pixel outside the ellipse {d: dᵀΣ⁻¹d = 2·ln(255·op)}
    contributes exactly 0 and can be excluded from binning bit-exactly. The
    returned rect is the intersection of that ellipse's axis-aligned
    bounding box (half-extents sqrt(τ·Σxx), sqrt(τ·Σyy)) with the
    reference's 3σ circle rect — never larger than the reference's support,
    and identical rendered output. Anisotropic and low-opacity Gaussians
    shrink dramatically (τ < 9 below op≈0.353; Σxx ≤ λ1 always), which cuts
    every instance-count-proportional cost in the stream and blend stages.
    `radius` and `visible` keep the reference's circle semantics so
    densification statistics are unchanged.
    """
    N = xyz.shape[0]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    p_view = transform_point(view_rowvec, xyz)
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL

    p_hom = xyz @ full_proj_rowvec[:3, :] + full_proj_rowvec[3, :]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    cov2d = compute_cov2d(
        xyz, cov6, view_rowvec, tanfovx, tanfovy, focal_x, focal_y
    )
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv],
        axis=-1,
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    mean2d = jnp.stack(
        [ndc2pix(p_proj[:, 0], width), ndc2pix(p_proj[:, 1], height)], axis=-1
    )

    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    # getRect: min = clamp((p - r) / TILE), max = clamp((p + r + TILE - 1)/TILE)
    r = radius_f
    if opacity is not None:
        # exact-support per-axis extents (see docstring): ceil gives >= 1px
        # slack over the continuous bound, far beyond f32 rounding wobble
        op = jnp.clip(opacity.reshape(-1), 0.0, 1.0)
        tau = jnp.maximum(2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-12)), 0.0)
        rx = jnp.ceil(jnp.minimum(jnp.sqrt(tau * cov2d[:, 0]), radius_f))
        ry = jnp.ceil(jnp.minimum(jnp.sqrt(tau * cov2d[:, 2]), radius_f))
        # op <= 1/255: no pixel can reach ALPHA_MIN -> empty rect (the
        # Gaussian stays `visible` so densify stats match the reference)
        rx = jnp.where(tau > 0.0, rx, -float(TILE))
        ry = jnp.where(tau > 0.0, ry, -float(TILE))
    else:
        rx = r
        ry = r
    tmin = jnp.stack(
        [
            jnp.clip(((mean2d[:, 0] - rx) / TILE).astype(jnp.int32), 0, grid_x),
            jnp.clip(((mean2d[:, 1] - ry) / TILE).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    if opacity is not None:
        # exclusive tile max = floor((p + r)/TILE) + 1: covers the last
        # pixel floor(p + r) exactly. (The reference's (p + r + TILE-1)/TILE
        # form under-counts when p + r lands in a tile's final pixel —
        # harmless slack for its conservative circle radii, wrong for
        # exact-support extents.) Clamped below to the reference circle
        # rect so the tight rect is always a SUBSET of reference behavior.
        tmax = jnp.stack(
            [
                jnp.clip(
                    jnp.floor(
                        (mean2d[:, 0] + rx) / TILE
                    ).astype(jnp.int32) + 1,
                    0, grid_x,
                ),
                jnp.clip(
                    jnp.floor(
                        (mean2d[:, 1] + ry) / TILE
                    ).astype(jnp.int32) + 1,
                    0, grid_y,
                ),
            ],
            axis=-1,
        )
    else:
        tmax = jnp.stack(
            [
                jnp.clip(
                    ((mean2d[:, 0] + rx + TILE - 1) / TILE).astype(jnp.int32),
                    0, grid_x,
                ),
                jnp.clip(
                    ((mean2d[:, 1] + ry + TILE - 1) / TILE).astype(jnp.int32),
                    0, grid_y,
                ),
            ],
            axis=-1,
        )
    # visibility from the reference's circle rect (independent of the
    # exact-support shrink, so radii/visibility_filter stats are unchanged)
    tmin_v = jnp.stack(
        [
            jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, grid_x),
            jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    tmax_v = jnp.stack(
        [
            jnp.clip(
                ((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32),
                0, grid_x,
            ),
            jnp.clip(
                ((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32),
                0, grid_y,
            ),
        ],
        axis=-1,
    )
    tiles_touched = (tmax_v[:, 0] - tmin_v[:, 0]) * (
        tmax_v[:, 1] - tmin_v[:, 1]
    )

    visible = in_front & det_ok & (tiles_touched > 0)
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    if opacity is not None:
        # subset guarantee vs the reference circle rect (bit-parity), and
        # empty exact-support rects collapse to zero area
        tmax = jnp.minimum(tmax, tmax_v)
        tmin = jnp.maximum(tmin, tmin_v)
    tmax = jnp.maximum(tmax, tmin)
    return Projected(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius,
        tiles_min=jnp.where(visible[:, None], tmin, 0),
        tiles_max=jnp.where(visible[:, None], tmax, 0),
        visible=visible,
    )


def project_from_params(xyz, scaling, rotation, cam, width, height,
                        scaling_modifier=1.0, alive=None,
                        opacity=None) -> Projected:
    """Convenience wrapper: activation'd scale/rot -> covariance -> project."""
    cov6 = covariance_from_scaling_rotation(scaling, rotation, scaling_modifier)
    return project_gaussians(
        xyz, cov6, cam["world_view"], cam["full_proj"],
        cam["tanfovx"], cam["tanfovy"], width, height, alive=alive,
        opacity=opacity,
    )
