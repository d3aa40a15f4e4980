"""Core math utilities: quaternions, rotations, covariances, encodings.

Behavioral reference (math only, re-derived for JAX):
  /root/reference/utils/general_utils.py:18,78-110 (inverse_sigmoid,
  build_rotation, build_scaling_rotation, strip_symmetric)
  /root/reference/utils/camera_utils.py:158-170 (quat_mul, wxyz Hamilton)
  /root/reference/scene/deformable_field.py:63-72 (positional_encoding)

All functions are pure jnp, fully batched, and safe under jit/vmap/grad.
Quaternions are (w, x, y, z) throughout, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x):
    """log(x / (1-x)); inverse of the opacity activation."""
    return jnp.log(x / (1.0 - x))


def normalize(x, axis=-1, eps=0.0):
    """L2-normalize along `axis`.

    With eps=0 this matches torch.nn.functional.normalize's behavior only for
    nonzero inputs; the reference relies on nonzero quaternions so default is
    exact division by the norm (clamped like torch with eps=1e-12).
    """
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, jnp.maximum(eps, 1e-12))


def quat_mul(q1, q2):
    """Standard Hamilton product q1 ⊗ q2 (so R(q1q2) = R(q1) @ R(q2)).

    Reproduces the exact arithmetic of
    /root/reference/utils/camera_utils.py:158-170. q1, q2: (..., 4) wxyz.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1,
            x2 * w1 + w2 * x1 + z2 * y1 - y2 * z1,
            y2 * w1 - z2 * x1 + w2 * y1 + x2 * z1,
            z2 * w1 + y2 * x1 - x2 * y1 + w2 * z1,
        ],
        axis=-1,
    )


def quat_to_rotmat(q):
    """Unit-normalize quaternion(s) and convert to rotation matrices.

    Matches build_rotation (/root/reference/utils/general_utils.py:78-99).
    q: (..., 4) wxyz -> (..., 3, 3).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s, q):
    """L = R(q) @ diag(s): factor of the 3D covariance Σ = L Lᵀ.

    Matches /root/reference/utils/general_utils.py:101-110.
    s: (..., 3), q: (..., 4) -> (..., 3, 3).
    """
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # R @ diag(s)


def covariance_from_scaling_rotation(s, q, scaling_modifier=1.0):
    """Σ = (R S)(R S)ᵀ packed as the 6 upper-triangular entries.

    Matches build_covariance_from_scaling_rotation + strip_symmetric
    (/root/reference/scene/gaussian_model.py:34-39,
     /root/reference/utils/general_utils.py:64-76).
    Returns (..., 6): [Σ00, Σ01, Σ02, Σ11, Σ12, Σ22].
    """
    L = build_scaling_rotation(scaling_modifier * s, q)
    C = L @ jnp.swapaxes(L, -1, -2)
    return jnp.stack(
        [C[..., 0, 0], C[..., 0, 1], C[..., 0, 2],
         C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]],
        axis=-1,
    )


def cov6_to_mat(cov6):
    """Unpack (..., 6) upper-triangular covariance into (..., 3, 3)."""
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([a, b, c], axis=-1)
    row1 = jnp.stack([b, d, e], axis=-1)
    row2 = jnp.stack([c, e, f], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def positional_encoding(x, freqs):
    """NeRF-style sin/cos positional encoding, interleaved like the reference.

    Matches /root/reference/scene/deformable_field.py:63-72 (ori=False):
    for input dims d and F freqs the output is (..., 2*d*F) laid out as
    [sin(x0*2^0), cos(x0*2^0), sin(x1*2^0), cos(x1*2^0), ..., sin(xd*2^(F-1)),
     cos(...)] — i.e. the stack([sin, cos], -1).reshape ordering.
    """
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * freq_bands).reshape(x.shape[:-1] + (freqs * x.shape[-1],))
    return jnp.stack([jnp.sin(pts), jnp.cos(pts)], axis=-1).reshape(
        x.shape[:-1] + (2 * freqs * x.shape[-1],)
    )


def sharp_sigmoid(t, beta):
    """1 / (1 + exp(-t / beta)); reference scene/gaussian_model.py:51."""
    return jax.nn.sigmoid(t / beta)


def step_opacity_fn(t, u, beta):
    """Temporal step-opacity 1/(1+exp(-(t-u)/beta)); gaussian_model.py:50."""
    return jax.nn.sigmoid((t - u) / beta)
