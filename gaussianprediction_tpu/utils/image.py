"""Image losses and quality metrics (pure jnp, channels-last [H, W, C]).

Behavioral reference:
  /root/reference/utils/loss_utils.py:54-100 (l1_loss, windowed SSIM with an
  11-tap gaussian window, sigma 1.5, 'same' padding, C1=0.01^2, C2=0.03^2)
  /root/reference/utils/image_utils.py:15-20 (mse/psnr: 20*log10(1/sqrt(mse)))
  pytorch_msssim.ms_ssim as invoked by /root/reference/metrics.py:25,139
  (standard 5-scale MS-SSIM, avg-pool 2x downsampling)

All functions accept a single image [H, W, C] or a batch [..., H, W, C].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a, b):
    """Mean absolute error; loss_utils.py:54-55."""
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(img, gt):
    """20*log10(1/sqrt(mse)) over the whole image; image_utils.py:18-20."""
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1D gaussian taps, normalized; loss_utils.py:61-64."""
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _banded_blur_matrix(n: int, window_size: int, sigma: float,
                        valid: bool):
    """[n_out, n] banded matrix applying the 1D gaussian window along one
    axis ('same' zero padding, or valid-region rows)."""
    taps = _gaussian_window(window_size, sigma)
    half = window_size // 2
    m = np.zeros((n, n), np.float32)
    for k, t in enumerate(taps):
        off = k - half
        src = np.arange(n) + off
        ok = (src >= 0) & (src < n)
        m[np.arange(n)[ok], src[ok]] += t
    if valid:
        m = m[half:n - half]
    return m


def _depthwise_blur(img, window_size: int, sigma: float, valid: bool = False):
    """Separable depthwise gaussian filter on [..., H, W, C].

    valid=False uses 'same' zero padding (matching F.conv2d(padding=w//2) in
    the reference ssim); valid=True crops to the valid region (used by the
    ms-ssim implementation which pytorch_msssim computes with no padding).

    Implemented as two banded-matrix contractions instead of depthwise
    convs: XLA lowers feature-grouped convs to VPU tap loops on TPU
    (~10x the cost), while [H, H] @ [H, W*C] rides the MXU. HIGHEST
    precision keeps the f32 taps untruncated (the v5e MXU rounds DEFAULT
    operands to bf16; the loss gradient flows through this).
    """
    *batch, H, W, C = img.shape
    x = img.reshape((-1, H, W, C))
    B = x.shape[0]
    mh = jnp.asarray(_banded_blur_matrix(H, window_size, sigma, valid))
    mw = jnp.asarray(_banded_blur_matrix(W, window_size, sigma, valid))
    # rows: [Ho, H] x [B, H, W*C] over H
    x = jax.lax.dot_general(
        mh, x.reshape(B, H, W * C), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Ho, B, W*C]
    Ho = x.shape[0]
    x = x.reshape(Ho, B, W, C)
    # cols: [Wo, W] x [Ho, B, W, C] over W
    x = jax.lax.dot_general(
        mw, x, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Wo, Ho, B, C]
    x = jnp.transpose(x, (2, 1, 0, 3))
    return x.reshape(tuple(batch) + x.shape[1:])


def _ssim_maps(img1, img2, window_size: int, sigma: float, valid: bool):
    C1, C2 = 0.01**2, 0.03**2
    blur = lambda x: _depthwise_blur(x, window_size, sigma, valid)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    return ssim_map, cs_map


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM, matching loss_utils.py:70-100 (zero-padded 'same' conv)."""
    ssim_map, _ = _ssim_maps(img1, img2, window_size, sigma, valid=False)
    return jnp.mean(ssim_map)


def dssim(img1, img2):
    """(1 - ssim)/2 as reported by metrics.py (D-SSIM column)."""
    return (1.0 - ssim(img1, img2)) / 2.0


MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Multi-scale SSIM over 5 scales (pytorch_msssim-compatible shape:
    valid-region windows, avg-pool 2x between scales, relu'd cs terms)."""
    levels = len(MSSSIM_WEIGHTS)
    weights = jnp.asarray(MSSSIM_WEIGHTS)
    vals = []
    a, b = img1, img2
    for i in range(levels):
        ssim_map, cs_map = _ssim_maps(a, b, window_size, sigma, valid=True)
        if i < levels - 1:
            vals.append(jax.nn.relu(jnp.mean(cs_map)))
            pad_h, pad_w = a.shape[-3] % 2, a.shape[-2] % 2
            if pad_h or pad_w:  # pytorch_msssim uses floor pooling
                a = a[..., : a.shape[-3] - pad_h, : a.shape[-2] - pad_w, :]
                b = b[..., : b.shape[-3] - pad_h, : b.shape[-2] - pad_w, :]
            pool = lambda x: jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1,) * (x.ndim - 3) + (2, 2, 1),
                (1,) * (x.ndim - 3) + (2, 2, 1), "VALID") / 4.0
            a, b = pool(a), pool(b)
        else:
            vals.append(jax.nn.relu(jnp.mean(ssim_map)))
    vals = jnp.stack(vals)
    return jnp.prod(vals ** weights)


def dssim_l1_loss(img, gt, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM): the photometric training loss
    (/root/reference/train.py:108)."""
    return (1.0 - lambda_dssim) * l1_loss(img, gt) + lambda_dssim * (
        1.0 - ssim(img, gt)
    )
