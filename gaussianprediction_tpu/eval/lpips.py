"""LPIPS perceptual metric (VGG16 / AlexNet backbones), weights-gated.

Twin of /root/reference/lpipsPyTorch/ (a vendored LPIPS v0.1): normalized
deep features from conv stacks, per-layer learned linear weights, spatially
averaged distance. The pretrained backbone + linear weights CANNOT be
downloaded here (offline environment; torchvision is absent), so this
module implements the full architecture in jnp and loads weights from
`GPT_LPIPS_WEIGHTS` (an .npz with vgg/alex conv kernels and lin weights)
when present. `try_load_lpips()` returns None otherwise and the metric
suite reports LPIPS as null — matching behavior is documented in
eval/metrics.py.

NPZ layout: keys "vgg/conv{i}/w", "vgg/conv{i}/b", "vgg/lin{k}",
"alex/conv{i}/w", "alex/conv{i}/b", "alex/lin{k}" (HWIO kernels).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by LPIPS's scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 feature config up to conv5_3 (layer indices after which LPIPS taps)
VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
VGG_TAPS = (1, 3, 6, 9, 12)      # conv indices (0-based) of relu1_2..relu5_3
ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
            (256, 3, 1, 1), (256, 3, 1, 1)]  # (out, k, stride, pad)


def _conv(x, w, b, stride=1, pad=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _normalize_feat(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (n + eps)


def _vgg_features(params, x):
    feats = []
    conv_i = 0
    for c in VGG_CFG:
        if c == "M":
            x = _maxpool(x)
        else:
            x = jax.nn.relu(
                _conv(x, params[f"vgg/conv{conv_i}/w"],
                      params[f"vgg/conv{conv_i}/b"])
            )
            if conv_i in VGG_TAPS:
                feats.append(x)
            conv_i += 1
    return feats


def _alex_features(params, x):
    feats = []
    for i, (_, k, s, p) in enumerate(ALEX_CFG):
        x = jax.nn.relu(
            _conv(x, params[f"alex/conv{i}/w"], params[f"alex/conv{i}/b"],
                  stride=s, pad=p)
        )
        feats.append(x)
        if i in (0, 1):
            x = _maxpool(x, 3, 2)
    return feats


def _lpips_distance(params, prefix, feat_fn, a, b):
    a = (a * 2.0 - 1.0 - _SHIFT) / _SCALE
    b = (b * 2.0 - 1.0 - _SHIFT) / _SCALE
    fa = feat_fn(params, a[None])
    fb = feat_fn(params, b[None])
    total = 0.0
    for k, (x, y) in enumerate(zip(fa, fb)):
        d = (_normalize_feat(x) - _normalize_feat(y)) ** 2
        lin = params[f"{prefix}/lin{k}"]  # [C] nonneg weights
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def try_load_lpips() -> Optional[Callable]:
    """Returns fn(render, gt) -> (lpips_vgg, lpips_alex), or None when no
    weights file is available (set GPT_LPIPS_WEIGHTS to an .npz path)."""
    path = os.environ.get("GPT_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    with np.load(path) as f:
        params = {k: jnp.asarray(f[k]) for k in f.files}
    has_vgg = any(k.startswith("vgg/") for k in params)
    has_alex = any(k.startswith("alex/") for k in params)

    @jax.jit
    def fn_vgg(a, b):
        return _lpips_distance(params, "vgg", _vgg_features, a, b)

    @jax.jit
    def fn_alex(a, b):
        return _lpips_distance(params, "alex", _alex_features, a, b)

    def compute(render: np.ndarray, gt: np.ndarray):
        r = jnp.asarray(render, jnp.float32)
        g = jnp.asarray(gt, jnp.float32)
        lv = float(fn_vgg(r, g)) if has_vgg else None
        la = float(fn_alex(r, g)) if has_alex else None
        return lv, la

    return compute
