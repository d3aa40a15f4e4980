"""Multiresolution hash-grid encoding + small MLP (tiny-cuda-nn twin).

TPU-native replacement for `tcnn.NetworkWithInputEncoding` as configured at
/root/reference/scene/gaussian_model.py:370-392: Grid/Hash encoding with
L=16 levels, F=4 features/level, T=2^19, N_min=16, per-level scale
b=exp(ln(2048/16)/15), linear interpolation, followed by a 2x64 ReLU MLP
with linear output (2*nearest_num logits). Implemented as pure jnp
gather + trilinear interpolation; XLA fuses the "fully fused MLP" part.

Like tcnn, coarse levels whose dense grid fits in T entries are stored
dense (collision-free); finer levels use the xor-multiply spatial hash with
tcnn's primes. Inputs are normalized to [0, 1]^3 by a scene bound.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp

PRIMES = (1, 2654435761, 805459861)


def level_resolutions(n_levels: int = 16, n_min: int = 16,
                      max_res: int = 2048) -> list:
    b = math.exp(math.log(max_res / n_min) / (n_levels - 1))
    return [int(round(n_min * (b**l))) for l in range(n_levels)]


def level_table_size(res: int, log2_T: int) -> int:
    dense = (res + 1) ** 3
    return min(dense, 2**log2_T)


def init_hashgrid(key, n_levels: int = 16, n_features: int = 4,
                  log2_T: int = 19, n_min: int = 16, max_res: int = 2048):
    """Random-init per-level tables (tcnn init: U(-1e-4, 1e-4))."""
    resolutions = level_resolutions(n_levels, n_min, max_res)
    tables = {}
    for l, res in enumerate(resolutions):
        key, sub = jax.random.split(key)
        size = level_table_size(res, log2_T)
        tables[f"level_{l}"] = jax.random.uniform(
            sub, (size, n_features), jnp.float32, -1e-4, 1e-4
        )
    return tables


def _corner_index(p_int, res: int, table_size: int):
    """Dense index when the grid fits, else xor-multiply hash (tcnn-style)."""
    dense = (res + 1) ** 3
    p = jnp.clip(p_int, 0, res)
    if dense <= table_size:
        return (p[..., 0] * (res + 1) + p[..., 1]) * (res + 1) + p[..., 2]
    h = (
        p[..., 0].astype(jnp.uint32) * jnp.uint32(PRIMES[0])
        ^ p[..., 1].astype(jnp.uint32) * jnp.uint32(PRIMES[1])
        ^ p[..., 2].astype(jnp.uint32) * jnp.uint32(PRIMES[2])
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hashgrid_encode(tables: dict, xyz, bound: float = 1.6,
                    n_min: int = 16, max_res: int = 2048):
    """Encode xyz [N, 3] -> [N, L*F] features (trilinear per level)."""
    n_levels = len(tables)
    resolutions = level_resolutions(n_levels, n_min, max_res)
    x = jnp.clip((xyz + bound) / (2.0 * bound), 0.0, 1.0)
    outs = []
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )  # [8, 3]
    for l, res in enumerate(resolutions):
        table = tables[f"level_{l}"]
        pos = x * res
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        feat = 0.0
        for c in range(8):
            off = corners[c]
            idx = _corner_index(p0 + off[None, :], res, table.shape[0])
            wgt = jnp.prod(
                jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
            )
            feat = feat + wgt[:, None] * table[idx]
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)


def init_mlp(key, sizes: Sequence[int]):
    """torch.nn.Linear-style init (U(±1/sqrt(fan_in)) for W and b)."""
    params = []
    for i in range(len(sizes) - 1):
        key, kw, kb = jax.random.split(key, 3)
        lim = 1.0 / math.sqrt(sizes[i])
        params.append(
            {
                "w": jax.random.uniform(
                    kw, (sizes[i], sizes[i + 1]), jnp.float32, -lim, lim
                ),
                "b": jax.random.uniform(
                    kb, (sizes[i + 1],), jnp.float32, -lim, lim
                ),
            }
        )
    return params


def mlp_apply(params, x, activation=jax.nn.relu):
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
        x = x + layer["b"]
        if i < len(params) - 1:
            x = activation(x)
    return x
