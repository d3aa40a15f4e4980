"""MXU-pure multi-scale Fourier position encoder (TPU-first weight encoder).

The reference's blend-weight model encodes canonical positions with a tcnn
multiresolution hash grid (/root/reference/scene/gaussian_model.py:370-392).
A hash table is the wrong data structure for this TPU stack: every encode
is 25.6M random HBM row-gathers (~150 ms) and every gradient a 25.6M-row
scatter-add (~800 ms) — both walls of XLA's gather/scatter lowering,
measured in NOTES.md. This encoder replaces the lookup with dense matmuls:

    feat(x) = [sin, cos](2π · x_norm @ B),   B = blockdiag-free [3, L·D]

where column block l of B holds D random unit directions scaled by the SAME
geometric resolution ladder the hash grid uses (n_min → max_res over L
levels), so the encoding spans identical spatial frequencies. B is a fixed
(non-trainable) constant derived deterministically from a seed — model
capacity lives in the (configurably wider) weight MLP, which is pure MXU.

Cost at 200k Gaussians: one [200k, 3] @ [3, 128] matmul + sin/cos — well
under 1 ms fwd+bwd, vs ~950 ms for the exact hash grid (sort-based VJP
brings that to ~350 ms; this is the speed-of-light option).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fourier_dirs(n_levels: int = 16, per_level: int = 4, n_min: int = 16,
                 max_res: int = 2048, bound: float = 1.6,
                 seed: int = 20240519) -> jnp.ndarray:
    """Deterministic frequency matrix B [3, n_levels*per_level].

    Level l's block: per_level random unit directions (fixed seed) scaled
    so one period spans 1/res_l of the normalized [0,1] domain — the same
    ladder as hashgrid.level_resolutions.
    """
    b = math.exp(math.log(max_res / n_min) / (n_levels - 1))
    key = jax.random.PRNGKey(seed)
    dirs = jax.random.normal(key, (3, n_levels * per_level), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
    res = jnp.asarray(
        [n_min * (b ** l) for l in range(n_levels) for _ in range(per_level)],
        jnp.float32,
    )
    # x_norm in [0, 1]: frequency res_l cycles across the domain
    return dirs * (2.0 * math.pi * res)[None, :]


def fourier_encode(B, xyz, bound: float = 1.6) -> jnp.ndarray:
    """xyz [N, 3] -> [N, 2*cols] sin/cos features (pure VPU+MXU)."""
    x = jnp.clip((xyz + bound) / (2.0 * bound), 0.0, 1.0)
    phase = jnp.dot(x, B, preferred_element_type=jnp.float32)
    return jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)


def fourier_feature_dim(n_levels: int, per_level: int) -> int:
    return 2 * n_levels * per_level
