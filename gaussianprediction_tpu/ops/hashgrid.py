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
import os
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


def hashgrid_specs(tables: dict, n_min: int, max_res: int):
    """(res, size, offset) per level + total slot count, from table shapes."""
    n_levels = len(tables)
    resolutions = level_resolutions(n_levels, n_min, max_res)
    specs = []
    off = 0
    for l, res in enumerate(resolutions):
        size = tables[f"level_{l}"].shape[0]
        specs.append((res, size, off))
        off += size
    return specs, off


def hashgrid_keys_weights(xyz, specs, bound: float):
    """Global corner slot ids + trilinear weights for every (level, corner).

    Returns keys [L, N, 8] int32 (offset into the concatenated tables) and
    w [L, N, 8] float32 — LEVEL-MAJOR, so per-level rows are contiguous:
    the VJP sorts each level's 8N contributions independently in ONE
    batched lax.sort (dimension=1), and because the concatenated tables
    are ascending contiguous level ranges, flattening the per-level-sorted
    rows in level order is already globally slot-sorted. Pure
    elementwise/VPU work — recomputed in the backward instead of being
    saved (25.6M ints+floats ≈ 200 MB HBM).
    """
    x = jnp.clip((xyz + bound) / (2.0 * bound), 0.0, 1.0)
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )  # [8, 3]
    keys, ws = [], []
    for res, size, off in specs:
        pos = x * res
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        p = p0[:, None, :] + corners[None, :, :]          # [N, 8, 3]
        idx = _corner_index(p, res, size)                 # [N, 8]
        w = jnp.prod(
            jnp.where(corners[None, :, :] == 1, frac[:, None, :],
                      1.0 - frac[:, None, :]),
            axis=-1,
        )                                                 # [N, 8]
        keys.append(idx + off)
        ws.append(w)
    return jnp.stack(keys, axis=0), jnp.stack(ws, axis=0)


def _flat_tables(tables: dict):
    return jnp.concatenate(
        [tables[f"level_{l}"] for l in range(len(tables))], axis=0
    )


def _encode_from_flat(flat, keys, w):
    """[S, F] flat tables, [L, N, 8] keys/weights -> [N, L*F] features."""
    L, n, _ = keys.shape
    g = flat[keys.reshape(-1)].reshape(L, n, 8, -1)       # one big gather
    feat = jnp.sum(w[..., None] * g, axis=2)              # [L, N, F]
    return jnp.swapaxes(feat, 0, 1).reshape(n, -1)


def _encode_from_flat_sorted(flat, keys, w):
    """Sorted-gather variant of _encode_from_flat.

    The 25.6M-key random gather is HBM-transaction bound on TPU; sorting
    the keys first makes the accesses monotone (cache/transaction
    coalescing), at the cost of two batched per-level sorts (pass-latency
    bound: L levels sort in one lax.sort along dimension 1 for ~the cost
    of one). Level ranges of the concatenated table ascend, so per-level
    sorted keys flattened level-major are globally sorted too.
    Exact same result as _encode_from_flat (same adds, reordered gather).
    """
    L, n, _ = keys.shape
    M = n * 8
    F = flat.shape[1]
    kb = keys.reshape(L, M)
    pos = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (L, M)
    )
    ks, ps = jax.lax.sort((kb, pos), dimension=1, num_keys=1,
                          is_stable=False)
    g = flat[ks.reshape(-1)].reshape(L, M, F)             # monotone gather
    back = jax.lax.sort(
        (ps,) + tuple(g[..., i] for i in range(F)),
        dimension=1, num_keys=1, is_stable=False,
    )
    g2 = jnp.stack(back[1:], axis=-1).reshape(L, n, 8, F)
    feat = jnp.sum(w[..., None] * g2, axis=2)             # [L, N, F]
    return jnp.swapaxes(feat, 0, 1).reshape(n, -1)


def _fwd_gather_mode() -> str:
    """'random' (one flat gather) or 'sorted' (per-level sort + monotone
    gather + sort-back). Env-gated for the TPU A/B; exact either way."""
    return os.environ.get("GPT_HASH_FWD", "random")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def hashgrid_encode_fast(tables: dict, xyz, bound: float = 1.6,
                         n_min: int = 16, max_res: int = 2048,
                         backend: str = "auto"):
    """hashgrid_encode with a sort-based table-gradient VJP.

    Plain AD of the encode emits one XLA scatter-add per (level, corner)
    gather — ~800 ms/step at production shapes (NOTES.md r1 root cause).
    This VJP reduces all N·L·8 contributions at once: sort by global slot
    id carrying the F gradient channels, then a Pallas block-accumulate
    matmul kernel (ops/hashgrid_pallas.py) on TPU or a single scatter-add
    on other backends. Matches tcnn's training semantics
    (/root/reference/scene/gaussian_model.py:370-392).

    NOTE: gradients do NOT flow to xyz (returns zeros) — the reference
    always encodes detached positions (weights_model(xyz.detach()),
    gaussian_model.py:257) and so does models/deform.py:blend_weights.
    """
    return _hef_impl(tables, xyz, bound, n_min, max_res)


def _hef_impl(tables, xyz, bound, n_min, max_res):
    specs, _ = hashgrid_specs(tables, n_min, max_res)
    keys, w = hashgrid_keys_weights(xyz, specs, bound)
    enc = (_encode_from_flat_sorted if _fwd_gather_mode() == "sorted"
           else _encode_from_flat)
    return enc(_flat_tables(tables), keys, w)


def _hef_fwd(tables, xyz, bound, n_min, max_res, backend):
    out = _hef_impl(tables, xyz, bound, n_min, max_res)
    sizes = tuple(tables[f"level_{l}"].shape for l in range(len(tables)))
    return out, (xyz, sizes)


def _hef_bwd(bound, n_min, max_res, backend, res, g):
    xyz, sizes = res
    n_levels = len(sizes)
    F = sizes[0][1]
    specs = []
    off = 0
    resolutions = level_resolutions(n_levels, n_min, max_res)
    for l in range(n_levels):
        specs.append((resolutions[l], sizes[l][0], off))
        off += sizes[l][0]
    total = off

    keys, w = hashgrid_keys_weights(xyz, specs, bound)    # [L, N, 8]
    n = xyz.shape[0]
    g_l = jnp.moveaxis(g.reshape(n, n_levels, F), 1, 0)   # [L, N, F]
    vals = w[..., None] * g_l[:, :, None, :]              # [L, N, 8, F]

    if backend == "auto":
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        use_pallas = platform in ("tpu", "axon")
    else:
        use_pallas = backend == "pallas"
    if use_pallas:
        from gaussianprediction_tpu.ops import hashgrid_pallas

        # ONE batched per-level sort (dimension=1): each level's 8N
        # contributions sort independently — sort cost is pass-latency-
        # bound, so L rows in one op cost ~one row, not L rows — and the
        # level ranges of the concatenated tables ascend, so flattening
        # the sorted rows in level order is already globally slot-sorted.
        kb = keys.reshape(n_levels, n * 8)
        ops = (kb,) + tuple(
            vals[..., i].reshape(n_levels, n * 8) for i in range(F)
        )
        srt = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        dflat = hashgrid_pallas.scatter_add_sorted(
            srt[0].reshape(-1),
            jnp.stack([s.reshape(-1) for s in srt[1:]]), total
        ).T                                               # [S, F]
    else:
        dflat = jnp.zeros((total, F), jnp.float32).at[
            keys.reshape(-1)
        ].add(vals.reshape(-1, F))

    dtables = {}
    for l, (_, size, off_l) in enumerate(specs):
        dtables[f"level_{l}"] = dflat[off_l:off_l + size]
    return dtables, jnp.zeros_like(xyz)


hashgrid_encode_fast.defvjp(_hef_fwd, _hef_bwd)


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
