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


# ---------------------------------------------------------------------------
# Overlapping-brick hash grid (weight_encoder="brick"; round 5).
#
# The tcnn-twin encoder above is structurally gather-bound on TPU: XLA's
# gather is ROW-rate bound at ~6.4 ns/row regardless of row width or key
# order (NOTES.md r2), and the twin fetches N*L*8 = 25.6M corner rows per
# step at production shapes (~165 ms forward). This encoder restructures
# the TABLE so one fetched row covers the whole trilinear query:
#
#   Each level stores overlapping 4x4x4-cell BRICKS at stride 2. A query
#   cube spans cells (x0..x0+1)^3; with brick origin (2*(x0>>1), ...), the
#   in-brick coords (x0&1 + dx) always lie in [0, 4) — EVERY 2x2x2 corner
#   cube fits ONE brick row. Forward = N*L single-row gathers of
#   [64*F]-wide rows (8x fewer rows; row width is free at row-rate), plus
#   a factored trilinear contraction over the 4^3 cells on the VPU.
#
# This is a sibling ENCODER, not a layout of the twin: overlapping bricks
# duplicate cells as independent parameters (a cell sampled through
# different bricks trains separately — akin to 8 phase-shifted grids) and
# the spatial hash runs at brick granularity, so the function class
# differs from tcnn's. Same architecture family (multi-res + hash +
# trilinear + MLP); quality is validated against the twin by the quality
# proxy (tools/quality_proxy.py) before it is made a default anywhere.
# Reference behavior being replaced: tcnn NetworkWithInputEncoding at
# /root/reference/scene/gaussian_model.py:370-392.
# ---------------------------------------------------------------------------
BRICK = 4
BRICK_CELLS = BRICK ** 3


def _brick_counts(res: int, log2_Tb: int):
    """(nbx, n_bricks): per-axis brick count and table rows (dense|hashed).
    bx = x0>>1 with x0 in [0, res-1], so the dense axis has
    ((res-1)>>1)+1 brick origins."""
    nbx = ((max(res, 1) - 1) >> 1) + 1
    dense = nbx ** 3
    return nbx, min(dense, 2 ** log2_Tb)


def init_brickgrid(key, n_levels: int = 16, n_features: int = 4,
                   log2_Tb: int = 16, n_min: int = 16, max_res: int = 2048):
    """Per-level [n_bricks, 64*F] tables (tcnn-style U(-1e-4, 1e-4))."""
    resolutions = level_resolutions(n_levels, n_min, max_res)
    tables = {}
    for l, res in enumerate(resolutions):
        key, sub = jax.random.split(key)
        _, nb = _brick_counts(res, log2_Tb)
        tables[f"level_{l}"] = jax.random.uniform(
            sub, (nb, BRICK_CELLS * n_features), jnp.float32, -1e-4, 1e-4
        )
    return tables


def brick_specs(tables: dict, n_min: int, max_res: int):
    """(res, nbx, n_bricks, brick_offset) per level + total brick count."""
    n_levels = len(tables)
    resolutions = level_resolutions(n_levels, n_min, max_res)
    specs = []
    off = 0
    for l, res in enumerate(resolutions):
        nb = tables[f"level_{l}"].shape[0]
        nbx, _ = _brick_counts(res, 32)  # dense axis count (no cap)
        specs.append((res, nbx, nb, off))
        off += nb
    return specs, off


def _brick_geom(xyz, specs, bound: float):
    """Per-level brick rows + parities + fracs.

    Returns (bidx [L,N] global brick row, a [L,N,3] int32 cell parities,
    f [L,N,3] float32 fracs). x0 is clamped to res-1 so the boundary
    x == 1.0 resolves to the (res-1, res) corner pair with weight (0, 1) —
    identical values to the twin's clip-at-res behavior.
    """
    x = jnp.clip((xyz + bound) / (2.0 * bound), 0.0, 1.0)
    bs, as_, fs = [], [], []
    for res, nbx, nb, off in specs:
        pos = x * res
        p0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(res - 1, 0))
        f = pos - p0
        a = p0 & 1
        b3 = p0 >> 1                                   # [N, 3] brick coords
        if nbx ** 3 <= nb:                             # dense level
            bi = (b3[:, 0] * nbx + b3[:, 1]) * nbx + b3[:, 2]
        else:                                          # brick-granular hash
            h = (
                b3[:, 0].astype(jnp.uint32) * jnp.uint32(PRIMES[0])
                ^ b3[:, 1].astype(jnp.uint32) * jnp.uint32(PRIMES[1])
                ^ b3[:, 2].astype(jnp.uint32) * jnp.uint32(PRIMES[2])
            )
            bi = (h % jnp.uint32(nb)).astype(jnp.int32)
        bs.append(bi + off)
        as_.append(a)
        fs.append(f)
    return jnp.stack(bs, 0), jnp.stack(as_, 0), jnp.stack(fs, 0)


def _axis_masks(a, f):
    """[..., 4] per-axis cell weights: cell a gets 1-f, cell a+1 gets f."""
    i = jnp.arange(BRICK, dtype=jnp.int32)
    shape = a.shape + (BRICK,)
    a_ = a[..., None]
    f_ = f[..., None]
    return (jnp.where(i == a_, 1.0 - f_, 0.0)
            + jnp.where(i == a_ + 1, f_, 0.0)).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def brickgrid_encode_fast(tables: dict, xyz, bound: float = 1.6,
                          n_min: int = 16, max_res: int = 2048):
    """Brick-table encode: [N, 3] -> [N, L*F]; sort-based table VJP.

    No gradient flows to xyz (the reference always encodes detached
    positions, gaussian_model.py:257).
    """
    return _beb_impl(tables, xyz, bound, n_min, max_res)


def _beb_impl(tables, xyz, bound, n_min, max_res):
    specs, _ = brick_specs(tables, n_min, max_res)
    L = len(specs)
    F = tables["level_0"].shape[1] // BRICK_CELLS
    flat = jnp.concatenate(
        [tables[f"level_{l}"] for l in range(L)], axis=0
    )                                                  # [Tb_total, 64F]
    bidx, a, f = _brick_geom(xyz, specs, bound)
    n = xyz.shape[0]
    rows = flat[bidx.reshape(-1)].reshape(L, n, BRICK, BRICK, BRICK, F)
    mx = _axis_masks(a[..., 0], f[..., 0])             # [L, N, 4]
    my = _axis_masks(a[..., 1], f[..., 1])
    mz = _axis_masks(a[..., 2], f[..., 2])
    t = jnp.einsum("lnxyzf,lnz->lnxyf", rows, mz)
    t = jnp.einsum("lnxyf,lny->lnxf", t, my)
    feat = jnp.einsum("lnxf,lnx->lnf", t, mx)          # [L, N, F]
    return jnp.swapaxes(feat, 0, 1).reshape(n, L * F)


def _beb_fwd(tables, xyz, bound, n_min, max_res):
    out = _beb_impl(tables, xyz, bound, n_min, max_res)
    sizes = tuple(tables[f"level_{l}"].shape for l in range(len(tables)))
    return out, (xyz, sizes)


def _beb_bwd(bound, n_min, max_res, res, g):
    xyz, sizes = res
    n_levels = len(sizes)
    F = sizes[0][1] // BRICK_CELLS
    resolutions = level_resolutions(n_levels, n_min, max_res)
    specs = []
    off = 0
    for l in range(n_levels):
        nbx, _ = _brick_counts(resolutions[l], 32)
        specs.append((resolutions[l], nbx, sizes[l][0], off))
        off += sizes[l][0]
    total_cells = off * BRICK_CELLS

    bidx, a, f = _brick_geom(xyz, specs, bound)        # [L, N(, 3)]
    n = xyz.shape[0]
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )                                                  # [8, 3]
    # cell-granular keys into the flattened [Tb_total*64, F] cell view:
    # slot = (ax+dx)*16 + (ay+dy)*4 + (az+dz) in [0, 64)
    pc = a[:, :, None, :] + corners[None, None, :, :]  # [L, N, 8, 3]
    slot = (pc[..., 0] * BRICK + pc[..., 1]) * BRICK + pc[..., 2]
    keys = bidx[:, :, None] * BRICK_CELLS + slot       # [L, N, 8]
    w = jnp.prod(
        jnp.where(corners[None, None, :, :] == 1, f[:, :, None, :],
                  1.0 - f[:, :, None, :]), axis=-1
    )                                                  # [L, N, 8]
    g_l = jnp.moveaxis(g.reshape(n, n_levels, F), 1, 0)
    vals = w[..., None] * g_l[:, :, None, :]           # [L, N, 8, F]

    dflat = _table_grads_sorted(keys, vals, total_cells, F, n_levels, n)
    dtables = {}
    for l, (_, _, nb, off_l) in enumerate(specs):
        dtables[f"level_{l}"] = dflat[
            off_l * BRICK_CELLS:(off_l + nb) * BRICK_CELLS
        ].reshape(nb, BRICK_CELLS * F)
    return dtables, jnp.zeros_like(xyz)


brickgrid_encode_fast.defvjp(_beb_fwd, _beb_bwd)


def _table_grads_sorted(keys, vals, total, F, n_levels, n):
    """Shared table-gradient reduction: one batched per-level sort of the
    8N contributions, then the Pallas sorted accumulate on TPU (or a
    plain scatter-add elsewhere). keys [L,N,8] must have ascending
    per-level ranges so the level-major flatten is globally sorted."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform in ("tpu", "axon"):
        from gaussianprediction_tpu.ops import hashgrid_pallas

        kb = keys.reshape(n_levels, n * 8)
        ops = (kb,) + tuple(
            vals[..., i].reshape(n_levels, n * 8) for i in range(F)
        )
        srt = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        return hashgrid_pallas.scatter_add_sorted(
            srt[0].reshape(-1),
            jnp.stack([s.reshape(-1) for s in srt[1:]]), total
        ).T                                            # [S, F]
    return jnp.zeros((total, F), jnp.float32).at[
        keys.reshape(-1)
    ].add(vals.reshape(-1, F))


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
