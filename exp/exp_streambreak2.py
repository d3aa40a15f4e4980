"""Isolation breakdown of the CURRENT build_instances_fwd (expand-kernel
pipeline, instance_stream.py) at the production shape (200k, 800x800,
capacity 2M). Unlike exp_streambreak (which re-expressed the retired
row-gather pipeline), each stage here is timed in ISOLATION on
precomputed inputs, with strided checksums so XLA cannot DCE outputs:

  T1: capped rect + zerokey + the fused 16-operand depth sort
  T2: count/offset cumsums + permat assembly + searchsorted starts_q
  T3: the Pallas expand kernel alone
  T4: corner histogram + pstart + dummy keys
  T5: the final 12-operand tile sort + [16, Pp] stack
  T6: full build_instances_fwd (sum check vs T1..T5)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import expand_pallas
from gaussianprediction_tpu.ops import instance_stream as IS
from gaussianprediction_tpu.ops import projection as PJ
from gaussianprediction_tpu.ops.rasterize_pallas import CHUNK

W = H = 800
N = 200_000
REPS = 8
ITERS = 4


def timed(tag, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(f(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        _ = float(f(*args))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def chain(fn):
    """REPS dependent evaluations per device call (denormal feedback)."""
    def run(x, *rest):
        def body(i, carry):
            xx, acc = carry
            out = fn(xx, *rest)
            return xx + 1e-38 * out, acc + out
        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0.0)))
        return acc
    return run


def main():
    g = random_gaussians(N, seed=42, scale_range=(-5.2, -3.8))
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    xyz = jnp.asarray(g["xyz"])
    scal = jnp.exp(jnp.asarray(g["log_scales"]))
    rot = jnp.asarray(g["rotation"])
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jnp.asarray(
        (1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1).astype(np.float32)
    )
    proj = PJ.project_from_params(xyz, scal, rot, cam, W, H)
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    sentinel = jnp.int32(num_tiles)
    capacity = ((10 * N + CHUNK - 1) // CHUNK) * CHUNK
    max_tiles = 1024
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    depth, tiles_min, tiles_max = proj.depth, proj.tiles_min, proj.tiles_max
    visible = proj.visible

    # ---- precompute every intermediate once (host side inputs) ----
    center_px = feat[:, 0:2]
    x0c, y0c, rw0, rh0 = IS._capped_rect(tiles_min, tiles_max, center_px,
                                         max_tiles)
    rw = jnp.where(visible, rw0, 0)
    rh = jnp.where(visible, rh0, 0)
    gidx = jnp.arange(N, dtype=jnp.int32)
    zerokey = (rw * rh == 0).astype(jnp.int32)

    def t1(feat):
        cpx = feat[:, 0:2]
        a, b, c, d = IS._capped_rect(tiles_min, tiles_max, cpx, max_tiles)
        rw_ = jnp.where(visible, c, 0)
        rh_ = jnp.where(visible, d, 0)
        zk = (rw_ * rh_ == 0).astype(jnp.int32)
        srt = jax.lax.sort(
            (zk, depth,
             feat[:, 0], feat[:, 1], feat[:, 2], feat[:, 3], feat[:, 4],
             feat[:, 5], feat[:, 6], feat[:, 7], feat[:, 8],
             a.astype(jnp.float32), b.astype(jnp.float32),
             rw_.astype(jnp.float32), rh_.astype(jnp.float32), gidx),
            num_keys=2, is_stable=True)
        return sum(jnp.sum(s[::13].astype(jnp.float32)) for s in srt)

    timed("T1 rect+depth-sort(16op)", chain(t1), feat)

    srt = jax.lax.sort(
        (zerokey, depth,
         feat[:, 0], feat[:, 1], feat[:, 2], feat[:, 3], feat[:, 4],
         feat[:, 5], feat[:, 6], feat[:, 7], feat[:, 8],
         x0c.astype(jnp.float32), y0c.astype(jnp.float32),
         rw.astype(jnp.float32), rh.astype(jnp.float32),
         gidx), num_keys=2, is_stable=True)
    depth_s = srt[1]
    x0f, y0f, rwf, rhf = srt[11:15]
    gid_s = srt[15]
    rw_s = rwf.astype(jnp.int32)
    rh_s = rhf.astype(jnp.int32)

    B, WC = expand_pallas.BSLOT, expand_pallas.WCAND
    cap512 = (((capacity + expand_pallas.ALIGN - 1)
               // expand_pallas.ALIGN) * expand_pallas.ALIGN)
    qmax = max((N - 1) // WC, 0)
    Np = (qmax + 2) * WC
    pad = Np - N

    def t2(depth_s):
        count = rw_s * rh_s
        offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
        total = offsets[-1] + count[-1]
        offs_row = jnp.concatenate(
            [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)]
        )[None, :]
        permat = jnp.stack(
            srt[2:11] + (depth_s, offsets.astype(jnp.float32), x0f, y0f,
                         rwf, gid_s.astype(jnp.float32),
                         jnp.zeros_like(depth_s)), axis=0)
        permat = jnp.concatenate(
            [permat, jnp.zeros((16, pad), jnp.float32)], axis=1)
        nb = cap512 // B
        block_starts = jnp.arange(nb, dtype=jnp.int32) * B
        g0 = jnp.maximum(jnp.searchsorted(
            offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
        starts_q = g0 // WC
        return (jnp.sum(permat[:, ::17]) + jnp.sum(starts_q[::7]) +
                jnp.float32(total) + jnp.sum(offs_row[:, ::13]))

    timed("T2 cumsum+permat+starts_q", chain(t2), depth_s)

    count = rw_s * rh_s
    offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
    total = offsets[-1] + count[-1]
    offs_row = jnp.concatenate(
        [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)])[None, :]
    permat = jnp.stack(
        srt[2:11] + (depth_s, offsets.astype(jnp.float32), x0f, y0f, rwf,
                     gid_s.astype(jnp.float32), jnp.zeros_like(depth_s)),
        axis=0)
    permat = jnp.concatenate(
        [permat, jnp.zeros((16, pad), jnp.float32)], axis=1)
    nb = cap512 // B
    block_starts = jnp.arange(nb, dtype=jnp.int32) * B
    g0 = jnp.maximum(jnp.searchsorted(
        offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
    starts_q = g0 // WC
    totc = jnp.minimum(total, capacity)[None]

    def t3(permat):
        soa = expand_pallas.expand_rows(
            permat, offs_row, starts_q, totc, cap512, grid_x,
            int(num_tiles), interpret=False)
        return jnp.sum(soa[:, ::29])

    timed("T3 expand kernel", chain(t3), permat)

    inst_soa = expand_pallas.expand_rows(
        permat, offs_row, starts_q, totc, cap512, grid_x, int(num_tiles),
        interpret=False)
    key = inst_soa[11].astype(jnp.int32)

    def t4(x):
        gx1, gy1 = grid_x + 1, grid_y + 1
        x1 = x0c + rw
        y1 = y0c + rh
        one = jnp.where(rw * rh > 0, 1, 0) + (x[:1] * 0).astype(jnp.int32)
        grid = jnp.zeros((gy1, gx1), jnp.int32)
        grid = grid.at[y0c, x0c].add(one, mode="drop")
        grid = grid.at[y0c, x1].add(-one, mode="drop")
        grid = grid.at[y1, x0c].add(-one, mode="drop")
        grid = grid.at[y1, x1].add(one, mode="drop")
        counts_t = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[
            :grid_y, :grid_x].reshape(-1)
        padded_t = ((counts_t + CHUNK - 1) // CHUNK) * CHUNK
        pstart = (jnp.cumsum(padded_t) - padded_t).astype(jnp.int32)
        TC = num_tiles * CHUNK
        need = (padded_t - counts_t)[:, None]
        rank = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
        d_key = jnp.where(rank < need, tile_ids, sentinel).reshape(-1)
        return (jnp.sum(pstart[::7]) + jnp.sum(d_key[::11])
                ).astype(jnp.float32)

    timed("T4 cornerhist+dummies", chain(t4), jnp.zeros((8,), jnp.float32))

    gx1, gy1 = grid_x + 1, grid_y + 1
    x1 = x0c + rw
    y1 = y0c + rh
    one = jnp.where(rw * rh > 0, 1, 0)
    gridh = jnp.zeros((gy1, gx1), jnp.int32)
    gridh = gridh.at[y0c, x0c].add(one, mode="drop")
    gridh = gridh.at[y0c, x1].add(-one, mode="drop")
    gridh = gridh.at[y1, x0c].add(-one, mode="drop")
    gridh = gridh.at[y1, x1].add(one, mode="drop")
    counts_t = jnp.cumsum(jnp.cumsum(gridh, axis=0), axis=1)[
        :grid_y, :grid_x].reshape(-1)
    padded_t = ((counts_t + CHUNK - 1) // CHUNK) * CHUNK
    TC = num_tiles * CHUNK
    d_tile = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), CHUNK)
    d_rank = jnp.tile(jnp.arange(CHUNK, dtype=jnp.int32), num_tiles)
    d_active = d_rank < (padded_t - counts_t)[d_tile]
    d_key = jnp.where(d_active, d_tile, sentinel)
    d_zero = jnp.zeros((TC,), jnp.float32)

    def t5(soa):
        all_key = jnp.concatenate([soa[11].astype(jnp.int32), d_key])
        chans = tuple(
            jnp.concatenate([soa[c], d_zero]) for c in range(10)
        ) + (jnp.concatenate([soa[10], d_zero - 1.0]),)
        s = jax.lax.sort((all_key,) + chans, num_keys=1, is_stable=True)
        gid_sorted = s[-1]
        validch = (gid_sorted >= 0.0).astype(jnp.float32)
        inst = jnp.stack(
            s[1:] + (validch, jnp.zeros_like(validch),
                     jnp.zeros_like(validch), jnp.zeros_like(validch),
                     jnp.zeros_like(validch)), axis=0)
        return jnp.sum(inst[:, ::31])

    timed("T5 tile sort(12op)+stack", chain(t5), inst_soa)

    def t6(feat):
        stream, _ = IS.build_instances_fwd(
            feat, depth, tiles_min, tiles_max, visible, grid_x, grid_y,
            capacity, max_tiles, False)
        return jnp.sum(stream.inst[:, ::31])

    timed("T6 FULL build_instances_fwd", chain(t6), feat)


if __name__ == "__main__":
    main()
