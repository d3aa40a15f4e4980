"""Internal breakdown of build_instances_fwd (53 ms of the 56 ms full fwd).

Cumulative-prefix timing of the stream's stages at the production shape
(200k Gaussians, 800x800, capacity 2M):
  P1: depth sort + [N,14] row gather + count/offset cumsums
  P2: P1 + cumsum-inverse compaction (scatter-max, log-cummax, [P,16]
      monotone row gather) + per-slot key
  P3: P2 + corner histogram + pstart + dummy keys  (everything but sort)
  P4: full fwd (== C in exp_pipebreak)
Every stage's outputs are consumed into the checksum so XLA cannot DCE
channels (strided sums over ALL rows).
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
from gaussianprediction_tpu.ops import instance_stream as IS
from gaussianprediction_tpu.ops import projection as PJ
from gaussianprediction_tpu.ops.projection import TILE
from gaussianprediction_tpu.ops.rasterize_pallas import CHUNK

W = H = 800
N = 200_000
REPS = 8
ITERS = 4


def timed(tag, make_fn, *args):
    f = jax.jit(make_fn)
    t0 = time.time()
    _ = float(f(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        _ = float(f(*args))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.1f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


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
    feat0 = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    depth, tiles_min, tiles_max = proj.depth, proj.tiles_min, proj.tiles_max
    visible = proj.visible

    def stage_upto(feat, upto):
        """Re-expression of build_instances_fwd with a stage cut."""
        center_px = feat[:, 0:2]
        x0c, y0c, rw0, rh0 = IS._capped_rect(
            tiles_min, tiles_max, center_px, max_tiles
        )
        rw = jnp.where(visible, rw0, 0)
        rh = jnp.where(visible, rh0, 0)
        gidx = jnp.arange(N, dtype=jnp.int32)
        _, order = jax.lax.sort((depth, gidx), num_keys=1, is_stable=True)
        gmat = jnp.concatenate(
            [feat, x0c[:, None].astype(jnp.float32),
             y0c[:, None].astype(jnp.float32),
             rw[:, None].astype(jnp.float32),
             rh[:, None].astype(jnp.float32)], axis=1)
        gmat_s = gmat[order]
        feat_s = gmat_s[:, :10]
        tminx_s = gmat_s[:, 10].astype(jnp.int32)
        tminy_s = gmat_s[:, 11].astype(jnp.int32)
        rw_s = gmat_s[:, 12].astype(jnp.int32)
        rh_s = gmat_s[:, 13].astype(jnp.int32)
        count = rw_s * rh_s
        offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
        total = offsets[-1] + count[-1]
        if upto == 1:
            return (jnp.sum(gmat_s[:, ::3]) + jnp.sum(offsets[::7])
                    + jnp.float32(total))
        rank1 = jnp.where(count > 0, gidx + 1, 0)
        ind = jnp.zeros((capacity,), jnp.int32).at[offsets].max(
            rank1, mode="drop")
        g_of = IS._cummax(ind) - 1
        g_of = jnp.clip(g_of, 0, N - 1)
        permat = jnp.concatenate(
            [feat_s, offsets.astype(jnp.float32)[:, None],
             tminx_s.astype(jnp.float32)[:, None],
             tminy_s.astype(jnp.float32)[:, None],
             rw_s.astype(jnp.float32)[:, None],
             order.astype(jnp.float32)[:, None],
             jnp.zeros((N, 1), jnp.float32)], axis=1)
        rows = permat[g_of]
        j = jnp.arange(capacity, dtype=jnp.int32)
        offs = rows[:, 10].astype(jnp.int32)
        k = j - offs
        rwj = jnp.maximum(rows[:, 13].astype(jnp.int32), 1)
        ty = rows[:, 12].astype(jnp.int32) + k // rwj
        tx = rows[:, 11].astype(jnp.int32) + k % rwj
        valid = j < jnp.minimum(total, capacity)
        key = jnp.where(valid, ty * grid_x + tx, sentinel)
        if upto == 2:
            return jnp.sum(rows[:, ::2][::11]) + jnp.sum(key[::7])
        gx1, gy1 = grid_x + 1, grid_y + 1
        x1 = x0c + rw
        y1 = y0c + rh
        one = jnp.where(rw * rh > 0, 1, 0)
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
        d_tile = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), CHUNK)
        d_rank = jnp.tile(jnp.arange(CHUNK, dtype=jnp.int32), num_tiles)
        d_active = d_rank < (padded_t - counts_t)[d_tile]
        d_key = jnp.where(d_active, d_tile, sentinel)
        if upto == 3:
            return (jnp.sum(rows[:, ::2][::11]) + jnp.sum(key[::7])
                    + jnp.sum(pstart[::3]) + jnp.sum(d_key[::5]))
        raise ValueError

    def chained(upto):
        def run(feat):
            def body(i, carry):
                f, acc = carry
                l = stage_upto(f, upto)
                return f + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(
                0, REPS, body, (feat, jnp.float32(0.0)))
            return acc
        return run

    p1 = timed("P1 depthsort+gather+cumsum", chained(1), feat0)
    p2 = timed("P2 +compaction+key", chained(2), feat0)
    p3 = timed("P3 +cornerhist+dummies", chained(3), feat0)

    def full(feat):
        def body(i, carry):
            f, acc = carry
            s = IS.build_instances(
                f, depth, tiles_min, tiles_max, visible,
                grid_x, grid_y, capacity, max_tiles)
            l = (jnp.sum(s.inst[:, ::997]) + jnp.sum(s.tile_start[::3])
                 + s.n_dropped.astype(jnp.float32))
            return f + 1e-38 * l, acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (feat0, jnp.float32(0.0)))
        return acc

    p4 = timed("P4 full stream fwd (fused sort, all rows consumed)", full,
               feat0)
    print(f"  compaction+key = {p2 - p1:.1f} ms; cornerhist = "
          f"{p3 - p2:.1f} ms; final sort+stack = {p4 - p3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
