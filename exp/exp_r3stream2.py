"""Round-3 breakdown of the CURRENT (unaligned-segment) build_instances_fwd
at the bench shape (200k, 800x800, probe-sized capacity), each stage timed
in isolation on precomputed inputs with strided checksums. Mirrors
instance_stream.py after the dummy-padding removal:

  U1: rect cap + count cumsums + permat (stack_rows) + starts_q   [glue]
  U2: expand kernel alone (GPT_EXPAND_V selects mm/dg/bs)
  U3: corner-difference histogram (sort-based) + pstart
  U4: 12-op 2-key tile sort @ Pp (no dummies)
  U5: interleave kernel alone
  U6: FULL build_instances_fwd
  U7: FULL render fwd (loss scalar)
  U8: FULL render fwd+bwd
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
from gaussianprediction_tpu.ops import rasterize as R
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
    proj = PJ.project_from_params(xyz, scal, rot, cam, W, H, opacity=op)
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    sentinel = jnp.int32(num_tiles)
    max_tiles = 1024
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    depth, tiles_min, tiles_max = proj.depth, proj.tiles_min, proj.tiles_max
    visible = proj.visible

    center_px = feat[:, 0:2]
    x0c, y0c, rw0, rh0 = IS._capped_rect(tiles_min, tiles_max, center_px,
                                         max_tiles)
    rw = jnp.where(visible, rw0, 0)
    rh = jnp.where(visible, rh0, 0)
    gidx = jnp.arange(N, dtype=jnp.int32)
    n_total = int(jnp.sum(jnp.maximum(rw * rh, 1)))
    mult = max(2, -(-int(n_total * 1.2) // N))
    capacity = ((mult * N + CHUNK - 1) // CHUNK) * CHUNK
    print(f"n_total={n_total} mult={mult} capacity={capacity} "
          f"variant={os.environ.get('GPT_EXPAND_V', 'mm')}", flush=True)

    B, WC = expand_pallas.BSLOT, expand_pallas.WCAND
    S = expand_pallas.ALIGN
    cap512 = ((capacity + S - 1) // S) * S
    STK = expand_pallas.STK_BLK
    Np = ((N + 2 * WC + STK - 1) // STK) * STK
    pad = Np - N
    padf = jnp.zeros((pad,), jnp.float32)
    featT0 = jnp.pad(feat.T, ((0, 0), (0, pad)))

    def u1(featT):
        count = rw * rh
        count1 = jnp.maximum(count, 1)
        offsets = (jnp.cumsum(count1) - count1).astype(jnp.int32)
        total1 = offsets[-1] + count1[-1]
        offs_row = jnp.concatenate(
            [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)]
        )[None, :]
        permat = expand_pallas.stack_rows(
            [featT[c] for c in range(10)]
            + [jnp.concatenate([offsets.astype(jnp.float32), padf]),
               jnp.concatenate([x0c.astype(jnp.float32), padf]),
               jnp.concatenate([y0c.astype(jnp.float32), padf]),
               jnp.concatenate([rw.astype(jnp.float32), padf]),
               jnp.concatenate([gidx.astype(jnp.float32), padf])],
            nch=16, interpret=False,
        )
        nb = cap512 // B
        block_starts = jnp.arange(nb, dtype=jnp.int32) * B
        g0 = jnp.maximum(jnp.searchsorted(
            offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
        starts_q = g0 // WC
        return (jnp.sum(permat[:, ::17]) + jnp.sum(starts_q[::7]) +
                jnp.float32(total1) + jnp.sum(offs_row[:, ::13]))

    timed("U1 glue (cumsum+stack_rows+starts_q)", chain(u1), featT0)

    count = rw * rh
    count1 = jnp.maximum(count, 1)
    offsets = (jnp.cumsum(count1) - count1).astype(jnp.int32)
    total1 = offsets[-1] + count1[-1]
    offs_row = jnp.concatenate(
        [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)])[None, :]
    permat0 = expand_pallas.stack_rows(
        [featT0[c] for c in range(10)]
        + [jnp.concatenate([offsets.astype(jnp.float32), padf]),
           jnp.concatenate([x0c.astype(jnp.float32), padf]),
           jnp.concatenate([y0c.astype(jnp.float32), padf]),
           jnp.concatenate([rw.astype(jnp.float32), padf]),
           jnp.concatenate([gidx.astype(jnp.float32), padf])],
        nch=16, interpret=False)
    nb = cap512 // B
    block_starts = jnp.arange(nb, dtype=jnp.int32) * B
    g0 = jnp.maximum(jnp.searchsorted(
        offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
    starts_q = g0 // WC
    totc = jnp.minimum(total1, capacity)[None]

    def u2(permat):
        raw = expand_pallas.expand_rows_raw(
            permat, offs_row, starts_q, totc, cap512, interpret=False)
        return jnp.sum(raw[:, ::29])

    timed("U2 expand kernel (raw)", chain(u2), permat0)

    def u2b(permat):
        raw = expand_pallas.expand_rows_raw(
            permat, offs_row, starts_q, totc, cap512, interpret=False)
        ch = expand_pallas.emit_from_raw(raw, totc[0], grid_x,
                                         int(num_tiles))
        return sum(jnp.sum(c[::29]) for c in ch)

    timed("U2b expand raw + XLA emit", chain(u2b), permat0)

    raw0 = expand_pallas.expand_rows_raw(
        permat0, offs_row, starts_q, totc, cap512, interpret=False)
    inst_soa = expand_pallas.emit_from_raw(raw0, totc[0], grid_x,
                                           int(num_tiles))
    key0 = inst_soa[11].astype(jnp.int32)

    def u3(x):
        gx1, gy1 = grid_x + 1, grid_y + 1
        x1 = x0c + rw
        y1 = y0c + rh
        one = jnp.where(rw * rh > 0, 1, 0) + (x[0, 0] * 0).astype(jnp.int32)
        cidx = jnp.concatenate(
            [y0c * gx1 + x0c, y0c * gx1 + x1, y1 * gx1 + x0c, y1 * gx1 + x1])
        cval = jnp.concatenate([one, -one, -one, one])
        G = gy1 * gx1
        sidx, sval = jax.lax.sort((cidx, cval), num_keys=1)
        cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sval)])
        ends = jnp.searchsorted(sidx, jnp.arange(G + 1, dtype=jnp.int32))
        grid = (cs[ends[1:]] - cs[ends[:-1]]).reshape(gy1, gx1)
        counts_t = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[
            :grid_y, :grid_x].reshape(-1)
        pstart = (jnp.cumsum(counts_t) - counts_t).astype(jnp.int32)
        return jnp.sum(pstart[::7].astype(jnp.float32))

    timed("U3 corner hist (sort-based) + pstart", chain(u3), feat)

    ILV = expand_pallas.ILV_BLK
    Pp = ((cap512 + ILV - 1) // ILV) * ILV
    pad_extra = Pp - cap512
    d_key = jnp.full((pad_extra,), sentinel, jnp.int32)
    d_zero = jnp.zeros((pad_extra,), jnp.float32)
    all_key0 = jnp.concatenate([key0, d_key])
    z_all0 = jnp.concatenate([inst_soa[9], d_zero + jnp.float32(3e38)])

    def u4(z_all):
        chans = tuple(
            jnp.concatenate([inst_soa[c], d_zero]) for c in range(9)
        ) + (jnp.concatenate([inst_soa[10], d_zero - 1.0]),)
        s = jax.lax.sort((all_key0, z_all) + chans, num_keys=2,
                         is_stable=True)
        return sum(jnp.sum(x[::29].astype(jnp.float32)) for x in s[:3])

    timed("U4 tile sort (12-op 2-key, no dummies)", chain(u4), z_all0)

    s0 = jax.lax.sort(
        (all_key0, z_all0) + tuple(
            jnp.concatenate([inst_soa[c], d_zero]) for c in range(9)
        ) + (jnp.concatenate([inst_soa[10], d_zero - 1.0]),),
        num_keys=2, is_stable=True)

    def u5(z):
        inst = expand_pallas.interleave_rows(
            s0[2:11] + (z, s0[11]), interpret=False)
        return jnp.sum(inst[:, ::31])

    timed("U5 interleave kernel", chain(u5), s0[1])

    def u6(feat):
        stream, _ = IS.build_instances_fwd(
            feat, depth, tiles_min, tiles_max, visible, grid_x, grid_y,
            capacity, max_tiles, interpret=False)
        return (jnp.sum(stream.inst[:, ::31]) +
                jnp.sum(stream.tile_start[::7].astype(jnp.float32)))

    timed("U6 FULL build_instances_fwd", chain(u6), feat)

    bg = jnp.zeros(3)

    def u7(xyz):
        out = R.render(xyz, scal, rot, op, None, cam, W, H, bg,
                       colors_precomp=colors, interpret=False,
                       capacity_multiplier=mult, need_tidx=False)
        return jnp.mean(out["render"]) + jnp.mean(out["depth"]) * 1e-3

    timed("U7 FULL render fwd", chain(u7), xyz)

    def u8(xyz):
        def loss(x):
            out = R.render(x, scal, rot, op, None, cam, W, H, bg,
                           colors_precomp=colors, interpret=False,
                           capacity_multiplier=mult, need_tidx=False)
            return jnp.mean(out["render"]) + jnp.mean(out["depth"]) * 1e-3
        l, gr = jax.value_and_grad(loss)(xyz)
        return l + jnp.sum(gr[::13]) * 1e-20

    timed("U8 FULL render fwd+bwd", chain(u8), xyz)


if __name__ == "__main__":
    main()
