"""Within-run bisect of the resident expand kernel's ~15 ms cost, plus
A/Bs of the round-2 stream-fwd micro-fixes (fused corner hist, Pallas
permat stack). Every variant is timed in ONE process so run-to-run
variance (large on the tunneled TPU) cancels.

Expand variants (same grid geometry, same output shape):
  E0 full resident kernel (production expand_rows path)
  E1 write-only: constant output, no slices/compares/matmuls
  E2 slices+compares, NO matmuls (rows = broadcast of a compare sum)
  E3 slices+matmuls, NO compares (oh = constant mask)
  E4 full math but STATIC window offset (no scalar-prefetch dynamic slice)
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianprediction_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import expand_pallas as EP
from gaussianprediction_tpu.ops import instance_stream as IS
from gaussianprediction_tpu.ops import projection as PJ
from gaussianprediction_tpu.ops.rasterize_pallas import CHUNK

W = H = 800
N = 200_000
REPS = 8
ITERS = 4
NCH = 16
WCAND = EP.WCAND
BSLOT = EP.BSLOT
RSUB = EP.RSUB


def timed(tag, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    r = f(*args)
    _ = float(jnp.sum(r) if not isinstance(r, tuple) else jnp.sum(r[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        r = f(*args)
        _ = float(jnp.sum(r) if not isinstance(r, tuple) else jnp.sum(r[0]))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def variant_kernel(q_ref, scal_ref, pm_hbm, of_hbm, out_ref,
                   pm_vmem, of_vmem, sems, *, grid_x, sentinel, mode):
    b = pl.program_id(0)
    total = scal_ref[0]

    @pl.when(b == 0)
    def _():
        pltpu.make_async_copy(pm_hbm, pm_vmem, sems.at[0]).start()
        pltpu.make_async_copy(of_hbm, of_vmem, sems.at[1]).start()
        pltpu.make_async_copy(pm_hbm, pm_vmem, sems.at[0]).wait()
        pltpu.make_async_copy(of_hbm, of_vmem, sems.at[1]).wait()

    if mode == "write_only":
        out_ref[...] = jnp.full((NCH, RSUB * BSLOT), 1.0, jnp.float32)
        return

    outs = []
    for i in range(RSUB):
        q = q_ref[b * RSUB + i]
        if mode == "static":
            off0 = 0
        else:
            off0 = pl.multiple_of(q * WCAND, WCAND)
        offs_w = of_vmem[:, pl.ds(off0, 2 * WCAND)]
        pw = pm_vmem[:, pl.ds(off0, 2 * WCAND)]
        jcol = (b * RSUB + i) * BSLOT + jax.lax.broadcasted_iota(
            jnp.int32, (BSLOT, 1), 0
        )
        offs_nx = jnp.concatenate(
            [offs_w[:, 1:], jnp.full((1, 1), EP.HUGE, jnp.int32)], axis=1
        )
        if mode == "no_compare":
            oh = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (BSLOT, 2 * WCAND), 1)
                == 7, 1.0, 0.0,
            )
        else:
            oh = jnp.where((offs_w <= jcol) & (offs_nx > jcol), 1.0, 0.0)
        if mode == "no_matmul":
            s = jnp.sum(oh, axis=1, keepdims=True)        # [B, 1]
            outs.append(
                jnp.broadcast_to(s.reshape(1, BSLOT), (NCH, BSLOT))
                + pw[:, :1]
            )
            continue
        oh_bf = oh.astype(jnp.bfloat16)
        hi = pw.astype(jnp.bfloat16)
        r1 = pw - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

        def sel(vals_bf):
            return jax.lax.dot_general(
                vals_bf, oh_bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        rows = sel(hi) + sel(mid) + sel(lo)
        outs.append(rows)
    out_ref[...] = jnp.concatenate(outs, axis=1)


def run_variant(tag, mode, permat, offs_row, starts_q, total, capacity,
                grid_x, sentinel):
    nsteps = capacity // (RSUB * BSLOT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((NCH, RSUB * BSLOT), lambda b, q, s: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((NCH, permat.shape[1]), jnp.float32),
            pltpu.VMEM((1, offs_row.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(variant_kernel, grid_x=grid_x, sentinel=sentinel,
                          mode=mode),
        out_shape=jax.ShapeDtypeStruct((NCH, capacity), jnp.float32),
        grid_spec=grid_spec,
        interpret=False,
    )

    def fn(pm):
        def body(i, carry):
            x, acc = carry
            r = call(starts_q, total, x, offs_row)
            l = jnp.sum(r[0, ::997])
            return x + 1e-38 * l, acc + l
        _, acc = jax.lax.fori_loop(
            0, REPS, body, (pm, jnp.float32(0.0))
        )
        return acc

    return timed(tag, fn, permat)


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
    sentinel = num_tiles
    capacity = 10 * N
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )

    # ---- reproduce the fwd prelude up to the expand inputs (new code) ----
    center_px = feat[:, 0:2]
    x0c, y0c, rw0, rh0 = IS._capped_rect(
        proj.tiles_min, proj.tiles_max, center_px, 1024
    )
    rw = jnp.where(proj.visible, rw0, 0)
    rh = jnp.where(proj.visible, rh0, 0)
    gidx = jnp.arange(N, dtype=jnp.int32)
    zerokey = (rw * rh == 0).astype(jnp.int32)
    srt = jax.lax.sort(
        (zerokey, proj.depth,
         feat[:, 0], feat[:, 1], feat[:, 2], feat[:, 3], feat[:, 4],
         feat[:, 5], feat[:, 6], feat[:, 7], feat[:, 8],
         x0c.astype(jnp.float32), y0c.astype(jnp.float32),
         rw.astype(jnp.float32), rh.astype(jnp.float32), gidx),
        num_keys=2, is_stable=True,
    )
    depth_s = srt[1]
    x0f, y0f, rwf, rhf = srt[11:15]
    gid_s = srt[15]
    count = (rwf * rhf).astype(jnp.int32)
    offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
    total = offsets[-1] + count[-1]
    print(f"n_total instances = {int(total)}", flush=True)

    STK = EP.STK_BLK
    qmax = max((N - 1) // WCAND, 0)
    Np = (((qmax + 2) * WCAND + STK - 1) // STK) * STK
    pad = Np - N
    offs_row = jnp.concatenate(
        [offsets, jnp.full((pad,), EP.HUGE, jnp.int32)]
    )[None, :]
    padf = jnp.zeros((pad,), jnp.float32)
    chans = ([jnp.concatenate([c, padf]) for c in srt[2:11]]
             + [jnp.concatenate([depth_s, padf]),
                jnp.concatenate([offsets.astype(jnp.float32), padf]),
                jnp.concatenate([x0f, padf]), jnp.concatenate([y0f, padf]),
                jnp.concatenate([rwf, padf]),
                jnp.concatenate([gid_s.astype(jnp.float32), padf])])
    permat = EP.stack_rows(chans, nch=16, interpret=False)
    permat = jax.block_until_ready(permat)

    cap512 = ((capacity + EP.ALIGN - 1) // EP.ALIGN) * EP.ALIGN
    nb = cap512 // BSLOT
    block_starts = jnp.arange(nb, dtype=jnp.int32) * BSLOT
    g0 = jnp.maximum(
        jnp.searchsorted(offs_row[0], block_starts, side="right")
        .astype(jnp.int32) - 1, 0,
    )
    starts_q = g0 // WCAND
    totc = jnp.minimum(total, capacity)[None]

    # ---- A/B: permat assembly (XLA stack vs Pallas stack_rows) ----
    def permat_xla(cs):
        m = jnp.stack(cs, axis=0)
        return jnp.sum(m[:, ::97])

    def permat_krn(cs):
        m = EP.stack_rows(cs, nch=16, interpret=False)
        return jnp.sum(m[:, ::97])

    def chainv(fn):
        def run(x0, rest):
            def body(i, carry):
                x, acc = carry
                l = fn([x] + rest)
                return x + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(
                0, REPS, body, (x0, jnp.float32(0.0))
            )
            return acc
        return run

    timed("P1 permat XLA stack", chainv(permat_xla), chans[0], chans[1:])
    timed("P2 permat stack_rows", chainv(permat_krn), chans[0], chans[1:])

    # ---- A/B: corner histogram (4 scatters vs 1 fused) ----
    gx1, gy1 = grid_x + 1, grid_y + 1
    x1 = x0c + rw
    y1 = y0c + rh

    def hist_old(z):
        one = jnp.where(rw * rh > 0, 1, 0) + (z[:1] * 0).astype(jnp.int32)
        grid = jnp.zeros((gy1, gx1), jnp.int32)
        grid = grid.at[y0c, x0c].add(one, mode="drop")
        grid = grid.at[y0c, x1].add(-one, mode="drop")
        grid = grid.at[y1, x0c].add(-one, mode="drop")
        grid = grid.at[y1, x1].add(one, mode="drop")
        c = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[
            :grid_y, :grid_x].reshape(-1)
        return jnp.sum(c[::7]).astype(jnp.float32)

    def hist_new(z):
        one = jnp.where(rw * rh > 0, 1, 0) + (z[:1] * 0).astype(jnp.int32)
        cidx = jnp.concatenate(
            [y0c * gx1 + x0c, y0c * gx1 + x1, y1 * gx1 + x0c, y1 * gx1 + x1]
        )
        cval = jnp.concatenate([one, -one, -one, one])
        grid = jnp.zeros((gy1 * gx1,), jnp.int32).at[cidx].add(
            cval, mode="drop").reshape(gy1, gx1)
        c = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[
            :grid_y, :grid_x].reshape(-1)
        return jnp.sum(c[::7]).astype(jnp.float32)

    def chain1(fn):
        def run(x):
            def body(i, carry):
                xx, acc = carry
                l = fn(xx)
                return xx + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(
                0, REPS, body, (x, jnp.float32(0.0))
            )
            return acc
        return run

    timed("H1 cornerhist 4-scatter", chain1(hist_old),
          jnp.zeros((8,), jnp.float32))
    timed("H2 cornerhist fused", chain1(hist_new),
          jnp.zeros((8,), jnp.float32))

    # ---- expand kernel bisect ----
    for tag, mode in [("E0 full", "full"), ("E1 write-only", "write_only"),
                      ("E2 no-matmul", "no_matmul"),
                      ("E3 no-compare", "no_compare"),
                      ("E4 static-window", "static")]:
        run_variant(tag, mode, permat, offs_row, starts_q, totc, cap512,
                    grid_x, sentinel)


if __name__ == "__main__":
    main()
