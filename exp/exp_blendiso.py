"""Isolated blend-kernel ablation at the bench workload.

Builds the instance stream ONCE, then times rasterize_binned variants in
isolation (8 chained reps/device call, denormal feedback): classic vs flat
vs flat-noskip, fwd-only and fwd+bwd, plus a null-body kernel with the
flat grid/specs to measure the pure per-step pipeline floor.

Usage: python exp/exp_blendiso.py [--configs ...]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import rasterize as R
from gaussianprediction_tpu.ops import instance_stream as IS
from gaussianprediction_tpu.ops import rasterize_pallas as RP
from gaussianprediction_tpu.ops import projection as PJ
from gaussianprediction_tpu.ops.instance_stream import probe_slot_need
from gaussianprediction_tpu.utils import sh as shlib

W = H = 800
N = 200_000
REPS = 8
ITERS = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs",
                   default="classic,flat:2,flatns:2,null:2,flatns:4")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    g = random_gaussians(N, seed=42, scale_range=(-5.2, -3.8))
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    xyz = jnp.asarray(g["xyz"])
    scal = jnp.exp(jnp.asarray(g["log_scales"]))
    rot = jnp.asarray(g["rotation"])
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jnp.asarray(
        (1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1).astype(np.float32)
    )
    shs = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, 3, 16)).astype(np.float32)
        * 0.2
    )
    n_probe = int(jax.jit(
        lambda x, s, r: probe_slot_need(x, s, r, op, cam, W, H)
    )(xyz, scal, rot))
    mult = max(2, -(-int(n_probe * 1.2) // N))
    grid_x = (W + 15) // 16
    grid_y = (H + 15) // 16
    capacity = ((mult * N + RP.CHUNK - 1) // RP.CHUNK) * RP.CHUNK

    @jax.jit
    def build(xyz, scal, rot, op, shs):
        proj = PJ.project_from_params(
            xyz, scal, rot, cam, W, H, opacity=op)
        dirs = xyz - cam["camera_center"][None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        colors, _ = shlib.sh_to_rgb_clamped(3, shs, dirs)
        feat = jnp.concatenate(
            [proj.mean2d, proj.conic, op[:, None], colors,
             proj.depth[:, None]], axis=-1)
        stream = IS.build_instances(
            feat, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            grid_x, grid_y, capacity, 1024, False)
        return stream.inst, stream.tile_start, stream.tile_end, stream.n_dropped

    instT, ts, te, nd = build(xyz, scal, rot, op, shs)
    assert int(nd) == 0
    instT = jax.block_until_ready(instT)
    seg = np.asarray(te) - np.asarray(ts)
    print(f"mult {mult} capacity {capacity} n_inst {int(seg.sum())} "
          f"tiles {len(seg)} nonempty {(seg > 0).sum()}", flush=True)
    for kx in (1, 2, 4):
        K = 128 * kx
        base = np.asarray(ts) // K * K
        nch = np.where(seg > 0, -(-(np.asarray(te) - base) // K), 0)
        print(f"  kx={kx}: n_work {nch.sum()}", flush=True)

    def timed(tag, fn, x):
        f = jax.jit(fn)
        t0 = time.time()
        _ = float(jnp.sum(f(x)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            _ = float(jnp.sum(f(x)))
        ms = (time.time() - t0) / (ITERS * REPS) * 1000
        print(f"{tag}: {ms:7.2f} ms (compile {comp:.0f}s)", flush=True)
        return ms

    def chain(body):
        def fn(x):
            def it(i, carry):
                x_c, acc = carry
                r = body(x_c)
                return x_c + 1e-38 * r, acc + r
            _, acc = jax.lax.fori_loop(
                0, REPS, it, (x, jnp.float32(0.0)))
            return acc
        return fn

    def fwd_body(x):
        out = RP.rasterize_binned(x, ts, te, grid_x, grid_y, False, False)
        return jnp.sum(out[:, :, :5])

    def fwdbwd_body(x):
        l, gr = jax.value_and_grad(fwd_body)(x)
        return l + 1e-30 * jnp.sum(gr)

    def null_flat(x, kchunk):
        instp, wt, woff, ft, nw, NW = RP._flat_prep(x, ts, te, kchunk)

        def kern(wt_ref, woff_ref, ts_ref, te_ref, ft_ref, nw_ref,
                 inst_ref, out_ref):
            i = pl.program_id(0)
            t = wt_ref[i]
            out_ref[0] = jnp.broadcast_to(
                inst_ref[0:1, 0:1] + jnp.float32(t), (RP.PIX, 8))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(NW,),
            in_specs=[pl.BlockSpec(
                (RP.NCH, kchunk),
                lambda i, wt, woff, ts_, te_, ft_, nw_: (0, woff[i]),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, RP.PIX, 8),
                lambda i, wt, woff, ts_, te_, ft_, nw_: (wt[i], 0, 0),
                memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (grid_x * grid_y, RP.PIX, 8), jnp.float32),
            grid_spec=grid_spec,
        )(wt, woff, ts, te, ft, nw, instp)
        return jnp.sum(out[:, 0, 0])

    def null_classic(x, do_dma: bool):
        """Per-program floor of the classic kernel shape: same grid /
        scalar-prefetch / out spec; body writes init and (optionally)
        streams its chunks double-buffered with no compute."""
        instp = RP._pad_inst_T(x)

        def kern(start_ref, end_ref, inst_ref, out_ref, chunk_vmem, sems):
            t = pl.program_id(0)
            start = start_ref[t]
            end = end_ref[t]
            off0 = (start // RP.CHUNK) * RP.CHUNK
            span = end - off0
            nchunks = jnp.where(end > start, pl.cdiv(span, RP.KCHUNK), 0)

            def get_dma(slot, c):
                off = pl.multiple_of(off0 + c * RP.KCHUNK, RP.CHUNK)
                return pltpu.make_async_copy(
                    inst_ref.at[:, pl.ds(off, RP.KCHUNK)],
                    chunk_vmem.at[slot], sems.at[slot])

            acc = jnp.zeros((8, 128), jnp.float32)
            if do_dma:
                @pl.when(0 < nchunks)
                def _():
                    get_dma(0, 0).start()

                def body(state):
                    c, acc = state

                    @pl.when(c + 1 < nchunks)
                    def _():
                        get_dma((c + 1) % 2, c + 1).start()

                    get_dma(c % 2, c).wait()
                    acc = acc + chunk_vmem[c % 2][0:8, 0:128]
                    return c + 1, acc

                _, acc = jax.lax.while_loop(
                    lambda s: s[0] < nchunks, body,
                    (jnp.int32(0), acc))
            out_ref[0] = jnp.zeros((RP.PIX, 8), jnp.float32)
            out_ref[0, 0:8, :] = acc[:, 0:8] + jnp.float32(start)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid_x * grid_y,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, RP.PIX, 8), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, RP.NCH, RP.KCHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (grid_x * grid_y, RP.PIX, 8), jnp.float32),
            grid_spec=grid_spec,
        )(ts, te, instp)
        return jnp.sum(out[:, 0, 0])

    for spec in args.configs.split(","):
        os.environ.pop("GPT_BLEND_FLAT", None)
        os.environ.pop("GPT_FLAT_NOSKIP", None)
        if spec in ("nullc", "dmac"):
            timed(f"{spec}      ", chain(
                functools.partial(null_classic, do_dma=spec == "dmac")),
                instT)
            continue
        if spec == "classic":
            pass
        elif spec.startswith("null:"):
            kx = int(spec.split(":")[1])
            timed(f"{spec} fwd-null", chain(
                functools.partial(null_flat, kchunk=128 * kx)), instT)
            continue
        else:
            name, kxs = spec.split(":")
            os.environ["GPT_BLEND_FLAT"] = "1"
            os.environ["GPT_KCHUNK_X_FLAT"] = kxs
            if name == "flatns":
                os.environ["GPT_FLAT_NOSKIP"] = "1"
        timed(f"{spec} fwd    ", chain(fwd_body), instT)
        timed(f"{spec} fwd+bwd", chain(fwdbwd_body), instT)


if __name__ == "__main__":
    main()
