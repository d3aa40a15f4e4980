"""A/B the blend kernels' streaming width (GPT_KCHUNK_X) in isolation.

Builds the production instance stream ONCE (outside the timed jits, so the
expensive sort pipeline never recompiles), then times the Pallas blend
kernel fwd and fwd+bwd at the KCHUNK selected by the env. Run as:

    GPT_KCHUNK_X=4 python exp/exp_kab.py

Both kernels are ~0.8 us/grid-iteration fixed-cost bound (NOTES.md), so
KCHUNK = CHUNK * X cuts iteration count X-fold at the cost of coarser
early-exit granularity and up to (X-1)/X wasted lanes on short segments.
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
from gaussianprediction_tpu.ops import rasterize_pallas as RP

W = H = 800
N = 200_000
REPS = 8
ITERS = 4


def timed(tag, fn, x0):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(f(x0))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        _ = float(f(x0))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    print(f"KCHUNK_X = {os.environ.get('GPT_KCHUNK_X', '1')}", flush=True)
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
    capacity = 10 * N
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    stream = jax.jit(
        lambda f: IS.build_instances(
            f, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            grid_x, grid_y, capacity, 1024, False)
    )(feat)
    inst = jax.block_until_ready(stream.inst)
    ts, te = stream.tile_start, stream.tile_end

    def chain(stage_fn):
        def run(x):
            def body(i, carry):
                xx, acc = carry
                l = stage_fn(xx)
                return xx + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0.0)))
            return acc
        return run

    def k_fwd(instx):
        out = RP.rasterize_binned(instx, ts, te, grid_x, grid_y, False, False)
        return jnp.sum(out[:, ::7, 0])

    k1 = timed("K1 kernel fwd", chain(k_fwd), inst)

    def k_fwdbwd(instx):
        l, gr = jax.value_and_grad(k_fwd)(instx)
        return l + 1e-30 * jnp.sum(gr[:, ::13])

    k2 = timed("K2 kernel fwd+bwd", chain(k_fwdbwd), inst)
    print(f"   kernel bwd = {k2 - k1:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
