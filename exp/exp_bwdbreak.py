"""Backward-path breakdown @200k/800x800: blend-kernel bwd vs stream bwd.

  K1: blend kernel fwd only (on a fixed prebuilt stream)
  K2: blend kernel fwd+bwd          -> kernel bwd = K2 - K1
  S1: stream fwd only (build_instances)
  S2: stream fwd+bwd                -> stream bwd = S2 - S1
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
from gaussianprediction_tpu.ops import rasterize_pallas as RP
from gaussianprediction_tpu.ops import projection as PJ

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

    def chained(stage_fn, x0):
        def run(x):
            def body(i, carry):
                xx, acc = carry
                l = stage_fn(xx)
                return xx + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0.0)))
            return acc
        return run, x0

    def k_fwd(instx):
        out = RP.rasterize_binned(instx, ts, te, grid_x, grid_y, False, False)
        return jnp.sum(out[:, ::7, 0])

    f1, x1 = chained(k_fwd, inst)
    k1 = timed("K1 blend kernel fwd", f1, x1)

    def k_fwdbwd(instx):
        l, gr = jax.value_and_grad(
            lambda ii: jnp.sum(
                RP.rasterize_binned(ii, ts, te, grid_x, grid_y, False,
                                    False)[:, :, 0:4]
            )
        )(instx)
        return l + jnp.sum(gr[0, ::997])

    f2, x2 = chained(k_fwdbwd, inst)
    k2 = timed("K2 blend kernel fwd+bwd", f2, x2)
    print(f"   kernel bwd = {k2 - k1:.2f} ms", flush=True)

    def s_fwd(f):
        s = IS.build_instances(
            f, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            grid_x, grid_y, capacity, 1024, False)
        return jnp.sum(s.inst[:, ::997])

    f3, x3 = chained(s_fwd, feat)
    s1 = timed("S1 stream fwd", f3, x3)

    def s_fwdbwd(f):
        l, gr = jax.value_and_grad(
            lambda ff: jnp.sum(
                IS.build_instances(
                    ff, proj.depth, proj.tiles_min, proj.tiles_max,
                    proj.visible, grid_x, grid_y, capacity, 1024,
                    False).inst[:11]
            )
        )(f)
        return l + jnp.sum(gr[::17])

    f4, x4 = chained(s_fwdbwd, feat)
    s2 = timed("S2 stream fwd+bwd", f4, x4)
    print(f"   stream bwd = {s2 - s1:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
