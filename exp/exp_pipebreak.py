"""Component breakdown of the current fwd+bwd render step @200k/800x800.

Times each stage in isolation (8 chained reps per device call to amortize
the ~50-100 ms tunneled-dispatch overhead, denormal feedback to defeat
hoisting):
  A. full fwd (projection+SH+stream+kernel)
  B. full fwd+bwd        -> bwd total = B - A
  C. stream fwd alone (build_instances on precomputed feat)
  D. stream fwd + kernel fwd (isolates kernel fwd = D - C)
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
from gaussianprediction_tpu.ops import rasterize as R
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
    r = f(*args)
    _ = float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        r = f(*args)
        _ = float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
    ms = (time.time() - t0) / (ITERS * REPS) * 1000
    print(f"{tag}: {ms:.1f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    g = random_gaussians(N, seed=42, scale_range=(-5.2, -3.8))
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    xyz = jnp.asarray(g["xyz"])
    scal = jnp.exp(jnp.asarray(g["log_scales"]))
    rot = jnp.asarray(g["rotation"])
    op = jnp.asarray(
        (1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1).astype(np.float32)
    )
    shs = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, 3, 16)).astype(np.float32)
        * 0.2
    )
    bg = jnp.zeros(3)

    def fullfwd(xyz, scal, rot, op, shs):
        def body(i, carry):
            op_c, acc = carry
            out = R.render(xyz, scal, rot, op_c, shs, cam, W, H, bg,
                           sh_degree=3, capacity_multiplier=10,
                           need_tidx=False)
            l = jnp.mean(out["render"])
            return op_c + 1e-38 * l, acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (op, jnp.float32(0.0)))
        return acc

    a = timed("A. full fwd", fullfwd, xyz, scal, rot, op, shs)

    def fwdbwd(xyz, scal, rot, op, shs):
        def loss(op_c):
            out = R.render(xyz, scal, rot, op_c, shs, cam, W, H, bg,
                           sh_degree=3, capacity_multiplier=10,
                           need_tidx=False)
            return jnp.mean(jnp.abs(out["render"] - 0.5))
        def body(i, carry):
            op_c, acc = carry
            l, gr = jax.value_and_grad(loss)(op_c)
            return op_c + 1e-38 * jnp.mean(gr), acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (op, jnp.float32(0.0)))
        return acc

    # NB: grad wrt op only — XLA may DCE parts of the bwd; full-grad time
    # comes from bench.py (all five argnums). This isolates blend+stream bwd.
    b = timed("B. fwd+bwd(op-only)", fwdbwd, xyz, scal, rot, op, shs)
    print(f"   bwd(op-only) = {b - a:.1f} ms", flush=True)

    # precompute the projected feature matrix once (outside timing)
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    rotn = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    proj = PJ.project_from_params(xyz, scal, rotn, cam, W, H)
    sh_rgb = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], sh_rgb,
         proj.depth[:, None]], axis=1,
    )
    capacity = 10 * N

    def streamfwd(feat):
        def body(i, carry):
            f, acc = carry
            s = IS.build_instances(
                f, proj.depth, proj.tiles_min, proj.tiles_max,
                proj.visible, grid_x, grid_y, capacity, 1024,
            )
            l = jnp.sum(s.inst[0, ::997])
            return f + 1e-38 * l, acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (feat, jnp.float32(0.0)))
        return acc

    c = timed("C. stream fwd", streamfwd, feat)

    def streamkernel(feat):
        def body(i, carry):
            f, acc = carry
            s = IS.build_instances(
                f, proj.depth, proj.tiles_min, proj.tiles_max,
                proj.visible, grid_x, grid_y, capacity, 1024,
            )
            out = RP.rasterize_binned(
                s.inst, jax.lax.stop_gradient(s.tile_start),
                jax.lax.stop_gradient(s.tile_end), grid_x, grid_y,
                False, False,
            )
            l = jnp.sum(out[:, ::7, 0])
            return f + 1e-38 * l, acc + l
        _, acc = jax.lax.fori_loop(0, REPS, body, (feat, jnp.float32(0.0)))
        return acc

    d = timed("D. stream+kernel fwd", streamkernel, feat)
    print(f"   kernel fwd = {d - c:.1f} ms; proj+SH fwd = {a - d:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
