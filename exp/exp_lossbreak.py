"""Non-render train-step overhead at production scale: stage-0 full step
is ~268 ms while the render fwd+bwd is 85 ms. Times, in isolation:

  L1: dssim_l1_loss fwd @800x800
  L2: dssim_l1_loss fwd+bwd (grad wrt img)
  L3: adam_step over the full param pytree @200k (stage 1 groups)
  L4: densify-stats block (masked max/accum updates @200k)
  L5: psnr+l1 metrics
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

from gaussianprediction_tpu.config import get_preset
from gaussianprediction_tpu.data.synthetic import random_gaussians
from gaussianprediction_tpu.models import gaussians as G
from gaussianprediction_tpu.train import optimizer as opt_mod
from gaussianprediction_tpu.utils.image import dssim_l1_loss, l1_loss, psnr

W = H = 800
N = 200_000
REPS = 8
ITERS = 4


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
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, 3), jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)

    timed("L1 dssim_l1 fwd", chain(lambda im: dssim_l1_loss(im, gt, 0.2)),
          img)
    timed("L2 dssim_l1 fwd+bwd",
          chain(lambda im: jnp.sum(
              jax.grad(lambda x: dssim_l1_loss(x, gt, 0.2))(im)[::7, ::7]
          )), img)

    cfg = get_preset("test")
    g = random_gaussians(N, seed=0)
    state = G.create_from_pcd(jax.random.PRNGKey(0), cfg, g["xyz"],
                              g["colors"])
    params = state.params
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-6, params)
    opt_state = opt_mod.init_adam(params)

    def adam(x):
        p2 = dict(params)
        p2["xyz"] = params["xyz"] + x[0] * 1e-38
        newp, _ = opt_mod.adam_step(p2, grads, opt_state, cfg, 1, 1.0,
                                    jnp.int32(1000))
        return (jnp.sum(newp["xyz"][::31])
                + jnp.sum(newp["features_rest"][::131, 0, 0]))

    timed("L3 adam_step (stage1)", chain(adam), jnp.zeros((8,), jnp.float32))

    radii = jnp.ones((state.capacity,), jnp.int32)
    vs = jax.random.normal(key, (state.capacity,), jnp.float32)

    def stats(x):
        vis = radii > 0
        do = vis & (x[0] < 1e9)
        mr = jnp.where(do, jnp.maximum(state.max_radii2D, radii),
                       state.max_radii2D)
        acc = state.xyz_gradient_accum + jnp.where(do, jnp.abs(vs), 0.0)
        mx = jnp.where(do & (jnp.abs(vs) > state.xyz_gradient_accum_max),
                       jnp.abs(vs), state.xyz_gradient_accum_max)
        return jnp.sum(mr[::31].astype(jnp.float32)) + jnp.sum(acc[::31]) + jnp.sum(mx[::31])

    timed("L4 densify stats", chain(stats), jnp.zeros((8,), jnp.float32))

    timed("L5 psnr+l1", chain(lambda im: psnr(im, gt) + l1_loss(im, gt)),
          img)


if __name__ == "__main__":
    main()
