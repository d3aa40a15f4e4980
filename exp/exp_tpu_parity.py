"""Compiled-TPU vs interpret parity for the rasterizer fwd/bwd.

The v5e MXU truncates f32 dot operands to bf16 unless
precision=HIGHEST (caught in scatter_add_sorted, 2e-3 gradient error).
This measures how much the compiled rasterizer deviates from the exact
interpret path — fwd image AND bwd instance gradients.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import rasterize as R

W = H = 128
print("devices:", jax.devices(), flush=True)
g = random_gaussians(2000, seed=1, scale_range=(-3.6, -2.2))
cam = orbit_camera(0.4, width=W, height=H, uid=0).to_device_dict()
opac = jnp.asarray(1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1)
args = (jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
        jnp.asarray(g["rotation"]), opac, jnp.asarray(g["colors"]))


def loss(xyz, scal, rot, op, col, interpret):
    out = R.render(xyz, scal, rot, op, None, cam, W, H, jnp.zeros(3),
                   colors_precomp=col, interpret=interpret)
    return jnp.mean(jnp.abs(out["render"] - 0.37)), out["render"]


for mode, name in ((False, "tpu"), (True, "interpret")):
    (l, img), grads = jax.jit(
        lambda *a: jax.value_and_grad(
            lambda *b: loss(*b, mode), argnums=(0, 1, 2, 3, 4),
            has_aux=True)(*a)
    )(*args)
    if mode is False:
        img_t, grads_t = np.asarray(img), [np.asarray(x) for x in grads]
    else:
        img_i, grads_i = np.asarray(img), [np.asarray(x) for x in grads]

print("fwd image max abs diff:", np.abs(img_t - img_i).max())
for nm, a, b in zip(("xyz", "scal", "rot", "op", "col"), grads_t, grads_i):
    den = max(np.abs(b).max(), 1e-12)
    print(f"grad {nm}: max rel diff {np.abs(a - b).max() / den:.3e}")
