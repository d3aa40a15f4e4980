"""Compiled-TPU vs CPU-interpret parity for the rasterizer fwd/bwd.

METHODOLOGY (round 3): the interpret reference MUST run in a separate
CPU-only process (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu) — axon's Pallas
interpret mode returns wrong windows for scalar-prefetch index maps
(NOTES.md round-2), so an in-process interpret "reference" through the
tunnel is garbage. This script re-execs itself for the CPU phase.

Interpretation guide for the diffs (measured round 3):
- the instance stream is BIT-EXACT TPU vs CPU;
- fwd image: ~1e-4-class after the bf16 2x2-split accumulation landed
  (was 1.5e-2 when the acc matmul ran at DEFAULT bf16 precision);
- bwd grads: small relative diffs on large-magnitude lanes come from the
  fwd-recompute chain (exp ulp differences + the discrete T<1e-4 done
  latch flipping single contributions), NOT from a kernel race — isolated
  absolute diffs at near-zero reference lanes are latch flips.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_NPZ = "/tmp/gpt_parity_ref.npz"


def compute(interpret):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians)
    from gaussianprediction_tpu.ops import rasterize as R

    W = H = 128
    g = random_gaussians(2000, seed=1, scale_range=(-3.6, -2.2))
    cam = orbit_camera(0.4, width=W, height=H, uid=0).to_device_dict()
    opac = jnp.asarray(1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1)
    args = (jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), opac, jnp.asarray(g["colors"]))

    def loss(xyz, scal, rot, op, col):
        out = R.render(xyz, scal, rot, op, None, cam, W, H, jnp.zeros(3),
                       colors_precomp=col, interpret=interpret)
        return jnp.mean(jnp.abs(out["render"] - 0.37)), out["render"]

    (l, img), grads = jax.jit(
        lambda *a: jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(*a)
    )(*args)
    import numpy as _np
    return _np.asarray(img), [_np.asarray(x) for x in grads]


def main():
    import numpy as np
    if "--cpu-ref" in sys.argv:
        img, grads = compute(interpret=True)
        np.savez(REF_NPZ, img=img, **{f"g{i}": g for i, g in enumerate(grads)})
        print("cpu ref saved", flush=True)
        return

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__), "--cpu-ref"],
        env=env, timeout=1200,
    )
    assert r.returncode == 0, "cpu ref phase failed"
    ref = np.load(REF_NPZ)

    import jax
    print("devices:", jax.devices(), flush=True)
    img_t, grads_t = compute(interpret=False)
    print("fwd image max abs diff:", np.abs(img_t - ref["img"]).max(),
          flush=True)
    for i, nm in enumerate(("xyz", "scal", "rot", "op", "col")):
        b = ref[f"g{i}"]
        den = max(np.abs(b).max(), 1e-12)
        print(f"grad {nm}: max rel diff {np.abs(grads_t[i] - b).max() / den:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
