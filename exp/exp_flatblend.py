"""A/B the flat-grid pipelined blend kernels (GPT_BLEND_FLAT) vs classic
at the bench workload. Grid over kchunk_x; prints a table plus forward-
image parity per config vs classic.

Usage: python exp/exp_flatblend.py [--n 200000] [--wh 800] [--iters 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--configs", default="classic,flat:1,flat:2,flat:4",
                   help="comma list: classic | flat:<kx>")
    args = p.parse_args()

    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians,
    )
    from gaussianprediction_tpu.ops.instance_stream import probe_slot_need
    from gaussianprediction_tpu.ops import rasterize as R

    W = H = args.wh
    N = args.n
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

    def probe_total(xyz, scal, rot):
        return probe_slot_need(xyz, scal, rot, op, cam, W, H)

    n_probe = int(jax.jit(probe_total)(xyz, scal, rot))
    mult = max(2, -(-int(n_probe * 1.2) // N))
    print(f"probe {n_probe} -> mult {mult}", flush=True)

    REPS = args.reps
    ref = None
    rows = []
    for spec in args.configs.split(","):
        if spec == "classic":
            os.environ.pop("GPT_BLEND_FLAT", None)
        else:
            os.environ["GPT_BLEND_FLAT"] = "1"
            os.environ["GPT_KCHUNK_X_FLAT"] = spec.split(":")[1]

        def loss(xyz, scal, rot, op, shs):
            out = R.render(
                xyz, scal, rot, op, shs, cam, W, H, jnp.zeros(3),
                sh_degree=3, capacity_multiplier=mult, need_tidx=False,
            )
            return jnp.mean(jnp.abs(out["render"] - 0.5)), (
                out["render"], out["n_dropped"])

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)

        def single(xyz, scal, rot, op, shs):
            (l, (img, nd)), grads = vg(xyz, scal, rot, op, shs)
            return img, nd, grads

        def chained(xyz, scal, rot, op, shs):
            def body(i, carry):
                op_c, acc = carry
                (l, (img, nd)), grads = vg(xyz, scal, rot, op_c, shs)
                dep = 1e-38 * jnp.mean(grads[3])
                return (op_c + dep, acc + l)

            _, acc = jax.lax.fori_loop(
                0, REPS, body, (op, jnp.float32(0.0)))
            return acc

        img, nd, grads = jax.jit(single)(xyz, scal, rot, op, shs)
        img = np.asarray(img)
        gsum = [float(jnp.sum(jnp.abs(g_))) for g_ in grads]
        assert int(nd) == 0, f"dropped {int(nd)}"
        if ref is None:
            ref, gref = img, gsum
            par, gpar = 0.0, 0.0
        else:
            par = float(np.abs(img - ref).max())
            gpar = max(abs(a - b) / max(abs(b), 1e-9)
                       for a, b in zip(gsum, gref))

        bf = jax.jit(chained)
        _ = float(bf(xyz, scal, rot, op, shs))
        t0 = time.time()
        for _ in range(args.iters):
            _ = float(bf(xyz, scal, rot, op, shs))
        ms = (time.time() - t0) / (args.iters * REPS) * 1000
        rays = W * H / (ms / 1000)
        rows.append((spec, ms, rays / 1e6, par, gpar))
        print(f"{spec:>10}: {ms:7.2f} ms  {rays/1e6:6.2f} Mrays/s  "
              f"img_par {par:.2e}  grad_par {gpar:.2e}", flush=True)

    print(json.dumps([
        {"spec": s, "ms": round(m, 2), "mrays": round(r, 2),
         "img_par": p_, "grad_par": gp} for s, m, r, p_, gp in rows]))


if __name__ == "__main__":
    main()
