"""A/B the multi-tile contiguous blend kernels (GPT_BLEND_MT) vs classic
at the bench workload. Grid over (tpb, kchunk_x); prints a table plus a
bit-parity check of the forward image per config vs classic.

Usage: python exp/exp_mtblend.py [--n 200000] [--wh 800] [--iters 3]
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
    p.add_argument("--configs", default="0:0,2:2,4:2,4:4,8:2,8:4",
                   help="tpb:kx pairs; 0:0 = classic")
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
    ref_img = None
    rows = []
    for spec in args.configs.split(","):
        tpb, kx = (int(x) for x in spec.split(":"))
        if tpb == 0:
            os.environ.pop("GPT_BLEND_MT", None)
        else:
            os.environ["GPT_BLEND_MT"] = "1"
            os.environ["GPT_BLEND_TPB"] = str(tpb)
            os.environ["GPT_KCHUNK_X_MT"] = str(kx)

        def loss(xyz, scal, rot, op, shs):
            out = R.render(
                xyz, scal, rot, op, shs, cam, W, H, jnp.zeros(3),
                sh_degree=3, capacity_multiplier=mult, need_tidx=False,
            )
            return jnp.mean(jnp.abs(out["render"] - 0.5)), (
                out["n_dropped"], out["render"])

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)

        def chained(xyz, scal, rot, op, shs):
            def body(i, carry):
                op_c, acc, nd_c = carry
                (l, (nd, _)), grads = vg(xyz, scal, rot, op_c, shs)
                return (op_c + 1e-38 * jnp.mean(grads[3]), acc + l,
                        jnp.maximum(nd_c, nd))

            _, acc, nd = jax.lax.fori_loop(
                0, REPS, body, (op, jnp.float32(0.0), jnp.int32(0))
            )
            return acc, nd

        f = jax.jit(chained)
        t0 = time.time()
        try:
            l, nd = f(xyz, scal, rot, op, shs)
            _ = float(l)
        except Exception as e:
            print(f"tpb={tpb} kx={kx}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            l, nd = f(xyz, scal, rot, op, shs)
            _ = float(l)
        ms = (time.time() - t0) / (args.iters * REPS) * 1000

        # forward-image parity: baseline is the CLASSIC config only
        (l1, (nd1, img)), _ = vg(xyz, scal, rot, op, shs)
        img = np.asarray(img)
        if tpb == 0:
            ref_img = img
            parity = 0.0
        elif ref_img is not None:
            parity = float(np.max(np.abs(img - ref_img)))
        else:
            parity = None  # classic config absent/failed: no baseline
        row = {"tpb": tpb, "kx": kx, "ms": round(ms, 2),
               "n_dropped": int(nd), "compile_s": round(compile_s, 1),
               "fwd_max_abs_vs_classic": parity}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\nSUMMARY")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
