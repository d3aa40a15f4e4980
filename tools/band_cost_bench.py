#!/usr/bin/env python
"""Single-chip band-cost benchmark: the honest structural scaling number.

The cpu-virtual scaling bench shares one machine's cores across all virtual
devices, so its wall-clock "efficiency" conflates sharding structure with
serialized execution (it can never exceed 1/n even for perfect structure).
This tool instead measures, on the ONE real chip, the fwd+bwd cost of
rendering a 1/n tile-row band with band-proportional capacity — exactly the
per-device work of the ('data','tile') sharded step minus collectives — and
reports the PROJECTED n-device efficiency

    eff(n) = t_full / (n * t_band(n))

which exposes every non-band-proportional term (projection, deform,
N-proportional sorts, fixed kernel overheads). ICI collective cost is NOT
included (needs a real slice); BASELINE's >=85% stays the hardware-day
target, this bounds the structure from above.

Usage: python tools/band_cost_bench.py [--n 200000] [--wh 800]
Writes BANDCOST.json next to --out.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exp/logs/BANDCOST.json")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--bands", default="1,2,4,8")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--reps", type=int, default=8)
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
    from gaussianprediction_tpu.ops.projection import TILE

    W = H = args.wh
    N = args.n
    REPS = args.reps
    grid_y = (H + TILE - 1) // TILE

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
    mult_full = max(2.0, n_probe * 1.2 / N)
    print(f"probe: {n_probe} instances, full-frame mult {mult_full:.2f}",
          flush=True)

    def probe_band(xyz, scal, rot, ty0, band):
        return probe_slot_need(xyz, scal, rot, op, cam, W, H,
                               tile_band=(ty0, band))

    probe_band_j = jax.jit(probe_band, static_argnums=(4,))

    results = []
    t_full = None
    for n_dev in [int(x) for x in args.bands.split(",")]:
        band = -(-grid_y // n_dev)
        if n_dev == 1:
            mult = mult_full
        else:
            # per-band capacity probe (VERDICT r4 #4): size the shard's
            # instance buffer from the MAX band's actual clipped-rect
            # need (uniform across devices — shard_map compiles one
            # program), not a slack-scaled full-frame fraction. The >= 1
            # singleton slot per Gaussian keeps an N-row floor.
            needs = [int(probe_band_j(xyz, scal, rot,
                                      jnp.int32(i * band), band))
                     for i in range(n_dev)]
            mult = max(needs) * 1.2 / N
            print(f"  bands={n_dev}: per-band needs {needs} -> "
                  f"mult {mult:.2f}", flush=True)
        tb = None if n_dev == 1 else (jnp.int32(0), band)

        def loss(xyz, scal, rot, op, shs):
            out = R.render(
                xyz, scal, rot, op, shs, cam, W, H, jnp.zeros(3),
                sh_degree=3, capacity_multiplier=mult, need_tidx=False,
                tile_band=tb,
            )
            return jnp.mean(jnp.abs(out["render"] - 0.5)), (
                out["n_dropped"], out["n_instances"])

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)

        def chained(xyz, scal, rot, op, shs):
            def body(i, carry):
                op_c, acc, nd_c = carry
                (l, (nd, ni)), grads = vg(xyz, scal, rot, op_c, shs)
                return (op_c + 1e-38 * jnp.mean(grads[3]), acc + l,
                        jnp.maximum(nd_c, nd))
            _, acc, nd = jax.lax.fori_loop(
                0, REPS, body, (op, jnp.float32(0.0), jnp.int32(0)))
            return acc, nd

        f = jax.jit(chained)
        t0 = time.time()
        l, nd = f(xyz, scal, rot, op, shs)
        _ = float(l)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            l, nd = f(xyz, scal, rot, op, shs)
            _ = float(l)
        ms = (time.time() - t0) / (args.iters * REPS) * 1000
        if t_full is None:
            t_full = ms
        eff = t_full / (n_dev * ms)
        row = {"n_bands": n_dev, "band_rows": band,
               "capacity_multiplier": round(float(mult), 2),
               "ms_per_iter": round(ms, 2), "n_dropped": int(nd),
               "projected_efficiency": round(eff, 3),
               "compile_s": round(compile_s, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "workload": {"width": W, "height": H, "n_gaussians": N,
                     "what": "fwd+bwd render of a 1/n tile-row band with "
                             "band-proportional capacity on ONE real chip"},
        "platform": jax.devices()[0].platform,
        "note": "projected structure-only efficiency (no ICI collectives)",
        "points": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
