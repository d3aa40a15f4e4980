#!/usr/bin/env python
"""Rasterizer throughput benchmark (driver entry: prints ONE JSON line).

Measures differentiable-render fwd+bwd throughput in rays/s on the headline
workload (BASELINE.md: "Rasterize fwd+bwd rays/s per chip"): a 200k-Gaussian
cloud at 800x800 — the reference's production scale (max_gaussian_size,
/root/reference/options/gaussian_option.py:47; D-NeRF frames are 800x800).

vs_baseline compares against 30 Mrays/s, the fwd+bwd throughput class of
the reference CUDA pipeline on its published hardware tier (3DGS-family
training steps run ~20 ms/iter at 800x800x200k on an RTX 3090; the
reference repo itself publishes no numbers — BASELINE.md).

Timing forces a host sync per iteration (device->host scalar fetch):
`block_until_ready` through the tunneled-TPU plugin returns at enqueue
time, not completion.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_S = 30e6


def _guard_wedged_tunnel():
    """A killed TPU process can wedge the axon pool lease, after which
    every jax.devices() call blocks forever (NOTES.md round-2). Probe
    device discovery in a subprocess with a timeout; if it hangs, re-exec
    on pure CPU (skipping plugin registration) so the bench always
    terminates with a JSON line."""
    if os.environ.get("GPT_BENCH_NO_PROBE") == "1":
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no tunnel configured; nothing to wedge
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=300, capture_output=True,
        )
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["GPT_BENCH_NO_PROBE"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    _guard_wedged_tunnel()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprediction_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians,
    )
    from gaussianprediction_tpu.ops import rasterize as R

    on_accel = any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    )
    if on_accel:
        W = H = 800
        N = 200_000
        interpret = False
        iters = 4
    else:  # CPU fallback (interpret mode): tiny proof-of-life shapes
        W = H = 64
        N = 1000
        interpret = True
        iters = 2

    g = random_gaussians(N, seed=42, scale_range=(-5.2, -3.8))
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    xyz = jnp.asarray(g["xyz"])
    scal = jnp.exp(jnp.asarray(g["log_scales"]))
    rot = jnp.asarray(g["rotation"])
    op = jnp.asarray(
        (1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1).astype(np.float32)
    )
    K = 16
    shs = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, 3, K)).astype(np.float32)
        * 0.2
    )

    # Size the static instance buffer to THIS workload before compiling the
    # measured step: every instance-stream cost (the value-carrying sorts,
    # the expand kernel, the blend segments' padding) scales with the
    # static capacity, and production runs size capacity per scene the same
    # way (Trainer warns + callers re-jit on overflow). The probe is a tiny
    # projection-only jit: n_total = sum of capped tile-rect areas.
    from gaussianprediction_tpu.ops.instance_stream import probe_slot_need

    def probe_total(xyz, scal, rot):
        return probe_slot_need(xyz, scal, rot, op, cam, W, H)

    n_probe = int(jax.jit(probe_total)(xyz, scal, rot))
    mult = max(2, -(-int(n_probe * 1.2) // N))

    def loss(xyz, scal, rot, op, shs):
        out = R.render(
            xyz, scal, rot, op, shs, cam, W, H, jnp.zeros(3), sh_degree=3,
            capacity_multiplier=mult, interpret=interpret,
            need_tidx=False,  # training-path render: tidx is eval-only
        )
        return jnp.mean(jnp.abs(out["render"] - 0.5)), (
            out["n_dropped"], out["n_instances"])

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)

    # REPS chained fwd+bwd renders per device call: the tunneled-TPU
    # dispatch costs ~50-100 ms per call, which would dominate a per-call
    # measurement. Each rep feeds a denormal-scaled gradient statistic back
    # into the opacity so XLA cannot hoist or elide any iteration (the
    # perturbation underflows to zero arithmetic change).
    REPS = 8 if not interpret else 1

    def chained(xyz, scal, rot, op, shs):
        def body(i, carry):
            op_c, acc, nd_c, ni_c = carry
            (l, (nd, ni)), grads = vg(xyz, scal, rot, op_c, shs)
            dep = 1e-38 * jnp.mean(grads[3])
            return (op_c + dep, acc + l, jnp.maximum(nd_c, nd),
                    jnp.maximum(ni_c, ni))

        _, acc, nd, ni = jax.lax.fori_loop(
            0, REPS, body, (op, jnp.float32(0.0), jnp.int32(0),
                            jnp.int32(0))
        )
        return acc, nd, ni

    bench_fn = jax.jit(chained)

    # compile + warmup (forced host sync)
    l, nd, ni = bench_fn(xyz, scal, rot, op, shs)
    _ = float(l)
    n_dropped = int(nd)
    n_instances = int(ni)
    # the probe sizes capacity >= 1.2 * n_total, which must guarantee an
    # exact (drop-free) render — a dropped instance would make the timed
    # workload smaller than the nominal one (ADVICE r2)
    assert n_dropped == 0, (
        f"probe-sized capacity dropped {n_dropped} instances "
        f"(mult={mult}, n_instances={n_instances})"
    )

    t0 = time.time()
    for _ in range(iters):
        l, nd, ni = bench_fn(xyz, scal, rot, op, shs)
        _ = float(l)  # host sync
    dt = (time.time() - t0) / (iters * REPS)
    rays_per_s = W * H / dt

    # render-only (fwd, no grad) throughput — the reference reports eval
    # FPS around bare renders (/root/reference/eval.py:210-215,222-224)
    def chained_fwd(xyz, scal, rot, op, shs):
        def body(i, carry):
            op_c, acc = carry
            out = R.render(
                xyz, scal, rot, op_c, shs, cam, W, H, jnp.zeros(3),
                sh_degree=3, capacity_multiplier=mult, interpret=interpret,
                need_tidx=False,
            )
            l = jnp.mean(out["render"])
            return op_c + 1e-38 * l, acc + l

        _, acc = jax.lax.fori_loop(0, REPS, body, (op, jnp.float32(0.0)))
        return acc

    fwd_fn = jax.jit(chained_fwd)
    _ = float(fwd_fn(xyz, scal, rot, op, shs))
    t0 = time.time()
    for _ in range(iters):
        _ = float(fwd_fn(xyz, scal, rot, op, shs))
    dt_fwd = (time.time() - t0) / (iters * REPS)
    fwd_rays_per_s = W * H / dt_fwd

    result = {
        "metric": "rasterize_fwd_bwd_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "detail": {
            "width": W, "height": H, "n_gaussians": N,
            "ms_per_iter": round(dt * 1000, 2),
            "fwd_only_rays_per_s": round(fwd_rays_per_s, 1),
            "fwd_only_ms": round(dt_fwd * 1000, 2),
            "fwd_only_fps": round(1.0 / dt_fwd, 2),
            "n_dropped": n_dropped,
            "capacity_multiplier": mult,
            "n_instances": n_instances,
            "platform": jax.devices()[0].platform,
            "note": "fwd+bwd through the full differentiable render "
                    "(projection+SH+binning+Pallas blend); 8 chained "
                    "renders per device call, host-synced per call",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
