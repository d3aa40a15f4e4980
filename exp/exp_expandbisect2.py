"""Second expand-kernel bisect, on the REAL (unrolled) kernel structure via
GPT_EXPAND_ABLATE trace-time knobs — exp_expandbisect's hand-copied variants
drifted from production (and OOM'd VMEM). All variants share one process so
run-to-run tunnel variance cancels.

  X0 full            production path
  X1 noemit          no rect walk / masking (E0-bisect equivalent)
  X2 1pass           emit tail but ONE matmul pass instead of 3
  X3 nomm            one-hot built, no selection matmuls
  X4 nooh            windows + write only
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
from gaussianprediction_tpu.ops import expand_pallas
from gaussianprediction_tpu.ops import instance_stream as IS
from gaussianprediction_tpu.ops import projection as PJ
from gaussianprediction_tpu.ops.rasterize_pallas import CHUNK

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
    g = random_gaussians(N, seed=42, scale_range=(-5.2, -3.8))
    cam = orbit_camera(0.5, width=W, height=H, uid=0).to_device_dict()
    xyz = jnp.asarray(g["xyz"])
    scal = jnp.exp(jnp.asarray(g["log_scales"]))
    rot = jnp.asarray(g["rotation"])
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jnp.asarray(
        (1 / (1 + np.exp(-g["opacity_logit"]))).reshape(-1).astype(np.float32)
    )
    proj = PJ.project_from_params(xyz, scal, rot, cam, W, H, opacity=op)
    grid_x = (W + 15) // 16
    num_tiles = grid_x * ((H + 15) // 16)
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    x0c, y0c, rw0, rh0 = IS._capped_rect(
        proj.tiles_min, proj.tiles_max, feat[:, 0:2], 1024)
    rw = jnp.where(proj.visible, rw0, 0)
    rh = jnp.where(proj.visible, rh0, 0)
    gidx = jnp.arange(N, dtype=jnp.int32)
    n_total = int(jnp.sum(jnp.maximum(rw * rh, 1)))
    mult = max(2, -(-int(n_total * 1.2) // N))
    capacity = ((mult * N + CHUNK - 1) // CHUNK) * CHUNK
    print(f"n_total={n_total} mult={mult} capacity={capacity}", flush=True)

    B, WC = expand_pallas.BSLOT, expand_pallas.WCAND
    S = expand_pallas.ALIGN
    cap512 = ((capacity + S - 1) // S) * S
    STK = expand_pallas.STK_BLK
    Np = ((N + 2 * WC + STK - 1) // STK) * STK
    pad = Np - N
    padf = jnp.zeros((pad,), jnp.float32)
    count1 = jnp.maximum(rw * rh, 1)
    offsets = (jnp.cumsum(count1) - count1).astype(jnp.int32)
    total1 = offsets[-1] + count1[-1]
    offs_row = jnp.concatenate(
        [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)])[None, :]
    featT0 = jnp.pad(feat.T, ((0, 0), (0, pad)))
    permat0 = expand_pallas.stack_rows(
        [featT0[c] for c in range(10)]
        + [jnp.concatenate([offsets.astype(jnp.float32), padf]),
           jnp.concatenate([x0c.astype(jnp.float32), padf]),
           jnp.concatenate([y0c.astype(jnp.float32), padf]),
           jnp.concatenate([rw.astype(jnp.float32), padf]),
           jnp.concatenate([gidx.astype(jnp.float32), padf])],
        nch=16, interpret=False)
    nb = cap512 // B
    block_starts = jnp.arange(nb, dtype=jnp.int32) * B
    g0 = jnp.maximum(jnp.searchsorted(
        offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
    starts_q = g0 // WC
    totc = jnp.minimum(total1, capacity)[None]

    def u2(permat):
        soa = expand_pallas.expand_rows(
            permat, offs_row, starts_q, totc, cap512, grid_x,
            int(num_tiles), interpret=False)
        return jnp.sum(soa[:, ::29])

    for tag, ab in [("X0 full", ""), ("X1 noemit", "noemit"),
                    ("X2 1pass", "1pass"), ("X3 nomm", "nomm"),
                    ("X4 nooh", "nooh")]:
        os.environ["GPT_EXPAND_ABLATE"] = ab
        timed(tag, chain(u2), permat0)
    os.environ["GPT_EXPAND_ABLATE"] = ""


if __name__ == "__main__":
    main()
