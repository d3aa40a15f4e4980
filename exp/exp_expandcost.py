"""Isolate the new stream-fwd stages: compact sort, searchsorted, expand
kernel, final sort. Production shape (200k, 800x800, capacity 2M)."""
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
from gaussianprediction_tpu.ops import expand_pallas as EXP
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
    num_tiles = grid_x * grid_y
    capacity = 10 * N
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    depth, tiles_min, tiles_max = proj.depth, proj.tiles_min, proj.tiles_max
    visible = proj.visible

    def chained(stage_fn):
        def run(f0):
            def body(i, carry):
                f, acc = carry
                l = stage_fn(f)
                return f + 1e-38 * l, acc + l
            _, acc = jax.lax.fori_loop(0, REPS, body, (f0, jnp.float32(0.0)))
            return acc
        return run

    B, Wc = EXP.BSLOT, EXP.WCAND
    cap512 = ((capacity + B - 1) // B) * B
    qmax = max((N - 1) // Wc, 0)
    Np = (qmax + 2) * Wc
    pad = Np - N
    nb = cap512 // B

    def prep(f):
        center_px = f[:, 0:2]
        x0c, y0c, rw0, rh0 = IS._capped_rect(
            tiles_min, tiles_max, center_px, 1024)
        rw = jnp.where(visible, rw0, 0)
        rh = jnp.where(visible, rh0, 0)
        gidx = jnp.arange(N, dtype=jnp.int32)
        zerokey = (rw * rh == 0).astype(jnp.int32)
        srt = jax.lax.sort(
            (zerokey, depth,
             f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4],
             f[:, 5], f[:, 6], f[:, 7], f[:, 8],
             x0c.astype(jnp.float32), y0c.astype(jnp.float32),
             rw.astype(jnp.float32), rh.astype(jnp.float32), gidx),
            num_keys=2, is_stable=True)
        depth_s = srt[1]
        x0f, y0f, rwf, rhf = srt[11:15]
        gid_s = srt[15]
        count = (rwf * rhf).astype(jnp.int32)
        offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
        total = offsets[-1] + count[-1]
        offs_row = jnp.concatenate(
            [offsets, jnp.full((pad,), EXP.HUGE, jnp.int32)])[None, :]
        permat = jnp.stack(
            srt[2:11] + (depth_s, offsets.astype(jnp.float32), x0f, y0f,
                         rwf, gid_s.astype(jnp.float32),
                         jnp.zeros_like(depth_s)), axis=0)
        permat = jnp.concatenate(
            [permat, jnp.zeros((16, pad), jnp.float32)], axis=1)
        return offs_row, permat, total

    def s1(f):
        offs_row, permat, total = prep(f)
        return (jnp.sum(permat[:, ::13]) + jnp.sum(offs_row[0, ::7])
                + total.astype(jnp.float32))

    t1 = timed("S1 compact sort + permat", chained(s1), feat)

    def s2(f):
        offs_row, permat, total = prep(f)
        block_starts = jnp.arange(nb, dtype=jnp.int32) * B
        g0 = jnp.maximum(jnp.searchsorted(
            offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
        starts_q = g0 // Wc
        return (jnp.sum(permat[:, ::13]) + jnp.sum(starts_q[::5])
                + total.astype(jnp.float32))

    t2 = timed("S2 +searchsorted", chained(s2), feat)

    def s3(f):
        offs_row, permat, total = prep(f)
        block_starts = jnp.arange(nb, dtype=jnp.int32) * B
        g0 = jnp.maximum(jnp.searchsorted(
            offs_row[0], block_starts, side="right").astype(jnp.int32) - 1, 0)
        starts_q = g0 // Wc
        inst_soa = EXP.expand_rows(
            permat, offs_row, starts_q, jnp.minimum(total, capacity)[None],
            cap512, grid_x, int(num_tiles), interpret=False)
        return jnp.sum(inst_soa[:, ::997])

    t3 = timed("S3 +expand kernel", chained(s3), feat)
    print(f"  searchsorted = {t2 - t1:.2f} ms; expand kernel = "
          f"{t3 - t2:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
