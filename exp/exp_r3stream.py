"""Round-3 stream A/Bs at the BENCH shape (200k, 800x800, probe-sized
capacity ~1.2M) — each candidate redesign measured in isolation:

  A1: current 16-op depth sort (2 keys + 14 values)        [T1 baseline]
  A2: 3-op depth sort (zerokey, depth, idx) + [N,13] random row gather
  A3: [N,13] random row gather alone (the A2 delta term)
  B1: current 12-op 1-key tile sort (stable) @cap+TC
  B2: 12-op 2-key tile sort (key, depth) — would let the pipeline skip
      pre-sorting gaussians by depth if ever useful
  B3: 3-op tile sort (key, slotid, z) + [P,16] random row gather
  C1: bwd 11-op gid sort @Pp
  C2: 10 serial 1-D cumsums + boundary gathers @Pp
  C3: one [16,Pp] lane-axis cumsum (batched) @Pp
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
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    colors = jnp.ones((N, 3), jnp.float32) * 0.5
    feat = jnp.concatenate(
        [proj.mean2d, proj.conic, op[:, None], colors,
         proj.depth[:, None]], axis=1,
    )
    depth, tiles_min, tiles_max = proj.depth, proj.tiles_min, proj.tiles_max
    visible = proj.visible
    x0c, y0c, rw0, rh0 = IS._capped_rect(tiles_min, tiles_max,
                                         feat[:, 0:2], 1024)
    rw = jnp.where(visible, rw0, 0)
    rh = jnp.where(visible, rh0, 0)
    n_total = int(jnp.sum(rw * rh))
    mult = max(2, -(-int(n_total * 1.2) // N))
    capacity = ((mult * N + CHUNK - 1) // CHUNK) * CHUNK
    print(f"n_total={n_total} mult={mult} capacity={capacity}", flush=True)
    gidx = jnp.arange(N, dtype=jnp.int32)
    zerokey = (rw * rh == 0).astype(jnp.int32)

    # ---- A: depth sort variants -----------------------------------------
    def a1(feat):
        srt = jax.lax.sort(
            (zerokey, depth,
             feat[:, 0], feat[:, 1], feat[:, 2], feat[:, 3], feat[:, 4],
             feat[:, 5], feat[:, 6], feat[:, 7], feat[:, 8],
             x0c.astype(jnp.float32), y0c.astype(jnp.float32),
             rw.astype(jnp.float32), rh.astype(jnp.float32), gidx),
            num_keys=2, is_stable=True)
        return sum(jnp.sum(s[::13].astype(jnp.float32)) for s in srt)

    timed("A1 16-op depth sort", chain(a1), feat)

    wide = jnp.concatenate(
        [feat, x0c.astype(jnp.float32)[:, None],
         y0c.astype(jnp.float32)[:, None],
         rw.astype(jnp.float32)[:, None],
         rh.astype(jnp.float32)[:, None]], axis=1)   # [N, 14]

    def a2(wide):
        srt = jax.lax.sort((zerokey, depth, gidx), num_keys=2,
                           is_stable=True)
        perm = srt[2]
        rows = wide[perm]
        return jnp.sum(rows[::13]) + jnp.sum(srt[1][::17])

    timed("A2 3-op sort + [N,14] gather", chain(a2), wide)

    perm_fixed = jax.lax.sort((zerokey, depth, gidx), num_keys=2,
                              is_stable=True)[2]

    def a3(wide):
        return jnp.sum(wide[perm_fixed][::13])

    timed("A3 [N,14] random row gather alone", chain(a3), wide)

    # ---- B: tile sort variants ------------------------------------------
    Pp = capacity + num_tiles * CHUNK
    ILV = expand_pallas.ILV_BLK
    Pp = ((Pp + ILV - 1) // ILV) * ILV
    rng = np.random.default_rng(0)
    key_r = jnp.asarray(
        np.sort(rng.integers(0, num_tiles + 1, Pp)).astype(np.int32)
    )
    key_shuf = jnp.asarray(rng.permutation(np.asarray(key_r)))
    chans11 = [jnp.asarray(rng.normal(size=Pp).astype(np.float32))
               for _ in range(11)]

    def b1(c0):
        s = jax.lax.sort((key_shuf, c0) + tuple(chans11[1:]), num_keys=1,
                         is_stable=True)
        return sum(jnp.sum(x[::29].astype(jnp.float32)) for x in s[:3])

    timed("B1 12-op 1-key tile sort", chain(b1), chans11[0])

    def b2(c0):
        s = jax.lax.sort((key_shuf, c0) + tuple(chans11[1:]), num_keys=2,
                         is_stable=True)
        return sum(jnp.sum(x[::29].astype(jnp.float32)) for x in s[:3])

    timed("B2 12-op 2-key tile sort", chain(b2), chans11[0])

    slotid = jnp.arange(Pp, dtype=jnp.int32)
    mat16 = jnp.stack(chans11 + chans11[:5], axis=1)  # [Pp, 16]

    def b3(c0):
        s = jax.lax.sort((key_shuf, slotid, c0), num_keys=1, is_stable=True)
        rows = mat16[s[1]]
        return jnp.sum(rows[::31]) + jnp.sum(s[2][::37])

    timed("B3 3-op sort + [P,16] gather", chain(b3), chans11[0])

    # ---- C: bwd reduction variants --------------------------------------
    gid_r = jnp.asarray(
        rng.integers(-1, N, Pp).astype(np.int32)
    )

    def c1(c0):
        s = jax.lax.sort((gid_r, c0) + tuple(chans11[1:]), num_keys=1,
                         is_stable=True)
        return sum(jnp.sum(x[::29].astype(jnp.float32)) for x in s[:3])

    timed("C1 bwd 11-op gid sort", chain(c1), chans11[0])

    ends = jnp.sort(jnp.asarray(rng.integers(0, Pp, N).astype(jnp.int32)))
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])

    def c2(c0):
        cols = []
        zero1 = jnp.zeros((1,), jnp.float32)
        for c in range(10):
            src = c0 if c == 0 else chans11[c]
            cs = jnp.concatenate([zero1, jnp.cumsum(src)])
            cols.append(cs[ends] - cs[starts])
        return jnp.sum(jnp.stack(cols, axis=1)[::17])

    timed("C2 10 serial cumsums + boundary gathers", chain(c2), chans11[0])

    def c3(c0):
        # interleave takes exactly 11 channels: 10 cotangents + gid
        mat = expand_pallas.interleave_rows(
            (c0,) + tuple(chans11[1:10]) + (gid_r.astype(jnp.float32),))
        cs = jnp.cumsum(mat, axis=1)
        e1 = jnp.maximum(ends - 1, 0)
        cols = [cs[c][e1] for c in range(10)]
        return jnp.sum(jnp.stack(cols, axis=1)[::17])

    timed("C3 [16,Pp] lane-axis batched cumsum", chain(c3), chans11[0])


if __name__ == "__main__":
    main()
