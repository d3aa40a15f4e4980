"""Fused, scatter-free instance-stream construction (fast binning + packing).

The performance-critical replacement for bin_gaussians + the packing gather
in the render path. Motivation (measured on TPU v5e, 200k Gaussians /
800x800, see git history): XLA TPU scatters and random gathers cost
50-70 ms per call while `lax.sort` CARRYING VALUES is ~1-3 ms and cumsums/
monotone row-gathers are a few ms. So the whole binning+packing pipeline is
re-expressed around one value-carrying sort:

1. NO per-Gaussian sort at all (round 3): the expand kernel's candidate-
   window invariant (<= 129 candidates per 128-slot block) only needs
   every candidate to own >= 1 slot, so zero-count Gaussians are given ONE
   sentinel-keyed singleton slot instead of being compacted away — permat
   is assembled in ORIGINAL order by the Pallas stack kernel, and the
   16-operand depth sort (6.6 ms at 200k, exp_r3stream A1) disappears.
   Depth ordering moves into the tile sort as a second key (measured
   +0.26 ms, exp_r3stream B2-B1); sentinel singletons sort harmlessly past
   every tile segment;
2. rect capping (to <= K tiles, expressible as a sub-rect) and instance
   counts/offsets by cumsum (offsets strictly increasing — every Gaussian
   owns >= 1 slot);
3. slot->Gaussian expansion + per-slot tile keys via the Pallas one-hot-
   matmul kernel (ops/expand_pallas.py) — no scatter, no gather; emits the
   [16, P] channel-major SoA directly (empty Gaussians' singletons emit
   gid -1 / sentinel key);
4. per-tile counts via ONE MXU contraction: rects are separable, so the
   count grid is Rᵀ @ C over the per-Gaussian 0/1 row/column tile-interval
   indicators (exact in bf16 with f32 accumulation; round 3 — replaces
   the sort-based corner-difference histogram, itself a replacement for
   collision-bound scatter-adds). Segment starts are the plain cumsum
   (UNALIGNED, round 3: the blend kernels stream CHUNK-aligned windows
   and lane-mask neighbour tiles' instances, so the per-tile dummy
   padding rows — and their T*CHUNK extra rows through the tile sort —
   no longer exist);
5. one stable 2-key lax.sort by (tile id, depth) carrying the other 10
   live channels (contiguous rows of the kernel's SoA output); within a
   tile, equal depths keep original-index order — identical to the
   oracle's stable depth argsort.

The custom VJP avoids the 65 ms scatter-add that plain AD of a packing
gather would emit: gradients are reduced per-Gaussian by sorting the
per-instance cotangents by gaussian id (free) and taking boundary
differences of a cumulative sum (the sorted-run reduction); slot order is
original-Gaussian order, so the per-id counts need no inverse permutation.

Capacity overflow policy: per-Gaussian footprints are capped to a sub-rect
of <= max_tiles tiles; if total instances still exceed capacity the
trailing (highest-original-index) instances are dropped AND the corner histogram
over-counts — `n_dropped` flags this so callers resize capacity (render
asserts in tests; production configs are sized for zero drops).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianprediction_tpu.ops import expand_pallas
from gaussianprediction_tpu.ops.projection import TILE, Projected
from gaussianprediction_tpu.ops.rasterize_pallas import CHUNK, NCH

C_GID_ROW = 10  # row index of the gid channel in the [16, P] SoA


def _cummax(x):
    """Log-step running max (lax.cummax lowers ~1000x slower on TPU)."""
    n = x.shape[0]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.full((s,), jnp.iinfo(x.dtype).min
                      if jnp.issubdtype(x.dtype, jnp.integer)
                      else -jnp.inf, x.dtype), x[:-s]]
        )
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _ellipse_cull_on() -> bool:
    """GPT_ELLIPSE_CULL=1 drops (instance, tile) pairs that can NEVER
    contribute (round 5): the blend kernel skips any instance whose alpha
    at a pixel is < 1/255 (ALPHA_MIN), so an instance whose MAXIMUM alpha
    over its tile's pixel box is < 1/255 is dead weight — it still costs
    blend lanes and chunk iterations. Rect binning keeps such pairs
    because a tile in the rect's corner can lie entirely outside the
    ellipse support. The test is CONSERVATIVE (continuous-box maximum
    >= pixel-grid maximum, plus a margin dwarfing f32 rounding), so
    culling is result-exact: bit-identical renders and gradients.
    Read at trace time.

    Default OFF: at the 200k/800² bench the cull removes 14% of
    instances but only ~0.6 ms (the small splats fill their rects and
    the blend's early-exit had already skipped much of the tail); its
    real payoff is big-splat workloads (early training / stage 0).
    Opt in per run — a flipped default would also invalidate every
    compile-cache entry of the render graph."""
    return os.environ.get("GPT_ELLIPSE_CULL", "0") == "1"


def _cull_weak_key(inst_soa, key, grid_x: int, sentinel):
    """Re-key never-contributing instances to the sentinel tile.

    Qmin = min over the tile's continuous pixel box of the exponent
    quadratic Q(d) = 0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2 (alpha =
    op*exp(-Q)); keep iff op*exp(-Qmin) could reach ALPHA_MIN. For the
    PSD conic the box-min is 0 when the mean lies inside, else it lies on
    one of the four edges, each a closed-form 1-D quadratic min."""
    mx, my = inst_soa[0], inst_soa[1]
    ca, cb, cc = inst_soa[2], inst_soa[3], inst_soa[4]
    op = inst_soa[5]
    tile = key
    ty = tile // grid_x
    tx = tile - ty * grid_x
    u0 = tx.astype(jnp.float32) * TILE - mx          # dx range [u0, u1]
    u1 = u0 + (TILE - 1)
    v0 = ty.astype(jnp.float32) * TILE - my
    v1 = v0 + (TILE - 1)
    inside = (u0 <= 0) & (u1 >= 0) & (v0 <= 0) & (v1 >= 0)
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def edge_x(X):
        dy = jnp.clip(-cb * X / cc_s, v0, v1)
        return 0.5 * cc * dy * dy + cb * X * dy + 0.5 * ca * X * X

    def edge_y(Y):
        dx = jnp.clip(-cb * Y / ca_s, u0, u1)
        return 0.5 * ca * dx * dx + cb * Y * dx + 0.5 * cc * Y * Y

    qmin = jnp.minimum(
        jnp.minimum(edge_x(u0), edge_x(u1)),
        jnp.minimum(edge_y(v0), edge_y(v1)),
    )
    qmin = jnp.where(inside, 0.0, qmin)
    # keep iff op*exp(-qmin) >= ALPHA_MIN, in log domain with a margin
    # (1e-3 in the exponent ~ 0.1% alpha) dwarfing f32 rounding skew
    thresh = jnp.log(jnp.maximum(op, 1e-12) * 255.0) + 1e-3
    keep = (key < sentinel) & (qmin <= thresh)
    return jnp.where(keep, key, sentinel)


class InstanceStream(NamedTuple):
    inst: jnp.ndarray        # [16, P'] packed sorted instance SoA
    tile_start: jnp.ndarray  # [T]
    tile_end: jnp.ndarray    # [T]
    n_dropped: jnp.ndarray   # [] int32
    n_total: jnp.ndarray     # [] int32 pre-drop SLOT count — real instances
                             # plus one sentinel singleton per empty Gaussian
                             # (capacity sizing signal: callers tune
                             # capacity_multiplier to keep n_total <=
                             # capacity with slack)


def _capped_rect(tmin, tmax, center_px, max_tiles: int):
    """Cap a tile rect to <= max_tiles tiles while staying a rect (required
    so counts remain corner-histogram-able), CENTERED on the projected mean
    pixel: the round-1 top-left sub-rect silently biased large splats
    toward their upper-left (VERDICT r1 weak #4). Uncapped rects come back
    unchanged (the clip bounds collapse to tmin)."""
    rw = jnp.maximum(tmax[:, 0] - tmin[:, 0], 0)
    rh = jnp.maximum(tmax[:, 1] - tmin[:, 1], 0)
    rw_c = jnp.minimum(rw, max_tiles)
    rh_c = jnp.minimum(rh, jnp.maximum(max_tiles // jnp.maximum(rw_c, 1), 1))
    rh_c = jnp.where(rw > 0, rh_c, 0)
    ctx = (center_px[:, 0] / TILE).astype(jnp.int32)
    cty = (center_px[:, 1] / TILE).astype(jnp.int32)
    x0 = jnp.clip(ctx - rw_c // 2, tmin[:, 0], tmax[:, 0] - rw_c)
    y0 = jnp.clip(cty - rh_c // 2, tmin[:, 1], tmax[:, 1] - rh_c)
    return x0, y0, rw_c, rh_c


def probe_slot_need(xyz, scaling, rotation, opacity, cam, width: int,
                    height: int, alive=None, max_tiles: int = 1024,
                    tile_band=None):
    """Projection-only instance-slot count for ONE camera: the number of
    stream slots build_instances would emit (capped exact-support rects,
    plus the >= 1 sentinel singleton every Gaussian owns). The single
    source of truth for capacity sizing — used by Trainer._auto_capacity
    and every bench/tool that probe-sizes the instance buffer (keep them
    identical or bench-vs-training cost comparisons break).

    scaling/opacity must be ACTIVATED; rotation may be unnormalized."""
    from gaussianprediction_tpu.ops import projection as PJ

    rot = rotation / jnp.maximum(
        jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
    )
    proj = PJ.project_from_params(
        xyz, scaling, rot, cam, width, height, alive=alive,
        opacity=opacity,
    )
    x0, y0, rw, rh = _capped_rect(
        proj.tiles_min, proj.tiles_max, proj.mean2d, max_tiles
    )
    if tile_band is not None:
        # band-sharded slot need (SURVEY §5.7): clip rect rows to the
        # band's tile-row interval — what a tile-band device actually
        # streams. The >= 1 singleton per Gaussian stays (the expand
        # kernel's candidate-window invariant requires it), which puts an
        # N-slot floor under every band's capacity.
        ty0, n_band = tile_band
        ty0 = jnp.asarray(ty0, jnp.int32)
        y1 = jnp.clip(y0, ty0, ty0 + n_band)
        y2 = jnp.clip(y0 + rh, ty0, ty0 + n_band)
        rh = jnp.maximum(y2 - y1, 0)
    rw = jnp.where(proj.visible, rw, 0)
    rh = jnp.where(proj.visible, rh, 0)
    return jnp.sum(jnp.maximum(rw * rh, 1))


def build_instances_fwd(feat, depth, tiles_min, tiles_max, visible,
                        grid_x: int, grid_y: int, capacity: int,
                        max_tiles: int, interpret=None):
    """feat: [N, 10] differentiable channels (mx,my,ca,cb,cc,op,r,g,b,z).

    CONTRACT: feat channel 9 (z, the C_Z packing slot) is the depth used
    for within-tile front-to-back ordering — it is the second tile-sort
    key. The `depth` argument is no longer consulted (retained for API
    stability; rasterize.py passes proj.depth in both places).

    Returns (InstanceStream, residuals for the VJP). The instance buffer
    is rounded up to the expand kernel's slot-block size."""
    N = feat.shape[0]
    num_tiles = grid_x * grid_y
    sentinel = jnp.int32(num_tiles)

    # feat rows 0/1 are the projected mean pixel by the packing convention
    # (C_MX/C_MY in rasterize_pallas) — used only to CENTER capped rects,
    # a discrete selection, so gradients must not flow through it
    center_px = jax.lax.stop_gradient(feat[:, 0:2])
    x0c, y0c, rw0, rh0 = _capped_rect(
        tiles_min, tiles_max, center_px, max_tiles
    )
    rw = jnp.where(visible, rw0, 0)
    rh = jnp.where(visible, rh0, 0)
    gidx = jnp.arange(N, dtype=jnp.int32)

    # 1. NO depth sort (see module docstring): give every Gaussian >= 1
    # slot so the expand windows stay bounded in ORIGINAL order; empty
    # Gaussians' singleton slots emit gid -1 / sentinel key in-kernel
    # (flagged by the real rw channel being 0).
    count = rw * rh                         # [N] real instance counts
    count1 = jnp.maximum(count, 1)
    offsets = (jnp.cumsum(count1) - count1).astype(jnp.int32)
    total1 = offsets[-1] + count1[-1]       # includes sentinel singletons
    total_real = jnp.sum(count)

    # 2-3. slot->Gaussian expansion via the Pallas one-hot-matmul kernel
    # (ops/expand_pallas.py): replaces the round-1 scatter-max + log-cummax
    # + [P,16] row gather (~21 ms) and emits channel-major SoA directly so
    # the tile sort's operands below are contiguous row slices.
    B, W = expand_pallas.BSLOT, expand_pallas.WCAND
    S = expand_pallas.ALIGN
    cap512 = ((capacity + S - 1) // S) * S
    # rounded up to the stack kernel's block so the [16, Np] permat is
    # assembled by the streaming Pallas stack (the XLA stack emitter costs
    # several ms at this shape); extra lanes carry HUGE offsets and are
    # never selected. >= 2*WCAND of padding reach past N keeps every
    # candidate window in bounds (expand_rows contract).
    STK = expand_pallas.STK_BLK
    Np = ((N + 2 * W + STK - 1) // STK) * STK
    pad = Np - N
    offs_row = jnp.concatenate(
        [offsets, jnp.full((pad,), expand_pallas.HUGE, jnp.int32)]
    )[None, :]
    padf = jnp.zeros((pad,), jnp.float32)

    def padded(ch):
        return jnp.concatenate([ch, padf])

    # ONE [N,10]->[10,N] transpose materializes contiguous channel rows:
    # feat[:, c] column slices would hand the stack kernel 10 strided
    # views (stride-10 reads of the row-major feat)
    featT = jnp.pad(feat.T, ((0, 0), (0, pad)))
    permat = expand_pallas.stack_rows(
        [featT[c] for c in range(10)]
        + [padded(offsets.astype(jnp.float32)),
           padded(x0c.astype(jnp.float32)), padded(y0c.astype(jnp.float32)),
           padded(rw.astype(jnp.float32)),
           padded(gidx.astype(jnp.float32))],
        nch=16, interpret=interpret,
    )  # [16, Np] channel-major, ORIGINAL order
    nb = cap512 // B
    block_starts = jnp.arange(nb, dtype=jnp.int32) * B
    g0 = jnp.maximum(
        jnp.searchsorted(
            offs_row[0], block_starts, side="right"
        ).astype(jnp.int32) - 1,
        0,
    )
    starts_q = g0 // W
    # the buffer is 512-aligned for the kernel's slot blocks, but the DROP
    # policy honours the requested capacity exactly: slots >= capacity are
    # invalid (sentinel keys) and sort harmlessly to the tail. The kernel
    # returns RAW selected rows; the rect-walk/masking emit runs as fused
    # XLA feeding the tile sort's operands directly (emit_from_raw).
    raw = expand_pallas.expand_rows_raw(
        permat, offs_row, starts_q,
        jnp.minimum(total1, capacity)[None], cap512, interpret=interpret,
    )  # [16, cap512] raw candidate rows
    inst_soa = expand_pallas.emit_from_raw(
        raw, jnp.minimum(total1, capacity), grid_x, int(num_tiles)
    )  # tuple: feat0..9, gid, key_f32
    key = inst_soa[11].astype(jnp.int32)
    cull = _ellipse_cull_on()
    if cull:
        key = _cull_weak_key(inst_soa, key, grid_x, sentinel)

    # 4. per-tile counts via ONE MXU contraction (round 3; replaces the
    # sort-based corner-difference histogram, 6.6 ms -> ~0.3 ms): each
    # capped rect is separable, so
    #   counts[ty, tx] = Σ_g row_g(ty) · col_g(tx)
    # with row/col the 0/1 tile-interval indicators — i.e. counts = Rᵀ @ C
    # for R [N, gy], C [N, gx]. The indicators are exact in bf16 and the
    # MXU accumulates in f32, which is exact for integer sums < 2^24.
    if not cull:
        tyv = jnp.arange(grid_y, dtype=jnp.int32)[None, :]
        txv = jnp.arange(grid_x, dtype=jnp.int32)[None, :]
        live = ((rw > 0) & (rh > 0))[:, None]
        Rind = (
            (y0c[:, None] <= tyv) & (tyv < (y0c + rh)[:, None]) & live
        ).astype(jnp.bfloat16)                          # [N, gy]
        Cind = (
            (x0c[:, None] <= txv) & (txv < (x0c + rw)[:, None])
        ).astype(jnp.bfloat16)                          # [N, gx]
        grid = jax.lax.dot_general(
            Rind, Cind, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [gy, gx]
        counts_t = grid.astype(jnp.int32).reshape(-1)   # [T]
    else:
        # culled keys break the separable-rect invariant the MXU
        # histogram needs; segment bounds come from a searchsorted over
        # the sorted keys instead (T*log(Pp) — cheaper than the matmul)
        counts_t = None

    # 5. (round 3) NO alignment dummies: the blend kernels accept UNALIGNED
    # segments (rasterize_pallas streams CHUNK-aligned windows and
    # lane-masks neighbour tiles' instances at the edges), so segment
    # starts are exactly the cumsum of the tile counts, and the tile sort
    # runs over the slot buffer alone — T*CHUNK (~320k at 800²) fewer rows
    # through the 12-operand sort, and the [T, CHUNK] dummy build + its
    # concatenations disappear. Only the interleave kernel's lane-block
    # alignment still pads (< ILV_BLK sentinel-keyed rows).
    ILV = expand_pallas.ILV_BLK
    Pp = ((cap512 + ILV - 1) // ILV) * ILV
    pad_extra = Pp - cap512
    d_key = jnp.full((pad_extra,), sentinel, jnp.int32)
    d_zero = jnp.zeros((pad_extra,), jnp.float32)

    # 6. ONE stable 2-KEY sort by (tile id, depth) CARRYING the other 10
    # channels as sort values — the second key replaces the retired
    # per-Gaussian depth sort (exp_r3stream: +0.26 ms vs 1-key at this
    # shape, vs 6.6 ms for the 16-op depth sort it removes). Operands are
    # contiguous row slices of the kernel's SoA output; the [16, Pp] SoA
    # is assembled by the Pallas interleave kernel (XLA's stack emitter
    # costs ~18 ms fused after the sort, exp_tilesort S3-S2).
    all_key = jnp.concatenate([key, d_key])
    z_all = jnp.concatenate(
        [inst_soa[9], d_zero + jnp.float32(3e38)]
    )
    chans = tuple(
        jnp.concatenate([inst_soa[c], d_zero]) for c in range(9)
    ) + (jnp.concatenate([inst_soa[10], d_zero - 1.0]),)  # dummy gid = -1
    s = jax.lax.sort((all_key, z_all) + chans, num_keys=2, is_stable=True)
    # interleave expects [feat0..9, gid]: z (sort key 2) is feat channel 9
    inst = expand_pallas.interleave_rows(
        s[2:11] + (s[1], s[11]), interpret=interpret
    )
    # [16, Pp] SoA — the orientation the Pallas kernels DMA directly

    if cull:
        # boundaries from the sorted keys: bounds[t] = first slot with
        # key >= t; segments stay ordered AND contiguous (end[t] ==
        # start[t+1]), which the blend kernels' shared-block handling
        # assumes; culled/sentinel slots sit past every segment
        bounds = jnp.searchsorted(
            s[0], jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        tile_start = jnp.minimum(bounds[:-1], Pp)
        tile_end = jnp.minimum(bounds[1:], Pp)
    else:
        pstart = (jnp.cumsum(counts_t) - counts_t).astype(jnp.int32)
        tile_start = jnp.minimum(pstart, Pp)
        tile_end = jnp.minimum(pstart + counts_t, Pp)

    area_full = jnp.where(
        visible,
        jnp.maximum(tiles_max[:, 0] - tiles_min[:, 0], 0)
        * jnp.maximum(tiles_max[:, 1] - tiles_min[:, 1], 0),
        0,
    )
    area_drop = jnp.sum(area_full) - total_real     # rect-capping losses
    n_dropped = area_drop + jnp.maximum(total1 - capacity, 0)

    # n_total: the slot count capacity must cover with slack — real
    # instances + the per-Gaussian sentinel singletons + capping losses
    stream = InstanceStream(inst, tile_start, tile_end, n_dropped,
                            total1 + area_drop)
    # KEPT (post-capacity-drop) per-Gaussian REAL counts in original
    # order: slots [offsets, offsets+count) clipped to [0, capacity);
    # empty Gaussians' singleton slots carry gid -1 and belong to the
    # backward's negative-id prefix, so their kept is 0. Using raw `count`
    # would misalign every run boundary once instances drop (ADVICE r1 #1).
    kept = jnp.where(
        count > 0,
        jnp.minimum(offsets + count, capacity)
        - jnp.minimum(offsets, capacity),
        0,
    ).astype(jnp.int32)
    residuals = (inst[C_GID_ROW], kept, feat.shape)
    return stream, residuals


def build_instances_bwd(residuals, d_inst):
    """Per-Gaussian gradient reduction: sorted-run cumsum differences.

    d_inst: [16, Pp] SoA cotangent (rows slice contiguously)."""
    gid_f, kept, feat_shape = residuals
    N, F = feat_shape
    Pp = gid_f.shape[0]
    gid = gid_f.astype(jnp.int32)                 # -1 for dummies/invalid

    # ONE sort of the cotangents by gaussian id, carried as sort values
    # (value-carrying sorts beat random row gathers ~9x and are nearly flat
    # in operand count — see the fwd note / exp_bigsort.py)
    dch = tuple(d_inst[c] for c in range(10))
    b = jax.lax.sort((gid,) + dch, num_keys=1, is_stable=True)

    # per-ID KEPT real-instance counts are already in original (== gid)
    # order — the slot order IS original-Gaussian order now, no inverse
    # permutation needed
    counts_id = kept
    n_neg = Pp - jnp.sum(counts_id)               # dummies + invalid slots
    ends = n_neg + jnp.cumsum(counts_id)
    starts = ends - counts_id

    mode = os.environ.get("GPT_BWD_REDUCE", None) or (
        "batched" if os.environ.get("GPT_BWD_BATCHED_CUMSUM", "0") == "1"
        else "serial"
    )
    if mode in ("batched", "pallas"):
        # ONE [16, Pp] lane-axis cumsum instead of 10 serial 1-D cumsums.
        # 'pallas' FUSES the channel interleave with the scan in a single
        # streaming HBM pass (ops/scan_pallas.py:cumsum_channels) — the
        # channel matrix is never materialized; 'batched' materializes it
        # via the interleave kernel then pays XLA's lane cumsum.
        if mode == "pallas":
            from gaussianprediction_tpu.ops import scan_pallas
            cs = scan_pallas.cumsum_channels(b[1:])   # [16, Pp] inclusive
        else:
            mat = expand_pallas.interleave_rows(
                b[1:] + (b[0].astype(jnp.float32),)
            )
            cs = jnp.cumsum(mat, axis=1)          # [16, Pp] inclusive
        e1 = jnp.maximum(ends - 1, 0)
        s1 = jnp.maximum(starts - 1, 0)
        cols = []
        for c in range(10):
            hi = cs[c][e1]
            lo = jnp.where(starts > 0, cs[c][s1], 0.0)
            cols.append(jnp.where(counts_id > 0, hi - lo, 0.0))
        dfeat = jnp.stack(cols, axis=1)           # [N, 10]
        return (dfeat,)

    # per-channel contiguous cumsums + monotone boundary gathers: stacking
    # [Pp, 10] row-major first would turn 10 contiguous streams into one
    # strided write + a strided axis-0 scan
    zero1 = jnp.zeros((1,), jnp.float32)
    cols = []
    for c in range(10):
        cs = jnp.concatenate([zero1, jnp.cumsum(b[1 + c])])
        cols.append(cs[ends] - cs[starts])
    dfeat = jnp.stack(cols, axis=1)               # [N, 10]
    return (dfeat,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def build_instances(feat, depth, tiles_min, tiles_max, visible,
                    grid_x, grid_y, capacity, max_tiles, interpret=None):
    """Differentiable fused pack+bin; gradients flow to `feat` only."""
    stream, _ = build_instances_fwd(
        feat, depth, tiles_min, tiles_max, visible, grid_x, grid_y,
        capacity, max_tiles, interpret,
    )
    return stream


def _bi_fwd(feat, depth, tiles_min, tiles_max, visible, grid_x, grid_y,
            capacity, max_tiles, interpret):
    stream, res = build_instances_fwd(
        feat, depth, tiles_min, tiles_max, visible, grid_x, grid_y,
        capacity, max_tiles, interpret,
    )
    return stream, res


def _bi_bwd(grid_x, grid_y, capacity, max_tiles, interpret, res, g):
    (dfeat,) = build_instances_bwd(res, g.inst)
    return (dfeat, None, None, None, None)


build_instances.defvjp(_bi_fwd, _bi_bwd)
