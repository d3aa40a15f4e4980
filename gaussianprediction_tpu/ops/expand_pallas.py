"""Pallas TPU kernel: monotone segment-expansion of per-Gaussian rows into
the per-instance stream (the "duplicate keys" stage of the CUDA tile
binner, reference submodule N1; SURVEY.md §2.2).

Slot j of the instance buffer belongs to the depth-rank-g Gaussian with
offs[g] <= j < offs[g+1] (offs = exclusive cumsum of per-Gaussian tile
counts). Round 1 materialized g_of = cummax(scatter-max) then row-gathered
[P, 16] — ~21 ms at the production shape, dominated by the XLA scatter and
the gather. This kernel re-derives the map block-locally with no scatter
and no gather:

  - after zero-count compaction every candidate Gaussian owns >= 1 slot,
    so a 128-slot sub-block touches <= 129 consecutive Gaussians; two
    scalar-prefetch-indexed 128-wide candidate windows always cover them
    (the window index q = g0 // 128 comes from one tiny searchsorted);
  - the slot->Gaussian one-hot is two vector compares
    (offs[i] <= j < offs[i+1]) laid out [BSLOT, 2W] (slots on sublanes,
    candidates on lanes — everything stays lane-major, no transposes);
  - the row expansion is ONE [16, 2W] x [BSLOT, 2W] lane-contracting MXU
    matmul per sub-block (exact: one operand is 0/1 and the f32 values
    operand is split into three exact bf16 terms — see _sel below);
  - each grid step processes SUB consecutive sub-blocks (STEP = 512
    slots): at 128 slots/step the ~1.2 us fixed per-step cost dominated
    (19 ms measured at capacity 2M, vs ~0.3 ms of MXU work) — batching
    sub-blocks cuts grid steps 4x while keeping each sub-block's narrow
    256-lane candidate window (a shared window would need 6x128 lanes
    and 3x the compare/matmul work per sub-block);
  - (round 3) the kernel emits the RAW selected candidate rows; the
    per-slot TILE KEY rect walk + invalid-slot masking moved to an XLA
    pass over the whole [16, capacity] output (emit_from_raw) — per-sub-
    block [1, 128] vreg arithmetic inside the kernel cost ~6.5 of its
    10.5 ms while the fused XLA form is full-utilization elementwise.

Raw output channels mirror the permat: rows 0-9 feat, 10 offs, 11 tminx,
12 tminy, 13 rw, 14 gid, 15 zero. emit_from_raw turns them into the
per-channel sort operands (feat zeroed / gid -1 / key sentinel when
invalid).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BSLOT = 128        # instance slots per sub-block (lane dim of the output)
SUB = 4            # sub-blocks per grid step. The windowed kernel is
                   # DMA-ISSUE bound (4 window DMAs per sub-block, count
                   # invariant to SUB: SUB=8 measured the same 14.7 ms with
                   # 5x the compile time), so SUB only trades compile time;
                   # the resident-VMEM path below is the real fix.
STEP = BSLOT * SUB # instance slots per grid step
# Whole-permat-resident path: when the [16, Np] per-Gaussian matrix plus
# the offs row fit comfortably in VMEM (~16 MB/core), load them ONCE and
# slice candidate windows in-VMEM — zero window DMAs. At 200k Gaussians
# permat is 12.8 MB; the windowed fallback covers larger N.
RSUB = 64          # sub-blocks per grid step in the resident kernel,
                   # UNROLLED into one straight-line body with a single
                   # whole-step store (lax.fori_loop cost ~1.2 us per
                   # sub-block — no software pipelining across iterations;
                   # exp_expandbisect E0: unrolled 4.2 ms vs loop 19 ms at
                   # capacity 2M, write-only floor 3.3 ms, compile ~2 s)
ALIGN = BSLOT * max(SUB, RSUB)   # capacity rounding for both kernels
# Resident-path budget derived from the VMEM envelope rather than pinned by
# hand (ADVICE r2): VMEM minus the double-buffered [16, RSUB*BSLOT] output
# blocks minus headroom for the per-sub-block temporaries (one-hot compares,
# bf16 splits, concatenates — all [<=16, 256]-class, well under the slack).
_VMEM_BYTES = 16 * 1024 * 1024
_OUT_BUF_BYTES = 2 * 16 * RSUB * BSLOT * 4   # NCH defined below = 16
_TEMP_HEADROOM = 1_500_000
RES_MAX_BYTES = _VMEM_BYTES - _OUT_BUF_BYTES - _TEMP_HEADROOM
WCAND = 128        # candidate-window width; 2 windows cover the <=129
                   # candidates a 128-slot sub-block can touch (every
                   # compacted candidate owns >= 1 slot), with exactly no
                   # slack: worst-case g0 = (q+1)*W - 1 leaves
                   # 2W - (W-1) = 129 lanes after g0.
NCH = 16
HUGE = 1 << 30     # offs padding: larger than any valid slot index


def _interpret_default() -> bool:
    if os.environ.get("JAX_PALLAS_INTERPRET", "0") == "1":
        return True
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform not in ("tpu", "axon")


def emit_from_raw(raw, total, grid_x: int, sentinel: int):
    """XLA emit pass over the expand kernels' RAW output (round 3): the
    rect walk + invalid-slot masking used to run per 128-slot sub-block
    INSIDE the kernel on 1/8-utilized [1, 128] vregs (~6.5 ms of the
    kernel's 10.5 ms at cap 1.2M — exp_expandbisect2 X1 vs X0); as plain
    jnp over the [16, cap] raw rows it fuses into the tile sort's operand
    materialization at full vector utilization.

    raw rows: 0-9 feat, 10 offs, 11 tminx, 12 tminy, 13 rw, 14 gid.
    Returns the per-channel tuple (feat0..9, gid, key_f32) that feeds the
    tile sort directly (no [16, P] re-assembly).

    Rect walk in exact f32 small-int arithmetic (k < 1024 = max_tiles area
    cap, rw >= 1: the f32 quotient can't round across an integer boundary
    because 1/rw >= 2^-10 exceeds half an ulp here). rw == 0 flags an
    EMPTY Gaussian's sentinel singleton slot (the no-depth-sort scheme
    gives every Gaussian >= 1 slot): emitted invalid so it sorts past
    every tile segment."""
    P = raw.shape[1]
    j = jnp.arange(P, dtype=jnp.int32)
    offs_sel = raw[10]
    tminx = raw[11]
    tminy = raw[12]
    rw = raw[13]
    gid = raw[14]
    k = j.astype(jnp.float32) - offs_sel
    rwm = jnp.maximum(rw, 1.0)
    q = jnp.floor(k / rwm)
    rem = k - q * rwm
    keyf = (tminy + q) * jnp.float32(grid_x) + (tminx + rem)
    ok = (j < total) & (rw > 0.5)
    okf = ok.astype(jnp.float32)
    feat = tuple(raw[c] * okf for c in range(10))
    gid_out = jnp.where(ok, gid, -1.0)
    key_out = jnp.where(ok, keyf, jnp.float32(sentinel))
    return feat + (gid_out, key_out)


def _expand_subblock_bs(offs_w, pw, jcol, total):
    """Binary-search variant (GPT_EXPAND_V=bs, the default): the per-slot
    candidate index g_loc = max{i : offs[i] <= j} is found by log2(2W) = 8
    steps of VECTORIZED binary search over the [1, 2W] offsets window —
    each probe is two 128-lane tpu.dynamic_gather LUTs (take_along_axis on
    matching [1, 128] shapes runs at full vector rate) plus a select — and
    the channels are then selected by two [16, 128] LUTs. No [B, 2W]
    one-hot is ever built and no MXU matmul runs: the mm/dg variants'
    dominant per-sub-block cost is the ~65k VPU compares materializing the
    [128, 256] one-hot mask (which is why dg's fewer MXU passes measured a
    TIE); the search does ~40 [1, 128]-lane ops instead.

    Exactness: offsets are compared in f32 — exact while capacity < 2^24
    (the permat already stores offsets as f32 in row 10, so this bound is
    a pre-existing contract), and the HUGE = 2^30 padding is a power of
    two, also exact. The search invariant offs[0] <= j holds because the
    window base q*WCAND <= g0 = searchsorted(offs, block_start) - 1 and
    offsets are nondecreasing."""
    B = jcol.shape[0]
    W2 = offs_w.shape[1]
    half = W2 // 2
    SL = 8  # Mosaic's dynamic_gather fails to lower 1-sublane tables;
            # run the search at the native f32 sublane count instead
    offs_f = offs_w.astype(jnp.float32)
    jf = jnp.broadcast_to(jcol.reshape(1, B).astype(jnp.float32), (SL, B))
    # concatenate (not broadcast_to) materializes the replicated table:
    # Mosaic's dynamic_gather rejects sublane-broadcast operand layouts
    t0 = jnp.concatenate([offs_f[:, :half]] * SL, axis=0)
    t1 = jnp.concatenate([offs_f[:, half:]] * SL, axis=0)

    def lut(idx):                                   # [SL, B] int32 -> f32
        i0 = jnp.minimum(idx, half - 1)
        i1 = jnp.clip(idx - half, 0, half - 1)
        v0 = jnp.take_along_axis(t0, i0, axis=1)
        v1 = jnp.take_along_axis(t1, i1, axis=1)
        return jnp.where(idx < half, v0, v1)

    lo = jnp.zeros((SL, B), jnp.int32)
    w = W2
    while w > 1:
        w //= 2
        probe = lo + w
        lo = jnp.where(lut(probe) <= jf, probe, lo)
    gi = lo[0:1]                                     # [1, B] candidate index

    idx_lo = jnp.broadcast_to(jnp.minimum(gi, half - 1), (NCH, B))
    idx_hi = jnp.broadcast_to(jnp.clip(gi - half, 0, half - 1), (NCH, B))
    sel_lo = jnp.take_along_axis(pw[:, :half], idx_lo, axis=1)
    sel_hi = jnp.take_along_axis(pw[:, half:], idx_hi, axis=1)
    rows = jnp.where(gi < half, sel_lo, sel_hi)      # [16, B]
    return rows


def _expand_subblock_dg(offs_w, pw, jcol, total):
    """dynamic_gather variant of the sub-block expansion (GPT_EXPAND_V=dg).

    The slot->candidate one-hot is reduced to a per-slot LOCAL INDEX by one
    tiny [1, 2W] x [B, 2W] matmul (g_local = Σ_i oh[j,i]·i; iota <= 255 is
    exact in bf16), then all 16 channels are selected by two 128-lane
    tpu.dynamic_gather lookups (jnp.take_along_axis on [16, 128] halves,
    full vector rate) + a select — EXACT f32 values with no bf16 splits,
    and 2 MXU passes per sub-block instead of 6.
    """
    offs_nx = jnp.concatenate(
        [offs_w[:, 1:], jnp.full((1, 1), HUGE, jnp.int32)], axis=1
    )
    oh = jnp.where(
        (offs_w <= jcol) & (offs_nx > jcol), 1.0, 0.0
    )                                                    # [B, 2W]
    W2 = offs_w.shape[1]
    # tpu.iota is integer-only; cast to bf16 for the matmul (<=256 exact)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(
        jnp.float32
    )
    g_loc = jax.lax.dot_general(
        iota.astype(jnp.bfloat16), oh.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [1, B]
    B = jcol.shape[0]
    gi = g_loc.astype(jnp.int32)                         # [1, B]
    half = W2 // 2
    idx_lo = jnp.broadcast_to(jnp.minimum(gi, half - 1), (NCH, B))
    idx_hi = jnp.broadcast_to(
        jnp.clip(gi - half, 0, half - 1), (NCH, B)
    )
    lo = jnp.take_along_axis(pw[:, :half], idx_lo, axis=1)   # [16, B]
    hi = jnp.take_along_axis(pw[:, half:], idx_hi, axis=1)
    rows = jnp.where(gi < half, lo, hi)                  # [16, B]
    return rows


def _expand_subblock(offs_w, pw, jcol, total):
    """Per-sub-block expansion math shared by both kernels.

    offs_w: [1, 2W] int32 candidate offsets window; pw: [16, 2W] candidate
    rows; jcol: [B, 1] global slot indices. Returns the [16, B] RAW
    selected candidate rows (the rect walk / masking happens in the XLA
    emit pass, emit_from_raw — round 3).
    """
    # measurement-only ablations (exp_expandbisect2): wrong results, real
    # structure. "nomm" skips the selection matmuls; "nooh" skips the
    # one-hot too (windows + write); "1pass" uses one matmul pass.
    ablate = os.environ.get("GPT_EXPAND_ABLATE", "")
    variant = os.environ.get("GPT_EXPAND_V", "mm")
    if variant == "bs":
        return _expand_subblock_bs(offs_w, pw, jcol, total)
    if variant == "dg":
        return _expand_subblock_dg(offs_w, pw, jcol, total)
    if ablate == "nooh":
        return pw[:, : jcol.shape[0]]
    offs_nx = jnp.concatenate(
        [offs_w[:, 1:], jnp.full((1, 1), HUGE, jnp.int32)], axis=1
    )
    oh = jnp.where(
        (offs_w <= jcol) & (offs_nx > jcol), 1.0, 0.0
    )                                                    # [B, 2W]
    # exact expansion at 3 MXU passes instead of 6: the v5e MXU rounds
    # f32 operands to bf16 at DEFAULT, so split the VALUES operand into
    # three exact bf16 terms (f32 has 24 mantissa bits = 3x8; each
    # residual is exactly representable — the standard bf16x3 f32
    # emulation) and matmul each against the 0/1 one-hot, itself exact
    # in bf16. Mosaic rejects per-operand dot precision, so the split
    # is done by hand; f32 accumulation of the three selected terms
    # reconstructs the value exactly.
    if ablate == "nomm":
        return pw[:, : jcol.shape[0]] + jnp.sum(oh, axis=1)[None, :]
    oh_bf = oh.astype(jnp.bfloat16)
    hi = pw.astype(jnp.bfloat16)
    r1 = pw - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def sel(vals_bf):
        return jax.lax.dot_general(
            vals_bf, oh_bf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if ablate == "1pass":
        return sel(hi) * 3.0
    return sel(hi) + sel(mid) + sel(lo)                  # [16, B]


def _expand_kernel(q_ref, scal_ref, *refs):
    pms = refs[: 2 * SUB]            # pm1_i, pm2_i per sub-block
    ofs = refs[2 * SUB: 4 * SUB]     # of1_i, of2_i per sub-block
    out_ref = refs[4 * SUB]
    b = pl.program_id(0)
    total = scal_ref[0]

    outs = []
    for i in range(SUB):
        offs_w = jnp.concatenate(
            [ofs[2 * i][...], ofs[2 * i + 1][...]], axis=1
        )                                                    # [1, 2W] int32
        pw = jnp.concatenate(
            [pms[2 * i][...], pms[2 * i + 1][...]], axis=1
        )                                                    # [16, 2W]
        jcol = (b * SUB + i) * BSLOT + jax.lax.broadcasted_iota(
            jnp.int32, (BSLOT, 1), 0
        )                                                    # [B, 1]
        outs.append(
            _expand_subblock(offs_w, pw, jcol, total)
        )
    out_ref[...] = jnp.concatenate(outs, axis=1)


def _expand_kernel_res(q_ref, scal_ref, pm_hbm, of_hbm, out_ref,
                       pm_vmem, of_vmem, sems):
    """Resident-VMEM variant: the [16, Np] permat and [1, Np] offs row are
    DMA'd into persistent VMEM scratch ONCE at grid step 0 (scratch
    survives across the sequential grid; a constant-index-map input block
    is NOT enough — Mosaic re-fetched the whole 13.6 MB block every step,
    ~16 ms of pure HBM traffic at the production shape); candidate windows
    are then in-VMEM dynamic slices at WCAND-aligned offsets."""
    b = pl.program_id(0)
    total = scal_ref[0]

    @pl.when(b == 0)
    def _():
        pltpu.make_async_copy(pm_hbm, pm_vmem, sems.at[0]).start()
        pltpu.make_async_copy(of_hbm, of_vmem, sems.at[1]).start()
        pltpu.make_async_copy(pm_hbm, pm_vmem, sems.at[0]).wait()
        pltpu.make_async_copy(of_hbm, of_vmem, sems.at[1]).wait()

    # UNROLLED sub-block loop with ONE whole-step store (round 3): the
    # lax.fori_loop form cost ~1.2 us per sub-block — Mosaic cannot
    # software-pipeline across loop iterations, and each iteration paid a
    # scalar q read, two pl.when branches and a dynamic out_ref store.
    # The unrolled body with a single [NCH, RSUB*BSLOT] store measured
    # 4.2 ms at capacity 2M vs 19 ms for the loop (exp_expandbisect E0;
    # the write-only floor is 3.3 ms). Compile time stays ~2 s.
    step_base = b * (RSUB * BSLOT)

    # whole-step tail skip: a grid step entirely past `total` holds only
    # invalid slots — write the constant invalid block without window
    # reads or selection math (probe-sized capacity leaves a ~17-24% tail)
    @pl.when(step_base >= total)
    def _tail():
        # RAW-mode tail: all-zero rows (rw row 13 == 0) emit as invalid
        # in the XLA pass (emit_from_raw)
        out_ref[...] = jnp.zeros((NCH, RSUB * BSLOT), jnp.float32)

    @pl.when(step_base < total)
    def _live():
        # per-sub-block STATIC-slice stores, not a 64-wide concatenate:
        # keeping 64 [16, BSLOT] results live for one giant store spills
        # the vector register file
        for i in range(RSUB):
            q = q_ref[b * RSUB + i]
            off0 = pl.multiple_of(q * WCAND, WCAND)
            offs_w = of_vmem[:, pl.ds(off0, 2 * WCAND)]
            pw = pm_vmem[:, pl.ds(off0, 2 * WCAND)]
            jcol = (b * RSUB + i) * BSLOT + jax.lax.broadcasted_iota(
                jnp.int32, (BSLOT, 1), 0
            )
            out_ref[:, i * BSLOT:(i + 1) * BSLOT] = _expand_subblock(
                offs_w, pw, jcol, total
            )


ILV_BLK = 32768    # lanes per interleave grid step


def _interleave_kernel(*refs):
    ins = refs[:-1]                       # 11 x [1, ILV_BLK]
    out_ref = refs[-1]                    # [16, ILV_BLK]
    gid = ins[10][...]
    valid = (gid >= 0.0).astype(jnp.float32)
    # per-sublane-row stores, NOT a 16-piece sublane concatenate (Mosaic
    # lowers misaligned sublane concats as shift-copy cascades)
    for c in range(10):
        out_ref[c:c + 1, :] = ins[c][...]
    out_ref[10:11, :] = gid
    out_ref[11:12, :] = valid
    out_ref[12:16, :] = jnp.zeros((4, gid.shape[1]), jnp.float32)


def interleave_rows(chans, interpret=None):
    """11 x [P] channel arrays -> [16, P] instance SoA (rows 0-9 feat,
    10 gid, 11 valid=gid>=0, 12-15 zero).

    XLA's stack/concatenate emitter costs ~18 ms fused after the tile sort
    at P~2.3M (exp_tilesort S3-S2) for what is ~0.7 ms of HBM traffic;
    this kernel streams 11 x [1, BLK] blocks in and one [16, BLK] block
    out. P must be a multiple of ILV_BLK (callers pad the dummy region)."""
    if interpret is None:
        interpret = _interpret_default()
    P = chans[0].shape[0]
    if interpret:
        gid = chans[10]
        valid = (gid >= 0.0).astype(jnp.float32)
        zeros = jnp.zeros_like(gid)
        return jnp.stack(
            tuple(chans[:10]) + (gid, valid, zeros, zeros, zeros, zeros),
            axis=0,
        )
    assert P % ILV_BLK == 0, P
    nb = P // ILV_BLK
    in2d = [c.reshape(1, P) for c in chans]
    return pl.pallas_call(
        _interleave_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, ILV_BLK), lambda b: (0, b))] * 11,
        out_specs=pl.BlockSpec((NCH, ILV_BLK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((NCH, P), jnp.float32),
        interpret=interpret,
    )(*in2d)


STK_BLK = 8192     # lanes per stack_rows grid step. The kernel is
                   # DMA-ISSUE bound (16 window DMAs per step); 2048-lane
                   # steps measured 3.2 ms at N=200k (103 steps x 16 DMAs),
                   # ~the same as XLA's stack emitter. 8192 cuts the issue
                   # count 4x while keeping the implied permat padding
                   # (Np = round_up(N + 2*WCAND, STK_BLK)) small enough
                   # that 200k-Gaussian permats stay under RES_MAX_BYTES.


def _stack_kernel(*refs):
    ins = refs[:-1]
    out_ref = refs[-1]
    k = len(ins)
    pad = out_ref.shape[0] - k
    # per-sublane-row stores (see _interleave_kernel)
    for c in range(k):
        out_ref[c:c + 1, :] = ins[c][...]
    if pad:
        out_ref[k:, :] = jnp.zeros((pad, out_ref.shape[1]), jnp.float32)


def stack_rows(chans, nch: int = NCH, interpret=None):
    """k x [P] f32 channel arrays -> [nch, P] channel-major matrix (rows
    k..nch-1 zeroed). XLA's stack emitter costs ms-class fixed overheads at
    these shapes (NOTES.md exp_tilesort); this kernel streams k x [1, BLK]
    blocks in and one [nch, BLK] block out. P must be a multiple of
    STK_BLK."""
    if interpret is None:
        interpret = _interpret_default()
    P = chans[0].shape[0]
    k = len(chans)
    assert k <= nch
    if interpret:
        mat = jnp.stack(chans, axis=0)
        if k < nch:
            mat = jnp.concatenate(
                [mat, jnp.zeros((nch - k, P), jnp.float32)], axis=0
            )
        return mat
    assert P % STK_BLK == 0, P
    nb = P // STK_BLK
    in2d = [c.reshape(1, P) for c in chans]
    return pl.pallas_call(
        _stack_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, STK_BLK), lambda b: (0, b))] * k,
        out_specs=pl.BlockSpec((nch, STK_BLK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((nch, P), jnp.float32),
        interpret=interpret,
    )(*in2d)


def expand_rows(permat, offs_row, starts_q, total, capacity: int,
                grid_x: int, sentinel: int, interpret=None):
    """Emitted-form convenience wrapper: expand_rows_raw + emit_from_raw,
    re-assembled to the historical [16, capacity] SoA layout (rows 0-9
    feat, 10 gid, 11 tile key, 12-15 zero). Production callers use the
    raw+emit pair directly so the emit fuses into their sort operands."""
    raw = expand_rows_raw(permat, offs_row, starts_q, total, capacity,
                          interpret=interpret)
    chans = emit_from_raw(raw, total[0], grid_x, sentinel)
    zeros = jnp.zeros_like(chans[0])
    return jnp.stack(chans + (zeros,) * (NCH - len(chans)), axis=0)


def expand_rows_raw(permat, offs_row, starts_q, total, capacity: int,
                    interpret=None):
    """permat: [16, Np] channel-major per-Gaussian rows where EVERY
    candidate owns >= 1 slot (zero-count Gaussians carry rw == 0 and one
    sentinel singleton slot — the window-bound invariant without any sort
    or compaction), channels [feat0..9, offs, tminx, tminy, rw, gid,
    unused]; Np a multiple of WCAND with >= 2*WCAND of padding reach.
    offs_row: [1, Np] int32 ascending (pad lanes HUGE).
    starts_q: [nb] int32 candidate-window block indices (g0 // WCAND),
    one per BSLOT sub-block.
    total: [1] int32 live instance count.
    Returns the [16, capacity] RAW per-slot candidate rows (same channel
    layout as permat); run emit_from_raw over them for tile keys and
    invalid-slot masking (capacity a multiple of ALIGN)."""
    if interpret is None:
        interpret = _interpret_default()
    assert capacity % ALIGN == 0

    resident = (permat.shape[1] * (NCH + 1) * 4) <= RES_MAX_BYTES
    if resident:
        nsteps = capacity // (RSUB * BSLOT)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (NCH, RSUB * BSLOT), lambda b, q, s: (0, b)
            ),
            scratch_shapes=[
                pltpu.VMEM((NCH, permat.shape[1]), jnp.float32),
                pltpu.VMEM((1, offs_row.shape[1]), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            _expand_kernel_res,
            out_shape=jax.ShapeDtypeStruct((NCH, capacity), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts_q, total, permat, offs_row)

    nsteps = capacity // STEP

    pm_specs = []
    of_specs = []
    for i in range(SUB):
        for d in (0, 1):
            pm_specs.append(pl.BlockSpec(
                (NCH, WCAND),
                functools.partial(
                    lambda b, q, s, i=i, d=d: (0, q[b * SUB + i] + d),
                ),
            ))
            of_specs.append(pl.BlockSpec(
                (1, WCAND),
                functools.partial(
                    lambda b, q, s, i=i, d=d: (0, q[b * SUB + i] + d),
                ),
            ))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=pm_specs + of_specs,
        out_specs=pl.BlockSpec((NCH, STEP), lambda b, q, s: (0, b)),
    )
    return pl.pallas_call(
        _expand_kernel,
        out_shape=jax.ShapeDtypeStruct((NCH, capacity), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_q, total, *([permat] * (2 * SUB)), *([offs_row] * (2 * SUB)))
