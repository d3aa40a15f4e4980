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
    so a 512-slot block touches <= 513 consecutive Gaussians; two
    scalar-prefetch-indexed 640-wide candidate windows always cover them
    (the window index q = g0 // 640 comes from one tiny searchsorted);
  - the slot->Gaussian one-hot is two vector compares
    (offs[i] <= j < offs[i+1]) laid out [BSLOT, 2W] (slots on sublanes,
    candidates on lanes — everything stays lane-major, no transposes);
  - the row expansion is ONE [16, 2W] x [BSLOT, 2W] lane-contracting MXU
    matmul per block (exact: one operand is 0/1; precision=HIGHEST keeps
    the f32 values untruncated);
  - the per-slot TILE KEY (ty*grid_x+tx from the rect walk) is computed
    in-kernel in exact small-int f32 arithmetic, so the output [16, B]
    blocks are already the channel-major SoA the tile sort consumes —
    no strided column extraction afterwards.

Output channels: rows 0-9 feat (zeroed when invalid), 10 gid (-1 when
invalid), 11 tile key (sentinel when invalid), 12-15 zero.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BSLOT = 128        # instance slots per grid step (lane dim of the output)
WCAND = 128        # candidate-window width; 2 windows cover the <=129
                   # candidates a 128-slot block can touch (every compacted
                   # candidate owns >= 1 slot), with exactly no slack:
                   # worst-case g0 = (q+1)*W - 1 leaves 2W - (W-1) = 129
                   # lanes after g0. Small blocks matter: the matmul's
                   # padded-FLOP total is capacity*128*2W*2 — independent
                   # of BSLOT, linear in WCAND (measured 16.5 ms at the
                   # original 512/640 geometry, ~3 ms at 128/128).
NCH = 16
HUGE = 1 << 30     # offs padding: larger than any valid slot index


def _interpret_default() -> bool:
    if os.environ.get("JAX_PALLAS_INTERPRET", "0") == "1":
        return True
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform not in ("tpu", "axon")


def _expand_kernel(q_ref, scal_ref, pm1, pm2, of1, of2, out_ref, *,
                   grid_x: int, sentinel: int):
    b = pl.program_id(0)
    total = scal_ref[0]

    offs_w = jnp.concatenate([of1[...], of2[...]], axis=1)   # [1, 2W] int32
    offs_nx = jnp.concatenate(
        [offs_w[:, 1:], jnp.full((1, 1), HUGE, jnp.int32)], axis=1
    )
    jcol = b * BSLOT + jax.lax.broadcasted_iota(
        jnp.int32, (BSLOT, 1), 0
    )                                                        # [B, 1]
    oh = jnp.where(
        (offs_w <= jcol) & (offs_nx > jcol), 1.0, 0.0
    )                                                        # [B, 2W]
    pw = jnp.concatenate([pm1[...], pm2[...]], axis=1)       # [16, 2W]
    # exact expansion at 3 MXU passes instead of 6: the v5e MXU rounds f32
    # operands to bf16 at DEFAULT, so split the VALUES operand into three
    # exact bf16 terms (f32 has 24 mantissa bits = 3x8; each residual is
    # exactly representable, the standard bf16x3 f32 emulation) and matmul
    # each against the 0/1 one-hot — itself exact in bf16. Mosaic rejects
    # per-operand dot precision (`precision=(HIGHEST, DEFAULT)` fails to
    # lower), so the split is done by hand; f32 accumulation of the three
    # selected terms reconstructs the value exactly.
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

    rows = sel(hi) + sel(mid) + sel(lo)                      # [16, B]

    offs_sel = rows[10:11, :]
    tminx = rows[11:12, :]
    tminy = rows[12:13, :]
    rw = rows[13:14, :]
    gid = rows[14:15, :]
    # rect walk in exact f32 small-int arithmetic (k < 1024 = max_tiles
    # area cap, rw >= 1: the f32 quotient can't round across an integer
    # boundary because 1/rw >= 2^-10 exceeds half an ulp here)
    jrow = jcol.reshape(1, BSLOT).astype(jnp.float32)        # [1, B]
    k = jrow - offs_sel
    rwm = jnp.maximum(rw, 1.0)
    q = jnp.floor(k / rwm)
    rem = k - q * rwm
    keyf = (tminy + q) * jnp.float32(grid_x) + (tminx + rem)

    validf = (jcol.reshape(1, BSLOT) < total).astype(jnp.float32)
    out_ref[...] = jnp.concatenate(
        [
            rows[0:10, :] * validf,
            jnp.where(validf > 0.0, gid, -1.0),
            jnp.where(validf > 0.0, keyf, jnp.float32(sentinel)),
            jnp.zeros((NCH - 12, BSLOT), jnp.float32),
        ],
        axis=0,
    )


def expand_rows(permat, offs_row, starts_q, total, capacity: int,
                grid_x: int, sentinel: int, interpret=None):
    """permat: [16, Np] channel-major per-Gaussian rows, depth-sorted and
    zero-count-compacted, channels [feat0..9, offs, tminx, tminy, rw, gid,
    unused]; Np a multiple of WCAND with >= 2*WCAND of padding reach.
    offs_row: [1, Np] int32 ascending (pad lanes HUGE).
    starts_q: [nb] int32 candidate-window block indices (g0 // WCAND).
    total: [1] int32 live instance count.
    Returns [16, capacity] f32 SoA (capacity a multiple of BSLOT)."""
    if interpret is None:
        interpret = _interpret_default()
    assert capacity % BSLOT == 0
    nb = capacity // BSLOT

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((NCH, WCAND), lambda b, q, s: (0, q[b])),
            pl.BlockSpec((NCH, WCAND), lambda b, q, s: (0, q[b] + 1)),
            pl.BlockSpec((1, WCAND), lambda b, q, s: (0, q[b])),
            pl.BlockSpec((1, WCAND), lambda b, q, s: (0, q[b] + 1)),
        ],
        out_specs=pl.BlockSpec((NCH, BSLOT), lambda b, q, s: (0, b)),
    )
    return pl.pallas_call(
        functools.partial(
            _expand_kernel, grid_x=grid_x, sentinel=sentinel
        ),
        out_shape=jax.ShapeDtypeStruct((NCH, capacity), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_q, total, permat, permat, offs_row, offs_row)
