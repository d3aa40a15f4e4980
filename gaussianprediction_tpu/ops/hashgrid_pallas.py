"""Pallas TPU kernel: sorted-stream scatter-add into a flat feature table.

The gradient of a hash-grid encode is a scatter-add of M = N·L·8 (slot,
w·g) contributions into the concatenated level tables (tcnn does this with
atomicAdd, /root/reference dependency N5; SURVEY.md §2.2). On this TPU
stack XLA lowers scatter-adds semi-serially (~90 ns/row ⇒ ~800 ms/step at
25.6M contributions — the round-1 stage-2 bottleneck), and Mosaic has no
scatter primitive at all, so the kernel reformulates the reduction as MXU
matmuls over a SORTED contribution stream:

  1. the caller sorts contributions by global slot id (lax.sort carrying
     the F value channels — sorts are ~7 ns/row);
  2. the table is partitioned into BLOCK-slot blocks; block b's
     contributions are the contiguous sorted range [starts[b], starts[b+1])
     (starts from one tiny searchsorted);
  3. one grid step per block streams its range in double-buffered chunks
     and accumulates  acc[f] += (onehot_hi ⊙ v_f) @ onehot_loᵀ,  where
     slot-base = hi·LO + lo splits the one-hot into two rank-64/128
     factors (a Kronecker factorization: 8192-wide one-hots would cost
     64x more VPU comparisons);
  4. each block owns its [F, BLOCK] output slice exclusively — no
     read-modify-write, no atomics, deterministic accumulation order.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8192       # table slots per grid step (= HI * LO)
HI = 64
LO = 128
CHUNK = 2048       # contributions per streamed chunk
LANE = 128         # HBM lane tiling: DMA offsets must be multiples of this


def _interpret_default() -> bool:
    if os.environ.get("JAX_PALLAS_INTERPRET", "0") == "1":
        return True
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform not in ("tpu", "axon")


def _accum_kernel(starts_ref, keys_ref, vals_ref, out_ref, kbuf, vbuf,
                  sems, *, F: int, F8: int):
    b = pl.program_id(0)
    base = b * BLOCK
    # Align the streamed range down to the lane tiling (Mosaic requires
    # HBM slice offsets divisible by 128; searchsorted starts are not).
    # Rows before the true start belong to earlier blocks: their
    # local = key - base is negative, so the hi one-hot never matches and
    # they contribute zero — same self-masking that already handles rows
    # past the block's end.
    s0 = (starts_ref[b] // LANE) * LANE
    n = starts_ref[b + 1] - s0
    nchunks = pl.cdiv(n, CHUNK)

    def kdma(slot, c):
        off = pl.multiple_of(s0 + c * CHUNK, LANE)
        return pltpu.make_async_copy(
            keys_ref.at[:, pl.ds(off, CHUNK)],
            kbuf.at[slot],
            sems.at[slot, 0],
        )

    def vdma(slot, c):
        off = pl.multiple_of(s0 + c * CHUNK, LANE)
        return pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(off, CHUNK)],
            vbuf.at[slot],
            sems.at[slot, 1],
        )

    @pl.when(nchunks > 0)
    def _():
        kdma(0, 0).start()
        vdma(0, 0).start()

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (HI, CHUNK), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, CHUNK), 0)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(c, acc):
        @pl.when(c + 1 < nchunks)
        def _():
            kdma((c + 1) % 2, c + 1).start()
            vdma((c + 1) % 2, c + 1).start()

        kdma(c % 2, c).wait()
        vdma(c % 2, c).wait()
        keys = kbuf[c % 2]                     # [1, CHUNK] int32
        vals = vbuf[c % 2]                     # [F, CHUNK] f32
        local = keys - base
        valid = (pos_iota + c * CHUNK) < n     # [1, CHUNK]
        hi = local >> 7                        # LO = 128
        lo = local & (LO - 1)
        oh_hi = jnp.where((hi == hi_iota) & valid, 1.0, 0.0)   # [HI, CHUNK]
        oh_lo = jnp.where(lo == lo_iota, 1.0, 0.0)             # [LO, CHUNK]
        outs = []
        for f in range(F):
            a = oh_hi * vals[f:f + 1, :]
            outs.append(
                jax.lax.dot_general(
                    a, oh_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # the v5e MXU natively multiplies bf16: DEFAULT silently
                    # truncates the value operand to bf16 (~1e-3 gradient
                    # error, observed); HIGHEST runs the 3-pass f32 dot.
                    # The one-hot operand is exact either way.
                    precision=jax.lax.Precision.HIGHEST,
                )
            )                                   # [HI, LO]
        return acc + jnp.stack(outs)

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((F, HI, LO), jnp.float32)
    )
    out = acc.reshape(F, BLOCK)
    if F8 > F:
        out = jnp.concatenate(
            [out, jnp.zeros((F8 - F, BLOCK), jnp.float32)], axis=0
        )
    out_ref[...] = out


def scatter_add_sorted(keys_sorted, vals_sorted, n_slots: int,
                       interpret=None):
    """Σ-reduce sorted contributions into a [F, n_slots] table.

    keys_sorted: [M] int32, ascending, all in [0, n_slots);
    vals_sorted: [F, M] float32 (same order). Returns [F, n_slots] f32.
    """
    if interpret is None:
        interpret = _interpret_default()
    F, M = vals_sorted.shape
    # Mosaic requires sublane (dim-0) DMA slices aligned to the (8, 128)
    # tiling: pad the channel dim to a multiple of 8
    F8 = ((F + 7) // 8) * 8
    nb = pl.cdiv(n_slots, BLOCK)
    sentinel = jnp.int32(nb * BLOCK)
    starts = jnp.searchsorted(
        keys_sorted, jnp.arange(nb + 1, dtype=jnp.int32) * BLOCK,
        side="left",
    ).astype(jnp.int32)
    # pad so the last chunk's fixed-size DMA stays in bounds
    keys_p = jnp.concatenate(
        [keys_sorted, jnp.full((CHUNK,), sentinel, jnp.int32)]
    )[None, :]
    vals_p = jnp.zeros((F8, M + CHUNK), jnp.float32).at[:F, :M].set(
        vals_sorted
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (F8, BLOCK), lambda b, *_: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.VMEM((2, F8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_accum_kernel, F=F, F8=F8),
        out_shape=jax.ShapeDtypeStruct((F8, nb * BLOCK), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, keys_p, vals_p)
    return out[:F, :n_slots]
