"""Pallas TPU kernel: multi-row inclusive cumulative sum along lanes.

The instance-stream backward reduces per-instance cotangents to per-Gaussian
gradients by sorted-run cumulative sums + boundary differences
(ops/instance_stream.py:build_instances_bwd). XLA lowers each 1-D
`jnp.cumsum` as a log-pass scan over the full buffer (~0.7 ms per channel at
Pp ~1.2M; 10 channels = ~7 ms), i.e. 21 full HBM sweeps per channel for what
is one read + one write of 4.9 MB.

This kernel computes the inclusive cumsum of ALL 16 rows of a [16, P]
matrix in ONE streaming pass: a sequential grid walks lane blocks, each
block does a log2(BLK)-step Hillis-Steele prefix along lanes on the VPU and
adds the carried running total; the carry (one lane per row) persists in
VMEM scratch across the sequential grid. Traffic is the optimal
read-once/write-once; the VPU work is ~11 shift+adds per block.

Association order differs from XLA's scan (blockwise left-to-right vs
binary tree), so results match jnp.cumsum to f32 roundoff, not bitwise —
fine for gradient reductions.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCH = 16
BLK = 16384        # lanes per grid step


def _interpret_default() -> bool:
    if os.environ.get("JAX_PALLAS_INTERPRET", "0") == "1":
        return True
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform not in ("tpu", "axon")


def _shift_right(x, s):
    return jnp.concatenate(
        [jnp.zeros(x.shape[:1] + (s,), x.dtype), x[:, :-s]], axis=1
    )


def _cumsum_kernel(x_ref, o_ref, carry):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    y = x_ref[...]
    s = 1
    while s < y.shape[1]:
        y = y + _shift_right(y, s)
        s *= 2
    y = y + carry[...]
    o_ref[...] = y
    carry[...] = y[:, -1:]


def cumsum_rows(mat, interpret=None):
    """[16, P] -> [16, P] inclusive cumsum along axis 1 (P % BLK == 0)."""
    if interpret is None:
        interpret = _interpret_default()
    R, P = mat.shape
    assert R == NCH and P % BLK == 0, (R, P)
    nb = P // BLK
    return pl.pallas_call(
        _cumsum_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((NCH, BLK), lambda b: (0, b))],
        out_specs=pl.BlockSpec((NCH, BLK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((NCH, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NCH, 1), jnp.float32)],
        interpret=interpret,
    )(mat)


def _cumsum_ch_kernel(*refs):
    ins = refs[:-3]
    out_ref, scr, carry = refs[-3:]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    k = len(ins)
    for c in range(k):                   # assemble rows in scratch
        scr[c:c + 1, :] = ins[c][...]
    if k < NCH:
        scr[k:, :] = jnp.zeros((NCH - k, scr.shape[1]), jnp.float32)
    y = scr[...]
    s = 1
    while s < y.shape[1]:
        y = y + _shift_right(y, s)
        s *= 2
    y = y + carry[...]
    out_ref[...] = y
    carry[...] = y[:, -1:]


def cumsum_channels(chans, interpret=None):
    """k x [P] channel arrays -> [16, P] inclusive row cumsums along lanes
    (rows k..15 are zero). Fuses the interleave/stack with the scan so the
    channel matrix is never materialized in HBM: one read of the channels,
    one write of the cumsum — vs the serial path's ~21 log-passes per
    channel, or interleave + cumsum_rows' extra 80 MB round-trip."""
    if interpret is None:
        interpret = _interpret_default()
    P = chans[0].shape[0]
    k = len(chans)
    assert k <= NCH
    if interpret:
        mat = jnp.stack(chans, axis=0)
        if k < NCH:
            mat = jnp.concatenate(
                [mat, jnp.zeros((NCH - k, P), jnp.float32)], axis=0
            )
        return jnp.cumsum(mat, axis=1)
    assert P % BLK == 0, P
    nb = P // BLK
    in2d = [c.reshape(1, P) for c in chans]
    return pl.pallas_call(
        _cumsum_ch_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, BLK), lambda b: (0, b))] * k,
        out_specs=pl.BlockSpec((NCH, BLK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((NCH, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NCH, BLK), jnp.float32),
                        pltpu.VMEM((NCH, 1), jnp.float32)],
        interpret=interpret,
    )(*in2d)
