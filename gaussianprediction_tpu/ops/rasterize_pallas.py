"""Pallas TPU differentiable tile rasterizer (the production render path).

TPU-native re-design of renderCUDA fwd/bwd from
diff-gaussian-rasterization-w-depth (reference submodule N1; SURVEY.md §2.2,
§7.3). Architecture:

- Gaussians are pre-binned into depth-ordered per-tile instance segments
  (ops/instance_stream.py) and packed into a [16, P] float32 SoA (channels
  on sublanes, instances on lanes: chunked DMA slices are then [16, 128] —
  lane-tile aligned, which Mosaic requires). Segments need NOT be
  CHUNK-aligned: each tile's kernel program DMAs CHUNK-aligned windows
  covering its [start, end) range and lane-masks the neighbours' instances
  at the boundaries (round 3 — alignment previously required per-tile
  dummy padding rows, whose construction cost a corner-histogram sort and
  ~T*CHUNK extra rows through the big tile sort).
- The FORWARD kernel runs one program per 16x16 tile. It streams its
  instance segment from HBM in double-buffered [16, CHUNK] chunks, computes
  the alpha matrix A[256 pixels, CHUNK] on the VPU, turns the sequential
  front-to-back blend into a chunk-local exclusive cumulative product
  (log-step Hillis-Steele scan along lanes) against a carried per-pixel
  transmittance, and accumulates color/depth via an MXU contraction
  w @ [r,g,b,z]^T. The CUDA `done` latch at T < 1e-4 is reproduced exactly
  with a cumulative-or over the in-chunk trigger mask (first-trigger index
  equality: before the first trigger the unlatched running product equals
  the true transmittance), and whole chunks stop early once every pixel in
  the tile is done.
- The BACKWARD kernel re-streams the same segments front-to-back. Using
  Q = Σ_j w_j v_j + dT·T_final (precomputed per pixel from forward outputs),
  the alpha gradient is dα_i = T_i·v_i - (Q - S_i)/(1-α_i) with S_i the
  running inclusive prefix of w·v — a single sweep, no reverse pass, no
  atomics: every instance's gradient column is computed by the one tile
  that owns it. Gradient CHUNK-blocks that straddle a segment boundary are
  shared between neighbouring tiles' programs; the head block is handled
  by read-modify-write, which is race-free because the Pallas TPU grid is
  SEQUENTIAL on the single v5e TensorCore (dimension_semantics=arbitrary)
  and each program drains its write DMAs before retiring. The per-Gaussian
  reduction happens outside as the VJP of the differentiable jnp gather
  that packed the instances.
- CUDA parity notes: alpha is clamped at 0.99 for blending but its gradient
  propagates through the *unclamped* expression, exactly as the CUDA
  backward does; gradients flow only through contributing Gaussians.

The custom_vjp boundary wraps only this binned-blending stage; projection,
covariance and SH are plain differentiable jnp (ops/projection.py, utils/sh),
so JAX AD composes the full pixel->parameter gradient chain.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIX = 256          # pixels per 16x16 tile (sublane dim of the alpha matrix)
CHUNK = 128        # DMA alignment quantum: kernels stream CHUNK-aligned
                   # windows (segments themselves need not be aligned)
# streaming width of the blend kernels: KCHUNK = CHUNK * GPT_KCHUNK_X lanes
# per inner iteration. Both kernels are ~0.8 us/iteration fixed-cost bound
# (11.3 + 15.8 ms fwd+bwd at 18.5k chunk-iterations) while the VPU math is
# ~2.5 ms, so fatter iterations amortize the loop overhead. The blend math
# is partition-invariant (the done-latch/test_T sequence per lane does not
# depend on where chunk boundaries fall), so any X is exact.
# Bench A/B at 200k/800² (r3): X=1 63.2 ms, X=2 58.2, X=4 60.3 — default 2
# (wider iterations waste more tail lanes on sparse tiles past that).
# The two kernels have different fixed costs per iteration (the backward
# adds write DMAs + 10 MXU passes), so their widths are knobbed separately:
# GPT_KCHUNK_X_BWD defaults to GPT_KCHUNK_X.
KCHUNK = CHUNK * int(os.environ.get("GPT_KCHUNK_X", "2"))
KCHUNK_BWD = CHUNK * int(
    os.environ.get("GPT_KCHUNK_X_BWD", os.environ.get("GPT_KCHUNK_X", "2"))
)


def _split_config():
    """GPT_BLEND_SPLIT=S computes each streamed [NCH, KCHUNK] chunk in S
    sequential [PIX, KCHUNK/S] halves (round 5). Rationale: widening
    KCHUNK amortizes the ~0.8 us/while-iteration fixed cost, but the
    whole-chunk VPU working set ([PIX, KCHUNK] x ~8 arrays) blows past
    the vector register file at 512 lanes and Mosaic spills to VMEM
    (the measured X=4 regression). Splitting keeps the DMA wide (fewer
    iterations, fewer semaphore waits) while the compute window stays at
    the register-friendly width. The split is exact: the per-chunk blend
    math is partition-invariant, and halves chain T/done/S state
    sequentially exactly as consecutive chunks do."""
    return max(1, int(os.environ.get("GPT_BLEND_SPLIT", "1")))


def _noexit_config() -> bool:
    """GPT_BLEND_NOEXIT=1 drops the early-exit term from the while
    condition (round 5). The per-iteration `jnp.min(done)` is a cross-
    sublane reduction plus a vector->scalar transfer on every loop test;
    the blend math itself is self-masking through the `contribute` mask,
    so skipping the check changes cost, not results (saturated tiles
    stream their tails instead of stopping)."""
    return os.environ.get("GPT_BLEND_NOEXIT", "0") == "1"
NCH = 16           # packed f32 channels per instance
T_EPS = 1e-4
ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0

# packed instance channel indices (rows of the [NCH, P] SoA)
C_MX, C_MY, C_CA, C_CB, C_CC, C_OP, C_R, C_G, C_B, C_Z, C_GID, C_VALID = range(12)
# forward output channels (per tile, [PIX, 8])
O_R, O_G, O_B, O_Z, O_T, O_WMAX, O_GID, O_PAD = range(8)
# backward pixel-grad input channels (per tile, [PIX, 8]): d(r,g,b,z), Q
D_R, D_G, D_B, D_Z, D_Q = range(5)


def _interpret_default() -> bool:
    if os.environ.get("JAX_PALLAS_INTERPRET", "0") == "1":
        return True
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    # 'axon' is the tunneled-TPU plugin platform; Mosaic compiles there too.
    return platform not in ("tpu", "axon")


def _bwd_precision():
    """Backward-kernel precision for the v dot (K=4, cheap). HIGHEST (6
    bf16 passes) measured 3e-4 relative gradient error better than
    DEFAULT on v5e. (Precision.HIGH does not lower through Mosaic.)"""
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
        "split2": jax.lax.Precision.DEFAULT,  # handled by _v_dot
    }[os.environ.get("GPT_BWD_PRECISION", "highest").lower()]


def _v_dot(d_rgbz, rgbz):
    """v_{p,i} = c_i . d_rgb_p + z_i * d_z_p  [PIX, K].

    GPT_BWD_PRECISION: highest = 6 MXU passes (2^-24); split2 = manual
    bf16 2x2 split, 3 passes (~2^-16 — between HIGHEST and DEFAULT's
    single-pass 4e-3, at half HIGHEST's MXU occupancy); default = 1."""
    mode = os.environ.get("GPT_BWD_PRECISION", "highest").lower()
    if mode == "split2":
        a_h, a_m = _split2(d_rgbz)
        b_h, b_m = _split2(rgbz)

        def dot(a_bf, b_bf):
            return jax.lax.dot_general(
                a_bf, b_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return dot(a_h, b_h) + dot(a_h, b_m) + dot(a_m, b_h)
    return jax.lax.dot_general(
        d_rgbz, rgbz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_bwd_precision(),
    )


def _split2(x):
    """x == hi + mid + O(2^-16 |x|) with hi/mid exact bf16 terms."""
    hi = x.astype(jnp.bfloat16)
    mid = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid


def _split3(x):
    """Exact bf16x3 decomposition of f32 (24 mantissa bits = 3x8)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _shift_right(x, s, fill):
    """Shift along the lane axis (axis 1): out[:, i] = x[:, i-s]."""
    return jnp.concatenate(
        [jnp.full(x.shape[:1] + (s,), fill, x.dtype), x[:, :-s]], axis=1
    )


def _inclusive_scan(x, op, identity):
    """Hillis-Steele prefix scan along axis 1 (log2 steps of shift+op)."""
    s = 1
    y = x
    while s < y.shape[1]:
        y = op(y, _shift_right(y, s, identity))
        s *= 2
    return y


def _mxupow_config() -> bool:
    """GPT_BLEND_MXUPOW=1 computes the exponent quadratic through the MXU
    (round 5): power[p,i] = mon(p) . coef(i) with mon = [1,x,y,x²,xy,y²]
    over TILE-LOCAL pixel coords (integers <= 225 — exact in bf16) and a
    bf16x3 split of the per-instance coefficients (24 mantissa bits).
    Replaces ~8 VPU ops on [PIX, K] (dx, dy, and the quadratic) with 3
    MXU passes; the kernels were measured VPU-bound (exp_blendiso r5).
    Absolute power error ~3e-5 from f32 accumulation of +-5e2 terms vs
    ~1e-6 for the direct form — validated against the oracle."""
    return os.environ.get("GPT_BLEND_MXUPOW", "0") == "1"


def _mxuscan_config() -> bool:
    """GPT_BLEND_MXUSCAN=1 computes the backward's inclusive lane-cumsum
    of wv through the MXU (round 5): x @ U with U the upper-triangular
    0/1 matrix (exact in bf16), bf16x3-split operand (24 mantissa bits).
    Replaces the log-K Hillis-Steele scan (~16 VPU ops on [PIX, K]) in
    the VPU-bound backward. Error ~2^-24 * sum|wv| vs the sequential f32
    adds' own ~K-ulp accumulation — same class."""
    return os.environ.get("GPT_BLEND_MXUSCAN", "0") == "1"


def _mxu_cumsum(x):
    """Inclusive lane-axis cumsum of [PIX, K] via one triangular MXU
    contraction (3 bf16 passes)."""
    K = x.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    U = (ii <= jj).astype(jnp.bfloat16)        # exact 0/1
    x_h, x_m, x_l = _split3(x)

    def tri_dot(x_bf):
        return jax.lax.dot_general(
            x_bf, U, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return tri_dot(x_h) + tri_dot(x_m) + tri_dot(x_l)


def _chunk_quantities(data, px, py, T_in, done_in, lo, hi, origin=None):
    """Shared fwd/bwd per-chunk math.

    data: [NCH, KCHUNK] packed instances; lo/hi: [] int32 lane bounds of
    this tile's segment within the chunk (the chunk windows are
    CHUNK-aligned while segments are not, so leading lanes < lo and
    trailing lanes >= hi belong to NEIGHBOUR tiles' segments and must be
    masked);
    px/py: [PIX, 1] pixel centers;
    T_in: [PIX, 1] carried transmittance; done_in: [PIX, 1] f32 0/1 done
    latch (booleans are avoided in while-loop carries — Mosaic cannot
    legalize i1 vector yields).
    Returns dict of [PIX, CHUNK] and [PIX, 1] arrays.

    ONE prefix scan per chunk (it was three in round 1):
    - no or-scan for the done latch: om factors are in (0, 1], so the
      unlatched running test_T = T_in·incl_all is monotone nonincreasing —
      once one VALID instance trips test_T < eps, every later valid
      instance in the chunk trips its own test too, so the raw trigger
      already equals its or-scan on the positions where `valid` holds (and
      `contribute` masks with `valid` anyway);
    - no second product scan for T_out: prod over contributing factors ==
      incl_all at the last contributing lane == min of incl_all over
      contributing lanes (monotone nonincreasing, and factors after that
      lane are 1), bitwise-identical association.
    """
    mx = data[C_MX:C_MX + 1, :]        # [1, CHUNK]
    my = data[C_MY:C_MY + 1, :]
    ca = data[C_CA:C_CA + 1, :]
    cb = data[C_CB:C_CB + 1, :]
    cc = data[C_CC:C_CC + 1, :]
    op = data[C_OP:C_OP + 1, :]
    vch = data[C_VALID:C_VALID + 1, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, data.shape[1]), 1)
    in_seg = (lane >= lo) & (lane < hi)  # [1, KCHUNK]

    if origin is not None and _mxupow_config():
        # MXU monomial path (see _mxupow_config): tile-local coords keep
        # the monomials exact in bf16 and the coefficient magnitudes
        # bounded (~5e2) so f32 accumulation stays ~3e-5 absolute
        ox, oy = origin
        xl = px - ox                   # [PIX, 1] local, 0..15
        yl = py - oy
        mon = jnp.concatenate(
            [jnp.ones_like(xl), xl, yl, xl * xl, xl * yl, yl * yl,
             jnp.zeros((xl.shape[0], 2), jnp.float32)], axis=1
        ).astype(jnp.bfloat16)         # [PIX, 8] exact
        mxl = mx - ox                  # [1, CHUNK]
        myl = my - oy
        coef = jnp.concatenate(
            [-(0.5 * ca * mxl * mxl + cb * mxl * myl
               + 0.5 * cc * myl * myl),
             ca * mxl + cb * myl,
             cc * myl + cb * mxl,
             -0.5 * ca, -cb, -0.5 * cc,
             jnp.zeros((2, data.shape[1]), jnp.float32)], axis=0
        )                              # [8, CHUNK]
        co_h, co_m, co_l = _split3(coef)

        def pow_dot(co_bf):
            return jax.lax.dot_general(
                mon, co_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        power = pow_dot(co_h) + pow_dot(co_m) + pow_dot(co_l)
        dx = dy = None
    else:
        dx = px - mx                   # [PIX, CHUNK]
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    Gv = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, op * Gv)
    valid = (vch > 0.5) & in_seg & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(valid, alpha, 0.0)
    om = 1.0 - alpha

    # T_i for each in-chunk gaussian: carried T times exclusive prefix prod
    incl_all = _inclusive_scan(om, jnp.multiply, 1.0)
    excl = _shift_right(incl_all, 1, 1.0)
    T_run = T_in * excl                # [PIX, CHUNK]
    test_T = T_run * om
    trigger = valid & (test_T < T_EPS)
    contribute = valid & ~trigger & (done_in < 0.5)
    w = jnp.where(contribute, alpha * T_run, 0.0)

    T_out = T_in * jnp.min(
        jnp.where(contribute, incl_all, 1.0), axis=1, keepdims=True
    )
    done_out = jnp.maximum(
        done_in, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
    )
    return dict(
        dx=dx, dy=dy, Gv=Gv, alpha=alpha, om=om, w=w, T_run=T_run,
        contribute=contribute, T_out=T_out, done_out=done_out,
    )


def _pixel_coords(tile_idx, grid_x):
    lin = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    tile_y = tile_idx // grid_x
    tile_x = tile_idx - tile_y * grid_x
    px = (tile_x * 16 + lin % 16).astype(jnp.float32)
    py = (tile_y * 16 + lin // 16).astype(jnp.float32)
    return px, py


def _fwd_kernel(start_ref, end_ref, inst_ref, out_ref, chunk_vmem, sems,
                *, grid_x, with_tidx: bool = True, nbuf: int = 2):
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    # segments are NOT CHUNK-aligned: stream CHUNK-aligned windows from
    # the aligned-down offset and lane-mask the neighbours at the edges
    off0 = (start // CHUNK) * CHUNK
    seg = end - start
    span = end - off0
    nchunks = jnp.where(seg > 0, pl.cdiv(span, KCHUNK), 0)
    px, py = _pixel_coords(t, grid_x)
    f_tile_y = t // grid_x
    forig = ((t - f_tile_y * grid_x).astype(jnp.float32) * 16.0,
             f_tile_y.astype(jnp.float32) * 16.0)

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * KCHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, KCHUNK)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    # (nbuf-1)-deep prefetch: with nbuf=3 chunk c+2 is in flight while c
    # computes, hiding one extra DMA latency (GPT_BLEND_NBUF A/B)
    for w in range(nbuf - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w % nbuf, w).start()

    noexit = _noexit_config()
    nsplit = _split_config()
    ksub = KCHUNK // nsplit

    def cond(state):
        c, T, done, acc, wmax, bgid = state
        if noexit:
            return c < nchunks
        return (c < nchunks) & (jnp.min(done) < 0.5)

    def body(state):
        c, T, done, acc, wmax, bgid = state

        @pl.when(c + (nbuf - 1) < nchunks)
        def _():
            get_dma((c + (nbuf - 1)) % nbuf, c + (nbuf - 1)).start()

        get_dma(c % nbuf, c).wait()
        data_full = chunk_vmem[c % nbuf]
        for u in range(nsplit):
            # sub-window u of the chunk: bounds shift by u*ksub; windows
            # past the segment end self-mask (hi <= 0 => empty in_seg)
            data = data_full[:, u * ksub:(u + 1) * ksub]
            q = _chunk_quantities(data, px, py, T, done,
                                  start - off0 - c * KCHUNK - u * ksub,
                                  span - c * KCHUNK - u * ksub,
                                  origin=forig)
            rgbz = data[C_R:C_R + 4, :]        # [4, ksub]
            w = q["w"]                          # [PIX, ksub]
            # color accumulation at bf16 2x2 split precision: the v5e MXU
            # truncates f32 operands to bf16 at DEFAULT, which puts
            # ~0.4-1.5% error on accumulated pixel colors — a ~40 dB PSNR
            # ceiling on the rendered image (TPU-vs-CPU fwd parity
            # measured 1.5e-2 max abs). Three passes (hi*hi + hi*mid +
            # mid*hi) cut that to ~2^-16.
            w_h, w_m = _split2(w)
            c_h, c_m = _split2(rgbz)

            def acc_dot(a_bf, b_bf):
                return jax.lax.dot_general(
                    a_bf, b_bf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = (acc + acc_dot(w_h, c_h) + acc_dot(w_h, c_m)
                   + acc_dot(w_m, c_h))
            if with_tidx:  # training never reads tidx (eval-only output)
                wm_chunk = jnp.max(w, axis=1, keepdims=True)
                gid = data[C_GID:C_GID + 1, :]
                sel_gid = jnp.max(
                    jnp.where((w >= wm_chunk) & (w > 0.0), gid, -1.0),
                    axis=1, keepdims=True,
                )
                better = wm_chunk > wmax
                wmax = jnp.where(better, wm_chunk, wmax)
                bgid = jnp.where(better, sel_gid, bgid)
            T, done = q["T_out"], q["done_out"]
        return c + 1, T, done, acc, wmax, bgid

    init = (
        jnp.int32(0),
        jnp.ones((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),   # done latch as f32 0/1
        jnp.zeros((PIX, 4), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.full((PIX, 1), -1.0, jnp.float32),
    )
    c_fin, T, done, acc, wmax, bgid = jax.lax.while_loop(cond, body, init)

    # drain the prefetched-but-unconsumed DMAs after an early exit
    for w in range(nbuf - 1):
        @pl.when(c_fin + w < nchunks)
        def _(w=w):
            get_dma((c_fin + w) % nbuf, c_fin + w).wait()

    out_ref[0] = jnp.concatenate(
        [acc, T, wmax, bgid, jnp.zeros((PIX, 1), jnp.float32)], axis=1
    )


def _bwd_kernel(start_ref, end_ref, inst_ref, dpix_ref, _dinst_in_ref,
                dinst_ref, chunk_vmem, dchunk_vmem, old_vmem, sems, wsems,
                rmw_sem, *, grid_x, kchunk=KCHUNK_BWD, nbuf: int = 2):
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    off0 = (start // CHUNK) * CHUNK
    seg = end - start
    span = end - off0
    nchunks = jnp.where(seg > 0, pl.cdiv(span, kchunk), 0)
    # The HEAD gradient block [off0, off0+CHUNK) is shared with the
    # PREDECESSOR tile's segment when start is unaligned: its already-
    # written lanes are read back and added to ours (read-modify-write —
    # race-free: the grid is sequential on the single core and every
    # program drains its write DMAs before retiring). All other blocks
    # contain only this tile's lanes plus SUCCESSOR lanes, which are
    # written as zeros here and read-modify-written by the successor.
    need_rmw = (start > off0) & (nchunks > 0)
    NH = kchunk // CHUNK
    px, py = _pixel_coords(t, grid_x)

    @pl.when(need_rmw)
    def _():
        pltpu.make_async_copy(
            dinst_ref.at[:, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
            old_vmem, rmw_sem,
        ).start()

    dpix = dpix_ref[0]                     # [PIX, 8]
    d_rgbz = dpix[:, D_R:D_R + 4]          # [PIX, 4]
    Q = dpix[:, D_Q:D_Q + 1]               # [PIX, 1]

    # Pixel-monomial moment matrix (constant per tile): all six per-channel
    # column reductions below factor through Σ_p dpow·{1,x,y,x²,xy,y²} with
    # TILE-LOCAL pixel coords (x,y ∈ [0,16): local monomials keep the
    # moment recombination cancellation-free — global px² ~ 6e5 would
    # amplify f32 roundoff ~6e3x), so ONE [8,PIX]@[PIX,CHUNK] MXU matmul
    # replaces six [1,PIX]@[PIX,CHUNK] matmuls + eleven [PIX,CHUNK]
    # elementwise products of the round-1 kernel.
    lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pxr = (lin_r % 16).astype(jnp.float32)          # [1, PIX] local x
    pyr = (lin_r // 16).astype(jnp.float32)         # [1, PIX] local y
    mon = jnp.concatenate(
        [jnp.ones((1, PIX), jnp.float32), pxr, pyr, pxr * pxr, pxr * pyr,
         pyr * pyr, jnp.zeros((2, PIX), jnp.float32)],
        axis=0,
    )                                               # [8, PIX]
    tile_y = t // grid_x
    tile_x = t - tile_y * grid_x
    ox = (tile_x * 16).astype(jnp.float32)          # tile origin
    oy = (tile_y * 16).astype(jnp.float32)

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * kchunk, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, kchunk)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def put_dma_h(slot, c, h):
        off = pl.multiple_of(off0 + c * kchunk + h * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            dchunk_vmem.at[slot, :, pl.ds(h * CHUNK, CHUNK)],
            dinst_ref.at[:, pl.ds(off, CHUNK)],
            wsems.at[slot, h],
        )

    def h_in_seg(c, h):
        return (c * kchunk + h * CHUNK) < span

    def put_start(slot, c):
        for h in range(NH):
            @pl.when(h_in_seg(c, h))
            def _(h=h):
                put_dma_h(slot, c, h).start()

    def put_wait(slot, c):
        for h in range(NH):
            @pl.when(h_in_seg(c, h))
            def _(h=h):
                put_dma_h(slot, c, h).wait()

    for w in range(nbuf - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w % nbuf, w).start()

    noexit = _noexit_config()
    nsplit = _split_config()
    ksub = kchunk // nsplit

    def cond(state):
        c, T, done, S = state
        if noexit:
            return c < nchunks
        return (c < nchunks) & (jnp.min(done) < 0.5)

    def body(state):
        c, T, done, S = state

        @pl.when(c + (nbuf - 1) < nchunks)
        def _():
            get_dma((c + (nbuf - 1)) % nbuf, c + (nbuf - 1)).start()

        get_dma(c % nbuf, c).wait()
        data_full = chunk_vmem[c % nbuf]

        @pl.when(c >= 2)
        def _():
            put_wait(c % 2, c - 2)

        for u in range(nsplit):
            data = data_full[:, u * ksub:(u + 1) * ksub]
            q = _chunk_quantities(data, px, py, T, done,
                                  start - off0 - c * kchunk - u * ksub,
                                  span - c * kchunk - u * ksub,
                                  origin=(ox, oy))
            w, contribute = q["w"], q["contribute"]

            rgbz = data[C_R:C_R + 4, :]        # [4, ksub]
            # v_{p,i} = c_i . d_rgb_p + z_i * d_z_p    [PIX, ksub]
            # HIGHEST: the v5e MXU truncates f32 dot operands to bf16 by
            # default; these two dots feed position/covariance gradients
            # (~3e-4 relative error measured at default precision)
            v = _v_dot(d_rgbz, rgbz)
            wv = w * v
            S_incl = S + (_mxu_cumsum(wv) if _mxuscan_config()
                      else _inclusive_scan(wv, jnp.add, 0.0))
            dalpha = jnp.where(
                contribute,
                q["T_run"] * v - (Q - S_incl) / q["om"],
                0.0,
            )
            op = data[C_OP:C_OP + 1, :]
            dpower = jnp.where(contribute, op * q["Gv"] * dalpha, 0.0)

            # moments Σ_p dpower·{1,x,y,x²,xy,y²} (tile-local coords; see
            # the `mon` comment above): one MXU contraction, then the six
            # channel gradients recombine on [1, ksub] vectors. The mon
            # side is EXACT in bf16 (integer monomials <= 225), so a
            # manual bf16x3 split of dpower gives the HIGHEST-precision
            # result in 3 MXU passes instead of 6 (Mosaic rejects
            # per-operand precision).
            mon_bf = mon.astype(jnp.bfloat16)
            dp_h, dp_m, dp_l = _split3(dpower)

            def mon_dot(dp_bf):
                return jax.lax.dot_general(
                    mon_bf, dp_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            mm = mon_dot(dp_h) + mon_dot(dp_m) + mon_dot(dp_l)  # [8, ksub]
            s0 = mm[0:1, :]
            sx, sy = mm[1:2, :], mm[2:3, :]
            sxx, sxy, syy = mm[3:4, :], mm[4:5, :], mm[5:6, :]
            mxl = data[C_MX:C_MX + 1, :] - ox  # [1, ksub] local mean
            myl = data[C_MY:C_MY + 1, :] - oy
            gx = sx - mxl * s0                 # Σ dpower·dx
            gy = sy - myl * s0
            ca = data[C_CA:C_CA + 1, :]
            cb = data[C_CB:C_CB + 1, :]
            cc = data[C_CC:C_CC + 1, :]
            dmx = ca * gx + cb * gy
            dmy = cb * gx + cc * gy
            dca = -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
            dcb = -(sxy - mxl * sy - myl * sx + mxl * myl * s0)
            dcc = -0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
            # dop = Σ Gv·dalpha = Σ dpower / op (contributing instances
            # have op ≥ ALPHA_MIN; zero-channel padding rows: 0/eps = 0)
            dop = s0 / jnp.maximum(op, 1e-9)
            # d color / d depth: [4, ksub] = d_rgbz^T @ w. Manual bf16
            # 2x2 split (4 passes, ~2^-16 relative error from the dropped
            # mid*mid term) instead of HIGHEST's 6; DEFAULT's single bf16
            # pass costs ~4e-3 relative error on color gradients.
            a_h, a_m = _split2(d_rgbz)
            w_h, w_m = _split2(w)

            def col_dot(a_bf, b_bf):
                return jax.lax.dot_general(
                    a_bf, b_bf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            dcol = col_dot(a_h, w_h) + col_dot(a_h, w_m) + col_dot(a_m, w_h)

            dchunk_vmem[c % 2, :, pl.ds(u * ksub, ksub)] = jnp.concatenate(
                [dmx, dmy, dca, dcb, dcc, dop, dcol,
                 jnp.zeros((NCH - 10, ksub), jnp.float32)],
                axis=0,
            )
            T, done = q["T_out"], q["done_out"]
            S = S + jnp.sum(wv, axis=1, keepdims=True)

        # merge the PREDECESSOR's gradients into the shared head block
        # (its lanes are zero in our dchunk thanks to the in_seg mask, and
        # our lanes are zero in its write, so the sum is exact)
        @pl.when((c == 0) & need_rmw)
        def _():
            pltpu.make_async_copy(
                dinst_ref.at[:, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
                old_vmem, rmw_sem,
            ).wait()
            dchunk_vmem[0, :, pl.ds(0, CHUNK)] = (
                dchunk_vmem[0, :, pl.ds(0, CHUNK)] + old_vmem[...]
            )

        put_start(c % 2, c)
        return c + 1, T, done, S

    init = (
        jnp.int32(0),
        jnp.ones((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),   # done latch as f32 0/1
        jnp.zeros((PIX, 1), jnp.float32),
    )
    c_fin, _, _, _ = jax.lax.while_loop(cond, body, init)

    for w in range(nbuf - 1):           # drain unconsumed read prefetches
        @pl.when(c_fin + w < nchunks)
        def _(w=w):
            get_dma((c_fin + w) % nbuf, c_fin + w).wait()

    @pl.when(c_fin >= 2)                # drain outstanding writes
    def _():
        put_wait(c_fin % 2, c_fin - 2)

    @pl.when(c_fin >= 1)
    def _():
        put_wait((c_fin - 1) % 2, c_fin - 1)


def _bwd_kernel_smt(start_ref, end_ref, inst_ref, dpix_ref, _dinst_in_ref,
                    dinst_ref, chunk_vmem, dchunk_vmem, old_vmem, sems,
                    wsems, rmw_sem, *, grid_x, tpb, kchunk=KCHUNK_BWD,
                    nbuf: int = 2):
    p = pl.program_id(0)
    noexit = _noexit_config()
    nsplit = _split_config()
    ksub = kchunk // nsplit
    NH = kchunk // CHUNK
    lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pxr = (lin_r % 16).astype(jnp.float32)
    pyr = (lin_r // 16).astype(jnp.float32)
    mon = jnp.concatenate(
        [jnp.ones((1, PIX), jnp.float32), pxr, pyr, pxr * pxr, pxr * pyr,
         pyr * pyr, jnp.zeros((2, PIX), jnp.float32)],
        axis=0,
    )
    for j in range(tpb):
        t = p * tpb + j
        start = start_ref[t]
        end = end_ref[t]
        off0 = (start // CHUNK) * CHUNK
        seg = end - start
        span = end - off0
        nchunks = jnp.where(seg > 0, pl.cdiv(span, kchunk), 0)
        need_rmw = (start > off0) & (nchunks > 0)
        px, py = _pixel_coords(t, grid_x)

        @pl.when(need_rmw)
        def _(off0=off0):
            pltpu.make_async_copy(
                dinst_ref.at[:, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
                old_vmem, rmw_sem,
            ).start()

        dpix = dpix_ref[j]
        d_rgbz = dpix[:, D_R:D_R + 4]
        Q = dpix[:, D_Q:D_Q + 1]
        tile_y = t // grid_x
        tile_x = t - tile_y * grid_x
        ox = (tile_x * 16).astype(jnp.float32)
        oy = (tile_y * 16).astype(jnp.float32)

        def get_dma(slot, c, off0=off0):
            off = pl.multiple_of(off0 + c * kchunk, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, kchunk)],
                chunk_vmem.at[slot],
                sems.at[slot],
            )

        def put_dma_h(slot, c, h, off0=off0):
            off = pl.multiple_of(off0 + c * kchunk + h * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                dchunk_vmem.at[slot, :, pl.ds(h * CHUNK, CHUNK)],
                dinst_ref.at[:, pl.ds(off, CHUNK)],
                wsems.at[slot, h],
            )

        def h_in_seg(c, h, span=span):
            return (c * kchunk + h * CHUNK) < span

        def put_start(slot, c, put_dma_h=put_dma_h, h_in_seg=h_in_seg):
            for h in range(NH):
                @pl.when(h_in_seg(c, h))
                def _(h=h):
                    put_dma_h(slot, c, h).start()

        def put_wait(slot, c, put_dma_h=put_dma_h, h_in_seg=h_in_seg):
            for h in range(NH):
                @pl.when(h_in_seg(c, h))
                def _(h=h):
                    put_dma_h(slot, c, h).wait()

        for w in range(nbuf - 1):
            @pl.when(w < nchunks)
            def _(w=w, get_dma=get_dma):
                get_dma(w % nbuf, w).start()

        def cond(state, nchunks=nchunks):
            c, T, done, S = state
            if noexit:
                return c < nchunks
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def body(state, get_dma=get_dma, put_start=put_start,
                 put_wait=put_wait, nchunks=nchunks, start=start,
                 off0=off0, span=span, px=px, py=py, ox=ox, oy=oy,
                 d_rgbz=d_rgbz, Q=Q, need_rmw=need_rmw):
            c, T, done, S = state

            @pl.when(c + (nbuf - 1) < nchunks)
            def _():
                get_dma((c + (nbuf - 1)) % nbuf, c + (nbuf - 1)).start()

            get_dma(c % nbuf, c).wait()
            data_full = chunk_vmem[c % nbuf]

            @pl.when(c >= 2)
            def _():
                put_wait(c % 2, c - 2)

            for u in range(nsplit):
                data = data_full[:, u * ksub:(u + 1) * ksub]
                q = _chunk_quantities(data, px, py, T, done,
                                      start - off0 - c * kchunk - u * ksub,
                                      span - c * kchunk - u * ksub,
                                      origin=(ox, oy))
                w, contribute = q["w"], q["contribute"]
                rgbz = data[C_R:C_R + 4, :]
                v = _v_dot(d_rgbz, rgbz)
                wv = w * v
                S_incl = S + (_mxu_cumsum(wv) if _mxuscan_config()
                              else _inclusive_scan(wv, jnp.add, 0.0))
                dalpha = jnp.where(
                    contribute,
                    q["T_run"] * v - (Q - S_incl) / q["om"],
                    0.0,
                )
                op = data[C_OP:C_OP + 1, :]
                dpower = jnp.where(contribute, op * q["Gv"] * dalpha, 0.0)
                mon_bf = mon.astype(jnp.bfloat16)
                dp_h, dp_m, dp_l = _split3(dpower)

                def mon_dot(dp_bf):
                    return jax.lax.dot_general(
                        mon_bf, dp_bf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                mm = mon_dot(dp_h) + mon_dot(dp_m) + mon_dot(dp_l)
                s0 = mm[0:1, :]
                sx, sy = mm[1:2, :], mm[2:3, :]
                sxx, sxy, syy = mm[3:4, :], mm[4:5, :], mm[5:6, :]
                mxl = data[C_MX:C_MX + 1, :] - ox
                myl = data[C_MY:C_MY + 1, :] - oy
                gx = sx - mxl * s0
                gy = sy - myl * s0
                ca = data[C_CA:C_CA + 1, :]
                cb = data[C_CB:C_CB + 1, :]
                cc = data[C_CC:C_CC + 1, :]
                dmx = ca * gx + cb * gy
                dmy = cb * gx + cc * gy
                dca = -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
                dcb = -(sxy - mxl * sy - myl * sx + mxl * myl * s0)
                dcc = -0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
                dop = s0 / jnp.maximum(op, 1e-9)
                a_h, a_m = _split2(d_rgbz)
                w_h, w_m = _split2(w)

                def col_dot(a_bf, b_bf):
                    return jax.lax.dot_general(
                        a_bf, b_bf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                dcol = (col_dot(a_h, w_h) + col_dot(a_h, w_m)
                        + col_dot(a_m, w_h))
                dchunk_vmem[c % 2, :, pl.ds(u * ksub, ksub)] = (
                    jnp.concatenate(
                        [dmx, dmy, dca, dcb, dcc, dop, dcol,
                         jnp.zeros((NCH - 10, ksub), jnp.float32)],
                        axis=0,
                    ))
                T, done = q["T_out"], q["done_out"]
                S = S + jnp.sum(wv, axis=1, keepdims=True)

            @pl.when((c == 0) & need_rmw)
            def _():
                pltpu.make_async_copy(
                    dinst_ref.at[
                        :, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
                    old_vmem, rmw_sem,
                ).wait()
                dchunk_vmem[0, :, pl.ds(0, CHUNK)] = (
                    dchunk_vmem[0, :, pl.ds(0, CHUNK)] + old_vmem[...]
                )

            put_start(c % 2, c)
            return c + 1, T, done, S

        init = (
            jnp.int32(0),
            jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32),
        )
        c_fin, _, _, _ = jax.lax.while_loop(cond, body, init)

        for w in range(nbuf - 1):
            @pl.when(c_fin + w < nchunks)
            def _(w=w, get_dma=get_dma, c_fin=c_fin, nchunks=nchunks):
                get_dma((c_fin + w) % nbuf, c_fin + w).wait()

        @pl.when(c_fin >= 2)
        def _(put_wait=put_wait, c_fin=c_fin):
            put_wait(c_fin % 2, c_fin - 2)

        @pl.when(c_fin >= 1)
        def _(put_wait=put_wait, c_fin=c_fin):
            put_wait((c_fin - 1) % 2, c_fin - 1)


def _smt_config() -> int:
    """GPT_BLEND_SMT=tpb runs tpb complete per-tile loops SEQUENTIALLY in
    one program (round 5). A null-body probe measured ~1.55 us of pure
    per-program pipeline/grid overhead (exp_blendiso nullc: 3.88 ms for
    2500 trivial programs) — ~35% of the forward. Unlike the rejected MT
    kernels (per-chunk interleave across tiles, state in VMEM), each
    tile here keeps its full register-carried while-loop; only the grid
    dispatch is amortized. 0/1 = off."""
    return max(1, int(os.environ.get("GPT_BLEND_SMT", "1")))


def _fwd_kernel_smt(start_ref, end_ref, inst_ref, out_ref, chunk_vmem,
                    sems, *, grid_x, tpb, with_tidx: bool = True,
                    nbuf: int = 2):
    p = pl.program_id(0)
    noexit = _noexit_config()
    nsplit = _split_config()
    ksub = KCHUNK // nsplit
    for j in range(tpb):
        t = p * tpb + j
        start = start_ref[t]
        end = end_ref[t]
        off0 = (start // CHUNK) * CHUNK
        seg = end - start
        span = end - off0
        nchunks = jnp.where(seg > 0, pl.cdiv(span, KCHUNK), 0)
        px, py = _pixel_coords(t, grid_x)
        f_tile_y = t // grid_x
        forig = ((t - f_tile_y * grid_x).astype(jnp.float32) * 16.0,
                 f_tile_y.astype(jnp.float32) * 16.0)

        def get_dma(slot, c, off0=off0):
            off = pl.multiple_of(off0 + c * KCHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, KCHUNK)],
                chunk_vmem.at[slot],
                sems.at[slot],
            )

        for w in range(nbuf - 1):
            @pl.when(w < nchunks)
            def _(w=w, get_dma=get_dma, nchunks=nchunks):
                get_dma(w % nbuf, w).start()

        def cond(state, nchunks=nchunks):
            c, T, done, acc, wmax, bgid = state
            if noexit:
                return c < nchunks
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def body(state, get_dma=get_dma, nchunks=nchunks, start=start,
                 off0=off0, span=span, px=px, py=py, forig=forig):
            c, T, done, acc, wmax, bgid = state

            @pl.when(c + (nbuf - 1) < nchunks)
            def _():
                get_dma((c + (nbuf - 1)) % nbuf, c + (nbuf - 1)).start()

            get_dma(c % nbuf, c).wait()
            data_full = chunk_vmem[c % nbuf]
            for u in range(nsplit):
                data = data_full[:, u * ksub:(u + 1) * ksub]
                q = _chunk_quantities(data, px, py, T, done,
                                      start - off0 - c * KCHUNK - u * ksub,
                                      span - c * KCHUNK - u * ksub,
                                      origin=forig)
                rgbz = data[C_R:C_R + 4, :]
                w = q["w"]
                w_h, w_m = _split2(w)
                c_h, c_m = _split2(rgbz)

                def acc_dot(a_bf, b_bf):
                    return jax.lax.dot_general(
                        a_bf, b_bf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                acc = (acc + acc_dot(w_h, c_h) + acc_dot(w_h, c_m)
                       + acc_dot(w_m, c_h))
                if with_tidx:
                    wm_chunk = jnp.max(w, axis=1, keepdims=True)
                    gid = data[C_GID:C_GID + 1, :]
                    sel_gid = jnp.max(
                        jnp.where((w >= wm_chunk) & (w > 0.0), gid, -1.0),
                        axis=1, keepdims=True,
                    )
                    better = wm_chunk > wmax
                    wmax = jnp.where(better, wm_chunk, wmax)
                    bgid = jnp.where(better, sel_gid, bgid)
                T, done = q["T_out"], q["done_out"]
            return c + 1, T, done, acc, wmax, bgid

        init = (
            jnp.int32(0),
            jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 4), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32),
            jnp.full((PIX, 1), -1.0, jnp.float32),
        )
        c_fin, T, done, acc, wmax, bgid = jax.lax.while_loop(
            cond, body, init)

        for w in range(nbuf - 1):
            @pl.when(c_fin + w < nchunks)
            def _(w=w, get_dma=get_dma, c_fin=c_fin, nchunks=nchunks):
                get_dma((c_fin + w) % nbuf, c_fin + w).wait()

        out_ref[j] = jnp.concatenate(
            [acc, T, wmax, bgid, jnp.zeros((PIX, 1), jnp.float32)], axis=1
        )


def _pad_inst_T(instT, kchunk=KCHUNK):
    """Pad the [NCH, P] buffer with one extra (benign) chunk so the fixed-
    size DMA at the final partial chunk stays in bounds."""
    return jnp.concatenate(
        [instT, jnp.zeros((instT.shape[0], kchunk), instT.dtype)], axis=1
    )


# ---------------------------------------------------------------------------
# Multi-tile contiguous-streaming kernels (GPT_BLEND_MT=1).
#
# The classic kernels run one program per tile and pay a ~0.8 us fixed cost
# per chunk-iteration (loop bookkeeping + DMA sync; Mosaic cannot pipeline
# across while-loop iterations), plus an average ~0.75-chunk ceil tail PER
# TILE. With ~2500 tiles and ~480-instance average segments that fixed cost
# dominates the blend time (NOTES.md round-3 breakdown: ~15 of 27 ms).
#
# Here one program owns TPB consecutive tiles and streams their UNION
# window [start[t0], end[t0+TPB-1]) — contiguous, because segments are
# ordered and adjacent (tile_end[t] == tile_start[t+1]) — in CHUNK-aligned
# windows. Each chunk is processed once per INTERSECTING tile (pl.when
# branch per owned tile), so iteration count drops ~TPBx toward
# span/KCHUNK while VPU work stays proportional to real instances. Per-tile
# blend state lives in VMEM: the forward reuses its own out block (acc/T/
# wmax/gid are output channels; the done latch borrows the pad channel and
# is zeroed at the end), the backward keeps (T, done, S) in scratch.
#
# The math per (tile, chunk) pair is IDENTICAL to the classic kernel
# (_chunk_quantities with the same lane bounds), so outputs are bit-exact.
# ---------------------------------------------------------------------------
def _mt_config():
    """(tpb, kchunk) when GPT_BLEND_MT=1, else None. Read at TRACE time —
    flipping the env between jit invalidations switches kernels."""
    if os.environ.get("GPT_BLEND_MT", "0") != "1":
        return None
    tpb = int(os.environ.get("GPT_BLEND_TPB", "4"))
    kx = int(os.environ.get("GPT_KCHUNK_X_MT",
                            os.environ.get("GPT_KCHUNK_X", "2")))
    return tpb, CHUNK * kx


def _fwd_kernel_mt(start_ref, end_ref, inst_ref, out_ref, chunk_vmem, sems,
                   *, grid_x, tpb, kchunk, with_tidx: bool = True):
    p = pl.program_id(0)
    t0 = p * tpb
    w_start = start_ref[t0]
    w_end = end_ref[t0 + tpb - 1]
    off0 = (w_start // CHUNK) * CHUNK
    span = w_end - off0
    nchunks = jnp.where(w_end > w_start, pl.cdiv(span, kchunk), 0)

    init = jnp.concatenate(
        [jnp.zeros((PIX, 4), jnp.float32),       # acc rgbz
         jnp.ones((PIX, 1), jnp.float32),        # T
         jnp.zeros((PIX, 1), jnp.float32),       # wmax
         jnp.full((PIX, 1), -1.0, jnp.float32),  # bgid
         jnp.zeros((PIX, 1), jnp.float32)],      # done latch (pad channel)
        axis=1,
    )
    for j in range(tpb):
        out_ref[j] = init

    pxy = [_pixel_coords(t0 + j, grid_x) for j in range(tpb)]

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * kchunk, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, kchunk)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, alive = state
        return (c < nchunks) & (alive > 0.5)

    def body(state):
        c, _ = state

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        data = chunk_vmem[c % 2]
        base = off0 + c * kchunk
        alive_acc = jnp.float32(0.0)
        for j in range(tpb):
            t = t0 + j
            s_j = start_ref[t]
            e_j = end_ref[t]
            not_done = jnp.min(out_ref[j, :, O_PAD]) < 0.5
            active = (s_j < base + kchunk) & (e_j > base) & not_done

            @pl.when(active)
            def _(j=j, s_j=s_j, e_j=e_j):
                st = out_ref[j]
                q = _chunk_quantities(
                    data, pxy[j][0], pxy[j][1], st[:, O_T:O_T + 1],
                    st[:, O_PAD:O_PAD + 1], s_j - base, e_j - base,
                )
                rgbz = data[C_R:C_R + 4, :]
                w = q["w"]
                w_h, w_m = _split2(w)
                c_h, c_m = _split2(rgbz)

                def acc_dot(a_bf, b_bf):
                    return jax.lax.dot_general(
                        a_bf, b_bf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                acc = (st[:, O_R:O_R + 4] + acc_dot(w_h, c_h)
                       + acc_dot(w_h, c_m) + acc_dot(w_m, c_h))
                wmax = st[:, O_WMAX:O_WMAX + 1]
                bgid = st[:, O_GID:O_GID + 1]
                if with_tidx:
                    wm_chunk = jnp.max(w, axis=1, keepdims=True)
                    gid = data[C_GID:C_GID + 1, :]
                    sel_gid = jnp.max(
                        jnp.where((w >= wm_chunk) & (w > 0.0), gid, -1.0),
                        axis=1, keepdims=True,
                    )
                    better = wm_chunk > wmax
                    wmax = jnp.where(better, wm_chunk, wmax)
                    bgid = jnp.where(better, sel_gid, bgid)
                out_ref[j] = jnp.concatenate(
                    [acc, q["T_out"], wmax, bgid, q["done_out"]], axis=1
                )

            alive_acc = jnp.maximum(
                alive_acc,
                jnp.where(
                    (e_j > base + kchunk)
                    & (jnp.min(out_ref[j, :, O_PAD]) < 0.5),
                    1.0, 0.0,
                ),
            )
        return c + 1, alive_acc

    c_fin, _ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                               jnp.float32(1.0)))

    @pl.when(c_fin < nchunks)           # drain prefetch after early exit
    def _():
        get_dma(c_fin % 2, c_fin).wait()

    for j in range(tpb):                # clear the borrowed done channel
        st = out_ref[j]
        out_ref[j] = jnp.concatenate(
            [st[:, :O_PAD], jnp.zeros((PIX, 1), jnp.float32)], axis=1
        )


def _bwd_kernel_mt(start_ref, end_ref, inst_ref, dpix_ref, _dinst_in_ref,
                   dinst_ref, chunk_vmem, dchunk_vmem, state_vmem, old_vmem,
                   sems, wsems, rmw_sem, *, grid_x, tpb, kchunk):
    p = pl.program_id(0)
    t0 = p * tpb
    w_start = start_ref[t0]
    w_end = end_ref[t0 + tpb - 1]
    off0 = (w_start // CHUNK) * CHUNK
    span = w_end - off0
    nchunks = jnp.where(w_end > w_start, pl.cdiv(span, kchunk), 0)
    need_rmw = (w_start > off0) & (nchunks > 0)
    NH = kchunk // CHUNK

    @pl.when(need_rmw)
    def _():
        pltpu.make_async_copy(
            dinst_ref.at[:, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
            old_vmem, rmw_sem,
        ).start()

    # per-tile state: ch0 T, ch1 done, ch2 S (running inclusive wv prefix)
    state_init = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32),
         jnp.zeros((PIX, 7), jnp.float32)], axis=1
    )
    for j in range(tpb):
        state_vmem[j] = state_init

    pxy = [_pixel_coords(t0 + j, grid_x) for j in range(tpb)]
    lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pxr = (lin_r % 16).astype(jnp.float32)
    pyr = (lin_r // 16).astype(jnp.float32)
    mon = jnp.concatenate(
        [jnp.ones((1, PIX), jnp.float32), pxr, pyr, pxr * pxr, pxr * pyr,
         pyr * pyr, jnp.zeros((2, PIX), jnp.float32)],
        axis=0,
    )
    mon_bf = mon.astype(jnp.bfloat16)

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * kchunk, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, kchunk)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def put_dma_h(slot, c, h):
        off = pl.multiple_of(off0 + c * kchunk + h * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            dchunk_vmem.at[slot, :, pl.ds(h * CHUNK, CHUNK)],
            dinst_ref.at[:, pl.ds(off, CHUNK)],
            wsems.at[slot, h],
        )

    def h_in_seg(c, h):
        return (c * kchunk + h * CHUNK) < span

    def put_start(slot, c):
        for h in range(NH):
            @pl.when(h_in_seg(c, h))
            def _(h=h):
                put_dma_h(slot, c, h).start()

    def put_wait(slot, c):
        for h in range(NH):
            @pl.when(h_in_seg(c, h))
            def _(h=h):
                put_dma_h(slot, c, h).wait()

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, alive = state
        return (c < nchunks) & (alive > 0.5)

    def body(state):
        c, _ = state

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        data = chunk_vmem[c % 2]
        base = off0 + c * kchunk

        @pl.when(c >= 2)
        def _():
            put_wait(c % 2, c - 2)

        dchunk_vmem[c % 2] = jnp.zeros((NCH, kchunk), jnp.float32)

        alive_acc = jnp.float32(0.0)
        for j in range(tpb):
            t = t0 + j
            s_j = start_ref[t]
            e_j = end_ref[t]
            not_done = jnp.min(state_vmem[j, :, 1]) < 0.5
            active = (s_j < base + kchunk) & (e_j > base) & not_done

            @pl.when(active)
            def _(j=j, s_j=s_j, e_j=e_j):
                st = state_vmem[j]
                T_in = st[:, 0:1]
                done_in = st[:, 1:2]
                S = st[:, 2:3]
                q = _chunk_quantities(
                    data, pxy[j][0], pxy[j][1], T_in, done_in,
                    s_j - base, e_j - base,
                )
                w, contribute = q["w"], q["contribute"]
                dpix = dpix_ref[j]
                d_rgbz = dpix[:, D_R:D_R + 4]
                Q = dpix[:, D_Q:D_Q + 1]
                rgbz = data[C_R:C_R + 4, :]
                v = _v_dot(d_rgbz, rgbz)
                wv = w * v
                S_incl = S + (_mxu_cumsum(wv) if _mxuscan_config()
                      else _inclusive_scan(wv, jnp.add, 0.0))
                dalpha = jnp.where(
                    contribute,
                    q["T_run"] * v - (Q - S_incl) / q["om"],
                    0.0,
                )
                op = data[C_OP:C_OP + 1, :]
                dpower = jnp.where(contribute, op * q["Gv"] * dalpha, 0.0)
                dp_h, dp_m, dp_l = _split3(dpower)

                def mon_dot(dp_bf):
                    return jax.lax.dot_general(
                        mon_bf, dp_bf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                mm = mon_dot(dp_h) + mon_dot(dp_m) + mon_dot(dp_l)
                s0 = mm[0:1, :]
                sx, sy = mm[1:2, :], mm[2:3, :]
                sxx, sxy, syy = mm[3:4, :], mm[4:5, :], mm[5:6, :]
                tile_y = t // grid_x
                tile_x = t - tile_y * grid_x
                ox = (tile_x * 16).astype(jnp.float32)
                oy = (tile_y * 16).astype(jnp.float32)
                mxl = data[C_MX:C_MX + 1, :] - ox
                myl = data[C_MY:C_MY + 1, :] - oy
                gx = sx - mxl * s0
                gy = sy - myl * s0
                ca = data[C_CA:C_CA + 1, :]
                cb = data[C_CB:C_CB + 1, :]
                cc = data[C_CC:C_CC + 1, :]
                dmx = ca * gx + cb * gy
                dmy = cb * gx + cc * gy
                dca = -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
                dcb = -(sxy - mxl * sy - myl * sx + mxl * myl * s0)
                dcc = -0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
                dop = s0 / jnp.maximum(op, 1e-9)
                a_h, a_m = _split2(d_rgbz)
                w_h, w_m = _split2(w)

                def col_dot(a_bf, b_bf):
                    return jax.lax.dot_general(
                        a_bf, b_bf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                dcol = (col_dot(a_h, w_h) + col_dot(a_h, w_m)
                        + col_dot(a_m, w_h))
                # different tiles' segments occupy disjoint lanes, so the
                # per-tile contributions sum exactly
                dchunk_vmem[c % 2] = dchunk_vmem[c % 2] + jnp.concatenate(
                    [dmx, dmy, dca, dcb, dcc, dop, dcol,
                     jnp.zeros((NCH - 10, kchunk), jnp.float32)],
                    axis=0,
                )
                state_vmem[j] = jnp.concatenate(
                    [q["T_out"], q["done_out"],
                     S + jnp.sum(wv, axis=1, keepdims=True),
                     jnp.zeros((PIX, 5), jnp.float32)],
                    axis=1,
                )

            alive_acc = jnp.maximum(
                alive_acc,
                jnp.where(
                    (e_j > base + kchunk)
                    & (jnp.min(state_vmem[j, :, 1]) < 0.5),
                    1.0, 0.0,
                ),
            )

        @pl.when((c == 0) & need_rmw)
        def _():
            pltpu.make_async_copy(
                dinst_ref.at[:, pl.ds(pl.multiple_of(off0, CHUNK), CHUNK)],
                old_vmem, rmw_sem,
            ).wait()
            dchunk_vmem[0, :, pl.ds(0, CHUNK)] = (
                dchunk_vmem[0, :, pl.ds(0, CHUNK)] + old_vmem[...]
            )

        put_start(c % 2, c)
        return c + 1, alive_acc

    c_fin, _ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                               jnp.float32(1.0)))

    @pl.when(c_fin < nchunks)           # drain unconsumed read prefetch
    def _():
        get_dma(c_fin % 2, c_fin).wait()

    @pl.when(c_fin >= 2)                # drain outstanding writes
    def _():
        put_wait(c_fin % 2, c_fin - 2)

    @pl.when(c_fin >= 1)
    def _():
        put_wait((c_fin - 1) % 2, c_fin - 1)


# ---------------------------------------------------------------------------
# Flat-grid pipelined blend kernels (GPT_BLEND_FLAT; round 5).
#
# The classic kernels pay ~0.8 us of fixed cost per chunk-iteration: Mosaic
# cannot software-pipeline across `lax.while_loop` iterations, so every
# chunk serializes DMA-wait -> compute -> DMA-issue bookkeeping (NOTES.md
# rounds 3-4; the multi-tile variant proved the cost is per-(tile,chunk)
# state access, not loop arithmetic). Here the chunk loop is restructured
# INTO the Pallas grid: one sequential grid step per (tile, chunk) work
# item, with scalar-prefetched tables driving the BlockSpec index maps.
# Mosaic's standard pipeline machinery then double-buffers the instance
# blocks across grid steps — the next chunk's DMA is in flight while the
# current chunk computes, with none of the manual-DMA/while-loop overhead.
#
# Correctness hinges on an ordering invariant of the instance stream: tile
# segments are ordered and contiguous (tile_end[t] == tile_start[t+1]), so
# over the flattened work list BOTH the output-tile index (forward) and the
# instance-block index (backward) are non-decreasing, with revisits only at
# consecutive steps. That is exactly the revisiting pattern the Pallas TPU
# pipeline supports (the canonical matmul k-reduction): a block whose index
# is unchanged from the previous step stays in VMEM and is accumulated
# in-place; it is written back to HBM only when the index advances. The
# backward therefore needs NO manual write DMAs and NO read-modify-write of
# shared boundary blocks — a block shared by two tiles' segments is simply
# revisited by the successor's first work item and accumulated in VMEM.
#
# The early-exit of the classic kernels (skip remaining chunks once every
# pixel's transmittance latch trips) becomes a cheap VPU skip: the grid
# still visits each work item (the block DMA is ~20 ns of the ~820 GB/s
# HBM stream — negligible), but `pl.when` skips the blend math. The
# per-(tile,chunk) math is _chunk_quantities with the same lane bounds, so
# outputs are bit-identical to the classic kernels.
# ---------------------------------------------------------------------------
def _flat_config():
    """KCHUNK for the flat kernels when GPT_BLEND_FLAT=1, else None.
    Read at trace time (env flips switch kernels between jit caches)."""
    if os.environ.get("GPT_BLEND_FLAT", "0") != "1":
        return None
    kx = int(os.environ.get("GPT_KCHUNK_X_FLAT",
                            os.environ.get("GPT_KCHUNK_X", "2")))
    return CHUNK * kx


def _build_worklist(tile_start, tile_end, kchunk, nblocks):
    """Flatten per-tile chunk loops into one work list (XLA-side, per frame).

    Work item i covers instance block woff[i] (units of kchunk) for tile
    wt[i]. Items are emitted tile-major, chunks ascending; tiles with empty
    segments get no items (their out blocks are back-filled by the caller).
    Returns (wt, woff, ft, nwork1) all int32, sized to the STATIC bound
    NW = nblocks + T (#distinct blocks + <=1 boundary revisit per tile);
    padding items alias the last real (tile, block) so every index stays
    monotone, and carry zero work via the i >= nwork guard in the kernels.
    ft[t] = first work-item index of tile t (detects chunk 0 in-kernel).
    """
    T = tile_start.shape[0]
    NW = nblocks + T
    i32 = jnp.int32
    seg = tile_end - tile_start
    base = tile_start // kchunk
    nch = jnp.where(
        seg > 0, (tile_end - base * kchunk + kchunk - 1) // kchunk, 0
    ).astype(i32)
    cum = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(nch).astype(i32)]
    )  # [T+1]
    nwork = cum[T]
    ii = jnp.arange(NW, dtype=i32)
    wt0 = jnp.clip(
        jnp.searchsorted(cum[1:], ii, side="right").astype(i32), 0, T - 1
    )
    woff0 = jnp.clip(base[wt0] + (ii - cum[wt0]), 0, nblocks - 1)
    safe_last = jnp.maximum(nwork - 1, 0)
    pad = ii >= nwork
    wt = jnp.where(pad, wt0[safe_last], wt0)
    woff = jnp.where(pad, woff0[safe_last], woff0)
    return wt, woff, cum[:T], nwork.reshape(1)


_FWD_INIT_ROW = (0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0)  # acc,T,wmax,gid,done


def _fwd_kernel_flat(wt_ref, woff_ref, ts_ref, te_ref, ft_ref, nw_ref,
                     inst_ref, out_ref, *, grid_x, kchunk,
                     with_tidx: bool = True):
    i = pl.program_id(0)
    t = wt_ref[i]
    off = woff_ref[i]
    s = ts_ref[t]
    e = te_ref[t]
    valid = i < nw_ref[0]
    first = valid & (i == ft_ref[t])
    base = off * kchunk
    lo = s - base                       # may be negative past chunk 0 (fine)
    hi = jnp.where(valid, e - base, 0)  # padding items mask every lane
    last = valid & (base + kchunk >= e)

    @pl.when(first)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.full((PIX, 1), v, jnp.float32) for v in _FWD_INIT_ROW],
            axis=1,
        )

    st = out_ref[0]
    T_in = st[:, O_T:O_T + 1]
    done_in = st[:, O_PAD:O_PAD + 1]    # latch borrows the pad channel
    if os.environ.get("GPT_FLAT_NOSKIP", "0") == "1":
        # skip-check ablation: the cross-lane min costs a per-step VPU
        # reduction; the blend math is self-masking (contribute handles
        # done pixels), so correctness is unaffected
        work = valid
    else:
        work = valid & (jnp.min(done_in) < 0.5)

    @pl.when(work)
    def _():
        px, py = _pixel_coords(t, grid_x)
        q = _chunk_quantities(inst_ref[...], px, py, T_in, done_in, lo, hi)
        data = inst_ref[...]
        rgbz = data[C_R:C_R + 4, :]
        w = q["w"]
        w_h, w_m = _split2(w)
        c_h, c_m = _split2(rgbz)

        def acc_dot(a_bf, b_bf):
            return jax.lax.dot_general(
                a_bf, b_bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = (st[:, O_R:O_R + 4] + acc_dot(w_h, c_h) + acc_dot(w_h, c_m)
               + acc_dot(w_m, c_h))
        wmax = st[:, O_WMAX:O_WMAX + 1]
        bgid = st[:, O_GID:O_GID + 1]
        if with_tidx:
            wm_chunk = jnp.max(w, axis=1, keepdims=True)
            gid = data[C_GID:C_GID + 1, :]
            sel_gid = jnp.max(
                jnp.where((w >= wm_chunk) & (w > 0.0), gid, -1.0), axis=1,
                keepdims=True,
            )
            better = wm_chunk > wmax
            wmax = jnp.where(better, wm_chunk, wmax)
            bgid = jnp.where(better, sel_gid, bgid)
        done_ch = jnp.where(last, jnp.zeros((PIX, 1), jnp.float32),
                            q["done_out"])
        out_ref[0] = jnp.concatenate(
            [acc, q["T_out"], wmax, bgid, done_ch], axis=1
        )

    # early-exited tile: still clear the borrowed done channel at its end
    @pl.when(last & jnp.logical_not(work))
    def _():
        out_ref[0, :, O_PAD:O_PAD + 1] = jnp.zeros((PIX, 1), jnp.float32)


def _bwd_kernel_flat(wt_ref, woff_ref, ts_ref, te_ref, ft_ref, nw_ref,
                     inst_ref, dpix_ref, _dinit_ref, dout_ref, state_ref,
                     *, grid_x, kchunk):
    i = pl.program_id(0)
    t = wt_ref[i]
    off = woff_ref[i]
    s = ts_ref[t]
    e = te_ref[t]
    valid = i < nw_ref[0]
    first = valid & (i == ft_ref[t])
    base = off * kchunk
    lo = s - base
    hi = jnp.where(valid, e - base, 0)
    prev_off = woff_ref[jnp.maximum(i - 1, 0)]
    newblk = (i == 0) | (off != prev_off)

    @pl.when(first)
    def _():
        state_ref[...] = jnp.concatenate(
            [jnp.ones((PIX, 1), jnp.float32),
             jnp.zeros((PIX, 7), jnp.float32)], axis=1
        )  # ch0 T, ch1 done, ch2 S (running inclusive wv prefix)

    st = state_ref[...]
    T_in = st[:, 0:1]
    done_in = st[:, 1:2]
    S = st[:, 2:3]
    if os.environ.get("GPT_FLAT_NOSKIP", "0") == "1":
        work = valid
    else:
        work = valid & (jnp.min(done_in) < 0.5)

    # a new output block must be written even when the tile is done/padding
    @pl.when(newblk & jnp.logical_not(work))
    def _():
        dout_ref[...] = jnp.zeros((NCH, kchunk), jnp.float32)

    @pl.when(work)
    def _():
        px, py = _pixel_coords(t, grid_x)
        data = inst_ref[...]
        q = _chunk_quantities(data, px, py, T_in, done_in, lo, hi)
        w, contribute = q["w"], q["contribute"]
        dpix = dpix_ref[0]
        d_rgbz = dpix[:, D_R:D_R + 4]
        Q = dpix[:, D_Q:D_Q + 1]
        rgbz = data[C_R:C_R + 4, :]
        v = _v_dot(d_rgbz, rgbz)
        wv = w * v
        S_incl = S + (_mxu_cumsum(wv) if _mxuscan_config()
                      else _inclusive_scan(wv, jnp.add, 0.0))
        dalpha = jnp.where(
            contribute, q["T_run"] * v - (Q - S_incl) / q["om"], 0.0
        )
        op = data[C_OP:C_OP + 1, :]
        dpower = jnp.where(contribute, op * q["Gv"] * dalpha, 0.0)
        lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        pxr = (lin_r % 16).astype(jnp.float32)
        pyr = (lin_r // 16).astype(jnp.float32)
        mon_bf = jnp.concatenate(
            [jnp.ones((1, PIX), jnp.float32), pxr, pyr, pxr * pxr,
             pxr * pyr, pyr * pyr, jnp.zeros((2, PIX), jnp.float32)],
            axis=0,
        ).astype(jnp.bfloat16)
        dp_h, dp_m, dp_l = _split3(dpower)

        def mon_dot(dp_bf):
            return jax.lax.dot_general(
                mon_bf, dp_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        mm = mon_dot(dp_h) + mon_dot(dp_m) + mon_dot(dp_l)
        s0 = mm[0:1, :]
        sx, sy = mm[1:2, :], mm[2:3, :]
        sxx, sxy, syy = mm[3:4, :], mm[4:5, :], mm[5:6, :]
        tile_y = t // grid_x
        tile_x = t - tile_y * grid_x
        ox = (tile_x * 16).astype(jnp.float32)
        oy = (tile_y * 16).astype(jnp.float32)
        mxl = data[C_MX:C_MX + 1, :] - ox
        myl = data[C_MY:C_MY + 1, :] - oy
        gx = sx - mxl * s0
        gy = sy - myl * s0
        ca = data[C_CA:C_CA + 1, :]
        cb = data[C_CB:C_CB + 1, :]
        cc = data[C_CC:C_CC + 1, :]
        dmx = ca * gx + cb * gy
        dmy = cb * gx + cc * gy
        dca = -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
        dcb = -(sxy - mxl * sy - myl * sx + mxl * myl * s0)
        dcc = -0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
        dop = s0 / jnp.maximum(op, 1e-9)
        a_h, a_m = _split2(d_rgbz)
        w_h, w_m = _split2(w)

        def col_dot(a_bf, b_bf):
            return jax.lax.dot_general(
                a_bf, b_bf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dcol = col_dot(a_h, w_h) + col_dot(a_h, w_m) + col_dot(a_m, w_h)
        contrib = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop, dcol,
             jnp.zeros((NCH - 10, kchunk), jnp.float32)],
            axis=0,
        )

        @pl.when(newblk)
        def _():
            dout_ref[...] = contrib

        @pl.when(jnp.logical_not(newblk))
        def _():
            dout_ref[...] = dout_ref[...] + contrib

        state_ref[...] = jnp.concatenate(
            [q["T_out"], q["done_out"],
             S + jnp.sum(wv, axis=1, keepdims=True),
             jnp.zeros((PIX, 5), jnp.float32)], axis=1
        )


def _flat_prep(instT, tile_start, tile_end, kchunk):
    """Pad capacity to a block multiple and build the flat work list."""
    Pp = instT.shape[1]
    Ppad = ((Pp + kchunk - 1) // kchunk) * kchunk
    if Ppad != Pp:
        instT = jnp.concatenate(
            [instT, jnp.zeros((instT.shape[0], Ppad - Pp), instT.dtype)],
            axis=1,
        )
    nblocks = Ppad // kchunk
    wt, woff, ft, nw = _build_worklist(tile_start, tile_end, kchunk, nblocks)
    return instT, wt, woff, ft, nw, nblocks + tile_start.shape[0]


def _pad_tiles(tile_start, tile_end, tpb):
    """Pad the per-tile segment arrays to a multiple of tpb with EMPTY
    segments pinned at the last real end (so padded programs see
    zero-length windows and the mixed program's window stays tight)."""
    T = tile_start.shape[0]
    Tp = ((T + tpb - 1) // tpb) * tpb
    if Tp == T:
        return tile_start, tile_end, T
    fill = tile_end[-1:]
    pad = jnp.broadcast_to(fill, (Tp - T,))
    return (jnp.concatenate([tile_start, pad]),
            jnp.concatenate([tile_end, pad]), Tp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rasterize_binned(instT, tile_start, tile_end, grid_x, grid_y,
                     interpret=None, with_tidx: bool = True):
    """Blend packed instances into per-tile buffers.

    instT: [16, P] float32 packed instance SoA (rows = channel constants;
    the layout the kernels DMA directly — keep data in this orientation
    end-to-end, transposes of [P,16] cost real HBM bandwidth);
    tile_start/tile_end: [T] int32 segment ranges — need NOT be
    CHUNK-aligned, but segments must be non-overlapping and ordered by
    tile index (the backward's head-block read-modify-write assumes the
    sharer of a straddled block is an EARLIER grid program);
    returns out_f [T, 256, 8] float32 (channels: r,g,b,depth,T_final,
    w_max, best_gid, pad).
    """
    return _rasterize_fwd_impl(instT, tile_start, tile_end, grid_x, grid_y,
                               interpret, with_tidx)


def _rasterize_fwd_impl(instT, tile_start, tile_end, grid_x, grid_y,
                        interpret, with_tidx=True):
    if interpret is None:
        interpret = _interpret_default()
    num_tiles = grid_x * grid_y
    flat = _flat_config()
    if flat is not None:
        kchunk = flat
        instT, wt, woff, ft, nw, NW = _flat_prep(
            instT, tile_start, tile_end, kchunk
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(NW,),
            in_specs=[pl.BlockSpec(
                (NCH, kchunk),
                lambda i, wt, woff, ts, te, ft, nw: (0, woff[i]),
                memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec(
                (1, PIX, 8),
                lambda i, wt, woff, ts, te, ft, nw: (wt[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_flat, grid_x=grid_x,
                              kchunk=kchunk, with_tidx=with_tidx),
            out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, 8), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(wt, woff, tile_start, tile_end, ft, nw, instT)
        # empty tiles get no work items; back-fill their init rows
        empty = (tile_end - tile_start) <= 0
        return jnp.where(
            empty[:, None, None],
            jnp.asarray(_FWD_INIT_ROW, jnp.float32), out,
        )
    smt = _smt_config()
    if smt > 1:
        nbuf = int(os.environ.get("GPT_BLEND_NBUF", "2"))
        instT = _pad_inst_T(instT)
        ts, te, Tp = _pad_tiles(tile_start, tile_end, smt)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp // smt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (smt, PIX, 8), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((nbuf, NCH, KCHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_smt, grid_x=grid_x, tpb=smt,
                              with_tidx=with_tidx, nbuf=nbuf),
            out_shape=jax.ShapeDtypeStruct((Tp, PIX, 8), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ts, te, instT)
        return out[:num_tiles]
    mt = _mt_config()
    if mt is not None:
        tpb, kchunk = mt
        instT = _pad_inst_T(instT, kchunk)
        ts, te, Tp = _pad_tiles(tile_start, tile_end, tpb)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp // tpb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (tpb, PIX, 8), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, NCH, kchunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_mt, grid_x=grid_x, tpb=tpb,
                              kchunk=kchunk, with_tidx=with_tidx),
            out_shape=jax.ShapeDtypeStruct((Tp, PIX, 8), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ts, te, instT)
        return out[:num_tiles]
    instT = _pad_inst_T(instT)
    nbuf = int(os.environ.get("GPT_BLEND_NBUF", "2"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIX, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, NCH, KCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x=grid_x, with_tidx=with_tidx,
                          nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_end, instT)


def _rasterize_fwd_rule(instT, tile_start, tile_end, grid_x, grid_y,
                        interpret, with_tidx):
    out = _rasterize_fwd_impl(instT, tile_start, tile_end, grid_x, grid_y,
                              interpret, with_tidx)
    return out, (instT, tile_start, tile_end, out)


def _rasterize_bwd_rule(grid_x, grid_y, interpret, with_tidx, res, g):
    instT0, tile_start, tile_end, out = res
    if interpret is None:
        interpret = _interpret_default()
    num_tiles = grid_x * grid_y

    # Per-pixel backward inputs: channels 0-3 are d(rgb,z); channel 4 is
    # Q = Σ_j w_j v_j + dT · T_final, assembled from forward outputs.
    d_rgbz = g[:, :, O_R:O_R + 4]                          # [T, PIX, 4]
    acc_rgbz = out[:, :, O_R:O_R + 4]
    Q = jnp.sum(d_rgbz * acc_rgbz, axis=2, keepdims=True) + (
        g[:, :, O_T:O_T + 1] * out[:, :, O_T:O_T + 1]
    )
    dpix = jnp.concatenate(
        [d_rgbz, Q, jnp.zeros((num_tiles, PIX, 3), jnp.float32)], axis=2
    )

    flat = _flat_config()
    if flat is not None:
        kchunk = flat
        instT, wt, woff, ft, nw, NW = _flat_prep(
            instT0, tile_start, tile_end, kchunk
        )
        dinst_init = jnp.zeros_like(instT)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(NW,),
            in_specs=[
                pl.BlockSpec(
                    (NCH, kchunk),
                    lambda i, wt, woff, ts, te, ft, nw: (0, woff[i]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, PIX, 8),
                    lambda i, wt, woff, ts, te, ft, nw: (wt[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.HBM),  # aliased init, unused
            ],
            out_specs=pl.BlockSpec(
                (NCH, kchunk),
                lambda i, wt, woff, ts, te, ft, nw: (0, woff[i]),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((PIX, 8), jnp.float32),   # per-tile (T, done, S)
            ],
        )
        dinstT = pl.pallas_call(
            functools.partial(_bwd_kernel_flat, grid_x=grid_x,
                              kchunk=kchunk),
            out_shape=jax.ShapeDtypeStruct(instT.shape, jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={8: 0},  # dinst_init (after 6 scalars)
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(wt, woff, tile_start, tile_end, ft, nw, instT, dpix, dinst_init)
        return (dinstT[:, :instT0.shape[1]], None, None)

    smt = _smt_config()
    if smt > 1:
        nbuf = int(os.environ.get("GPT_BLEND_NBUF", "2"))
        ts, te, Tp = _pad_tiles(tile_start, tile_end, smt)
        dpix_s = jnp.concatenate(
            [dpix, jnp.zeros((Tp - num_tiles, PIX, 8), jnp.float32)],
            axis=0,
        ) if Tp != num_tiles else dpix
        instT = _pad_inst_T(instT0, KCHUNK_BWD)
        dinst_init = jnp.zeros_like(instT)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp // smt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((smt, PIX, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, NCH, KCHUNK_BWD), jnp.float32),
                pltpu.VMEM((2, NCH, KCHUNK_BWD), jnp.float32),
                pltpu.VMEM((NCH, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((2, KCHUNK_BWD // CHUNK)),
                pltpu.SemaphoreType.DMA,
            ],
        )
        dinstT = pl.pallas_call(
            functools.partial(_bwd_kernel_smt, grid_x=grid_x, tpb=smt,
                              nbuf=nbuf),
            out_shape=jax.ShapeDtypeStruct(instT.shape, jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ts, te, instT, dpix_s, dinst_init)
        return (dinstT[:, :-KCHUNK_BWD], None, None)
    mt = _mt_config()
    if mt is not None:
        tpb, kchunk = mt
        ts, te, Tp = _pad_tiles(tile_start, tile_end, tpb)
        dpix_p = jnp.concatenate(
            [dpix, jnp.zeros((Tp - num_tiles, PIX, 8), jnp.float32)],
            axis=0,
        ) if Tp != num_tiles else dpix
        instT = _pad_inst_T(instT0, kchunk)
        dinst_init = jnp.zeros_like(instT)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp // tpb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((tpb, PIX, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, NCH, kchunk), jnp.float32),
                pltpu.VMEM((2, NCH, kchunk), jnp.float32),
                pltpu.VMEM((tpb, PIX, 8), jnp.float32),   # per-tile state
                pltpu.VMEM((NCH, CHUNK), jnp.float32),    # RMW readback
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, kchunk // CHUNK)),
                pltpu.SemaphoreType.DMA,
            ],
        )
        dinstT = pl.pallas_call(
            functools.partial(_bwd_kernel_mt, grid_x=grid_x, tpb=tpb,
                              kchunk=kchunk),
            out_shape=jax.ShapeDtypeStruct(instT.shape, jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ts, te, instT, dpix_p, dinst_init)
        return (dinstT[:, :-kchunk], None, None)

    instT = _pad_inst_T(instT0, KCHUNK_BWD)
    dinst_init = jnp.zeros_like(instT)
    nbuf = int(os.environ.get("GPT_BLEND_NBUF", "2"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, NCH, KCHUNK_BWD), jnp.float32),
            pltpu.VMEM((2, NCH, KCHUNK_BWD), jnp.float32),
            pltpu.VMEM((NCH, CHUNK), jnp.float32),    # RMW head-block readback
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((2, KCHUNK_BWD // CHUNK)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dinstT = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x=grid_x, nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct(instT.shape, jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # zero-initialized dinst is donated
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_end, instT, dpix, dinst_init)
    return (dinstT[:, :-KCHUNK_BWD], None, None)


rasterize_binned.defvjp(_rasterize_fwd_rule, _rasterize_bwd_rule)
