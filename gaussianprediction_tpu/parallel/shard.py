"""Multi-chip training step: tile-band + data-parallel via shard_map.

The scaling design (SURVEY.md §5.7-5.8, BASELINE north star): inside a
('data', 'tile') mesh each device
  1. projects the REPLICATED Gaussian set (cheap, O(N)),
  2. rasterizes only its band of tile rows for its data-group's camera
     (ops/rasterize.py tile_band — the Pallas grid shrinks per device),
  3. all-gathers the bands along 'tile' into the full frame and computes the
     photometric loss once per data group,
  4. the loss is pmean'd over 'data'.
Differentiating through the shard_map then yields exactly the right
communication for free: the all_gather transposes to a scatter of the
band's pixel cotangents back to its owner, and the replicated parameter
inputs transpose to a psum of per-Gaussian gradients across the whole mesh
— gradient all-reduce overlapped with the backward by XLA scheduling.

Batch semantics match the reference's gradient accumulation
(/root/reference/train.py:112-133): loss summed over the camera batch,
radii combined with max, visibility with any.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models import deform as D
from gaussianprediction_tpu.models.gaussians import GaussianState, get_shs
from gaussianprediction_tpu.ops import rasterize
from gaussianprediction_tpu.ops.projection import TILE
from gaussianprediction_tpu.train import optimizer as opt_mod
from gaussianprediction_tpu.train.step import deform_for_stage, time_with_noise
from gaussianprediction_tpu.utils.image import psnr


def make_sharded_train_step(
    cfg: Config, stage: int, width: int, height: int, spatial_scale: float,
    sh_degree: int, total_frame: int, bg, mesh: Mesh,
    interpret: Optional[bool] = None, capacity_multiplier: float = 24,
    band_capacity_slack: float = 2.0, shard_deform: bool = True,
):
    """Build the pjit'd multi-chip train step over `mesh` ('data','tile').

    The camera batch size must equal the 'data' axis size. Signature of the
    returned step mirrors train/step.py but takes batched cameras/gts/times:
      step(state, opt_state, cams_batched, gts [B,H,W,3], times [B],
           iteration, key) -> (state', opt_state', metrics)
    """
    bg = jnp.asarray(bg, jnp.float32)
    if interpret is None:
        # decide from the MESH devices, not the process default backend:
        # with the axon TPU plugin registered, a CPU mesh (virtual-device
        # dryrun) would otherwise pick the Mosaic path and fail to compile
        platform = mesh.devices.flat[0].platform
        interpret = platform not in ("tpu", "axon")
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    grid_y = (height + TILE - 1) // TILE
    band = -(-grid_y // n_tile)                 # tile rows per device
    pad_h = band * n_tile * TILE                # band-padded frame height
    # band-proportional instance capacity (VERDICT r2 weak #4): a device
    # rendering band/grid_y of the tile rows sees ~that fraction of the
    # instances, so its sorts/expand/interleave shrink with the shard. The
    # slack factor absorbs non-uniform vertical instance distribution;
    # overflow still surfaces as metrics["n_dropped"] (Trainer warns).
    mult_band = max(
        2.0, capacity_multiplier * (band / grid_y) * band_capacity_slack
    ) if n_tile > 1 else float(capacity_multiplier)

    # params with a leading per-Gaussian capacity axis — the slices each
    # tile-device deforms when shard_deform is on
    PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity", "motion_feature", "opacity_thres")

    def band_loss(params, dummy, state, cam, gt_full, t, iteration, key,
                  active_deg):
        """Runs per-device inside shard_map; returns replicated loss."""
        ty0 = jax.lax.axis_index("tile") * band
        C = state.capacity
        if shard_deform and n_tile > 1 and C % n_tile == 0:
            # Shard the O(N) per-Gaussian deform over 'tile' (VERDICT r3
            # #4): each device deforms its C/n_tile slice and the deformed
            # arrays are all-gathered (11 floats/Gaussian — ~9 MB at 200k,
            # a fraction of a ms over ICI vs the ~15 ms stage-1 MLP that
            # otherwise runs replicated). Row-independent math, so the
            # gathered result is bit-identical to the replicated form;
            # stage-1 noise is drawn at FULL capacity and sliced so the
            # RNG matches the single-device step.
            kk = jax.lax.axis_index("tile")
            Csh = C // n_tile

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, kk * Csh, Csh, 0)

            noise = (sl(jax.random.normal(key, (C, 3)))
                     if stage == 1 else None)
            p_sl = {k2: (sl(v) if k2 in PER_GAUSSIAN else v)
                    for k2, v in params.items()}
            st_sl = state.replace(
                params=p_sl, alive=sl(state.alive),
                xyz_gradient_accum=sl(state.xyz_gradient_accum),
                xyz_gradient_accum_max=sl(state.xyz_gradient_accum_max),
                denom=sl(state.denom), max_radii2D=sl(state.max_radii2D),
                xyz_motion_accum_max=sl(state.xyz_motion_accum_max),
                motion_denom=sl(state.motion_denom),
            )
            out_sl = deform_for_stage(
                p_sl, cfg, st_sl, t, iteration, key, stage, noise=noise
            )

            def ag(x):
                return jax.lax.all_gather(x, "tile", axis=0, tiled=True)

            from gaussianprediction_tpu.models.deform import DeformOut

            out = DeformOut(
                xyz=ag(out_sl.xyz), rotation=ag(out_sl.rotation),
                scaling=ag(out_sl.scaling), opacity=ag(out_sl.opacity),
            )
        else:
            out = deform_for_stage(
                params, cfg, state, t, iteration, key, stage
            )
        shs = get_shs(params)
        if active_deg is not None:
            # SH warm-up by coefficient zeroing under the static max-degree
            # basis (same trick as train/step.py render_at_time): one
            # compiled sharded step per stage instead of one per degree
            kidx = jnp.arange(shs.shape[-1])
            shs = jnp.where(
                kidx[None, None, :] < (active_deg + 1) ** 2, shs, 0.0
            )
        pkg = rasterize.render(
            out.xyz, out.scaling, out.rotation, out.opacity, shs,
            cam, width, height, bg, sh_degree=sh_degree, alive=state.alive,
            means2d_dummy=dummy, interpret=interpret,
            capacity_multiplier=mult_band,
            tile_band=(ty0, band), need_tidx=False,
        )
        band_img = pkg["render"]                        # [band*16, W, 3]
        full = jax.lax.all_gather(band_img, "tile", axis=0, tiled=True)
        full = full[:height]                            # crop band padding

        # BAND-LOCAL photometric loss (VERDICT r2 weak #4): every device
        # used to run the full-frame SSIM+L1 replicated after the gather —
        # an O(H·W) term that doesn't shrink with the mesh. Instead each
        # device computes the loss terms over ITS band's rows only (the
        # 11-tap SSIM window needs a 5-row halo, available from the
        # gathered frame; truncated-tap 'same' blur == zero-padded image,
        # so zero-padding the frame edges reproduces full-frame SSIM
        # exactly) and the partial sums are psum'd over 'tile'. Identical
        # loss to the replicated form up to summation order.
        HALO = 5  # window_size 11 // 2
        bh = band * TILE
        y0px = ty0 * TILE
        padded_rows = HALO + pad_h + HALO
        fz = jnp.pad(full, ((HALO, padded_rows - HALO - height), (0, 0),
                            (0, 0)))
        gz = jnp.pad(gt_full, ((HALO, padded_rows - HALO - height),
                               (0, 0), (0, 0)))
        sl_f = jax.lax.dynamic_slice(
            fz, (y0px, 0, 0), (bh + 2 * HALO, width, 3)
        )
        sl_g = jax.lax.dynamic_slice(
            gz, (y0px, 0, 0), (bh + 2 * HALO, width, 3)
        )
        from gaussianprediction_tpu.utils.image import _ssim_maps

        ssim_map, _ = _ssim_maps(sl_f, sl_g, 11, 1.5, valid=False)
        row_idx = y0px + jnp.arange(bh)
        rmask = (row_idx < height).astype(jnp.float32)[:, None, None]
        ssim_sum = jnp.sum(ssim_map[HALO:HALO + bh] * rmask)
        l1_sum = jnp.sum(
            jnp.abs(sl_f[HALO:HALO + bh] - sl_g[HALO:HALO + bh]) * rmask
        )
        denom = float(height * width * 3)
        ssim_mean = jax.lax.psum(ssim_sum, "tile") / denom
        l1_mean = jax.lax.psum(l1_sum, "tile") / denom
        lam = cfg.opt.lambda_dssim
        loss = (1.0 - lam) * l1_mean + lam * (1.0 - ssim_mean)
        loss = loss + D.motion_feature_reg(
            params, cfg, iteration, 2 if stage >= 2 else stage
        )
        # batch-sum over 'data' (reference sums batch losses, train.py:119)
        loss = jax.lax.psum(loss, "data") / 1.0
        sg = jax.lax.stop_gradient
        aux = {
            "l1": jax.lax.pmean(sg(l1_mean), "data"),
            "psnr": jax.lax.pmean(sg(psnr(full, gt_full)), "data"),
            "radii": jax.lax.pmax(sg(pkg["radii"]), "data"),
            "visibility": jax.lax.pmax(
                sg(pkg["visibility_filter"]).astype(jnp.int32), "data"
            ) > 0,
            "n_dropped": jax.lax.pmax(
                jax.lax.pmax(sg(pkg["n_dropped"]), "tile"), "data"
            ),
        }
        return loss, aux

    def unbatched_cam(cams):
        return jax.tree.map(lambda x: x[0], cams)

    def step(state: GaussianState, opt_state, cams, gts, times, iteration,
             key, active_deg=None):
        if active_deg is None:  # full-degree rendering (masking is a no-op)
            active_deg = jnp.int32(sh_degree)
        k_noise, k_time = jax.random.split(key)
        # independent time-noise draw per data-parallel camera (the
        # reference draws fresh noise per accumulated batch member,
        # /root/reference/train.py:92-99)
        time_keys = jax.random.split(k_time, times.shape[0])
        times = jax.vmap(
            lambda t, k: time_with_noise(cfg, t, iteration, k, stage,
                                         total_frame)
        )(times, time_keys)
        dummy = jnp.zeros((state.capacity, 2), jnp.float32)

        def inner(params, dummy):
            # per-device camera: strip the leading batch axis inside the map
            def f(params, dummy, state, cam, gt, t, it, key, deg):
                return band_loss(
                    params, dummy, state, unbatched_cam(cam), gt[0], t[0],
                    it, key, deg,
                )
            sm = shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(), P(), jax.tree.map(
                    lambda _: P("data"), cams), P("data"), P("data"),
                    P(), P(), P()),
                out_specs=(P(), {
                    "l1": P(), "psnr": P(), "radii": P(),
                    "visibility": P(), "n_dropped": P(),
                }),
                check_vma=False,
            )
            return sm(params, dummy, state, cams, gts, times, iteration,
                      k_noise, active_deg)

        (loss, aux), (grads, vs_grads) = jax.value_and_grad(
            inner, argnums=(0, 1), has_aux=True
        )(state.params, dummy)

        vis = aux["visibility"]
        vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
        in_densify = iteration < cfg.opt.densify_until_iter
        if stage >= 2:
            in_adaptive = (
                (iteration < cfg.train.adaptive_end_iter
                 + cfg.train.second_stage_iteration)
                & (state.n_kpts() < cfg.model.kpt_capacity())
            )
        else:
            in_adaptive = jnp.asarray(False)
        do_stats = (in_densify | in_adaptive) & vis
        state = state.replace(
            max_radii2D=jnp.where(
                do_stats, jnp.maximum(state.max_radii2D, aux["radii"]),
                state.max_radii2D,
            ),
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.where(do_stats, vs_norm, 0.0),
            xyz_gradient_accum_max=jnp.where(
                do_stats & (vs_norm > state.xyz_gradient_accum_max),
                vs_norm, state.xyz_gradient_accum_max,
            ),
            denom=state.denom + do_stats.astype(jnp.float32),
        )
        new_params, opt_state = opt_mod.adam_step(
            state.params, grads, opt_state, cfg, max(stage, 1),
            spatial_scale, iteration,
        )
        state = state.replace(params=new_params)
        metrics = {"loss": loss, "l1": aux["l1"], "psnr": aux["psnr"],
                   "n_dropped": aux["n_dropped"]}
        return state, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1)), n_data
