"""Host training loop: stage schedule, densification cadence, checkpoints.

Twin of `training()` (/root/reference/train.py:36-201). The host owns the
rare, shape-changing or schedule-driven events; everything per-iteration is
inside the stage's jitted step (train/step.py):

  host: camera sampling, SH-degree bumps (1k cadence), stage transitions
        (k-means keypoint init at second_stage+1, fresh optimizers),
        densify/prune/opacity-reset cadence, keypoint growth cadence,
        checkpoint/PLY saves, logging
  device: render + loss + backward + masked adam + stat accumulation

Stage transitions match gaussian_model.py:246-250; densification cadence
matches train.py:163-192 (including the max_gaussian_size gate and the
white-background extra opacity reset).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.data.scene import Scene
from gaussianprediction_tpu.models import gaussians as G
from gaussianprediction_tpu.ops.kmeans import feature_kmeans
from gaussianprediction_tpu.train import checkpoint as ckpt
from gaussianprediction_tpu.train import densify as dn
from gaussianprediction_tpu.train import optimizer as opt_mod
from gaussianprediction_tpu.train.step import make_train_step


def stage_of(cfg: Config, iteration: int) -> int:
    if iteration < cfg.train.jointly_iteration:
        return 0
    if iteration <= cfg.train.second_stage_iteration:
        return 1
    if iteration <= cfg.train.third_stage_iteration:
        return 2
    return 3


def set_super_keypoints(state: G.GaussianState, cfg: Config, key):
    """k-means keypoint init (set_superKeypoints, gaussian_model.py:128-136):
    cluster [xyz, motion_feature], keypoint = member-mean xyz."""
    p = state.params
    feats = jnp.concatenate([p["xyz"], p["motion_feature"]], axis=-1)
    k = cfg.model.max_points
    super_xyz, super_feats = feature_kmeans(
        p["xyz"], feats, k, key, valid=state.alive
    )
    params = dict(p)
    params["super_xyz"] = p["super_xyz"].at[:k].set(super_xyz)
    params["super_feature"] = p["super_feature"].at[:k].set(
        super_feats[:, 3:]
    )
    kpt_alive = jnp.zeros_like(state.kpt_alive).at[:k].set(True)
    return state.replace(params=params, kpt_alive=kpt_alive)


def distill_weight_init(state: G.GaussianState, cfg: Config,
                        n_steps: int, n_times: int = 8):
    """Pre-fit the blend-weight model to the stage-1 motion field
    (cfg.train.distill_init_steps; TPU-era improvement over the
    reference's random weight init at the transition,
    /root/reference/scene/gaussian_model.py:370-392).

    Teacher and keypoint deltas are precomputed at n_times timestamps
    (they do not depend on the weight model), the hybrid-KNN neighbor
    set is fixed (keypoints and canonical xyz are constant here), and
    only the encoder+MLP parameters are optimized with Adam at
    cfg.opt.hash_lr to minimize || blend - teacher ||^2 over xyz and
    rotation deltas. Returns the state with updated weight params."""
    from gaussianprediction_tpu.models import deform as D
    from gaussianprediction_tpu.models.gaussians import rotation_act
    from gaussianprediction_tpu.ops import hashgrid

    p = state.params
    xyz = jax.lax.stop_gradient(p["xyz"])
    times = jnp.linspace(0.0, 1.0, n_times)

    def deltas_at(t):
        t_pe = D.time_encode(cfg, t)
        teach_dx, teach_dq, _ = D.motion_delta(
            p, cfg, D.xyz_encode(cfg, xyz), p["motion_feature"], t_pe
        )
        kpt_dx, kpt_dq, _ = D.motion_delta(
            p, cfg, D.xyz_encode(cfg, p["super_xyz"]), p["super_feature"],
            t_pe,
        )
        if cfg.model.norm_rotation:
            teach_dq = rotation_act(teach_dq)
            kpt_dq = rotation_act(kpt_dq)
        kpt_dx = jnp.where(state.kpt_alive[:, None], kpt_dx, 0.0)
        kpt_dq = jnp.where(
            state.kpt_alive[:, None], kpt_dq, jnp.asarray([1.0, 0, 0, 0])
        )
        return teach_dx, teach_dq, kpt_dx, kpt_dq

    teach_dx, teach_dq, kpt_dx, kpt_dq = jax.vmap(deltas_at)(times)
    nn_idx, _, _ = D.blend_weights(p, cfg, state)  # fixed neighbor set
    K = cfg.model.nearest_num
    alive_w = state.alive.astype(jnp.float32)[None, :, None]
    n_alive = jnp.maximum(jnp.sum(state.alive), 1).astype(jnp.float32)

    m = cfg.model
    if m.weight_encoder == "fourier":
        from gaussianprediction_tpu.ops import fourier_enc

        B = fourier_enc.fourier_dirs(
            m.hash_levels, m.fourier_per_level, m.hash_min_res,
            m.hash_max_res, m.hash_bound,
        )
        enc_const = fourier_enc.fourier_encode(B, xyz, bound=m.hash_bound)

        def encode(wp):
            return enc_const
        wparams0 = {"weight_mlp": p["weight_mlp"]}
    elif m.weight_encoder == "brick":
        def encode(wp):
            return hashgrid.brickgrid_encode_fast(
                wp["hash_tables"], xyz, m.hash_bound, m.hash_min_res,
                m.hash_max_res,
            )
        wparams0 = {"weight_mlp": p["weight_mlp"],
                    "hash_tables": p["hash_tables"]}
    else:
        def encode(wp):
            return hashgrid.hashgrid_encode_fast(
                wp["hash_tables"], xyz, m.hash_bound, m.hash_min_res,
                m.hash_max_res,
            )
        wparams0 = {"weight_mlp": p["weight_mlp"],
                    "hash_tables": p["hash_tables"]}

    def loss_fn(wp):
        logits = hashgrid.mlp_apply(wp["weight_mlp"], encode(wp))
        w_xyz = jax.nn.softmax(logits[..., 0:K], axis=-1)
        w_r = jax.nn.softmax(logits[..., K:2 * K], axis=-1)
        blend_dx = jnp.einsum("nk,tnkc->tnc", w_xyz, kpt_dx[:, nn_idx])
        blend_dq = jnp.einsum("nk,tnkc->tnc", w_r, kpt_dq[:, nn_idx])
        ex = jnp.sum(((blend_dx - teach_dx) ** 2) * alive_w)
        eq = jnp.sum(((rotation_act(blend_dq) - rotation_act(teach_dq)) ** 2)
                     * alive_w)
        return (ex + eq) / (n_times * n_alive)

    lr = cfg.opt.hash_lr
    b1, b2, eps = 0.9, 0.999, 1e-15
    mom = jax.tree.map(jnp.zeros_like, wparams0)
    vel = jax.tree.map(jnp.zeros_like, wparams0)

    def step(carry, i):
        wp, mom, vel = carry
        loss, grads = jax.value_and_grad(loss_fn)(wp)
        mom = jax.tree.map(lambda m_, g_: b1 * m_ + (1 - b1) * g_, mom,
                           grads)
        vel = jax.tree.map(lambda v_, g_: b2 * v_ + (1 - b2) * g_ * g_,
                           vel, grads)
        t = (i + 1).astype(jnp.float32)
        wp = jax.tree.map(
            lambda p_, m_, v_: p_ - lr * (m_ / (1 - b1 ** t))
            / (jnp.sqrt(v_ / (1 - b2 ** t)) + eps),
            wp, mom, vel,
        )
        return (wp, mom, vel), loss

    (wparams, _, _), losses = jax.lax.scan(
        step, (wparams0, mom, vel), jnp.arange(n_steps, dtype=jnp.int32)
    )
    new_params = dict(p)
    new_params.update(wparams)
    return state.replace(params=new_params), losses


class Trainer:
    """Owns all mutable training state; `run()` trains to cfg.opt.iterations."""

    def __init__(self, cfg: Config, scene: Scene, seed: Optional[int] = None,
                 interpret: Optional[bool] = None, log_every: int = 100,
                 quiet: bool = False, steps_per_call: int = 1,
                 n_devices: int = 1, n_data: int = 1):
        self.cfg = cfg
        self.scene = scene
        self.interpret = interpret
        self.log_every = log_every
        self.quiet = quiet
        # steps_per_call > 1 scans K iterations per device invocation,
        # amortizing the per-call host round-trip (train/step.py
        # make_train_step_multi); chunks never cross host events.
        self.steps_per_call = steps_per_call
        # n_devices > 1 trains through the sharded ('data','tile') mesh step
        # (parallel/shard.py, SURVEY.md §5.8): n_data camera groups x
        # (n_devices/n_data) tile bands. Host events (densify, keypoint
        # init, checkpoints) operate on the replicated state unchanged.
        self.mesh = None
        self.n_data = n_data
        if n_devices > 1:
            from gaussianprediction_tpu.parallel.mesh import make_mesh

            assert n_devices % n_data == 0, (n_devices, n_data)
            # honor a CPU pin (GPT_FORCE_CPU / tests): the default-device
            # override means "train on the virtual CPU mesh", even though
            # the axon plugin still registers a TPU device
            devices = None
            pinned = jax.config.jax_default_device
            if pinned is not None and pinned.platform == "cpu":
                devices = jax.devices("cpu")
            self.mesh = make_mesh(
                n_data=n_data, n_tile=n_devices // n_data, devices=devices,
            )
        seed = cfg.train.seed if seed is None else seed
        self.key = jax.random.PRNGKey(2024 * seed)
        self.key, k_init = jax.random.split(self.key)
        self.state = G.create_from_pcd(
            k_init, cfg, scene.info.points, scene.info.colors
        )
        self.opt_state = opt_mod.init_adam(self.state.params)
        self.iteration = 0
        self.active_sh_degree = 0
        self.bg = (
            np.ones(3, np.float32) if cfg.model.white_background
            else np.zeros(3, np.float32)
        )
        cam0 = scene.train_cameras[0]
        self.width, self.height = cam0.width, cam0.height
        self._steps: Dict = {}
        self._history = []
        self.tb = None  # TensorBoard event writer, created in run()

        # jitted host-event helpers (cfg/extent closed over: configs are
        # mutable dataclasses, not hashable static args)
        extent = float(scene.cameras_extent)
        self._jit_set_kpts = jax.jit(
            lambda s, k: set_super_keypoints(s, cfg, k)
        )
        self._jit_densify = jax.jit(
            lambda s, o, k: dn.densify_and_prune_clone_split(
                s, o, cfg, extent, k
            ),
            donate_argnums=(0, 1),
        )
        self._jit_reset_opacity = jax.jit(
            dn.reset_opacity, donate_argnums=(0, 1)
        )
        self._jit_prune = {
            thr: jax.jit(
                (lambda thr_: lambda s: dn.prune(s, cfg, extent, thr_))(thr),
                donate_argnums=(0,),
            )
            for thr in (None, 20)
        }
        max_new = max(cfg.model.adaptive_points_num, 1)
        self._jit_grow_kpts = jax.jit(
            lambda s, o: dn.grow_keypoints_from_grads(s, o, cfg, max_new),
            donate_argnums=(0, 1),
        )
        self._jit_grow_kpts_teach = jax.jit(
            lambda s, o: dn.grow_keypoints_from_teaching(s, o, cfg, max_new),
            donate_argnums=(0, 1),
        )

        # probe-based instance-capacity sizing (cfg.model.capacity_auto):
        # jitted projection-only slot count for the CURRENT params at one
        # camera — every instance-stream cost scales with the static
        # capacity, so production sizes it like bench.py does instead of
        # paying the worst-case static multiplier
        from gaussianprediction_tpu.models.gaussians import (
            opacity_act, scaling_act,
        )
        from gaussianprediction_tpu.ops.instance_stream import (
            probe_slot_need,
        )

        def _probe(params, alive, cam_d):
            return probe_slot_need(
                params["xyz"], scaling_act(params["scaling"]),
                params["rotation"], opacity_act(params["opacity"]), cam_d,
                self.width, self.height, alive=alive,
            )

        self._jit_probe = jax.jit(_probe)
        if cfg.model.capacity_auto:
            self._auto_capacity(reason="init")

    def _probe_need(self, n_cams: int = 8) -> int:
        cams = self.scene.train_cameras
        sample = cams[:: max(1, len(cams) // n_cams)][:n_cams]
        return max(
            int(self._jit_probe(self.state.params, self.state.alive,
                                c.to_device_dict()))
            for c in sample
        )

    def _auto_capacity(self, reason: str, slack: float = 1.3,
                       iteration: Optional[int] = None):
        """Size capacity_multiplier from the probed slot need. Growing
        invalidates compiled steps (recompile, mandatory — drops bias
        training); SHRINKING is hysteresis-gated (>= 1.0 multiplier steps
        of slop) so the post-opacity-reset footprint collapse is
        harvested — every instance-stream cost scales with capacity, and
        training scenes otherwise stay stuck at their worst historical
        footprint (VERDICT r3 #3: stage-0 trained 3.9x slower than the
        bench purely from a stale mult 12.5) — without thrashing
        recompiles on small fluctuations."""
        import math

        need = self._probe_need()
        cap = max(self.state.capacity, 1)
        # quantize to 0.5 steps so densify-cadence probes don't recompile
        # on every small growth
        mult = max(2.0, math.ceil(slack * need / cap * 2.0) / 2.0)
        cur = float(self.cfg.model.capacity_multiplier)
        grow = mult > cur
        # shrink only while footprints are STABLE: right after an opacity
        # reset the 1/255-support rects collapse and then regrow as
        # opacities relearn — shrinking there would buy one recompile and
        # sell another a few hundred iterations later
        ri = max(self.cfg.opt.opacity_reset_interval, 1)
        it = self.iteration if iteration is None else iteration
        stable = (it % ri) > ri // 2
        shrink = mult <= cur - 1.0 and (
            stable or reason in ("init", "load")
        )
        if reason in ("init", "load") or grow or shrink:
            self.cfg.model.capacity_multiplier = mult
            if self._steps and (grow or shrink):
                self._steps.clear()
                if not self.quiet:
                    print(
                        f"[capacity] probe {need} slots; multiplier "
                        f"{cur:.2f} -> {mult:.2f} (recompile)"
                    )
            elif not self.quiet:
                print(
                    f"[capacity] {reason}: probe {need} slots -> "
                    f"multiplier {mult:.2f}"
                )

    # ---- jitted-step cache ------------------------------------------------
    # Steps compile ONCE per stage at the static max SH degree; the warm-up
    # degree is a traced int32 that zero-masks inactive coefficients inside
    # the step (same images to <= 1 ulp and the same Adam trajectory, see
    # render_at_time). This cuts the per-run compile count 4x vs keying on
    # (stage, active_sh_degree) at ~190 s per TPU step variant.
    def _step_fn(self, stage: int):
        key = (stage,)
        if key not in self._steps:
            self._steps[key] = make_train_step(
                self.cfg, stage, self.width, self.height,
                float(self.scene.cameras_extent), self.cfg.model.sh_degree,
                self.scene.total_frame, self.bg, interpret=self.interpret,
            )[0]
        return self._steps[key]

    def _batched_step_fn(self, stage: int, b: int):
        from gaussianprediction_tpu.train.step import make_train_step_batched

        key = ("batch", stage, b)
        if key not in self._steps:
            self._steps[key] = make_train_step_batched(
                self.cfg, stage, self.width, self.height,
                float(self.scene.cameras_extent), self.cfg.model.sh_degree,
                self.scene.total_frame, self.bg, b,
                interpret=self.interpret,
            )
        return self._steps[key]

    def _sharded_step_fn(self, stage: int):
        from gaussianprediction_tpu.parallel.shard import (
            make_sharded_train_step,
        )

        key = ("sharded", stage)
        if key not in self._steps:
            self._steps[key] = make_sharded_train_step(
                self.cfg, stage, self.width, self.height,
                float(self.scene.cameras_extent), self.cfg.model.sh_degree,
                self.scene.total_frame, self.bg, self.mesh,
                interpret=self.interpret,
                capacity_multiplier=self.cfg.model.capacity_multiplier,
            )[0]
        return self._steps[key]

    def train_one_sharded(self, iteration: int) -> Dict:
        """One sharded step: n_data cameras (gradient-accumulated across the
        'data' axis), each frame tile-band-sharded across 'tile'."""
        cfg = self.cfg
        if iteration % 1000 == 0 and self.active_sh_degree < cfg.model.sh_degree:
            self.active_sh_degree += 1
        self._maybe_stage_transition(iteration)
        stage = stage_of(cfg, iteration)
        cams = [self.scene.next_train_camera() for _ in range(self.n_data)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[c.to_device_dict() for c in cams],
        )
        gts = jnp.stack([jnp.asarray(c.load_image()) for c in cams])
        times = jnp.asarray([c.time for c in cams], jnp.float32)
        self.key, k_step = jax.random.split(self.key)
        step = self._sharded_step_fn(stage)
        self.state, self.opt_state, metrics = step(
            self.state, self.opt_state, cam_batch, gts, times,
            jnp.int32(iteration), k_step, jnp.int32(self.active_sh_degree),
        )
        self._last_cam = cams[-1]
        self._densification(iteration, stage)
        return metrics

    def _multi_step_fn(self, stage: int, k: int):
        from gaussianprediction_tpu.train.step import make_train_step_multi

        key = ("multi", stage, k)
        if key not in self._steps:
            self._steps[key] = make_train_step_multi(
                self.cfg, stage, self.width, self.height,
                float(self.scene.cameras_extent), self.cfg.model.sh_degree,
                self.scene.total_frame, self.bg, k,
                interpret=self.interpret,
            )
        return self._steps[key]

    def _chunk_end(self, a: int, iterations: int,
                   span: Optional[int] = None) -> int:
        """Largest b >= a such that iterations [a, b] contain no host event
        (chunk runs steps a..b in one device call; events at b are handled
        after the chunk, mirroring the reference's post-step ordering)."""
        cfg = self.cfg
        o, t = cfg.opt, cfg.train
        span = self.steps_per_call if span is None else span

        def next_mult(x, m):
            return ((x // m) + 1) * m

        # pre-step events at iteration e forbid e inside (a, b]
        pre = [next_mult(a, 1000)]  # SH bump happens before the step
        for e in (t.jointly_iteration, t.second_stage_iteration + 1,
                  t.third_stage_iteration + 1):
            if e > a:
                pre.append(e)
        # post-step events at e forbid e inside [a, b)
        post = [next_mult(a - 1, o.densification_interval)]
        post.append(next_mult(a - 1, o.opacity_reset_interval))
        post.append(next_mult(a - 1, t.adaptive_interval))
        for e in (list(t.save_iterations) + list(t.checkpoint_iterations)
                  + list(t.test_iterations)):
            if e >= a:
                post.append(e)
        b = min(
            a + span - 1,
            iterations,
            min(pre) - 1,
            min(post),
        )
        return b

    # ---- host events ------------------------------------------------------
    def _maybe_stage_transition(self, iteration: int):
        # Idempotent (guarded on n_kpts / a host flag) so diagnostics can
        # trigger the transition early without it re-running in the loop.
        cfg = self.cfg
        if (iteration == cfg.train.second_stage_iteration + 1
                and int(self.state.n_kpts()) == 0):
            self.key, k = jax.random.split(self.key)
            self.state = self._jit_set_kpts(self.state, k)
            if cfg.train.distill_init_steps > 0:
                # deterministic given (state, cfg): no RNG consumed
                self.state, dlosses = jax.jit(
                    lambda s: distill_weight_init(
                        s, cfg, cfg.train.distill_init_steps
                    )
                )(self.state)
                if not self.quiet:
                    print(
                        f"[iter {iteration}] distill init: blend-teacher "
                        f"mse {float(dlosses[0]):.3e} -> "
                        f"{float(dlosses[-1]):.3e}"
                    )
            self.opt_state = opt_mod.init_adam(self.state.params)
            if not self.quiet:
                print(f"[iter {iteration}] stage 2: keypoints initialized "
                      f"({int(self.state.n_kpts())})")
        if (iteration == cfg.train.third_stage_iteration + 1
                and not getattr(self, "_did_stage3", False)):
            self._did_stage3 = True
            self.opt_state = opt_mod.init_adam(self.state.params)
            if not self.quiet:
                print(f"[iter {iteration}] stage 3: joint optimization")

    def _densification(self, iteration: int, stage: int):
        cfg = self.cfg
        o = cfg.opt
        if iteration >= o.densify_until_iter:
            pass
        else:
            n_alive = int(self.state.n_alive())
            if (
                iteration > o.densify_from_iter
                and iteration % o.densification_interval == 0
                and n_alive < cfg.model.max_gaussian_size
            ):
                self.key, k = jax.random.split(self.key)
                self.state, self.opt_state = self._jit_densify(
                    self.state, self.opt_state, k
                )
            if iteration % o.opacity_reset_interval == 0 or (
                cfg.model.white_background and iteration == o.densify_from_iter
            ):
                self.state, self.opt_state = self._jit_reset_opacity(
                    self.state, self.opt_state
                )
            if (
                iteration > o.densify_from_iter
                and iteration % o.densification_interval == 0
            ):
                size_thr = 20 if iteration > o.opacity_reset_interval else None
                self.state = self._jit_prune[size_thr](self.state)
                if cfg.model.capacity_auto:
                    # densification changed footprints; grow the instance
                    # buffer (with recompile) before drops can bias
                    # training, or harvest a stable footprint collapse
                    self._auto_capacity(reason="densify",
                                        iteration=iteration)

        # adaptive keypoint growth (train.py:181-192): teaching-residual
        # growth first (densification_motion_postfix), then gradient-driven
        # densify_kpts — the reference's in-loop order.
        if stage >= 2 and (cfg.train.densify_from_grad
                           or cfg.train.densify_from_teaching):
            s2 = cfg.train.second_stage_iteration
            if (
                iteration < cfg.train.adaptive_end_iter + s2
                and int(self.state.n_kpts()) < cfg.model.kpt_capacity()
                and iteration > cfg.train.adaptive_from_iter + s2
                and iteration % cfg.train.adaptive_interval == 0
            ):
                if cfg.train.densify_from_teaching:
                    self.state, self.opt_state = self._jit_grow_kpts_teach(
                        self.state, self.opt_state
                    )
                if cfg.train.densify_from_grad:
                    self.state, self.opt_state = self._jit_grow_kpts(
                        self.state, self.opt_state
                    )
                if not self.quiet:
                    print(f"[iter {iteration}] keypoints -> "
                          f"{int(self.state.n_kpts())}")

    def training_report(self, iteration: int) -> Dict:
        """In-training evaluation (training_report twin,
        /root/reference/train.py:252-287): render the full test split plus
        5 fixed-stride train views at `cfg.train.test_iterations`, log mean
        L1/PSNR to stdout and history.json."""
        from gaussianprediction_tpu.eval.render import render_set
        from gaussianprediction_tpu.utils.image import psnr as psnr_fn

        scene = self.scene
        n_train = len(scene.train_cameras)
        train_sample = [
            scene.train_cameras[idx % n_train] for idx in range(5, 30, 5)
        ] if n_train else []
        report: Dict = {"iter": iteration}
        for name, views in (("test", scene.test_cameras),
                            ("train", train_sample)):
            if not views:
                continue
            renders, gts, _ = render_set(
                self.state, self.cfg, iteration, views, self.bg,
                sh_degree=self.active_sh_degree, interpret=self.interpret,
            )
            l1s, psnrs = [], []
            for r, g in zip(renders, gts):
                l1s.append(float(np.mean(np.abs(r - g))))
                psnrs.append(float(psnr_fn(jnp.asarray(r), jnp.asarray(g))))
            report[f"{name}_l1"] = float(np.mean(l1s))
            report[f"{name}_psnr"] = float(np.mean(psnrs))
            if not self.quiet:
                print(
                    f"[ITER {iteration}] eval {name}: "
                    f"L1 {report[f'{name}_l1']:.5f} "
                    f"PSNR {report[f'{name}_psnr']:.2f}"
                )
            if self.tb is not None:
                self.tb.add_scalar(
                    f"{name}/loss_viewpoint_l1", report[f"{name}_l1"],
                    iteration,
                )
                self.tb.add_scalar(
                    f"{name}/loss_viewpoint_psnr", report[f"{name}_psnr"],
                    iteration,
                )
                if renders:
                    self.tb.add_image(
                        f"{name}/render", np.clip(renders[0], 0, 1),
                        iteration,
                    )
        if self.tb is not None:
            # opacity histogram + total point count, the reference's
            # per-test-iteration state summaries (train.py:283-285)
            alive = np.asarray(self.state.alive)
            opac = 1.0 / (1.0 + np.exp(
                -np.asarray(self.state.params["opacity"]).reshape(-1)
            ))
            self.tb.add_histogram(
                "scene/opacity_histogram", opac[alive], iteration
            )
            self.tb.add_scalar(
                "total_points", float(alive.sum()), iteration
            )
            self.tb.flush()
        self._history.append({"eval": report})
        return report

    # ---- main loop --------------------------------------------------------
    def train_one(self, iteration: int) -> Dict:
        cfg = self.cfg
        if iteration % 1000 == 0 and self.active_sh_degree < cfg.model.sh_degree:
            self.active_sh_degree += 1
        self._maybe_stage_transition(iteration)
        stage = stage_of(cfg, iteration)
        cam = self.scene.next_train_camera()
        gt = jnp.asarray(cam.load_image())
        self.key, k_step = jax.random.split(self.key)
        step = self._step_fn(stage)
        self.state, self.opt_state, metrics = step(
            self.state, self.opt_state, cam.to_device_dict(), gt,
            jnp.float32(cam.time), jnp.int32(iteration), k_step,
            jnp.int32(self.active_sh_degree),
        )
        self._last_cam = cam
        self._densification(iteration, stage)
        return metrics

    def train_batch(self, a: int, b: int) -> Dict:
        """Gradient accumulation over iterations [a, b] with ONE optimizer
        step (reference --batch, train.py:112-133). Host events run at the
        batch's final iteration only — the reference's `continue`-gated
        flow skips them on incomplete batches too."""
        cfg = self.cfg
        if a % 1000 == 0 and self.active_sh_degree < cfg.model.sh_degree:
            self.active_sh_degree += 1
        self._maybe_stage_transition(a)
        stage = stage_of(cfg, a)
        k = b - a + 1
        cams = [self.scene.next_train_camera() for _ in range(k)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[c.to_device_dict() for c in cams],
        )
        gts = jnp.stack([jnp.asarray(c.load_image()) for c in cams])
        times = jnp.asarray([c.time for c in cams], jnp.float32)
        self.key, k_step = jax.random.split(self.key)
        step = self._batched_step_fn(stage, k)
        self.state, self.opt_state, metrics = step(
            self.state, self.opt_state, cam_batch, gts, times,
            jnp.int32(a), k_step, jnp.int32(self.active_sh_degree),
        )
        self._last_cam = cams[-1]
        self._densification(b, stage)
        return metrics

    def train_chunk(self, a: int, b: int) -> Dict:
        """Run iterations [a, b] in one device call (no host events inside;
        caller guarantees via _chunk_end). Applies iteration-b post events."""
        cfg = self.cfg
        if a % 1000 == 0 and self.active_sh_degree < cfg.model.sh_degree:
            self.active_sh_degree += 1
        self._maybe_stage_transition(a)
        stage = stage_of(cfg, a)
        k = b - a + 1
        cams = [self.scene.next_train_camera() for _ in range(k)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[c.to_device_dict() for c in cams],
        )
        gts = jnp.stack([jnp.asarray(c.load_image()) for c in cams])
        times = jnp.asarray([c.time for c in cams], jnp.float32)
        self.key, k_step = jax.random.split(self.key)
        step = self._multi_step_fn(stage, k)
        self.state, self.opt_state, metrics = step(
            self.state, self.opt_state, cam_batch, gts, times,
            jnp.int32(a), k_step, jnp.int32(self.active_sh_degree),
        )
        self._last_cam = cams[-1]
        self._densification(b, stage)
        return metrics

    def run(self, iterations: Optional[int] = None,
            model_path: Optional[str] = None):
        cfg = self.cfg
        iterations = iterations or cfg.opt.iterations
        model_path = model_path or cfg.model_path
        if model_path and self.tb is None:
            from gaussianprediction_tpu.utils.tb_writer import SummaryWriter

            self.tb = SummaryWriter(os.path.join(model_path, "tb"))
        t0 = time.time()
        t_last = t0
        iteration = self.iteration
        batch = max(1, cfg.train.batch)
        # profiling hooks (SURVEY §5.1): trace profile_steps device steps
        # starting at profile_from into <model_path>/profile — open with
        # xprof/tensorboard. Device timelines are the ground truth for
        # kernel cost; wall-clock history.json includes tunnel RTT.
        prof_from = cfg.train.profile_from
        prof_n = cfg.train.profile_steps
        prof_dir = os.path.join(model_path or ".", "profile")
        profiling = False
        while iteration < iterations:
            a = iteration + 1
            if prof_n > 0 and not profiling and a >= prof_from:
                import jax.profiler

                os.makedirs(prof_dir, exist_ok=True)
                jax.profiler.start_trace(prof_dir)
                profiling = True
                prof_end = a + prof_n - 1
            if self.mesh is not None:
                metrics = self.train_one_sharded(a)
                iteration = a
            elif batch > 1:
                b = self._chunk_end(a, iterations, span=batch)
                if b - a + 1 == batch:
                    metrics = self.train_batch(a, b)
                    iteration = b
                else:
                    metrics = self.train_one(a)
                    iteration = a
            elif self.steps_per_call > 1:
                b = self._chunk_end(a, iterations)
                if (
                    b - a + 1 == self.steps_per_call
                    and stage_of(cfg, a) == stage_of(cfg, b)
                ):
                    metrics = self.train_chunk(a, b)
                    iteration = b
                else:
                    metrics = self.train_one(a)
                    iteration = a
            else:
                metrics = self.train_one(a)
                iteration = a
            self.iteration = iteration
            if profiling and iteration >= prof_end:
                import jax.profiler

                jax.tree.map(
                    lambda x: x.block_until_ready(), self.state.params
                )
                jax.profiler.stop_trace()
                profiling = False
                prof_n = 0
                if not self.quiet:
                    print(f"[iter {iteration}] profile trace -> {prof_dir}")
            if iteration - getattr(self, "_last_log", 0) >= self.log_every:
                self._last_log = iteration
                loss = float(metrics["loss"])
                p = float(metrics["psnr"])
                nd = int(metrics.get("n_dropped", 0))
                if nd > 0 and not getattr(self, "_warned_dropped", False):
                    self._warned_dropped = True
                    print(
                        f"WARNING [iter {iteration}]: instance buffer "
                        f"overflow — {nd} tile instances dropped; rendered "
                        f"images and gradients are biased. Raise "
                        f"cfg.model.capacity_multiplier."
                    )
                now = time.time()
                iter_ms = (
                    (now - t_last) * 1000.0
                    / max(iteration - getattr(self, "_last_t_iter", 0), 1)
                )
                t_last = now
                self._last_t_iter = iteration
                entry = {
                    "iter": iteration, "loss": loss, "psnr": p,
                    "n_gaussians": int(self.state.n_alive()),
                    "n_kpts": int(self.state.n_kpts()),
                    "elapsed": now - t0,
                }
                self._history.append(entry)
                if self.tb is not None:
                    # the reference's per-iteration scalar set
                    # (train.py:254-258), at log_every cadence
                    self.tb.add_scalar("train_loss_patches/total_loss",
                                       loss, iteration)
                    self.tb.add_scalar("train/psnr", p, iteration)
                    self.tb.add_scalar("iter_time", iter_ms, iteration)
                    self.tb.add_scalar("total_points",
                                       entry["n_gaussians"], iteration)
                if not self.quiet:
                    print(
                        f"[{iteration}/{iterations}] loss {loss:.5f} "
                        f"psnr {p:.2f} n={entry['n_gaussians']}"
                    )
            if iteration in cfg.train.test_iterations:
                self.training_report(iteration)
            if model_path and iteration % 5000 == 0:
                self._save_train_images(model_path, iteration)
            if model_path:
                if iteration in cfg.train.save_iterations:
                    G.save_ply(
                        self.state,
                        os.path.join(
                            model_path,
                            f"point_cloud/iteration_{iteration}",
                            "point_cloud.ply",
                        ),
                    )
                if iteration in cfg.train.checkpoint_iterations:
                    self.save_checkpoint(
                        os.path.join(model_path, f"chkpnt{iteration}.npz")
                    )
        if model_path:
            os.makedirs(model_path, exist_ok=True)
            with open(os.path.join(model_path, "history.json"), "w") as f:
                json.dump(self._history, f)
        if self.tb is not None:
            self.tb.flush()
        return self._history

    def _save_train_images(self, model_path: str, iteration: int):
        """Periodic training-image dump (reference train.py:155-161): render
        the most recent training camera at the current parameters into
        <model_path>/train_imgs/ next to its GT. Rendering at the max SH
        degree is exact: inactive coefficients stay at their zero init
        (their gradients are zero until activation)."""
        cam = getattr(self, "_last_cam", None)
        if cam is None:
            return
        from gaussianprediction_tpu.eval.render import save_image
        from gaussianprediction_tpu.train.step import render_at_time

        stage = stage_of(self.cfg, iteration)
        key = ("dbg_render", stage)
        if key not in self._steps:
            def dbg(params, state, cam_d, t, it):
                pkg, _ = render_at_time(
                    params, self.cfg, state, cam_d, t, it,
                    jax.random.PRNGKey(0), stage, self.width, self.height,
                    jnp.asarray(self.bg), self.cfg.model.sh_degree,
                    interpret=self.interpret,
                )
                return jnp.clip(pkg["render"], 0.0, 1.0)

            self._steps[key] = jax.jit(dbg)
        img = self._steps[key](
            self.state.params, self.state, cam.to_device_dict(),
            jnp.float32(cam.time), jnp.int32(iteration),
        )
        d = os.path.join(model_path, "train_imgs")
        os.makedirs(d, exist_ok=True)
        save_image(
            os.path.join(d, f"render_{iteration:05d}.png"), np.asarray(img)
        )
        gt = cam.load_image()
        if gt is not None:
            save_image(
                os.path.join(d, f"gt_{iteration:05d}.png"), np.asarray(gt)
            )

    def save_checkpoint(self, path: str):
        ckpt.save_checkpoint(
            path, self.state, self.opt_state, self.iteration, self.key,
        )

    def load_checkpoint(self, path: str):
        self.state, self.opt_state, self.iteration, self.key = (
            ckpt.load_checkpoint(path, self.state, self.opt_state)
        )
        # Resume the SH warm-up ramp where the run left off (the reference
        # restores active_sh_degree with the model state and one-ups every
        # 1k iterations, /root/reference/train.py:82-83).
        self.active_sh_degree = min(
            self.cfg.model.sh_degree, self.iteration // 1000
        )
        if self.cfg.model.capacity_auto:
            self._auto_capacity(reason="load")
