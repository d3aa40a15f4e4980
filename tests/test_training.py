"""Training-layer tests: Adam parity with torch, densify invariants, and the
end-to-end slice — fitting a synthetic scene (SURVEY.md §4d)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.config import get_preset
from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info
from gaussianprediction_tpu.models import gaussians as G
from gaussianprediction_tpu.train import densify as dn
from gaussianprediction_tpu.train import optimizer as opt_mod
from gaussianprediction_tpu.train.loop import Trainer, set_super_keypoints, stage_of


def small_cfg(**kw):
    cfg = get_preset("test")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def make_state(cfg, n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return G.create_from_pcd(jax.random.PRNGKey(seed), cfg, pts, cols)


class TestAdamParity:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        cfg = small_cfg()
        rng = np.random.default_rng(0)
        p0 = rng.normal(size=(10, 3)).astype(np.float32)
        lr = float(opt_mod.group_lr("scaling", cfg, 1.0, 5))

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)

        params = {"scaling": jnp.asarray(p0)}
        opt_state = opt_mod.init_adam(params)
        full_groups = opt_mod.GROUP_OF_PARAM
        for step in range(5):
            g = rng.normal(size=(10, 3)).astype(np.float32)
            tp.grad = torch.from_numpy(g.copy())
            topt.step()
            # drive only the scaling group through our adam
            grads = {"scaling": jnp.asarray(g)}
            params, opt_state = opt_mod.adam_step(
                params, grads, opt_state, cfg, 1, 1.0, jnp.int32(5)
            )
        np.testing.assert_allclose(
            np.asarray(params["scaling"]), tp.detach().numpy(), atol=2e-6
        )

    def test_stage2_freezes_gaussian_params(self):
        cfg = small_cfg()
        state = make_state(cfg)
        opt_state = opt_mod.init_adam(state.params)
        grads = jax.tree.map(jnp.ones_like, state.params)
        new_params, _ = opt_mod.adam_step(
            state.params, grads, opt_state, cfg, 2, 1.0, jnp.int32(70)
        )
        np.testing.assert_array_equal(new_params["xyz"], state.params["xyz"])
        np.testing.assert_array_equal(
            new_params["opacity"], state.params["opacity"]
        )
        # keypoints and deform MLP do move
        assert not np.allclose(
            new_params["super_xyz"], state.params["super_xyz"]
        )
        assert not np.allclose(
            new_params["df_mlp"][0]["w"], state.params["df_mlp"][0]["w"]
        )

    def test_stage3_freezes_motion_feature(self):
        cfg = small_cfg()
        state = make_state(cfg)
        opt_state = opt_mod.init_adam(state.params)
        grads = jax.tree.map(jnp.ones_like, state.params)
        new_params, _ = opt_mod.adam_step(
            state.params, grads, opt_state, cfg, 3, 1.0, jnp.int32(130)
        )
        np.testing.assert_array_equal(
            new_params["motion_feature"], state.params["motion_feature"]
        )
        assert not np.allclose(new_params["xyz"], state.params["xyz"])


class TestDensify:
    def test_clone_into_free_slots(self):
        cfg = small_cfg()
        state = make_state(cfg, n=32)
        opt_state = opt_mod.init_adam(state.params)
        # force clone: high grads, small scales
        state = state.replace(
            xyz_gradient_accum=jnp.where(jnp.arange(512) < 5, 1.0, 0.0),
            denom=jnp.ones(512),
            params={**state.params,
                    "scaling": jnp.full((512, 3), -8.0)},
        )
        n0 = int(state.n_alive())
        state2, _ = dn.densify_and_prune_clone_split(
            state, opt_state, cfg, extent=10.0, key=jax.random.PRNGKey(0)
        )
        assert int(state2.n_alive()) == n0 + 5
        # cloned rows replicate source params
        alive_new = np.asarray(state2.alive) & ~np.asarray(state.alive)
        src = np.asarray(state.params["xyz"])[:5]
        dst = np.asarray(state2.params["xyz"])[alive_new]
        np.testing.assert_allclose(np.sort(dst, 0), np.sort(src, 0), atol=1e-6)
        # stats reset
        assert float(state2.denom.sum()) == 0.0

    def test_split_kills_parent_adds_two(self):
        cfg = small_cfg()
        state = make_state(cfg, n=32)
        opt_state = opt_mod.init_adam(state.params)
        big = jnp.zeros((512, 3)).at[:3].set(jnp.log(5.0)) + jnp.where(
            jnp.arange(512)[:, None] < 3, 0.0, -8.0
        )
        state = state.replace(
            xyz_gradient_accum=jnp.where(jnp.arange(512) < 3, 1.0, 0.0),
            denom=jnp.ones(512),
            params={**state.params, "scaling": big},
        )
        n0 = int(state.n_alive())
        state2, _ = dn.densify_and_prune_clone_split(
            state, opt_state, cfg, extent=10.0, key=jax.random.PRNGKey(1)
        )
        assert int(state2.n_alive()) == n0 - 3 + 6
        assert not bool(state2.alive[0])  # parents pruned
        # children scale shrunk by 1/1.6
        alive_new = np.asarray(state2.alive) & ~np.asarray(state.alive)
        child_scales = np.asarray(state2.params["scaling"])[alive_new]
        np.testing.assert_allclose(
            child_scales, np.log(5.0 / 1.6), atol=1e-5
        )

    def test_prune_low_opacity(self):
        cfg = small_cfg()
        state = make_state(cfg, n=32)
        opac = state.params["opacity"].at[:10].set(-10.0)  # ~0 opacity
        state = state.replace(params={**state.params, "opacity": opac})
        state2 = dn.prune(state, cfg, extent=10.0, max_screen_size=None)
        assert int(state2.n_alive()) == 22

    def test_keypoint_growth(self):
        cfg = small_cfg()
        state = make_state(cfg, n=64)
        opt_state = opt_mod.init_adam(state.params)
        state = set_super_keypoints(state, cfg, jax.random.PRNGKey(2))
        k0 = int(state.n_kpts())
        state = state.replace(
            xyz_gradient_accum=jnp.where(jnp.arange(512) < 40, 1.0, 0.0),
            denom=jnp.ones(512),
        )
        state2, _ = dn.grow_keypoints_from_grads(
            state, opt_state, cfg, max_new=8
        )
        # 40 high-grad gaussians, ratio 100 -> 1 new keypoint
        assert int(state2.n_kpts()) == k0 + 1

    def test_reset_opacity(self):
        cfg = small_cfg()
        state = make_state(cfg, n=16)
        opt_state = opt_mod.init_adam(state.params)
        opt_state["m"]["opacity"] = jnp.ones_like(
            opt_state["m"]["opacity"]
        )
        state2, opt2 = dn.reset_opacity(state, opt_state)
        from gaussianprediction_tpu.models.gaussians import opacity_act
        o = np.asarray(opacity_act(state2.params["opacity"]))[
            np.asarray(state2.alive)
        ]
        assert (o <= 0.0101).all()
        assert float(jnp.abs(opt2["m"]["opacity"]).sum()) == 0.0


class TestEndToEndStatic:
    def test_warmup_fits_scene(self):
        """The M1/M2 slice: static scene, warm-up stage only — PSNR must
        climb substantially within 60 iterations."""
        cfg = small_cfg()
        cfg.train.jointly_iteration = 1000  # stay in warm-up
        cfg.opt.iterations = 60
        info = synthetic_scene_info(
            n_points=150, n_cams=8, n_test=2, width=64, height=64,
            interpret=True,
        )
        scene = Scene(info)
        tr = Trainer(cfg, scene, interpret=True, quiet=True, log_every=10)
        cam = scene.test_cameras[0]
        from gaussianprediction_tpu.train.step import render_at_time
        from gaussianprediction_tpu.utils.image import psnr

        def eval_psnr():
            pkg, _ = render_at_time(
                tr.state.params, cfg, tr.state, cam.to_device_dict(),
                jnp.float32(0.0), jnp.int32(tr.iteration),
                jax.random.PRNGKey(0), 0, 64, 64, jnp.zeros(3),
                tr.active_sh_degree, interpret=True,
            )
            return float(psnr(pkg["render"], jnp.asarray(cam.image)))

        p_before = eval_psnr()
        tr.run(iterations=60, model_path=None)
        p_after = eval_psnr()
        assert p_after > p_before + 2.0, (p_before, p_after)

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = small_cfg()
        cfg.opt.iterations = 5
        info = synthetic_scene_info(
            n_points=60, n_cams=4, n_test=1, width=32, height=32,
            interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr.run(iterations=5, model_path=None)
        path = str(tmp_path / "ck.npz")
        tr.save_checkpoint(path)

        tr2 = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr2.load_checkpoint(path)
        assert tr2.iteration == 5
        np.testing.assert_allclose(
            np.asarray(tr2.state.params["xyz"]),
            np.asarray(tr.state.params["xyz"]), atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(tr2.opt_state["m"]["xyz"]),
            np.asarray(tr.opt_state["m"]["xyz"]), atol=0,
        )


class TestStageSchedule:
    def test_stage_of(self):
        cfg = small_cfg()
        assert stage_of(cfg, 5) == 0
        assert stage_of(cfg, 10) == 1
        assert stage_of(cfg, 60) == 1
        assert stage_of(cfg, 61) == 2
        assert stage_of(cfg, 120) == 2
        assert stage_of(cfg, 121) == 3

    def test_full_stage_progression(self):
        """Run across all stage transitions incl. keypoint init + growth."""
        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=80, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr.run(iterations=140, model_path=None)
        assert int(tr.state.n_kpts()) >= cfg.model.max_points
        assert tr.iteration == 140
        # loss finite throughout
        m = tr.train_one(141)
        assert np.isfinite(float(m["loss"]))

    def test_full_stage_progression_fourier_encoder(self):
        """Same progression with the MXU Fourier weight encoder (the
        TPU-first fast path): no hash tables in params, stages 2/3 train."""
        cfg = small_cfg()
        cfg.model.weight_encoder = "fourier"
        info = synthetic_scene_info(
            n_points=80, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        assert "hash_tables" not in tr.state.params
        tr.run(iterations=140, model_path=None)
        assert int(tr.state.n_kpts()) >= cfg.model.max_points
        m = tr.train_one(141)
        assert np.isfinite(float(m["loss"]))


class TestMultiStepChunks:
    def test_chunked_matches_semantics(self):
        """steps_per_call>1 must produce a working run with host events
        honored (densify/stage transitions land on chunk boundaries)."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=80, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True,
                     steps_per_call=10)
        tr.run(iterations=140, model_path=None)
        assert tr.iteration == 140
        assert int(tr.state.n_kpts()) >= cfg.model.max_points
        m = tr.train_one(141)
        assert np.isfinite(float(m["loss"]))

    def test_chunk_end_respects_events(self):
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=40, n_cams=3, n_test=1, width=32, height=32,
            interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True,
                     steps_per_call=64)
        # adaptive_interval=30 in the test preset is the nearest post event
        # for a chunk starting at 21
        assert tr._chunk_end(21, 10_000) == 30
        # stage transition at second_stage_iteration+1=61 is a pre event
        assert tr._chunk_end(55, 10_000) == 60


class TestStageAwareResume:
    def test_resume_mid_stage2(self, tmp_path):
        """Checkpoint in stage 2 and resume: keypoints, stage, and training
        must continue seamlessly (reference restore semantics,
        gaussian_model.py:96-104)."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=60, n_cams=5, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr.run(iterations=90, model_path=None)  # inside stage 2 (61..120)
        assert stage_of(cfg, tr.iteration) == 2
        k90 = int(tr.state.n_kpts())
        path = str(tmp_path / "s2.npz")
        tr.save_checkpoint(path)

        tr2 = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr2.load_checkpoint(path)
        assert tr2.iteration == 90
        assert int(tr2.state.n_kpts()) == k90
        tr2.run(iterations=130, model_path=None)  # crosses into stage 3
        assert tr2.iteration == 130
        m = tr2.train_one(131)
        assert np.isfinite(float(m["loss"]))


class TestTracedSHDegree:
    def test_masked_degree_equals_static_degree(self):
        """The traced SH warm-up (zero-mask under the max-degree basis)
        must reproduce the static-degree step to float associativity:
        the zeroed terms contribute exact zeros, the full-basis einsum may
        reassociate by <= 1 ulp."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info
        from gaussianprediction_tpu.train.step import make_train_step

        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=48, n_cams=3, n_test=0, width=32, height=32,
            dynamic=True, interpret=True,
        )
        scene = Scene(info)
        tr = Trainer(cfg, scene, interpret=True, quiet=True)
        extent = float(scene.cameras_extent)
        cam = scene.train_cameras[0]
        gt = jnp.asarray(cam.load_image())
        key = jax.random.PRNGKey(3)
        # give the rest coefficients non-zero values so masking matters
        p = dict(tr.state.params)
        p["features_rest"] = p["features_rest"] + 0.3
        state = tr.state.replace(params=p)

        for active in (0, 1):
            _, step_static, _ = make_train_step(
                cfg, 1, 32, 32, extent, active, scene.total_frame,
                np.zeros(3, np.float32), interpret=True,
            )
            s_ref, _, m_ref = step_static(
                state, tr.opt_state, cam.to_device_dict(), gt,
                jnp.float32(cam.time), jnp.int32(40), key,
            )
            _, step_masked, _ = make_train_step(
                cfg, 1, 32, 32, extent, cfg.model.sh_degree,
                scene.total_frame, np.zeros(3, np.float32), interpret=True,
            )
            s_m, _, m_m = step_masked(
                state, tr.opt_state, cam.to_device_dict(), gt,
                jnp.float32(cam.time), jnp.int32(40), key,
                jnp.int32(active),
            )
            np.testing.assert_allclose(
                float(m_ref["loss"]), float(m_m["loss"]), rtol=1e-6,
                err_msg=f"deg={active}",
            )
            for k in ("xyz", "features_dc", "features_rest", "opacity"):
                np.testing.assert_allclose(
                    np.asarray(s_ref.params[k]), np.asarray(s_m.params[k]),
                    atol=2e-6, err_msg=f"deg={active} param={k}",
                )
            # inactive coefficients received no update at all
            ksz = (active + 1) ** 2 - 1
            np.testing.assert_array_equal(
                np.asarray(s_m.params["features_rest"][:, ksz:]),
                np.asarray(state.params["features_rest"][:, ksz:]),
                err_msg=f"deg={active} inactive rest coeffs moved",
            )


class TestBatchAccumulation:
    def test_batched_step_equals_summed_grads(self):
        """--batch semantics (reference train.py:112-133): one batched step
        == per-member grads summed, radii maxed, then one Adam update."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info
        from gaussianprediction_tpu.train.step import (
            make_train_step, make_train_step_batched, time_with_noise,
        )

        cfg = small_cfg()
        B = 3
        info = synthetic_scene_info(
            n_points=48, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        scene = Scene(info)
        tr = Trainer(cfg, scene, interpret=True, quiet=True)
        extent = float(scene.cameras_extent)
        W = H = 32

        cams = [scene.train_cameras[i] for i in range(B)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[c.to_device_dict() for c in cams],
        )
        gts = jnp.stack([jnp.asarray(c.load_image()) for c in cams])
        times = jnp.asarray([c.time for c in cams], jnp.float32)
        key = jax.random.PRNGKey(7)
        it0 = 30  # stage 1

        # manual reference FIRST (the batched step donates its inputs)
        _, _, loss_fn = make_train_step(
            cfg, 1, W, H, extent, 1, scene.total_frame,
            np.zeros(3, np.float32), interpret=True,
        )
        keys = jax.random.split(key, 2 * B).reshape(B, 2, -1)
        dummy = jnp.zeros((tr.state.capacity, 2), jnp.float32)
        total = None
        loss_sum = 0.0
        for j in range(B):
            it = jnp.int32(it0 + j)
            t = time_with_noise(cfg, times[j], it, keys[j, 1], 1,
                                scene.total_frame)
            (loss, aux), (g, _) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(tr.state.params, dummy, tr.state,
              jax.tree.map(lambda x: x[j], cam_batch), gts[j], t, it,
              keys[j, 0])
            loss_sum += float(loss)
            total = g if total is None else jax.tree.map(jnp.add, total, g)

        from gaussianprediction_tpu.train.optimizer import adam_step

        ref_params, _ = adam_step(
            tr.state.params, total, tr.opt_state, cfg, 1, extent,
            jnp.int32(it0 + B - 1),
        )
        ref_params = jax.tree.map(np.asarray, ref_params)

        batched = make_train_step_batched(
            cfg, 1, W, H, extent, 1, scene.total_frame,
            np.zeros(3, np.float32), B, interpret=True,
        )
        s_b, o_b, m_b = batched(
            tr.state, tr.opt_state, cam_batch, gts, times, jnp.int32(it0),
            key,
        )
        np.testing.assert_allclose(float(m_b["loss"]), loss_sum, rtol=1e-5)
        for k in ("xyz", "opacity", "scaling"):
            np.testing.assert_allclose(
                np.asarray(s_b.params[k]), np.asarray(ref_params[k]),
                atol=1e-6, err_msg=k,
            )

    def test_trainer_runs_with_batch(self):
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        cfg.train.batch = 2
        info = synthetic_scene_info(
            n_points=48, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True,
                     log_every=10)
        tr.run(iterations=30, model_path=None)
        assert tr.iteration == 30
        h = tr._history
        assert np.isfinite(h[-1]["loss"])

    def test_auto_capacity_shrinks_with_hysteresis(self):
        """Probe-driven capacity re-sizing shrinks a stale oversized
        multiplier at densify cadence (VERDICT r3 #3) — but only in the
        stable second half of the opacity-reset cycle, and only past the
        1.0-step hysteresis."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        cfg.model.capacity_auto = True
        info = synthetic_scene_info(
            n_points=48, n_cams=6, n_test=1, width=32, height=32,
            interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        probed = float(cfg.model.capacity_multiplier)
        ri = cfg.opt.opacity_reset_interval
        # stale oversized value, probe says much less -> shrink (stable)
        cfg.model.capacity_multiplier = probed + 8.0
        tr._steps["sentinel"] = object()
        tr._auto_capacity(reason="densify", iteration=ri - 1)
        assert float(cfg.model.capacity_multiplier) == probed
        assert not tr._steps  # compiled steps invalidated
        # unstable window (right after a reset): no shrink
        cfg.model.capacity_multiplier = probed + 8.0
        tr._auto_capacity(reason="densify", iteration=ri + 1)
        assert float(cfg.model.capacity_multiplier) == probed + 8.0
        # inside hysteresis: no shrink
        cfg.model.capacity_multiplier = probed + 0.5
        tr._auto_capacity(reason="densify", iteration=ri - 1)
        assert float(cfg.model.capacity_multiplier) == probed + 0.5


class TestTrainingReport:
    def test_report_at_test_iterations(self):
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        cfg.train.test_iterations = (20,)
        info = synthetic_scene_info(
            n_points=48, n_cams=6, n_test=2, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr.run(iterations=25, model_path=None)
        evals = [e["eval"] for e in tr._history if "eval" in e]
        assert len(evals) == 1
        rep = evals[0]
        assert rep["iter"] == 20
        assert np.isfinite(rep["test_psnr"]) and rep["test_psnr"] > 0
        assert np.isfinite(rep["train_psnr"])
        assert 0 <= rep["test_l1"] < 1


class TestTeacherGuidedGrowth:
    def test_keypoints_grow_from_teaching(self):
        """densify_from_teaching: the xyz_motion_accum_max residual mask
        must grow keypoints through the adaptive cadence
        (gaussian_model.py:277-283,613-631)."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        cfg = small_cfg()
        cfg.train.densify_from_teaching = True
        cfg.train.densify_from_grad = False
        cfg.train.teaching_threshold = 0.0  # every residual triggers
        info = synthetic_scene_info(
            n_points=60, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        tr.run(iterations=70, model_path=None)  # stage 2 starts at 61
        k_start = int(tr.state.n_kpts())
        assert k_start == cfg.model.max_points
        # adaptive window: (61+20, 61+100), interval 30 -> grows at 90, 120
        tr.run(iterations=125, model_path=None)
        assert int(tr.state.n_kpts()) > k_start
        # residual stats were consumed and reset
        assert float(jnp.max(tr.state.xyz_motion_accum_max)) >= 0.0


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("GPT_RUN_SLOW", "0") != "1",
    reason="deep convergence test (~10 min CPU); set GPT_RUN_SLOW=1",
)
class TestDeepConvergence:
    def test_three_stage_convergence(self):
        """Deep synthetic convergence (VERDICT r1 next #9): a 24-view
        dynamic swirl scene trained 2400 iterations through all three
        stage transitions. Empirical envelope from exp/exp_converge.py:
        stage-1 end (iter 1200) train ~21.7 dB; the stage-2 keypoint
        distillation dips ~2.3 dB then recovers to ~21.4/19.7
        (train/test) by 2400. Thresholds sit ~1 dB under that envelope
        to catch optimizer/deform regressions without flaking."""
        from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info

        iters = 2400
        cfg = small_cfg()
        cfg.train.jointly_iteration = 150
        cfg.train.second_stage_iteration = 1200
        cfg.train.third_stage_iteration = 1800
        cfg.train.adaptive_from_iter = 100
        cfg.train.adaptive_end_iter = 500
        cfg.train.adaptive_interval = 100
        cfg.train.time_noise_iteration = 600
        cfg.train.xyz_noise_iteration = 600
        cfg.opt.iterations = iters
        cfg.opt.position_lr_max_steps = iters
        cfg.opt.densify_from_iter = 200
        cfg.opt.densify_until_iter = 1000
        cfg.opt.densification_interval = 100
        cfg.opt.opacity_reset_interval = 10 ** 6
        cfg.train.test_iterations = (1200, 1400, iters)

        info = synthetic_scene_info(
            n_points=256, n_cams=24, n_test=3, width=64, height=64,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True,
                     log_every=400)
        tr.run(iterations=iters, model_path=None)
        evals = {e["eval"]["iter"]: e["eval"]
                 for e in tr._history if "eval" in e}
        # stage 1 learned the scene
        assert evals[1200]["train_psnr"] > 20.0, evals[1200]
        # stage 2/3 recovered from the keypoint-distillation transition
        assert evals[iters]["train_psnr"] > 20.0, evals[iters]
        assert evals[iters]["test_psnr"] > 18.5, evals[iters]
        assert evals[iters]["test_psnr"] > evals[1400]["test_psnr"], (
            "no recovery after the stage-2 transition"
        )


class TestDistillInit:
    def test_distill_reduces_blend_teacher_error(self):
        """distill_weight_init (cfg.train.distill_init_steps) must fit the
        blend-weight model toward the stage-1 motion field: the distill
        loss decreases and the transition-diagnostic blend error shrinks
        vs the random weight init."""
        import jax
        import jax.numpy as jnp

        from gaussianprediction_tpu.data.scene import (
            Scene, synthetic_scene_info,
        )
        from gaussianprediction_tpu.train.loop import (
            Trainer, distill_weight_init, set_super_keypoints,
        )
        from gaussianprediction_tpu.models import deform as D

        cfg = small_cfg()
        info = synthetic_scene_info(
            n_points=96, n_cams=6, n_test=1, width=32, height=32,
            dynamic=True, interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True)
        # a few stage-1 steps so the motion field is non-trivial
        tr.run(iterations=cfg.train.second_stage_iteration)
        tr.state = set_super_keypoints(tr.state, cfg, jax.random.PRNGKey(5))

        def blend_err(state):
            t = jnp.float32(0.4)
            teach = D.deform_stage1(
                state.params, cfg, state, t, jnp.int32(10**6),
                jax.random.PRNGKey(0),
            ).delta_xyz
            out = D.deform_stage23(
                state.params, cfg, state, t,
                jnp.int32(cfg.train.second_stage_iteration
                          + cfg.train.xyz_noise_iteration + 10),
                jax.random.PRNGKey(0),
                stage2_start=cfg.train.second_stage_iteration,
            )
            m = state.alive[:, None]
            return float(jnp.sqrt(jnp.sum(
                jnp.where(m, out.delta_xyz - teach, 0.0) ** 2
            ) / jnp.maximum(jnp.sum(state.alive) * 3, 1)))

        err_before = blend_err(tr.state)
        state2, losses = distill_weight_init(tr.state, cfg, n_steps=60)
        assert float(losses[-1]) < float(losses[0])
        err_after = blend_err(state2)
        assert err_after < err_before
