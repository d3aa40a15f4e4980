"""Eval layer: metric suite + render drivers + render_kpts consistency."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.config import get_preset
from gaussianprediction_tpu.data.scene import Scene, synthetic_scene_info
from gaussianprediction_tpu.eval import metrics as M
from gaussianprediction_tpu.eval import render as R
from gaussianprediction_tpu.motion.dataset import (
    build_windows, extract_trajectories,
)
from gaussianprediction_tpu.train.loop import Trainer


def rnd_img(h, w, seed):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, 3)).astype(
        np.float32
    )


class TestMetrics:
    def test_identical_pairs(self):
        imgs = [rnd_img(48, 48, i) for i in range(3)]
        res = M.evaluate_pairs(imgs, imgs, compute_lpips=False)
        assert res["mean"]["PSNR"] > 80
        assert res["mean"]["SSIM"] == pytest.approx(1.0, abs=1e-4)
        assert res["mean"]["D-SSIM"] == pytest.approx(0.0, abs=1e-4)

    def test_dirs_roundtrip(self, tmp_path):
        rd = tmp_path / "renders"
        gd = tmp_path / "gt"
        rd.mkdir(); gd.mkdir()
        import imageio.v2 as imageio
        for i in range(2):
            img = (rnd_img(32, 32, i) * 255).astype(np.uint8)
            imageio.imwrite(str(rd / f"{i:05d}.png"), img)
            imageio.imwrite(str(gd / f"{i:05d}.png"), img)
        res = M.evaluate_dirs(str(rd), str(gd))
        assert os.path.exists(tmp_path / "results.json")
        assert res["mean"]["PSNR"] > 40  # 8-bit quantized identity
        # per-image error maps (reference metrics.py:146-148)
        deltas = sorted(os.listdir(tmp_path / "deltas"))
        assert len(deltas) == 2 and deltas[0].startswith("00000")

    def test_error_maps_values(self, tmp_path):
        r = [np.full((8, 8, 3), 0.75, np.float32)]
        g = [np.full((8, 8, 3), 0.25, np.float32)]
        M.write_error_maps(r, g, str(tmp_path / "deltas"))
        import imageio.v2 as imageio
        (name,) = os.listdir(tmp_path / "deltas")
        img = imageio.imread(str(tmp_path / "deltas" / name))
        # |0.75-0.25|*255 = 127.5 -> 127/128 modulo jpg compression
        assert abs(float(img.mean()) - 127.5) < 3.0

    def test_results_table(self, tmp_path):
        import json
        for scene in ("a", "b"):
            d = tmp_path / scene
            d.mkdir()
            with open(d / "results.json", "w") as f:
                json.dump({"PSNR": 30.0, "SSIM": 0.9, "MS-SSIM": None,
                           "D-SSIM": 0.05, "LPIPS-vgg": None,
                           "LPIPS-alex": None}, f)
        table = M.results_table({"a": str(tmp_path / "a"),
                                 "b": str(tmp_path / "b")})
        assert "average" in table and "30.0000" in table

    def test_lpips_gated_off(self):
        from gaussianprediction_tpu.eval.lpips import try_load_lpips

        os.environ.pop("GPT_LPIPS_WEIGHTS", None)
        assert try_load_lpips() is None


@pytest.fixture(scope="module")
def trained():
    cfg = get_preset("test")
    info = synthetic_scene_info(
        n_points=100, n_cams=8, n_test=2, width=48, height=48,
        dynamic=True, interpret=True,
    )
    scene = Scene(info)
    tr = Trainer(cfg, scene, interpret=True, quiet=True)
    tr.run(iterations=140, model_path=None)  # through stage 3
    return cfg, scene, tr


class TestRenderDrivers:
    def test_render_set(self, trained, tmp_path):
        cfg, scene, tr = trained
        renders, gts, fps = R.render_set(
            tr.state, cfg, tr.iteration, scene.test_cameras,
            np.zeros(3, np.float32), out_dir=str(tmp_path),
            sh_degree=tr.active_sh_degree, interpret=True,
        )
        assert len(renders) == 2 and len(gts) == 2
        assert fps > 0
        assert os.path.exists(tmp_path / "renders" / "00000.png")
        res = M.evaluate_pairs(renders, gts, compute_lpips=False)
        assert res["mean"]["PSNR"] > 10  # trained-ish

    def test_render_video(self, trained):
        cfg, scene, tr = trained
        frames = R.render_video(
            tr.state, cfg, tr.iteration, scene.test_cameras[:2],
            np.zeros(3, np.float32), interpolation=2, interpret=True,
        )
        assert len(frames) == 2
        assert all(np.isfinite(f).all() for f in frames)

    def test_render_video_vrig_stride(self, trained):
        """step=2 strides the view list before interpolating (the
        reference's HyperNeRF-vrig mode, eval.py:81): 4 views at stride 2
        give one (0,2) pair = `interpolation` frames."""
        cfg, scene, tr = trained
        views = (scene.train_cameras * 2)[:4]
        frames = R.render_video(
            tr.state, cfg, tr.iteration, views,
            np.zeros(3, np.float32), interpolation=2, interpret=True,
            step=2,
        )
        assert len(frames) == 2
        assert all(np.isfinite(f).all() for f in frames)

    def test_render_train_sequence(self, trained):
        cfg, scene, tr = trained
        frames = R.render_train_sequence(
            tr.state, cfg, tr.iteration, scene.train_cameras[:3],
            scene.test_cameras[0], np.zeros(3, np.float32), interpret=True,
        )
        assert len(frames) == 3

    def test_render_kpts_consistency(self, trained):
        """Driving render_kpts with the model's OWN keypoint trajectory at
        time t must reproduce the direct render at t (eval.py:140-141 math
        consistency)."""
        cfg, scene, tr = trained
        cam = scene.test_cameras[0]
        t = float(scene.train_cameras[3].time)
        traj = extract_trajectories(
            tr.state, cfg, [t], [], tr.iteration
        )
        frames = R.render_kpts(
            tr.state, cfg, tr.iteration, [cam], np.zeros(3, np.float32),
            traj.kpts_xyz_train, traj.kpts_r_train, view_id=0,
            interpret=True,
        )
        fn = R.make_render_fn(
            tr.state, cfg, tr.iteration, cam.width, cam.height,
            np.zeros(3, np.float32), cfg.model.sh_degree, interpret=True,
        )
        direct, _, _ = fn(cam.to_device_dict(), jnp.float32(t))
        direct = np.asarray(jnp.clip(direct, 0, 1))
        np.testing.assert_allclose(frames[0], direct, atol=2e-3)

    def test_trajectory_extraction(self, trained):
        cfg, scene, tr = trained
        times = [float(c.time) for c in scene.train_cameras[:5]]
        traj = extract_trajectories(tr.state, cfg, times, times[:2],
                                    tr.iteration)
        k = int(tr.state.n_kpts())
        assert traj.kpts_xyz_train.shape == (5, k, 3)
        assert traj.kpts_r_train.shape == (5, k, 4)
        assert traj.kpts_xyz_test.shape == (2, k, 3)
        # trajectories actually move over time (dynamic scene)
        motion = np.abs(traj.kpts_xyz_train[0] - traj.kpts_xyz_train[-1])
        assert motion.max() > 1e-4


class TestLPIPSExport:
    def test_export_and_compute_with_random_weights(self, tmp_path,
                                                    monkeypatch):
        """tools/export_lpips_npz.py round-trip: build torchvision-layout
        state dicts with random weights, export, load via try_load_lpips,
        and compute — LPIPS(a, a) must be 0 and LPIPS(a, b) > 0."""
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/repo/tools")
        import export_lpips_npz as ex

        rng = np.random.default_rng(0)

        def t(*shape):
            return torch.from_numpy(
                rng.normal(scale=0.2, size=shape).astype(np.float32)
            )

        # torchvision vgg16().features conv layout (13 convs)
        vgg_cfg = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
                   (256, 256), (256, 256), (512, 256), (512, 512),
                   (512, 512), (512, 512), (512, 512), (512, 512)]
        vgg_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        vgg_sd = {}
        for (o, i), idx in zip(vgg_cfg, vgg_idx):
            vgg_sd[f"{idx}.weight"] = t(o, i, 3, 3)
            vgg_sd[f"{idx}.bias"] = t(o)
        alex_cfg = [(64, 3, 11), (192, 64, 5), (384, 192, 3),
                    (256, 384, 3), (256, 256, 3)]
        alex_idx = [0, 3, 6, 8, 10]
        alex_sd = {}
        for (o, i, k), idx in zip(alex_cfg, alex_idx):
            alex_sd[f"{idx}.weight"] = t(o, i, k, k)
            alex_sd[f"{idx}.bias"] = t(o)
        lin_vgg = {
            f"lin{k}.model.1.weight": torch.abs(t(1, c, 1, 1))
            for k, c in enumerate(ex.VGG_CHANNELS)
        }
        vgg_p = str(tmp_path / "vgg.pth")
        alex_p = str(tmp_path / "alex.pth")
        lin_p = str(tmp_path / "lin_vgg.pth")
        torch.save(vgg_sd, vgg_p)
        torch.save(alex_sd, alex_p)
        torch.save(lin_vgg, lin_p)

        out = str(tmp_path / "lpips.npz")
        ex.main(["--out", out, "--vgg-pth", vgg_p, "--alex-pth", alex_p,
                 "--vgg-lin-pth", lin_p])

        from gaussianprediction_tpu.eval import lpips as L

        monkeypatch.setenv("GPT_LPIPS_WEIGHTS", out)
        fn = L.try_load_lpips()
        assert fn is not None
        a = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
        lv0, la0 = fn(a, a)
        lv, la = fn(a, b)
        assert abs(lv0) < 1e-6 and abs(la0) < 1e-6
        assert lv > 0 and la > 0 and np.isfinite(lv) and np.isfinite(la)


class TestLPIPSGolden:
    def test_deterministic_weights_golden(self, tmp_path, monkeypatch):
        """Regression-lock the full GPT_LPIPS_WEIGHTS path (VERDICT r4
        #8): seeded-deterministic weights (full VGG16/Alex shapes, too
        large to commit — ~69 MB — so rebuilt from the fixed seed),
        fixed inputs, and COMMITTED golden scores. Any change to the npz
        layout, conv stacks, taps, normalization, or lin heads moves
        these numbers. Goldens computed on CPU (2026-08-21); rtol covers
        cross-platform conv reassociation."""
        from gaussianprediction_tpu.eval import lpips as L

        rng = np.random.default_rng(20260820)
        params = {}
        cin = 3
        vgg_out = [c for c in L.VGG_CFG if c != "M"]
        for i, cout in enumerate(vgg_out):
            params[f"vgg/conv{i}/w"] = rng.normal(
                scale=0.05, size=(3, 3, cin, cout)).astype(np.float32)
            params[f"vgg/conv{i}/b"] = rng.normal(
                scale=0.05, size=(cout,)).astype(np.float32)
            cin = cout
        for k, c in enumerate([vgg_out[t] for t in L.VGG_TAPS]):
            params[f"vgg/lin{k}"] = np.abs(rng.normal(
                scale=0.1, size=(c,)).astype(np.float32))
        cin = 3
        for k_i, (cout, k, s, p) in enumerate(L.ALEX_CFG):
            params[f"alex/conv{k_i}/w"] = rng.normal(
                scale=0.05, size=(k, k, cin, cout)).astype(np.float32)
            params[f"alex/conv{k_i}/b"] = rng.normal(
                scale=0.05, size=(cout,)).astype(np.float32)
            cin = cout
        for k_i, (cout, *_r) in enumerate(L.ALEX_CFG):
            params[f"alex/lin{k_i}"] = np.abs(rng.normal(
                scale=0.1, size=(cout,)).astype(np.float32))
        path = str(tmp_path / "lpips_det.npz")
        np.savez(path, **params)
        monkeypatch.setenv("GPT_LPIPS_WEIGHTS", path)
        fn = L.try_load_lpips()
        assert fn is not None
        a = (np.indices((64, 80)).sum(0)[..., None] % 17 / 16.0
             * np.array([1.0, 0.7, 0.4])).astype(np.float32)
        b = np.clip(
            a + 0.15 * np.sin(np.arange(64 * 80 * 3).reshape(64, 80, 3)
                              * 0.37), 0, 1
        ).astype(np.float32)
        lv, la = fn(a, b)
        lv0, la0 = fn(a, a)
        assert lv0 == 0.0 and la0 == 0.0
        np.testing.assert_allclose(lv, 0.02952139638364315, rtol=2e-3)
        np.testing.assert_allclose(la, 0.019956454634666443, rtol=2e-3)


class TestVisualize:
    def test_pca_weights_trajectory_plys(self, tmp_path):
        from gaussianprediction_tpu.eval import visualize as V
        from gaussianprediction_tpu.utils.ply import fetch_point_cloud

        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        feats = rng.normal(size=(50, 8)).astype(np.float32)

        p1 = str(tmp_path / "pca.ply")
        rgb = V.pca_vis(xyz, feats, p1)
        assert rgb.shape == (50, 3) and rgb.min() >= 0 and rgb.max() <= 1
        pts, cols, _ = fetch_point_cloud(p1)
        assert pts.shape == (50, 3)
        np.testing.assert_allclose(pts, xyz, atol=1e-6)

        p2 = str(tmp_path / "feat.ply")
        V.feature_vis(xyz, feats, p2)
        assert fetch_point_cloud(p2)[0].shape == (50, 3)

        nn_idx = rng.integers(0, 4, (50, 3)).astype(np.int32)
        w = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        p3 = str(tmp_path / "w.ply")
        V.weights_vis(xyz, w, nn_idx, kpt_index=2, output_path=p3)
        assert fetch_point_cloud(p3)[0].shape == (50, 3)

        traj = rng.normal(size=(6, 5, 3)).astype(np.float32)
        p4 = str(tmp_path / "traj.ply")
        V.trajectory_vis(traj, p4)
        pts, cols, _ = fetch_point_cloud(p4)
        assert pts.shape == (6 * 5 + 10, 3)
        # endpoint markers are black
        assert np.allclose(cols[-10:], 0.0, atol=1e-6)
