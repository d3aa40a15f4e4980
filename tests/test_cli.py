"""End-to-end CLI smoke: train.py -> eval.py -> train_gcn.py as subprocesses
over a real on-disk dataset (the user-facing surface, SURVEY.md §3)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=420):
    env = dict(os.environ)
    env["GPT_FORCE_CPU"] = "1"
    env["JAX_PALLAS_INTERPRET"] = "1"
    r = subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    if r.returncode != 0:
        raise AssertionError(
            f"CLI failed: {' '.join(args)}\nstdout:\n{r.stdout[-3000:]}\n"
            f"stderr:\n{r.stderr[-3000:]}"
        )
    return r.stdout


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Tiny dynamic blender dataset rendered from a known Gaussian cloud."""
    import tests.conftest  # noqa: F401  (device pinning)
    import jax.numpy as jnp

    from gaussianprediction_tpu.data.scene import synthetic_scene_info
    from gaussianprediction_tpu.utils.ply import store_point_cloud

    d = tmp_path_factory.mktemp("dnerf_scene")
    info = synthetic_scene_info(
        n_points=80, n_cams=12, n_test=0, width=32, height=32,
        dynamic=True, interpret=True,
    )
    (d / "train").mkdir()
    frames = []
    import imageio.v2 as imageio

    from gaussianprediction_tpu.utils.camera import world_to_view

    for i, cam in enumerate(info.train_cameras):
        imageio.imwrite(
            str(d / "train" / f"r_{i}.png"),
            (np.clip(cam.image, 0, 1) * 255).astype(np.uint8),
        )
        V = world_to_view(cam.R, cam.T).astype(np.float64)
        c2w = np.linalg.inv(V)
        c2w[:3, 1:3] *= -1  # back to OpenGL convention for the json
        frames.append({
            "file_path": f"train/r_{i}",
            "time": cam.time,
            "transform_matrix": c2w.tolist(),
        })
    with open(d / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": info.train_cameras[0].fovx,
                   "frames": frames}, f)
    store_point_cloud(
        str(d / "points3d.ply"), info.points.astype(np.float32),
        np.clip(info.colors, 0, 1) * 255,
    )
    return str(d)


@pytest.fixture(scope="module")
def trained_model(dataset, tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("model"))
    out = run_cli([
        "train.py", "-s", dataset, "-m", model_dir, "--preset", "test",
        "--iterations", "150", "--max_time", "0.75",
        "--checkpoint_iterations", "150",
    ])
    assert "Training complete" in out
    return model_dir


class TestCLI:
    def test_batch_flag_resolves(self):
        """--batch (reference train.py:112-133,295) wires through to
        cfg.train.batch, which Trainer.run dispatches to the tested
        accumulated-gradient batched step (train/loop.py:581-585)."""
        sys.path.insert(0, REPO)
        import train as train_cli

        p = train_cli.build_parser()
        a = p.parse_args(["-s", "x", "-m", "y", "--preset", "test",
                          "--batch", "2"])
        cfg = train_cli.resolve_config(a)
        assert cfg.train.batch == 2
        # default: preset value untouched
        a0 = p.parse_args(["-s", "x", "-m", "y", "--preset", "test"])
        assert train_cli.resolve_config(a0).train.batch == 1

    def test_train(self, trained_model):
        assert os.path.exists(os.path.join(trained_model, "cfg.json"))
        assert os.path.exists(os.path.join(trained_model, "chkpnt150.npz"))
        with open(os.path.join(trained_model, "history.json")) as f:
            hist = json.load(f)
        assert hist and np.isfinite(hist[-1]["loss"])

    def test_eval(self, trained_model, dataset):
        out = run_cli([
            "eval.py", "-m", trained_model, "-s", dataset,
        ])
        assert "FPS" in out
        eval_dir = os.path.join(trained_model + "eval", "test", "ours_150")
        assert os.path.exists(os.path.join(eval_dir, "results.json"))
        with open(os.path.join(eval_dir, "results.json")) as f:
            res = json.load(f)
        assert res["PSNR"] is not None and res["PSNR"] > 5

    def test_train_gcn(self, trained_model, dataset):
        out = run_cli([
            "train_gcn.py", "-m", trained_model, "-s", dataset,
            "--epoch", "5", "--num_stage", "1", "--linear_size", "16",
            "--input_size", "4", "--metrics",
        ], timeout=420)
        assert "GCN trained" in out
        mdir = os.path.join(trained_model, "gcn", "metrics_predicted")
        assert os.path.exists(os.path.join(mdir, "results.json"))
