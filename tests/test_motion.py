"""GCN motion model + trajectory dataset + rollout tests (SURVEY.md §3.4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.models import gcn as GCN
from gaussianprediction_tpu.motion.dataset import TrajectoryData, Windows, build_windows
from gaussianprediction_tpu.motion.gcn_train import (
    GCNConfig, gcn_forward, load_gcn_checkpoint, rollout,
    save_gcn_checkpoint, train_gcn,
)


def sine_trajectories(n_t=40, n_kpts=5, seed=0):
    """Analytic keypoint trajectories: per-kpt sinusoids (smooth, learnable)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n_kpts, 3)).astype(np.float32)
    amp = rng.uniform(0.1, 0.3, (n_kpts, 3)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (n_kpts, 3)).astype(np.float32)
    ts = np.linspace(0, 2.0, n_t, dtype=np.float32)
    xyz = base[None] + amp[None] * np.sin(
        2 * np.pi * 0.5 * ts[:, None, None] + phase[None]
    )
    rot = np.zeros((n_t, n_kpts, 4), np.float32)
    rot[..., 0] = np.cos(0.3 * np.sin(2 * np.pi * 0.5 * ts))[:, None]
    rot[..., 2] = np.sin(0.3 * np.sin(2 * np.pi * 0.5 * ts))[:, None]
    return xyz.astype(np.float32), rot


class TestGCNModel:
    def test_shapes(self):
        params, bn = GCN.init_gcn_xyzr(
            jax.random.PRNGKey(0), input_f=10, hidden_f=32, output_f=1,
            num_stage=2, node_n=5,
        )
        x = jnp.zeros((2, 3, 5, 10))
        r = jnp.zeros((2, 4, 5, 10))
        xo, ro, bn2 = GCN.gcn_xyzr_apply(params, bn, x, r, train=True)
        assert xo.shape == (2, 3, 5, 1)
        assert ro.shape == (2, 4, 5, 1)
        # rotation normalized over channel dim
        n = np.linalg.norm(np.asarray(ro), axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)

    def test_batchnorm_train_vs_eval(self):
        params, bn = GCN.init_gcn_xyzr(
            jax.random.PRNGKey(1), 10, 16, 1, 1, 4
        )
        x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 3, 4, 10)),
                        jnp.float32)
        r = jnp.asarray(np.random.default_rng(3).normal(size=(8, 4, 4, 10)),
                        jnp.float32)
        _, _, bn2 = GCN.gcn_xyzr_apply(params, bn, x, r, train=True)
        # running stats moved
        d = float(jnp.abs(bn2["xyz"]["bn1"]["mean"]
                          - bn["xyz"]["bn1"]["mean"]).max())
        assert d > 0
        # eval mode leaves stats untouched
        _, _, bn3 = GCN.gcn_xyzr_apply(params, bn2, x, r, train=False)
        np.testing.assert_array_equal(
            np.asarray(bn3["xyz"]["bn1"]["mean"]),
            np.asarray(bn2["xyz"]["bn1"]["mean"]),
        )


class TestWindows:
    def _traj(self):
        xyz, rot = sine_trajectories(n_t=40)
        return TrajectoryData(
            kpts_xyz_train=xyz[:30], kpts_r_train=rot[:30],
            kpts_xyz_test=xyz[30:], kpts_r_test=rot[30:],
            train_times=list(np.linspace(0, 0.74, 30)),
            test_times=list(np.linspace(0.76, 1.0, 10)),
            n_kpts=5,
        )

    def test_train_windows(self):
        w = build_windows(self._traj(), input_size=10, output_size=1,
                          split="train")
        assert w.xyz_inputs.shape == (19, 10, 5, 3)
        assert w.xyz_gt.shape == (19, 1, 5, 3)
        # window i's gt is frame i+10
        traj = self._traj()
        np.testing.assert_array_equal(
            w.xyz_gt[3, 0], traj.kpts_xyz_train[13]
        )

    def test_test_windows_prepend_train_tail(self):
        traj = self._traj()
        w = build_windows(traj, input_size=10, output_size=1, split="test")
        # first test window's input = last 10 train frames
        np.testing.assert_array_equal(
            w.xyz_inputs[0], traj.kpts_xyz_train[-10:]
        )
        np.testing.assert_array_equal(w.xyz_gt[0, 0], traj.kpts_xyz_test[0])


class TestGCNTraining:
    def test_learns_sinusoid(self):
        xyz, rot = sine_trajectories(n_t=60, n_kpts=4, seed=5)
        traj = TrajectoryData(
            kpts_xyz_train=xyz, kpts_r_train=rot,
            kpts_xyz_test=xyz[:0], kpts_r_test=rot[:0],
            train_times=[], test_times=[], n_kpts=4,
        )
        w = build_windows(traj, 10, 1, "train")
        cfg = GCNConfig(input_size=10, output_size=1, linear_size=32,
                        num_stage=2, epochs=40, batch_size=16,
                        noise_init=0.02, noise_step=20)
        params, bn, hist = train_gcn(w, 4, cfg, verbose=False)
        assert hist[-1] < hist[0] * 0.5, hist[::10]

        # one-step prediction close to gt
        xo, ro, _ = gcn_forward(
            params, bn, jnp.asarray(w.xyz_inputs[:4]),
            jnp.asarray(w.rot_inputs[:4]), cfg, train=False,
        )
        err = float(jnp.mean(jnp.linalg.norm(
            xo - jnp.asarray(w.xyz_gt[:4]), axis=-1)))
        assert err < 0.1

    def test_checkpoint_roundtrip_rollout_bitexact(self, tmp_path):
        """Reloaded GCN (reference train_GCN.py:83,113-114 twin) must roll
        out bit-identically to the in-process model."""
        xyz, rot = sine_trajectories(n_t=30, n_kpts=3, seed=7)
        traj = TrajectoryData(
            kpts_xyz_train=xyz, kpts_r_train=rot,
            kpts_xyz_test=xyz[:0], kpts_r_test=rot[:0],
            train_times=[], test_times=[], n_kpts=3,
        )
        w = build_windows(traj, 8, 1, "train")
        cfg = GCNConfig(input_size=8, output_size=1, linear_size=16,
                        num_stage=1, epochs=3, batch_size=8, noise_init=0.0)
        params, bn, hist = train_gcn(w, 3, cfg, verbose=False)
        path = str(tmp_path / "gcn_ckpt.npz")
        save_gcn_checkpoint(path, params, bn, cfg, 3, hist)

        p2, bn2, cfg2, n_kpts2, hist2 = load_gcn_checkpoint(path)
        assert cfg2 == cfg and n_kpts2 == 3
        np.testing.assert_allclose(hist2, hist, rtol=1e-6)
        for a, b in zip(jax.tree.leaves((params, bn)),
                        jax.tree.leaves((p2, bn2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        k1, kr1 = rollout(params, bn, cfg, xyz[-8:], rot[-8:], frames=6)
        k2, kr2 = rollout(p2, bn2, cfg2, xyz[-8:], rot[-8:], frames=6)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(kr1, kr2)

    def test_rollout_shapes_and_stability(self):
        xyz, rot = sine_trajectories(n_t=30, n_kpts=3, seed=6)
        traj = TrajectoryData(
            kpts_xyz_train=xyz, kpts_r_train=rot,
            kpts_xyz_test=xyz[:0], kpts_r_test=rot[:0],
            train_times=[], test_times=[], n_kpts=3,
        )
        w = build_windows(traj, 8, 1, "train")
        cfg = GCNConfig(input_size=8, output_size=1, linear_size=16,
                        num_stage=1, epochs=5, batch_size=8,
                        noise_init=0.0)
        params, bn, _ = train_gcn(w, 3, cfg, verbose=False)
        k, kr = rollout(params, bn, cfg, xyz[-8:], rot[-8:], frames=12)
        assert k.shape == (12, 3, 3)
        assert kr.shape == (12, 3, 4)
        assert np.isfinite(k).all() and np.isfinite(kr).all()


class TestDropout:
    def test_dropout_train_vs_eval(self):
        """--dropout parity (reference gcn_training): train mode with p>0
        stochastically zeroes activations (inverted scaling), eval mode is
        deterministic and identical to p=0."""
        import jax
        import jax.numpy as jnp

        from gaussianprediction_tpu.models import gcn as GCN

        params, bn = GCN.init_gcn_xyzr(
            jax.random.PRNGKey(0), input_f=4, hidden_f=16, output_f=1,
            num_stage=1, node_n=5,
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 3, 5, 4)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(2, 4, 5, 4)), jnp.float32)
        xo0, _, _ = GCN.gcn_xyzr_apply(params, bn, x, r, train=False,
                                       p_dropout=0.5,
                                       key=jax.random.PRNGKey(1))
        xo_ref, _, _ = GCN.gcn_xyzr_apply(params, bn, x, r, train=False)
        np.testing.assert_array_equal(np.asarray(xo0), np.asarray(xo_ref))
        xa, _, _ = GCN.gcn_xyzr_apply(params, bn, x, r, train=True,
                                      p_dropout=0.5,
                                      key=jax.random.PRNGKey(1))
        xb, _, _ = GCN.gcn_xyzr_apply(params, bn, x, r, train=True,
                                      p_dropout=0.5,
                                      key=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(xa), np.asarray(xb))
