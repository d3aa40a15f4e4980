"""Keypoint trajectory extraction + sliding-window dataset for the GCN.

Twin of GCN3DDataset (/root/reference/motion_model/dataset.py:11-191):
evaluate the trained Gaussian model's keypoint deformation at every
train/test timestamp (deterministic — the xyz-noise anneal is exhausted at
the checkpoint iterations used) to record per-keypoint positions
`super_xyz + kpt_dxyz` and rotation deltas, then build input_size->output_
size sliding windows; the test split prepends the last input_size training
frames (dataset.py:166-176).
"""
from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models import deform as D
from gaussianprediction_tpu.models.gaussians import GaussianState


class Windows(NamedTuple):
    xyz_inputs: np.ndarray        # [W, input, K, 3]
    xyz_gt: np.ndarray            # [W, output, K, 3]
    rot_inputs: np.ndarray        # [W, input, K, 4]
    rot_gt: np.ndarray            # [W, output, K, 4]


class TrajectoryData(NamedTuple):
    kpts_xyz_train: np.ndarray    # [T_train, K, 3] keypoint positions
    kpts_r_train: np.ndarray      # [T_train, K, 4] rotation deltas
    kpts_xyz_test: np.ndarray
    kpts_r_test: np.ndarray
    train_times: List[float]
    test_times: List[float]
    n_kpts: int


def extract_trajectories(
    state: GaussianState, cfg: Config, train_times, test_times,
    iteration: int,
) -> TrajectoryData:
    """generate_data twin (dataset.py:113-135): one stage-2/3 forward per
    timestamp, recording keypoint positions and rotation deltas. Only the
    alive keypoint prefix is kept (keypoints are never pruned, so alive
    slots form a prefix)."""
    n_kpts = int(state.n_kpts())
    key = jax.random.PRNGKey(0)  # noise anneal is exhausted -> key unused

    @jax.jit
    def kpt_motion(t):
        out = D.deform_stage23(
            state.params, cfg, state, t, jnp.int32(iteration), key
        )
        return (
            state.params["super_xyz"] + out.kpts_xyz_motion,
            out.kpts_rotation_motion,
        )

    def run(times):
        xs, rs = [], []
        for t in times:
            x, r = kpt_motion(jnp.float32(t))
            xs.append(np.asarray(x)[:n_kpts])
            rs.append(np.asarray(r)[:n_kpts])
        if not xs:
            return (np.zeros((0, n_kpts, 3), np.float32),
                    np.zeros((0, n_kpts, 4), np.float32))
        return np.stack(xs), np.stack(rs)

    xyz_tr, r_tr = run(train_times)
    xyz_te, r_te = run(test_times)
    return TrajectoryData(
        kpts_xyz_train=xyz_tr, kpts_r_train=r_tr,
        kpts_xyz_test=xyz_te, kpts_r_test=r_te,
        train_times=list(train_times), test_times=list(test_times),
        n_kpts=n_kpts,
    )


def build_windows(traj: TrajectoryData, input_size: int, output_size: int,
                  split: str) -> Windows:
    """prepare_item twin (dataset.py:154-176)."""
    if split == "train":
        xyz, rot = traj.kpts_xyz_train, traj.kpts_r_train
        n = len(xyz) - input_size - output_size
        idx_starts = range(max(n, 0))
        stride = 1
    else:
        xyz = np.concatenate(
            [traj.kpts_xyz_train[-input_size:], traj.kpts_xyz_test], axis=0
        )
        rot = np.concatenate(
            [traj.kpts_r_train[-input_size:], traj.kpts_r_test], axis=0
        )
        idx_starts = range(0, len(traj.kpts_xyz_test), output_size)
        stride = output_size
    xi, xg, ri, rg = [], [], [], []
    for i in idx_starts:
        if i + input_size + output_size > len(xyz):
            break
        xi.append(xyz[i:i + input_size])
        xg.append(xyz[i + input_size:i + input_size + output_size])
        ri.append(rot[i:i + input_size])
        rg.append(rot[i + input_size:i + input_size + output_size])
    if not xi:
        K = traj.n_kpts
        return Windows(
            np.zeros((0, input_size, K, 3), np.float32),
            np.zeros((0, output_size, K, 3), np.float32),
            np.zeros((0, input_size, K, 4), np.float32),
            np.zeros((0, output_size, K, 4), np.float32),
        )
    return Windows(
        np.stack(xi), np.stack(xg), np.stack(ri), np.stack(rg)
    )


def times_from_scene(scene_info, max_time: float):
    """load_dnerf_times twin (dataset.py:76-85): split camera timestamps at
    max_time. Works for any loader that stamps Camera.time."""
    train_times, test_times = [], []
    all_cams = list(scene_info.train_cameras) + list(scene_info.test_cameras)
    for cam in sorted(all_cams, key=lambda c: c.time):
        (train_times if cam.time < max_time else test_times).append(
            float(cam.time)
        )
    return train_times, test_times
