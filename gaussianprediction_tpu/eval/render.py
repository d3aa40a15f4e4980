"""Render drivers: test sets, interpolated videos, GCN-predicted frames.

Twin of /root/reference/eval.py:75-258 — render_set (per-view renders +
wall-clock FPS), render_video (slerp pose + time interpolation),
render_trainSequence (frozen view over training times), render_kpts
(renders driven by externally predicted keypoint positions/rotations,
eval.py:120-157: xyz = xyz + W_xyz @ (kpts - super), rotation via
W_r @ kpts_rotation applied on the canonical rotations).
"""
from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.models import deform as D
from gaussianprediction_tpu.models.gaussians import (
    GaussianState, get_shs, opacity_act, rotation_act, scaling_act,
)
from gaussianprediction_tpu.ops import rasterize
from gaussianprediction_tpu.train.step import render_at_time
from gaussianprediction_tpu.utils.camera import Camera, interpolate_cameras
from gaussianprediction_tpu.utils.math import quat_mul


def save_image(path: str, img: np.ndarray):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def save_video(path: str, frames: List[np.ndarray], fps: int = 30):
    """makeVideo twin (utils/prepare/makeVideo.py)."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.stack(
        [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    )
    try:
        imageio.mimwrite(path, arr, fps=fps)
    except Exception:  # no ffmpeg: fall back to per-frame PNGs
        base = os.path.splitext(path)[0]
        for i, f in enumerate(arr):
            imageio.imwrite(f"{base}_{i:05d}.png", f)


def _eval_stage(cfg: Config, iteration: int) -> int:
    from gaussianprediction_tpu.train.loop import stage_of

    return stage_of(cfg, iteration)


def make_render_fn(state: GaussianState, cfg: Config, iteration: int,
                   width: int, height: int, bg, sh_degree: int,
                   interpret=None):
    """One jitted view-render closure reused across views."""
    stage = _eval_stage(cfg, iteration)
    bg = jnp.asarray(bg, jnp.float32)
    key = jax.random.PRNGKey(0)  # noise anneals are exhausted at eval iters

    @jax.jit
    def fn(cam, t):
        pkg, _ = render_at_time(
            state.params, cfg, state, cam, t, jnp.int32(iteration), key,
            stage, width, height, bg, sh_degree, interpret=interpret,
            need_tidx=True,  # eval consumes per-pixel argmax ids (eval.py:39-46)
        )
        return pkg["render"], pkg["depth"], pkg["tidx"]

    return fn


def render_set(
    state: GaussianState, cfg: Config, iteration: int, views: List[Camera],
    bg, out_dir: Optional[str] = None, sh_degree: Optional[int] = None,
    interpret=None, save_gt: bool = True,
):
    """render_set twin (eval.py:192-226): renders + gt dumps + FPS timing.

    Returns (renders, gts, fps)."""
    if not views:
        return [], [], 0.0
    W, H = views[0].width, views[0].height
    sh_degree = cfg.model.sh_degree if sh_degree is None else sh_degree
    fn = make_render_fn(state, cfg, iteration, W, H, bg, sh_degree,
                        interpret)
    renders, gts = [], []
    elapsed = 0.0
    for i, view in enumerate(views):
        cam = view.to_device_dict()
        t0 = time.time()
        rgb, depth, tidx = fn(cam, jnp.float32(view.time))
        rgb.block_until_ready()
        elapsed += time.time() - t0
        img = np.asarray(jnp.clip(rgb, 0.0, 1.0))
        renders.append(img)
        if out_dir:
            save_image(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
        if save_gt and view.image is not None or view.image_path:
            gt = view.load_image()
            gts.append(gt)
            if out_dir:
                save_image(os.path.join(out_dir, "gt", f"{i:05d}.png"), gt)
    fps = len(views) / max(elapsed, 1e-9)
    return renders, gts, fps


def render_video(
    state: GaussianState, cfg: Config, iteration: int, views: List[Camera],
    bg, out_path: Optional[str] = None, interpolation: int = 5,
    interpret=None, fps: int = 30, step: int = 1,
):
    """render_video twin (eval.py:75-118): interpolate pose (slerp) and time
    between consecutive views.

    step: stride over the view list before interpolating — the reference
    uses step=2 for HyperNeRF-vrig captures (eval.py:81 `step = 2 if
    "vrig" in model_path`) because vrig's paired-rig views alternate
    cameras frame-to-frame."""
    if len(views) < 2:
        return []
    W, H = views[0].width, views[0].height
    fn = make_render_fn(state, cfg, iteration, W, H, bg,
                        cfg.model.sh_degree, interpret)
    frames = []
    for idx in range(step, len(views), step):
        prev, view = views[idx - step], views[idx]
        interp = interpolate_cameras(prev, view, interpolation)
        for cam in interp:
            rgb, _, _ = fn(cam.to_device_dict(), jnp.float32(cam.time))
            frames.append(np.asarray(jnp.clip(rgb, 0.0, 1.0)))
    if out_path:
        save_video(out_path, frames, fps=fps)
    return frames


def render_train_sequence(
    state: GaussianState, cfg: Config, iteration: int,
    train_views: List[Camera], freeze_view: Camera, bg,
    out_dir: Optional[str] = None, interpret=None,
):
    """render_trainSequence twin (eval.py:159-190): freeze one viewpoint,
    sweep the training timestamps."""
    W, H = freeze_view.width, freeze_view.height
    fn = make_render_fn(state, cfg, iteration, W, H, bg,
                        cfg.model.sh_degree, interpret)
    cam = freeze_view.to_device_dict()
    frames = []
    for i, tv in enumerate(train_views):
        rgb, _, _ = fn(cam, jnp.float32(tv.time))
        img = np.asarray(jnp.clip(rgb, 0.0, 1.0))
        frames.append(img)
        if out_dir:
            save_image(os.path.join(out_dir, f"{i:05d}.png"), img)
    return frames


def render_kpts(
    state: GaussianState, cfg: Config, iteration: int, views: List[Camera],
    bg, kpts: np.ndarray, kpts_rotation: np.ndarray,
    out_dir: Optional[str] = None, view_id: Optional[int] = None,
    interpret=None,
):
    """render_kpts twin (eval.py:120-157): drive Gaussians from GCN-predicted
    keypoints. Blend weights/indices are computed once at the first view's
    time (the weight model is time-independent; eval.py:126)."""
    if not views:
        return []
    W, H = views[0].width, views[0].height
    bgj = jnp.asarray(bg, jnp.float32)
    key = jax.random.PRNGKey(0)

    n_kpts = kpts.shape[1]
    dout = D.deform_stage23(
        state.params, cfg, state, jnp.float32(views[0].time),
        jnp.int32(iteration), key,
    )
    nn_idx, w_xyz, w_r = dout.nn_idx, dout.weights_xyz, dout.weights_r
    p = state.params
    Ck = state.kpt_capacity

    def pad_k(arr, fill=0.0):
        out = jnp.full((Ck,) + arr.shape[1:], fill, jnp.float32)
        return out.at[:n_kpts].set(jnp.asarray(arr))

    @jax.jit
    def fn(cam, kpt_xyz, kpt_rot):
        # xyz_final = xyz + W_xyz @ (kpts - super) in KNN-sparse gather form
        dxyz_k = kpt_xyz - p["super_xyz"]
        dxyz_k = jnp.where(state.kpt_alive[:, None], dxyz_k, 0.0)
        delta_xyz = jnp.einsum("nk,nkc->nc", w_xyz, dxyz_k[nn_idx])
        rot_k = jnp.where(
            state.kpt_alive[:, None], kpt_rot,
            jnp.asarray([1.0, 0, 0, 0]),
        )
        delta_q = jnp.einsum("nk,nkc->nc", w_r, rot_k[nn_idx])
        xyz_t = p["xyz"] + delta_xyz
        q_t = rotation_act(quat_mul(rotation_act(delta_q), p["rotation"]))
        pkg = rasterize.render(
            xyz_t, scaling_act(p["scaling"]), q_t,
            opacity_act(p["opacity"]), get_shs(p), cam, W, H, bgj,
            sh_degree=cfg.model.sh_degree, alive=state.alive,
            interpret=interpret,
        )
        return pkg["render"]

    frames = []
    for i in range(len(kpts)):
        view = views[view_id if view_id is not None else min(i, len(views) - 1)]
        rgb = fn(
            view.to_device_dict(), pad_k(kpts[i]), pad_k(kpts_rotation[i])
        )
        img = np.asarray(jnp.clip(rgb, 0.0, 1.0))
        frames.append(img)
        if out_dir:
            save_image(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
    return frames
