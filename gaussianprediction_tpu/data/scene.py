"""Scene orchestration: dataset detection, camera lists, model init.

Twin of the `Scene` class (/root/reference/scene/__init__.py:21-106):
detects the dataset type by marker files (sparse/ -> COLMAP,
transforms_train.json -> Blender/D-NeRF, dataset.json -> HyperNeRF),
loads cameras, computes the cameras_extent used as the spatial LR scale,
and initializes the Gaussian model from the scene point cloud.
"""
from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.data.scene_types import SceneInfo, nerfpp_norm
from gaussianprediction_tpu.utils.camera import Camera


def load_scene_info(cfg: Config, lazy: bool = False) -> SceneInfo:
    """sceneLoadTypeCallbacks dispatch (scene/__init__.py:44-53)."""
    path = cfg.source_path
    if os.path.exists(os.path.join(path, "sparse")):
        from gaussianprediction_tpu.data.colmap import read_colmap_scene

        return read_colmap_scene(path, eval_split=True, lazy=lazy)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        from gaussianprediction_tpu.data.blender import read_nerf_synthetic

        return read_nerf_synthetic(
            path, cfg.model.white_background, eval_split=True,
            max_time=cfg.model.max_time, lazy=lazy,
        )
    if os.path.exists(os.path.join(path, "dataset.json")):
        from gaussianprediction_tpu.data.hypernerf import read_hyper_scene

        return read_hyper_scene(
            path, max_time=cfg.model.max_time, ratio=cfg.ratio, lazy=lazy,
        )
    raise ValueError(f"Could not recognize scene type at {path}")


class Scene:
    """Host-side scene state: cameras + extent + camera sampling.

    `prefetch` > 0 decodes the next K sampled cameras' ground-truth images
    on a background thread pool while the device steps (the sampling order
    is pre-generated per epoch with the SAME rng consumption as the
    original pop-based sampler, so sequences are seed-identical). Decoded
    images cache on the Camera (utils/camera.py:load_image), so this only
    costs the first epoch's latency — which is when compile-fresh TPU
    steps are also the slowest.
    """

    def __init__(self, info: SceneInfo, seed: int = 0, prefetch: int = 4):
        self.info = info
        self.train_cameras: List[Camera] = info.train_cameras
        self.test_cameras: List[Camera] = info.test_cameras
        self.render_cameras: List[Camera] = info.render_cameras
        self.total_frame = info.total_frame
        norm = nerfpp_norm(info.train_cameras)
        self.cameras_extent = norm["radius"]
        self._rng = random.Random(seed)
        self._order: List[int] = []
        self._prefetch = prefetch
        self._pool = None
        if prefetch > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="scene-prefetch"
            )
        self._inflight: dict = {}

    def _refill_epoch(self):
        # identical rng consumption to the original pop-based sampler:
        # stack.pop(randrange(len)) repeated — order is the pop sequence
        stack = list(range(len(self.train_cameras)))
        order = []
        while stack:
            order.append(stack.pop(self._rng.randrange(len(stack))))
        self._order = order

    def _warm(self, idx: int):
        cam = self.train_cameras[idx]
        if cam.image is None and idx not in self._inflight:
            self._inflight[idx] = self._pool.submit(cam.load_image)

    def next_train_camera(self) -> Camera:
        """Random-without-replacement epoch sampling (train.py:86-88)."""
        if not self._order:
            self._refill_epoch()
        idx = self._order.pop(0)
        if self._pool is not None:
            fut = self._inflight.pop(idx, None)
            if fut is not None:
                fut.result()  # ensure the decode finished (caches on cam)
            for j in self._order[: self._prefetch]:
                self._warm(j)
        return self.train_cameras[idx]


def synthetic_scene_info(
    n_points: int = 400, n_cams: int = 12, n_test: int = 3,
    width: int = 64, height: int = 64, dynamic: bool = False,
    seed: int = 0, interpret: Optional[bool] = None,
) -> SceneInfo:
    """Build an in-memory scene by RENDERING a random Gaussian cloud from
    orbit cameras with the oracle-validated renderer — ground truth the
    training pipeline can exactly fit. dynamic=True animates the cloud with
    the analytic swirl (data/synthetic.py) over camera timestamps."""
    import jax.numpy as jnp

    from gaussianprediction_tpu.data.synthetic import (
        orbit_camera, random_gaussians, swirl_positions,
    )
    from gaussianprediction_tpu.ops.rasterize import render as raster_render

    import jax

    g = random_gaussians(n_points, seed=seed, scale_range=(-3.2, -2.0))
    opac = (1.0 / (1.0 + np.exp(-(g["opacity_logit"] + 1.5)))).astype(
        np.float32
    )
    cams = []
    total = n_cams + n_test
    for i in range(total):
        t = i / max(total - 1, 1)
        cams.append(
            orbit_camera(
                theta=2.4 * t + 0.3, phi=0.3 + 0.2 * np.sin(3 * t),
                width=width, height=height, time=t if dynamic else 0.0,
                uid=i,
            )
        )
    bg = jnp.zeros(3)

    @jax.jit
    def render_one(xyz, cam):
        out = raster_render(
            xyz, jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), jnp.asarray(opac), None,
            cam, width, height, bg,
            colors_precomp=jnp.asarray(g["colors"]), interpret=interpret,
        )
        return jnp.clip(out["render"], 0.0, 1.0)

    for cam in cams:
        xyz = (
            swirl_positions(g["xyz"], cam.time) if dynamic else g["xyz"]
        )
        cam.image = np.asarray(
            render_one(jnp.asarray(xyz), cam.to_device_dict())
        )
    rng = np.random.default_rng(seed + 1)
    init_pts = g["xyz"] + rng.normal(0, 0.05, g["xyz"].shape).astype(
        np.float32
    )
    # interleave test views within the orbit/time range (the reference
    # datasets' eval protocol is interpolation, not extrapolation:
    # D-NeRF's test frames sit inside the training trajectory)
    test_idx = set(
        int(round(x)) for x in np.linspace(1, total - 2, n_test)
    ) if n_test else set()
    train_cams = [c for i, c in enumerate(cams) if i not in test_idx]
    test_cams = [c for i, c in enumerate(cams) if i in test_idx]
    return SceneInfo(
        points=init_pts, colors=g["colors"],
        train_cameras=train_cams, test_cameras=test_cams,
        render_cameras=test_cams, total_frame=len(train_cams),
    )
