"""Blender / D-NeRF synthetic dataset loader.

Behavioral twin of readNerfSyntheticInfo / readCamerasFromTransforms
(/root/reference/scene/dataset_readers.py:185-282): transforms_{train,test,
render}.json parsing, OpenGL->COLMAP axis flip, alpha-composite onto the
background, `max_time` train/test split along time (the prediction
protocol), and the random 50k-point init when no points3d.ply exists.
"""
from __future__ import annotations

import json
import math
import os
from typing import List, Optional, Tuple

import numpy as np

from gaussianprediction_tpu.data.scene_types import SceneInfo
from gaussianprediction_tpu.utils.camera import Camera, focal2fov, fov2focal
from gaussianprediction_tpu.utils.ply import fetch_point_cloud, store_point_cloud
from gaussianprediction_tpu.utils.sh import C0


def _load_image_composited(path: str, white_background: bool) -> np.ndarray:
    from gaussianprediction_tpu.data.image_io import load_image_rgba

    rgba = load_image_rgba(path)
    bg = 1.0 if white_background else 0.0
    rgb = rgba[..., :3] * rgba[..., 3:4] + bg * (1.0 - rgba[..., 3:4])
    return rgb.astype(np.float32)


def read_cameras_from_transforms(
    path: str, transformsfile: str, white_background: bool,
    extension: str = ".png", max_time: float = 1.0, lazy: bool = False,
) -> Tuple[List[Camera], List[Camera]]:
    """Returns (cams with time < max_time, cams with time >= max_time);
    mirrors dataset_readers.py:185-231."""
    cams, cams_late = [], []
    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    for idx, frame in enumerate(contents["frames"]):
        img_path = os.path.join(path, frame["file_path"] + extension)
        time = float(frame.get("time", 0.0))
        c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        c2w[:3, 1:3] *= -1  # OpenGL -> COLMAP axes
        w2c = np.linalg.inv(c2w)
        R = np.transpose(w2c[:3, :3])
        T = w2c[:3, 3]
        image = None if lazy else _load_image_composited(
            img_path, white_background
        )
        if image is not None:
            h, w = image.shape[:2]
        else:
            from gaussianprediction_tpu.data.image_io import image_size

            w, h = image_size(img_path)
        fovy = focal2fov(fov2focal(fovx, w), h)
        cam = Camera(
            uid=idx, R=R, T=T, fovx=fovx, fovy=fovy, image=image,
            image_name=os.path.splitext(os.path.basename(img_path))[0],
            width=w, height=h, time=time, image_path=img_path,
        )
        (cams if time < max_time else cams_late).append(cam)
    return cams, cams_late


def read_nerf_synthetic(
    path: str, white_background: bool, eval_split: bool,
    extension: str = ".png", max_time: float = 1.0, lazy: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> SceneInfo:
    """readNerfSyntheticInfo twin (dataset_readers.py:233-282)."""
    train_cams, test_cams = read_cameras_from_transforms(
        path, "transforms_train.json", white_background, extension,
        max_time=max_time, lazy=lazy,
    )
    if max_time == 1.0 and os.path.exists(
        os.path.join(path, "transforms_test.json")
    ):
        test_cams, _ = read_cameras_from_transforms(
            path, "transforms_test.json", white_background, extension,
            lazy=lazy,
        )
    render_path = os.path.join(path, "transforms_render.json")
    if os.path.exists(render_path):
        render_cams, _ = read_cameras_from_transforms(
            path, "transforms_render.json", white_background, extension,
            lazy=lazy,
        )
    else:
        render_cams = test_cams
    if not eval_split:
        train_cams = train_cams + test_cams
        test_cams = []

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        # random init inside the synthetic scene bounds (:253-263)
        num_pts = 50_000
        rng = rng or np.random.default_rng(0)
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        rgb = shs * C0 + 0.5
        store_point_cloud(ply_path, xyz.astype(np.float32), rgb * 255)
    points, colors, _ = fetch_point_cloud(ply_path)
    return SceneInfo(
        points=points, colors=colors,
        train_cameras=train_cams, test_cameras=test_cams,
        render_cameras=render_cams, ply_path=ply_path,
        total_frame=max(len(train_cams), 1),
    )
