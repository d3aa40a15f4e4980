"""Scene containers shared by all dataset loaders."""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from gaussianprediction_tpu.utils.camera import Camera, world_to_view


@dataclasses.dataclass
class SceneInfo:
    """Loader output (SceneInfo twin,
    /root/reference/scene/dataset_readers.py:41-48)."""

    points: np.ndarray
    colors: np.ndarray
    train_cameras: List[Camera]
    test_cameras: List[Camera]
    render_cameras: List[Camera]
    ply_path: Optional[str] = None
    total_frame: int = 1


def nerfpp_norm(cameras: List[Camera]) -> dict:
    """Camera-extent normalization (getNerfppNorm,
    dataset_readers.py:50-71): radius = 1.1 * max distance of any camera
    center from their mean."""
    centers = []
    for cam in cameras:
        W2C = world_to_view(cam.R, cam.T)
        centers.append(np.linalg.inv(W2C)[:3, 3:4])
    centers = np.hstack(centers)
    avg = centers.mean(axis=1, keepdims=True)
    dist = np.linalg.norm(centers - avg, axis=0)
    diagonal = float(dist.max())
    return {"translate": -avg.flatten(), "radius": diagonal * 1.1}
