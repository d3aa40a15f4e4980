"""Host-side image decode/resize with a background prefetcher.

The reference decodes gt images with PIL per camera at load time
(dataset_readers.py / camera_utils.py:72-134, PILtoTorch). We keep decode
lazy (Camera.image_path) and overlap it with device compute via a small
thread-pool prefetcher — the host-side analog of its `data_device="cpu"`
per-iteration H2D copy (train.py:105), but without stalling the step.
"""
from __future__ import annotations

import concurrent.futures
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np
from PIL import Image


def load_image(path: str, resize_wh=None) -> np.ndarray:
    """Decode to float32 [H, W, 3] in [0, 1].

    PNGs go through the native C++ decoder (csrc/fastpng.cpp, ~10x faster
    than PIL) when it's built and the file is a supported variant;
    everything else (and resizes) falls back to PIL."""
    if resize_wh is None and path.lower().endswith(".png"):
        from gaussianprediction_tpu.data import native

        out = native.decode_png(path, channels=3)
        if out is not None:
            return out
    img = Image.open(path)
    if resize_wh is not None:
        img = img.resize(resize_wh)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    return np.ascontiguousarray(arr[..., :3])


def load_image_rgba(path: str, resize_wh=None) -> np.ndarray:
    """Decode to float32 [H, W, 4] (alpha 1 when absent)."""
    if resize_wh is None and path.lower().endswith(".png"):
        from gaussianprediction_tpu.data import native

        out = native.decode_png(path, channels=4)
        if out is not None:
            return out
    img = Image.open(path).convert("RGBA")
    if resize_wh is not None:
        img = img.resize(resize_wh)
    return np.asarray(img, dtype=np.float32) / 255.0


def image_size(path: str):
    with Image.open(path) as img:
        return img.size  # (W, H)


class Prefetcher:
    """Decode-ahead iterator: keeps `depth` images in flight on worker
    threads while the device trains on the current one."""

    def __init__(self, load_fn: Callable[[int], np.ndarray],
                 workers: int = 4, depth: int = 8):
        self._load = load_fn
        self._pool = concurrent.futures.ThreadPoolExecutor(workers)
        self._depth = depth
        self._futures: dict = {}
        self._lock = threading.Lock()

    def schedule(self, indices: Sequence[int]):
        with self._lock:
            for i in indices[: self._depth]:
                if i not in self._futures:
                    self._futures[i] = self._pool.submit(self._load, i)

    def get(self, index: int) -> np.ndarray:
        with self._lock:
            fut = self._futures.pop(index, None)
        if fut is None:
            return self._load(index)
        return fut.result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
