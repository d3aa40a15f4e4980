#!/usr/bin/env python
"""HyperNeRF data-prep tooling (reference L7 pipeline, SURVEY.md §3.5).

Twin of /root/reference/utils/prepare/hypernerf2colmap.py +
database.py camTodatabase + utils/prepare/downsample_points.py:

  convert    HyperNeRF JSON cameras -> COLMAP text model (images.txt /
             cameras.txt, empty points3D.txt) + copy the 2x images so COLMAP
             can triangulate an initial point cloud
  inject     write known intrinsics into a COLMAP SQLite database before
             point_triangulator (prior_focal_length=True)
  downsample voxel-downsample the fused MVS cloud to <= max points (the
             reference uses open3d's voxel grid; re-implemented in numpy)

The COLMAP binary itself is external (feature_extractor -> inject ->
exhaustive_matcher -> point_triangulator -> image_undistorter ->
patch_match_stereo -> stereo_fusion -> downsample), exactly as
/root/reference/scripts/utils/colmap.sh orchestrates.
"""
import argparse
import json
import os
import shutil
import sqlite3
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rotmat2qvec(R):
    """COLMAP's eigen-decomposition rotation->quaternion (wxyz)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def convert(root_dir: str, out_dir=None, image_scale: int = 2,
            max_images: int = 100):
    """hypernerf2colmap twin: write a COLMAP text model from the JSON cams."""
    out_dir = out_dir or os.path.join(root_dir, "sparse_")
    img_out = os.path.join(root_dir, "image_colmap")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(img_out, exist_ok=True)
    with open(os.path.join(root_dir, "dataset.json")) as f:
        dataset = json.load(f)
    ids = dataset["ids"][:max_images]
    s = float(image_scale)
    with open(os.path.join(out_dir, "images.txt"), "w") as fi, open(
        os.path.join(out_dir, "cameras.txt"), "w"
    ) as fc:
        for idx, name in enumerate(ids):
            with open(os.path.join(root_dir, "camera",
                                   f"{name}.json")) as f:
                cam = json.load(f)
            R = np.array(cam["orientation"]).T
            T = -np.array(cam["position"]) @ R
            q = rotmat2qvec(R.T)
            img = f"{name}.png"
            fi.write(
                f"{idx + 1} " + " ".join(str(v) for v in q) + " "
                + " ".join(str(v) for v in T) + f" {idx + 1} {img}\n\n"
            )
            size = cam["image_size"]
            pp = cam["principal_point"]
            fc.write(
                f"{idx + 1} SIMPLE_PINHOLE {size[0] / s:g} {size[1] / s:g} "
                f"{cam['focal_length'] / s} {pp[0] / s} {pp[1] / s}\n"
            )
            src = os.path.join(root_dir, "rgb", f"{image_scale}x", img)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(img_out, img))
    open(os.path.join(out_dir, "points3D.txt"), "w").close()
    print(f"wrote COLMAP text model for {len(ids)} images to {out_dir}")


CAM_MODEL_IDS = {
    "SIMPLE_PINHOLE": 0, "PINHOLE": 1, "SIMPLE_RADIAL": 2, "RADIAL": 3,
    "OPENCV": 4, "FULL_OPENCV": 5, "SIMPLE_RADIAL_FISHEYE": 6,
    "RADIAL_FISHEYE": 7, "OPENCV_FISHEYE": 8, "FOV": 9,
    "THIN_PRISM_FISHEYE": 10,
}


def inject(database_path: str, cameras_txt: str):
    """camTodatabase twin (reference database.py:52-117): overwrite the
    auto-estimated intrinsics with the known ones."""
    from gaussianprediction_tpu.data.colmap import read_cameras_text

    assert os.path.exists(database_path), database_path
    cams = read_cameras_text(cameras_txt)
    db = sqlite3.connect(database_path)
    for cid, cam in cams.items():
        params = np.asarray(cam.params, np.float64)
        db.execute(
            "UPDATE cameras SET model=?, width=?, height=?, params=?, "
            "prior_focal_length=True WHERE camera_id=?",
            (CAM_MODEL_IDS[cam.model], cam.width, cam.height,
             params.tobytes(), cid),
        )
    db.commit()
    db.close()
    print(f"injected intrinsics for {len(cams)} cameras")


def voxel_downsample(points, colors, voxel_size):
    """Open3d-style voxel-grid downsample (mean position/color per voxel)."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    n = counts.shape[0]
    psum = np.zeros((n, 3))
    csum = np.zeros((n, 3))
    np.add.at(psum, inv, points)
    np.add.at(csum, inv, colors)
    return (psum / counts[:, None]).astype(np.float32), (
        csum / counts[:, None]
    ).astype(np.float32)


def downsample(ply_in: str, ply_out: str, max_points: int = 40_000):
    """downsample_points.py twin: binary-search the voxel size."""
    from gaussianprediction_tpu.utils.ply import (
        fetch_point_cloud, store_point_cloud,
    )

    points, colors, _ = fetch_point_cloud(ply_in)
    if len(points) <= max_points:
        store_point_cloud(ply_out, points, colors * 255)
        print(f"{len(points)} points (no downsample needed)")
        return
    lo, hi = 1e-4, float(np.ptp(points, axis=0).max())
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        p, c = voxel_downsample(points, colors, mid)
        if len(p) > max_points:
            lo = mid
        else:
            hi = mid
    p, c = voxel_downsample(points, colors, hi)
    store_point_cloud(ply_out, p, np.clip(c, 0, 1) * 255)
    print(f"downsampled {len(points)} -> {len(p)} points (voxel {hi:.5f})")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("root_dir")
    c.add_argument("--scale", type=int, default=2)
    c.add_argument("--max_images", type=int, default=100)
    i = sub.add_parser("inject")
    i.add_argument("--database_path", required=True)
    i.add_argument("--txt_path", required=True)
    d = sub.add_parser("downsample")
    d.add_argument("ply_in")
    d.add_argument("ply_out")
    d.add_argument("--max_points", type=int, default=40_000)
    args = p.parse_args()
    if args.cmd == "convert":
        convert(args.root_dir, image_scale=args.scale,
                max_images=args.max_images)
    elif args.cmd == "inject":
        inject(args.database_path, args.txt_path)
    else:
        downsample(args.ply_in, args.ply_out, args.max_points)


if __name__ == "__main__":
    main()
