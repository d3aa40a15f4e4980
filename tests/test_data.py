"""Dataset loaders against synthetic on-disk fixtures (SURVEY.md §2.1 L2)."""
import json
import os

import numpy as np
import pytest

from gaussianprediction_tpu.config import Config, get_preset
from gaussianprediction_tpu.data import blender, colmap, hypernerf
from gaussianprediction_tpu.data.scene import Scene, load_scene_info
from gaussianprediction_tpu.data.scene_types import nerfpp_norm
from gaussianprediction_tpu.utils.camera import Camera


def write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


@pytest.fixture
def blender_dir(tmp_path):
    """Minimal D-NeRF-style dataset: 6 frames with times + RGBA images."""
    rng = np.random.default_rng(0)
    d = tmp_path / "dnerf"
    (d / "train").mkdir(parents=True)
    frames = []
    for i in range(6):
        ang = i * 0.5
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.sin(ang), 0.5, 3 * np.cos(ang)]
        # look-at-origin rotation (approx; orthonormalized)
        z = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        x = np.cross([0, 1, 0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w[:3, :3] = np.stack([x, y, -z], axis=1)
        img = rng.uniform(0, 1, (32, 40, 4)).astype(np.float32)
        write_png(str(d / "train" / f"r_{i}.png"), img)
        frames.append({
            "file_path": f"train/r_{i}",
            "time": i / 5.0,
            "transform_matrix": c2w.tolist(),
        })
    with open(d / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(d)


class TestBlenderLoader:
    def test_load_and_split(self, blender_dir):
        info = blender.read_nerf_synthetic(
            blender_dir, white_background=False, eval_split=True,
            max_time=0.7,
        )
        # times 0,.2,.4,.6 train; .8,1.0 go to the late/test split
        assert len(info.train_cameras) == 4
        assert len(info.test_cameras) == 2
        assert info.points.shape == (50_000, 3)  # random init written
        assert os.path.exists(os.path.join(blender_dir, "points3d.ply"))
        cam = info.train_cameras[1]
        assert cam.time == pytest.approx(0.2)
        assert cam.image.shape == (32, 40, 3)

    def test_scene_detection_and_extent(self, blender_dir):
        cfg = get_preset("test")
        cfg.source_path = blender_dir
        cfg.model.max_time = 1.0
        info = load_scene_info(cfg)
        scene = Scene(info)
        assert scene.cameras_extent > 0
        # epoch sampler covers every camera before repeating
        seen = set()
        for _ in range(len(scene.train_cameras)):
            seen.add(scene.next_train_camera().uid)
        assert len(seen) == len(scene.train_cameras)


@pytest.fixture
def colmap_dir(tmp_path):
    d = tmp_path / "colmap"
    (d / "sparse" / "0").mkdir(parents=True)
    (d / "images").mkdir()
    rng = np.random.default_rng(1)
    with open(d / "sparse" / "0" / "cameras.txt", "w") as f:
        f.write("# comment\n1 PINHOLE 64 48 60.0 60.0 32 24\n")
    with open(d / "sparse" / "0" / "images.txt", "w") as f:
        for i in range(4):
            q = rng.normal(size=4); q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(
                f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} "
                f"{t[0]} {t[1]} {t[2]} 1 img_{i}.png\n\n"
            )
            write_png(str(d / "images" / f"img_{i}.png"),
                      rng.uniform(0, 1, (48, 64, 3)))
    with open(d / "sparse" / "0" / "points3D.txt", "w") as f:
        for i in range(20):
            p = rng.normal(size=3)
            f.write(f"{i} {p[0]} {p[1]} {p[2]} 100 120 140 0.5 1 0\n")
    return str(d)


class TestColmapLoader:
    def test_text_model(self, colmap_dir):
        info = colmap.read_colmap_scene(colmap_dir, eval_split=True,
                                        llffhold=2)
        assert len(info.train_cameras) + len(info.test_cameras) == 4
        assert info.points.shape == (20, 3)
        cam = info.train_cameras[0]
        assert cam.width == 64 and cam.height == 48
        assert 0 < cam.fovx < np.pi

    def test_qvec_roundtrip(self):
        q = np.array([0.9, 0.1, -0.3, 0.2])
        q /= np.linalg.norm(q)
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0)


@pytest.fixture
def hyper_dir(tmp_path):
    d = tmp_path / "hyper"
    (d / "camera").mkdir(parents=True)
    (d / "rgb" / "2x").mkdir(parents=True)
    rng = np.random.default_rng(2)
    ids = [f"{i:06d}" for i in range(12)]
    with open(d / "dataset.json", "w") as f:
        json.dump({"ids": ids, "val_ids": []}, f)
    with open(d / "metadata.json", "w") as f:
        json.dump({i: {"warp_id": k, "camera_id": 0}
                   for k, i in enumerate(ids)}, f)
    with open(d / "scene.json", "w") as f:
        json.dump({"near": 0.1, "far": 10.0, "scale": 1.0,
                   "center": [0, 0, 0]}, f)
    for i in ids:
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        from gaussianprediction_tpu.utils.camera import quat_to_rotmat_np

        R = quat_to_rotmat_np(q)
        with open(d / "camera" / f"{i}.json", "w") as f:
            json.dump({
                "orientation": R.tolist(),
                "position": rng.normal(size=3).tolist(),
                "focal_length": 80.0,
                "image_size": [64, 48],
            }, f)
        write_png(str(d / "rgb" / "2x" / f"{i}.png"),
                  rng.uniform(0, 1, (24, 32, 3)))
    from gaussianprediction_tpu.utils.ply import store_point_cloud

    store_point_cloud(
        str(d / "points3D_downsample.ply"),
        rng.normal(size=(30, 3)).astype(np.float32),
        rng.uniform(0, 255, (30, 3)),
    )
    return str(d)


class TestHyperLoader:
    def test_every_fourth_split(self, hyper_dir):
        info = hypernerf.read_hyper_scene(hyper_dir, max_time=1.0,
                                          ratio=0.5)
        # 12 imgs: train = idx%4==0 -> 3; test = train+2 (minus last) -> 2
        assert len(info.train_cameras) == 3
        assert len(info.test_cameras) == 2
        assert info.total_frame == 12
        t = [c.time for c in info.train_cameras]
        assert max(t) <= 1.0 and min(t) >= 0.0

    def test_prediction_split(self, hyper_dir):
        info = hypernerf.read_hyper_scene(hyper_dir, max_time=0.6,
                                          ratio=0.5)
        assert all(c.time < 0.6 for c in info.train_cameras)
        assert all(c.time >= 0.6 for c in info.test_cameras)


class TestNerfppNorm:
    def test_radius_positive(self):
        import math

        cams = [
            Camera(uid=i, R=np.eye(3), T=np.array([0, 0, 2.0 + i]),
                   fovx=1.0, fovy=1.0, image=None, image_name=str(i),
                   width=8, height=8)
            for i in range(3)
        ]
        norm = nerfpp_norm(cams)
        assert norm["radius"] > 0


class TestPrepTools:
    def test_voxel_downsample(self):
        sys_path = __import__("sys").path
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "prep", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools",
                "prepare_hypernerf.py"),
        )
        prep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(prep)
        rng = np.random.default_rng(7)
        pts = rng.normal(size=(5000, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
        p, c = prep.voxel_downsample(pts, cols, 0.5)
        assert len(p) < 5000 and len(p) == len(c)
        # rotmat2qvec roundtrip vs our camera utils
        from gaussianprediction_tpu.utils.camera import quat_to_rotmat_np

        q0 = rng.normal(size=4)
        q0 /= np.linalg.norm(q0)
        if q0[0] < 0:
            q0 = -q0
        R = quat_to_rotmat_np(q0)
        np.testing.assert_allclose(prep.rotmat2qvec(R), q0, atol=1e-8)

    def test_hyper_convert_roundtrip(self, hyper_dir, tmp_path):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "prep", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools",
                "prepare_hypernerf.py"),
        )
        prep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(prep)
        # fixture cameras lack principal_point; add it
        for f in os.listdir(os.path.join(hyper_dir, "camera")):
            p = os.path.join(hyper_dir, "camera", f)
            with open(p) as fh:
                cam = json.load(fh)
            cam["principal_point"] = [32, 24]
            with open(p, "w") as fh:
                json.dump(cam, fh)
        out = str(tmp_path / "sparse_")
        prep.convert(hyper_dir, out_dir=out, image_scale=2)
        from gaussianprediction_tpu.data import colmap as cm

        cams = cm.read_cameras_text(os.path.join(out, "cameras.txt"))
        imgs = cm.read_images_text(os.path.join(out, "images.txt"))
        assert len(cams) == 12 and len(imgs) == 12


class TestColmapBinary:
    def test_binary_roundtrip(self, tmp_path):
        """Write COLMAP .bin fixtures with struct and parse them."""
        import struct

        d = tmp_path / "sparse0"
        d.mkdir()
        rng = np.random.default_rng(3)
        # cameras.bin: one PINHOLE camera
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # id, PINHOLE, w, h
            f.write(struct.pack("<dddd", 60.0, 61.0, 32.0, 24.0))
        cams = colmap.read_cameras_binary(str(d / "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64
        np.testing.assert_allclose(cams[1].params, [60, 61, 32, 24])

        # images.bin: two images, one with 2 2D-points
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, npts in ((1, 0), (2, 2)):
                q = rng.normal(size=4); q /= np.linalg.norm(q)
                f.write(struct.pack("<i", i))
                f.write(struct.pack("<dddd", *q))
                f.write(struct.pack("<ddd", 0.1 * i, 0.2, 0.3))
                f.write(struct.pack("<i", 1))
                f.write(f"img_{i}.png".encode() + b"\x00")
                f.write(struct.pack("<Q", npts))
                for _ in range(npts):
                    f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        imgs = colmap.read_images_binary(str(d / "images.bin"))
        assert len(imgs) == 2
        assert imgs[2].name == "img_2.png"
        assert imgs[1].tvec[0] == pytest.approx(0.1)

        # points3D.bin: 3 points with track length 1
        with open(d / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 3))
            for i in range(3):
                f.write(struct.pack("<Q", i))
                f.write(struct.pack("<ddd", i * 1.0, 2.0, 3.0))
                f.write(struct.pack("<BBB", 10, 20, 30))
                f.write(struct.pack("<d", 0.5))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", 1, 0))
        xyz, rgb, err = colmap.read_points3d_binary(str(d / "points3D.bin"))
        assert xyz.shape == (3, 3)
        np.testing.assert_allclose(xyz[:, 0], [0, 1, 2])
        np.testing.assert_allclose(rgb[0], [10, 20, 30])


class TestNerfiesCamera:
    """Distortion-aware HyperNeRF camera (data/nerfies_camera.py, twin of
    reference scene/utils.py:63-427)."""

    def _cam(self, **kw):
        from gaussianprediction_tpu.data.nerfies_camera import NerfiesCamera
        import numpy as np
        th = 0.3
        R = np.asarray([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]])
        return NerfiesCamera(
            orientation=R, position=[0.5, -0.2, -3.0], focal_length=500.0,
            principal_point=[320.0, 240.0], image_size=[640, 480],
            radial_distortion=[-0.15, 0.03, 0.0],
            tangential_distortion=[1e-3, -5e-4], dtype=np.float64, **kw,
        )

    def test_undistort_inverts_distortion(self):
        import numpy as np
        from gaussianprediction_tpu.data.nerfies_camera import (
            _distort, undistort,
        )
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.4, 0.4, 200)
        y = rng.uniform(-0.3, 0.3, 200)
        k1, k2, k3, p1, p2 = -0.2, 0.05, 0.01, 2e-3, -1e-3
        xd, yd = _distort(x, y, k1, k2, k3, p1, p2)
        xu, yu = undistort(xd, yd, k1, k2, k3, p1, p2)
        np.testing.assert_allclose(xu, x, atol=1e-8)
        np.testing.assert_allclose(yu, y, atol=1e-8)

    def test_project_pixels_roundtrip(self):
        import numpy as np
        cam = self._cam()
        rng = np.random.default_rng(1)
        pixels = np.stack([rng.uniform(50, 590, 100),
                           rng.uniform(50, 430, 100)], axis=-1)
        depth = rng.uniform(2.0, 6.0, 100)
        pts = cam.pixels_to_points(pixels, depth)
        back = cam.project(pts)
        np.testing.assert_allclose(back, pixels, atol=1e-5)

    def test_rays_are_unit_and_through_center(self):
        import numpy as np
        cam = self._cam()
        rays = cam.pixels_to_rays(np.asarray([[320.0, 240.0]]))
        np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0,
                                   atol=1e-7)
        # principal-point ray ~ optical axis (small distortion at center)
        assert float(rays[0] @ cam.optical_axis) > 0.999

    def test_scale_preserves_projection_direction(self):
        import numpy as np
        cam = self._cam()
        half = cam.scale(0.5)
        assert half.image_size_x == 320 and half.image_size_y == 240
        p = np.asarray([[0.3, 0.1, 2.0]])
        np.testing.assert_allclose(half.project(p), cam.project(p) * 0.5,
                                   atol=1e-5)

    def test_crop_shifts_principal_point(self):
        import numpy as np
        cam = self._cam()
        c = cam.crop_image_domain(left=10, top=20)
        p = np.asarray([[0.3, 0.1, 2.0]])
        np.testing.assert_allclose(
            c.project(p), cam.project(p) - np.asarray([10.0, 20.0]),
            atol=1e-5,
        )

    def test_look_at_points_camera_at_target(self):
        import numpy as np
        cam = self._cam()
        c = cam.look_at([1.0, 2.0, -5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # target projects to the principal point
        px = c.project(np.zeros((1, 3)))
        np.testing.assert_allclose(px[0], c.principal_point, atol=1e-4)

    def test_json_roundtrip(self, tmp_path):
        import json as J
        import numpy as np
        from gaussianprediction_tpu.data.nerfies_camera import NerfiesCamera
        cam = self._cam()
        p = tmp_path / "cam.json"
        with open(p, "w") as f:
            J.dump(cam.to_json(), f)
        cam2 = NerfiesCamera.from_json(str(p))
        np.testing.assert_allclose(cam2.orientation, cam.orientation)
        np.testing.assert_allclose(cam2.radial_distortion,
                                   cam.radial_distortion)


class TestScenePrefetch:
    def test_sampling_sequence_matches_legacy(self):
        """The pre-generated epoch order must consume the rng exactly like
        the original pop-based sampler (seed reproducibility)."""
        import random
        from gaussianprediction_tpu.data.scene import (
            Scene, synthetic_scene_info,
        )
        info = synthetic_scene_info(n_points=20, n_cams=7, n_test=0,
                                    width=16, height=16, interpret=True)
        seed = 11
        scene = Scene(info, seed=seed, prefetch=0)
        got = [scene.next_train_camera().uid for _ in range(15)]
        # legacy simulation
        rng = random.Random(seed)
        stack, expect = [], []
        for _ in range(15):
            if not stack:
                stack = list(range(7))
            expect.append(stack.pop(rng.randrange(len(stack))))
        assert [info.train_cameras[i].uid for i in expect] == got

    def test_prefetch_warms_cache(self, tmp_path):
        import numpy as np
        import imageio.v2 as imageio
        from gaussianprediction_tpu.data.scene import Scene
        from gaussianprediction_tpu.data.scene_types import SceneInfo
        from gaussianprediction_tpu.utils.camera import Camera
        cams = []
        for i in range(6):
            p = str(tmp_path / f"im{i}.png")
            imageio.imwrite(p, np.full((8, 8, 3), i * 20, np.uint8))
            cams.append(Camera(uid=i, R=np.eye(3), T=np.zeros(3),
                               fovx=1.0, fovy=1.0, image=None,
                               image_name=f"im{i}", width=8, height=8,
                               time=0.0, image_path=p))
        info = SceneInfo(points=np.zeros((4, 3), np.float32),
                         colors=np.zeros((4, 3), np.float32),
                         train_cameras=cams, test_cameras=[],
                         render_cameras=[], total_frame=6)
        scene = Scene(info, seed=0, prefetch=3)
        seen = [scene.next_train_camera() for _ in range(6)]
        for c in seen:
            img = c.load_image()
            assert img.shape == (8, 8, 3)
        # after one epoch with prefetch, most images are cached
        assert sum(c.image is not None for c in cams) == 6
