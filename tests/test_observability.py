"""TensorBoard-format observability (SURVEY.md §5.5, reference
train.py:244-287): the hand-rolled event writer round-trips, and training
runs emit scalar/histogram/image events."""
import os

import numpy as np

from gaussianprediction_tpu.utils.tb_writer import (
    SummaryWriter, crc32c, read_events,
)


class TestWriter:
    def test_crc32c_vector(self):
        # RFC 3720 / Castagnoli check value
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0

    def test_scalar_histogram_image_roundtrip(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("train/loss", 0.25, 10)
        vals = np.random.default_rng(0).uniform(0, 1, 500)
        w.add_histogram("scene/opacity_histogram", vals, 10)
        img = np.random.default_rng(1).uniform(0, 1, (8, 8, 3)).astype(
            np.float32
        )
        w.add_image("test/render", img, 10)
        w.close()

        evs = read_events(w.path)
        assert evs[0]["file_version"] == "brain.Event:2"
        assert evs[1]["values"][0]["tag"] == "train/loss"
        assert evs[1]["values"][0]["simple_value"] == 0.25
        assert evs[1]["step"] == 10
        assert "histo" in evs[2]["values"][0]
        imgmsg = evs[3]["values"][0]["image"]
        assert imgmsg[:20]  # non-empty encoded submessage
        # PNG magic inside the Image submessage
        assert b"\x89PNG" in imgmsg

    def test_histogram_counts_sum_to_n(self, tmp_path):
        import struct

        from gaussianprediction_tpu.utils.tb_writer import _decode_fields

        w = SummaryWriter(str(tmp_path))
        vals = np.asarray([-2.0, -1.0, 0.0, 0.5, 1.0, 4.0])
        w.add_histogram("h", vals, 0)
        w.close()
        evs = read_events(w.path)
        histo = evs[1]["values"][0]["histo"]
        fields = _decode_fields(histo)
        fmap = {}
        for f, wire, v in fields:
            fmap[f] = v
        assert fmap[1] == -2.0 and fmap[2] == 4.0  # min/max
        assert fmap[3] == 6.0  # num
        counts = struct.unpack(f"<{len(fmap[7]) // 8}d", fmap[7])
        assert sum(counts) == 6.0

    def test_empty_values_dont_crash(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_histogram("h", np.asarray([]), 0)
        w.add_histogram("h2", np.asarray([np.nan, np.inf]), 0)
        w.close()
        assert len(read_events(w.path)) == 3


class TestTrainingEmitsEvents:
    def test_loop_writes_event_file(self, tmp_path):
        from gaussianprediction_tpu.config import get_preset
        from gaussianprediction_tpu.data.scene import (
            Scene, synthetic_scene_info,
        )
        from gaussianprediction_tpu.train.loop import Trainer

        cfg = get_preset("test")
        cfg.train.jointly_iteration = 1000
        cfg.opt.iterations = 12
        cfg.train.test_iterations = (10,)
        info = synthetic_scene_info(
            n_points=60, n_cams=4, n_test=1, width=32, height=32,
            interpret=True,
        )
        tr = Trainer(cfg, Scene(info), interpret=True, quiet=True,
                     log_every=5)
        tr.run(model_path=str(tmp_path))
        tb_dir = tmp_path / "tb"
        files = os.listdir(tb_dir)
        assert len(files) == 1
        evs = read_events(str(tb_dir / files[0]))
        tags = [v["tag"] for e in evs for v in e.get("values", [])]
        assert "train_loss_patches/total_loss" in tags
        assert "iter_time" in tags
        assert "scene/opacity_histogram" in tags
        assert "total_points" in tags
        assert "test/loss_viewpoint_psnr" in tags
        assert any("render" in t for t in tags)
